package graft.incremental

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.nio.file.Files

/** Property tests of the merge sink (SURVEY.md §5): for ANY sequence of
  * key-unique, PARTITION-STABLE batches, replaying them (each twice —
  * redelivery) through [[SnapshotStore.merge]] yields exactly the fold of
  * last-write-wins upserts. Partition stability (a key always carries the
  * same date — true for every DAG model, see the SnapshotStore scaladoc)
  * is the sink's documented precondition, so the generator derives the
  * date FROM the key; without it, a superseded key in an untouched
  * partition would legitimately survive a partition-scoped merge. Batches
  * are drawn with fixed seeds: adversarial (tiny key space forces
  * cross-batch collisions) yet deterministic in CI. */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val row: Gen[(Long, String, String)] = for {
    id <- Gen.choose(0L, 7L) // small key space forces cross-batch collisions
    pay <- Gen.identifier.map(_.take(6))
  } yield (id, f"2026-01-${id % 3 + 1}%02d", pay) // date derived from key

  private val batches: Gen[List[List[(Long, String, String)]]] =
    Gen.listOfN(3, Gen.nonEmptyListOf(row))

  test("merge ≡ fold of last-write-wins upserts; redelivery is a no-op (5 seeded cases)") {
    for (seed <- 1 to 5) {
      val bs = batches.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val root = Files.createTempDirectory("graft-prop").toString
      var expected = Map.empty[Long, (Long, String, String)]
      bs.foreach { b =>
        // key-unique batch (dbt assumes the model SELECT already is;
        // in-batch dup collapsing has its own unit test)
        val keyUnique = b.groupBy(_._1).map(_._2.head).toSeq
        keyUnique.foreach(r => expected += (r._1 -> r))
        val batchDf = keyUnique.toDF("id", "dt", "payload")
        SnapshotStore.merge(spark, root, batchDf, Seq("id"), Some(to_date(col("dt"))))
        // redelivery of the same batch must change nothing
        SnapshotStore.merge(spark, root, batchDf, Seq("id"), Some(to_date(col("dt"))))
      }
      val got = SnapshotStore.read(spark, root).get
        .select("id", "dt", "payload").as[(Long, String, String)].collect().toSet
      assert(got == expected.values.toSet, s"seed=$seed")
    }
  }
}
