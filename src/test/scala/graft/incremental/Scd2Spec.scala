package graft.incremental

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.nio.file.Files

/** SCD2 maintenance: for ANY event stream split into time-ordered batches,
  * the incremental path ([[Scd2.mergeBatch]] — open-row semi-join + slice
  * rebuild + keyed merge) must equal both the one-shot [[Scd2.build]] and
  * a local fold. The generator uses a tiny key/state space so runs
  * routinely straddle batch boundaries — the case where an open row must
  * be extended (same state continues) or closed (state flips) across a
  * merge. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // (key, ts, event_id, state): ts drawn sparse-unique, states from 3 values
  private val stream: Gen[List[(Long, Long, Long, String)]] = for {
    n <- Gen.choose(8, 60)
    keys <- Gen.listOfN(n, Gen.choose(0L, 3L))
    states <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
  } yield keys.zip(states).zipWithIndex.map { case ((k, s), i) =>
    (k, 1000L + i * 7L, i.toLong, s)
  }

  /** Local ground truth: collapse per-key consecutive-state runs. */
  private def fold(ev: Seq[(Long, Long, Long, String)]) =
    ev.groupBy(_._1).toSeq.flatMap { case (k, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val runs = sorted.foldLeft(List.empty[(String, Long)]) { case (acc, e) =>
        if (acc.headOption.exists(_._1 == e._4)) acc else (e._4, e._2) :: acc
      }.reverse
      runs.zipWithIndex.map { case ((st, from), i) =>
        val to = if (i + 1 < runs.length) Some(runs(i + 1)._2) else None
        (k, i + 1, st, from, to)
      }
    }.toSet

  test("incremental mergeBatch ≡ one-shot build ≡ local fold (5 seeded streams × 3 batches)") {
    for (seed <- 1 to 5) {
      val ev = stream.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val root = Files.createTempDirectory("graft-scd2spec").toString
      // split by TIME (the strict-append contract), uneven thirds
      val cuts = Seq(ev.map(_._2).min + (ev.map(_._2).max - ev.map(_._2).min) / 3,
        ev.map(_._2).min + 2 * (ev.map(_._2).max - ev.map(_._2).min) / 3)
      val batches = Seq(
        ev.filter(_._2 <= cuts(0)),
        ev.filter(e => e._2 > cuts(0) && e._2 <= cuts(1)),
        ev.filter(_._2 > cuts(1))).filter(_.nonEmpty)
      batches.foreach { b =>
        Scd2.mergeBatch(spark, root, b.toDF("k", "ts", "eid", "st"),
          "k", "ts", "eid", "st")
      }
      val got = SnapshotStore.read(spark, root).get
        .as[(Long, Int, String, Long, Option[Long])].collect().toSet
      assert(got == fold(ev), s"seed=$seed: incremental != local fold")
      val oneShot = Scd2.build(ev.toDF("k", "ts", "eid", "st"), "k", "ts", "eid", "st")
        .as[(Long, Int, String, Long, Option[Long])].collect().toSet
      assert(got == oneShot, s"seed=$seed: incremental != one-shot")
    }
  }

  test("two same-ts events with different states survive as distinct tie-broken versions") {
    // regression: merge used to key rows by (key, valid_from), so the two
    // runs born at the same timestamp collapsed to one on disk — (key,
    // version) is the unique row identity (found by dag_stream_scd2)
    val root = Files.createTempDirectory("graft-scd2tie").toString
    val b1 = Seq((1L, 10L, 0L, "a"), (1L, 10L, 1L, "b"), (1L, 20L, 2L, "c"))
    Scd2.mergeBatch(spark, root, b1.toDF("k", "ts", "eid", "st"), "k", "ts", "eid", "st")
    val got = SnapshotStore.read(spark, root).get
      .as[(Long, Int, String, Long, Option[Long])].collect().toSet
    assert(got == Set((1L, 1, "a", 10L, Some(10L)), (1L, 2, "b", 10L, Some(20L)),
      (1L, 3, "c", 20L, None)))
    assert(got == fold(b1), "merge must equal the local run fold")
  }

  test("re-merging a batch whose states all continue the open runs adds no rows") {
    val root = Files.createTempDirectory("graft-scd2same").toString
    val b1 = Seq((1L, 10L, 0L, "a"), (1L, 20L, 1L, "b"), (2L, 15L, 2L, "x"))
    val b2 = Seq((1L, 30L, 3L, "b"), (2L, 40L, 4L, "x")) // no state changes
    Scd2.mergeBatch(spark, root, b1.toDF("k", "ts", "eid", "st"), "k", "ts", "eid", "st")
    Scd2.mergeBatch(spark, root, b2.toDF("k", "ts", "eid", "st"), "k", "ts", "eid", "st")
    val got = SnapshotStore.read(spark, root).get
      .as[(Long, Int, String, Long, Option[Long])].collect().toSet
    assert(got == Set((1L, 1, "a", 10L, Some(20L)), (1L, 2, "b", 20L, None),
      (2L, 1, "x", 15L, None)))
  }
}
