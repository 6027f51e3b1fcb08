package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.DataFrame

/** d6's component engine against a local union-find oracle: random graphs
  * through BOTH phases (propagation-only and the forced
  * large-star/small-star fallback) must label every vertex with its
  * component minimum, and a path graph whose diameter dwarfs the
  * propagation budget must converge through the fallback — the
  * adversarial case plain min-label propagation cannot finish. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Local union-find: vertex → component minimum. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.as[(Long, Long)].collect().toMap

  test("random graphs: both phases agree with union-find (labels = component minima)") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(50)
      val m = 20 + rnd.nextInt(80)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expected = unionFind(edges)
      val pairs = edges.toDF("a", "b")
      // generous budget: propagation converges, fallback never fires
      val viaProp = labelsOf(PipelineQueries.connectedComponents(pairs, propRounds = 100))
      // zero budget: the large-star/small-star path does all the work
      val viaStars = labelsOf(PipelineQueries.connectedComponents(pairs, propRounds = 0))
      assert(viaProp == expected, s"trial $trial: propagation diverged from union-find")
      assert(viaStars == expected, s"trial $trial: star fallback diverged from union-find")
    }
  }

  test("path graph with diameter >> propagation budget converges via the fallback") {
    // 0-1-2-...-400: diameter 400; propagation alone needs ~400 rounds,
    // the d6 default budget is 12 — only the fallback can finish this
    val path = (0L until 400L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = labelsOf(PipelineQueries.connectedComponents(path, propRounds = 12))
    assert(labels.size == 401)
    assert(labels.values.forall(_ == 0L), "every path vertex must label to the minimum 0")
  }

  test("disconnected components and singleton-free input keep distinct minima") {
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 30L))
      .toDF("a", "b")
    val labels = labelsOf(PipelineQueries.connectedComponents(pairs, propRounds = 0))
    assert(labels == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("empty pair graph yields no labels (no spin, no error)") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(PipelineQueries.connectedComponents(empty, propRounds = 0).count() == 0)
    assert(PipelineQueries.connectedComponents(empty, propRounds = 12).count() == 0)
  }

  test("g2: a late bridge edge MERGES two settled components (non-monotone rewrite)") {
    // edge batches split by max-endpoint tercile over ids 0..89:
    // batch 0 (max < 30) builds component {1,2,3}; batch 1 (max < 60)
    // builds {40,41,42}; batch 2 delivers the BRIDGE 3-61 plus 61-40 —
    // the two settled components must rewrite to one label (1), the
    // non-monotone case a keyed store merge expresses and an
    // append-only pipeline cannot. 80-81 stays untouched throughout.
    val pairs = Seq(
      (1L, 2L), (2L, 3L),             // batch 0
      (40L, 41L), (41L, 42L),         // batch 1
      (80L, 81L),                     // batch 2 (max 81) — bystander
      (3L, 61L), (61L, 40L)           // batch 2 — the bridge
    ).toDF("a_id", "b_id")
    val root = java.nio.file.Files.createTempDirectory("graft-g2spec").toString
    try {
      val got = PipelineQueries.incrementalCcRun(spark, pairs, root)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val merged = Set(1L, 2L, 3L, 40L, 41L, 42L, 61L)
        .map(v => (v, 1L, 7L))
      assert(got === merged ++ Set((80L, 80L, 2L), (81L, 80L, 2L)),
        s"bridge must merge both settled components into label 1, got $got")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("g2b: a retired bridge SPLITS a settled component; a fully-retired edge isolates") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // Retire predicate: (a+b) % 5 == 0. Endpoint sums below are chosen so
    // exactly the marked edges retire:
    //   path 1-2-3-4: (2,3) sums to 5 → retired → SPLIT into {1,2}/{3,4}
    //   triangle {10,11,12}: no edge sums to 0 mod 5 → intact
    //   (20,80) sums to 100 → retired → BOTH endpoints lose their last
    //   edge and must leave the labeling
    //   (81,82) sums to 163 → bystander, never touched
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 12L), (11L, 12L), (10L, 11L),
      (20L, 80L),
      (81L, 82L)
    ).toDF("a_id", "b_id")
    val root = java.nio.file.Files.createTempDirectory("graft-g2bspec").toString
    try {
      val got = PipelineQueries.ccRetireRun(spark, pairs, root,
          pmod(col("a_id") + col("b_id"), lit(5L)) === lit(0L))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = Set(
        (1L, 1L, 2L), (2L, 1L, 2L),                    // split half A
        (3L, 3L, 2L), (4L, 3L, 2L),                    // split half B
        (10L, 10L, 3L), (11L, 10L, 3L), (12L, 10L, 3L), // triangle survives
        (81L, 81L, 2L), (82L, 81L, 2L))                // bystander intact
      // 20 and 80 must be ABSENT: their only edge was retired
      assert(got === want, s"retirement must split, isolate and spare correctly, got $got")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("g2b: retirement equals one-shot CC over surviving pairs on real data") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.{col, count, lit, pmod}
    val pairs = PipelineQueries.d2MinhashLsh(spark, dir)
      .select(col("a_id"), col("b_id")).localCheckpoint()
    val surviving = pairs.filter(
      pmod(col("a_id") + col("b_id"), lit(PipelineQueries.G2bRetireMod))
        =!= lit(PipelineQueries.G2bRetireRem))
    assert(surviving.count() < pairs.count(),
      "fixture must actually retire at least one edge")
    val lab = PipelineQueries.connectedComponents(surviving).toDF("doc_id", "canonical_id")
    val sizes = lab.groupBy(col("canonical_id")).agg(count(lit(1)).as("cluster_size"))
    val oneShot = lab.join(sizes, "canonical_id")
      .select(col("doc_id"), col("canonical_id"), col("cluster_size"))
    val inc = PipelineQueries.g2bCcRetirement(spark, dir)
    assert(inc.count() > 0, "fixture must exercise the operator")
    assert(inc.exceptAll(oneShot).isEmpty && oneShot.exceptAll(inc).isEmpty,
      "retirement pipeline diverged from one-shot CC over the survivors")
  }

  test("g2: final labels equal d6's one-shot assignment on real data (arrival order invisible)") {
    val dir = "/root/testdata/sf0.001"
    val oneShot = PipelineQueries.d6DedupClusters(spark, dir)
    val root = java.nio.file.Files.createTempDirectory("graft-g2spec2").toString
    try {
      val inc = PipelineQueries.g2IncrementalCc(spark, dir)
      assert(inc.count() > 0, "fixture must exercise the operator")
      assert(inc.exceptAll(oneShot).isEmpty && oneShot.exceptAll(inc).isEmpty,
        "incremental CC diverged from the one-shot assignment")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("g4: rank-oriented triangle counts equal the naive x<y<z recount") {
    val dir = "/root/testdata/sf0.001"
    val pairs = PipelineQueries.d2MinhashLsh(spark, dir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairSet = pairs.toSet
    val byLow = pairs.groupBy(_._1)
    // naive reference: every x<y<z with (x,y),(y,z),(x,z) all present
    val tris = pairs.flatMap { case (x, y) =>
      byLow.getOrElse(y, Array.empty[(Long, Long)]).collect {
        case (_, z) if pairSet.contains((x, z)) => (x, y, z) } }
    val triCnt = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val deg = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = PipelineQueries.g4Triangles(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSet == deg.keySet, "every pair endpoint is a row")
    got.foreach { case (v, (d, t, lcc)) =>
      assert(d == deg(v), s"vertex $v degree")
      assert(t == triCnt.getOrElse(v, 0L), s"vertex $v triangle count")
      val expLcc = if (d >= 2) 2L * t * 1000000L / (d * (d - 1L)) else 0L
      assert(lcc == expLcc, s"vertex $v lcc")
    }
    assert(got.map(_._2._2).sum % 3 == 0, "corner counts sum to 3 per triangle")
    assert(got.exists(_._2._2 > 0), "the sf0.001 near-dup graph has triangles (5)")
  }

  test("d19: each component elects its max-logit member (tie → min id), " +
      "membership and sizes equal d6's") {
    val dir = "/root/testdata/sf0.001"
    val d6 = PipelineQueries.d6DedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = PipelineQueries.d19CanonicalPick(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSet == d6.keySet, "same membership as d6")
    got.groupBy(_.getLong(1)).foreach { case (comp, ms) =>
      val winner = ms.map(r => (-r.getLong(3), r.getLong(0))).min._2
      val winnerLogit = ms.find(_.getLong(0) == winner).get.getLong(3)
      ms.foreach { r =>
        assert(r.getLong(4) == winner, s"component $comp canonical")
        assert(r.getLong(5) == winnerLogit, s"component $comp canonical logit")
        assert(r.getBoolean(6) == (r.getLong(0) == winner), s"component $comp keep")
        assert(d6(r.getLong(0)) == ((comp, ms.length.toLong)),
          s"doc ${r.getLong(0)} component/size must match d6")
      }
      assert(ms.count(_.getBoolean(6)) == 1, s"component $comp: exactly one keeper")
    }
    // the operator's reason to exist: the quality election must actually
    // DIFFER from d6's min-id election somewhere (25 of 45 members at sf0.001)
    assert(got.exists(r => r.getLong(4) != r.getLong(1)),
      "quality election should differ from the min-id election on this tier")
  }

  test("d19b: a late high-quality arrival FLIPS a settled canonical; a merged-away " +
      "component's election row drains through the keyed delete") {
    import org.apache.spark.sql.functions.col
    // Edge batches split by max-endpoint tercile over ids 0..81 (the 80-81
    // bystander pins maxId): batch 0 (max ≤ 27) settles {1,2} and {10,11};
    // batch 1 (max ≤ 54) settles {40,41}; batch 2 delivers
    //   (2,65)  — doc 65 is the stopword-rich HIGH-quality member that must
    //             steal component 1's canonical seat from the symbol-heavy
    //             incumbents (the flip: no deletion, the DECISION moves), and
    //   (11,63),(63,41) — the high-id bridge that absorbs component 40 into
    //             component 10, so election row l=40 must LEAVE the store.
    val junk = "@#$% ^&*! %%%% @@@@ ####"
    val docs = Seq(
      (1L, junk + " aaaa"), (2L, junk + " bbbb"),
      (10L, junk + " cc"), (11L, junk + " dd"), (63L, junk + " ee"),
      (40L, junk + " ff"), (41L, junk + " gg"),
      (65L, "the and of to in is it for on as the and of to in is it for on as"),
      (80L, junk + " hh"), (81L, junk + " ii")
    ).toDF("doc_id", "text")
    val logits = PipelineQueries.t19Scored(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("logit6")).toMap
    assert(logits(65L) > logits(1L) && logits(65L) > logits(2L),
      "fixture: doc 65 must outrank both incumbents on the t19 logit")
    val early = Seq((1L, 2L), (10L, 11L), (40L, 41L), (80L, 81L))
    val late = Seq((2L, 65L), (11L, 63L), (63L, 41L))
    val rootA = java.nio.file.Files.createTempDirectory("graft-d19b-a").toString
    val rootB = java.nio.file.Files.createTempDirectory("graft-d19b-b").toString
    try {
      // pre-flip state: without batch 2 the canonical of {1,2} is the
      // better symbol-heavy incumbent, and elections exist for 1/10/40/80
      val pre = PipelineQueries.d19bRun(spark, docs,
        early.toDF("a_id", "b_id"), rootA).collect()
      val preCanon1 = pre.find(_.getLong(0) == 1L).get.getLong(4)
      val incumbents = Set(1L, 2L)
      assert(incumbents.contains(preCanon1), "pre-flip canonical is an incumbent")
      val preElect = graft.incremental.SnapshotStore
        .read(spark, s"$rootA/election").get.select(col("l"))
        .collect().map(_.getLong(0)).toSet
      assert(preElect == Set(1L, 10L, 40L, 80L), s"pre-flip election keys: $preElect")
      // full arrival: the seat flips to 65 and election row 40 drains
      val got = PipelineQueries.d19bRun(spark, docs,
        (early ++ late).toDF("a_id", "b_id"), rootB).collect()
      val comp1 = got.filter(_.getLong(1) == 1L)
      assert(comp1.map(_.getLong(0)).toSet == Set(1L, 2L, 65L), "flip component members")
      comp1.foreach { r =>
        assert(r.getLong(4) == 65L, "canonical seat must flip to the late arrival")
        assert(r.getBoolean(6) == (r.getLong(0) == 65L), "keep follows the flip")
      }
      val postElect = graft.incremental.SnapshotStore
        .read(spark, s"$rootB/election").get.select(col("l"))
        .collect().map(_.getLong(0)).toSet
      assert(postElect == Set(1L, 10L, 80L),
        s"absorbed component 40's election row must drain, got $postElect")
      // declarative close: the served state equals a one-shot election
      val labels = unionFind(early ++ late)
      val sizes = labels.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val byComp = labels.keys.groupBy(labels)
      got.foreach { r =>
        val (v, comp) = (r.getLong(0), r.getLong(1))
        assert(comp == labels(v) && r.getLong(2) == sizes(comp), s"doc $v label/size")
        assert(r.getLong(3) == logits(v), s"doc $v stored logit")
        val winner = byComp(comp).map(m => (-logits(m), m)).min._2
        assert(r.getLong(4) == winner && r.getLong(5) == logits(winner),
          s"component $comp one-shot winner")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(rootA))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(rootB))
    }
  }

  test("g4b: triangles closed ACROSS batches (1, 2 and 3 new edges) count once; " +
      "state equals the naive recount") {
    // max-endpoint terciles over ids 0..81 (80-81 bystander pins maxId):
    // batch 0 lays the base edge (1,2); batch 1 closes {1,2,30} with TWO
    // new edges; batch 2 closes {1,2,65} (two new), and {1,30,65} +
    // {2,30,65} each via one new edge (30,65) against settled edges —
    // every multiplicity of the count-once rule fires in one fixture
    val edges = Seq(
      (1L, 2L),                       // batch 0
      (2L, 30L), (1L, 30L),           // batch 1
      (2L, 65L), (1L, 65L), (30L, 65L), // batch 2
      (80L, 81L))                     // bystander, pins maxId
    // naive local reference over the full edge set
    val pairSet = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val triCnt = verts.map { v =>
      val nb = verts.filter(u => u != v && pairSet.contains((math.min(u, v), math.max(u, v))))
      v -> nb.combinations(2).count(p =>
        pairSet.contains((math.min(p(0), p(1)), math.max(p(0), p(1))))).toLong
    }.toMap
    val deg = verts.map(v => v -> verts.count(u =>
      u != v && pairSet.contains((math.min(u, v), math.max(u, v)))).toLong).toMap
    val root = java.nio.file.Files.createTempDirectory("graft-g4bspec").toString
    try {
      val got = PipelineQueries.g4bRun(spark, edges.toDF("a_id", "b_id"), root)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.map(_._1).toSet == verts.toSet, "every endpoint is a row")
      got.foreach { case (v, (d, t, lcc)) =>
        assert(d == deg(v), s"vertex $v degree")
        assert(t == triCnt(v), s"vertex $v triangle count (count-once discipline)")
        val expLcc = if (d >= 2) 2L * t * 1000000L / (d * (d - 1L)) else 0L
        assert(lcc == expLcc, s"vertex $v lcc")
      }
      assert(got.toMap.apply(30L)._2 == 3L, "vertex 30 sits in 3 triangles")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("g4b: maintained counts equal g4's one-shot audit on real data " +
      "(arrival order invisible)") {
    val dir = "/root/testdata/sf0.001"
    val oneShot = PipelineQueries.g4Triangles(spark, dir)
    val inc = PipelineQueries.g4bIncrementalTriangles(spark, dir)
    assert(inc.count() > 0, "fixture must exercise the operator")
    assert(inc.exceptAll(oneShot).isEmpty && oneShot.exceptAll(inc).isEmpty,
      "incremental triangle maintenance diverged from the one-shot audit")
  }

  test("d19c: retiring the CANONICAL promotes the next-best survivor; dissolved " +
      "and renamed components drain their election rows") {
    import org.apache.spark.sql.functions.col
    // retire predicate: doc_id % 7 == 3 → docs {24, 10, 38}. Planted so the
    // sweep hits every shape at once:
    //   {1,2,24}: 24 is the stopword-rich CANONICAL — retiring it must
    //             promote the best surviving incumbent (no arrival anywhere);
    //   {10,16}:  10 retired → 16 isolated → the whole component dissolves
    //             and election row l=10 drains;
    //   {36,38,44,50} (path 36-38-44-50): 38 retired → 36 isolated, the
    //             {44,50} half re-labels to 44 → old election row l=36
    //             drains, a fresh l=44 row appears;
    //   {40,41}, {79,81}: bystanders (81 pins maxId for the terciles).
    val junk = "@#$% ^&*! %%%% @@@@ ####"
    val docs = Seq(
      (1L, junk + " aa"), (2L, junk + " bb"),
      (24L, "the and of to in is it for on as the and of to in is it for on as"),
      (10L, junk + " cc"), (16L, junk + " dd"),
      (36L, junk + " ee"), (38L, junk + " ff"), (44L, junk + " gg"),
      (50L, junk + " hh"), (40L, junk + " ii"), (41L, junk + " jj"),
      (79L, junk + " kk"), (81L, junk + " ll")
    ).toDF("doc_id", "text")
    val logits = PipelineQueries.t19Scored(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("logit6")).toMap
    assert(logits(24L) > logits(1L) && logits(24L) > logits(2L),
      "fixture: the doomed canonical must outrank its survivors pre-takedown")
    val edges = Seq((1L, 2L), (2L, 24L), (10L, 16L),
      (36L, 38L), (38L, 44L), (44L, 50L), (40L, 41L), (79L, 81L))
    val root = java.nio.file.Files.createTempDirectory("graft-d19c").toString
    try {
      val got = PipelineQueries.d19cRun(spark, docs, edges.toDF("a_id", "b_id"),
        root, c => org.apache.spark.sql.functions.pmod(c,
          org.apache.spark.sql.functions.lit(7L)) === 3L).collect()
      val surviving = edges.filter { case (a, b) => a % 7 != 3 && b % 7 != 3 }
      val labels = unionFind(surviving)
      assert(got.map(_.getLong(0)).toSet == labels.keySet,
        "output membership = surviving-edge endpoints (retired + isolated leave)")
      val byComp = labels.keys.groupBy(labels)
      got.foreach { r =>
        val (v, comp) = (r.getLong(0), r.getLong(1))
        assert(comp == labels(v), s"doc $v label")
        assert(r.getLong(2) == byComp(comp).size.toLong, s"doc $v size")
        val winner = byComp(comp).map(m => (-logits(m), m)).min._2
        assert(r.getLong(4) == winner, s"component $comp must promote $winner")
        assert(r.getBoolean(6) == (v == winner), s"doc $v keep")
      }
      assert(got.filter(_.getLong(1) == 1L).forall(_.getLong(4) != 24L),
        "the retired canonical must not hold the seat")
      val electKeys = graft.incremental.SnapshotStore
        .read(spark, s"$root/election").get.select(col("l"))
        .collect().map(_.getLong(0)).toSet
      assert(electKeys == Set(1L, 40L, 44L, 79L),
        s"dissolved (10) and renamed (36) election rows must drain, got $electKeys")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("d19c: takedown re-election equals the one-shot election over surviving " +
      "pairs on real data") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val M = PipelineQueries.D18RetireMod.toLong
    val R = PipelineQueries.D18RetireRem.toLong
    val pairs = PipelineQueries.d2MinhashLsh(spark, dir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val surviving = pairs.filter { case (a, b) => a % M != R && b % M != R }
    assert(surviving.length < pairs.length, "fixture must actually retire an edge")
    val labels = unionFind(surviving.toSeq)
    val logits = PipelineQueries.t19Scored(
        graft.Sources.testdata(spark, dir)("documents")
          .filter(col("doc_id").isin(labels.keys.toSeq: _*)))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("logit6")).toMap
    val byComp = labels.keys.groupBy(labels)
    val expected = labels.map { case (v, comp) =>
      val winner = byComp(comp).map(m => (-logits(m), m)).min._2
      (v, comp, byComp(comp).size.toLong, logits(v), winner, logits(winner), v == winner)
    }.toSet
    val got = PipelineQueries.d19cTakedownReelection(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSet
    assert(got == expected,
      "takedown re-election diverged from the one-shot surviving election")
  }

  test("d19b: served election equals d19's one-shot pick on real data " +
      "(arrival order invisible)") {
    val dir = "/root/testdata/sf0.001"
    val oneShot = PipelineQueries.d19CanonicalPick(spark, dir)
    val inc = PipelineQueries.d19bIncrementalCanonical(spark, dir)
    assert(inc.count() > 0, "fixture must exercise the operator")
    assert(inc.exceptAll(oneShot).isEmpty && oneShot.exceptAll(inc).isEmpty,
      "incremental election diverged from the one-shot canonical pick")
  }
}
