package graft.queries

import PipelineQueries._

/** DuckDB oracle SQL for [[PipelineQueries]].
  *
  * The MinHash coefficients and ANN hyperplanes are interpolated from the
  * same Scala constants the Spark side uses; everything else is the same
  * arithmetic over the same splits, so values match bit-for-bit (floating
  * results are rounded to 6 dp on both sides to absorb summation-order
  * ULPs). `d2_minhash_lsh` is checked against the **exact all-pairs**
  * Jaccard join — the LSH path must reproduce it to pass.
  */
object PipelineOracles {

  private def inList(xs: Seq[String]) = xs.map(s => s"'$s'").mkString("(", ",", ")")

  /** DuckDB list literal of the 8×64 hyperplanes (1-based indexing). */
  private val duckPlanes: String =
    AnnPlanes.map(p => p.map(d => BigDecimal(d).bigDecimal.toPlainString)
      .mkString("[", ",", "]")).mkString("[", ",", "]")

  /** DuckDB list literal of the near-dup tables×planes×dims. */
  private val duckNdPlanes: String =
    NdPlanes.map(t => t.map(p => p.map(d => BigDecimal(d).bigDecimal.toPlainString)
      .mkString("[", ",", "]")).mkString("[", ",", "]")).mkString("[", ",", "]")

  /** Shared CTE chain of d12's URL plant + canonicalization (reused by
    * the pipe4 composition oracle — one definition, no drift): `b`
    * (formula pieces) → `u` (messy url) → `q` (sorted non-utm params) →
    * `c` (doc_id, url, canonical_url). */
  private val UrlCanonCtes =
    """b AS (
      |        SELECT doc_id, doc_id % 40 AS k,
      |               CASE WHEN (doc_id % 40) % 2 = 0 THEN 'http' ELSE 'https' END AS sc,
      |               'example' || CAST((doc_id % 40) % 4 AS VARCHAR) || '.com' AS hc
      |        FROM documents),
      |      u AS (
      |        SELECT doc_id,
      |               (CASE WHEN doc_id % 4 < 2 THEN upper(sc) ELSE sc END) || '://' ||
      |               (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
      |               (CASE WHEN doc_id % 2 = 0 THEN upper(hc) ELSE hc END) ||
      |               (CASE WHEN doc_id % 5 = 0
      |                     THEN (CASE WHEN k % 2 = 0 THEN ':80' ELSE ':443' END)
      |                     ELSE '' END) ||
      |               '/p/' || CAST(k AS VARCHAR) ||
      |               (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) || '?' ||
      |               (CASE WHEN doc_id % 2 = 0
      |                     THEN 'id=' || CAST(k AS VARCHAR)
      |                          || '&utm_source=s' || CAST(doc_id % 7 AS VARCHAR)
      |                     ELSE 'utm_source=s' || CAST(doc_id % 7 AS VARCHAR)
      |                          || '&id=' || CAST(k AS VARCHAR) END) ||
      |               (CASE WHEN doc_id % 3 = 1
      |                     THEN '#sec' || CAST(doc_id % 5 AS VARCHAR) ELSE '' END) AS url
      |        FROM b),
      |      q AS (
      |        SELECT doc_id, url,
      |               array_to_string(list_sort(list_filter(
      |                 str_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
      |                 x -> NOT starts_with(x, 'utm_'))), '&') AS qn
      |        FROM u),
      |      c AS (
      |        SELECT doc_id, url,
      |               lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://' ||
      |               regexp_replace(regexp_replace(
      |                 lower(regexp_extract(url, '://([^/?#]+)', 1)),
      |                 ':[0-9]+$', ''), '^www\.', '') ||
      |               regexp_replace(regexp_extract(url, '://[^/?#]+([^?#]*)', 1), '/$', '') ||
      |               (CASE WHEN qn = '' THEN '' ELSE '?' || qn END) AS canonical_url
      |        FROM q)""".stripMargin

  private val shingleCte =
    """docs AS (SELECT doc_id, source, string_split(lower(text), ' ') AS w
      |          FROM documents),
      |sh AS (SELECT doc_id, source,
      |              CASE WHEN len(w) >= 3
      |                   THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                                       for i in range(1, len(w)-1)])
      |                   ELSE [] END AS sh
      |       FROM docs)""".stripMargin

  /** The connected-components closure over the exact all-pairs near-dup
    * graph (min reachable id = canonical) — shared by d6 (the full
    * graph), g2 (incremental arrival must converge to it) and g2b
    * (incremental RETIREMENT: `edgeCond` cuts the retired edges from the
    * exact pair set, so the closure runs over the survivors — vertices
    * with no surviving edge leave the labeling with the verts CTE). */
  private def ccClustersSql(edgeCond: String): String = s"""
      WITH RECURSIVE $shingleCte,
      pairs AS (
        SELECT a_id, b_id FROM (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
                 CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS uni
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
        WHERE 2 * inter >= uni $edgeCond),
      e AS (SELECT a_id AS u, b_id AS v FROM pairs
            UNION ALL SELECT b_id, a_id FROM pairs),
      verts AS (SELECT DISTINCT u AS v FROM e),
      reach(x, y) AS (
        SELECT v, v FROM verts
        UNION
        SELECT r.x, e.v FROM reach r JOIN e ON e.u = r.y),
      lab AS (SELECT x AS doc_id, MIN(y) AS canonical_id FROM reach GROUP BY x),
      sz AS (SELECT canonical_id, COUNT(*) AS cluster_size FROM lab GROUP BY canonical_id)
      SELECT lab.doc_id, lab.canonical_id, sz.cluster_size
      FROM lab JOIN sz USING (canonical_id)
      ORDER BY doc_id"""

  /** Shared CTE chain for the retrieval-eval oracles: `ex` = the exact
    * cos_e6 top-5 per query, `ra` = the LSH ANN's ranked results — both
    * recomputed verbatim from the v1/v2 oracle bodies. */
  private lazy val annEvalCtes = s"""$embCte,
      qx AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
      sx AS (SELECT qx.q_id, n.vec_id,
                    CAST(floor(list_sum(list_transform(range(1, len(n.v)+1),
                            i -> n.v[i] * qx.qv[i])) / (n.nrm * qx.qn) * 1000000.0 + 0.5) AS BIGINT) AS cos_e6
             FROM n, qx WHERE n.vec_id != qx.q_id),
      rx AS (SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id
                                       ORDER BY cos_e6 DESC, vec_id) AS rk
             FROM sx),
      ex AS (SELECT q_id, vec_id FROM rx WHERE rk <= 5),
      pl AS (SELECT $duckPlanes AS planes),
      b AS (SELECT vec_id, v, nrm,
                   list_sum([CASE WHEN list_sum(list_transform(range(1, len(v)+1),
                               i -> v[i] * planes[j+1][i])) > 0
                             THEN (1::BIGINT << j) ELSE 0::BIGINT END
                             for j in range(0, 8)])::BIGINT AS bucket
            FROM n, pl),
      qa AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket AS q_bucket
             FROM b WHERE vec_id < 5),
      sa AS (SELECT qa.q_id, b.vec_id,
                    CAST(floor(list_sum(list_transform(range(1, len(b.v)+1),
                            i -> b.v[i] * qa.qv[i])) / (b.nrm * qa.qn) * 1000000.0 + 0.5) AS BIGINT) AS cos_e6
             FROM b JOIN qa ON b.bucket = qa.q_bucket AND b.vec_id != qa.q_id),
      ra AS (SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id
                                       ORDER BY cos_e6 DESC, vec_id) AS rk
             FROM sa)"""

  /** The once-per-vector 1e-6 offset quantization (v5's fixed-point
    * discipline) — `q` (vec_id, u). Requires `e` from [[embCte]]
    * upstream; shared by every exact-integer training chain. */
  private lazy val quantCte: String = s"""
      q AS (SELECT vec_id,
                   list_transform(v, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)
                                          + ${PipelineQueries.KmOff}) AS u
            FROM e)"""

  /** Shared CTE chain of the COARSE quantizer's Lloyd refinement
    * (v5's step): `kct` (offset literal seeds) → `ka0` (assignment 0) →
    * `kupd` → `kcent1` (the trained cells, HALF_UP integer means).
    * `k`-prefixed so it composes with [[pqTrainCtes]] in one query
    * (v22 trains BOTH quantizers). Requires [[quantCte]] upstream.
    * Reused by v5's report and v22's serve — one training, no drift. */
  private lazy val kmTrainCtes: String = s"""
      kct AS (SELECT ${PipelineQueries.IvfCentroids.map(c =>
        c.map(d => (math.floor(d * 1e6 + 0.5).toLong + PipelineQueries.KmOff).toString)
          .mkString("[", ",", "]")).mkString("[", ",", "]")} AS cq),
      ka0 AS (SELECT vec_id, u,
                     CAST(list_position(s, list_min(s)) AS INTEGER) AS cell0
              FROM (SELECT q.vec_id, q.u,
                      [list_sum(list_transform(range(1, 65),
                         i -> (u[i] - cq[k+1][i]) * (u[i] - cq[k+1][i])))
                       for k in range(0, ${PipelineQueries.IvfCells})] AS s
                    FROM q, kct) t0),
      kupd AS (SELECT cell0 AS cell, g.i, sum(u[g.i]) AS su, count(*) AS n
               FROM ka0, generate_series(1, 64) g(i)
               GROUP BY 1, 2),
      kcent1 AS (SELECT cell, list(CAST((2*su + n) // (2*n) AS BIGINT) ORDER BY i) AS cent
                 FROM kupd GROUP BY cell, n)"""

  /** Shared CTE chain of v20's Lloyd refinement (offset units, HALF_UP
    * integer means, first-min/lowest-code tie-breaks): `cb` (the offset
    * initial codebook literal) → `sub` (8-dim slices) → `a0`
    * (assignment 0) → `upd` → `cent1` (the trained sub-centroids).
    * Reused verbatim by v21's and v22's serve oracles — one training,
    * no drift. Requires [[quantCte]] (and therefore [[embCte]])
    * upstream. */
  private lazy val pqTrainCtes: String = s"""
      cb AS (SELECT ${PipelineQueries.PqCodebookQ.map(_.map(cs =>
        cs.map(x => (x + PipelineQueries.KmOff).toString).mkString("[", ",", "]"))
        .mkString("[", ",", "]")).mkString("[", ",", "]")} AS c),
      sub AS (SELECT vec_id, mm.m AS m,
                     u[mm.m * ${PipelineQueries.PqDim} + 1 :
                       mm.m * ${PipelineQueries.PqDim} + ${PipelineQueries.PqDim}] AS su
              FROM q, (SELECT unnest(range(0, ${PipelineQueries.PqSub})) AS m) mm),
      a0 AS (SELECT vec_id, m, su,
                    CAST(list_position(s, list_min(s)) AS INTEGER) AS code0
             FROM (SELECT sub.vec_id, sub.m, sub.su,
                     [list_sum(list_transform(range(1, ${PipelineQueries.PqDim} + 1),
                        i -> (su[i] - c[m+1][k+1][i]) * (su[i] - c[m+1][k+1][i])))
                      for k in range(0, ${PipelineQueries.PqK})] AS s
                   FROM sub, cb) t0),
      upd AS (SELECT m, code0 AS code, g.i, sum(su[g.i]) AS susum, count(*) AS n
              FROM a0, generate_series(1, ${PipelineQueries.PqDim}) g(i)
              GROUP BY 1, 2, 3),
      cent1 AS (SELECT m, code,
                       list(CAST((2*susum + n) // (2*n) AS BIGINT) ORDER BY i) AS cent
                FROM upd GROUP BY m, code, n)"""

  /** v22's end-to-end fully-trained IVF-PQ serve, retrained declaratively
    * (coarse cells via [[kmTrainCtes]], codebook via [[pqTrainCtes]]) and
    * replayed assign → probe → ADC → rank. Shared VERBATIM by v22, v23
    * (store-persisted index) and v24 (cell-partitioned + DPP layout):
    * persistence and layout may change cost, never a single ranked row. */
  /** The serve replay downstream of a coarse-distance table `s1c`
    * (vec_id, cell, dist) and [[pqTrainCtes]]'s `sub`/`cent1`: assign →
    * probe → ADC → rank. Shared by v22/v23/v24 (1-step coarse training)
    * and v26 (converged coarse training) — one serve replay, no drift. */
  private lazy val ivfServeTailSql: String = s"""
      asg AS (SELECT vec_id, cell AS vcell
              FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist ASC, cell) AS rn FROM s1c)
              WHERE rn = 1),
      probe AS (SELECT vec_id AS q_id, cell
                FROM (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                               ORDER BY dist ASC, cell) AS crk
                      FROM s1c WHERE vec_id < 5)
                WHERE crk <= ${PipelineQueries.IvfProbe}),
      cents AS (SELECT m, list(cent ORDER BY code) AS cl FROM cent1 GROUP BY m),
      dl AS (SELECT s.vec_id, s.m,
                    list_transform(c.cl, cc ->
                      list_sum(list_transform(range(1, ${PipelineQueries.PqDim} + 1),
                        i -> (s.su[i] - cc[i]) * (s.su[i] - cc[i])))) AS dl
             FROM sub s JOIN cents c ON c.m = s.m),
      co AS (SELECT vec_id, m,
                    CAST(list_position(dl, list_min(dl)) AS INTEGER) AS ci
             FROM dl),
      qd AS (SELECT vec_id AS q_id, m, dl FROM dl WHERE vec_id < 5),
      cand AS (SELECT p.q_id, a.vec_id, a.vcell
               FROM probe p JOIN asg a ON a.vcell = p.cell
               WHERE a.vec_id <> p.q_id),
      contrib AS (SELECT cand.q_id, cand.vec_id, cand.vcell, qd.dl[co.ci] AS dpart
                  FROM cand
                  JOIN co ON co.vec_id = cand.vec_id
                  JOIN qd ON qd.q_id = cand.q_id AND qd.m = co.m),
      adc AS (SELECT q_id, vec_id, vcell, CAST(sum(dpart) AS BIGINT) AS adc_dist
              FROM contrib GROUP BY 1, 2, 3),
      rr AS (SELECT q_id, vec_id, vcell, adc_dist,
                    row_number() OVER (PARTITION BY q_id
                                       ORDER BY adc_dist, vec_id) AS rk
             FROM adc)
      SELECT q_id, rk, vec_id, vcell AS cell, adc_dist FROM rr
      WHERE rk <= 5 ORDER BY q_id, rk"""

  private lazy val trainedIvfServeSql: String = s"""
      WITH $embCte,
      $quantCte,
      $kmTrainCtes,
      $pqTrainCtes,
      s1c AS (SELECT ka0.vec_id, c.cell,
                     list_sum(list_transform(range(1, 65),
                       i -> (ka0.u[i] - c.cent[i]) * (ka0.u[i] - c.cent[i]))) AS dist
              FROM ka0, kcent1 c),
      $ivfServeTailSql"""

  /** v26's DuckDB twin: the full [[lloydChainCtes]] retrain (every
    * iteration, not just the first) feeding the same serve replay —
    * coarse distances against the CONVERGED kc$$n state. */
  private lazy val convergedIvfServeSql: String = {
    val n = PipelineQueries.V25Iters
    s"""
      WITH $embCte,
      $quantCte,
      $lloydChainCtes,
      $pqTrainCtes,
      s1c AS MATERIALIZED (SELECT q.vec_id, c.cell,
                     list_sum(list_transform(range(1, 65),
                       i -> (q.u[i] - c.cent[i]) * (q.u[i] - c.cent[i]))) AS dist
              FROM q, kc$n c),
      $ivfServeTailSql"""
  }

  /** The DDSketch estimate CTE chain shared by k9 and t29 (one
    * estimator, no drift): `v` (per-doc source/length) → `n` → `q`
    * (the ppm probes) → `tgt` (target ranks ⌈q·n⌉) → `b` (the
    * log-bucketed grid) → `cum` → `est` (g, q_ppm, dd_est). */
  private def ddEstCtes(qs: Seq[Long]): String = s"""
      v AS (SELECT source AS g, n_chars AS v FROM documents
            WHERE n_chars >= 1),
      n AS (SELECT g, count(*) AS n FROM v GROUP BY g),
      q AS (SELECT CAST(unnest([${qs.mkString(", ")}]) AS BIGINT) AS q_ppm),
      tgt AS (SELECT g, q_ppm, (q_ppm * n + 999999) // 1000000 AS target
              FROM n CROSS JOIN q),
      b AS (SELECT g, length(bin(v)) - 1 AS e,
                   greatest(length(bin(v)) - 1 - ${PipelineQueries.DdSubBits}, 0) AS shift,
                   v >> greatest(length(bin(v)) - 1 - ${PipelineQueries.DdSubBits}, 0) AS key,
                   count(*) AS cnt
            FROM v GROUP BY 1, 2, 3, 4),
      cum AS (SELECT g, e, key, shift, cnt,
                     sum(cnt) OVER (PARTITION BY g ORDER BY e, key) AS cum
              FROM b),
      est AS (SELECT t.g, t.q_ppm,
                     CAST(min(((c.key << c.shift)
                               + ((c.key + 1) << c.shift) - 1) // 2) AS BIGINT) AS dd_est
              FROM tgt t JOIN cum c ON c.g = t.g AND c.cum >= t.target
              GROUP BY 1, 2)"""

  /** v27's DuckDB twin — residual IVF-PQ retrained end-to-end: coarse
    * Lloyd step ([[kmTrainCtes]]) → per-vector residual in
    * [[PipelineQueries.ResOff]] re-offset units → residual codebook
    * seeded from the residual slices of the [[PipelineQueries.PqK]]
    * smallest vec_ids and refined one exact-integer Lloyd step (the
    * pqTrainCtes arithmetic on residual slices) → encode → serve with a
    * PER-PROBED-CELL query ADC table (the residual-encoding signature:
    * the query's residual depends on which cell is searched).
    * MATERIALIZED on every multi-referenced stage (the t28 lesson). */
  private lazy val residualPqServeSql: String =
    residualServeSql(kmTrainCtes, "ka0", "kcent1")

  /** v29's DuckDB twin: the residual serve with the coarse quantizer
    * trained to CONVERGENCE — [[lloydChainCtes]]' full unrolled loop
    * feeding [[residualServeSql]]'s residual-codebook retrain + per-cell
    * ADC replay against the FINAL state kc[[PipelineQueries.V25Iters]]. */
  private lazy val convergedResidualServeSql: String =
    residualServeSql(lloydChainCtes, "q", s"kc${PipelineQueries.V25Iters}")

  /** The residual-IVF-PQ retrain + serve replay over an ARBITRARY coarse
    * training chain (`coarseCtes` must define centroid table `centT`
    * (cell, cent) and leave `uT` (vec_id, u) in scope) — shared by
    * v27/v28 (1-step coarse, [[kmTrainCtes]]) and v29 (converged coarse,
    * [[lloydChainCtes]]): one residual arithmetic, no drift. */
  private def residualServeSql(coarseCtes: String, uT: String,
                               centT: String): String = {
    val P = PipelineQueries
    val mm = s"(SELECT unnest(range(0, ${P.PqSub})) AS m) mm"
    s"""
      WITH $embCte,
      $quantCte,
      $coarseCtes,
      s1c AS MATERIALIZED (SELECT $uT.vec_id, c.cell,
                     list_sum(list_transform(range(1, 65),
                       i -> ($uT.u[i] - c.cent[i]) * ($uT.u[i] - c.cent[i]))) AS dist
              FROM $uT, $centT c),
      asg AS MATERIALIZED (SELECT vec_id, cell AS vcell
              FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist ASC, cell) AS rn FROM s1c)
              WHERE rn = 1),
      resid AS MATERIALIZED (SELECT q.vec_id, a.vcell,
                     list_transform(range(1, 65),
                       i -> q.u[i] - c.cent[i] + ${P.ResOff}) AS r
              FROM q JOIN asg a ON a.vec_id = q.vec_id
                     JOIN $centT c ON c.cell = a.vcell),
      rsub AS MATERIALIZED (SELECT vec_id, mm.m AS m,
                     r[mm.m * ${P.PqDim} + 1 : mm.m * ${P.PqDim} + ${P.PqDim}] AS su
              FROM resid, $mm),
      seeds AS MATERIALIZED (SELECT m, list(su ORDER BY vec_id) AS sl
              FROM rsub WHERE vec_id < ${P.PqK} GROUP BY m),
      ra0 AS (SELECT vec_id, m, su,
                     CAST(list_position(s, list_min(s)) AS INTEGER) AS code0
              FROM (SELECT r.vec_id, r.m, r.su,
                      [list_sum(list_transform(range(1, ${P.PqDim} + 1),
                         i -> (r.su[i] - sd.sl[k+1][i]) * (r.su[i] - sd.sl[k+1][i])))
                       for k in range(0, ${P.PqK})] AS s
                    FROM rsub r JOIN seeds sd ON sd.m = r.m) t0),
      rupd AS (SELECT m, code0 AS code, g.i, sum(su[g.i]) AS susum, count(*) AS n
               FROM ra0, generate_series(1, ${P.PqDim}) g(i)
               GROUP BY 1, 2, 3),
      rcent1 AS (SELECT m, code,
                        list(CAST((2*susum + n) // (2*n) AS BIGINT) ORDER BY i) AS cent
                 FROM rupd GROUP BY m, code, n),
      rcents AS MATERIALIZED (SELECT m, list(cent ORDER BY code) AS cl
                 FROM rcent1 GROUP BY m),
      rdl AS MATERIALIZED (SELECT r.vec_id, r.m,
                    list_transform(c.cl, cc ->
                      list_sum(list_transform(range(1, ${P.PqDim} + 1),
                        i -> (r.su[i] - cc[i]) * (r.su[i] - cc[i])))) AS dl
             FROM rsub r JOIN rcents c ON c.m = r.m),
      rco AS MATERIALIZED (SELECT vec_id, m,
                    CAST(list_position(dl, list_min(dl)) AS INTEGER) AS ci
             FROM rdl),
      probe AS MATERIALIZED (SELECT vec_id AS q_id, cell
                FROM (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                               ORDER BY dist ASC, cell) AS crk
                      FROM s1c WHERE vec_id < 5)
                WHERE crk <= ${P.IvfProbe}),
      qres AS (SELECT p.q_id, p.cell,
                      list_transform(range(1, 65),
                        i -> q.u[i] - c.cent[i] + ${P.ResOff}) AS qr
               FROM probe p JOIN q ON q.vec_id = p.q_id
                            JOIN $centT c ON c.cell = p.cell),
      qsub AS (SELECT q_id, cell, mm.m AS m,
                      qr[mm.m * ${P.PqDim} + 1 : mm.m * ${P.PqDim} + ${P.PqDim}] AS su
               FROM qres, $mm),
      qd AS MATERIALIZED (SELECT s.q_id, s.cell, s.m,
                    list_transform(c.cl, cc ->
                      list_sum(list_transform(range(1, ${P.PqDim} + 1),
                        i -> (s.su[i] - cc[i]) * (s.su[i] - cc[i])))) AS dl
             FROM qsub s JOIN rcents c ON c.m = s.m),
      cand AS (SELECT p.q_id, a.vec_id, a.vcell
               FROM probe p JOIN asg a ON a.vcell = p.cell
               WHERE a.vec_id <> p.q_id),
      contrib AS (SELECT cand.q_id, cand.vec_id, cand.vcell, qd.dl[rco.ci] AS dpart
                  FROM cand
                  JOIN rco ON rco.vec_id = cand.vec_id
                  JOIN qd ON qd.q_id = cand.q_id AND qd.cell = cand.vcell
                         AND qd.m = rco.m),
      adc AS (SELECT q_id, vec_id, vcell, CAST(sum(dpart) AS BIGINT) AS adc_dist
              FROM contrib GROUP BY 1, 2, 3),
      rr AS (SELECT q_id, vec_id, vcell, adc_dist,
                    row_number() OVER (PARTITION BY q_id
                                       ORDER BY adc_dist, vec_id) AS rk
             FROM adc)
      SELECT q_id, rk, vec_id, vcell AS cell, adc_dist FROM rr
      WHERE rk <= 5 ORDER BY q_id, rk"""
  }

  /** v25's DuckDB twin — the [[PipelineQueries.V25Iters]]-step Lloyd loop
    * UNROLLED (g1's unrolled-iteration oracle discipline): kc0 is the
    * quantized seed literal; each step assigns (first-min, lowest-cell
    * tie-break), updates by HALF_UP integer mean, and the report row for
    * iteration t compares assignment t against assignment t−1 and sums
    * the rounded per-vector distances — exactly what the Spark side
    * serves from its persisted state. Requires [[quantCte]]'s `q`. */
  /** The unrolled Lloyd chain shared by v25 (report) and v26 (serving
    * on the converged state): kc0 = the quantized seed literal; per step
    * t, assignment la$t under kc$t and update → kc${t+1}. Requires
    * [[quantCte]]'s `q`. MATERIALIZED throughout — DuckDB 1.0 re-inlines
    * multi-referenced CTEs and the chain expands exponentially without
    * it (the t28 lesson, SCALE.md §7m). */
  private lazy val lloydChainCtes: String = {
    val n = PipelineQueries.V25Iters
    val seeds = PipelineQueries.IvfCentroids.map(_.map(d =>
      (math.floor(d * 1e6 + 0.5).toLong + PipelineQueries.KmOff).toString)
      .mkString("[", ",", "]")).mkString("[", ",", "]")
    val kc0 = s"""
      kc0 AS MATERIALIZED (SELECT k + 1 AS cell, cq[k + 1] AS cent
              FROM (SELECT $seeds AS cq), range(0, ${PipelineQueries.IvfCells}) t(k))"""
    // per step t: assignment under kc{t}; per step t < n: update → kc{t+1}
    val steps = (0 to n).map { t =>
      val asg = s"""
      ls$t AS (SELECT q.vec_id, c.cell,
                      list_sum(list_transform(range(1, 65),
                        i -> (q.u[i] - c.cent[i]) * (q.u[i] - c.cent[i]))) AS dist
               FROM q, kc$t c),
      la$t AS MATERIALIZED (SELECT vec_id, cell, dist
               FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY dist ASC, cell) AS rn FROM ls$t)
               WHERE rn = 1)"""
      val upd = if (t == n) "" else s""",
      lu${t + 1} AS (SELECT a.cell, g.i, sum(q.u[g.i]) AS su, count(*) AS n
               FROM la$t a JOIN q USING (vec_id), generate_series(1, 64) g(i)
               GROUP BY 1, 2),
      kc${t + 1} AS MATERIALIZED (SELECT cell,
                      list(CAST((2*su + n) // (2*n) AS BIGINT) ORDER BY i) AS cent
               FROM lu${t + 1} GROUP BY cell, n)"""
      asg + upd
    }.mkString(",")
    kc0 + "," + steps
  }

  private lazy val v25LloydSql: String = {
    val n = PipelineQueries.V25Iters
    val reports = (1 to n).map { t =>
      s"""SELECT CAST($t AS BIGINT) AS iter,
                (SELECT count(*) FROM kc$t) AS n_cells,
                CAST(sum(CASE WHEN cur.cell <> prev.cell THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
                CAST(sum((cur.dist + 500000) // 1000000) AS BIGINT) AS inertia_u
         FROM la$t cur JOIN la${t - 1} prev USING (vec_id)"""
    }.mkString(" UNION ALL ")
    s"""
      WITH $embCte,
      $quantCte,
      $lloydChainCtes
      SELECT * FROM ($reports) ORDER BY iter"""
  }

  /** t27's DuckDB twin — the [[PipelineQueries.T27Iters]]-step BPE merge
    * loop UNROLLED (v25's discipline). Token sequences use the same
    * chr(1)/chr(2) start/end marker encoding, the per-iteration best
    * pair is a scalar subquery (never a re-escaped literal), and the
    * merge is the same left-to-right non-overlapping `replace`. */
  private lazy val bpeTrainCtes: String = bpeTrainCtesN(PipelineQueries.T27Iters)

  private def bpeTrainCtesN(n: Int): String = {
    // NB triple-quoted Scala: \1 below reaches DuckDB as the RE2 group ref
    val base = s"""
      btok AS (SELECT unnest(string_split(lower(text), ' ')) AS term
               FROM documents),
      bwf AS (SELECT term, COUNT(*) AS freq FROM btok GROUP BY term),
      bseq1 AS MATERIALIZED (SELECT term,
                       regexp_replace(term, '(.)', chr(1) || '\\1' || chr(2), 'g') AS seq,
                       freq
                FROM bwf)"""
    // every step merges (bseq${n+1} = the fully-trained encode table t28
    // reads; unreferenced CTEs cost nothing in t27's report query)
    val steps = (1 to n).map { t =>
      s"""
      btk$t AS MATERIALIZED (SELECT seq, freq,
                       list_transform(list_filter(string_split(seq, chr(1)), x -> x <> ''),
                                      x -> substring(x, 1, length(x) - 1)) AS toks
                FROM bseq$t),
      bpr$t AS (SELECT s.toks[CAST(g.i AS INT)] AS c1,
                       s.toks[CAST(g.i AS INT) + 1] AS c2,
                       CAST(sum(s.freq) AS BIGINT) AS pf,
                       COUNT(DISTINCT s.seq) AS n_types
                FROM btk$t s, unnest(range(1, len(s.toks))) AS g(i)
                GROUP BY 1, 2),
      bbest$t AS MATERIALIZED (SELECT c1, c2, pf, n_types FROM bpr$t
                  ORDER BY pf DESC, c1, c2 LIMIT 1),
      bseq${t + 1} AS MATERIALIZED (SELECT term, replace(seq,
                         chr(1) || (SELECT c1 FROM bbest$t) || chr(2) ||
                         chr(1) || (SELECT c2 FROM bbest$t) || chr(2),
                         chr(1) || (SELECT c1 FROM bbest$t) ||
                                   (SELECT c2 FROM bbest$t) || chr(2)) AS seq,
                       freq
                FROM bseq$t)"""
    }.mkString(",")
    base + "," + steps
  }

  private lazy val t27BpeSql: String = t27BpeSqlN(PipelineQueries.T27Iters)

  /** The unrolled BPE training report for an arbitrary round count —
    * shared by t27 (the fixed 6-round demo) and t27b (the vocab-size
    * target): one merge-loop SQL, no drift. */
  private def t27BpeSqlN(n: Int): String = {
    val reports = (1 to n).map { t =>
      s"""SELECT CAST($t AS BIGINT) AS iter, c1, c2, pf, n_types FROM bbest$t"""
    }.mkString(" UNION ALL ")
    s"""
      WITH ${bpeTrainCtesN(n)}
      SELECT * FROM ($reports) ORDER BY iter"""
  }

  /** t28's DuckDB twin: t27's training CTEs chained into the encode
    * join — per-doc word counts against the fully-merged word→tokens
    * dictionary (bseq${PipelineQueries.T27Iters + 1}). */
  private lazy val t28BpeEncodeSql: String = {
    val fin = PipelineQueries.T27Iters + 1
    s"""
      WITH $bpeTrainCtes,
      benc AS (SELECT term,
                      len(list_filter(string_split(seq, chr(1)), x -> x <> '')) AS toks_per_word,
                      length(term) AS chars_per_word
               FROM bseq$fin),
      bdt AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
              FROM documents),
      bdc AS (SELECT doc_id, term, COUNT(*) AS c FROM bdt GROUP BY 1, 2)
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_words,
             CAST(sum(c * chars_per_word) AS BIGINT) AS n_chars,
             CAST(sum(c * toks_per_word) AS BIGINT) AS n_tokens
      FROM bdc JOIN benc USING (term)
      GROUP BY doc_id ORDER BY doc_id"""
  }

  /** Shared CTE chain of d16's repeated-substring cut (gram marks →
    * covered positions → per-doc surviving words + rebuilt text): ends at
    * `kept` (doc_id, kept_words, ktext — docs cut to zero absent) with
    * `d` (doc_id, w, n_words) still in scope. Reused by pipe6, which
    * packs the cut corpus. */
  private lazy val d16CutCtes: String = s"""
      lg AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      d AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_words FROM lg),
      ex AS (SELECT doc_id, unnest(range(0, len(w) - ${PipelineQueries.DupSpanGram} + 1)) AS i, w
             FROM lg WHERE len(w) >= ${PipelineQueries.DupSpanGram}),
      g AS (SELECT doc_id, i,
                   array_to_string(w[i + 1:i + ${PipelineQueries.DupSpanGram}], ' ') AS gram
            FROM ex),
      occ AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
      mk AS (SELECT g.doc_id, g.i FROM g JOIN occ USING (gram)),
      cov AS (SELECT DISTINCT mk.doc_id, mk.i + u.u AS p
              FROM mk, (SELECT unnest(range(0, ${PipelineQueries.DupSpanGram})) AS u) u),
      wd AS (SELECT doc_id, unnest(range(0, len(w))) AS p, w FROM d),
      wd2 AS (SELECT doc_id, p, w[p + 1] AS word FROM wd),
      kept AS (SELECT wd2.doc_id, count(*) AS kept_words,
                      string_agg(wd2.word, ' ' ORDER BY wd2.p) AS ktext
               FROM wd2 LEFT JOIN cov
                 ON cov.doc_id = wd2.doc_id AND cov.p = wd2.p
               WHERE cov.p IS NULL
               GROUP BY wd2.doc_id)"""

  /** d16's full one-shot cut report — also d17's oracle (the incremental
    * run must converge to exactly this). */
  private lazy val d16CutSql: String = s"""
      WITH $d16CutCtes
      SELECT d.doc_id, d.n_words,
             CAST(coalesce(k.kept_words, 0) AS BIGINT) AS kept_words,
             CAST(d.n_words - coalesce(k.kept_words, 0) AS BIGINT) AS cut_tokens,
             md5(coalesce(k.ktext, '')) AS kept_md5
      FROM d LEFT JOIN kept k USING (doc_id)
      ORDER BY d.doc_id"""

  private val embCte =
    """e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      |      FROM embeddings),
      |n AS (SELECT vec_id, v,
      |             sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
      |      FROM e)""".stripMargin

  private[queries] def d19CanonicalSqlWhere(edgeCond: String): String =
    s"""
      WITH RECURSIVE $shingleCte,
      pairs AS (
        SELECT a_id, b_id FROM (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
                 CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS uni
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
        WHERE 2 * inter >= uni $edgeCond),
      e AS (SELECT a_id AS u, b_id AS v FROM pairs
            UNION ALL SELECT b_id, a_id FROM pairs),
      verts AS (SELECT DISTINCT u AS v FROM e),
      reach(x, y) AS (
        SELECT v, v FROM verts
        UNION
        SELECT r.x, e.v FROM reach r JOIN e ON e.u = r.y),
      lab AS MATERIALIZED (
        SELECT x AS doc_id, MIN(y) AS component_id FROM reach GROUP BY x),
      sz AS (SELECT component_id, COUNT(*) AS cluster_size
             FROM lab GROUP BY component_id),
      qd AS (SELECT d.doc_id, d.text, CAST(length(d.text) AS BIGINT) AS len_c,
                    string_split(lower(d.text), ' ') AS w
             FROM documents d JOIN lab ON lab.doc_id = d.doc_id),
      qf AS (SELECT doc_id,
                    CAST(len(w) AS BIGINT) AS n_words,
                    len(list_filter(w, x -> x IN ${inList(PipelineQueries.StopEn)}))
                      * 1000000 // len(w) AS f_stop6,
                    (len_c - (len(w) - 1)) * 1000000 // len(w) AS f_meanlen6,
                    CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT)
                      * 1000000 // greatest(len_c, 1) AS f_sym6
             FROM qd),
      ql AS (SELECT doc_id, ${PipelineQueries.T19WStop} * f_stop6
                            - (abs(f_meanlen6 - ${PipelineQueries.T19MeanTarget})
                               // ${PipelineQueries.T19MeanDiv})
                            - ${PipelineQueries.T19WSym} * f_sym6
                            + ${PipelineQueries.T19WLen}
                              * least(n_words, ${PipelineQueries.T19LenCap})
                            - ${PipelineQueries.T19Intercept} AS logit6
             FROM qf),
      win AS MATERIALIZED (
        SELECT lab.component_id, lab.doc_id, ql.logit6,
               row_number() OVER (PARTITION BY lab.component_id
                                  ORDER BY ql.logit6 DESC, lab.doc_id) AS rk
        FROM lab JOIN ql USING (doc_id)),
      best AS (SELECT component_id, doc_id AS canonical_doc,
                      logit6 AS canonical_logit6
               FROM win WHERE rk = 1)
      SELECT w.doc_id, w.component_id, sz.cluster_size, w.logit6,
             b.canonical_doc, b.canonical_logit6,
             w.doc_id = b.canonical_doc AS keep
      FROM win w
      JOIN best b USING (component_id)
      JOIN sz USING (component_id)
      ORDER BY w.doc_id"""

  private[queries] val d19CanonicalSql: String = d19CanonicalSqlWhere("")

  private[queries] val g4TrianglesSql: String =
    s"""
      WITH $shingleCte,
      pairs AS MATERIALIZED (
        SELECT a_id, b_id FROM (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
                 CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS uni
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
        WHERE 2 * inter >= uni),
      deg AS (SELECT v, COUNT(*) AS deg FROM (
                SELECT a_id AS v FROM pairs
                UNION ALL SELECT b_id FROM pairs) GROUP BY v),
      tri AS (SELECT p1.a_id AS x, p1.b_id AS y, p2.b_id AS z
              FROM pairs p1
              JOIN pairs p2 ON p2.a_id = p1.b_id
              JOIN pairs p3 ON p3.a_id = p1.a_id AND p3.b_id = p2.b_id),
      tc AS (SELECT v, COUNT(*) AS tri_cnt FROM (
               SELECT x AS v FROM tri
               UNION ALL SELECT y FROM tri
               UNION ALL SELECT z FROM tri) GROUP BY v)
      SELECT deg.v AS doc_id, deg.deg AS degree,
             COALESCE(tc.tri_cnt, 0) AS tri_cnt,
             CASE WHEN deg.deg >= 2
                  THEN 2 * COALESCE(tc.tri_cnt, 0) * 1000000
                       // (deg.deg * (deg.deg - 1))
                  ELSE 0 END AS lcc_ppm
      FROM deg LEFT JOIN tc USING (v)
      ORDER BY doc_id"""

  /** t30's Hamilton chain + t31's instance/position/pack chain over an
    * injected doc CTE list ending in `d(g, doc_id, tok)` — shared by the
    * t31 oracle (full corpus) and pipe7 (deduped + gated survivors). */
  private def epochOrderSql(dCtes: String): String = s"""

      WITH $dCtes,
      st AS (SELECT g, SUM(tok)::BIGINT AS src_tok,
                    CASE ${PipelineQueries.MixSharePermille.map { case (s, r) =>
        s"WHEN g = '$s' THEN $r" }.mkString(" ")}
                         ELSE ${PipelineQueries.MixShareDefault} END AS share
             FROM d GROUP BY g),
      tot AS (SELECT SUM(share)::BIGINT AS s FROM st),
      q AS (SELECT g, src_tok,
                   ${PipelineQueries.T30BudgetTokens} * share // tot.s AS base,
                   ${PipelineQueries.T30BudgetTokens} * share % tot.s AS rem
            FROM st, tot),
      sb AS (SELECT SUM(base)::BIGINT AS sb FROM q),
      bud AS (SELECT g, src_tok,
                     base + CASE WHEN row_number() OVER (ORDER BY rem DESC, g)
                                      <= ${PipelineQueries.T30BudgetTokens} - sb.sb
                                 THEN 1 ELSE 0 END AS budget
              FROM q, sb),
      per AS (SELECT g, budget, budget // src_tok AS full_epochs,
                     budget % src_tok AS remt
              FROM bud),
      c AS (SELECT g, doc_id, tok,
                   SUM(tok) OVER (PARTITION BY g
                                  ORDER BY ('0x' || substr(md5('t30:' || doc_id::VARCHAR), 1, 15))::BIGINT,
                                           doc_id) AS cum
            FROM d),
      plan AS (SELECT c.g AS source, c.doc_id, c.tok,
                      per.full_epochs
                        + CASE WHEN c.cum <= per.remt THEN 1 ELSE 0 END AS repeats
               FROM c JOIN per USING (g)),
      inst AS (SELECT source, doc_id, tok,
                      unnest(range(0, repeats)) AS epoch
               FROM plan WHERE repeats >= 1),
      pos AS (SELECT source, doc_id, epoch, tok,
                     ('0x' || substr(md5('t31:' || doc_id::VARCHAR || ':'
                                         || epoch::VARCHAR), 1, 15))::BIGINT AS pos
              FROM inst),
      cm AS (SELECT *, CAST(SUM(tok) OVER (ORDER BY pos, doc_id, epoch) AS BIGINT)
                         AS cum_tokens
             FROM pos)
      SELECT source, doc_id, epoch, tok AS n_tokens, pos, cum_tokens,
             CAST((cum_tokens - tok) // ${PipelineQueries.ShardBudget} AS BIGINT)
               AS shard_id
      FROM cm ORDER BY pos, doc_id, epoch"""

  private[queries] val k12RollupSql: String =
    s"""
      WITH v AS (SELECT DISTINCT event_type AS g,
                        CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                        ('0x' || substr(md5('k12:' || user_id::VARCHAR), 1, 12))::BIGINT AS h
                 FROM events),
      ds AS (SELECT g, day, h,
                    row_number() OVER (PARTITION BY g, day ORDER BY h) AS rk
             FROM v),
      dk AS (SELECT g, day, h FROM ds WHERE rk <= ${PipelineQueries.K12k}),
      dayrows AS (SELECT g, day, COUNT(*) AS n, MAX(h) AS theta
                  FROM dk GROUP BY g, day),
      dayex AS (SELECT g, day, COUNT(*) AS exact_distinct FROM v GROUP BY g, day),
      tu AS (SELECT DISTINCT g, h FROM dk),
      tr AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rk
             FROM tu),
      tk AS (SELECT g, h FROM tr WHERE rk <= ${PipelineQueries.K12k}),
      totrows AS (SELECT g, 'ALL' AS day, COUNT(*) AS n, MAX(h) AS theta
                  FROM tk GROUP BY g),
      totex AS (SELECT g, COUNT(DISTINCT h) AS exact_distinct FROM v GROUP BY g),
      u AS (SELECT d.g, d.day, d.n, d.theta, e.exact_distinct
            FROM dayrows d JOIN dayex e USING (g, day)
            UNION ALL
            SELECT t.g, t.day, t.n, t.theta, e.exact_distinct
            FROM totrows t JOIN totex e USING (g))
      SELECT g AS event_type, day, n, theta,
             CASE WHEN n < ${PipelineQueries.K12k} THEN n
                  ELSE (${PipelineQueries.K12k - 1} * ${PipelineQueries.K11M})
                         // greatest(theta, 1) END AS est_distinct,
             exact_distinct,
             abs(CASE WHEN n < ${PipelineQueries.K12k} THEN n
                      ELSE (${PipelineQueries.K12k - 1} * ${PipelineQueries.K11M})
                             // greatest(theta, 1) END
                 - exact_distinct) * 1000000
               // greatest(exact_distinct, 1) AS err_ppm
      FROM u ORDER BY event_type, day"""

  private val baseA: Map[String, String] = Map(

    "d1_exact_dedup" -> """
      SELECT doc_id, lang, source, n_chars FROM (
        SELECT doc_id, lang, source, n_chars,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents) t
      WHERE rn = 1 ORDER BY doc_id""",

    // exact all-pairs ground truth: the LSH path must reproduce it
    "d2_minhash_lsh" -> s"""
      WITH $shingleCte
      SELECT a_id, b_id, inter * 1000000 // uni AS jaccard_ppm FROM (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
               CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS uni
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
      WHERE 2 * inter >= uni ORDER BY a_id, b_id""",

    // incremental admission graded DECLARATIVELY: admitted ⇔ no verified
    // near-dup with a smaller doc_id (the admitted set is
    // batch-partition-invariant — the bucket join is symmetric and
    // "earlier" is doc_id order), so the oracle needs no store replay;
    // uni > 0 guards the both-empty-shingle pair the engine's bucket
    // path structurally never generates
    "d15_incremental_neardup" -> s"""
      WITH $shingleCte,
      nd AS (SELECT count(*) AS n FROM documents),
      pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_distinct(list_concat(a.sh, b.sh))) > 0
          AND 2 * len(list_intersect(a.sh, b.sh))
              >= len(list_distinct(list_concat(a.sh, b.sh)))),
      blk AS (SELECT b_id, min(a_id) AS blocker_id, count(*) AS n_blockers
              FROM pairs GROUP BY b_id)
      SELECT d.doc_id,
             CAST(least(${D15Batches - 1},
                        d.doc_id * $D15Batches
                          // greatest((SELECT n FROM nd), 1)) AS INT) AS batch,
             blk.blocker_id IS NULL AS admitted,
             CAST(coalesce(blk.n_blockers, 0) AS BIGINT) AS n_blockers,
             blk.blocker_id
      FROM documents d LEFT JOIN blk ON blk.b_id = d.doc_id
      ORDER BY d.doc_id""",

    // delete-aware admission graded DECLARATIVELY end-to-end: admitted ⇔
    // no verified near-dup among SURVIVING smaller docs; readmitted ⇔
    // blocked in the full corpus but admitted among survivors. The
    // engine's store DELETE + bounded re-admission protocol must land on
    // exactly this — no replay of the state machine anywhere.
    "d18_delete_readmission" -> s"""
      WITH $shingleCte,
      pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_distinct(list_concat(a.sh, b.sh))) > 0
          AND 2 * len(list_intersect(a.sh, b.sh))
              >= len(list_distinct(list_concat(a.sh, b.sh)))),
      blks AS (SELECT b_id, min(a_id) AS blocker_id, count(*) AS n_blockers
               FROM pairs
               WHERE a_id % ${PipelineQueries.D18RetireMod} <> ${PipelineQueries.D18RetireRem}
                 AND b_id % ${PipelineQueries.D18RetireMod} <> ${PipelineQueries.D18RetireRem}
               GROUP BY b_id),
      blkf AS (SELECT DISTINCT b_id FROM pairs)
      SELECT d.doc_id,
             blks.blocker_id IS NULL AS admitted,
             CAST(coalesce(blks.n_blockers, 0) AS BIGINT) AS n_blockers,
             blks.blocker_id,
             (blkf.b_id IS NOT NULL AND blks.blocker_id IS NULL) AS readmitted
      FROM documents d
      LEFT JOIN blks ON blks.b_id = d.doc_id
      LEFT JOIN blkf ON blkf.b_id = d.doc_id
      WHERE d.doc_id % ${PipelineQueries.D18RetireMod} <> ${PipelineQueries.D18RetireRem}
      ORDER BY d.doc_id""",

    // DOC-level takedown graded declaratively END TO END: the admission
    // verdict among survivors (d18's oracle) composed with the CC
    // labeling over surviving pairs (d6's recursive closure) — one row
    // per surviving doc. The engine's two store machines (frame-keyed
    // deletes + bounded re-admission; incident-edge retirement + scoped
    // component recompute) must land on exactly what a one-shot engine
    // computes from the surviving corpus alone.
    "g2c_doc_takedown" -> {
      val M = PipelineQueries.D18RetireMod
      val R = PipelineQueries.D18RetireRem
      s"""
      WITH RECURSIVE $shingleCte,
      allp AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_distinct(list_concat(a.sh, b.sh))) > 0
          AND 2 * len(list_intersect(a.sh, b.sh))
              >= len(list_distinct(list_concat(a.sh, b.sh)))),
      spairs AS (SELECT a_id, b_id FROM allp
                 WHERE a_id % $M <> $R AND b_id % $M <> $R),
      blks AS (SELECT b_id, min(a_id) AS blocker_id, count(*) AS n_blockers
               FROM spairs GROUP BY b_id),
      blkf AS (SELECT DISTINCT b_id FROM allp),
      e AS (SELECT a_id AS u, b_id AS v FROM spairs
            UNION ALL SELECT b_id, a_id FROM spairs),
      verts AS (SELECT DISTINCT u AS v FROM e),
      reach(x, y) AS (
        SELECT v, v FROM verts
        UNION
        SELECT r.x, e.v FROM reach r JOIN e ON e.u = r.y),
      lab AS (SELECT x AS doc_id, MIN(y) AS canonical_id FROM reach GROUP BY x),
      sz AS (SELECT canonical_id, COUNT(*) AS cluster_size
             FROM lab GROUP BY canonical_id)
      SELECT d.doc_id,
             blks.blocker_id IS NULL AS admitted,
             CAST(coalesce(blks.n_blockers, 0) AS BIGINT) AS n_blockers,
             blks.blocker_id,
             (blkf.b_id IS NOT NULL AND blks.blocker_id IS NULL) AS readmitted,
             lab.canonical_id, sz.cluster_size
      FROM documents d
      LEFT JOIN blks ON blks.b_id = d.doc_id
      LEFT JOIN blkf ON blkf.b_id = d.doc_id
      LEFT JOIN lab ON lab.doc_id = d.doc_id
      LEFT JOIN sz ON sz.canonical_id = lab.canonical_id
      WHERE d.doc_id % $M <> $R
      ORDER BY d.doc_id"""
    },

    // exact all-pairs ORDERED containment — the prefix-filtered engine
    // path must reproduce it bit-for-bit (the asymmetric prefix prune is
    // lossless for containment >= t, so no candidate logic is mirrored)
    "d12_url_dedup" -> s"""
      WITH $UrlCanonCtes
      SELECT doc_id, url, canonical_url,
             count(*) OVER (PARTITION BY canonical_url) AS cluster_size,
             min(doc_id) OVER (PARTITION BY canonical_url) AS canonical_doc,
             CAST(doc_id <> min(doc_id) OVER (PARTITION BY canonical_url) AS INT) AS is_dup
      FROM c ORDER BY doc_id""",
    // exact ALL-PAIRS Levenshtein ≤ 1 — deliberately independent of the
    // engine's SymSpell deletion-neighborhood blocking, so the oracle
    // genuinely tests recall (a dropped candidate reds the hash). The
    // length band |len a − len b| ≤ 1 is implied by lev ≤ 1 (each edit
    // moves length by at most one) — a lossless speedup, not blocking.
    "d14_fuzzy_join" -> """
      SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
             CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      FROM customer a JOIN customer b
        ON a.c_custkey < b.c_custkey
       AND abs(length(a.c_name) - length(b.c_name)) <= 1
       AND levenshtein(a.c_name, b.c_name) <= 1
      ORDER BY a_id, b_id""",

    // exact ALL-PAIRS Levenshtein ≤ 2 over DISTINCT names — independent
    // of the engine's 2-deletion-neighborhood blocking, so a dropped
    // candidate reds the hash. The |len a − len b| ≤ 2 band is implied
    // by lev ≤ 2 — lossless speedup, not blocking. Name-pair level
    // (rep ids + group sizes + implied id-pair count) by design: the
    // k = 2 id expansion is k²-output-bound on replicated tiers.
    "d14b_fuzzy_join_k2" -> """
      WITH g AS (SELECT c_name AS name, min(c_custkey) AS rid,
                        CAST(count(*) AS BIGINT) AS n
                 FROM customer GROUP BY c_name)
      SELECT a.rid AS a_id, b.rid AS b_id,
             CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
             a.n AS a_n, b.n AS b_n,
             CAST(a.n * b.n AS BIGINT) AS n_id_pairs
      FROM g a JOIN g b
        ON a.rid < b.rid
       AND abs(length(a.name) - length(b.name)) <= 2
       AND levenshtein(a.name, b.name) <= 2
      ORDER BY a_id, b_id""",

    // d14b's id expansion, bounded: each side's duplicate group capped
    // to its 3 smallest ids, cross-name pairs (all-pairs lev ≤ 2 over
    // distinct names — independent of the engine's SymSpell blocking)
    // expanded capped×capped, plus same-name dist-0 pairs among capped
    // members. Channels are disjoint (an id has exactly one name).
    "d14c_fuzzy_expand" -> """
      WITH g AS (SELECT c_name AS name, min(c_custkey) AS rid
                 FROM customer GROUP BY c_name),
      cap AS (SELECT name, id FROM (
                SELECT c_name AS name, c_custkey AS id,
                       row_number() OVER (PARTITION BY c_name
                                          ORDER BY c_custkey) AS rn
                FROM customer) WHERE rn <= 3),
      np AS (SELECT a.name AS a_name, b.name AS b_name,
                    CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
             FROM g a JOIN g b
               ON a.rid < b.rid
              AND abs(length(a.name) - length(b.name)) <= 2
              AND levenshtein(a.name, b.name) <= 2)
      SELECT least(x.id, y.id) AS a_id, greatest(x.id, y.id) AS b_id, dist
      FROM np JOIN cap x ON x.name = np.a_name
              JOIN cap y ON y.name = np.b_name
      UNION ALL
      SELECT x.id, y.id, CAST(0 AS BIGINT) AS dist
      FROM cap x JOIN cap y ON x.name = y.name AND x.id < y.id
      ORDER BY a_id, b_id""",

    "d11_containment" -> s"""
      WITH $shingleCte
      SELECT a_id, b_id, inter * 1000000 // na AS containment_ppm FROM (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
               CAST(len(a.sh) AS BIGINT) AS na
        FROM sh a JOIN sh b ON a.doc_id != b.doc_id
        WHERE len(a.sh) >= 1 AND len(b.sh) >= 1) t
      WHERE 5 * inter >= 4 * na ORDER BY a_id, b_id""",

    "d3_simhash" -> """
      WITH docs AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      h AS (SELECT doc_id,
                   list_transform(w, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS h
            FROM docs)
      SELECT doc_id,
             list_sum([CASE WHEN list_sum(list_transform(h, v ->
                         CASE WHEN (v >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                       THEN (1::BIGINT << j) ELSE 0::BIGINT END
                       for j in range(0, 60)])::BIGINT AS simhash
      FROM h ORDER BY doc_id""",

    "k5_curation_funnel" -> s"""
      WITH RECURSIVE $shingleCte,
      pairs AS (
        SELECT a_id, b_id FROM (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
                 CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS uni
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
        WHERE 2 * inter >= uni),
      e AS (SELECT a_id AS u, b_id AS v FROM pairs
            UNION ALL SELECT b_id, a_id FROM pairs),
      verts AS (SELECT DISTINCT u AS v FROM e),
      reach(x, y) AS (
        SELECT v, v FROM verts
        UNION
        SELECT r.x, e.v FROM reach r JOIN e ON e.u = r.y),
      noncanon AS (SELECT x AS doc_id FROM reach GROUP BY x HAVING x != MIN(y)),
      lg AS (SELECT doc_id, string_split(lower(text), ' ') AS lw FROM documents),
      gg AS (SELECT doc_id,
                    unnest([array_to_string(lw[i:i+${PipelineQueries.DecontGram - 1}], ' ')
                            for i in range(1, len(lw) - ${PipelineQueries.DecontGram - 2})]) AS g
             FROM lg WHERE len(lw) >= ${PipelineQueries.DecontGram}),
      cont AS (SELECT DISTINCT tr.doc_id
               FROM gg tr JOIN gg ev ON tr.g = ev.g
               WHERE tr.doc_id % ${PipelineQueries.DecontMod} != 0
                 AND ev.doc_id % ${PipelineQueries.DecontMod} = 0),
      fl AS (
        SELECT d.doc_id, d.source,
               ceil(d.n_chars / 4.0)::BIGINT AS est_tokens,
               (d.doc_id % ${PipelineQueries.DecontMod} != 0) AS f_train,
               (d.doc_id % ${PipelineQueries.DecontMod} != 0
                AND d.doc_id NOT IN (SELECT doc_id FROM noncanon)) AS f_dedup,
               (d.doc_id % ${PipelineQueries.DecontMod} != 0
                AND d.doc_id NOT IN (SELECT doc_id FROM noncanon)
                AND d.doc_id NOT IN (SELECT doc_id FROM cont)) AS f_decont
        FROM documents d),
      fq AS (
        SELECT fl.*,
               (fl.f_decont AND
                (least(100, len(lg.lw))::BIGINT * len(lg.lw)
                 + 100 * len(list_filter(lg.lw, x -> x IN ${inList(StopEn)})))
                * 5000 // len(lg.lw) >= ${CorpusPrep.QualityMinPpm}) AS f_quality
        FROM fl JOIN lg USING (doc_id)),
      fs AS (
        SELECT fq.*,
               (fq.f_quality AND
                ('0x' || substr(md5(fq.doc_id::VARCHAR), 1, 15))::BIGINT % 1000 <
                CASE ${SampleRatePermille.map { case (l, r) =>
                  s"WHEN d.lang = '$l' THEN $r" }.mkString(" ")}
                     ELSE $SampleRateDefault END) AS f_sample
        FROM fq JOIN documents d USING (doc_id)),
      ms AS (SELECT source, SUM(est_tokens)::BIGINT AS src_tokens,
                    CASE ${PipelineQueries.MixSharePermille.map { case (src, r) =>
        s"WHEN source = '$src' THEN $r" }.mkString(" ")}
                         ELSE ${PipelineQueries.MixShareDefault} END AS share_pm
             FROM fs WHERE f_sample GROUP BY source),
      mb AS (SELECT MIN(src_tokens * 1000 // share_pm) AS budget FROM ms),
      mr AS (SELECT source, least(1000, mb.budget * share_pm // src_tokens) AS keep_pm
             FROM ms, mb),
      fm AS (
        SELECT fs.*,
               (fs.f_sample AND
                ('0x' || substr(md5('mix:' || fs.doc_id::VARCHAR), 1, 15))::BIGINT
                  % 1000 < coalesce(mr.keep_pm, 0)) AS f_mix
        FROM fs LEFT JOIN mr USING (source))
      SELECT count(*) AS n_docs,
             count(*) FILTER (f_train) AS n_train,
             count(*) FILTER (f_dedup) AS n_after_dedup,
             count(*) FILTER (f_decont) AS n_after_decont,
             count(*) FILTER (f_quality) AS n_after_quality,
             count(*) FILTER (f_sample) AS n_after_sample,
             count(*) FILTER (f_mix) AS n_after_mix
      FROM fm""",

    // exact per-source-pair shingle-set Jaccard + the 32-slot MinHash
    // estimate, both recomputed verbatim (md5 slot hashes are
    // cross-engine — the t4 recipe — so the SKETCH itself is graded
    // bit-for-bit, not just the exact join it approximates)
    // Count-Min grid replayed bit-for-bit: same md5 row-prefixed bucket
    // hashes (60-bit positive, so % == pmod), same per-cell integer sums,
    // same min-over-rows estimate — the estimates sit on the hashed
    // surface, not behind an error-bound boolean
    "k7_count_min" -> s"""
      WITH toks AS (SELECT t.tok
                    FROM documents d,
                         unnest(string_split(lower(d.text), ' ')) AS t(tok)
                    WHERE len(t.tok) > 0),
      counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
      rws AS (SELECT unnest(range(0, ${PipelineQueries.CmDepth})) AS r),
      cells AS (SELECT r.r,
                       ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || t.tok), 1, 15))::BIGINT
                         % ${PipelineQueries.CmWidth} AS b,
                       count(*) AS cell
                FROM toks t CROSS JOIN rws r GROUP BY 1, 2),
      top AS (SELECT tok, n,
                     row_number() OVER (ORDER BY n DESC, tok) AS rk
              FROM counts),
      probes AS (SELECT top.tok, top.n, top.rk, r.r,
                        ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || top.tok), 1, 15))::BIGINT
                          % ${PipelineQueries.CmWidth} AS b
                 FROM top CROSS JOIN rws r
                 WHERE top.rk <= ${PipelineQueries.CmTopK})
      SELECT p.rk, p.tok, CAST(p.n AS BIGINT) AS n,
             CAST(min(c.cell) AS BIGINT) AS cm_est,
             CAST(min(c.cell) - p.n AS BIGINT) AS overcount
      FROM probes p JOIN cells c ON c.r = p.r AND c.b = p.b
      GROUP BY p.rk, p.tok, p.n ORDER BY p.rk""",

    // HLL registers rebuilt bit-for-bit (same 60-bit md5 parse, same
    // ltrim-bin rank), raw estimate from the identical embedded constant
    // over the exact-integer denominator, error as all-positive div
    "k8_hll_distinct" -> s"""
      WITH toks AS (SELECT t.tok
                    FROM documents d,
                         unnest(string_split(lower(d.text), ' ')) AS t(tok)
                    WHERE len(t.tok) > 0),
      hh AS (SELECT ('0x' || substr(md5('hll:' || tok), 1, 15))::BIGINT AS h
             FROM toks),
      rg AS (SELECT h % ${PipelineQueries.HllBuckets} AS bucket,
                    55 - length(ltrim(bin(h // ${PipelineQueries.HllBuckets}), '0')) AS r
             FROM hh),
      regs AS (SELECT bucket, max(r) AS register FROM rg GROUP BY 1),
      grid AS (SELECT g.b AS bucket, COALESCE(regs.register, 0) AS register
               FROM (SELECT unnest(range(0, ${PipelineQueries.HllBuckets})) AS b) g
               LEFT JOIN regs ON regs.bucket = g.b),
      summ AS (SELECT CASE WHEN raw_d <= ${2.5 * PipelineQueries.HllBuckets}
                                AND v_zero > 0
                           THEN CAST(floor(${PipelineQueries.HllBuckets}.0
                                  * ln(${PipelineQueries.HllBuckets}.0
                                       / CAST(v_zero AS DOUBLE)) + 0.5) AS BIGINT)
                           ELSE CAST(floor(raw_d + 0.5) AS BIGINT) END AS hll_est
               FROM (SELECT ${PipelineQueries.HllAConst}
                       / CAST(sum(1::BIGINT << CAST(55 - register AS INT)) AS DOUBLE) AS raw_d,
                            sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS v_zero
                     FROM grid)),
      ex AS (SELECT count(DISTINCT tok) AS exact_distinct FROM toks)
      SELECT CAST(g.bucket AS BIGINT) AS bucket,
             CAST(g.register AS BIGINT) AS register,
             s.hll_est,
             CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
             CAST(s.hll_est * 1000000 // ex.exact_distinct - 1000000 AS BIGINT) AS err_ppm
      FROM grid g, summ s, ex ORDER BY bucket""",

    // DDSketch-style quantile audit — all-integer: log₂ bucket via
    // unpadded bin() (the k8 contract), target rank ⌈q·n⌉, estimate =
    // midpoint of the first bucket whose cumulative count reaches it,
    // graded against the exact rank walk per (source, quantile)
    "k9_dd_quantiles" -> s"""
      WITH ${ddEstCtes(PipelineQueries.DdQuantilesPpm)},
      dcum AS (SELECT g, v, sum(c) OVER (PARTITION BY g ORDER BY v) AS cum
               FROM (SELECT g, v, count(*) AS c FROM v GROUP BY 1, 2)),
      ex AS (SELECT t.g, t.q_ppm, CAST(min(d.v) AS BIGINT) AS exact_v
             FROM tgt t JOIN dcum d ON d.g = t.g AND d.cum >= t.target
             GROUP BY 1, 2)
      SELECT est.g AS source, est.q_ppm, est.dd_est, ex.exact_v,
             CAST(est.dd_est * 1000000 // ex.exact_v - 1000000 AS BIGINT) AS err_ppm
      FROM est JOIN ex ON est.g = ex.g AND est.q_ppm = ex.q_ppm
      ORDER BY source, est.q_ppm""",

    // the sketch used operationally: keep each source's middle 80% by
    // length, bounds from the same DDSketch walk (shared ddEstCtes —
    // one estimator, no drift)
    "t29_quantile_trim" -> s"""
      WITH ${ddEstCtes(PipelineQueries.T29TrimPpm)},
      bounds AS (SELECT g,
                   min(CASE WHEN q_ppm = ${PipelineQueries.T29TrimPpm.head}
                            THEN dd_est END) AS lo_bound,
                   min(CASE WHEN q_ppm = ${PipelineQueries.T29TrimPpm(1)}
                            THEN dd_est END) AS hi_bound
                 FROM est GROUP BY g)
      SELECT d.doc_id, d.source, d.n_chars, bo.lo_bound, bo.hi_bound,
             d.n_chars >= bo.lo_bound AND d.n_chars <= bo.hi_bound AS kept
      FROM documents d JOIN bounds bo ON bo.g = d.source
      WHERE d.n_chars >= 1 ORDER BY d.doc_id""",

    // the STREAMED HLL grid must equal the one-shot grid: k8's register
    // CTEs, emitted raw — a dropped batch lowers a register and reds the
    // hash (redelivery CAN'T shift it: max-merge is idempotent)
    "k8s_stream_hll" -> s"""
      WITH toks AS (SELECT t.tok
                    FROM documents d,
                         unnest(string_split(lower(d.text), ' ')) AS t(tok)
                    WHERE len(t.tok) > 0),
      hh AS (SELECT ('0x' || substr(md5('hll:' || tok), 1, 15))::BIGINT AS h
             FROM toks),
      rg AS (SELECT h % ${PipelineQueries.HllBuckets} AS bucket,
                    55 - length(ltrim(bin(h // ${PipelineQueries.HllBuckets}), '0')) AS r
             FROM hh),
      regs AS (SELECT bucket, max(r) AS register FROM rg GROUP BY 1)
      SELECT CAST(g.b AS BIGINT) AS bucket,
             CAST(COALESCE(regs.register, 0) AS BIGINT) AS register
      FROM (SELECT unnest(range(0, ${PipelineQueries.HllBuckets})) AS b) g
      LEFT JOIN regs ON regs.bucket = g.b
      ORDER BY bucket""",

    // the STREAMED grid must equal the one-shot grid: same cells CTE as
    // k7, emitted raw — any double-counted redelivery or dropped batch
    // shifts a cell and reds the hash
    // Duffield-Lund-Thorup priority sample: per-source top-k by
    // p = (w·2⁶⁰)/(h+1) — the ONE double formula both engines compute
    // identically, used for ordering only; τ = the (k+1)-th priority;
    // the unbiased estimate max(w, τ) reaches the hashed surface as a
    // per-row floor into 1e-6-unit bigints (never an order-dependent
    // float aggregate)
    "k10_priority_sample" -> {
      val k = PipelineQueries.K10k
      s"""
      WITH v AS (SELECT source AS g, doc_id, n_chars AS wt,
                        ('0x' || substr(md5('k10:' || doc_id::VARCHAR), 1, 15))::BIGINT AS h
                 FROM documents WHERE n_chars >= 1),
      r AS (SELECT g, doc_id, wt, h,
                   CAST(wt AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
                     / CAST(h + 1 AS DOUBLE) AS p
            FROM v),
      rk AS (SELECT g, doc_id, wt, h, p,
                    row_number() OVER (PARTITION BY g
                                       ORDER BY p DESC, doc_id) AS rk
             FROM r),
      tau AS (SELECT g, p AS tau FROM rk WHERE rk = ${k + 1})
      SELECT rk.g AS source, rk.rk, rk.doc_id, rk.wt AS n_chars, rk.h,
             CAST(floor(greatest(CAST(rk.wt AS DOUBLE), COALESCE(tau.tau, 0.0))
                        * 1000000.0 + 0.5) AS BIGINT) AS est_w_e6
      FROM rk LEFT JOIN tau USING (g)
      WHERE rk.rk <= $k
      ORDER BY source, rk"""
    },

    // the DLT subset-sum estimate recomputed from the same k+1 sample
    // rows the store holds, plus the planted ≤k source whose estimate
    // must be EXACT (τ = 0 by construction); sums cast to BIGINT (DuckDB
    // sum(BIGINT) is HUGEINT, which the type audit refuses)
    "k10b_subset_sum" -> {
      val k = PipelineQueries.K10k
      val seedVals = PipelineQueries.K10bSeed.map { case (id, g, w) =>
        s"('$g', CAST($id AS BIGINT), CAST($w AS BIGINT))" }.mkString(", ")
      s"""
      WITH docs AS (
        SELECT source AS g, doc_id, n_chars AS wt FROM documents WHERE n_chars >= 1
        UNION ALL
        SELECT g, doc_id, wt FROM (VALUES $seedVals) AS s(g, doc_id, wt)),
      v AS (SELECT g, doc_id, wt,
                   ('0x' || substr(md5('k10:' || doc_id::VARCHAR), 1, 15))::BIGINT AS h
            FROM docs),
      r AS (SELECT g, doc_id, wt,
                   CAST(wt AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
                     / CAST(h + 1 AS DOUBLE) AS p
            FROM v),
      kept AS (SELECT * FROM (
                 SELECT g, doc_id, wt, p,
                        row_number() OVER (PARTITION BY g
                                           ORDER BY p DESC, doc_id) AS rk
                 FROM r) WHERE rk <= ${k + 1}),
      tau AS (SELECT g, p AS tau FROM kept WHERE rk = ${k + 1}),
      est AS (SELECT kept.g, count(*) AS n_sample,
                     CAST(sum(CAST(floor(greatest(CAST(kept.wt AS DOUBLE),
                                                  COALESCE(tau.tau, 0.0))
                                         * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                       AS est_total_e6
              FROM kept LEFT JOIN tau USING (g)
              WHERE kept.rk <= $k GROUP BY kept.g),
      tz AS (SELECT g, count(*) <= $k AS tau_zero FROM kept GROUP BY g),
      ex AS (SELECT g, CAST(sum(wt) * 1000000 AS BIGINT) AS exact_total_e6
             FROM docs GROUP BY g)
      SELECT est.g AS source, est.n_sample, tz.tau_zero,
             est.est_total_e6, ex.exact_total_e6,
             est.est_total_e6 * 1000 // ex.exact_total_e6 AS ratio_pm
      FROM est JOIN tz USING (g) JOIN ex USING (g)
      ORDER BY source"""
    },

    // KMV/theta sketch set algebra replayed end to end: the k-smallest
    // windows, the union sketch, the membership-count intersection
    // estimate AND the exact eval columns — all integer, bit-equal
    // the day partials and the partial-merged rollup replayed with the
    // same windows and the same (n, θ) law — the merge identity (min-k of
    // the day min-k's ≡ min-k of the raw union) holds exactly, so both
    // engines land on identical rollup rows without the oracle ever
    // materializing a "direct" total sketch
    "k12_rollup_distinct" -> k12RollupSql,

    // the streamed partial build must land on the identical serve —
    // micro-batch boundaries, redelivery and the per-cell min-k replay
    // are invisible in the final (day, rollup) table
    "k12s_stream_rollup" -> k12RollupSql,

    "k11_theta_sketch" -> {
      val k = PipelineQueries.K11k
      val km1m = (PipelineQueries.K11k - 1).toLong * PipelineQueries.K11M
      val seedVals = PipelineQueries.K11Seed.map { case (g, h) =>
        s"('$g', CAST($h AS BIGINT))" }.mkString(", ")
      s"""
      WITH docs AS (SELECT source AS g, string_split(lower(text), ' ') AS w
                    FROM documents
                    WHERE len(string_split(lower(text), ' ')) >= 3),
      g0 AS (SELECT g, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                               for i in range(1, len(w) - 1)]) AS s
             FROM docs),
      vals AS MATERIALIZED (
        SELECT DISTINCT g, h FROM (
          SELECT g, ('0x' || substr(md5(s), 1, 12))::BIGINT AS h FROM g0
          UNION ALL
          SELECT g, h FROM (VALUES $seedVals) AS sd(g, h))),
      kept AS MATERIALIZED (
        SELECT g, h FROM (
          SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rk
          FROM vals) WHERE rk <= $k),
      ps AS (SELECT g, COUNT(*) AS n_kept, MAX(h) AS theta FROM kept GROUP BY g),
      est AS (SELECT g, CASE WHEN n_kept < $k THEN n_kept
                             ELSE $km1m // greatest(theta, 1) END AS est
              FROM ps),
      pl AS MATERIALIZED (
        SELECT a.g AS a, b.g AS b, a.est AS est_a, b.est AS est_b
        FROM est a JOIN est b ON a.g < b.g),
      uni AS (SELECT p.a, p.b, k.h,
                     MAX(CASE WHEN k.g = p.a THEN 1 ELSE 0 END) AS in_a,
                     MAX(CASE WHEN k.g = p.b THEN 1 ELSE 0 END) AS in_b
              FROM pl p JOIN kept k ON k.g = p.a OR k.g = p.b
              GROUP BY 1, 2, 3),
      ur AS (SELECT a, b, h, in_a, in_b,
                    row_number() OVER (PARTITION BY a, b ORDER BY h) AS rk,
                    COUNT(*) OVER (PARTITION BY a, b) AS nm
             FROM uni),
      pa AS (SELECT a, b, nm, COUNT(*) AS m, MAX(h) AS theta_u,
                    CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                         AS BIGINT) AS rho
             FROM ur WHERE rk <= $k GROUP BY 1, 2, 3),
      pe AS (SELECT a, b, rho, m,
                    CASE WHEN nm < $k THEN nm
                         ELSE $km1m // greatest(theta_u, 1) END AS est_union
             FROM pa),
      sz AS MATERIALIZED (SELECT g, COUNT(*) AS n FROM vals GROUP BY g),
      ix AS (SELECT x.g AS a, y.g AS b, COUNT(*) AS exact_inter
             FROM vals x JOIN vals y ON x.h = y.h AND x.g < y.g
             GROUP BY 1, 2)
      SELECT p.a AS src_a, p.b AS src_b, pe.rho, p.est_a, p.est_b,
             pe.est_union,
             (pe.rho * pe.est_union) // pe.m AS est_inter,
             pe.rho * 1000000 // pe.m AS jacc_est_ppm,
             za.n + zb.n - COALESCE(ix.exact_inter, 0) AS exact_union,
             COALESCE(ix.exact_inter, 0) AS exact_inter
      FROM pl p
      JOIN pe ON pe.a = p.a AND pe.b = p.b
      LEFT JOIN ix ON ix.a = p.a AND ix.b = p.b
      JOIN sz za ON za.g = p.a
      JOIN sz zb ON zb.g = p.b
      ORDER BY src_a, src_b"""
    },

    // the streamed KMV state must BIT-EQUAL the one-shot sketch of the
    // streamed corpus (no seed): min-k union through redelivery + replay
    "k11s_stream_theta" -> s"""
      WITH docs AS (SELECT source AS g, string_split(lower(text), ' ') AS w
                    FROM documents
                    WHERE len(string_split(lower(text), ' ')) >= 3),
      g0 AS (SELECT g, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                               for i in range(1, len(w) - 1)]) AS s
             FROM docs),
      vals AS (SELECT DISTINCT g,
                      ('0x' || substr(md5(s), 1, 12))::BIGINT AS h
               FROM g0)
      SELECT g AS source, rk, h FROM (
        SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rk
        FROM vals)
      WHERE rk <= ${PipelineQueries.K11k}
      ORDER BY source, rk""",

    // the streamed DDSketch deltas must SUM to the one-shot k9 grid —
    // an additive sketch graded bit-for-bit through redelivery + replay
    "k9s_stream_ddsketch" -> s"""
      WITH v AS (SELECT source AS g, n_chars AS v FROM documents
                 WHERE n_chars >= 1),
      b AS (SELECT g, CAST(length(bin(v)) - 1 AS BIGINT) AS e,
                   CAST(v >> greatest(length(bin(v)) - 1 - ${PipelineQueries.DdSubBits}, 0)
                        AS BIGINT) AS key,
                   count(*) AS cnt
            FROM v GROUP BY 1, 2, 3)
      SELECT g, e, key, cnt FROM b ORDER BY g, e, key""",

    "k7s_stream_sketch" -> s"""
      WITH toks AS (SELECT t.tok
                    FROM documents d,
                         unnest(string_split(lower(d.text), ' ')) AS t(tok)
                    WHERE len(t.tok) > 0),
      rws AS (SELECT unnest(range(0, ${PipelineQueries.CmDepth})) AS r)
      SELECT r.r,
             ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || t.tok), 1, 15))::BIGINT
               % ${PipelineQueries.CmWidth} AS b,
             count(*) AS cell
      FROM toks t CROSS JOIN rws r
      GROUP BY 1, 2 ORDER BY r, b""",

    "k6_corpus_overlap" -> s"""
      WITH docs AS (SELECT source, string_split(lower(text), ' ') AS w
                    FROM documents
                    WHERE len(string_split(lower(text), ' ')) >= 3),
      g0 AS (SELECT source, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                    for i in range(1, len(w) - 1)]) AS s
             FROM docs),
      g AS (SELECT DISTINCT source, md5(s) AS sdig FROM g0),
      sz AS (SELECT source, COUNT(*) AS n FROM g GROUP BY source),
      gb AS (SELECT source,
                    ('0x' || substr(sdig, 1, 12))::BIGINT
                      % ${PipelineQueries.OverlapP} AS base
             FROM g),
      mins AS (SELECT source, i,
                      MIN((((i + 1) * 2654435761 % ${PipelineQueries.OverlapP}) * base
                           + (i * 1013904223 + 12345) % ${PipelineQueries.OverlapP})
                          % ${PipelineQueries.OverlapP}) AS h
               FROM gb CROSS JOIN (SELECT unnest(range(0, ${PipelineQueries.OverlapSlots})) AS i) s
               GROUP BY source, i),
      km AS (SELECT a.source AS src_a, b.source AS src_b,
                    COUNT(*) FILTER (WHERE a.h = b.h) AS k_matched
             FROM mins a JOIN mins b ON a.i = b.i AND a.source < b.source
             GROUP BY 1, 2),
      ix AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
             FROM g a JOIN g b ON a.sdig = b.sdig AND a.source < b.source
             GROUP BY 1, 2),
      pairs AS (SELECT a.source AS src_a, b.source AS src_b,
                       a.n AS na, b.n AS nb
                FROM sz a JOIN sz b ON a.source < b.source)
      SELECT p.src_a, p.src_b, p.na, p.nb,
             COALESCE(ix.inter, 0) AS inter,
             p.na + p.nb - COALESCE(ix.inter, 0) AS uni,
             COALESCE(ix.inter, 0) * 1000000
               // (p.na + p.nb - COALESCE(ix.inter, 0)) AS jaccard_ppm,
             km.k_matched,
             km.k_matched * 1000000 // ${PipelineQueries.OverlapSlots} AS est_ppm,
             abs(km.k_matched * 1000000 // ${PipelineQueries.OverlapSlots}
                 - COALESCE(ix.inter, 0) * 1000000
                     // (p.na + p.nb - COALESCE(ix.inter, 0))) AS err_ppm
      FROM pairs p
      JOIN km USING (src_a, src_b)
      LEFT JOIN ix USING (src_a, src_b)
      ORDER BY src_a, src_b""",

    // the 5 PageRank iterations unrolled as chained CTEs — integer fixed
    // point end to end, so every iteration is bit-identical to Spark's
    "g1_pagerank" -> {
      val iters = (1 to PipelineQueries.G1Iters).map { i =>
        s"""c$i AS (SELECT e.dst, CAST(SUM(r${i - 1}.r // 3) AS BIGINT) AS c
           |        FROM e JOIN r${i - 1} ON e.src = r${i - 1}.doc_id GROUP BY 1),
           |r$i AS (SELECT d.doc_id,
           |               150000000 // nn.n + COALESCE(c$i.c, 0) * 85 // 100 AS r
           |        FROM documents d CROSS JOIN nn
           |        LEFT JOIN c$i ON c$i.dst = d.doc_id)""".stripMargin
      }.mkString(",\n")
      s"""
      WITH nn AS (SELECT COUNT(*) AS n FROM documents),
      e0 AS (SELECT doc_id AS src, nn.n,
                    unnest([(doc_id * 1000003 + 7) % nn.n,
                            (doc_id * 2000003 + 11) % nn.n,
                            (doc_id * 3000017 + 13) % nn.n]) AS d0
             FROM documents, nn),
      e AS (SELECT src, CASE WHEN d0 = src THEN (d0 + 1) % n ELSE d0 END AS dst
            FROM e0),
      r0 AS (SELECT doc_id, 1000000000 // nn.n AS r FROM documents, nn),
      $iters,
      ind AS (SELECT dst AS doc_id, COUNT(*) AS in_deg FROM e GROUP BY 1)
      SELECT r${PipelineQueries.G1Iters}.doc_id,
             r${PipelineQueries.G1Iters}.r AS rank_ppb,
             COALESCE(ind.in_deg, 0) AS in_deg
      FROM r${PipelineQueries.G1Iters} LEFT JOIN ind USING (doc_id)
      ORDER BY doc_id"""
    },

    "t24_normalize" -> """
      WITH n AS (SELECT doc_id, text,
                        lower(text) AS s1,
                        regexp_replace(lower(text), '[.,!?;:]', '', 'g') AS s2
                 FROM documents),
      m AS (SELECT doc_id, text, s1, s2,
                   trim(regexp_replace(s2, ' +', ' ', 'g')) AS norm
            FROM n)
      SELECT doc_id,
             length(text) AS n_chars_raw,
             length(s1) - length(s2) AS n_punct,
             length(s2) - length(norm) AS n_ws_collapsed,
             length(norm) AS n_chars_norm,
             md5(norm) AS norm_md5
      FROM m ORDER BY doc_id""",

    "d13_dedup_eval" -> s"""
      WITH $shingleCte,
      h AS (SELECT doc_id,
                   list_transform(w, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS h
            FROM docs),
      sim AS (SELECT doc_id,
                     list_sum([CASE WHEN list_sum(list_transform(h, v ->
                                 CASE WHEN (v >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                               THEN (1::BIGINT << j) ELSE 0::BIGINT END
                               for j in range(0, 60)])::BIGINT AS simhash
              FROM h),
      bands AS (SELECT doc_id, b.b AS band,
                       (simhash >> (b.b * ${PipelineQueries.SimBandBits}))
                         & ${(1L << PipelineQueries.SimBandBits) - 1} AS v
                FROM sim, (SELECT unnest(range(0, ${PipelineQueries.SimBands})) AS b) b),
      cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
               FROM bands x JOIN bands y
                 ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id),
      exact AS (SELECT a_id, b_id FROM (
                  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                         CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
                         CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS uni
                  FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
                WHERE 2 * inter >= uni),
      m AS (SELECT (SELECT COUNT(*) FROM cand) AS n_cand,
                   (SELECT COUNT(*) FROM exact) AS n_exact,
                   (SELECT COUNT(*) FROM cand JOIN exact USING (a_id, b_id)) AS n_hit)
      SELECT n_cand, n_exact, n_hit,
             n_hit * 1000000 // NULLIF(n_cand, 0) AS precision_ppm,
             n_hit * 1000000 // NULLIF(n_exact, 0) AS recall_ppm
      FROM m""",

    "d4_ngram_jaccard" -> s"""
      WITH $shingleCte
      SELECT source, a_id, b_id, inter * 1000000 // uni AS jaccard_ppm FROM (
        SELECT a.source, a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
               CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS uni
        FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id) t
      WHERE 10 * inter >= 3 * uni ORDER BY source, a_id, b_id""",

    "d5_embedding_neardup" -> s"""
      WITH $embCte,
      pl AS (SELECT $duckNdPlanes AS planes),
      bk AS (SELECT n.vec_id, t.tbl,
                    list_sum([CASE WHEN list_sum(list_transform(range(1, len(n.v)+1),
                                i -> n.v[i] * planes[t.tbl+1][j+1][i])) > 0
                              THEN (1::BIGINT << j) ELSE 0::BIGINT END
                              for j in range(0, ${NdBits})])::BIGINT AS bucket
             FROM n, pl, (SELECT unnest(range(0, ${NdTables})) AS tbl) t),
      cand AS (SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
               FROM bk x JOIN bk y
                 ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
      s AS (SELECT c.a_id, c.b_id,
                   CAST(floor(list_sum(list_transform(range(1, len(a.v)+1),
                           i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) * 1000000.0 + 0.5) AS BIGINT) AS cos_e6
            FROM cand c JOIN n a ON a.vec_id = c.a_id JOIN n b ON b.vec_id = c.b_id)
      SELECT a_id, b_id, cos_e6 FROM s WHERE cos_e6 >= 300000 ORDER BY a_id, b_id""",

    // the NAIVE all-pairs range search — the Spark side's IVF cell prune
    // must be lossless for the hashes to match
    "v14_range_search" -> s"""
      WITH $embCte,
      q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
      s AS (SELECT q.q_id, n.vec_id,
                   CAST(floor(list_sum(list_transform(range(1, len(n.v)+1),
                           i -> n.v[i] * q.qv[i])) / (n.nrm * q.qn) * 1000000.0 + 0.5) AS BIGINT) AS cos_e6
            FROM n, q WHERE n.vec_id != q.q_id)
      SELECT q_id, vec_id, cos_e6 FROM s WHERE cos_e6 >= 300000
      ORDER BY q_id, vec_id""",

    "v1_cosine_topk" -> s"""
      WITH $embCte,
      q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
      s AS (SELECT q.q_id, n.vec_id,
                   CAST(floor(list_sum(list_transform(range(1, len(n.v)+1),
                           i -> n.v[i] * q.qv[i])) / (n.nrm * q.qn) * 1000000.0 + 0.5) AS BIGINT) AS cos_e6
            FROM n, q WHERE n.vec_id != q.q_id),
      r AS (SELECT q_id, vec_id, cos_e6,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos_e6 DESC, vec_id) AS rk
            FROM s)
      SELECT q_id, rk, vec_id, cos_e6 FROM r WHERE rk <= 10 ORDER BY q_id, rk""",

    "v2_ann_lsh" -> s"""
      WITH $embCte,
      pl AS (SELECT $duckPlanes AS planes),
      b AS (SELECT vec_id, v, nrm,
                   list_sum([CASE WHEN list_sum(list_transform(range(1, len(v)+1),
                               i -> v[i] * planes[j+1][i])) > 0
                             THEN (1::BIGINT << j) ELSE 0::BIGINT END
                             for j in range(0, 8)])::BIGINT AS bucket
            FROM n, pl),
      q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket AS q_bucket
            FROM b WHERE vec_id < 5),
      s AS (SELECT q.q_id, b.vec_id,
                   CAST(floor(list_sum(list_transform(range(1, len(b.v)+1),
                           i -> b.v[i] * q.qv[i])) / (b.nrm * q.qn) * 1000000.0 + 0.5) AS BIGINT) AS cos_e6
            FROM b JOIN q ON b.bucket = q.q_bucket AND b.vec_id != q.q_id),
      r AS (SELECT q_id, vec_id, cos_e6,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos_e6 DESC, vec_id) AS rk
            FROM s)
      SELECT q_id, rk, vec_id, cos_e6 FROM r WHERE rk <= 5 ORDER BY q_id, rk""",

    "v3_ann_ivf" -> s"""
      WITH $embCte,
      ct AS (SELECT ${PipelineQueries.IvfCentroids.map(c =>
        c.map(d => BigDecimal(d).bigDecimal.toPlainString).mkString("[", ",", "]"))
        .mkString("[", ",", "]")} AS cents,
                    ${PipelineQueries.IvfHalfSq.map(d =>
        BigDecimal(d).bigDecimal.toPlainString).mkString("[", ",", "]")} AS hs),
      a AS (SELECT n.vec_id, n.v, n.nrm,
                   [list_sum(list_transform(range(1, len(n.v)+1),
                      i -> n.v[i] * cents[k+1][i])) - hs[k+1]
                    for k in range(0, ${PipelineQueries.IvfCells})] AS s
            FROM n, ct),
      c AS (SELECT vec_id, v, nrm, s, list_position(s, list_max(s)) AS cell FROM a),
      q0 AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, cell,
                    [CASE WHEN i = cell THEN -1e18 ELSE s[i] END
                     for i in range(1, ${PipelineQueries.IvfCells + 1})] AS s2
             FROM c WHERE vec_id < 5),
      q AS (SELECT q_id, qv, qn,
                   unnest([cell, list_position(s2, list_max(s2))]) AS probe
            FROM q0),
      s AS (SELECT q.q_id, c.vec_id,
                   CAST(floor(list_sum(list_transform(range(1, len(c.v)+1),
                           i -> c.v[i] * q.qv[i])) / (c.nrm * q.qn) * 1000000.0 + 0.5) AS BIGINT) AS cos_e6
            FROM c JOIN q ON c.cell = q.probe AND c.vec_id != q.q_id),
      r AS (SELECT q_id, vec_id, cos_e6,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos_e6 DESC, vec_id) AS rk
            FROM s)
      SELECT q_id, rk, vec_id, cos_e6 FROM r WHERE rk <= 5 ORDER BY q_id, rk""",

    "v4_quantized_topk" -> s"""
      WITH $embCte,
      q8 AS (SELECT vec_id, v, nrm,
                    greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) / 127.0 AS s
             FROM n),
      qq AS (SELECT vec_id, v, nrm,
                    list_transform(v, x -> floor(x / s + 0.5)) AS q
             FROM q8),
      m AS (SELECT vec_id, v, nrm, q,
                   sqrt(list_sum(list_transform(q, x -> x*x))) AS qn
            FROM qq WHERE nrm > 0),
      qry AS (SELECT vec_id AS q_id, v AS pv, q AS pq, qn AS pqn, nrm AS pn
              FROM m WHERE vec_id < 5),
      sc AS (SELECT qry.q_id, m.vec_id,
                    CAST(floor(list_sum([m.q[i] * qry.pq[i] for i in range(1, len(m.q)+1)])
                          / (m.qn * qry.pqn) * 1000000.0 + 0.5) AS BIGINT) AS qcos_e6,
                    CAST(floor(list_sum([m.v[i] * qry.pv[i] for i in range(1, len(m.v)+1)])
                          / (m.nrm * qry.pn) * 1000000.0 + 0.5) AS BIGINT) AS cos_e6
             FROM m, qry WHERE m.vec_id != qry.q_id),
      r AS (SELECT q_id, vec_id, qcos_e6, cos_e6,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY qcos_e6 DESC, vec_id) AS rk
            FROM sc)
      SELECT q_id, rk, vec_id, qcos_e6, cos_e6 FROM r WHERE rk <= 5 ORDER BY q_id, rk""",

    // product quantization, all in 1e-6 fixed-point integers: encode every
    // vector as first-min sub-centroid indices per subspace, rank by the
    // query's exact code-distance table summed at the db vector's codes
    // (asymmetric distance) — integer-exact at any engine version
    "v6_pq_topk" -> s"""
      WITH $embCte,
      q0 AS (SELECT vec_id,
                    list_transform(v, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS u
             FROM e),
      cb AS (SELECT ${PipelineQueries.PqCodebookQ.map(m =>
        m.map(k => k.mkString("[", ",", "]")).mkString("[", ",", "]"))
        .mkString("[", ",", "]")} AS cq),
      dd AS (SELECT vec_id,
               [${(0 until PipelineQueries.PqSub).map(m =>
        s"""[list_sum(list_transform(range(1, ${PipelineQueries.PqDim + 1}),
           |    j -> (u[${m * PipelineQueries.PqDim} + j] - cq[${m + 1}][k+1][j])
           |         * (u[${m * PipelineQueries.PqDim} + j] - cq[${m + 1}][k+1][j])))
           |  for k in range(0, ${PipelineQueries.PqK})]""".stripMargin).mkString(",\n                ")}] AS dl
             FROM q0, cb),
      enc AS (SELECT vec_id, dl,
                     list_transform(dl, l -> list_position(l, list_min(l)) - 1) AS code
              FROM dd),
      qe AS (SELECT vec_id AS q_id, dl AS dq FROM enc WHERE vec_id < 5),
      sc AS (SELECT e2.vec_id, q.q_id,
                    CAST(list_sum(list_transform(range(1, ${PipelineQueries.PqSub + 1}),
                      m -> q.dq[m][e2.code[m] + 1])) AS BIGINT) AS adc_dist
             FROM enc e2, qe q WHERE e2.vec_id != q.q_id),
      r AS (SELECT q_id, vec_id, adc_dist,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY adc_dist, vec_id) AS rk
            FROM sc)
      SELECT q_id, rk, vec_id, adc_dist FROM r WHERE rk <= 5 ORDER BY q_id, rk""",

    // IVF-PQ: v3's literal-centroid cell assignment + probe selection prunes
    // candidates; v6's integer code distances rank them (asymmetric distance)
    "v7_ivfpq" -> ivfpqSql("TRUE"))

  /** The v7 IVF-PQ oracle, parameterized on a corpus-side predicate over
    * the candidate alias `e2` — `TRUE` is v7 itself; v16 passes the
    * survivor condition of its index DELETE so the served-after-maintenance
    * result is graded against exactly the surviving corpus. The query side
    * (`q0`) is NOT filtered: queries arrive with raw vectors at serving
    * time, deleted or not, as on a real serving node. */
  private def ivfpqSql(corpusCond: String): String = s"""
      WITH $embCte,
      ct AS (SELECT ${PipelineQueries.IvfCentroids.map(c =>
        c.map(d => BigDecimal(d).bigDecimal.toPlainString).mkString("[", ",", "]"))
        .mkString("[", ",", "]")} AS cents,
                    ${PipelineQueries.IvfHalfSq.map(d =>
        BigDecimal(d).bigDecimal.toPlainString).mkString("[", ",", "]")} AS hs),
      a AS (SELECT n.vec_id, n.v,
                   [list_sum(list_transform(range(1, len(n.v)+1),
                      i -> n.v[i] * cents[k+1][i])) - hs[k+1]
                    for k in range(0, ${PipelineQueries.IvfCells})] AS s
            FROM n, ct),
      c AS (SELECT vec_id, v, s, list_position(s, list_max(s)) AS cell FROM a),
      cb AS (SELECT ${PipelineQueries.PqCodebookQ.map(m =>
        m.map(k => k.mkString("[", ",", "]")).mkString("[", ",", "]"))
        .mkString("[", ",", "]")} AS cq),
      dd AS (SELECT c2.vec_id, c2.cell, c2.s,
               [${(0 until PipelineQueries.PqSub).map(m =>
        s"""[list_sum(list_transform(range(1, ${PipelineQueries.PqDim + 1}),
           |    j -> (u[${m * PipelineQueries.PqDim} + j] - cq[${m + 1}][k+1][j])
           |         * (u[${m * PipelineQueries.PqDim} + j] - cq[${m + 1}][k+1][j])))
           |  for k in range(0, ${PipelineQueries.PqK})]""".stripMargin)
        .mkString(",\n                ")}] AS dl
             FROM (SELECT vec_id, cell, s,
                     list_transform(v, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS u
                   FROM c) c2, cb),
      enc AS (SELECT vec_id, cell, s, dl,
                     list_transform(dl, l -> list_position(l, list_min(l)) - 1) AS code
              FROM dd),
      q0 AS (SELECT vec_id AS q_id, dl AS dq, cell,
                    [CASE WHEN i = cell THEN -1e18 ELSE s[i] END
                     for i in range(1, ${PipelineQueries.IvfCells + 1})] AS s2
             FROM enc WHERE vec_id < 5),
      q AS (SELECT q_id, dq,
                   unnest([cell, list_position(s2, list_max(s2))]) AS probe
            FROM q0),
      sc AS (SELECT q.q_id, e2.vec_id,
                    CAST(list_sum(list_transform(range(1, ${PipelineQueries.PqSub + 1}),
                      m -> q.dq[m][e2.code[m] + 1])) AS BIGINT) AS adc_dist
             FROM enc e2 JOIN q ON e2.cell = q.probe AND e2.vec_id != q.q_id
                  AND ($corpusCond)),
      r AS (SELECT q_id, vec_id, adc_dist,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY adc_dist, vec_id) AS rk
            FROM sc)
      SELECT q_id, rk, vec_id, adc_dist FROM r WHERE rk <= 5 ORDER BY q_id, rk"""

  private val baseB: Map[String, String] = Map(

    // BM25 in exact fixed-point integer arithmetic: rational idf surrogate
    // (2N−2df+1)/(2df+1) and fraction-cleared tf normalization (k1=6/5,
    // b=3/4, avgdl=T/N) — every operation an integer multiply/divide, so
    // score AND ranking are bit-identical to Spark's under any engine policy
    "v8_bm25" -> s"""
      WITH tok AS (SELECT doc_id,
                          CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
                          unnest(string_split(lower(text), ' ')) AS term
                   FROM documents),
      tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf
             FROM tok GROUP BY doc_id, dl, term),
      dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      nt AS (SELECT COUNT(*) AS n_docs,
                    SUM(CAST(len(string_split(lower(text), ' ')) AS BIGINT)) AS t_tokens
             FROM documents),
      qt AS (SELECT * FROM (VALUES ${Bm25Queries.flatMap { case (q, ts) =>
        ts.map(tm => s"($q, '$tm')") }.mkString(", ")}) AS v(query_id, term)),
      s AS (SELECT qt.query_id, tf.doc_id, tf.tf, tf.dl, dft.df,
                   nt.n_docs, nt.t_tokens
            FROM tf JOIN qt USING (term) JOIN dft USING (term), nt),
      c AS (SELECT query_id, doc_id,
                   ((2 * n_docs - 2 * df + 1) * 1000000) // (2 * df + 1) AS idf6,
                   (44 * tf * t_tokens * 1000000)
                     // (20 * tf * t_tokens + 6 * t_tokens + 18 * dl * n_docs) AS tfn6
            FROM s),
      g AS (SELECT query_id, doc_id, COUNT(*) AS n_hit,
                   CAST(SUM((idf6 * tfn6) // 1000000) AS BIGINT) AS score6
            FROM c GROUP BY query_id, doc_id),
      r AS (SELECT query_id, doc_id, n_hit, score6,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score6 DESC, doc_id) AS rk
            FROM g)
      SELECT query_id, rk, doc_id, n_hit, score6
      FROM r WHERE rk <= ${Bm25K} ORDER BY query_id, rk""",

    // MaxSim late interaction over the PqSub×PqDim sub-vector bags: every
    // component quantized once to 1e-3 integer units, then dots / maxes /
    // sums in exact integer arithmetic — DuckDB's 1-based list indexing
    // (k in 1..D) lands on the same positions as Spark's 0-based
    // (k in 0..D-1) because both walk i*D + k over their own base
    "v9_maxsim_rerank" -> s"""
      WITH $embCte,
      q0 AS (SELECT vec_id,
                    list_transform(v, x -> CAST(floor(x * 1000.0 + 0.5) AS BIGINT)) AS u
             FROM e),
      qs AS (SELECT vec_id AS q_id, u AS qu FROM q0 WHERE vec_id < 3),
      sc AS (SELECT qs.q_id, q0.vec_id,
                    CAST(list_sum([list_max([list_sum([qu[i * ${PipelineQueries.PqDim} + k]
                                                       * u[j * ${PipelineQueries.PqDim} + k]
                                    for k in range(1, ${PipelineQueries.PqDim + 1})])
                                  for j in range(0, ${PipelineQueries.PqSub})])
                      for i in range(0, ${PipelineQueries.PqSub})]) AS BIGINT) AS maxsim6
             FROM q0, qs WHERE q0.vec_id != qs.q_id),
      r AS (SELECT q_id, vec_id, maxsim6,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY maxsim6 DESC, vec_id) AS rk
            FROM sc)
      SELECT q_id, rk, vec_id, maxsim6 FROM r WHERE rk <= ${PipelineQueries.MaxSimK}
      ORDER BY q_id, rk""",

    // two FIXED-POINT Lloyd iterations from the IVF literal seeds: vectors
    // quantized once to shifted 1e-6 integer units (per-element single IEEE
    // ops — bit-identical in any engine), then argmin-L2 assignment, HALF_UP
    // integer centroid update ((2s+n) // 2n, all-positive), re-assignment and
    // 1e-6-unit inertia all in exact integer arithmetic — no float summation
    // anywhere, so no engine/version rounding policy can enter the hash
    "v5_kmeans" -> s"""
      WITH $embCte,
      $quantCte,
      $kmTrainCtes,
      s1 AS (SELECT ka0.vec_id, ka0.cell0, c.cell,
                    list_sum(list_transform(range(1, 65),
                      i -> (ka0.u[i] - c.cent[i]) * (ka0.u[i] - c.cent[i]))) AS dist
             FROM ka0, kcent1 c),
      a1 AS (SELECT vec_id, cell0, cell AS cell1,
                    CAST((dist + 500000) // 1000000 AS BIGINT) AS d2u
             FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                             ORDER BY dist ASC, cell) AS rn FROM s1)
             WHERE rn = 1)
      SELECT cell1 AS cell, count(*) AS n_members,
             CAST(sum(CASE WHEN cell1 <> cell0 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
             CAST(sum(d2u) AS BIGINT) AS inertia_u
      FROM a1 GROUP BY 1 ORDER BY 1""",

    // the closed train→encode→serve loop: the SAME retrain CTEs as v20,
    // then every vector re-encodes against the trained sub-centroid lists
    // (code-ascending, so positional indexes align across engines) and
    // ranks by asymmetric distance exactly as v6 — a drifting centroid or
    // a misaligned code index anywhere in the loop reds the hash
    "v21_trained_pq_serve" -> s"""
      WITH $embCte,
      $quantCte,
      $pqTrainCtes,
      cents AS (SELECT m, list(cent ORDER BY code) AS cl FROM cent1 GROUP BY m),
      dl AS (SELECT s.vec_id, s.m,
                    list_transform(c.cl, cc ->
                      list_sum(list_transform(range(1, ${PipelineQueries.PqDim} + 1),
                        i -> (s.su[i] - cc[i]) * (s.su[i] - cc[i])))) AS dl
             FROM sub s JOIN cents c ON c.m = s.m),
      co AS (SELECT vec_id, m,
                    CAST(list_position(dl, list_min(dl)) AS INTEGER) AS ci
             FROM dl),
      qd AS (SELECT vec_id AS q_id, m, dl FROM dl WHERE vec_id < 5),
      contrib AS (SELECT qd.q_id, co.vec_id, qd.dl[co.ci] AS dpart
                  FROM co JOIN qd ON qd.m = co.m AND co.vec_id != qd.q_id),
      adc AS (SELECT q_id, vec_id, CAST(sum(dpart) AS BIGINT) AS adc_dist
              FROM contrib GROUP BY 1, 2),
      rr AS (SELECT q_id, vec_id, adc_dist,
                    row_number() OVER (PARTITION BY q_id
                                       ORDER BY adc_dist, vec_id) AS rk
             FROM adc)
      SELECT q_id, rk, vec_id, adc_dist FROM rr
      WHERE rk <= 5 ORDER BY q_id, rk""",

    // PQ codebook training retrained END-TO-END: same offset units, same
    // integer HALF_UP centroid means, same (dist, code) tie-break — the
    // oracle recomputes the Lloyd step itself, not just the report
    "v20_pq_train" -> s"""
      WITH $embCte,
      $quantCte,
      $pqTrainCtes,
      s1 AS (SELECT a0.vec_id, a0.m, a0.code0, c.code,
                    list_sum(list_transform(range(1, ${PipelineQueries.PqDim} + 1),
                      i -> (a0.su[i] - c.cent[i]) * (a0.su[i] - c.cent[i]))) AS dist
             FROM a0 JOIN cent1 c ON c.m = a0.m),
      a1 AS (SELECT vec_id, m, code0, code AS code1,
                    CAST((dist + 500000) // 1000000 AS BIGINT) AS d2u
             FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, m
                             ORDER BY dist ASC, code) AS rn FROM s1)
             WHERE rn = 1)
      SELECT CAST(m AS BIGINT) AS m, code1 AS code, count(*) AS n_members,
             CAST(sum(CASE WHEN code1 <> code0 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
             CAST(sum(d2u) AS BIGINT) AS inertia_u
      FROM a1 GROUP BY 1, 2 ORDER BY 1, 2""",

    // the FULLY-trained IVF-PQ serving path retrained END-TO-END: the
    // coarse cells via the kmTrainCtes Lloyd step, the codebook via the
    // pqTrainCtes step (both shared verbatim with v5/v20/v21 — one
    // training, no drift), then assign → probe → ADC → rank replayed
    // declaratively. Candidates come ONLY from each query's IvfProbe
    // best trained cells, so a probe tie-break or assignment drift in
    // either engine reds the hash, not just a distance error.
    "v22_trained_ivf_serve" -> trainedIvfServeSql,

    // v23 persists v22's trained index through the snapshot store and
    // serves from the table — the RESULT must equal v22's per-run
    // rebuild verbatim (v15's discipline: persistence may not change a
    // single ranked row), so the oracle IS v22's end-to-end retrain SQL
    "v23_persisted_trained_ivf" -> trainedIvfServeSql,

    // v24 persists the same trained index PARTITIONED BY CELL and serves
    // through dynamic partition pruning — layout may change cost, never
    // results, so the oracle is again v22's end-to-end retrain SQL
    "v24_partitioned_trained_ivf" -> trainedIvfServeSql,

    // residual IVF-PQ retrained end-to-end (coarse step + residual
    // codebook from data-derived seeds) with the per-probed-cell query
    // ADC replay — the residual-encoding signature
    "v27_residual_pq" -> residualPqServeSql,

    // v28 persists v27's residual index partitioned by cell and serves
    // through DPP from the store — persistence and layout may change
    // cost, never a ranked row, so the oracle IS v27's end-to-end SQL
    "v28_persisted_residual" -> residualPqServeSql,
    // v29 composes the converged coarse quantizer (v25's full Lloyd
    // chain), the residual codebook retrain and the persisted
    // cell-partitioned serve — the oracle retrains the ENTIRE chain and
    // replays the per-cell ADC serve against the final state
    "v29_converged_residual" -> convergedResidualServeSql,

    // the full Lloyd training loop unrolled declaratively — per-iteration
    // n_cells/n_moved/inertia from the same exact-integer arithmetic the
    // Spark side persists through the store
    "v25_lloyd_convergence" -> v25LloydSql,

    // serving on the CONVERGED coarse quantizer: the whole chain retrains
    // and the serve replays against the final state — iteration-k drift reds it
    "v26_converged_ivf_serve" -> convergedIvfServeSql,

    // same-cell smaller-id neighbor at rounded cos_e6 ≥ SemThresh ⇒ duplicate
    "d7_semdedup" -> s"""
      WITH $embCte,
      ct AS (SELECT ${PipelineQueries.IvfCentroids.map(c =>
        c.map(d => BigDecimal(d).bigDecimal.toPlainString).mkString("[", ",", "]"))
        .mkString("[", ",", "]")} AS cents,
                    ${PipelineQueries.IvfHalfSq.map(d =>
        BigDecimal(d).bigDecimal.toPlainString).mkString("[", ",", "]")} AS hs),
      a AS (SELECT n.vec_id, n.v, n.nrm,
                   [list_sum(list_transform(range(1, len(n.v)+1),
                      i -> n.v[i] * cents[k+1][i])) - hs[k+1]
                    for k in range(0, ${PipelineQueries.IvfCells})] AS s
            FROM n, ct),
      c AS (SELECT vec_id, v, nrm, list_position(s, list_max(s)) AS cell FROM a),
      dup AS (SELECT DISTINCT x.vec_id
              FROM c x JOIN c y ON x.cell = y.cell AND y.vec_id < x.vec_id
              WHERE x.nrm > 0 AND y.nrm > 0
                AND CAST(floor(list_sum(list_transform(range(1, len(x.v)+1),
                            i -> x.v[i] * y.v[i])) / (x.nrm * y.nrm)
                      * 1000000.0 + 0.5) AS BIGINT)
                    >= ${(PipelineQueries.SemThresh * 1e6).toLong})
      SELECT c.vec_id, c.cell,
             CASE WHEN dup.vec_id IS NULL THEN 0 ELSE 1 END AS is_dup
      FROM c LEFT JOIN dup USING (vec_id)
      ORDER BY c.vec_id""",

    // groups by the gram STRING where the engine groups by its xxhash64 —
    // only counts leave either plan, so they agree (t8/t10 argument)
    "t11_repetition" -> s"""
      WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      bg0 AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
                                     for i in range(1, len(w))]) AS g
              FROM d WHERE len(w) >= 2),
      bg1 AS (SELECT doc_id, g, COUNT(*) AS c FROM bg0 GROUP BY doc_id, g),
      bg AS (SELECT doc_id, SUM(c)::BIGINT AS n_bigrams, COUNT(*) AS nd2,
                    MAX(c) AS top_bigram
             FROM bg1 GROUP BY doc_id),
      f0 AS (SELECT doc_id,
                    unnest([array_to_string(w[i:i+${PipelineQueries.RepGram - 1}], ' ')
                            for i in range(1, len(w) - ${PipelineQueries.RepGram - 2})]) AS g
             FROM d WHERE len(w) >= ${PipelineQueries.RepGram}),
      f AS (SELECT doc_id, COUNT(*) AS n_3grams, COUNT(DISTINCT g) AS nd5
            FROM f0 GROUP BY doc_id)
      SELECT d.doc_id, len(d.w) AS n_words,
             CAST(len(d.w) - len(list_distinct(d.w)) AS BIGINT) * 1000000
               // len(d.w) AS dup_word_ppm,
             CAST(top_bigram AS BIGINT) * 1000000 // n_bigrams AS top_bigram_ppm,
             CAST(n_3grams - nd5 AS BIGINT) * 1000000 // n_3grams AS dup_3gram_ppm
      FROM d LEFT JOIN bg USING (doc_id) LEFT JOIN f USING (doc_id)
      ORDER BY d.doc_id""",

    "t12_mix_rebalance" -> s"""
      WITH d AS (SELECT doc_id, source, ceil(n_chars / 4.0)::BIGINT AS est_tokens
                 FROM documents),
      s AS (SELECT source, SUM(est_tokens)::BIGINT AS src_tokens,
                   CASE ${PipelineQueries.MixSharePermille.map { case (s, r) =>
        s"WHEN source = '$s' THEN $r" }.mkString(" ")}
                        ELSE ${PipelineQueries.MixShareDefault} END AS share_pm
            FROM d GROUP BY source),
      b AS (SELECT MIN(src_tokens * 1000 // share_pm) AS budget FROM s),
      r AS (SELECT source, least(1000, b.budget * share_pm // src_tokens) AS keep_pm
            FROM s, b)
      SELECT d.doc_id, d.source, d.est_tokens, r.keep_pm,
             1000000000 // r.keep_pm AS weight_ppm
      FROM d JOIN r USING (source)
      WHERE ('0x' || substr(md5('mix:' || d.doc_id::VARCHAR), 1, 15))::BIGINT % 1000
            < r.keep_pm
      ORDER BY d.doc_id""",

    // Hamilton apportionment of the global token budget (quota floor +
    // largest remainders, ties by source), whole epochs by integer div,
    // the fractional epoch by hash-ordered token cumsum — all 64-bit
    // integer, every stage replayed declaratively
    "t30_epoch_plan" -> s"""
      WITH d AS (SELECT source AS g, doc_id, (n_chars + 3) // 4 AS tok
                 FROM documents),
      st AS (SELECT g, SUM(tok)::BIGINT AS src_tok,
                    CASE ${PipelineQueries.MixSharePermille.map { case (s, r) =>
        s"WHEN g = '$s' THEN $r" }.mkString(" ")}
                         ELSE ${PipelineQueries.MixShareDefault} END AS share
             FROM d GROUP BY g),
      tot AS (SELECT SUM(share)::BIGINT AS s FROM st),
      q AS (SELECT g, src_tok,
                   ${PipelineQueries.T30BudgetTokens} * share // tot.s AS base,
                   ${PipelineQueries.T30BudgetTokens} * share % tot.s AS rem
            FROM st, tot),
      sb AS (SELECT SUM(base)::BIGINT AS sb FROM q),
      bud AS (SELECT g, src_tok,
                     base + CASE WHEN row_number() OVER (ORDER BY rem DESC, g)
                                      <= ${PipelineQueries.T30BudgetTokens} - sb.sb
                                 THEN 1 ELSE 0 END AS budget
              FROM q, sb),
      per AS (SELECT g, budget, budget // src_tok AS full_epochs,
                     budget % src_tok AS remt
              FROM bud),
      c AS (SELECT g, doc_id, tok,
                   SUM(tok) OVER (PARTITION BY g
                                  ORDER BY ('0x' || substr(md5('t30:' || doc_id::VARCHAR), 1, 15))::BIGINT,
                                           doc_id) AS cum
            FROM d)
      SELECT c.g AS source, c.doc_id, c.tok AS n_tokens, per.full_epochs,
             CASE WHEN c.cum <= per.remt THEN 1 ELSE 0 END::BIGINT AS extra,
             per.full_epochs + CASE WHEN c.cum <= per.remt THEN 1 ELSE 0 END AS repeats,
             per.budget AS src_budget_tokens
      FROM c JOIN per USING (g)
      ORDER BY source, doc_id""",

    "t23_temperature_mix" -> """
      WITH d AS (SELECT doc_id, source, ceil(n_chars / 4.0)::BIGINT AS est_tokens
                 FROM documents),
      s AS (SELECT source, SUM(est_tokens)::BIGINT AS src_tokens FROM d GROUP BY source),
      sw AS (SELECT source, src_tokens,
                    CAST(floor(sqrt(src_tokens)) AS BIGINT) AS rw
             FROM s),
      t AS (SELECT SUM(src_tokens) // 2 AS budget,
                   SUM(rw) AS rsum FROM sw),
      r AS (SELECT source,
                   least(1000, (t.budget * rw // t.rsum) * 1000 // src_tokens)
                     AS keep_pm
            FROM sw, t)
      SELECT d.doc_id, d.source, d.est_tokens,
             CAST(r.keep_pm AS BIGINT) AS keep_pm,
             CAST(1000000000 // r.keep_pm AS BIGINT) AS weight_ppm
      FROM d JOIN r USING (source)
      WHERE ('0x' || substr(md5('temp:' || d.doc_id::VARCHAR), 1, 15))::BIGINT % 1000
            < r.keep_pm
      ORDER BY d.doc_id""",

    "t1_text_stats" -> s"""
      WITH d AS (SELECT doc_id, text, string_split(lower(text), ' ') AS w FROM documents),
      s AS (SELECT doc_id,
                   CAST(len(w) AS BIGINT) AS nt,
                   length(text) AS n_chars_m,
                   CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                        AS BIGINT) * 1000000 // length(text) AS punct_ppm,
                   CAST(len(list_filter(w, x -> x IN ${inList(StopEn)}))
                        AS BIGINT) AS n_stop
            FROM d)
      SELECT doc_id, nt AS n_tokens, n_chars_m, punct_ppm,
             n_stop * 1000000 // nt AS stop_ppm,
             (least(100, nt) * nt + 100 * n_stop) * 5000 // nt AS quality_ppm
      FROM s ORDER BY doc_id""",

    "t2_lang_id" -> s"""
      WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      s AS (SELECT doc_id,
                   len(list_filter(w, x -> x IN ${inList(StopEn)})) AS en_hits,
                   len(list_filter(w, x -> x IN ${inList(StopEs)})) AS es_hits,
                   len(list_filter(w, x -> x IN ${inList(StopDe)})) AS de_hits,
                   len(list_filter(w, x -> x IN ${inList(StopFr)})) AS fr_hits
            FROM d)
      SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
             CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                  WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
                  WHEN de_hits >= fr_hits THEN 'de'
                  ELSE 'fr' END AS lang_pred
      FROM s ORDER BY doc_id""",

    "t3_token_count" -> s"""
      SELECT doc_id,
             len(regexp_extract_all(text, '$tokenPattern')) AS n_bpe_tokens,
             CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_tokens
      FROM documents ORDER BY doc_id""",

    "t4_fingerprint" -> """
      WITH c AS (SELECT doc_id,
                        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                            '  +', ' ', 'g')) AS canon
                 FROM documents),
      w AS (SELECT doc_id, canon, string_split(canon, ' ') AS w FROM c)
      SELECT doc_id, md5(canon) AS fp_md5,
             CASE WHEN len(w) >= 5
                  THEN list_min([md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                                     || w[i+3] || ' ' || w[i+4])
                                 for i in range(1, len(w)-3)])
                  ELSE md5(canon) END AS fp_window_min
      FROM w ORDER BY doc_id""",

    "m2_frame_sample" -> """
      WITH d AS (SELECT doc_id, text, n_chars,
                        CAST(1 + n_chars % 8 AS INT) AS n_frames
                 FROM documents),
      f AS (SELECT doc_id, n_frames, text, n_chars,
                   unnest(range(0, n_frames)) AS frame_idx
            FROM d)
      SELECT doc_id, frame_idx, n_frames,
             CAST(floor(frame_idx * n_chars / n_frames) AS INT) + 1 AS frame_off,
             md5(substring(text, CAST(floor(frame_idx * n_chars / n_frames) AS INT) + 1, 32))
               AS frame_md5
      FROM f ORDER BY doc_id, frame_idx""",

    // connected components over the exact all-pairs near-dup graph, via a
    // recursive reachability closure — min reachable id = canonical
    "d6_dedup_clusters" -> ccClustersSql(""),

    // d6's exact component closure + t19's integer logit, elected
    // argmax-per-component — the quality election replayed end to end.
    // d19b (the store-maintained twin) shares this oracle verbatim:
    // arrival order must be invisible in the served election.
    "d19_canonical_pick" -> d19CanonicalSql,
    "d19b_incremental_canonical" -> d19CanonicalSql,
    // the takedown sweep must land on the one-shot election over the
    // SURVIVING pair set — retirement, re-label, member drain and
    // re-election all invisible in the served state
    "d19c_takedown_reelection" -> d19CanonicalSqlWhere(
      s"AND a_id % ${PipelineQueries.D18RetireMod} <> ${PipelineQueries.D18RetireRem} " +
        s"AND b_id % ${PipelineQueries.D18RetireMod} <> ${PipelineQueries.D18RetireRem}"),


    "t5_chunk" -> s"""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
                        len(w) AS n,
                        CAST(CASE WHEN len(w) <= ${ChunkSize} THEN 1
                             ELSE (len(w) - ${ChunkSize} + ${ChunkStride} - 1)
                                    // ${ChunkStride} + 1 END AS INT) AS n_chunks
                 FROM documents),
      c AS (SELECT doc_id, w, n, unnest(range(0, n_chunks)) AS chunk_idx FROM d)
      SELECT doc_id, chunk_idx,
             least(${ChunkSize}, n - chunk_idx * ${ChunkStride}) AS chunk_tokens,
             md5(array_to_string(
                   list_slice(w, chunk_idx * ${ChunkStride} + 1,
                              least(chunk_idx * ${ChunkStride} + ${ChunkSize}, n)), ' '))
               AS chunk_md5
      FROM c ORDER BY doc_id, chunk_idx""",

    "t6_sample_stratified" -> s"""
      WITH d AS (SELECT doc_id, lang, source,
                        ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h,
                        CASE ${SampleRatePermille.map { case (l, r) =>
                          s"WHEN lang = '$l' THEN $r" }.mkString(" ")}
                             ELSE $SampleRateDefault END AS rate
                 FROM documents)
      SELECT doc_id, lang, source, 1000000000 // rate AS weight_ppm
      FROM d WHERE h % 1000 < rate ORDER BY doc_id""",

    "t9_tfidf_keywords" -> s"""
      WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
                   FROM documents),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
      dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      s AS (SELECT tf.doc_id, tf.term, tf.tf, dft.df,
                   CAST(tf.tf AS BIGINT) * n.n_docs * 1000000 // dft.df AS score_e6
            FROM tf JOIN dft USING (term), n),
      r AS (SELECT doc_id, term, tf, df, score_e6,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score_e6 DESC, term) AS rk
            FROM s)
      SELECT doc_id, rk, term, tf, df, score_e6 FROM r
      WHERE rk <= ${TfidfK} ORDER BY doc_id, rk""",

    "t10_boilerplate" -> s"""
      WITH lg AS (SELECT doc_id, string_split(lower(text), ' ') AS lw FROM documents),
      g0 AS (SELECT doc_id,
                    unnest([array_to_string(lw[i:i+${DecontGram - 1}], ' ')
                            for i in range(1, len(lw) - ${DecontGram - 2})]) AS g
             FROM lg WHERE len(lw) >= ${DecontGram}),
      g AS (SELECT DISTINCT doc_id, g FROM g0),
      dfq AS (SELECT g, COUNT(*) AS gdf FROM g GROUP BY g)
      SELECT g.doc_id, COUNT(*) AS n_grams,
             SUM(CASE WHEN gdf >= ${BoilerK} THEN 1 ELSE 0 END)::BIGINT AS n_boiler,
             SUM(CASE WHEN gdf >= ${BoilerK} THEN 1 ELSE 0 END)::BIGINT * 1000000
               // COUNT(*) AS boiler_ppm
      FROM g JOIN dfq USING (g)
      GROUP BY g.doc_id ORDER BY g.doc_id""",

    // repeated-substring spans: mark every L-gram start occurring >= 2
    // times corpus-wide, union the [i, i+L) intervals per doc with the
    // sorted running-max sweep — all integer arithmetic, windows only
    // within a doc, so the hash matches Spark's at any tier
    "d8_substring_dedup" -> s"""
      WITH lg AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      ex AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
                    unnest(range(0, len(w) - ${DupSpanGram} + 1)) AS i, w
             FROM lg WHERE len(w) >= ${DupSpanGram}),
      g AS (SELECT doc_id, n_words, i,
                   array_to_string(w[i + 1:i + ${DupSpanGram}], ' ') AS gram
            FROM ex),
      occ AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
      mk AS (SELECT g.doc_id, g.n_words, g.i FROM g JOIN occ USING (gram)),
      sp AS (SELECT doc_id, n_words, i,
                    max(i + ${DupSpanGram}) OVER (
                      PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
             FROM mk),
      c AS (SELECT doc_id, n_words,
                   (i + ${DupSpanGram}) - greatest(i, coalesce(prev_end, 0)) AS covered
            FROM sp)
      SELECT doc_id, (n_words - ${DupSpanGram} + 1) AS n_grams,
             COUNT(*) AS n_dup_grams,
             CAST(SUM(CASE WHEN covered = ${DupSpanGram} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_spans,
             CAST(SUM(covered) AS BIGINT) AS dup_tokens,
             CAST(SUM(covered) AS BIGINT) * 1000000 // n_words AS dup_ppm
      FROM c GROUP BY doc_id, n_words ORDER BY doc_id""",

    // the cut replayed over gram STRINGS (t8's bijection argument: xxhash64
    // gram identity == string identity at word boundaries); the anti-join
    // is a LEFT JOIN + IS NULL for engine portability, the rebuild a
    // position-ordered string_agg
    "d16_substring_cut" -> d16CutSql,

    // d17 must converge to EXACTLY the one-shot cut — same oracle; the
    // incremental machinery (additive gram counts, crosser detection,
    // retroactive re-cut through the store) is all on the Spark side
    "d17_incremental_cut" -> d16CutSql,

    // linear quality model in exact integer arithmetic: every division has
    // a non-negative numerator, so DuckDB's floor-div `//` agrees with
    // Spark's trunc-div; the 'g' flag makes regexp_replace global like
    // Spark's default
    "t19_quality_model" -> s"""
      WITH d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len_c,
                        string_split(lower(text), ' ') AS w
                 FROM documents),
      f AS (SELECT doc_id,
                   CAST(len(w) AS BIGINT) AS n_words,
                   len(list_filter(w, x -> x IN ${inList(PipelineQueries.StopEn)}))
                     * 1000000 // len(w) AS f_stop6,
                   (len_c - (len(w) - 1)) * 1000000 // len(w) AS f_meanlen6,
                   CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT)
                     * 1000000 // greatest(len_c, 1) AS f_sym6
            FROM d),
      g AS (SELECT *, ${PipelineQueries.T19WStop} * f_stop6
                      - (abs(f_meanlen6 - ${PipelineQueries.T19MeanTarget})
                         // ${PipelineQueries.T19MeanDiv})
                      - ${PipelineQueries.T19WSym} * f_sym6
                      + ${PipelineQueries.T19WLen}
                        * least(n_words, ${PipelineQueries.T19LenCap})
                      - ${PipelineQueries.T19Intercept} AS logit6
            FROM f)
      SELECT doc_id, n_words, f_stop6, f_meanlen6, f_sym6, logit6,
             logit6 > 0 AS keep,
             CASE WHEN logit6 >= ${PipelineQueries.T19HiThresh} THEN 'hi'
                  WHEN logit6 >= 0 THEN 'mid' ELSE 'lo' END AS bucket
      FROM g ORDER BY doc_id""",

    // incremental dedup: the Bloom prefilter is invisible here by design —
    // the admitted set equals the plain within-batch-dedup + anti-join,
    // for any filter contents (no false negatives; positives get an exact
    // confirm join). Text equality stands in for Spark's sha-256 digest
    // equality, the d1 precedent.
    "d9_incremental_dedup" -> s"""
      WITH b AS (SELECT doc_id, lang, source, n_chars, text,
                        row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
                 FROM documents WHERE doc_id % ${PipelineQueries.D9Mod} = 0),
      bd AS (SELECT doc_id, lang, source, n_chars, text FROM b WHERE rn = 1)
      SELECT doc_id, lang, source, n_chars FROM bd
      WHERE NOT EXISTS (SELECT 1 FROM documents c
                        WHERE c.doc_id % ${PipelineQueries.D9Mod} <> 0
                          AND c.text = bd.text)
      ORDER BY doc_id""",

    // Gopher hard rules: every ratio is 1e-6 fixed-point with non-negative
    // numerators, so DuckDB's floor-div `//` agrees with Spark's trunc-div
    // and each boolean flag compares exactly
    "t20_gopher_rules" -> s"""
      WITH d AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS len_c,
                        string_split(lower(text), ' ') AS w
                 FROM documents),
      f AS (SELECT doc_id,
                   CAST(len(w) AS BIGINT) AS n_words,
                   (len_c - (len(w) - 1)) * 1000000 // len(w) AS f_meanlen6,
                   len(list_distinct(w)) * 1000000 // len(w) AS ttr6,
                   CAST(len(list_filter(w, x -> x IN ${inList(StopEn)})) AS BIGINT)
                     AS n_stop
            FROM d),
      g AS (SELECT *,
                   n_words >= ${T20MinWords} AND n_words <= ${T20MaxWords}
                     AS r_wordcount,
                   f_meanlen6 >= ${T20MeanLo} AND f_meanlen6 <= ${T20MeanHi}
                     AS r_meanlen,
                   ttr6 >= ${T20TtrMin} AS r_ttr,
                   n_stop >= ${T20MinStop} AS r_stop
            FROM f)
      SELECT doc_id, n_words, f_meanlen6, ttr6, n_stop,
             r_wordcount, r_meanlen, r_ttr, r_stop,
             r_wordcount AND r_meanlen AND r_ttr AND r_stop AS pass
      FROM g ORDER BY doc_id""",

    // per-source quota: the cap is integer arithmetic over the source's
    // own count, the rank a deterministic (n_chars desc, doc_id) order
    "d10_source_quota" -> s"""
      WITH c AS (SELECT source, count(*) AS n_docs,
                        greatest(${D10CapMin}, count(*) * ${D10CapPct} // 100)
                          AS cap
                 FROM documents GROUP BY source),
      r AS (SELECT source, doc_id, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS rk
            FROM documents)
      SELECT r.source, r.doc_id, r.n_chars, r.rk, c.n_docs, c.cap
      FROM r JOIN c USING (source)
      WHERE r.rk <= c.cap
      ORDER BY r.source, r.rk""",

    // held-out Stupid Backoff: train counts from doc_id % 7 != 0, eval
    // scoring on % 7 = 0; 0.4 enters as the rational 2/5 and every score
    // is fixed-point with non-negative numerators, so // ≡ trunc-div
    "t22_bigram_score" -> s"""
      WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                 FROM documents
                 WHERE len(string_split(lower(text), ' ')) >= 2),
      bb AS (SELECT doc_id,
                    unnest([w[i] for i in range(1, len(w))]) AS prev,
                    unnest([w[i+1] for i in range(1, len(w))]) AS cur
             FROM d),
      c2 AS (SELECT prev, cur, count(*) AS c2 FROM bb
             WHERE doc_id % ${DecontMod} != 0 GROUP BY prev, cur),
      c1 AS (SELECT t, count(*) AS c1
             FROM (SELECT doc_id, unnest(w) AS t FROM d)
             WHERE doc_id % ${DecontMod} != 0 GROUP BY t),
      nt AS (SELECT sum(c1) AS n_tot FROM c1),
      ev AS (SELECT bb.doc_id, c2.c2, p.c1 AS c1_prev, c.c1 AS c1_cur
             FROM bb LEFT JOIN c2 USING (prev, cur)
                     LEFT JOIN c1 p ON p.t = bb.prev
                     LEFT JOIN c1 c ON c.t = bb.cur
             WHERE bb.doc_id % ${DecontMod} = 0),
      s AS (SELECT doc_id,
                   CASE WHEN c2 IS NOT NULL AND c1_prev IS NOT NULL
                        THEN c2 * 1000000 // c1_prev
                        ELSE (${T22BackNum} * coalesce(c1_cur, 0) * 1000000)
                             // (${T22BackDen} * (SELECT n_tot FROM nt)) END AS s6,
                   CASE WHEN c2 IS NULL THEN 1 ELSE 0 END AS bk
            FROM ev)
      SELECT doc_id, count(*) AS n_bigrams,
             CAST(sum(bk) AS BIGINT) AS n_backoff,
             CAST(sum(s6) AS BIGINT) AS sum_s6,
             CAST(sum(s6) // count(*) AS BIGINT) AS mean_s6
      FROM s GROUP BY doc_id ORDER BY doc_id""",

    // cluster-aware split: the d6 recursive-CTE closure supplies the
    // canonical ids; the bucket is t6's md5 idiom over the group key, so
    // split membership is exact on both sides
    "t21_split_leakfree" -> s"""
      WITH RECURSIVE $shingleCte,
      pairs AS (
        SELECT a_id, b_id FROM (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
                 CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS uni
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
        WHERE 2 * inter >= uni),
      e AS (SELECT a_id AS u, b_id AS v FROM pairs
            UNION ALL SELECT b_id, a_id FROM pairs),
      verts AS (SELECT DISTINCT u AS v FROM e),
      reach(x, y) AS (
        SELECT v, v FROM verts
        UNION
        SELECT r.x, e.v FROM reach r JOIN e ON e.u = r.y),
      lab AS (SELECT x AS doc_id, MIN(y) AS canonical_id FROM reach GROUP BY x),
      g AS (SELECT d.doc_id, d.lang,
                   coalesce(lab.canonical_id, d.doc_id) AS group_key
            FROM documents d LEFT JOIN lab ON lab.doc_id = d.doc_id),
      h AS (SELECT doc_id, lang, group_key,
                   ('0x' || substr(md5(group_key::VARCHAR), 1, 15))::BIGINT % 100
                     AS bucket
            FROM g)
      SELECT doc_id, lang, group_key, bucket,
             CASE WHEN bucket < ${T21TrainPct} THEN 'train'
                  WHEN bucket < ${T21ValPct} THEN 'valid'
                  ELSE 'test' END AS split
      FROM h ORDER BY doc_id""",

    // per-source drift: the L1 runs over the FULL source×lang grid (absent
    // languages contribute the corpus share); non-negative numerators keep
    // DuckDB's floor-div identical to Spark's trunc-div
    "k3_source_drift" -> """
      WITH sl AS (SELECT source, lang, count(*) AS n_sl
                  FROM documents GROUP BY source, lang),
      s AS (SELECT source, sum(n_sl) AS n_src FROM sl GROUP BY source),
      l AS (SELECT lang, sum(n_sl) AS n_lang FROM sl GROUP BY lang),
      t AS (SELECT sum(n_sl) AS n_total FROM sl),
      x AS (SELECT s.source, s.n_src, l.lang, l.n_lang,
                   coalesce(sl.n_sl, 0) AS n_sl0
            FROM s CROSS JOIN l
            LEFT JOIN sl ON sl.source = s.source AND sl.lang = l.lang)
      SELECT source, CAST(n_src AS BIGINT) AS n_src,
             CAST(sum(abs(n_sl0 * 1000000 // n_src
                          - n_lang * 1000000 // (SELECT n_total FROM t)))
               AS BIGINT) AS l1_drift6,
             count(*) AS n_langs
      FROM x GROUP BY source, n_src ORDER BY source""",

    // filtered ANN: exact recomputation over the label-filtered candidate
    // sets; the target label is the same (q + 3) % 10 literal rule
    "v11_filtered_ann" -> s"""
      WITH e AS (SELECT vec_id, label,
                        list_transform(embedding, x -> x::DOUBLE) AS v
                 FROM embeddings),
      n AS (SELECT vec_id, label, v,
                   sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
            FROM e),
      q AS (SELECT vec_id AS q_id, (vec_id + 3) % 10 AS want,
                   v AS qv, nrm AS qn
            FROM n WHERE vec_id < 5),
      s AS (SELECT q.q_id, n.vec_id, n.label,
                   CAST(floor(list_sum(list_transform(range(1, len(n.v) + 1),
                           i -> n.v[i] * q.qv[i])) / (n.nrm * q.qn) * 1000000.0 + 0.5) AS BIGINT) AS cos_e6
            FROM n JOIN q ON n.label = q.want AND n.vec_id != q.q_id),
      r AS (SELECT q_id, vec_id, label, cos_e6,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos_e6 DESC, vec_id) AS rk
            FROM s)
      SELECT q_id, rk, vec_id, label, cos_e6 FROM r
      WHERE rk <= ${FannK} ORDER BY q_id, rk""",

    // recall@5 of the v2 ANN vs the v1 exact baseline: both retrieval
    // paths are recomputed verbatim (same CTE bodies, renamed), then the
    // overlap counts and the fixed-point recall compare exactly
    "v12_recall_eval" -> s"""
      WITH $annEvalCtes,
      aa AS (SELECT q_id, vec_id, 1 AS hit FROM ra WHERE rk <= 5)
      SELECT ex.q_id, count(*) AS k_exact,
             CAST(count(aa.hit) AS BIGINT) AS n_hit,
             count(aa.hit) * 1000000 // count(*) AS recall6
      FROM ex LEFT JOIN aa ON aa.q_id = ex.q_id AND aa.vec_id = ex.vec_id
      GROUP BY ex.q_id ORDER BY ex.q_id""",

    // MRR@5 / binary NDCG@5 of the same two retrieval paths; the log2
    // discount weights are shared 1e9-scaled integer literals, so the DCG
    // fold is an integer sum in both engines
    "v13_rank_metrics" -> s"""
      WITH $annEvalCtes,
      an AS (SELECT q_id, vec_id, rk FROM ra WHERE rk <= 5),
      ke AS (SELECT q_id, count(*) AS k_exact FROM ex GROUP BY q_id),
      wt AS (SELECT * FROM (VALUES (1, 1000000000), (2, 630929754),
                                   (3, 500000000), (4, 430676558),
                                   (5, 386852807)) t(i, w9)),
      id9 AS (SELECT * FROM (VALUES (1, 1000000000), (2, 1630929754),
                                    (3, 2130929754), (4, 2561606312),
                                    (5, 2948459119)) t(k, v)),
      j AS (SELECT an.q_id, an.rk, ex.vec_id IS NOT NULL AS rel
            FROM an LEFT JOIN ex ON ex.q_id = an.q_id AND ex.vec_id = an.vec_id),
      p AS (SELECT j.q_id,
                   CAST(sum(CASE WHEN rel THEN wt.w9 ELSE 0 END) AS BIGINT) AS dcg9,
                   min(CASE WHEN rel THEN j.rk END) AS first_hit
            FROM j JOIN wt ON wt.i = j.rk GROUP BY j.q_id)
      SELECT p.q_id,
             CAST(coalesce(1000000 // first_hit, 0) AS BIGINT) AS mrr6,
             CAST(dcg9 * 1000000 // id9.v AS BIGINT) AS ndcg6
      FROM p JOIN ke ON ke.q_id = p.q_id
      JOIN id9 ON id9.k = least(ke.k_exact, 5)
      ORDER BY p.q_id""",

    // Matryoshka two-stage retrieval: the prefix shortlist and the
    // full-precision rerank are both recomputed exactly; the v1 rounding
    // convention (6 dp) absorbs summation-order ULPs on both scores
    // binary-quantized Hamming retrieval: sign bits pack as two 32-bit
    // words (DuckDB's checked << refuses bit 63), Hamming distance is
    // bit_count(xor(lo)) + bit_count(xor(hi)) — integer end-to-end, so
    // the shortlist ranking is engine-exact; the 16-deep shortlist then
    // reranks under the shared v1 exact-cosine rounding convention
    "v19_binary_ann" -> s"""
      WITH $embCte,
      c AS (SELECT vec_id,
                   CAST(list_sum(list_transform(range(0, 32),
                        j -> CASE WHEN v[j + 1] > 0 THEN 1::BIGINT << j
                                  ELSE 0::BIGINT END)) AS BIGINT) AS code_lo,
                   CAST(list_sum(list_transform(range(0, 32),
                        j -> CASE WHEN v[j + 33] > 0 THEN 1::BIGINT << j
                                  ELSE 0::BIGINT END)) AS BIGINT) AS code_hi
            FROM n),
      q AS (SELECT vec_id AS q_id, code_lo AS q_lo, code_hi AS q_hi
            FROM c WHERE vec_id < 5),
      h AS (SELECT q.q_id, c.vec_id,
                   CAST(bit_count(xor(c.code_lo, q.q_lo))
                        + bit_count(xor(c.code_hi, q.q_hi)) AS BIGINT) AS ham
            FROM c, q WHERE c.vec_id != q.q_id),
      s AS (SELECT q_id, vec_id, ham,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY ham, vec_id) AS hrk
            FROM h),
      sl AS (SELECT q_id, vec_id, ham FROM s WHERE hrk <= ${BinShortlist}),
      qf AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
      r AS (SELECT sl.q_id, sl.vec_id, sl.ham,
                   CAST(floor(list_sum(list_transform(range(1, len(d.v) + 1),
                           i -> d.v[i] * qf.qv[i])) / (d.nrm * qf.qn) * 1000000.0 + 0.5) AS BIGINT) AS cos_e6
            FROM sl JOIN n d ON d.vec_id = sl.vec_id
            JOIN qf ON qf.q_id = sl.q_id),
      rr AS (SELECT q_id, vec_id, ham, cos_e6,
                    row_number() OVER (PARTITION BY q_id
                                       ORDER BY cos_e6 DESC, vec_id) AS rk
             FROM r)
      SELECT q_id, rk, vec_id, ham, cos_e6 FROM rr
      WHERE rk <= ${BinK} ORDER BY q_id, rk""",

    // trained scalar quantization retrained END-TO-END: per-dim min/max
    // bounds, 8-bit encode, 510-scaled integer midpoint reconstruction,
    // integer ADC, exact-cosine rerank — all replayed from the raw floats
    "v30_trained_sq" -> {
      val dim = PipelineQueries.SqDim
      s"""
      WITH $embCte,
      q4 AS MATERIALIZED (
        SELECT vec_id,
               list_transform(v, x -> CAST(floor(x * 10000.0 + 0.5) AS BIGINT)) AS u
        FROM e),
      dims AS (SELECT dd.d, MIN(q4.u[dd.d]) AS mn, MAX(q4.u[dd.d]) AS mx
               FROM q4 CROSS JOIN (SELECT unnest(range(1, $dim + 1)) AS d) dd
               GROUP BY dd.d),
      mm AS (SELECT list(mn ORDER BY d) AS mn,
                    list(mx - mn ORDER BY d) AS span
             FROM dims),
      enc AS (SELECT q4.vec_id,
                     list_transform(range(1, $dim + 1), d ->
                       510 * mm.mn[d] +
                       (2 * (((q4.u[d] - mm.mn[d]) * 255)
                             // greatest(mm.span[d], 1)) + 1) * mm.span[d]) AS r510
              FROM q4, mm),
      qs AS (SELECT vec_id AS q_id, list_transform(u, x -> 510 * x) AS qu
             FROM q4 WHERE vec_id < 5),
      adc AS (SELECT qs.q_id, enc.vec_id,
                     CAST(list_sum(list_transform(range(1, $dim + 1),
                          d -> (qs.qu[d] - enc.r510[d]) * (qs.qu[d] - enc.r510[d])))
                       AS BIGINT) AS adc_dist
              FROM enc, qs WHERE enc.vec_id != qs.q_id),
      s AS (SELECT q_id, vec_id, adc_dist,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY adc_dist, vec_id) AS srk
            FROM adc),
      sl AS (SELECT q_id, vec_id, adc_dist FROM s
             WHERE srk <= ${PipelineQueries.SqShortlist}),
      qf AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
      r AS (SELECT sl.q_id, sl.vec_id, sl.adc_dist,
                   CAST(floor(list_sum(list_transform(range(1, len(d.v) + 1),
                           i -> d.v[i] * qf.qv[i])) / (d.nrm * qf.qn) * 1000000.0 + 0.5) AS BIGINT) AS cos_e6
            FROM sl JOIN n d ON d.vec_id = sl.vec_id
            JOIN qf ON qf.q_id = sl.q_id),
      rr AS (SELECT q_id, vec_id, adc_dist, cos_e6,
                    row_number() OVER (PARTITION BY q_id
                                       ORDER BY cos_e6 DESC, vec_id) AS rk
             FROM r)
      SELECT q_id, rk, vec_id, adc_dist, cos_e6 FROM rr
      WHERE rk <= ${PipelineQueries.SqK} ORDER BY q_id, rk"""
    },

    "v17_rrf_fusion" -> s"""
      WITH $annEvalCtes,
      fa AS (SELECT q_id, vec_id, rk AS rk_exact FROM rx WHERE rk <= 10),
      fb AS (SELECT q_id, vec_id, rk AS rk_lsh FROM ra WHERE rk <= 5),
      dd AS (SELECT ${PipelineQueries.RrfDisc.mkString("[", ",", "]")} AS d),
      fu AS (SELECT q_id, vec_id, rk_exact, rk_lsh,
                    CAST(coalesce(d[rk_exact], 0) + coalesce(d[rk_lsh], 0)
                         AS BIGINT) AS rrf_e9
             FROM fa FULL JOIN fb USING (q_id, vec_id), dd),
      rr AS (SELECT q_id, vec_id, rk_exact, rk_lsh, rrf_e9,
                    row_number() OVER (PARTITION BY q_id
                                       ORDER BY rrf_e9 DESC, vec_id) AS rk
             FROM fu)
      SELECT q_id, rk, vec_id, rk_exact, rk_lsh, rrf_e9
      FROM rr WHERE rk <= 5 ORDER BY q_id, rk""",

    "v10_matryoshka" -> s"""
      WITH $embCte,
      p AS (SELECT vec_id, v[1:${MatDims}] AS p,
                   sqrt(list_sum(list_transform(v[1:${MatDims}], x -> x*x))) AS pn
            FROM n),
      q AS (SELECT vec_id AS q_id, p AS qp, pn AS qpn FROM p WHERE vec_id < 5),
      s AS (SELECT q.q_id, p.vec_id,
                   CAST(floor(list_sum(list_transform(range(1, ${MatDims} + 1),
                           i -> p.p[i] * q.qp[i])) / (p.pn * q.qpn) * 1000000.0 + 0.5) AS BIGINT) AS pcos_e6
            FROM p, q WHERE p.vec_id != q.q_id),
      r AS (SELECT q_id, vec_id, pcos_e6,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY pcos_e6 DESC, vec_id) AS prk
            FROM s),
      sh AS (SELECT q_id, vec_id, pcos_e6 FROM r WHERE prk <= ${MatShortlist}),
      f AS (SELECT sh.q_id, sh.vec_id, sh.pcos_e6,
                   CAST(floor(list_sum(list_transform(range(1, len(d.v) + 1),
                           i -> d.v[i] * qn.v[i])) / (d.nrm * qn.nrm) * 1000000.0 + 0.5) AS BIGINT) AS cos_e6
            FROM sh JOIN n d ON d.vec_id = sh.vec_id
                    JOIN n qn ON qn.vec_id = sh.q_id),
      rr AS (SELECT q_id, vec_id, pcos_e6, cos_e6,
                    row_number() OVER (PARTITION BY q_id
                                       ORDER BY cos_e6 DESC, vec_id) AS rk
             FROM f)
      SELECT q_id, rk, vec_id, pcos_e6, cos_e6 FROM rr
      WHERE rk <= ${MatK} ORDER BY q_id, rk""",

    "t8_decontaminate" -> s"""
      WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      g AS (SELECT doc_id,
                   unnest([md5(array_to_string(w[i:i+${DecontGram - 1}], ' '))
                           for i in range(1, len(w) - ${DecontGram - 2})]) AS g
            FROM d WHERE len(w) >= ${DecontGram}),
      ev AS (SELECT doc_id AS eval_id, g FROM g WHERE doc_id % ${DecontMod} = 0),
      tr AS (SELECT doc_id AS train_id, g FROM g WHERE doc_id % ${DecontMod} != 0)
      SELECT train_id, eval_id, COUNT(DISTINCT tr.g) AS n_shared
      FROM tr JOIN ev USING (g)
      GROUP BY train_id, eval_id
      ORDER BY train_id, eval_id""",

    // t8's pair join as a DISTINCT pair list — the streaming path's
    // exactly-once output
    "t8s_stream_decont" -> s"""
      WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      g AS (SELECT doc_id,
                   unnest([md5(array_to_string(w[i:i+${DecontGram - 1}], ' '))
                           for i in range(1, len(w) - ${DecontGram - 2})]) AS g
            FROM d WHERE len(w) >= ${DecontGram}),
      ev AS (SELECT doc_id AS eval_id, g FROM g WHERE doc_id % ${DecontMod} = 0),
      tr AS (SELECT doc_id AS train_id, g FROM g WHERE doc_id % ${DecontMod} != 0)
      SELECT DISTINCT train_id, eval_id
      FROM tr JOIN ev USING (g)
      ORDER BY train_id, eval_id""",

    // t8's gram machinery graded per training doc; the fraction and its
    // risk bucket round/compare in the exact integer domain
    "t16_contam_score" -> s"""
      WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      g AS (SELECT doc_id,
                   unnest([md5(array_to_string(w[i:i+${DecontGram - 1}], ' '))
                           for i in range(1, len(w) - ${DecontGram - 2})]) AS g
            FROM d WHERE len(w) >= ${DecontGram}),
      dg AS (SELECT DISTINCT doc_id, g FROM g),
      ev AS (SELECT DISTINCT g FROM dg WHERE doc_id % ${DecontMod} = 0),
      agg AS (SELECT tr.doc_id, count(*) AS n_grams,
                     sum(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
              FROM (SELECT doc_id, g FROM dg WHERE doc_id % ${DecontMod} != 0) tr
              LEFT JOIN ev ON tr.g = ev.g
              GROUP BY tr.doc_id)
      SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
             CAST(n_hit AS BIGINT) AS n_hit,
             CAST((2 * n_hit * 1000000 + n_grams) // (2 * n_grams) AS DOUBLE)
               / 1000000.0 AS contam_frac,
             CASE WHEN n_hit = 0 THEN 'clean'
                  WHEN (2 * n_hit * 1000000 + n_grams) // (2 * n_grams) < 100000 THEN 'low'
                  ELSE 'high' END AS risk
      FROM agg ORDER BY doc_id""",

    // the NAIVE single-window form — the engine's two-level distributed
    // prefix sum must reproduce it exactly
    "t7_pack_shards" -> s"""
      WITH d AS (SELECT doc_id, CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_tokens
                 FROM documents),
      c AS (SELECT doc_id, est_tokens,
                   CAST(SUM(est_tokens) OVER (ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM d)
      SELECT doc_id, est_tokens, cum_tokens,
             (cum_tokens - est_tokens) // ${ShardBudget} AS shard_id
      FROM c ORDER BY doc_id""",

    // packing replayed over the plain window cumsum (the engine's
    // two-level cumsum must equal it — t7's identity, reused); every
    // emitted column is exact integer arithmetic off the prefix sums
    "t26_sequence_pack" -> s"""
      WITH d AS (SELECT doc_id, CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_tokens
                 FROM documents WHERE ceil(n_chars / 4.0) >= 1),
      c AS (SELECT doc_id, est_tokens,
                   CAST(SUM(est_tokens) OVER (ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM d),
      s AS (SELECT doc_id, cum_tokens,
                   cum_tokens - est_tokens AS strt FROM c),
      x AS (SELECT doc_id, strt, cum_tokens,
                   unnest(range(strt // ${SeqLen},
                                (cum_tokens - 1) // ${SeqLen} + 1)) AS seq_id
            FROM s)
      SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
             CAST(greatest(strt, seq_id * ${SeqLen}) - strt AS BIGINT) AS doc_from,
             CAST(least(cum_tokens, (seq_id + 1) * ${SeqLen}) - strt AS BIGINT) AS doc_to,
             CAST(greatest(strt, seq_id * ${SeqLen}) - seq_id * ${SeqLen} AS BIGINT)
               AS pos_from,
             CAST(least(cum_tokens, (seq_id + 1) * ${SeqLen})
                  - greatest(strt, seq_id * ${SeqLen}) AS BIGINT) AS n_toks
      FROM x ORDER BY seq_id, pos_from""",

    // the full corpus-prep composition: dedup-drop → decontaminate →
    // quality ≥ 0.3 → stratified sample → chunk → pack, one CTE chain
    // the round-4 curation chain: t16 clean-gate → t15 scores over the
    // survivors → t17 terciles (tail dropped) → t7 packing; one chained
    // oracle so stage interactions are gated, not just stages
    // pipe3: t20's rule CTEs feed d10's quota CTEs, with the caps computed
    // over the gate's survivors — the stage interaction under test
    "pipe3_gated_quota" -> s"""
      WITH d AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS len_c,
                        string_split(lower(text), ' ') AS w
                 FROM documents),
      f AS (SELECT doc_id,
                   CAST(len(w) AS BIGINT) AS n_words,
                   (len_c - (len(w) - 1)) * 1000000 // len(w) AS f_meanlen6,
                   len(list_distinct(w)) * 1000000 // len(w) AS ttr6,
                   CAST(len(list_filter(w, x -> x IN ${inList(StopEn)})) AS BIGINT)
                     AS n_stop
            FROM d),
      pass AS (SELECT doc_id FROM f
               WHERE n_words >= ${T20MinWords} AND n_words <= ${T20MaxWords}
                 AND f_meanlen6 >= ${T20MeanLo} AND f_meanlen6 <= ${T20MeanHi}
                 AND ttr6 >= ${T20TtrMin} AND n_stop >= ${T20MinStop}),
      sv AS (SELECT dd.doc_id, dd.source, dd.n_chars
             FROM documents dd JOIN pass USING (doc_id)),
      c AS (SELECT source, count(*) AS n_docs,
                   greatest(${D10CapMin}, count(*) * ${D10CapPct} // 100) AS cap
            FROM sv GROUP BY source),
      r AS (SELECT source, doc_id, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS rk
            FROM sv)
      SELECT r.source, r.doc_id, r.n_chars, r.rk, c.n_docs, c.cap
      FROM r JOIN c USING (source)
      WHERE r.rk <= c.cap
      ORDER BY r.source, r.rk""",

    // pipe4: d12's canonicalization CTEs → digest dedup over the URL
    // survivors (grouped by text — exact content classes) → t20's rule
    // CTEs; the keeper-id interaction (min SURVIVING id per content
    // class) is what the chain pins
    "pipe4_crawl_prep" -> s"""
      WITH $UrlCanonCtes,
      keep1 AS (SELECT doc_id FROM (
          SELECT doc_id, min(doc_id) OVER (PARTITION BY canonical_url) AS cd
          FROM c) x
        WHERE doc_id = cd),
      s1 AS (SELECT d.doc_id, d.text FROM documents d JOIN keep1 USING (doc_id)),
      keep2 AS (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY text),
      dd AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS len_c,
                    string_split(lower(text), ' ') AS w
             FROM documents),
      f AS (SELECT doc_id,
                   CAST(len(w) AS BIGINT) AS n_words,
                   (len_c - (len(w) - 1)) * 1000000 // len(w) AS f_meanlen6,
                   len(list_distinct(w)) * 1000000 // len(w) AS ttr6,
                   CAST(len(list_filter(w, x -> x IN ${inList(StopEn)})) AS BIGINT)
                     AS n_stop
            FROM dd),
      pass AS (SELECT doc_id FROM f
               WHERE n_words >= ${T20MinWords} AND n_words <= ${T20MaxWords}
                 AND f_meanlen6 >= ${T20MeanLo} AND f_meanlen6 <= ${T20MeanHi}
                 AND ttr6 >= ${T20TtrMin} AND n_stop >= ${T20MinStop})
      SELECT d.doc_id, d.source,
             CAST(len(string_split(lower(d.text), ' ')) AS BIGINT) AS n_words
      FROM documents d JOIN keep2 USING (doc_id) JOIN pass USING (doc_id)
      ORDER BY d.doc_id""",

    "pipe2_curation" -> s"""
      WITH d0 AS (SELECT doc_id, text, n_chars, string_split(lower(text), ' ') AS w
                  FROM documents),
      g AS (SELECT doc_id,
                   unnest([md5(array_to_string(w[i:i+${DecontGram - 1}], ' '))
                           for i in range(1, len(w) - ${DecontGram - 2})]) AS g
            FROM d0 WHERE len(w) >= ${DecontGram}),
      dg AS (SELECT DISTINCT doc_id, g FROM g),
      ev AS (SELECT DISTINCT g FROM dg WHERE doc_id % ${DecontMod} = 0),
      agg AS (SELECT tr.doc_id,
                     sum(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
              FROM (SELECT doc_id, g FROM dg WHERE doc_id % ${DecontMod} != 0) tr
              LEFT JOIN ev ON tr.g = ev.g
              GROUP BY tr.doc_id),
      surv AS (SELECT d0.doc_id, d0.text, d0.n_chars
               FROM d0 JOIN (SELECT doc_id FROM agg WHERE n_hit = 0) c USING (doc_id)
               WHERE d0.doc_id % ${DecontMod} != 0),
      tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM surv),
      tf AS (SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY 1, 2),
      ct AS (SELECT term, SUM(c)::BIGINT AS ctf FROM tf GROUP BY term),
      tot0 AS (SELECT SUM(ctf)::BIGINT AS tot0 FROM ct),
      sc AS (SELECT doc_id, SUM(c)::BIGINT AS n_tokens,
                    CAST(floor(SUM(c * ln(tot0::DOUBLE / ctf::DOUBLE)) / SUM(c) * 1000000.0 + 0.5) AS BIGINT) AS lm_xent_e6
             FROM tf JOIN ct USING (term), tot0
             GROUP BY doc_id),
      cw AS (SELECT doc_id, n_tokens, lm_xent_e6,
                    SUM(n_tokens) OVER (ORDER BY lm_xent_e6, doc_id
                                        ROWS UNBOUNDED PRECEDING) AS cum,
                    SUM(n_tokens) OVER () AS tot
             FROM sc),
      keepb AS (SELECT doc_id, lm_xent_e6,
                       CASE WHEN 3 * (cum - n_tokens) < tot THEN 'head'
                            WHEN 3 * (cum - n_tokens) < 2 * tot THEN 'middle'
                            ELSE 'tail' END AS ppl_bucket
                FROM cw),
      sized AS (SELECT s.doc_id, k.lm_xent_e6, k.ppl_bucket,
                       CAST(ceil(s.n_chars / 4.0) AS BIGINT) AS est_tokens
                FROM surv s JOIN keepb k USING (doc_id)
                WHERE k.ppl_bucket != 'tail'),
      c2 AS (SELECT doc_id, lm_xent_e6, ppl_bucket, est_tokens,
                    SUM(est_tokens) OVER (ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING) AS cum
             FROM sized)
      SELECT doc_id, lm_xent_e6, ppl_bucket, est_tokens,
             CAST((cum - est_tokens) // ${PipelineQueries.ShardBudget} AS BIGINT) AS shard_id
      FROM c2 ORDER BY doc_id""",

    "pipe_corpus_prep" -> s"""
      WITH RECURSIVE $shingleCte,
      pairs AS (
        SELECT a_id, b_id FROM (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
                 CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS uni
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
        WHERE 2 * inter >= uni),
      e AS (SELECT a_id AS u, b_id AS v FROM pairs
            UNION ALL SELECT b_id, a_id FROM pairs),
      verts AS (SELECT DISTINCT u AS v FROM e),
      reach(x, y) AS (
        SELECT v, v FROM verts
        UNION
        SELECT r.x, e.v FROM reach r JOIN e ON e.u = r.y),
      noncanon AS (SELECT x AS doc_id FROM reach GROUP BY x HAVING x != MIN(y)),
      lg AS (SELECT doc_id, string_split(lower(text), ' ') AS lw FROM documents),
      gg AS (SELECT doc_id,
                    unnest([array_to_string(lw[i:i+${PipelineQueries.DecontGram - 1}], ' ')
                            for i in range(1, len(lw) - ${PipelineQueries.DecontGram - 2})]) AS g
             FROM lg WHERE len(lw) >= ${PipelineQueries.DecontGram}),
      cont AS (SELECT DISTINCT tr.doc_id
               FROM gg tr JOIN gg ev ON tr.g = ev.g
               WHERE tr.doc_id % ${PipelineQueries.DecontMod} != 0
                 AND ev.doc_id % ${PipelineQueries.DecontMod} = 0),
      surv AS (
        SELECT d.doc_id, d.text, d.source,
               ceil(d.n_chars / 4.0)::BIGINT AS est_tokens
        FROM documents d JOIN lg ON lg.doc_id = d.doc_id
        WHERE d.doc_id % ${PipelineQueries.DecontMod} != 0
          AND d.doc_id NOT IN (SELECT doc_id FROM noncanon)
          AND d.doc_id NOT IN (SELECT doc_id FROM cont)
          AND (least(100, len(lg.lw))::BIGINT * len(lg.lw)
               + 100 * len(list_filter(lg.lw, x -> x IN ${inList(StopEn)})))
              * 5000 // len(lg.lw) >= ${CorpusPrep.QualityMinPpm}
          AND ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT % 1000 <
              CASE ${SampleRatePermille.map { case (l, r) =>
                s"WHEN d.lang = '$l' THEN $r" }.mkString(" ")}
                   ELSE $SampleRateDefault END),
      ms AS (SELECT source, SUM(est_tokens)::BIGINT AS src_tokens,
                    CASE ${PipelineQueries.MixSharePermille.map { case (s, r) =>
        s"WHEN source = '$s' THEN $r" }.mkString(" ")}
                         ELSE ${PipelineQueries.MixShareDefault} END AS share_pm
             FROM surv GROUP BY source),
      mb AS (SELECT MIN(src_tokens * 1000 // share_pm) AS budget FROM ms),
      mr AS (SELECT source, least(1000, mb.budget * share_pm // src_tokens) AS keep_pm
             FROM ms, mb),
      mx AS (SELECT surv.doc_id, surv.text
             FROM surv JOIN mr USING (source)
             WHERE ('0x' || substr(md5('mix:' || surv.doc_id::VARCHAR), 1, 15))::BIGINT
                   % 1000 < mr.keep_pm),
      cd AS (SELECT doc_id, string_split(text, ' ') AS w,
                    len(w) AS n,
                    CAST(CASE WHEN len(w) <= ${ChunkSize} THEN 1
                         ELSE (len(w) - ${ChunkSize} + ${ChunkStride} - 1)
                                // ${ChunkStride} + 1 END AS INT) AS n_chunks
             FROM mx),
      ch AS (SELECT doc_id, w, n, unnest(range(0, n_chunks)) AS chunk_idx FROM cd),
      ck AS (SELECT doc_id, chunk_idx,
                    least(${ChunkSize}, n - chunk_idx * ${ChunkStride}) AS chunk_tokens,
                    md5(array_to_string(
                          list_slice(w, chunk_idx * ${ChunkStride} + 1,
                                     least(chunk_idx * ${ChunkStride} + ${ChunkSize}, n)), ' '))
                      AS chunk_md5
             FROM ch),
      pk AS (SELECT doc_id, chunk_idx, chunk_tokens, chunk_md5,
                    CAST(SUM(chunk_tokens) OVER (ORDER BY doc_id, chunk_idx
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             FROM ck)
      SELECT doc_id, chunk_idx, chunk_tokens, chunk_md5,
             (cum - chunk_tokens) // ${ShardBudget} AS shard_id
      FROM pk ORDER BY doc_id, chunk_idx""",

    "t13_pii_redact" -> s"""
      WITH d AS (SELECT doc_id,
                        text || ' contact user' || doc_id::VARCHAR
                             || '@mail' || (doc_id % 7)::VARCHAR
                             || '.org call 555-'
                             || lpad(((doc_id * 7919) % 10000)::VARCHAR, 4, '0')
                             || ' from 10.' || (doc_id % 256)::VARCHAR
                             || '.' || ((doc_id * 31) % 256)::VARCHAR
                             || '.' || ((doc_id * 17) % 256)::VARCHAR AS ftext
                 FROM documents)
      SELECT doc_id,
             len(regexp_extract_all(ftext, '${PiiEmail}')) AS n_emails,
             len(regexp_extract_all(ftext, '${PiiPhone}')) AS n_phones,
             len(regexp_extract_all(ftext, '${PiiIp}')) AS n_ips,
             md5(regexp_replace(
                   regexp_replace(
                     regexp_replace(ftext, '${PiiEmail}', '<EMAIL>', 'g'),
                     '${PiiIp}', '<IP>', 'g'),
                   '${PiiPhone}', '<PHONE>', 'g')) AS redacted_md5
      FROM d ORDER BY doc_id""",

    "t14_vocab" -> s"""
      WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
                   FROM documents),
      tf AS (SELECT term, doc_id, COUNT(*) AS c FROM tok GROUP BY 1, 2),
      v AS (SELECT term, SUM(c)::BIGINT AS tf, COUNT(*) AS df FROM tf GROUP BY term)
      SELECT row_number() OVER (ORDER BY tf DESC, term) AS rk, term, tf, df
      FROM v ORDER BY tf DESC, term LIMIT ${VocabK}""",

    // BPE first iteration against the word histogram: pair frequency =
    // Σ over word types of freq × occurrences-in-word; all integer
    "t18_bpe_pairs" -> s"""
      WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS term
                   FROM documents),
      wf AS (SELECT term, COUNT(*) AS freq FROM tok GROUP BY term),
      p AS (SELECT term, freq, unnest(range(1, length(term))) AS i
            FROM wf WHERE length(term) >= 2),
      pp AS (SELECT term, freq,
                    substring(term, CAST(i AS INT), 1) AS c1,
                    substring(term, CAST(i AS INT) + 1, 1) AS c2
             FROM p),
      agg AS (SELECT c1, c2, CAST(SUM(freq) AS BIGINT) AS pf,
                     COUNT(DISTINCT term) AS n_types
              FROM pp GROUP BY c1, c2)
      SELECT row_number() OVER (ORDER BY pf DESC, c1, c2) AS rk,
             c1, c2, pf, n_types
      FROM agg ORDER BY pf DESC, c1, c2 LIMIT ${BpeK}""",

    // the iterated BPE trainer: T27Iters unrolled count→argmax→merge
    // rounds over the word histogram (marker-encoded token sequences,
    // scalar-subquery merge literals — no re-escaping anywhere)
    "t27_bpe_train" -> t27BpeSql,
    // the vocab-target train: the SAME unrolled merge loop, run to
    // |merges| = T27bMerges (one distinct pair per round)
    "t27b_bpe_vocab_target" -> t27BpeSqlN(PipelineQueries.T27bMerges),

    // the apply half of the tokenizer loop: per-doc BPE token counts
    // through the fully-trained encode dictionary
    "t28_bpe_encode" -> t28BpeEncodeSql,

    // DSIR replayed verbatim: same 512-bucket md5 hash space, add-one
    // smoothed target/raw hashed-unigram LMs, ln on the identical
    // smoothed-ratio doubles, the same md5-derived Gumbel perturbation,
    // and ordering on the FLOORED integer key (doc_id tiebreak) so the
    // top-125 membership and ranks are engine-exact.
    "t25_dsir_resample" -> s"""
      WITH tok AS (SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS term
                   FROM documents),
      tb AS (SELECT doc_id, lang,
                    ('0x' || substr(md5(term), 1, 15))::BIGINT % ${PipelineQueries.DsirBuckets} AS b
             FROM tok),
      nb AS (SELECT doc_id, lang, b, COUNT(*)::BIGINT AS n FROM tb GROUP BY 1, 2, 3),
      ct AS (SELECT b, COUNT(*)::BIGINT AS c_t FROM tb
             WHERE lang = '${PipelineQueries.DsirTargetLang}' GROUP BY 1),
      cr AS (SELECT b, COUNT(*)::BIGINT AS c_r FROM tb GROUP BY 1),
      nt AS (SELECT COUNT(*)::BIGINT AS n_t FROM tb
             WHERE lang = '${PipelineQueries.DsirTargetLang}'),
      nr AS (SELECT COUNT(*)::BIGINT AS n_r FROM tb),
      lw AS (SELECT nb.doc_id, nb.lang,
                    SUM(nb.n * ln(((COALESCE(ct.c_t, 0) + 1) * (nr.n_r + ${PipelineQueries.DsirBuckets}))::DOUBLE
                                / ((cr.c_r + 1) * (nt.n_t + ${PipelineQueries.DsirBuckets}))::DOUBLE)) AS lw
             FROM nb JOIN cr USING (b) LEFT JOIN ct USING (b), nt, nr
             GROUP BY 1, 2),
      keyed AS (SELECT doc_id, lang,
                       CAST(floor(lw * 1000000.0 + 0.5) AS BIGINT) AS lw_e6,
                       CAST(floor((lw - ln(-ln(((('0x' || substr(md5('dsir:' || doc_id::VARCHAR), 1, 15))::BIGINT % 1000) + 0.5) / 1000.0)))
                                  * 1000000.0 + 0.5) AS BIGINT) AS key_e6
                FROM lw),
      top AS (SELECT * FROM keyed ORDER BY key_e6 DESC, doc_id LIMIT ${PipelineQueries.DsirK})
      SELECT CAST(row_number() OVER (ORDER BY key_e6 DESC, doc_id) AS BIGINT) AS rk,
             doc_id, lang, lw_e6, key_e6
      FROM top ORDER BY rk""",

    "t15_lm_score" -> """
      WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
                   FROM documents),
      tf AS (SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY 1, 2),
      ct AS (SELECT term, SUM(c)::BIGINT AS ctf FROM tf GROUP BY term),
      tot AS (SELECT SUM(ctf)::BIGINT AS tot FROM ct)
      SELECT doc_id, SUM(c)::BIGINT AS n_tokens,
             CAST(floor(SUM(c * ln(tot::DOUBLE / ctf::DOUBLE)) / SUM(c) * 1000000.0 + 0.5) AS BIGINT) AS lm_xent_e6
      FROM tf JOIN ct USING (term), tot
      GROUP BY doc_id ORDER BY doc_id""",

    // the naive global-window form of the score-ordered token cumsum; the
    // engine's range-partitioned two-level prefix sum must reproduce it
    "t17_ppl_buckets" -> """
      WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
                   FROM documents),
      tf AS (SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY 1, 2),
      ct AS (SELECT term, SUM(c)::BIGINT AS ctf FROM tf GROUP BY term),
      tot0 AS (SELECT SUM(ctf)::BIGINT AS tot0 FROM ct),
      sc AS (SELECT doc_id, SUM(c)::BIGINT AS n_tokens,
                    CAST(floor(SUM(c * ln(tot0::DOUBLE / ctf::DOUBLE)) / SUM(c) * 1000000.0 + 0.5) AS BIGINT) AS lm_xent_e6
             FROM tf JOIN ct USING (term), tot0
             GROUP BY doc_id),
      cw AS (SELECT doc_id, n_tokens, lm_xent_e6,
                    SUM(n_tokens) OVER (ORDER BY lm_xent_e6, doc_id
                                        ROWS UNBOUNDED PRECEDING) AS cum,
                    SUM(n_tokens) OVER () AS tot
             FROM sc)
      SELECT doc_id, n_tokens, lm_xent_e6,
             CASE WHEN 3 * (cum - n_tokens) < tot THEN 'head'
                  WHEN 3 * (cum - n_tokens) < 2 * tot THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
      FROM cw ORDER BY doc_id""",

    // the Spark side PARSES planted PNG headers byte-for-byte; this twin
    // recomputes the planted formulas, so hash equality proves the binary
    // decode inverted the plant exactly (33 = 8 sig + 25 IHDR chunk bytes)
    // even docs: 33-byte PNG header; odd docs: 39-byte JPEG SOI+APP0+SOF0.
    // A hash match proves the seam's signature dispatch + marker scan
    // recover exactly the planted formulas from either container.
    "m4_video_meta" -> """
      WITH base AS (
        SELECT doc_id,
               600 * (1 + doc_id % 4) AS ts,
               n_chars * (1 + doc_id % 3) AS du,
               1 + doc_id % 3 AS tr,
               octet_length(encode(text)) AS mb,
               sha256(text) AS sha256_hex
        FROM documents)
      SELECT doc_id,
             CAST(60 + tr * 24 + mb AS BIGINT) AS n_bytes,
             sha256_hex,
             'mp4/isom' AS codec,
             CAST(ts AS BIGINT) AS timescale,
             CAST(du * 1000 // ts AS BIGINT) AS duration_ms,
             CAST(tr AS BIGINT) AS n_traks,
             CAST(mb AS BIGINT) AS mdat_bytes
      FROM base ORDER BY doc_id""",
    "m3_audio_meta" -> """
      WITH base AS (
        SELECT doc_id,
               1 + doc_id % 2 AS c,
               8000 * (1 + doc_id % 3) AS r,
               (1 + doc_id % 4) * octet_length(encode(text)) AS data_size,
               sha256(repeat(text, CAST(1 + doc_id % 4 AS INT))) AS sha256_hex
        FROM documents),
      f AS (
        SELECT *, data_size // (c * 2) AS frames FROM base)
      SELECT doc_id,
             CAST(58 + data_size AS BIGINT) AS n_bytes,
             sha256_hex,
             'pcm_s16le' AS codec,
             CAST(r AS BIGINT) AS sample_rate,
             CAST(c AS BIGINT) AS channels,
             CAST(frames AS BIGINT) AS n_frames,
             CAST(frames * 1000 // r AS BIGINT) AS duration_ms,
             CAST(CASE WHEN frames >= r // 40
                       THEN 1 + (frames - r // 40) // (r // 100)
                       ELSE 0 END AS BIGINT) AS n_windows
      FROM f ORDER BY doc_id""",
    "m1_multimodal_meta" -> """
      SELECT doc_id,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 33 ELSE 39 END
                  + octet_length(encode(text)) AS BIGINT) AS n_bytes,
             sha256(text) AS sha256_hex,
             CASE WHEN doc_id % 2 = 0 THEN 'png/rgba8'
                  ELSE 'jpeg/baseline8' END AS codec,
             CAST(1 + n_chars % 1024 AS BIGINT) AS width,
             CAST(1 + doc_id % 768 AS BIGINT) AS height
      FROM documents ORDER BY doc_id""",

    // m5 aHash: every stage is engine-portable (md5 buckets, strict
    // integer mean compare, integer band values), so the oracle replays
    // the ENTIRE banded pipeline — fingerprint, candidates, Hamming and
    // the exact-Jaccard verify — not just a ground-truth pair set
    // m6: the audio pipeline replayed END-TO-END from the planted PCM
    // (decode is an identity over the data chunk, so the char-domain CDC
    // equals the parse-side split): rolling-window boundaries, chunk ids,
    // 64-bucket histogram, above-mean bits, banded candidates AND the
    // distinct-chunk-set Jaccard verify
    "m6_audio_fingerprint" -> s"""
      WITH p AS (SELECT doc_id, repeat(text, 1 + CAST(doc_id % 4 AS INT)) AS pcm
                 FROM documents),
      f0 AS (SELECT doc_id, pcm,
                    [p for p in range(${PipelineQueries.AfpCdcW}, length(pcm) + 1)
                     if ('0x' || substr(md5(substr(pcm, CAST(p - ${PipelineQueries.AfpCdcW} + 1 AS INT),
                                                  ${PipelineQueries.AfpCdcW})), 1, 15))::BIGINT
                        % ${PipelineQueries.AfpCdcD} = 0] AS bnds
             FROM p WHERE length(pcm) >= ${PipelineQueries.AfpCdcW}),
      f AS (SELECT doc_id, pcm,
                   CASE WHEN len(bnds) = 0 THEN [0, length(pcm)]
                        WHEN bnds[-1] = length(pcm) THEN list_prepend(0, bnds)
                        ELSE list_append(list_prepend(0, bnds), length(pcm)) END AS cuts
            FROM f0),
      fh0 AS (SELECT doc_id, CAST(len(cuts) - 1 AS BIGINT) AS nf,
                     [('0x' || substr(md5(substr(pcm, CAST(cuts[j] + 1 AS INT),
                                                 CAST(cuts[j + 1] - cuts[j] AS INT))), 1, 15))::BIGINT
                      for j in range(1, len(cuts))] AS fidl
              FROM f),
      fh AS (SELECT doc_id, nf, unnest(fidl) AS fid FROM fh0),
      hist AS (SELECT doc_id, nf, fid % 64 AS k, CAST(count(*) AS BIGINT) AS c
               FROM fh GROUP BY 1, 2, 3),
      setb AS (SELECT doc_id, k FROM hist WHERE 64 * c > nf),
      bsum AS (SELECT doc_id, k // 16 AS band,
                      sum(1::BIGINT << CAST(k % 16 AS INT)) AS v
               FROM setb GROUP BY doc_id, k // 16),
      bandv AS (SELECT dd.doc_id, r.band, COALESCE(bsum.v, 0) AS v
                FROM (SELECT DISTINCT doc_id FROM f) dd
                CROSS JOIN (SELECT range AS band FROM range(0, 4)) r
                LEFT JOIN bsum ON bsum.doc_id = dd.doc_id AND bsum.band = r.band),
      bl AS (SELECT doc_id, list(v ORDER BY band) AS bv FROM bandv GROUP BY doc_id),
      cand AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id,
                      CAST(list_sum(list_transform(range(1, 5),
                        i -> bit_count(xor(x.bv[i], y.bv[i])))) AS BIGINT) AS hamming
               FROM bl x JOIN bl y ON x.doc_id < y.doc_id
                 AND ((x.bv[1] = y.bv[1] AND x.bv[1] != 0)
                      OR (x.bv[2] = y.bv[2] AND x.bv[2] != 0)
                      OR (x.bv[3] = y.bv[3] AND x.bv[3] != 0)
                      OR (x.bv[4] = y.bv[4] AND x.bv[4] != 0))),
      fs AS (SELECT doc_id, list_distinct(list(fid)) AS fids FROM fh GROUP BY doc_id),
      dn AS (SELECT doc_id, fids, CAST(len(fids) AS BIGINT) AS n FROM fs),
      j AS (SELECT c.a_id, c.b_id, c.hamming,
                   CAST(len(list_intersect(a.fids, b.fids)) AS BIGINT) AS inter,
                   a.n + b.n - CAST(len(list_intersect(a.fids, b.fids)) AS BIGINT) AS uni
            FROM cand c JOIN dn a ON a.doc_id = c.a_id
            JOIN dn b ON b.doc_id = c.b_id)
      SELECT a_id, b_id, hamming, inter * 1000000 // uni AS jaccard_ppm
      FROM j WHERE 2 * inter >= uni ORDER BY a_id, b_id""",

    // the ENTIRE frame-sampled video pipeline replayed from the planted
    // boxes: the mdat stream is the text by construction (m4's plant),
    // frames are fixed-stride substr windows, features the same
    // 15-nibble md5 longs, then the dual candidate channel (bands gated
    // at bit_count >= 2 + the small-clip exact-frame join) and the
    // Jaccard verify — recall is graded, never assumed
    "m7_video_fingerprint" -> s"""
      WITH p AS (SELECT doc_id, text AS stream FROM documents
                 WHERE length(text) >= ${PipelineQueries.M7FrameW}),
      fh0 AS (SELECT doc_id,
                     CAST((length(stream) - ${PipelineQueries.M7FrameW})
                          // ${PipelineQueries.M7FrameHop} + 1 AS BIGINT) AS nf,
                     [('0x' || substr(md5(substr(stream,
                          CAST(k * ${PipelineQueries.M7FrameHop} + 1 AS INT),
                          ${PipelineQueries.M7FrameW})), 1, 15))::BIGINT
                      for k in range(0, (length(stream) - ${PipelineQueries.M7FrameW})
                                        // ${PipelineQueries.M7FrameHop} + 1)] AS fidl
              FROM p),
      fh AS (SELECT doc_id, nf, unnest(fidl) AS fid FROM fh0),
      hist AS (SELECT doc_id, nf, fid % 64 AS k, CAST(count(*) AS BIGINT) AS c
               FROM fh GROUP BY 1, 2, 3),
      setb AS (SELECT doc_id, k FROM hist WHERE 64 * c > nf),
      bsum AS (SELECT doc_id, k // 16 AS band,
                      sum(1::BIGINT << CAST(k % 16 AS INT)) AS v
               FROM setb GROUP BY doc_id, k // 16),
      bandv AS (SELECT dd.doc_id, r.band, COALESCE(bsum.v, 0) AS v
                FROM (SELECT DISTINCT doc_id FROM fh0) dd
                CROSS JOIN (SELECT range AS band FROM range(0, 4)) r
                LEFT JOIN bsum ON bsum.doc_id = dd.doc_id AND bsum.band = r.band),
      bl AS (SELECT doc_id, list(v ORDER BY band) AS bv FROM bandv GROUP BY doc_id),
      fs AS (SELECT doc_id, list_distinct(list(fid)) AS fids FROM fh GROUP BY doc_id),
      dn AS (SELECT doc_id, fids, CAST(len(fids) AS BIGINT) AS n FROM fs),
      canda AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id
                FROM bl x JOIN bl y ON x.doc_id < y.doc_id
                  AND ((x.bv[1] = y.bv[1] AND bit_count(x.bv[1]) >= 2)
                       OR (x.bv[2] = y.bv[2] AND bit_count(x.bv[2]) >= 2)
                       OR (x.bv[3] = y.bv[3] AND bit_count(x.bv[3]) >= 2)
                       OR (x.bv[4] = y.bv[4] AND bit_count(x.bv[4]) >= 2))),
      sm AS (SELECT doc_id, unnest(fids) AS fid FROM dn
             WHERE n <= ${PipelineQueries.M7SmallMax}),
      candb AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
                FROM sm x JOIN sm y ON x.fid = y.fid AND x.doc_id < y.doc_id),
      cand AS (SELECT a_id, b_id FROM canda UNION SELECT a_id, b_id FROM candb),
      ch AS (SELECT c.a_id, c.b_id,
                    CAST(list_sum(list_transform(range(1, 5),
                      i -> bit_count(xor(x.bv[i], y.bv[i])))) AS BIGINT) AS hamming
             FROM cand c JOIN bl x ON x.doc_id = c.a_id
             JOIN bl y ON y.doc_id = c.b_id),
      j AS (SELECT c.a_id, c.b_id, c.hamming,
                   CAST(len(list_intersect(a.fids, b.fids)) AS BIGINT) AS inter,
                   a.n + b.n - CAST(len(list_intersect(a.fids, b.fids)) AS BIGINT) AS uni
            FROM ch c JOIN dn a ON a.doc_id = c.a_id
            JOIN dn b ON b.doc_id = c.b_id)
      SELECT a_id, b_id, hamming, inter * 1000000 // uni AS jaccard_ppm
      FROM j WHERE 2 * inter >= uni ORDER BY a_id, b_id""",

    // both grids replayed from the planted payload identity (payload
    // text = document text, m5's oracle convention), the cosine in the
    // same exact-integer-grid / double-division / per-row-floor shape
    "m8_clip_filter" -> s"""
      WITH d0 AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                  FROM documents),
      img0 AS (SELECT doc_id,
                      CASE WHEN len(w) >= 3
                           THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                               for i in range(1, len(w) - 1)])
                           ELSE [] END AS ish
               FROM d0),
      cap0 AS (SELECT doc_id,
                      CASE WHEN doc_id % 5 = 0
                           THEN list_reverse(w[1:${PipelineQueries.M8CaptionWords}])
                           ELSE w[1:${PipelineQueries.M8CaptionWords}] END AS cw
               FROM d0),
      cap1 AS (SELECT doc_id,
                      list_distinct([cw[i] || ' ' || cw[i+1] || ' ' || cw[i+2]
                                     for i in range(1, len(cw) - 1)]) AS csh
               FROM cap0 WHERE len(cw) >= 3),
      cg AS (SELECT doc_id, CAST(len(csh) AS BIGINT) AS n_cap,
                    list_transform(csh,
                      s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 64) AS cbk
             FROM cap1 WHERE len(csh) >= 1),
      ig AS (SELECT doc_id, CAST(len(ish) AS BIGINT) AS n_img,
                    list_transform(ish,
                      s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 64) AS ibk
             FROM img0 WHERE len(ish) >= 1),
      gr AS (SELECT cg.doc_id, cg.n_cap, ig.n_img,
                    [CAST(len(list_filter(cg.cbk, b -> b = k)) AS DOUBLE)
                     for k in range(0, 64)] AS cgrid,
                    [CAST(len(list_filter(ig.ibk, b -> b = k)) AS DOUBLE)
                     for k in range(0, 64)] AS igrid
             FROM cg JOIN ig USING (doc_id)),
      sc AS (SELECT doc_id, n_cap, n_img,
                    CAST(floor(
                      list_sum(list_transform(range(1, 65), i -> cgrid[i] * igrid[i]))
                      / (sqrt(list_sum(list_transform(cgrid, x -> x * x)))
                         * sqrt(list_sum(list_transform(igrid, x -> x * x))))
                      * 1000000.0 + 0.5) AS BIGINT) AS cos_e6
             FROM gr)
      SELECT doc_id, n_cap, n_img, cos_e6,
             cos_e6 >= ${PipelineQueries.M8Threshold} AS keep
      FROM sc ORDER BY doc_id""",

    "m5_image_phash" -> s"""
      WITH $shingleCte,
      d AS (SELECT doc_id, sh, CAST(len(sh) AS BIGINT) AS n
            FROM sh WHERE len(sh) >= 1),
      px AS (SELECT doc_id, n,
                    ('0x' || substr(md5(su), 1, 15))::BIGINT % 64 AS k
             FROM (SELECT doc_id, n, unnest(sh) AS su FROM d) z),
      hist AS (SELECT doc_id, n, k, CAST(count(*) AS BIGINT) AS c
               FROM px GROUP BY doc_id, n, k),
      setb AS (SELECT doc_id, k FROM hist WHERE 64 * c > n),
      bsum AS (SELECT doc_id, k // 16 AS band,
                      sum(1::BIGINT << CAST(k % 16 AS INT)) AS v
               FROM setb GROUP BY doc_id, k // 16),
      bandv AS (SELECT dd.doc_id, r.band, COALESCE(bsum.v, 0) AS v
                FROM (SELECT DISTINCT doc_id FROM d) dd
                CROSS JOIN (SELECT range AS band FROM range(0, 4)) r
                LEFT JOIN bsum ON bsum.doc_id = dd.doc_id AND bsum.band = r.band),
      bl AS (SELECT doc_id, list(v ORDER BY band) AS bv
             FROM bandv GROUP BY doc_id),
      cand AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id,
                      CAST(list_sum(list_transform(range(1, 5),
                        i -> bit_count(xor(x.bv[i], y.bv[i])))) AS BIGINT) AS hamming
               -- a zero band never pairs (no above-mean signal in that
               -- stripe) — mirrors the Spark side's v != 0 band filter
               FROM bl x JOIN bl y ON x.doc_id < y.doc_id
                 AND ((x.bv[1] = y.bv[1] AND x.bv[1] != 0)
                      OR (x.bv[2] = y.bv[2] AND x.bv[2] != 0)
                      OR (x.bv[3] = y.bv[3] AND x.bv[3] != 0)
                      OR (x.bv[4] = y.bv[4] AND x.bv[4] != 0))),
      j AS (SELECT c.a_id, c.b_id, c.hamming,
                   CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
                   CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS uni
            FROM cand c
            JOIN d a ON a.doc_id = c.a_id
            JOIN d b ON b.doc_id = c.b_id)
      SELECT a_id, b_id, hamming, inter * 1000000 // uni AS jaccard_ppm
      FROM j WHERE 2 * inter >= uni ORDER BY a_id, b_id""",

    // pipe6: the cut corpus, packed — d16's CTE chain verbatim, then
    // t26's packing arithmetic over the SURVIVING word counts; one chained
    // oracle so a single mis-cut token shifting every later context
    // boundary is caught as a stage INTERACTION, not just per stage
    "pipe6_cut_pack" -> s"""
      WITH $d16CutCtes,
      dd AS (SELECT doc_id, CAST(kept_words AS BIGINT) AS est_tokens
             FROM kept WHERE kept_words >= 1),
      c AS (SELECT doc_id, est_tokens,
                   CAST(SUM(est_tokens) OVER (ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM dd),
      s AS (SELECT doc_id, cum_tokens,
                   cum_tokens - est_tokens AS strt FROM c),
      x AS (SELECT doc_id, strt, cum_tokens,
                   unnest(range(strt // ${PipelineQueries.SeqLen},
                                (cum_tokens - 1) // ${PipelineQueries.SeqLen} + 1)) AS seq_id
            FROM s)
      SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
             CAST(greatest(strt, seq_id * ${PipelineQueries.SeqLen}) - strt AS BIGINT) AS doc_from,
             CAST(least(cum_tokens, (seq_id + 1) * ${PipelineQueries.SeqLen}) - strt AS BIGINT) AS doc_to,
             CAST(greatest(strt, seq_id * ${PipelineQueries.SeqLen})
                  - seq_id * ${PipelineQueries.SeqLen} AS BIGINT) AS pos_from,
             CAST(least(cum_tokens, (seq_id + 1) * ${PipelineQueries.SeqLen})
                  - greatest(strt, seq_id * ${PipelineQueries.SeqLen}) AS BIGINT) AS n_toks
      FROM x ORDER BY seq_id, pos_from""",

    // pipe5: the ONE-SHOT recomputation the incremental store run must
    // equal — quality gate, min-id exact dedup over the gated corpus,
    // then t12's measured-total mixture over the survivors
    "pipe5_incremental_corpus" -> s"""
      WITH lg AS (SELECT doc_id, string_split(lower(text), ' ') AS lw
                  FROM documents),
      q AS (SELECT d.doc_id, d.source, d.n_chars, d.text
            FROM documents d JOIN lg ON lg.doc_id = d.doc_id
            WHERE (least(100, len(lg.lw))::BIGINT * len(lg.lw)
                   + 100 * len(list_filter(lg.lw, x -> x IN ${inList(StopEn)})))
                  * 5000 // len(lg.lw) >= ${CorpusPrep.QualityMinPpm}),
      keep AS (SELECT doc_id, source, n_chars FROM (
                 SELECT doc_id, source, n_chars,
                        row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
                 FROM q) t WHERE rn = 1),
      dd AS (SELECT doc_id, source, ceil(n_chars / 4.0)::BIGINT AS est_tokens
             FROM keep),
      s AS (SELECT source, SUM(est_tokens)::BIGINT AS src_tokens,
                   CASE ${PipelineQueries.MixSharePermille.map { case (s, r) =>
        s"WHEN source = '$s' THEN $r" }.mkString(" ")}
                        ELSE ${PipelineQueries.MixShareDefault} END AS share_pm
            FROM dd GROUP BY source),
      b AS (SELECT MIN(src_tokens * 1000 // share_pm) AS budget FROM s),
      r AS (SELECT source, least(1000, b.budget * share_pm // src_tokens) AS keep_pm
            FROM s, b)
      SELECT dd.doc_id, dd.source, dd.est_tokens, r.keep_pm,
             1000000000 // r.keep_pm AS weight_ppm
      FROM dd JOIN r USING (source)
      WHERE ('0x' || substr(md5('mix:' || dd.doc_id::VARCHAR), 1, 15))::BIGINT % 1000
            < r.keep_pm
      ORDER BY dd.doc_id""")

  private val base: Map[String, String] = baseA ++ baseB

  val all: Map[String, String] = base ++ Map(
    // the streaming near-dup table must converge to d2's exact all-pairs
    // result — same oracle, different engine path
    "d2s_stream_neardup" -> base("d2_minhash_lsh"),
    // the streamed bounded-state sample must serve EXACTLY the one-shot
    // k10 rows — min-k mergeability makes redelivery and replay invisible
    "k10s_stream_sample" -> base("k10_priority_sample"),
    // the incrementally re-planned epoch table must equal the one-shot
    // apportionment over the union corpus — arrival order, redelivery
    // and the changed-row rewrite discipline all invisible
    "t30b_epoch_replan" -> base("t30_epoch_plan"),

    // t30's Hamilton plan replayed, every (doc, epoch) instance salted to
    // its 60-bit position, one running-sum pack into shards — the order
    // file a loader executes, end to end in SQL
    "t31_epoch_shuffle" -> epochOrderSql(
      """d AS (SELECT source AS g, doc_id, (n_chars + 3) // 4 AS tok
               FROM documents)"""),

    // d1's digest election + t20's hard gates + t30's apportionment +
    // t31's order, replayed as one chained CTE — the full last-mile path
    "pipe7_training_order" -> epochOrderSql(s"""
      keep AS (SELECT doc_id FROM (
                 SELECT doc_id,
                        row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
                 FROM documents) WHERE rn = 1),
      f0 AS (SELECT d0.doc_id, d0.source, d0.n_chars,
                    CAST(length(d0.text) AS BIGINT) AS len_c,
                    string_split(lower(d0.text), ' ') AS w
             FROM documents d0 JOIN keep USING (doc_id)),
      f1 AS (SELECT doc_id, source, n_chars,
                    CAST(len(w) AS BIGINT) AS n_words,
                    (len_c - (len(w) - 1)) * 1000000 // len(w) AS f_meanlen6,
                    len(list_distinct(w)) * 1000000 // len(w) AS ttr6,
                    CAST(len(list_filter(w, x -> x IN ${inList(StopEn)})) AS BIGINT)
                      AS n_stop
             FROM f0),
      surv AS (SELECT doc_id, source, n_chars FROM f1
               WHERE n_words >= ${T20MinWords} AND n_words <= ${T20MaxWords}
                 AND f_meanlen6 >= ${T20MeanLo} AND f_meanlen6 <= ${T20MeanHi}
                 AND ttr6 >= ${T20TtrMin} AND n_stop >= ${T20MinStop}),
      d AS (SELECT source AS g, doc_id, (n_chars + 3) // 4 AS tok FROM surv)"""),

    // incremental CC through the store must converge to d6's one-shot
    // recursive-CTE cluster assignment — edge arrival order is invisible
    "g2_incremental_cc" -> base("d6_dedup_clusters"),

    // triangles over the exact pair set by the NAIVE x<y<z three-way
    // join — a different algorithm than the gate's rank-oriented
    // node-iterator, so an orientation bug or double-count reds the hash
    "g4_triangles" -> g4TrianglesSql,

    // the additive per-batch maintenance must land on the identical
    // recount — arrival order, redelivery and the delta discipline are
    // invisible in the final (deg, tri, lcc) table
    "g4b_incremental_triangles" -> g4TrianglesSql,
    // rank state maintained through the store must land on the one-shot
    // unrolled fixed point — batched edge arrival, redelivery and
    // per-iteration persistence are invisible to the hashed surface
    "g1b_incremental_pagerank" -> base("g1_pagerank"),
    // incremental CC under edge RETIREMENT: d6's closure over the
    // SURVIVING edge set — the declarative grade for the delete + scoped
    // recompute discipline (a split must re-label both halves; an
    // isolated vertex must leave the labeling)
    "g2b_cc_retirement" -> ccClustersSql(
      s"AND (a_id + b_id) % ${PipelineQueries.G2bRetireMod} <> ${PipelineQueries.G2bRetireRem}"),
    // the persisted-and-incrementally-merged index must serve EXACTLY
    // what the per-query rebuild computes — same oracle, verbatim
    "v15_persisted_ivfpq" -> base("v7_ivfpq"),
    // after the index table's row-level DELETE + OPTIMIZE, serving must
    // equal the per-query rebuild over exactly the SURVIVING corpus
    "v16_index_maintenance" -> ivfpqSql("e2.vec_id % 7 != 6"),
    // the STREAMING-maintained index (file-source micro-batches with a
    // redelivered overlap) must converge to the same serving result
    "v15s_stream_index" -> base("v7_ivfpq"),
    // the cell-PARTITIONED index (DPP-pruned serving scan) must serve
    // the same result — layout changes cost, never results
    "v18_partitioned_index" -> base("v7_ivfpq"),
    // the BUCKETED store layout (zero-exchange digest join through two
    // bucketed tables) must serve the same rows as the declarative,
    // unbucketed join — layout changes cost, never results
    "dag_bucketed_join" -> """
      WITH d AS (SELECT doc_id, sha256(text) AS digest, source FROM documents),
      c AS (SELECT digest, MIN(doc_id) AS canonical_doc,
                   COUNT(*) AS dup_count
            FROM d GROUP BY digest)
      SELECT d.doc_id, d.digest, d.source, c.canonical_doc, c.dup_count,
             d.doc_id = c.canonical_doc AS is_canonical
      FROM d JOIN c USING (digest)
      ORDER BY d.doc_id""")
}
