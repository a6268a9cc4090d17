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
