package graft

import graft.ops.Similarity

/** DuckDB oracles for the hyperplane-LSH ANN queries (VERDICT r5 ask #7).
  *
  * The hyperplanes are seeded driver-side Gaussians; instead of making
  * DuckDB replay the RNG, the exact plane doubles are inlined as literals
  * (%.17e round-trips exactly) — the same pinned-params pattern as the
  * NM forecast oracles. DuckDB then replays deterministically: sign-bit
  * bucket assignment, the Lv-et-al multi-probe flip ranking, the band
  * self-join, and the exact cosine verify.
  *
  * Float-parity: `list_dot_product` / `list_cosine_similarity` accumulate
  * sequentially like the Scala loops; a last-ulp difference only matters
  * at a sign boundary (|dot| ~ 1e-16, not observed on the test panel) —
  * cosines round through the shared 6-dp nudge discipline.
  */
object AnnOracle {

  private def dlit(v: Double): String = "%.17e".format(v)

  private def planeList(p: Array[Double]): String =
    p.map(dlit).mkString("[", ", ", "]")

  /** Packed sign-bit bucket of `v` (a DOUBLE[] SQL expression) against the
    * given planes — mirror of Similarity.hyperplaneBucket. */
  private def bucketExpr(v: String, planes: Array[Array[Double]]): String =
    planes.zipWithIndex.map { case (p, b) =>
      s"(CASE WHEN list_dot_product($v, ${planeList(p)}) >= 0.0 THEN ${1L << b} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** emb_knn_lsh replay: corpus buckets, query base bucket + `probes`
    * multi-probe flips (1- and 2-bit masks ranked by summed |margin|,
    * ties by mask — ORDER BY s, m = the kernel's stable sortBy), bucket
    * join, exact cosine, per-query top-k. */
  def lshTopKSql(dim: Int, bits: Int, probes: Int, k: Int, seed: Long = 42L,
      queryFilter: String = "vec_id < 20"): String = {
    val planes = Similarity.hyperplanes(dim, bits, seed)
    val dots = planes.zipWithIndex.map { case (p, b) =>
      s"list_dot_product(embedding::DOUBLE[], ${planeList(p)}) AS d$b"
    }.mkString(",\n  ")
    val b0 = (0 until bits).map(b =>
      s"(CASE WHEN d$b >= 0.0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    val singles = (0 until bits).map(f => s"SELECT query_id, abs(d$f) AS s, ${1L << f} AS m FROM qd")
    val pairs = for {
      f1 <- 0 until bits; f2 <- f1 + 1 until bits
    } yield s"SELECT query_id, abs(d$f1) + abs(d$f2), ${(1L << f1) | (1L << f2)} FROM qd"
    s"""WITH cb AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
       |  ${bucketExpr("embedding::DOUBLE[]", planes)} AS bucket FROM embeddings),
       |qd AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
       |  $dots
       |  FROM embeddings WHERE $queryFilter),
       |qb AS (SELECT *, $b0 AS b0 FROM qd),
       |cand AS (${(singles ++ pairs).mkString("\n  UNION ALL ")}),
       |probe AS (SELECT query_id, m FROM (SELECT *,
       |    row_number() OVER (PARTITION BY query_id ORDER BY s, m) AS rk FROM cand)
       |  WHERE rk <= $probes),
       |qbuckets AS (SELECT query_id, qv, b0 AS bucket FROM qb
       |  UNION SELECT qb.query_id, qb.qv, xor(qb.b0::BIGINT, p.m::BIGINT)
       |  FROM qb JOIN probe p USING (query_id)),
       |scored AS (SELECT q.query_id, c.neighbor_id,
       |    list_cosine_similarity(q.qv, c.cv) AS cosine
       |  FROM qbuckets q JOIN cb c USING (bucket)
       |  WHERE c.neighbor_id <> q.query_id),
       |ranked AS (SELECT *, row_number() OVER
       |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, round(cosine + 1e-9, 6) AS cosine, rank
       |FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** emb_knn_ivf replay with pinned quantizer centroids (the sampled
    * Lloyd k-means runs in Scala at Verify time; here the centers are
    * literals): corpus cell = argmin distance with first-index tie-break
    * (the kernel's strict-< scan), query probes = nprobe nearest cells
    * (stable sort → ORDER BY distance, cell), cell join, exact cosine,
    * per-query top-k. `list_distance` (euclidean) replaces the kernel's
    * squared distance — monotone, so argmin and ordering agree. */
  def ivfTopKSql(centers: Array[Array[Double]], nprobe: Int, k: Int,
      queryFilter: String = "vec_id < 20"): String = {
    val nc = centers.length
    def dists(v: String) = centers.zipWithIndex.map { case (c, i) =>
      s"list_distance($v, ${planeList(c)}) AS d$i"
    }.mkString(",\n  ")
    val m = s"least(${(0 until nc).map(i => s"d$i").mkString(", ")})"
    val argmin =
      s"(CASE ${(0 until nc).map(i => s"WHEN d$i = __m THEN $i").mkString(" ")} END)"
    val probeRows = (0 until nc).map(i =>
      s"SELECT query_id, d$i AS dd, $i AS cell FROM qd").mkString("\n  UNION ALL ")
    s"""WITH cd AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
       |  ${dists("embedding::DOUBLE[]")}
       |  FROM embeddings),
       |cb AS (SELECT neighbor_id, cv, $argmin AS cell
       |  FROM (SELECT *, $m AS __m FROM cd)),
       |qd AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
       |  ${dists("embedding::DOUBLE[]")}
       |  FROM embeddings WHERE $queryFilter),
       |qc AS (SELECT query_id, cell FROM (SELECT query_id, cell,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dd, cell) AS rk
       |  FROM ($probeRows)) WHERE rk <= $nprobe),
       |scored AS (SELECT q.query_id, c.neighbor_id,
       |    list_cosine_similarity(q.qv, c.cv) AS cosine
       |  FROM qc JOIN qd q USING (query_id) JOIN cb c USING (cell)
       |  WHERE c.neighbor_id <> q.query_id),
       |ranked AS (SELECT *, row_number() OVER
       |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, round(cosine + 1e-9, 6) AS cosine, rank
       |FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** emb_semdedup replay with pinned quantizer centroids: corpus ∪
    * injected exact duplicates (vec_id < 10 → +100000), cell = argmin
    * list_distance with first-index tie-break (the kernel's strict-<
    * scan), within-cell smaller-id join, cosine ≥ threshold → dup mark
    * with the max prior cosine. */
  def semDedupSql(centers: Array[Array[Double]], threshold: Double): String = {
    val nc = centers.length
    val dists = centers.zipWithIndex.map { case (c, i) =>
      s"list_distance(v, ${planeList(c)}) AS d$i"
    }.mkString(",\n  ")
    val m = s"least(${(0 until nc).map(i => s"d$i").mkString(", ")})"
    val argmin =
      s"(CASE ${(0 until nc).map(i => s"WHEN d$i = __m THEN $i").mkString(" ")} END)"
    s"""WITH base AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 100000, embedding::DOUBLE[] FROM embeddings WHERE vec_id < 10),
       |cd AS (SELECT vec_id, v, $dists FROM base),
       |cb AS (SELECT vec_id, v, $argmin AS cell
       |  FROM (SELECT *, $m AS __m FROM cd)),
       |marks AS (SELECT b.vec_id,
       |    max(list_cosine_similarity(a.v, b.v)) AS mx
       |  FROM cb a JOIN cb b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE list_cosine_similarity(a.v, b.v) >= $threshold
       |  GROUP BY b.vec_id)
       |SELECT c.vec_id, c.cell, m.mx IS NOT NULL AS is_dup,
       |  round(m.mx + 1e-9, 6) AS max_prior_cosine
       |FROM cb c LEFT JOIN marks m USING (vec_id)""".stripMargin
  }

  /** Shared topic-cell CTE body: vec_id → argmin-list_distance topic over
    * the pinned centroids (first-index tie-break, the kernel's strict-<
    * scan). Yields relation (vec_id, topic, dist). */
  def topicCellsSql(centers: Array[Array[Double]]): String = {
    val nc = centers.length
    val dists = centers.zipWithIndex.map { case (c, i) =>
      s"list_distance(embedding::DOUBLE[], ${planeList(c)}) AS d$i"
    }.mkString(",\n  ")
    val m = s"least(${(0 until nc).map(i => s"d$i").mkString(", ")})"
    val argmin =
      s"(CASE ${(0 until nc).map(i => s"WHEN d$i = __m THEN $i").mkString(" ")} END)"
    s"""SELECT vec_id, $argmin AS topic, __m AS dist
       |  FROM (SELECT *, $m AS __m
       |    FROM (SELECT vec_id, $dists FROM embeddings))""".stripMargin
  }

  /** emb_topic_assign replay: pinned-centroid argmin cell + Euclidean
    * distance to the winner (list_distance ≡ the kernel's sequential
    * Σ(a−b)² then sqrt; monotone, so the argmin agrees with the squared
    * scan). */
  def topicAssignSql(centers: Array[Array[Double]]): String =
    s"""SELECT vec_id, topic, round(dist + 1e-9, 6) AS centroid_dist
       |FROM (${topicCellsSql(centers)})""".stripMargin

  /** emb_prototype_prune replay with pinned centroids (Sorscher et al.
    * 2022 prototype-difficulty pruning): argmin cell, cosine to the
    * winning prototype picked by an ordered CASE over the same cells,
    * difficulty = 1 − cos, keep-threshold from the round(difficulty, 4)
    * histogram cumulative — the binned (1−keepFrac) quantile, exactly the
    * operator's bin arithmetic. */
  def prototypePruneSql(centers: Array[Array[Double]],
      keepFrac: Double): String = {
    val cosCase = s"(CASE topic ${centers.zipWithIndex.map { case (c, i) =>
      s"WHEN $i THEN list_cosine_similarity(v, ${planeList(c)})"
    }.mkString(" ")} END)"
    s"""WITH cells AS (
       |  SELECT t.vec_id, t.topic, e.embedding::DOUBLE[] AS v
       |  FROM (${topicCellsSql(centers)}) t
       |  JOIN embeddings e USING (vec_id)),
       |scored AS (SELECT vec_id, topic AS cell, $cosCase AS pc,
       |    1.0 - $cosCase AS diff FROM cells),
       |bins AS (SELECT round(diff, 4) AS bin, count(*) AS c
       |  FROM scored GROUP BY 1),
       |cum AS (SELECT bin,
       |    sum(c) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND CURRENT ROW)::DOUBLE / (SELECT sum(c) FROM bins) AS cumf
       |  FROM bins),
       |th AS (SELECT min(CASE WHEN cumf >= ${1.0 - keepFrac} THEN bin END)
       |  AS t FROM cum)
       |SELECT s.vec_id, s.cell, round(s.pc + 1e-9, 6) AS proto_cos,
       |  round(s.diff, 4) >= th.t AS keep
       |FROM scored s, th""".stripMargin
  }

  /** emb_pca replay with pinned components: pcⱼ = x·cⱼ − (μ·cⱼ), the
    * mean offset precomputed driver-side with the same sequential dot the
    * projection UDF uses. `list_dot_product` accumulates sequentially, so
    * the only float divergence is the final subtraction — absorbed by the
    * shared 6-dp nudge. */
  def pcaProjectSql(m: graft.ops.Embeddings.PcaModel): String = {
    val cols = m.components.zipWithIndex.map { case (c, j) =>
      var off = 0.0
      var i = 0
      while (i < c.length) { off += m.mean(i) * c(i); i += 1 }
      s"round(list_dot_product(embedding::DOUBLE[], ${planeList(c)}) - ${dlit(off)} + 1e-9, 6) AS pc${j + 1}"
    }.mkString(",\n  ")
    s"SELECT vec_id,\n  $cols\nFROM embeddings"
  }

  /** emb_pca_var replay: the pinned explained-variance ratios as literals.
    * Non-vacuous because the QUERY refits PCA on the corpus — the compare
    * proves the distributed Gram + eigensolve reproduces the Verify-time
    * fit bit-for-bit (to the 6-dp nudge). */
  def pcaVarSql(m: graft.ops.Embeddings.PcaModel): String =
    m.explained.zipWithIndex.map { case (e, j) =>
      s"SELECT ${j + 1} AS component, round(${dlit(e)} + 1e-9, 6) AS explained_ratio"
    }.mkString("\nUNION ALL ")

  /** Squared distance between an 8-ish-dim slice of SQL vector `v`
    * starting at `offset` (0-based) and a centroid — written as a
    * left-associated term sum so the accumulation order matches the
    * Scala kernel loop exactly. */
  private def sqDistExpr(v: String, offset: Int, c: Array[Double]): String =
    c.zipWithIndex.map { case (x, t) =>
      val e = s"($v[${offset + t + 1}] - ${dlit(x)})"
      s"($e * $e)"
    }.mkString("(", " + ", ")")

  /** Per-subspace PQ code columns c_0..c_{m-1}: argmin squared distance
    * with first-index tie-break (the kernel's strict-< scan). Emits two
    * CTE bodies over input CTE `src(vec_id, carry…, vcol)`; extra `carry`
    * columns ride through to the `codes` CTE (the IVFADC replay carries
    * the cell id). */
  private def pqCodeCtes(cb: Array[Array[Array[Double]]], src: String = "e",
      vcol: String = "v", carry: Seq[String] = Nil): String = {
    val dsub = cb(0)(0).length
    val cc = carry.map(c => s"$c, ").mkString
    val dists = cb.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, j) =>
        s"${sqDistExpr("v", s * dsub, c)} AS d_${s}_$j"
      }
    }.mkString(",\n  ")
    val codes = cb.indices.map { s =>
      s"(CASE ${cb(s).indices.map(j => s"WHEN d_${s}_$j = __m$s THEN $j").mkString(" ")} END) AS c_$s"
    }.mkString(",\n  ")
    val mins = cb.indices.map { s =>
      s"least(${cb(s).indices.map(j => s"d_${s}_$j").mkString(", ")}) AS __m$s"
    }.mkString(",\n  ")
    s"""dd AS (SELECT vec_id, $cc$vcol AS v,
       |  $dists
       |  FROM $src),
       |dm AS (SELECT *, $mins FROM dd),
       |codes AS (SELECT vec_id, ${cc}v,
       |  $codes
       |  FROM dm)""".stripMargin
  }

  /** emb_pq_codes replay with pinned codebooks. */
  def pqCodesSql(cb: Array[Array[Array[Double]]]): String = {
    val csv = cb.indices.map(s => s"c_$s::VARCHAR").mkString(" || ',' || ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${pqCodeCtes(cb)}
       |SELECT vec_id, $csv AS codes FROM codes""".stripMargin
  }

  /** emb_knn_pq replay: corpus codes (pinned codebooks) × broadcast
    * queries; ADC = Σ_s sqdist(query slice, selected sub-centroid),
    * summed in subspace order like the kernel. */
  def pqAdcTopKSql(cb: Array[Array[Array[Double]]], k: Int,
      queryFilter: String = "vec_id < 20"): String = {
    val dsub = cb(0)(0).length
    val adc = cb.indices.map { s =>
      s"(CASE c.c_$s ${cb(s).zipWithIndex.map { case (c0, j) =>
        s"WHEN $j THEN ${sqDistExpr("q.qv", s * dsub, c0)}"
      }.mkString(" ")} END)"
    }.mkString("(", " + ", ")")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${pqCodeCtes(cb)},
       |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |  FROM embeddings WHERE $queryFilter),
       |scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |    $adc AS adc
       |  FROM codes c CROSS JOIN q
       |  WHERE c.vec_id <> q.query_id),
       |ranked AS (SELECT *, row_number() OVER
       |  (PARTITION BY query_id ORDER BY adc, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, round(adc + 1e-9, 6) AS adc, rank
       |FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** emb_knn_ivfpq (IVFADC) replay with pinned coarse centroids AND
    * pinned residual codebooks: corpus cell = argmin list_distance
    * (first-index ties), residual = v − cellCentroid element-wise (the
    * kernel's subtraction order), residual PQ codes via [[pqCodeCtes]],
    * query probes = nprobe nearest cells, per-(query, cell) residual,
    * ADC = Σ_s sqdist(query-residual slice, coded sub-centroid), cell
    * join, per-query ADC shortlist of `rerank`, exact-cosine re-rank,
    * top-k. */
  def ivfPqTopKSql(centers: Array[Array[Double]], cb: Array[Array[Array[Double]]],
      nprobe: Int, k: Int, rerank: Int = 64,
      queryFilter: String = "vec_id < 20"): String = {
    val nc = centers.length
    val dim = centers(0).length
    val dsub = cb(0)(0).length
    def dists(v: String) = centers.zipWithIndex.map { case (c, i) =>
      s"list_distance($v, ${planeList(c)}) AS d$i"
    }.mkString(",\n  ")
    val m = s"least(${(0 until nc).map(i => s"d$i").mkString(", ")})"
    val argmin =
      s"(CASE ${(0 until nc).map(i => s"WHEN d$i = __m THEN $i").mkString(" ")} END)"
    def ccCase(cellRef: String) =
      s"(CASE $cellRef ${centers.zipWithIndex.map { case (c, i) =>
        s"WHEN $i THEN ${planeList(c)}" }.mkString(" ")} END)"
    val probeRows = (0 until nc).map(i =>
      s"SELECT query_id, d$i AS dd, $i AS cell FROM qd").mkString("\n  UNION ALL ")
    val adc = cb.indices.map { s =>
      s"(CASE c.c_$s ${cb(s).zipWithIndex.map { case (c0, j) =>
        s"WHEN $j THEN ${sqDistExpr("q.qr", s * dsub, c0)}"
      }.mkString(" ")} END)"
    }.mkString("(", " + ", ")")
    s"""WITH cd AS (SELECT vec_id, embedding::DOUBLE[] AS v,
       |  ${dists("embedding::DOUBLE[]")}
       |  FROM embeddings),
       |asg AS (SELECT vec_id, v, $argmin AS cell
       |  FROM (SELECT *, $m AS __m FROM cd)),
       |rr AS (SELECT vec_id, cell,
       |  list_transform(generate_series(1, $dim), i -> v[i::INT] - (${ccCase("cell")})[i::INT]) AS r
       |  FROM asg),
       |${pqCodeCtes(cb, src = "rr", vcol = "r", carry = Seq("cell"))},
       |qd AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
       |  ${dists("embedding::DOUBLE[]")}
       |  FROM embeddings WHERE $queryFilter),
       |qc AS (SELECT query_id, cell FROM (SELECT query_id, cell,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dd, cell) AS rk
       |  FROM ($probeRows)) WHERE rk <= $nprobe),
       |qres AS (SELECT qq.query_id, p.cell,
       |  list_transform(generate_series(1, $dim), i -> qq.qv[i::INT] - (${ccCase("p.cell")})[i::INT]) AS qr
       |  FROM qc p JOIN qd qq USING (query_id)),
       |scored AS (SELECT q.query_id, c.vec_id AS neighbor_id, $adc AS adc
       |  FROM codes c JOIN qres q USING (cell)
       |  WHERE c.vec_id <> q.query_id),
       |short AS (SELECT query_id, neighbor_id FROM (SELECT *, row_number() OVER
       |  (PARTITION BY query_id ORDER BY adc, neighbor_id) AS ar FROM scored)
       |  WHERE ar <= $rerank),
       |rer AS (SELECT s.query_id, s.neighbor_id,
       |    list_cosine_similarity(qd.qv, cd.v) AS cosine
       |  FROM short s JOIN qd ON qd.query_id = s.query_id
       |  JOIN cd ON cd.vec_id = s.neighbor_id),
       |ranked AS (SELECT *, row_number() OVER
       |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM rer)
       |SELECT query_id, neighbor_id, round(cosine + 1e-9, 6) AS cosine, rank
       |FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** emb_near_dup replay: corpus ∪ injected duplicates (vec_id < 10 →
    * +100000), one band self-join per hyperplane table, candidate union,
    * exact cosine ≥ threshold. */
  def nearDupSql(dim: Int, bits: Int, tables: Int, threshold: Double,
      seed: Long = 42L): String = {
    val tableCtes = (0 until tables).map { t =>
      val planes = Similarity.hyperplanes(dim, bits, seed + t)
      s"b$t AS (SELECT vec_id, v, ${bucketExpr("v", planes)} AS bucket FROM base)"
    }
    val joins = (0 until tables).map(t =>
      s"SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM b$t a JOIN b$t b " +
        s"ON a.bucket = b.bucket AND a.vec_id < b.vec_id")
    s"""WITH base AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 100000, embedding::DOUBLE[] FROM embeddings WHERE vec_id < 10),
       |${tableCtes.mkString(",\n")},
       |cand AS (${joins.mkString("\n  UNION ")})
       |SELECT c.id_a, c.id_b,
       |  round(list_cosine_similarity(va.v, vb.v) + 1e-9, 6) AS cosine
       |FROM cand c
       |JOIN base va ON va.vec_id = c.id_a
       |JOIN base vb ON vb.vec_id = c.id_b
       |WHERE list_cosine_similarity(va.v, vb.v) >= $threshold""".stripMargin
  }
}
