package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Linear embedding analytics: PCA fit/projection over an embedding
  * column (`Array[Float]`/`Array[Double]`).
  *
  * Scale design (the RowMatrix.computeGramianMatrix shape): ONE pass over
  * the corpus accumulates the d-dim sum and the upper-triangle of the
  * d×d Gram per partition in primitive arrays, then tree-reduces —
  * driver traffic is O(d²) doubles (d=64 → 16 KB), independent of corpus
  * size. The d×d eigensolve happens once on the driver (breeze eigSym);
  * the projection is a narrow broadcast map. No shuffle anywhere: at
  * 100 TB the cost is exactly one corpus scan. A column-product
  * `agg(sum(x_i*x_j)...)` would need d(d+1)/2 ≈ 2k codegen'd aggregate
  * expressions — the treeAggregate keeps the hot loop in primitive
  * arrays instead (the sanctioned per-partition-imperative RDD case).
  */
object Embeddings {

  /** Principal components sorted by eigenvalue descending. `components`
    * are unit eigenvectors of the population covariance with a
    * deterministic sign (largest-|coordinate| entry positive);
    * `explained` are variance ratios λᵢ/Σλ. */
  case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
      explained: Array[Double])

  def pcaFit(df: DataFrame, k: Int, vecCol: String = "embedding"): PcaModel = {
    val vecs = df.select(col(vecCol).cast("array<double>"))
      .rdd.map(_.getSeq[Double](0))
    // acc = [n, sum_0..sum_{d-1}, upper-triangle gram (row-major)]
    val d = vecs.first().length
    val tri = d * (d + 1) / 2
    val zero = new Array[Double](1 + d + tri)
    val acc = vecs.treeAggregate(zero)(
      seqOp = (a, v) => {
        a(0) += 1.0
        var i = 0
        var t = 1 + d
        while (i < d) {
          val xi = v(i)
          a(1 + i) += xi
          var j = i
          while (j < d) { a(t) += xi * v(j); t += 1; j += 1 }
          i += 1
        }
        a
      },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      })
    val n = acc(0)
    require(n > 0, "pcaFit: empty input")
    val mean = Array.tabulate(d)(i => acc(1 + i) / n)
    // population covariance C = E[xxᵀ] − μμᵀ
    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    var t = 1 + d
    for (i <- 0 until d; j <- i until d) {
      val c = acc(t) / n - mean(i) * mean(j)
      cov(i, j) = c; cov(j, i) = c
      t += 1
    }
    val es = breeze.linalg.eigSym(cov) // eigenvalues ascending
    val order = (0 until d).sortBy(i => -es.eigenvalues(i)).take(k)
    val trace = (0 until d).map(es.eigenvalues(_)).sum
    val comps = order.map { i =>
      val v = Array.tabulate(d)(r => es.eigenvectors(r, i))
      // deterministic sign: the largest-|coordinate| entry is positive
      val m = v.indices.maxBy(r => (math.abs(v(r)), -r))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    PcaModel(mean, comps,
      order.map(i => es.eigenvalues(i) / math.max(trace, 1e-300)).toArray)
  }

  /** Per-dimension (min, max) over the corpus — one treeAggregate pass in
    * primitive arrays (the pcaFit shape). min/max are order-independent,
    * so the result is bit-exact under any partitioning — which is what
    * lets the quantization oracle recompute them in plain SQL. */
  def dimMinMax(df: DataFrame, vecCol: String = "embedding"): (Array[Double], Array[Double]) = {
    val vecs = df.select(col(vecCol).cast("array<double>"))
      .rdd.map(_.getSeq[Double](0))
    val d = vecs.first().length
    val zero = (Array.fill(d)(Double.PositiveInfinity),
      Array.fill(d)(Double.NegativeInfinity))
    vecs.treeAggregate(zero)(
      seqOp = { case ((mn, mx), v) =>
        var i = 0
        while (i < d) {
          val x = v(i)
          if (x < mn(i)) mn(i) = x
          if (x > mx(i)) mx(i) = x
          i += 1
        }
        (mn, mx)
      },
      combOp = { case ((amn, amx), (bmn, bmx)) =>
        var i = 0
        while (i < d) {
          if (bmn(i) < amn(i)) amn(i) = bmn(i)
          if (bmx(i) > amx(i)) amx(i) = bmx(i)
          i += 1
        }
        (amn, amx)
      })
  }

  /** Int8 scalar quantization (the SQ8 storage tier of vector indexes —
    * 4× smaller than float32, cheap to decode): per-dimension affine
    * codes cᵢ = clamp(⌊(xᵢ − minᵢ)/scaleᵢ + 0.5⌋, 0, 255) with
    * scaleᵢ = (maxᵢ − minᵢ)/255, plus the per-vector reconstruction MSE
    * as the quality readout. Constant dimensions code to 0. The min/max
    * pass is one corpus scan (driver traffic O(d)); the coding pass is a
    * narrow broadcast map — no shuffle anywhere. */
  def scalarQuantize(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val (mins, maxs) = dimMinMax(df, vecCol)
    val scales = Array.tabulate(mins.length)(i => (maxs(i) - mins(i)) / 255.0)
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast((mins, scales))
    val codeUdf = udf((v: Seq[Double]) => {
      val (mn, sc) = bc.value
      Array.tabulate(math.min(v.length, mn.length)) { i =>
        if (sc(i) == 0.0) 0
        else {
          val q = math.floor((v(i) - mn(i)) / sc(i) + 0.5)
          math.min(255.0, math.max(0.0, q)).toInt
        }
      }
    })
    val mseUdf = udf((v: Seq[Double], codes: Seq[Int]) => {
      val (mn, sc) = bc.value
      var s = 0.0
      var i = 0
      val n = math.min(v.length, mn.length)
      while (i < n) {
        val r = v(i) - (mn(i) + codes(i) * sc(i))
        s += r * r
        i += 1
      }
      if (n == 0) 0.0 else s / n
    })
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("codes", codeUdf(col("__v")))
      .withColumn("mse", mseUdf(col("__v"), col("codes")))
      .drop("__v")
  }

  /** Product-quantization codebooks (Jégou, Douze & Schmid 2011, TPAMI
    * "Product Quantization for Nearest Neighbor Search"): the d dims
    * split into `m` subspaces of d/m, each k-means'd to `ksub` centroids
    * on a bounded driver sample (the ivfCentroids sampling discipline:
    * hash-ordered oversample → deterministic, unbiased). Returns
    * codebooks[s][j] = centroid j of subspace s. */
  def pqFit(df: DataFrame, m: Int = 8, ksub: Int = 16,
      sampleSize: Int = 1000, seed: Long = 42L, idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    val total = df.count()
    val frac = if (total == 0) 1.0 else math.min(1.0, 3.0 * sampleSize / total)
    val sample = df
      .select(col(idCol).as("__sid"), col(vecCol).cast("array<double>").as("__sv"))
      .sample(withReplacement = false, frac, seed)
      .orderBy(xxhash64(col("__sid").cast("string"), lit(seed)))
      .limit(sampleSize)
      .collect().map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "pqFit: empty sample")
    val d = sample(0).length
    require(d % m == 0, s"pqFit: dim $d not divisible by m=$m")
    val dsub = d / m
    Array.tabulate(m) { s =>
      val sub = sample.map(v => v.slice(s * dsub, (s + 1) * dsub))
      graft.kernels.Cluster.lloydCenters(sub, ksub, seed + s)
    }
  }

  /** Encode each vector as m sub-centroid ids (argmin squared distance
    * per subspace, first-index tie-break) — m bytes per vector at
    * ksub ≤ 256: the 64× compression that lets a 100 TB corpus's index
    * fit a fraction of the fleet's RAM. Narrow broadcast map. */
  def pqEncode(df: DataFrame, codebooks: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(codebooks)
    val enc = udf((v: Seq[Double]) => {
      val cb = bc.value
      val m = cb.length
      val dsub = cb(0)(0).length
      Array.tabulate(m) { s =>
        var best = 0; var bd = Double.MaxValue
        var j = 0
        while (j < cb(s).length) {
          var dd = 0.0; var t = 0
          val c = cb(s)(j)
          while (t < dsub) {
            val x = v(s * dsub + t) - c(t); dd += x * x; t += 1
          }
          if (dd < bd) { bd = dd; best = j }
          j += 1
        }
        best
      }
    })
    df.select(col(idCol), enc(col(vecCol).cast("array<double>")).as("codes"))
  }

  /** PQ top-k via asymmetric distance computation: the corpus scan reads
    * CODES, never vectors — per candidate the distance is m sub-lookups
    * of exact query-to-centroid squared distances (≡ the ADC lookup
    * table, evaluated inline). Queries broadcast, per-query top-k rank —
    * the bruteForceTopK shape over a 64×-smaller scan side. */
  def pqAdcTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      codebooks: Array[Array[Array[Double]]], idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(codebooks)
    val adc = udf((qv: Seq[Double], codes: Seq[Int]) => {
      val cb = bc.value
      val dsub = cb(0)(0).length
      var s = 0; var acc = 0.0
      while (s < cb.length) {
        val c = cb(s)(codes(s))
        var t = 0; var dd = 0.0
        while (t < dsub) {
          val x = qv(s * dsub + t) - c(t); dd += x * x; t += 1
        }
        acc += dd
        s += 1
      }
      acc
    })
    val codes = pqEncode(corpus, codebooks, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("codes"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    codes.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", adc(col("__qv"), col("codes")))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("adc"), col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc"), col("rank"))
  }

  /** Project each vector onto the model's components: columns pc1..pck.
    * pcⱼ = x·cⱼ − μ·cⱼ with the mean offset precomputed, so the executor
    * work is k dot products per row — and the oracle can replay the same
    * formula without re-centering. Narrow map; no shuffle. */
  def pcaProject(df: DataFrame, model: PcaModel, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    // the mean offset mu·c_j is constant per component — precomputed ONCE
    // here (same accumulation order, so bit-identical results) instead of
    // re-deriving it inside every row of a 100 TB narrow map, which
    // doubled the projection's multiply-adds
    val offsets = model.components.map { c =>
      var off = 0.0
      var i = 0
      val n = math.min(c.length, model.mean.length)
      while (i < n) { off += model.mean(i) * c(i); i += 1 }
      off
    }
    val bc = spark.sparkContext.broadcast((model, offsets))
    val proj = udf((v: Seq[Double]) => {
      val (m, offs) = bc.value
      m.components.zipWithIndex.map { case (c, j) =>
        var dot = 0.0
        var i = 0
        val n = math.min(c.length, v.length)
        while (i < n) { dot += v(i) * c(i); i += 1 }
        dot - offs(j)
      }
    })
    val k = model.components.length
    val withP = df.select(col(idCol), proj(col(vecCol).cast("array<double>")).as("__p"))
    withP.select(col(idCol) +:
      (0 until k).map(j => col("__p").getItem(j).as(s"pc${j + 1}")): _*)
  }
}
