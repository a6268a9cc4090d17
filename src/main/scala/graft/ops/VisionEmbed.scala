package graft.ops

import graft.core.{Panel, PanelCols}
import graft.kernels.{Cluster, DetRng}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vision embeddings for time-series images (reference
  * `polars_ts/imaging/embeddings.py:172-230`), previously a documented
  * descope: the reference forwards recurrence/GAF images through
  * pretrained torchvision/CLIP weights, which cannot be shipped into a
  * zero-egress JVM. The honest equivalent here is a DETERMINISTIC
  * random-weight convolutional feature map (the random-features /
  * ROCKET line of work: untrained convolutions are strong generic
  * feature extractors): a counter-seeded 3×3 conv bank over the
  * recurrence plot, ReLU, quadrant average pooling, and a random linear
  * projection. Same API shape as the reference (id → emb_0..emb_{d−1});
  * weights are pure functions of the seed, so the DuckDB oracle replays
  * the ENTIRE image → conv → pool → projection pipeline bit-exactly.
  *
  * The recurrence-plot input (|z_i − z_j| ≤ ε, comparisons only) is
  * chosen over GASF/GADF deliberately: no transcendentals, so JVM and
  * DuckDB produce identical doubles end to end.
  *
  * Scale: pure narrow map after the one grouped-panel shuffle — per
  * series O(L²·9·F) arithmetic, no driver state, no fit. */
object VisionEmbed {

  final val DefaultFilters = 4
  final val DefaultEmbDim = 8
  final val DefaultEps = 0.2

  /** (conv w(f)(dr)(dc) scaled 1/3, projection w(j)(i) scaled 1/4) —
    * shared verbatim by the executor UDF and the oracle SQL generator. */
  def weights(nFilters: Int, embDim: Int, seed: Long)
      : (Array[Array[Array[Double]]], Array[Array[Double]]) = {
    val seedC = DetRng.seedConst(seed)
    val conv = Array.tabulate(nFilters, 3, 3)((f, dr, dc) =>
      DetRng.gauss(seedC, DetRng.ctr(50, f.toLong, dr * 3 + dc)) / 3.0)
    val lin = Array.tabulate(embDim, nFilters * 4)((j, i) =>
      DetRng.gauss(seedC, DetRng.ctr(51, j.toLong, i)) / 4.0)
    (conv, lin)
  }

  /** Forward pass for one series. ACCUMULATION-ORDER CONTRACT with
    * `NeuralOracle.visionEmbedSql`: conv taps in (dr, dc) order with
    * out-of-bounds terms contributing exact zero; quadrant sums scan the
    * flat image index ascending; projection sums features ascending. */
  def forward(ys: Array[Double], conv: Array[Array[Array[Double]]],
      lin: Array[Array[Double]], eps: Double): Array[Double] = {
    val z = Cluster.zNorm(ys)
    val l = z.length
    val img = new Array[Double](l * l)
    var i = 0
    while (i < l * l) {
      img(i) = if (math.abs(z(i / l) - z(i % l)) <= eps) 1.0 else 0.0
      i += 1
    }
    val f = conv.length
    val maps = Array.ofDim[Double](f, l * l)
    var fi = 0
    while (fi < f) {
      i = 0
      while (i < l * l) {
        val r = i / l; val c = i % l
        var acc = 0.0
        var dr = 0
        while (dr < 3) {
          var dc = 0
          while (dc < 3) {
            val rr = r + dr - 1; val cc = c + dc - 1
            if (rr >= 0 && rr < l && cc >= 0 && cc < l)
              acc += conv(fi)(dr)(dc) * img(rr * l + cc)
            dc += 1
          }
          dr += 1
        }
        maps(fi)(i) = if (acc > 0.0) acc else 0.0
        i += 1
      }
      fi += 1
    }
    // quadrant means: q0 TL, q1 TR, q2 BL, q3 BR; split row/col at L/2
    val h = l / 2
    val feat = new Array[Double](f * 4)
    fi = 0
    while (fi < f) {
      var q = 0
      while (q < 4) {
        val (r0, r1) = if (q < 2) (0, h) else (h, l)
        val (c0, c1) = if (q % 2 == 0) (0, h) else (h, l)
        var acc = 0.0
        i = 0
        while (i < l * l) {
          val r = i / l; val c = i % l
          if (r >= r0 && r < r1 && c >= c0 && c < c1) acc += maps(fi)(i)
          i += 1
        }
        val cnt = (r1 - r0) * (c1 - c0)
        feat(fi * 4 + q) = if (cnt > 0) acc / cnt else 0.0
        q += 1
      }
      fi += 1
    }
    Array.tabulate(lin.length) { j =>
      var s = 0.0
      i = 0
      while (i < feat.length) { s += lin(j)(i) * feat(i); i += 1 }
      s
    }
  }

  /** Loads conv + lin weights from a LOCAL plain-parquet tensor store
    * (the same no-egress hook as `Foundation.loadTensorTable`): rows
    * `(name: string, row: long, vec: array<double>)` with
    * `name="conv"`: row = filter index f, vec = 9 doubles in
    * (dr·3 + dc) order; `name="lin"`: row = output j, vec =
    * nFilters·4 doubles. A user with real published CNN weights exports
    * them to this layout once and gets real embeddings; missing rows or
    * wrong widths fail loudly. */
  def loadWeights(spark: org.apache.spark.sql.SparkSession, path: String,
      nFilters: Int = DefaultFilters, embDim: Int = DefaultEmbDim)
      : (Array[Array[Array[Double]]], Array[Array[Double]]) = {
    val t = spark.read.parquet(path)
    def tensor(name: String, rows: Int, width: Int): Array[Array[Double]] = {
      val m = t.filter(col("name") === name)
        .select(col("row").cast("long"), col("vec").cast("array<double>"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      Array.tabulate(rows) { r =>
        val v = m.getOrElse(r.toLong, throw new IllegalArgumentException(
          s"loadWeights: tensor '$name' missing row $r (expected $rows rows)"))
        require(v.length == width,
          s"loadWeights: tensor '$name' row $r has ${v.length} values, expected $width")
        v
      }
    }
    val convFlat = tensor("conv", nFilters, 9)
    val conv = Array.tabulate(nFilters, 3, 3)((f, dr, dc) =>
      convFlat(f)(dr * 3 + dc))
    (conv, tensor("lin", embDim, nFilters * 4))
  }

  /** id → emb_0..emb_{d−1} over the panel (rounded with the repo's
    * 6-decimal + 1e-9-nudge discipline on both engines).
    * `weightsOverride` (e.g. from [[loadWeights]]) swaps the DetRng
    * surrogate CNN for real loaded weights — plan shape unchanged. */
  def visionEmbeddings(df: DataFrame, nFilters: Int = DefaultFilters,
      embDim: Int = DefaultEmbDim, eps: Double = DefaultEps,
      seed: Long = 42L,
      weightsOverride: Option[(Array[Array[Array[Double]]], Array[Array[Double]])] = None)
      (implicit pc: PanelCols): DataFrame = {
    val (conv, lin) = weightsOverride.getOrElse(weights(nFilters, embDim, seed))
    require(conv.length == nFilters && conv.forall(f =>
        f.length == 3 && f.forall(_.length == 3)),
      s"visionEmbeddings: conv weights must be $nFilters x 3 x 3")
    require(lin.length == embDim && lin.forall(_.length == nFilters * 4),
      s"visionEmbeddings: lin weights must be $embDim x ${nFilters * 4}")
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast((conv, lin))
    val embUdf = udf((ys: Seq[Double]) =>
      forward(ys.toArray, bc.value._1, bc.value._2, eps).toSeq)
    val base = Panel.grouped(df).select(pc.idCol.as(pc.id), col("ys"))
      .select(col(pc.id), embUdf(col("ys")).as("__e"))
    base.select(col(pc.id) +:
      (0 until embDim).map(j =>
        round(element_at(col("__e"), j + 1) + lit(1e-9), 6).as(s"emb_$j")): _*)
  }
}
