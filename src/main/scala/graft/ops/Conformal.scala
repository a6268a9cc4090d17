package graft.ops

import graft.core.PanelCols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals (reference
  * polars_ts/probabilistic/conformal.py:21-187): the finite-sample
  * corrected quantile of calibration-set absolute residuals widens point
  * forecasts into `[y_hat_lower, y_hat_upper]`. Pure SQL: one aggregate
  * per series + a broadcastable join.
  */
object Conformal {

  /** Per-series conformal interval.
    * @param cal  calibration frame with actuals `yCol` and predictions `yhatCol`
    * @param pred prediction frame with `yhatCol`
    * @param alpha miscoverage (0.1 → 90% interval)
    * Corrected level = min(1, ceil((n+1)(1−α))/n), quantile with linear
    * interpolation (matches the oracle's quantile_cont).
    */
  def interval(cal: DataFrame, pred: DataFrame, yCol: String, yhatCol: String,
      alpha: Double = 0.1)(implicit pc: PanelCols): DataFrame = {
    val resid = abs(col(yCol) - col(yhatCol))
    val q = cal.groupBy(pc.idCol)
      .agg(count(lit(1)).as("__n"),
        sort_array(collect_list(resid)).as("__r"))
      .withColumn("__level",
        least(lit(1.0), ceil((col("__n") + 1) * lit(1.0 - alpha)) / col("__n")))
      // linear-interpolated quantile at __level over sorted residuals:
      // pos = (n-1)*level; lo = floor(pos); frac = pos - lo
      .withColumn("__pos", (col("__n") - 1) * col("__level"))
      .withColumn("__lo", floor(col("__pos")).cast("int"))
      .withColumn("__frac", col("__pos") - col("__lo"))
      .withColumn("qhat",
        element_at(col("__r"), col("__lo") + 1) * (lit(1.0) - col("__frac")) +
          element_at(col("__r"), least(col("__lo") + 2, size(col("__r")))) * col("__frac"))
      .select(pc.idCol, col("qhat"))
    pred.join(q, Seq(pc.id))
      .withColumn("y_hat_lower", col(yhatCol) - col("qhat"))
      .withColumn("y_hat_upper", col(yhatCol) + col("qhat"))
      .drop("qhat")
  }

  /** Cumulative Poisson(1) thresholds c_k = e⁻¹·Σ_{j≤k} 1/j!, built with
    * a fixed accumulation order so the oracle can inline the identical
    * doubles as literals. */
  private[graft] val poissonCdf: Array[Double] = {
    val out = new Array[Double](20)
    var term = math.exp(-1.0)
    var c = term
    out(0) = c
    var k = 1
    while (k < 20) { term /= k; c += term; out(k) = c; k += 1 }
    out
  }

  /** Deterministic Poisson(1) bootstrap multiplicity for (rowKey, b):
    * the distributed-bootstrap standard — each row's multiplicity in
    * resample b is Poisson(1), inverse-CDF sampled from a uniform derived
    * by FNV-hashing "rowKey:b". Engine-reproducible: the oracle replays
    * the same FNV fold and compares against the same inlined thresholds,
    * so membership is bit-identical across engines (the reason this is
    * not splitmix64+Knuth: 64-bit wrap-multiply is not expressible in
    * DuckDB 1.0 without 32-bit limb gymnastics). */
  private[ops] val poissonWeight = (rowKey: String, b: Int) => {
    // b leads the string: FNV-1a diffuses a byte only through LATER
    // multiplications, so a trailing ":b" would leave the high bits (the
    // uniform) almost unchanged across bootstraps
    val h = graft.ops.TextOps.fnv64(s"$b:$rowKey")
    val u = ((h >>> 11).toDouble / (1L << 53).toDouble)
    var k = 0
    while (k < poissonCdf.length && u >= poissonCdf(k)) k += 1
    k
  }

  /** Fitted EnbPI ensemble: B ridge coefficient vectors over lag features
    * + per-series out-of-bag residual pool (kept distributed). */
  case class EnbPIModel(coefs: Array[Array[Double]], lags: Int,
      coverage: Double, residuals: DataFrame)

  /** EnbPI fit (reference probabilistic/conformal.py:190-318): B bootstrap
    * ridge autoregressions on the pooled lag matrix + out-of-bag
    * residuals. Spark shape: the B bootstrap Gram matrices accumulate in
    * ONE pass over the feature frame (row multiplicities are deterministic
    * Poisson(1) weights, the distributed bootstrap standard — the
    * reference draws one exact multinomial per model instead); the B
    * small solves run on the driver; the OOB pass recomputes each row's
    * membership from its hash, so residuals never leave executors. */
  def enbpiFit(df: DataFrame, lags: Int = 3, b: Int = 25,
      coverage: Double = 0.9, l2: Double = 1e-3, seed: Long = 42L)(
      implicit pc: PanelCols): EnbPIModel = {
    require(coverage > 0 && coverage < 1, "coverage must be in (0, 1)")
    require(b >= 1, "n_bootstraps must be >= 1")
    val y = pc.targetCol.cast("double")
    val feats = (1 to lags).map(k => lag(y, k).over(pc.w)) :+ lit(1.0)
    val p = feats.length
    val withF = df.select((pc.idCol +: y.as("__y") +:
        concat_ws(":", pc.idCol.cast("string"),
          unix_micros(pc.timeCol.cast("timestamp")).cast("string"),
          lit(seed).cast("string")).as("__key") +:
        feats.zipWithIndex.map { case (c, i) => c.as(s"__x$i") }): _*)
      .na.drop().cache()
    try {
      val wUdf = udf(poissonWeight)
      // all B weighted Gram systems in one aggregate pass
      val prods = (0 until b).flatMap { bi =>
        val w = wUdf(col("__key"), lit(bi)).cast("double")
        (for (i <- 0 until p; j <- i until p)
          yield sum(w * col(s"__x$i") * col(s"__x$j")).as(s"__g_${bi}_${i}_$j")) ++
        (0 until p).map(i => sum(w * col(s"__x$i") * col("__y")).as(s"__b_${bi}_$i"))
      }
      val row = withF.agg(prods.head, prods.tail: _*).collect()(0)
      var idx = 0
      val coefs = Array.tabulate(b) { _ =>
        val g = Array.fill(p, p)(0.0)
        val rhs = new Array[Double](p)
        for (i <- 0 until p; j <- i until p) {
          g(i)(j) = row.getDouble(idx); g(j)(i) = g(i)(j); idx += 1
        }
        for (i <- 0 until p) { rhs(i) = row.getDouble(idx); idx += 1 }
        for (i <- 0 until p - 1) g(i)(i) += l2
        graft.kernels.ArimaLite.solve(g, rhs)
      }
      // OOB residuals: |y − mean over models where this row's weight is 0|
      val bcC = df.sparkSession.sparkContext.broadcast(coefs)
      val oobUdf = udf((key: String, xs: Seq[Double], yv: Double) => {
        val cs = bcC.value
        var s = 0.0; var n = 0
        var bi = 0
        while (bi < cs.length) {
          if (poissonWeight(key, bi) == 0) {
            var pred = 0.0
            var i = 0
            while (i < xs.length) { pred += xs(i) * cs(bi)(i); i += 1 }
            s += pred; n += 1
          }
          bi += 1
        }
        if (n == 0) null.asInstanceOf[java.lang.Double]
        else java.lang.Double.valueOf(math.abs(yv - s / n))
      })
      val residuals = withF.select(pc.idCol,
          oobUdf(col("__key"),
            array((0 until p).map(i => col(s"__x$i")): _*), col("__y")).as("__resid"))
        .filter(col("__resid").isNotNull)
        .select(pc.idCol, col("__resid").cast("double"))
      EnbPIModel(coefs, lags, coverage, residuals.cache())
    } finally withF.unpersist()
  }

  /** Per-series OOB conformal quantile `[id, qhat]` of a fitted model —
    * exposed for the ts_enbpi_oob gate query and for oracle pinning. */
  private[graft] def enbpiQuantiles(model: EnbPIModel)(
      implicit pc: PanelCols): DataFrame =
    quantileFromResiduals(model.residuals, model.coverage)

  private def quantileFromResiduals(residuals: DataFrame, coverage: Double)(
      implicit pc: PanelCols): DataFrame =
    residuals.groupBy(pc.idCol)
      .agg(count(lit(1)).as("__n"),
        sort_array(collect_list(col("__resid"))).as("__r"))
      .withColumn("__level",
        least(lit(1.0), ceil((col("__n") + 1) * lit(coverage)) / col("__n")))
      .withColumn("__pos", (col("__n") - 1) * col("__level"))
      .withColumn("__lo", floor(col("__pos")).cast("int"))
      .withColumn("__frac", col("__pos") - col("__lo"))
      .withColumn("qhat",
        element_at(col("__r"), col("__lo") + 1) * (lit(1.0) - col("__frac")) +
          element_at(col("__r"), least(col("__lo") + 2, size(col("__r")))) * col("__frac"))
      .select(pc.idCol, col("qhat"))

  /** EnbPI h-step intervals (conformal.py:320-387): recursive ensemble-
    * mean forecast per series (each step every model predicts from the
    * shared buffer), widened by the series' OOB conformal quantile.
    * Output: `[id, step, ds, y_hat, y_hat_lower, y_hat_upper]`. */
  def enbpiPredict(df: DataFrame, model: EnbPIModel, h: Int)(
      implicit pc: PanelCols): DataFrame = {
    val spark = df.sparkSession
    val bcC = spark.sparkContext.broadcast(model.coefs)
    val lags = model.lags
    val u = udf((tail: Seq[Double]) => {
      val cs = bcC.value
      require(tail.length >= lags,
        s"series too short to predict: ${tail.length} observations < lags=$lags")
      val buf = scala.collection.mutable.ArrayBuffer(tail: _*)
      (1 to h).map { _ =>
        val x = (1 to lags).map(k => buf(buf.length - k)).toArray :+ 1.0
        var s = 0.0
        var bi = 0
        while (bi < cs.length) {
          var pred = 0.0
          var i = 0
          while (i < x.length) { pred += x(i) * cs(bi)(i); i += 1 }
          s += pred
          bi += 1
        }
        val yhat = s / cs.length
        buf += yhat
        yhat
      }.toArray
    })
    val tails = df.groupBy(pc.idCol)
      .agg(slice(sort_array(collect_list(struct(
        pc.orderCols :+ pc.targetCol.cast("double").as("__v"): _*))),
        -lags, lags).as("__tail"))
      .select(pc.idCol, u(col("__tail.__v")).as("__fc"))
    val q = quantileFromResiduals(model.residuals, model.coverage)
    graft.core.Panel.futureDates(df, h).join(tails, Seq(pc.id))
      .join(q, Seq(pc.id), "left")
      .withColumn("y_hat", element_at(col("__fc"), col("step").cast("int")))
      .withColumn("qhat", coalesce(col("qhat"), lit(0.0)))
      .select(pc.idCol, col("step"), pc.timeCol, col("y_hat"),
        (col("y_hat") - col("qhat")).as("y_hat_lower"),
        (col("y_hat") + col("qhat")).as("y_hat_upper"))
  }

  /** Online update (conformal.py:389-416): append |y − y_hat| residuals
    * from newly observed rows — intervals adapt on the next predict. */
  def enbpiUpdate(model: EnbPIModel, newObs: DataFrame, yCol: String,
      yhatCol: String)(implicit pc: PanelCols): EnbPIModel = {
    val newResid = newObs.select(pc.idCol,
      abs(col(yCol) - col(yhatCol)).cast("double").as("__resid"))
    model.copy(residuals = model.residuals.unionByName(newResid))
  }
}
