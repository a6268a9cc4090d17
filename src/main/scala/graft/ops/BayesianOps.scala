package graft.ops

import graft.core.{Panel, PanelCols}
import graft.kernels.Bayesian
import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame operators over the Bayesian kernels (reference
  * polars_ts/bayesian/ + models/bayesian_ets + bayesian_var): every op is
  * grouped-panel → per-series kernel in an executor UDF → explode back.
  * One shuffle each; kernels never see more than one series. */
object BayesianOps {

  /** UKF-filtered local-level states `[id, ds, filtered, filtered_var]`
    * (ukf.py:58-188; identity transition/observation — the nonlinear hooks
    * are exposed on the kernel). */
  def ukf(df: DataFrame, q: Double = 1e-3, r: Double = 1.0)(
      implicit pc: PanelCols): DataFrame = {
    val u = udf((ys: Seq[Double]) => {
      val (m, v) = Bayesian.ukfFilter(ys.toArray,
        x => x, x => x(0),
        DenseMatrix((q)), r, DenseVector(ys.headOption.getOrElse(0.0)),
        DenseMatrix((1.0)))
      m.zip(v)
    })
    explodePerRow(df, u, Seq("filtered", "filtered_var"))
  }

  /** EnKF-filtered states `[id, ds, filtered, filtered_var]`
    * (enkf.py:21-153). */
  def enkf(df: DataFrame, q: Double = 1e-3, r: Double = 1.0,
      nEnsemble: Int = 50, seed: Long = 42L)(implicit pc: PanelCols): DataFrame = {
    // counter-based deterministic draws (DetRng) so the oracle replays
    // the filter bit-exactly; the general f/h enkfFilter stays the
    // library surface for non-local-level models
    val u = udf((ys: Seq[Double]) => {
      val (m, v) = Bayesian.enkfLocalLevelDet(ys.toArray, q, r, nEnsemble, seed)
      m.zip(v)
    })
    explodePerRow(df, u, Seq("filtered", "filtered_var"))
  }

  /** Particle-filtered local level `[id, ds, filtered, filtered_var, ess]`
    * (particle_filter.py:149-290). */
  def particleFilter(df: DataFrame, nParticles: Int = 500,
      sigmaLevel: Double = 1.0, sigmaObs: Double = 1.0, seed: Long = 42L)(
      implicit pc: PanelCols): DataFrame = {
    val u = udf((ys: Seq[Double]) => {
      val (m, v, ess) = Bayesian.particleFilterLocalLevelDet(ys.toArray, nParticles,
        sigmaLevel, sigmaObs, seed = seed)
      m.indices.map(i => (m(i), v(i), ess(i)))
    })
    Panel.grouped(df)
      .select(pc.idCol, col("ts").as("__ts"), u(col("ys")).as("__r"))
      .select(pc.idCol, posexplode(col("__r")).as(Seq("__i", "__s")), col("__ts"))
      .select(pc.idCol, expr("__ts[__i]").as(pc.time),
        col("__s._1").as("filtered"), col("__s._2").as("filtered_var"),
        col("__s._3").as("ess"))
  }

  /** BSTS decomposition per row `[id, ds, level, trend, seasonal]`
    * (bsts.py:106-219). */
  def bstsDecompose(df: DataFrame, trend: String = "local_linear",
      seasonal: Option[Int] = None)(implicit pc: PanelCols): DataFrame = {
    val u = udf((ys: Seq[Double]) => {
      val (level, tr, se, _, _) = Bayesian.bstsFitForecast(ys.toArray, 0, trend, seasonal)
      level.indices.map(i => (level(i),
        if (tr.nonEmpty) tr(i) else 0.0,
        if (se.nonEmpty) se(i) else 0.0))
    })
    Panel.grouped(df)
      .select(pc.idCol, col("ts").as("__ts"), u(col("ys")).as("__r"))
      .select(pc.idCol, posexplode(col("__r")).as(Seq("__i", "__s")), col("__ts"))
      .select(pc.idCol, expr("__ts[__i]").as(pc.time),
        col("__s._1").as("level"), col("__s._2").as("trend"),
        col("__s._3").as("seasonal"))
  }

  /** BSTS h-step forecast `[id, step, ds, y_hat, y_hat_var]`
    * (bsts.py:220-260). */
  def bstsForecast(df: DataFrame, h: Int, trend: String = "local_linear",
      seasonal: Option[Int] = None)(implicit pc: PanelCols): DataFrame = {
    val u = udf((ys: Seq[Double]) => {
      val (_, _, _, fc, fv) = Bayesian.bstsFitForecast(ys.toArray, h, trend, seasonal)
      fc.zip(fv)
    })
    futureJoin(df, h, u, Seq("y_hat", "y_hat_var"))
  }

  /** MCMC AR(p) forecast with credible intervals
    * `[id, step, ds, y_hat, y_hat_lower, y_hat_upper]` (mcmc.py:45-238). */
  def mcmcForecast(df: DataFrame, h: Int, p: Int = 2, nSamples: Int = 300,
      burnIn: Int = 150, coverage: Double = 0.9, seed: Long = 42L)(
      implicit pc: PanelCols): DataFrame = {
    val u = udf((ys: Seq[Double]) => {
      val arr = ys.toArray
      val n = arr.length
      val mean = arr.sum / n
      val sd = math.sqrt(arr.map(v => (v - mean) * (v - mean)).sum / n)
      val x0 = new Array[Double](2 + p)
      x0(0) = if (sd > 0) sd else 1.0
      x0(1) = mean
      // init AR coefficients at the OLS estimate: the MH proposal scale is
      // 2% of |θ|, so a zero init would freeze φ at 0 (the reference's
      // builtin sampler shares this trap; MAP-adjacent init is standard)
      try {
        val arc = graft.kernels.ArimaLite.arFit(arr, p)
        var j = 0
        while (j < p) { x0(2 + j) = arc(j); j += 1 }
      } catch { case _: Exception => }
      val samples = Bayesian.mhSampleDet(th => Bayesian.arLogpost(th, arr, p),
        x0, nSamples, burnIn, seed)
      val paths = Bayesian.arForecastPathsDet(arr, samples, h, p, seed + 1)
      val lo = (1 - coverage) / 2
      (0 until h).map { s =>
        val colV = paths.map(_(s)).sorted
        val m = colV.sum / colV.length
        (m, colV(math.max(0, (lo * (colV.length - 1)).round.toInt)),
          colV(math.min(colV.length - 1, ((1 - lo) * (colV.length - 1)).round.toInt)))
      }
    })
    futureJoin(df, h, u, Seq("y_hat", "y_hat_lower", "y_hat_upper"))
  }

  /** GP forecast `[id, step, ds, y_hat, y_hat_lower, y_hat_upper]`
    * (gp.py:342-539; kernel family per gp.py:52-226 — RBF default,
    * Matérn/periodic/spectral-mixture/sum/product via `kernel`;
    * marginal-likelihood optimized unless `optimize = false`). */
  def gpForecast(df: DataFrame, h: Int, optimize: Boolean = true,
      coverage: Double = 0.9, kernel: Option[Bayesian.GpKernel] = None)(
      implicit pc: PanelCols): DataFrame = {
    val z = math.sqrt(2.0) * Bayesian.inverseErf(coverage)
    val u = udf((ys: Seq[Double]) => {
      val (fc, fv) = Bayesian.gpForecast(ys.toArray, h, optimize, kernel = kernel)
      fc.indices.map { i =>
        val sd = math.sqrt(fv(i))
        (fc(i), fc(i) - z * sd, fc(i) + z * sd)
      }
    })
    futureJoin(df, h, u, Seq("y_hat", "y_hat_lower", "y_hat_upper"))
  }

  /** Online Bayesian anomaly p-values per row
    * `[id, ds, p_value, is_anomaly]` (anomaly.py:134-329). */
  def bayesianAnomaly(df: DataFrame, threshold: Double = 0.01, warmup: Int = 10)(
      implicit pc: PanelCols): DataFrame = {
    val u = udf((ys: Seq[Double]) =>
      Bayesian.nigPValues(ys.toArray, warmup = warmup).toSeq)
    Panel.grouped(df)
      .select(pc.idCol, col("ts").as("__ts"), u(col("ys")).as("__p"))
      .select(pc.idCol, posexplode(col("__p")).as(Seq("__i", "p_value")), col("__ts"))
      .select(pc.idCol, expr("__ts[__i]").as(pc.time), col("p_value"),
        (col("p_value") < threshold).as("is_anomaly"))
  }

  /** Bayesian ETS (MAP SES + MH posterior-predictive intervals)
    * `[id, step, ds, y_hat, y_hat_lower, y_hat_upper]`
    * (models/bayesian_ets). */
  def bayesianEts(df: DataFrame, h: Int, coverage: Double = 0.9,
      nSamples: Int = 200, seed: Long = 42L)(implicit pc: PanelCols): DataFrame = {
    val u = udf((ys: Seq[Double]) => {
      val (m, lo, hi) = Bayesian.bayesianEtsForecast(ys.toArray, h, coverage,
        nSamples, seed)
      m.indices.map(i => (m(i), lo(i), hi(i)))
    })
    futureJoin(df, h, u, Seq("y_hat", "y_hat_lower", "y_hat_upper"))
  }

  /** Analytical Bayesian VAR(p) forecast over wide columns
    * `[ds, step, variable, y_hat, y_hat_lower, y_hat_upper]`
    * (bayesian_var/, conjugate ridge-normal posterior). Driver-side matrix
    * work is (kp+1)² — the wide frame collect is bounded by the variable
    * count, same contract as VarModels.forecast. */
  def bvarForecast(wide: DataFrame, cols: Seq[String], p: Int, h: Int,
      lambda: Double = 0.1, coverage: Double = 0.9, prior: String = "ridge")(
      implicit pc: PanelCols): DataFrame = {
    val spark = wide.sparkSession
    import spark.implicits._
    val rows = wide.orderBy(pc.timeCol)
      .select(cols.map(c => col(c).cast("double")): _*).collect()
      .map(r => Array.tabulate(cols.length)(i => r.getDouble(i)))
    val (fc, lo, hi) = Bayesian.bvarForecast(rows, p, h, lambda, coverage, prior)
    val out = for {
      s <- 0 until h
      j <- cols.indices
    } yield (s + 1, cols(j), fc(s)(j), lo(s)(j), hi(s)(j))
    out.toDF("step", "variable", "y_hat", "y_hat_lower", "y_hat_upper")
  }

  // ── shared shapes ──────────────────────────────────────────────────────

  /** Grouped → per-row (value tuple) explode keyed by original timestamps. */
  private def explodePerRow(df: DataFrame,
      u: org.apache.spark.sql.expressions.UserDefinedFunction,
      names: Seq[String])(implicit pc: PanelCols): DataFrame = {
    val base = Panel.grouped(df)
      .select(pc.idCol, col("ts").as("__ts"), u(col("ys")).as("__r"))
      .select(pc.idCol, posexplode(col("__r")).as(Seq("__i", "__s")), col("__ts"))
    names.zipWithIndex.foldLeft(
      base.select(pc.idCol, expr("__ts[__i]").as(pc.time), col("__s")))(
      (d, ni) => d.withColumn(ni._1, col(s"__s._${ni._2 + 1}")))
      .drop("__s")
  }

  /** Grouped h-step kernel → future-date scaffold join. */
  private def futureJoin(df: DataFrame, h: Int,
      u: org.apache.spark.sql.expressions.UserDefinedFunction,
      names: Seq[String])(implicit pc: PanelCols): DataFrame = {
    val g = Panel.grouped(df).select(pc.idCol, u(col("ys")).as("__fc"))
    val base = Panel.futureDates(df, h).join(g, Seq(pc.id))
      .withColumn("__s", element_at(col("__fc"), col("step").cast("int")))
    names.zipWithIndex.foldLeft(base)(
      (d, ni) => d.withColumn(ni._1, col(s"__s._${ni._2 + 1}")))
      .select((pc.idCol +: col("step") +: pc.timeCol +: names.map(col)): _*)
  }
}
