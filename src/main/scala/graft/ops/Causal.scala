package graft.ops

import graft.core.{Panel, PanelCols}
import graft.kernels.Bayesian
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Causal inference operators (reference polars_ts/causal/):
  * CausalImpact (BSTS counterfactual) and SyntheticControl (simplex-
  * constrained donor weighting).
  *
  * CausalImpact is per-series: grouped panel → BSTS kernel on executors —
  * scales across series like every forecaster here. SyntheticControl is a
  * small-panel method by construction (a donor pool of units, each fully
  * observed): the donor matrix is collected to the driver, mirroring the
  * reference's dense solve; the panel-wide scan that builds it stays
  * distributed. */
object Causal {

  /** CausalImpact per series (reference causal/causal_impact.py:112-390,
    * covariate-free mode): BSTS fit on the pre-period, h=|post| forecast
    * as counterfactual, pointwise + cumulative effects with z·sd bands.
    * Output, one row per post-period observation:
    * `[id, ds, observed, counterfactual, cf_lower, cf_upper,
    *   point_effect, effect_lower, effect_upper, cum_effect,
    *   cum_lower, cum_upper]`. */
  def causalImpact(df: DataFrame, interventionTs: java.sql.Timestamp,
      trend: String = "local_linear", seasonal: Option[Int] = None,
      coverage: Double = 0.9, sigmaObs: Double = 1.0, sigmaLevel: Double = 0.1,
      sigmaTrend: Double = 0.01, sigmaSeasonal: Double = 0.01)(
      implicit pc: PanelCols): DataFrame = {
    val z = math.sqrt(2.0) * Bayesian.inverseErf(coverage)
    val interUs = interventionTs.getTime * 1000L
    val u = udf((ys: Seq[Double], tsUs: Seq[Long]) => {
      val pre = ys.indices.takeWhile(i => tsUs(i) < interUs)
      val nPre = pre.length
      val post = ys.drop(nPre).toArray
      if (nPre < 3 || post.isEmpty) Seq.empty[(Double, Double, Double, Double, Double, Double, Double, Double, Double, Double)]
      else {
        val preY = ys.take(nPre).toArray
        val (_, _, _, fc, fv) = Bayesian.bstsFitForecast(preY, post.length,
          trend, seasonal, sigmaObs, sigmaLevel, sigmaTrend, sigmaSeasonal)
        var cum = 0.0; var cumLo = 0.0; var cumHi = 0.0
        post.indices.map { i =>
          val sd = math.sqrt(math.max(fv(i), 0.0))
          val cfLo = fc(i) - z * sd
          val cfHi = fc(i) + z * sd
          val eff = post(i) - fc(i)
          val effLo = post(i) - cfHi
          val effHi = post(i) - cfLo
          cum += eff; cumLo += effLo; cumHi += effHi
          (post(i), fc(i), cfLo, cfHi, eff, effLo, effHi, cum, cumLo, cumHi)
        }
      }
    })
    Panel.grouped(df)
      .withColumn("__us", transform(col("ts"), t => unix_micros(t.cast("timestamp"))))
      .select(pc.idCol, col("ts").as("__ts"),
        size(col("ys")).as("__n"), u(col("ys"), col("__us")).as("__r"))
      .withColumn("__npre", col("__n") - size(col("__r")))
      .select(pc.idCol, posexplode(col("__r")).as(Seq("__i", "__s")),
        col("__ts"), col("__npre"))
      .select(pc.idCol, expr("__ts[__i + __npre]").as(pc.time),
        col("__s._1").as("observed"), col("__s._2").as("counterfactual"),
        col("__s._3").as("cf_lower"), col("__s._4").as("cf_upper"),
        col("__s._5").as("point_effect"), col("__s._6").as("effect_lower"),
        col("__s._7").as("effect_upper"), col("__s._8").as("cum_effect"),
        col("__s._9").as("cum_lower"), col("__s._10").as("cum_upper"))
  }

  /** Euclidean projection onto the probability simplex
    * (Duchi et al. 2008) — the constraint set of SC weights. */
  private def projectSimplex(v: Array[Double]): Array[Double] = {
    val n = v.length
    val sorted = v.sorted(Ordering[Double].reverse)
    var cum = 0.0
    var rho = -1
    var theta = 0.0
    for (i <- 0 until n) {
      cum += sorted(i)
      val t = (cum - 1.0) / (i + 1)
      if (sorted(i) - t > 0) { rho = i; theta = t }
    }
    v.map(x => math.max(x - theta, 0.0))
  }

  /** min ‖y − Dw‖² s.t. w ≥ 0, Σw = 1, via projected gradient descent
    * with a 1/L step (reference _solve_sc_weights uses SLSQP — same
    * optimum, deterministic here). */
  def solveScWeights(y: Array[Double], d: Array[Array[Double]],
      iters: Int = 1000): Array[Double] = {
    val t = d.length
    val k = d(0).length
    if (k == 1) return Array(1.0)
    var w = Array.fill(k)(1.0 / k)
    // Lipschitz constant ≈ 2·‖DᵀD‖_F upper bound
    var normSq = 0.0
    for (i <- 0 until t; j <- 0 until k) normSq += d(i)(j) * d(i)(j)
    val step = 1.0 / math.max(2.0 * normSq, 1e-12)
    var it = 0
    while (it < iters) {
      // grad = -2 Dᵀ(y - Dw)
      val r = new Array[Double](t)
      for (i <- 0 until t) {
        var s = 0.0
        for (j <- 0 until k) s += d(i)(j) * w(j)
        r(i) = y(i) - s
      }
      val g = new Array[Double](k)
      for (j <- 0 until k) {
        var s = 0.0
        for (i <- 0 until t) s += d(i)(j) * r(i)
        g(j) = -2.0 * s
      }
      w = projectSimplex(Array.tabulate(k)(j => w(j) - step * g(j)))
      it += 1
    }
    w
  }

  /** Synthetic control (reference causal/synthetic_control.py:100-447,
    * covariate-free mode): donor weights from pre-period simplex-
    * constrained least squares; counterfactual = weighted donors over the
    * full window. Donors whose time index differs from the treated unit
    * are skipped, as in the reference. Returns (perTimeFrame, weights):
    * frame `[ds, observed, counterfactual, effect, period]`, weights
    * `[donor id → weight]`. */
  def syntheticControl(df: DataFrame, treatedId: String,
      interventionTs: java.sql.Timestamp, donorIds: Seq[String] = Nil)(
      implicit pc: PanelCols): (DataFrame, Map[String, Double]) = {
    val spark = df.sparkSession
    import spark.implicits._
    // collect only the units in play: treated + donor pool (the whole
    // panel may be arbitrarily wider than the SC donor set)
    val scoped =
      if (donorIds.nonEmpty)
        df.filter(pc.idCol.cast("string").isin((donorIds :+ treatedId).distinct: _*))
      else df
    val g = Panel.grouped(scoped)
      .select(pc.idCol.cast("string").as("__id"), col("ys"),
        transform(col("ts"), t => unix_micros(t.cast("timestamp"))).as("__us"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toArray,
        r.getSeq[Long](2).toArray))
    val treated = g.find(_._1 == treatedId).getOrElse(
      throw new IllegalArgumentException(s"treated id '$treatedId' not found"))
    val times = treated._3
    val donorsAll = if (donorIds.nonEmpty) donorIds else g.map(_._1).filter(_ != treatedId).toSeq
    val donors = donorsAll.flatMap(id => g.find(x => x._1 == id &&
      java.util.Arrays.equals(x._3, times))).toArray
    require(donors.nonEmpty, "no donors with a matching time index")
    val interUs = interventionTs.getTime * 1000L
    val preIdx = times.indices.filter(i => times(i) < interUs).toArray
    require(preIdx.length >= 2, "need at least 2 pre-intervention observations")
    val y = treated._2
    val dPre = preIdx.map(i => donors.map(_._2(i)))
    val w = solveScWeights(preIdx.map(y), dPre)
    val weights = donors.map(_._1).zip(w).toMap
    val rows = times.indices.map { i =>
      var cf = 0.0
      for (j <- donors.indices) cf += w(j) * donors(j)._2(i)
      (times(i), y(i), cf, y(i) - cf,
        if (times(i) < interUs) "pre" else "post")
    }
    val frame = rows.toDF("__us", "observed", "counterfactual", "effect", "period")
      .withColumn(pc.time, timestamp_micros(col("__us")).cast("timestamp_ntz"))
      .select(pc.timeCol, col("observed"), col("counterfactual"),
        col("effect"), col("period"))
    (frame, weights)
  }

  /** Placebo test (synthetic_control.py:380-447): rerun SC treating each
    * donor as if it were treated; the actual effect should be extreme
    * relative to the placebo distribution. Returns
    * `[placebo_id, post_pre_rmse_ratio]` (the standard SC test statistic). */
  def placeboTest(df: DataFrame, treatedId: String,
      interventionTs: java.sql.Timestamp)(implicit pc: PanelCols): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ids = df.select(pc.idCol.cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    val stats = ids.map { id =>
      val (frame, _) = syntheticControl(df, id, interventionTs)
      val eff = frame.select(col("effect"), col("period")).collect()
      val pre = eff.filter(_.getString(1) == "pre").map(_.getDouble(0))
      val post = eff.filter(_.getString(1) == "post").map(_.getDouble(0))
      val preRmse = math.sqrt(pre.map(e => e * e).sum / math.max(pre.length, 1))
      val postRmse = math.sqrt(post.map(e => e * e).sum / math.max(post.length, 1))
      (id, if (preRmse > 1e-12) postRmse / preRmse else 0.0)
    }
    stats.toSeq.toDF("placebo_id", "post_pre_rmse_ratio")
  }
}
