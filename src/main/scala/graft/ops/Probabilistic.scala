package graft.ops

import graft.core.{Panel, PanelCols}
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Quantile-regression forecasting and stacking ensembles (reference
  * polars_ts/probabilistic/quantile_regression.py:19-210,
  * ensemble/stacking.py:16-170).
  *
  * Scale shape: every fit is a handful of distributed Gram aggregations —
  * the panel reduces to (p+1)² sums per pass; only coefficient vectors
  * ever live on the driver. The reference loops scikit-learn estimators
  * over a pooled numpy matrix instead.
  */
case class QuantileModel(quantiles: Seq[Double], coef: Map[Double, Array[Double]],
    lags: Int)

object Probabilistic {

  /** Pinball-loss linear quantile regression per level on pooled lag
    * features, fit by IRLS: each iteration is ONE weighted Gram
    * aggregation over the cached feature frame + a (lags+1)² driver
    * solve. Initialized at the OLS solution (iteration 0 with unit
    * weights). */
  def fitQuantileRidge(df: DataFrame, lags: Int, quantiles: Seq[Double],
      iters: Int = 8, l2: Double = 1e-3, delta: Double = 1e-6)(
      implicit pc: PanelCols): QuantileModel = {
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q < 1),
      "quantile levels must be in (0, 1)")
    val y = pc.targetCol.cast("double")
    val feats = (1 to lags).map(k => lag(y, k).over(pc.w)) :+ lit(1.0)
    val p = feats.length
    val withF = df.select((y.as("__y") +: feats.zipWithIndex.map {
      case (c, i) => c.as(s"__x$i")
    }): _*).na.drop().cache()
    try {
      def wlsSolve(weight: org.apache.spark.sql.Column): Array[Double] = {
        val prods =
          (for (i <- 0 until p; j <- i until p)
            yield sum(weight * col(s"__x$i") * col(s"__x$j")).as(s"__g_${i}_$j")) ++
          (0 until p).map(i => sum(weight * col(s"__x$i") * col("__y")).as(s"__b_$i"))
        val row = withF.agg(prods.head, prods.tail: _*).collect()(0)
        val g = Array.fill(p, p)(0.0)
        val b = new Array[Double](p)
        var idx = 0
        for (i <- 0 until p; j <- i until p) {
          g(i)(j) = row.getDouble(idx); g(j)(i) = g(i)(j); idx += 1
        }
        for (i <- 0 until p) { b(i) = row.getDouble(idx); idx += 1 }
        for (i <- 0 until p - 1) g(i)(i) += l2
        graft.kernels.ArimaLite.solve(g, b)
      }
      val ols = wlsSolve(lit(1.0))
      val coefs = quantiles.map { q =>
        var beta = ols
        for (_ <- 1 to iters) {
          val pred = (0 until p).map(i => col(s"__x$i") * lit(beta(i))).reduce(_ + _)
          val r = col("__y") - pred
          // IRLS weight for pinball loss: |q − 1{r<0}| / max(|r|, δ)
          val w = when(r >= 0, lit(q)).otherwise(lit(1.0 - q)) /
            greatest(abs(r), lit(delta))
          beta = wlsSolve(w)
        }
        q -> beta
      }.toMap
      QuantileModel(quantiles.sorted, coefs, lags)
    } finally withF.unpersist()
  }

  /** Recursive h-step quantile forecast: the median (or closest-to-median
    * fitted level) drives the recursion, every level predicts from the
    * same recursive lag path (reference quantile_regression.py:150-210).
    * Output: `[id, step, ds, q_{level}...]`. */
  def quantileForecast(df: DataFrame, model: QuantileModel, h: Int)(
      implicit pc: PanelCols): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val u = udf((tail: Seq[Double]) => {
      val m = bc.value
      require(tail.length >= m.lags,
        s"series too short to predict: ${tail.length} observations < lags=${m.lags}")
      val medianQ = m.quantiles.minBy(q => math.abs(q - 0.5))
      val med = m.coef(medianQ)
      val buf = scala.collection.mutable.ArrayBuffer(tail: _*)
      val out = Array.ofDim[Double](h, m.quantiles.length)
      var s = 0
      while (s < h) {
        val x = (1 to m.lags).map(k => buf(buf.length - k)).toArray :+ 1.0
        var qi = 0
        while (qi < m.quantiles.length) {
          val cf = m.coef(m.quantiles(qi))
          var pred = 0.0
          var i = 0
          while (i < x.length) { pred += x(i) * cf(i); i += 1 }
          out(s)(qi) = pred
          qi += 1
        }
        var medPred = 0.0
        var i = 0
        while (i < x.length) { medPred += x(i) * med(i); i += 1 }
        buf += medPred
        s += 1
      }
      out.map(_.toSeq)
    })
    val tails = df.groupBy(pc.idCol)
      .agg(slice(sort_array(collect_list(struct(
        pc.orderCols :+ pc.targetCol.cast("double").as("__v"): _*))),
        -model.lags, model.lags).as("__tail"))
      .select(pc.idCol, u(col("__tail.__v")).as("__fc"))
    val base = Panel.futureDates(df, h).join(tails, Seq(pc.id))
      .withColumn("__row", element_at(col("__fc"), col("step").cast("int")))
    // `q_0_1`-style names ("." would read as a struct path in col())
    def qName(q: Double): String = s"q_$q".replace(".", "_")
    model.quantiles.zipWithIndex.foldLeft(base) { case (d, (q, i)) =>
      d.withColumn(qName(q), element_at(col("__row"), i + 1))
    }.select((pc.idCol +: col("step") +: pc.timeCol +:
      model.quantiles.map(q => col(qName(q)))): _*)
  }

  /** Stacking meta-learner (reference ensemble/stacking.py:16-170): ridge
    * fit of the target on base-model out-of-fold predictions joined by
    * (id, time). Returns meta coefficients [w_1..w_m, intercept]. */
  def stackingFit(oofPredictions: Seq[DataFrame], actuals: DataFrame,
      l2: Double = 1e-3)(implicit pc: PanelCols): Array[Double] = {
    require(oofPredictions.size >= 2, "need at least 2 base models for stacking")
    val m = oofPredictions.size
    val joined = oofPredictions.zipWithIndex.map { case (d, i) =>
      d.select(pc.idCol, pc.timeCol, col("y_hat").as(s"__m$i"))
    }.reduce(_.join(_, Seq(pc.id, pc.time)))
      .join(actuals.select(pc.idCol, pc.timeCol, pc.targetCol.cast("double").as("__y")),
        Seq(pc.id, pc.time))
    val p = m + 1
    val xCols = (0 until m).map(i => col(s"__m$i")) :+ lit(1.0)
    val prods =
      (for (i <- 0 until p; j <- i until p)
        yield sum(xCols(i) * xCols(j)).as(s"__g_${i}_$j")) ++
      (0 until p).map(i => sum(xCols(i) * col("__y")).as(s"__b_$i"))
    val row = joined.agg(prods.head, prods.tail: _*).collect()(0)
    val g = Array.fill(p, p)(0.0)
    val b = new Array[Double](p)
    var idx = 0
    for (i <- 0 until p; j <- i until p) {
      g(i)(j) = row.getDouble(idx); g(j)(i) = g(i)(j); idx += 1
    }
    for (i <- 0 until p) { b(i) = row.getDouble(idx); idx += 1 }
    for (i <- 0 until p - 1) g(i)(i) += l2
    graft.kernels.ArimaLite.solve(g, b)
  }

  /** Combine base forecasts through fitted meta coefficients:
    * `[id, ds (+step if present), y_hat]`. */
  def stackingCombine(forecasts: Seq[DataFrame], coef: Array[Double])(
      implicit pc: PanelCols): DataFrame = {
    require(forecasts.size + 1 == coef.length, "coef must be [w_1..w_m, intercept]")
    val keyCols = Seq(pc.id, pc.time) ++
      (if (forecasts.head.columns.contains("step")) Seq("step") else Nil)
    val joined = forecasts.zipWithIndex.map { case (d, i) =>
      d.select((keyCols.map(col) :+ col("y_hat").as(s"__m$i")): _*)
    }.reduce(_.join(_, keyCols))
    val combo = forecasts.indices.map(i => col(s"__m$i") * lit(coef(i)))
      .reduce(_ + _) + lit(coef.last)
    joined.withColumn("y_hat", combo)
      .select((keyCols.map(col) :+ col("y_hat")): _*)
  }
}
