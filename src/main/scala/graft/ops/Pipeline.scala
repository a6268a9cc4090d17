package graft.ops

import breeze.linalg.{inv, DenseMatrix, DenseVector}
import graft.core.{Panel, PanelCols}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Global recursive forecasting pipeline (reference
  * polars_ts/pipeline.py:209-462 + global_model.py:25-382), re-architected
  * for scale:
  *
  *  - FIT is one distributed pass: lag features are window expressions and
  *    the ridge normal equations (XᵀX, Xᵀy) are a sum aggregation over
  *    (i,j) index pairs — the full 100 TB panel reduces to a (p+1)²
  *    Gram matrix. The reference materializes a numpy matrix instead.
  *  - PREDICT is the reference's per-series h-step recursion, but executed
  *    on executors: the coefficient vector is broadcast and each series
  *    recurses locally inside a UDF over its tail window.
  */
case class RidgeModel(coef: Array[Double], lags: Int)

object Pipeline {

  /** Fit a pooled ("global") ridge autoregression y_t ~ [y_{t-1..t-p}, 1]
    * across all series. l2 is the ridge penalty (intercept unpenalized). */
  def fitGlobalRidge(df: DataFrame, lags: Int, l2: Double = 1e-3)(
      implicit pc: PanelCols): RidgeModel = {
    val y = pc.targetCol.cast("double")
    val feats = (1 to lags).map(k => lag(y, k).over(pc.w)) :+ lit(1.0)
    val p = feats.length
    val withF = df.select((y.as("__y") +: feats.zipWithIndex.map {
      case (c, i) => c.as(s"__x$i")
    }): _*).na.drop()
    // Gram accumulation: one aggregate row with all products
    val prods =
      (for (i <- 0 until p; j <- i until p)
        yield sum(col(s"__x$i") * col(s"__x$j")).as(s"__g_${i}_$j")) ++
      (0 until p).map(i => sum(col(s"__x$i") * col("__y")).as(s"__b_$i"))
    val row = withF.agg(prods.head, prods.tail: _*).collect()(0)
    val g = DenseMatrix.zeros[Double](p, p)
    val b = DenseVector.zeros[Double](p)
    var idx = 0
    for (i <- 0 until p; j <- i until p) {
      g(i, j) = row.getDouble(idx); g(j, i) = g(i, j); idx += 1
    }
    for (i <- 0 until p) { b(i) = row.getDouble(idx); idx += 1 }
    for (i <- 0 until p - 1) g(i, i) += l2 // don't penalize intercept
    val coef = inv(g) * b
    RidgeModel(coef.toArray, lags)
  }

  /** h-step recursive forecast from a fitted model:
    * `[id, step, ds, y_hat]`. Each series recurses locally over its
    * broadcast-model tail; timestamps extrapolate at inferred frequency. */
  def recursiveForecast(df: DataFrame, model: RidgeModel, h: Int)(
      implicit pc: PanelCols): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val u = udf((tail: Seq[Double]) => {
      val m = bc.value
      val buf = scala.collection.mutable.ArrayBuffer(tail: _*)
      (1 to h).map { _ =>
        val x = (1 to m.lags).map(k => buf(buf.length - k)) :+ 1.0
        val pred = x.zip(m.coef).map { case (a, w) => a * w }.sum
        buf += pred
        pred
      }.toArray
    })
    val tails = df.groupBy(pc.idCol)
      .agg(slice(sort_array(collect_list(struct(
        pc.orderCols :+ pc.targetCol.cast("double").as("__v"): _*))),
        -model.lags, model.lags).as("__tail"))
      .select(pc.idCol, u(col("__tail.__v")).as("__fc"))
    Panel.futureDates(df, h).join(tails, Seq(pc.id))
      .withColumn("y_hat", element_at(col("__fc"), col("step").cast("int")))
      .select(pc.idCol, col("step"), pc.timeCol, col("y_hat"))
  }

  /** Direct multi-step forecasting (reference models/multistep.py:255-450):
    * one ridge per horizon step s, each fit on y_{t+s-1} ~ lags at t — no
    * recursion, h independent distributed fits. */
  def fitDirectRidge(df: DataFrame, lags: Int, h: Int, l2: Double = 1e-3)(
      implicit pc: PanelCols): Seq[RidgeModel] =
    (1 to h).map { s =>
      val shifted = df.withColumn(pc.target,
        lead(pc.targetCol, s - 1).over(pc.w))
      fitGlobalRidge(shifted, lags, l2)
    }

  /** `[id, step, ds, y_hat]` from per-step direct models: every step
    * predicts straight from the last observed lag vector. */
  def directForecast(df: DataFrame, models: Seq[RidgeModel], h: Int)(
      implicit pc: PanelCols): DataFrame = {
    require(models.size == h)
    val lags = models.head.lags
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(models.map(_.coef).toArray)
    val u = udf((tail: Seq[Double]) => {
      val cs = bc.value
      (0 until h).map { s =>
        val x = (1 to lags).map(k => tail(tail.length - k)) :+ 1.0
        x.zip(cs(s)).map { case (a, w) => a * w }.sum
      }.toArray
    })
    val tails = df.groupBy(pc.idCol)
      .agg(slice(sort_array(collect_list(struct(
        pc.orderCols :+ pc.targetCol.cast("double").as("__v"): _*))),
        -lags, lags).as("__tail"))
      .select(pc.idCol, u(col("__tail.__v")).as("__fc"))
    graft.core.Panel.futureDates(df, h).join(tails, Seq(pc.id))
      .withColumn("y_hat", element_at(col("__fc"), col("step").cast("int")))
      .select(pc.idCol, col("step"), pc.timeCol, col("y_hat"))
  }

  /** Backtest several named forecasters and rank by mean MAE (reference
    * backtesting/backtest.py:301-387). */
  def compareModels(df: DataFrame,
      models: Seq[(String, (DataFrame, Int) => DataFrame)],
      folds: Int, horizon: Int)(implicit pc: PanelCols): DataFrame = {
    val results = models.map { case (name, fn) =>
      backtest(df, fn, folds, horizon)
        .agg(avg(col("mae")).as("mae"), avg(col("rmse")).as("rmse"))
        .withColumn("model", lit(name))
    }
    val all = results.reduce(_ unionByName _)
    all.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("mae"))))
      .select(col("rank"), col("model"), col("mae"), col("rmse"))
  }

  /** Out-of-fold forecasts of one model across expanding-window CV folds:
    * `[id, ds, y_hat]` over every fold's test rows — the stacking
    * meta-learner's training input (reference ensemble/stacking.py fit
    * contract; fold test windows are disjoint by construction). */
  def oofForecast(df: DataFrame, forecaster: (DataFrame, Int) => DataFrame,
      folds: Int, horizon: Int)(implicit pc: PanelCols): DataFrame = {
    val marked = Validation.expandingWindowCv(df, folds, horizon).cache()
    val parts = (0 until folds).map { f =>
      val train = marked.filter(col("fold") === f && col("split") === "train")
        .drop("fold", "split")
      val test = marked.filter(col("fold") === f && col("split") === "test")
        .drop("fold", "split")
      val fc = forecaster(train, horizon)
      test.withColumn("step", row_number().over(pc.w).cast("long"))
        .join(fc.select(pc.idCol, col("step"), col("y_hat")), Seq(pc.id, "step"))
        .select(pc.idCol, pc.timeCol, col("y_hat"))
    }
    parts.reduce(_ unionByName _)
  }

  /** Backtest a forecasting function over expanding-window CV folds:
    * per-fold MAE/RMSE + overall mean (reference
    * backtesting/backtest.py:126-300). The fold loop is a driver loop over
    * Spark jobs — each fold's fit/predict/score is fully distributed. */
  def backtest(df: DataFrame,
      forecaster: (DataFrame, Int) => DataFrame,
      folds: Int, horizon: Int)(implicit pc: PanelCols): DataFrame = {
    val marked = Validation.expandingWindowCv(df, folds, horizon).cache()
    val results = (0 until folds).map { f =>
      val train = marked.filter(col("fold") === f && col("split") === "train")
        .drop("fold", "split")
      val test = marked.filter(col("fold") === f && col("split") === "test")
        .drop("fold", "split")
      val fc = forecaster(train, horizon)
      // horizon step = rank of the test row within its series (reference
      // backtest.py:103-105) — robust to irregular event timestamps where
      // extrapolated future ds won't equal observed ds exactly.
      val stepped = test.withColumn("step",
        row_number().over(pc.w).cast("long"))
      val joined = stepped.join(
        fc.select(pc.idCol, col("step"), col("y_hat")), Seq(pc.id, "step"))
      joined.agg(
        lit(f).as("fold"),
        avg(abs(pc.targetCol - col("y_hat"))).as("mae"),
        sqrt(avg(pow(pc.targetCol - col("y_hat"), 2))).as("rmse"),
        count(lit(1)).as("n"))
    }
    results.reduce(_ unionByName _)
  }
}
