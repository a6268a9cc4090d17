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
      require(tail.length >= m.lags,
        s"series too short to predict: ${tail.length} observations < lags=${m.lags}")
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
      require(tail.length >= lags,
        s"series too short to predict: ${tail.length} observations < lags=$lags")
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

  /** Full feature-pipeline model (reference pipeline.py:209-462 +
    * global_model.py:25-382): lag + rolling-mean + calendar + Fourier
    * features and a per-series mean-encoding of the id, over an optionally
    * transformed target. */
  case class PipelineModel(coef: Array[Double], lags: Seq[Int],
      rollingWindows: Seq[Int], calendar: Seq[String],
      fourier: Seq[(Double, Int)], targetTransform: Option[String],
      lam: Double, encodeId: Boolean,
      pastCovariates: Seq[String] = Nil, covLags: Seq[Int] = Nil,
      futureCovariates: Seq[String] = Nil, staticFeatures: Seq[String] = Nil)

  private def calendarFeature(name: String, us: Long): Double = {
    val dt = java.time.LocalDateTime.ofEpochSecond(us / 1000000L,
      ((us % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    name match {
      case "day_of_week" => dt.getDayOfWeek.getValue.toDouble // Monday-first 1..7
      case "day_of_month" => dt.getDayOfMonth.toDouble
      case "month" => dt.getMonthValue.toDouble
      case "hour" => dt.getHour.toDouble
      case other => throw new IllegalArgumentException(s"Unknown calendar feature '$other'")
    }
  }

  /** Fit the pipeline: transform target → engineer features (everything a
    * window expression; the id encoding is a broadcast-joined per-series
    * mean) → ONE distributed Gram aggregation → driver ridge solve. The
    * design matrix never materializes on the driver. */
  def fitPipeline(df: DataFrame, lags: Seq[Int] = Seq(1, 2, 3),
      rollingWindows: Seq[Int] = Nil, calendar: Seq[String] = Nil,
      fourier: Seq[(Double, Int)] = Nil, targetTransform: Option[String] = None,
      lam: Double = 0.5, encodeId: Boolean = false, l2: Double = 1e-3,
      pastCovariates: Seq[String] = Nil, pastCovariateLags: Seq[Int] = Nil,
      futureCovariates: Seq[String] = Nil, staticFeatures: Seq[String] = Nil)(
      implicit pc: PanelCols): PipelineModel = {
    require(lags.nonEmpty, "pipeline needs at least lag features")
    val covLags = if (pastCovariateLags.nonEmpty) pastCovariateLags else lags
    val transformed = applyTransform(df, targetTransform, lam)
    val y = pc.targetCol.cast("double")
    val t = (row_number().over(pc.w) - 1).cast("double")
    val calUdf = udf((name: String, us: Long) => calendarFeature(name, us))
    val feats: Seq[(String, org.apache.spark.sql.Column)] =
      lags.map(k => s"lag_$k" -> lag(y, k).over(pc.w)) ++
      rollingWindows.map(w => s"rollmean_$w" ->
        avg(y).over(pc.w.rowsBetween(-w, -1))) ++
      calendar.map(c => s"cal_$c" ->
        calUdf(lit(c), unix_micros(pc.timeCol.cast("timestamp")))) ++
      fourier.flatMap { case (period, k) => (1 to k).flatMap { kk =>
        val ang = lit(2.0 * math.Pi * kk) / lit(period)
        Seq(s"fsin_${period}_$kk" -> sin(ang * t),
          s"fcos_${period}_$kk" -> cos(ang * t))
      }} ++
      pastCovariates.flatMap(c =>
        covLags.map(k => s"pcov_${c}_lag_$k" ->
          lag(col(c).cast("double"), k).over(pc.w))) ++
      futureCovariates.map(c => s"fcov_$c" -> col(c).cast("double")) ++
      // static per-series exogenous features (global_model.py
      // static_features): constant per series, max() picks it deterministically
      staticFeatures.map(c => s"static_$c" ->
        max(col(c).cast("double")).over(pc.wAll)) ++
      (if (encodeId) Seq("id_mean" -> avg(y).over(pc.wAll)) else Nil) :+
      ("intercept" -> lit(1.0))
    val p = feats.length
    val withF = transformed.select((y.as("__y") +: feats.zipWithIndex.map {
      case ((_, c), i) => c.as(s"__x$i")
    }): _*).na.drop()
    val prods =
      (for (i <- 0 until p; j <- i until p)
        yield sum(col(s"__x$i") * col(s"__x$j")).as(s"__g_${i}_$j")) ++
      (0 until p).map(i => sum(col(s"__x$i") * col("__y")).as(s"__b_$i"))
    val row = withF.agg(prods.head, prods.tail: _*).collect()(0)
    val g = Array.fill(p, p)(0.0)
    val b = new Array[Double](p)
    var idx = 0
    for (i <- 0 until p; j <- i until p) {
      g(i)(j) = row.getDouble(idx); g(j)(i) = g(i)(j); idx += 1
    }
    for (i <- 0 until p) { b(i) = row.getDouble(idx); idx += 1 }
    for (i <- 0 until p - 1) g(i)(i) += l2
    PipelineModel(graft.kernels.ArimaLite.solve(g, b), lags, rollingWindows,
      calendar, fourier, targetTransform, lam, encodeId,
      pastCovariates, covLags, futureCovariates, staticFeatures)
  }

  private def applyTransform(df: DataFrame, transform: Option[String],
      lam: Double)(implicit pc: PanelCols): DataFrame = transform match {
    case None => df
    case Some("log") => Transforms.logTransform(df)
    case Some("boxcox") => Transforms.boxcoxTransform(df, lam)
    case Some("difference") => Transforms.difference(df, d = 1, m = 1)
    case Some(other) => throw new IllegalArgumentException(
      s"Unknown transform '$other'. Choose from [log, boxcox, difference]")
  }

  /** Recursive h-step pipeline forecast: per-series tail state (transformed
    * target buffer, last value for difference-integration, id mean, time
    * scaffold) broadcasts nothing but the coefficient vector; every step
    * rebuilds the feature vector in training order, predicts, appends.
    * Output `[id, step, ds, y_hat]` on the ORIGINAL scale. */
  def pipelineForecast(df: DataFrame, model: PipelineModel, h: Int,
      futureDf: Option[DataFrame] = None)(
      implicit pc: PanelCols): DataFrame = {
    require(model.futureCovariates.isEmpty || futureDf.isDefined,
      "futureDf is required when future_covariates are configured")
    val spark = df.sparkSession
    val transformed = applyTransform(df, model.targetTransform, model.lam)
    val keep = math.max(model.lags.max,
      (model.rollingWindows :+ 1).max)
    val covKeep = (model.covLags :+ 1).max
    val bc = spark.sparkContext.broadcast(model)
    val u = udf((tail: Seq[Double], n: Long, lastUs: Long, freq: Long,
        idMean: Double, lastOrig: Double,
        pcovTails: Seq[Seq[Double]], fcovSteps: Seq[Seq[Double]],
        staticVals: Seq[Double]) => {
      val m = bc.value
      val buf = scala.collection.mutable.ArrayBuffer(tail: _*)
      var integ = lastOrig
      (1 to h).map { s =>
        val t = (n + s - 1).toDouble
        val us = lastUs + s * freq
        val x = scala.collection.mutable.ArrayBuffer.empty[Double]
        m.lags.foreach(k => x += buf(buf.length - k))
        m.rollingWindows.foreach { w =>
          val window = buf.takeRight(w)
          x += window.sum / window.length
        }
        m.calendar.foreach(c => x += calendarFeature(c, us))
        m.fourier.foreach { case (period, k) => (1 to k).foreach { kk =>
          val ang = 2.0 * math.Pi * kk * t / period
          x += math.sin(ang); x += math.cos(ang)
        }}
        // past covariates: the tail buffer stays frozen during recursion —
        // their future values are unknown (reference pipeline.py predict)
        m.pastCovariates.indices.foreach { ci =>
          val ct = pcovTails(ci)
          m.covLags.foreach { k =>
            x += (if (ct.length >= k) ct(ct.length - k) else 0.0)
          }
        }
        // future covariates: supplied per step (0.0 where missing)
        m.futureCovariates.indices.foreach { ci =>
          val fs = fcovSteps(ci)
          x += (if (s - 1 < fs.length) fs(s - 1) else 0.0)
        }
        staticVals.foreach(x += _)
        if (m.encodeId) x += idMean
        x += 1.0
        var pred = 0.0
        var i = 0
        while (i < x.length) { pred += x(i) * m.coef(i); i += 1 }
        buf += pred
        // inverse transform back to the original scale
        m.targetTransform match {
          case None => pred
          case Some("log") => math.exp(pred) - 1.0
          case Some("boxcox") =>
            if (m.lam == 0.0) math.exp(pred)
            else math.pow(pred * m.lam + 1.0, 1.0 / m.lam)
          case Some("difference") => { integ += pred; integ }
          case _ => pred
        }
      }.toArray
    })
    val y = pc.targetCol.cast("double")
    val staticAgg = model.staticFeatures.map(c =>
      max(col(c).cast("double")).as(s"__static_$c"))
    val pcovAgg = model.pastCovariates.map(c =>
      slice(sort_array(collect_list(struct(
        pc.orderCols :+ col(c).cast("double").as("__cv"): _*))),
        -covKeep, covKeep).getField("__cv").as(s"__pcov_$c"))
    val tails = transformed.groupBy(pc.idCol)
      .agg(
        slice(sort_array(collect_list(struct(
          pc.orderCols :+ y.as("__v"): _*))), -keep, keep).as("__tail"),
        (count(y).as("__n") +: avg(y).as("__idmean") +: (pcovAgg ++ staticAgg)): _*)
      .select((pc.idCol +: col("__tail.__v").as("__tv") +: col("__n") +:
        col("__idmean") +: (model.pastCovariates.map(c => col(s"__pcov_$c")) ++
          model.staticFeatures.map(c => col(s"__static_$c")))): _*)
    val lastOrig = df.groupBy(pc.idCol)
      .agg(max_by(pc.targetCol.cast("double"), struct(pc.orderCols: _*)).as("__last"))
    val withFcov: DataFrame => DataFrame = futureDf match {
      case Some(fd) if model.futureCovariates.nonEmpty =>
        val agg = fd.groupBy(pc.idCol).agg(
          array(model.futureCovariates.map(c =>
            sort_array(collect_list(struct(col("step"),
              col(c).cast("double").as("__fv")))).getField("__fv")): _*)
            .as("__fcov"))
        d => d.join(agg, Seq(pc.id), "left")
          .withColumn("__fcov", coalesce(col("__fcov"),
            typedLit(Seq.empty[Seq[Double]])))
      case _ =>
        d => d.withColumn("__fcov", typedLit(Seq.empty[Seq[Double]]))
    }
    val pcovCol =
      if (model.pastCovariates.isEmpty) typedLit(Seq.empty[Seq[Double]])
      else array(model.pastCovariates.map(c => col(s"__pcov_$c")): _*)
    withFcov(graft.core.Panel.seriesMeta(df)
      .join(tails, Seq(pc.id)).join(lastOrig, Seq(pc.id)))
      .withColumn("__fc", u(col("__tv"), col("__n"), col("last_us"),
        col("freq_us"), col("__idmean"), col("__last"),
        pcovCol, col("__fcov"),
        (if (model.staticFeatures.isEmpty) typedLit(Seq.empty[Double])
         else array(model.staticFeatures.map(c => col(s"__static_$c")): _*))))
      .select(pc.idCol, col("last_us"), col("freq_us"), col("__fc"),
        explode(sequence(lit(1L), lit(h.toLong))).as("step"))
      .withColumn(pc.time,
        timestamp_micros(col("last_us") + col("step") * col("freq_us"))
          .cast("timestamp_ntz"))
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
    // intentional single partition: the frame is one aggregated row per
    // model (≤ |models|), never panel-sized
    all.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(graft.core.Panel.tinyFramePartition(col("model")))
        .orderBy(col("mae"))))
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
