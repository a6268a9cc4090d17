package graft.ops

import graft.TestSpark
import graft.core.PanelCols
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProbabilisticSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit val pc: PanelCols = PanelCols()

  private def panel(n: Int) = {
    import spark.implicits._
    val rng = new scala.util.Random(5L)
    val rows = for {
      id <- Seq("a", "b", "c")
      i <- 0 until n
    } yield (id, i, 50.0 + 0.5 * i + rng.nextGaussian() * 2.0)
    rows.toDF("unique_id", "__h", "y")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L))
      .drop("__h")
  }

  test("quantile forecast levels are ordered and bracket the median") {
    val df = panel(60)
    val model = Probabilistic.fitQuantileRidge(df, lags = 3,
      quantiles = Seq(0.1, 0.5, 0.9))
    val fc = Probabilistic.quantileForecast(df, model, h = 4)
    assert(fc.count() == 12) // 3 series × 4 steps
    val bad = fc.filter(col("q_0_1") > col("q_0_5") || col("q_0_5") > col("q_0_9"))
      .count()
    assert(bad == 0, "quantile crossing")
  }

  test("quantile regression pinball coverage is roughly nominal in-sample") {
    val df = panel(120)
    val model = Probabilistic.fitQuantileRidge(df, lags = 2, quantiles = Seq(0.9))
    // in-sample: fraction of y below the q90 line should be near 0.9
    val y = col("y").cast("double")
    val f1 = lag(y, 1).over(pc.w); val f2 = lag(y, 2).over(pc.w)
    val c = model.coef(0.9)
    val pred = f1 * lit(c(0)) + f2 * lit(c(1)) + lit(c(2))
    val cov = df.select((y <= pred).cast("int").as("u")).na.drop()
      .agg(avg(col("u"))).collect()(0).getDouble(0)
    assert(cov > 0.8 && cov <= 1.0, s"coverage $cov")
  }

  test("EnbPI: bootstrap ensemble intervals bracket the forecast and adapt on update") {
    val df = panel(80)
    val model = Conformal.enbpiFit(df, lags = 2, b = 8)
    assert(model.coefs.length == 8)
    // bootstrap models differ (different resamples) but all fit the same AR
    assert(model.coefs.map(_.toSeq).distinct.length > 1)
    val fc = Conformal.enbpiPredict(df, model, h = 3)
    assert(fc.count() == 9)
    val bad = fc.filter(col("y_hat_lower") > col("y_hat") ||
      col("y_hat") > col("y_hat_upper")).count()
    assert(bad == 0)
    val width0 = fc.agg(avg(col("y_hat_upper") - col("y_hat_lower")))
      .collect()(0).getDouble(0)
    assert(width0 > 0.0, "zero-width intervals")
    // update with large-error observations → wider intervals
    import spark.implicits._
    val obs = Seq(("a", 0, 100.0, 0.0), ("a", 1, 100.0, 0.0))
      .toDF("unique_id", "__h", "y", "y_hat")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L)).drop("__h")
    val updated = Conformal.enbpiUpdate(model, obs, "y", "y_hat")
    val fc2 = Conformal.enbpiPredict(df, updated, h = 3)
    val widthA = fc2.filter(col("unique_id") === "a")
      .agg(avg(col("y_hat_upper") - col("y_hat_lower"))).collect()(0).getDouble(0)
    val width0A = fc.filter(col("unique_id") === "a")
      .agg(avg(col("y_hat_upper") - col("y_hat_lower"))).collect()(0).getDouble(0)
    assert(widthA > width0A, s"update did not widen: $widthA vs $width0A")
  }

  test("pipeline forecast tracks a trending-seasonal panel") {
    import spark.implicits._
    val rng = new scala.util.Random(21L)
    val rows = for {
      id <- Seq("a", "b"); i <- 0 until 96
    } yield (id, i, 100.0 + 0.5 * i + 10 * math.sin(2 * math.Pi * i / 24.0)
      + rng.nextGaussian() * 0.5)
    val df = rows.toDF("unique_id", "__h", "y")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L)).drop("__h")
    val model = Pipeline.fitPipeline(df, lags = Seq(1, 2, 24),
      rollingWindows = Seq(12), fourier = Seq((24.0, 2)), encodeId = true)
    val fc = Pipeline.pipelineForecast(df, model, h = 6).collect()
    assert(fc.length == 12)
    // predictions continue the pattern: compare against the true process
    val errs = fc.map { r =>
      val step = r.getLong(1).toInt
      val i = 96 + step - 1
      val truth = 100.0 + 0.5 * i + 10 * math.sin(2 * math.Pi * i / 24.0)
      math.abs(r.getDouble(3) - truth)
    }
    assert(errs.max < 5.0, s"max err ${errs.max}")
  }

  test("pipeline covariates: future covariate drives the forecast; adapter roundtrips") {
    import spark.implicits._
    val rng = new scala.util.Random(31L)
    // y = 5*promo + noise — the future covariate carries all the signal
    val rows = (0 until 120).map { i =>
      val promo = if (i % 3 == 0) 1.0 else 0.0
      ("s", i, 10.0 + 5.0 * promo + rng.nextGaussian() * 0.1, promo)
    }
    val df = rows.toDF("unique_id", "__h", "y", "promo")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L)).drop("__h")
    val model = Pipeline.fitPipeline(df, lags = Seq(1),
      futureCovariates = Seq("promo"))
    val future = Seq(("s", 1L, 1.0), ("s", 2L, 0.0), ("s", 3L, 1.0))
      .toDF("unique_id", "step", "promo")
    val fc = Pipeline.pipelineForecast(df, model, h = 3, Some(future))
      .orderBy("step").collect()
    val p1 = fc(0).getDouble(3); val p2 = fc(1).getDouble(3); val p3 = fc(2).getDouble(3)
    assert(p1 - p2 > 3.0, s"promo lift not learned: $p1 vs $p2")
    assert(p3 - p2 > 3.0, s"promo lift not learned: $p3 vs $p2")
    // static per-series features enter the design matrix
    val withStatic = df.withColumn("store_type", lit(2.0))
    val m2 = Pipeline.fitPipeline(withStatic, lags = Seq(1),
      staticFeatures = Seq("store_type"))
    val fc2 = Pipeline.pipelineForecast(withStatic, m2, h = 2)
    assert(fc2.count() == 2)
    // adapter roundtrip preserves the panel
    val nested = Adapters.toSeriesDataset(df)
    assert(nested.count() == 1)
    val back = Adapters.fromSeriesDataset(nested)
    assert(back.count() == 120)
    val err = back.join(df.select(col("unique_id").cast("string").as("unique_id"),
        col("ds"), col("y").as("orig")), Seq("unique_id", "ds"))
      .agg(max(abs(col("y") - col("orig")))).collect()(0).getDouble(0)
    assert(err < 1e-9)
  }

  test("pipeline difference transform integrates back to the original scale") {
    import spark.implicits._
    val rows = for { i <- 0 until 80 } yield ("s", i, 10.0 + 2.0 * i)
    val df = rows.toDF("unique_id", "__h", "y")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L)).drop("__h")
    val model = Pipeline.fitPipeline(df, lags = Seq(1, 2),
      targetTransform = Some("difference"))
    val fc = Pipeline.pipelineForecast(df, model, h = 4).collect()
      .sortBy(_.getLong(1))
    // linear trend: diffs constant 2 → forecasts continue the line
    fc.zipWithIndex.foreach { case (r, i) =>
      val truth = 10.0 + 2.0 * (80 + i)
      assert(math.abs(r.getDouble(3) - truth) < 1.0,
        s"step ${i + 1}: ${r.getDouble(3)} vs $truth")
    }
  }

  test("consensus anomaly agents agree on a planted spike") {
    import spark.implicits._
    val rng = new scala.util.Random(17L)
    val rows = (0 until 120).map(i =>
      ("s", i, if (i == 80) 50.0 else rng.nextGaussian()))
    val df = rows.toDF("unique_id", "__h", "y")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L)).drop("__h")
    val out = Outliers.consensusAnomaly(df, windowSize = 20)
    val spike = out.filter(col("ds") === timestamp_micros(lit(80L * 3600000000L)))
      .collect()(0)
    assert(spike.getAs[Boolean]("decision"), "spike not flagged")
    val falsePos = out.filter(col("decision") &&
      col("ds") =!= timestamp_micros(lit(80L * 3600000000L))).count()
    assert(falsePos <= 3, s"$falsePos false positives")
  }

  test("isolation forest flags injected outliers") {
    import spark.implicits._
    val rng = new scala.util.Random(8L)
    val rows = (0 until 400).map { i =>
      val v = if (i % 97 == 0) 500.0 + rng.nextGaussian() else rng.nextGaussian() * 3.0
      ("s", i, v)
    }
    val df = rows.toDF("unique_id", "__h", "y")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L)).drop("__h")
    val out = Outliers.isolationForestDetect(df, Seq("y"), contamination = 0.05)
    val flaggedBig = out.filter(col("y") > 400 && col("is_anomaly")).count()
    val totalBig = out.filter(col("y") > 400).count()
    assert(flaggedBig == totalBig, s"missed ${totalBig - flaggedBig} planted outliers")
    // flags roughly the contamination fraction
    val flagged = out.filter(col("is_anomaly")).count().toDouble / out.count()
    assert(flagged < 0.1, s"flagged fraction $flagged")
  }

  test("stacking recovers weights of a synthetic linear blend") {
    import spark.implicits._
    // target = 0.7*m0 + 0.3*m1 exactly; meta ridge should find the blend
    val rng = new scala.util.Random(9L)
    val rows = (0 until 200).map { i =>
      val a = rng.nextGaussian() * 10 + 50
      val b = rng.nextGaussian() * 10 + 50
      ("s", i, a, b, 0.7 * a + 0.3 * b)
    }
    val base = rows.toDF("unique_id", "__h", "m0", "m1", "y")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L)).drop("__h")
    val oof0 = base.select(col("unique_id"), col("ds"), col("m0").as("y_hat"))
    val oof1 = base.select(col("unique_id"), col("ds"), col("m1").as("y_hat"))
    val coef = Probabilistic.stackingFit(Seq(oof0, oof1), base)
    assert(math.abs(coef(0) - 0.7) < 0.05, s"w0=${coef(0)}")
    assert(math.abs(coef(1) - 0.3) < 0.05, s"w1=${coef(1)}")
    val combined = Probabilistic.stackingCombine(Seq(oof0, oof1), coef)
    val err = combined.join(base.select(col("unique_id"), col("ds"), col("y")),
        Seq("unique_id", "ds"))
      .agg(max(abs(col("y_hat") - col("y")))).collect()(0).getDouble(0)
    assert(err < 0.5, s"blend error $err")
  }
}
