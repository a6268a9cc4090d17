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
