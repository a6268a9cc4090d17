package graft.ops

import graft.TestSpark
import graft.core.PanelCols
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CausalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit val pc: PanelCols = PanelCols()

  test("causalImpact recovers a step intervention effect") {
    import spark.implicits._
    val rng = new scala.util.Random(4L)
    // level 10 pre, +5 lift after t=80
    val rows = (0 until 120).map(i =>
      ("u", i, 10.0 + (if (i >= 80) 5.0 else 0.0) + rng.nextGaussian() * 0.3))
    val df = rows.toDF("unique_id", "__h", "y")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L)).drop("__h")
    val inter = new java.sql.Timestamp(80L * 3600000L)
    val out = Causal.causalImpact(df, inter, trend = "level",
      sigmaObs = 0.3, sigmaLevel = 0.05)
    assert(out.count() == 40)
    val meanEff = out.agg(avg("point_effect")).collect()(0).getDouble(0)
    assert(math.abs(meanEff - 5.0) < 1.0, s"mean effect $meanEff")
    val lastCum = out.orderBy(col("ds").desc).limit(1)
      .select("cum_effect").collect()(0).getDouble(0)
    assert(math.abs(lastCum - 200.0) < 40.0, s"cum $lastCum")
  }

  test("synthetic control reweights donors to match the treated unit") {
    import spark.implicits._
    val rng = new scala.util.Random(9L)
    val base = Array.tabulate(100)(t => 50.0 + 10.0 * math.sin(t / 8.0))
    // treated = 0.7*d1 + 0.3*d2 pre-intervention, +8 lift post
    val rows =
      (0 until 100).flatMap { t =>
        val d1 = base(t) + rng.nextGaussian() * 0.2
        val d2 = base(t) * 0.5 + 20 + rng.nextGaussian() * 0.2
        val tr = 0.7 * d1 + 0.3 * d2 + (if (t >= 70) 8.0 else 0.0)
        Seq(("treated", t, tr), ("d1", t, d1), ("d2", t, d2))
      }
    val df = rows.toDF("unique_id", "__h", "y")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L)).drop("__h")
    val inter = new java.sql.Timestamp(70L * 3600000L)
    val (frame, weights) = Causal.syntheticControl(df, "treated", inter)
    assert(math.abs(weights("d1") - 0.7) < 0.1, s"w=$weights")
    assert(math.abs(weights("d2") - 0.3) < 0.1, s"w=$weights")
    val postEff = frame.filter(col("period") === "post")
      .agg(avg("effect")).collect()(0).getDouble(0)
    assert(math.abs(postEff - 8.0) < 1.0, s"post effect $postEff")
    val preEff = frame.filter(col("period") === "pre")
      .agg(avg(abs(col("effect")))).collect()(0).getDouble(0)
    assert(preEff < 0.5, s"pre fit error $preEff")
  }

  test("placebo test: treated unit has the extreme rmse ratio") {
    import spark.implicits._
    val rng = new scala.util.Random(13L)
    val rows = (0 until 80).flatMap { t =>
      val shared = 10.0 * math.sin(t / 5.0)
      Seq(
        ("treated", t, shared + (if (t >= 60) 6.0 else 0.0) + rng.nextGaussian() * 0.2),
        ("a", t, shared + rng.nextGaussian() * 0.2),
        ("b", t, shared + 1 + rng.nextGaussian() * 0.2),
        ("c", t, shared - 1 + rng.nextGaussian() * 0.2))
    }
    val df = rows.toDF("unique_id", "__h", "y")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L)).drop("__h")
    val inter = new java.sql.Timestamp(60L * 3600000L)
    val stats = Causal.placeboTest(df, "treated", inter)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(stats("treated") == stats.values.max, s"stats $stats")
  }
}
