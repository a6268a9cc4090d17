package graft.ops

import graft.TestSpark
import graft.core.PanelCols
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's domain-agent assertions
  * (tests/test_supply_chain_agents.py, test_energy_agents.py,
  * test_marl.py) against the column-expression ports. */
class DomainAgentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit val pc: PanelCols = PanelCols()

  test("demand sensing fuses weighted signals and floors at zero") {
    import spark.implicits._
    val fc = Seq(("a", 100.0, 0.1, 0.2), ("a", 50.0, -3.0, 0.0))
      .toDF("unique_id", "y_hat", "buzz", "weather")
    val sensed = DomainAgents.demandSense(fc, "y_hat",
      Map("buzz" -> 0.5, "weather" -> 1.0)).collect()
    assert(math.abs(sensed(0).getAs[Double]("sensed_demand") - 100.0 * 1.25) < 1e-9)
    assert(sensed(1).getAs[Double]("sensed_demand") == 0.0) // floored
  }

  test("promotion lift is the difference-in-means ratio and applies on schedule") {
    import spark.implicits._
    val hist = (0 until 40).map(i =>
      ("s", i, if (i % 4 == 0) 20.0 else 10.0, if (i % 4 == 0) 1 else 0))
      .toDF("unique_id", "__h", "y", "promo")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L)).drop("__h")
    val fc = Seq(("s", 1L, 10.0, 1.0), ("s", 2L, 10.0, 0.0))
      .toDF("unique_id", "step", "y_hat", "sched")
    val out = DomainAgents.promotionAdjust(hist, "promo", fc, "sched")
      .orderBy("step").collect()
    assert(math.abs(out(0).getAs[Double]("y_hat") - 20.0) < 1e-9) // lift = 1.0
    assert(math.abs(out(1).getAs[Double]("y_hat") - 10.0) < 1e-9)
  }

  test("inventory reorder computes base-stock policy") {
    import spark.implicits._
    val fc = (1 to 6).map(s => ("s", s.toLong, 10.0)).toDF("unique_id", "step", "y_hat")
    val onHand = Seq(("s", 15.0)).toDF("unique_id", "on_hand")
    val r = DomainAgents.inventoryReorder(fc, onHand, leadTime = 2).collect()(0)
    assert(math.abs(r.getAs[Double]("order_up_to") - 20.0) < 1e-9) // constant fc: std 0
    assert(r.getAs[Double]("order_qty") == 5.0)
    assert(r.getAs[Double]("stockout_risk") == 1.0) // 15 < 20
  }

  test("weather adjustment adds degree-day load; net demand curtails") {
    import spark.implicits._
    val fc = Seq((10.0, 28.0), (10.0, 8.0), (10.0, 18.0)).toDF("y_hat", "temp")
    val adj = DomainAgents.weatherAdjust(fc, "temp").collect()
    assert(adj(0).getAs[Double]("weather_adjusted") == 10.0 + 10 * 2.0)
    assert(adj(1).getAs[Double]("weather_adjusted") == 10.0 + 10 * 3.0)
    assert(adj(2).getAs[Double]("weather_adjusted") == 10.0)
    val nd = DomainAgents.netDemand(
      Seq((5.0, 8.0)).toDF("demand", "gen"), "demand", "gen", curtail = true)
      .collect()(0).getAs[Double]("net_demand")
    assert(nd == 0.0)
  }

  test("health triage escalates a critical vitals row and rests a normal one") {
    import spark.implicits._
    val df = Seq(
      ("p1", 75.0, 120.0, 16.0, 37.0, 98.0),   // normal
      ("p2", 125.0, 85.0, 26.0, 39.5, 90.0))   // critical
      .toDF("unique_id", "hr", "sbp", "rr", "temp", "spo2")
    val out = DomainAgents.healthTriage(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("p1").getAs[Int]("tier") == 0)
    assert(!out("p1").getAs[Boolean]("sepsis_flag"))
    assert(out("p2").getAs[Int]("tier") == 3)
    assert(out("p2").getAs[Boolean]("sepsis_flag"))
  }

  test("condition monitor: health degrades and RUL shrinks on growing amplitude") {
    import spark.implicits._
    val rows = (0 until 60).map(i => ("m", i, (1.0 + i / 15.0) * math.sin(i.toDouble)))
    val df = rows.toDF("unique_id", "__h", "y")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L)).drop("__h")
    val out = DomainAgents.conditionMonitor(df, window = 8, warmup = 5)
      .orderBy("ds").collect()
    val healths = out.map(_.getAs[Double]("health"))
    assert(healths.take(5).forall(_ > 0.8))
    assert(healths.last < healths(10), "health did not degrade")
  }

  test("echelon smoothing reduces bullwhip; demand response preserves energy") {
    import spark.implicits._
    val rng = new scala.util.Random(5L)
    val rows = (0 until 50).map(i => ("s", i, 10.0 + rng.nextGaussian() * 3.0))
    val df = rows.toDF("unique_id", "__h", "y")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L)).drop("__h")
    val ech = DomainAgents.echelonCoordinate(df, nEchelons = 2, smoothing = 0.3)
    val bw = ech.select("bullwhip_ratio").head().getDouble(0)
    assert(bw < 1.0, s"smoothing should damp variance: $bw")
    assert(ech.count() == 150) // 3 echelons × 50 rows
    val dr = DomainAgents.demandResponse(df, capacity = 12.0)
    val sums = dr.agg(sum("shifted")).head().getDouble(0)
    val orig = df.agg(sum("y")).head().getDouble(0)
    assert(math.abs(sums - orig) < 1e-6, "energy not preserved")
    assert(dr.agg(max("shifted")).head().getDouble(0) <= 12.0 + 1e-9)
  }

  test("portfolio weights sum to 1 and favor the high-sharpe asset") {
    import spark.implicits._
    val rng = new scala.util.Random(3L)
    val rows = for { t <- 0 until 60; (a, mu, sd) <- Seq(("good", 0.01, 0.01), ("bad", -0.01, 0.05)) }
      yield (t, a, mu + rng.nextGaussian() * sd)
    val df = rows.toDF("__h", "asset", "ret")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L)).drop("__h")
    val w = DomainAgents.portfolioWeights(df, window = 20)(PanelCols(time = "ds"))
    val sums = w.groupBy("ds").agg(sum("weight").as("s"))
      .agg(max(abs(col("s") - 1.0))).collect()(0).getDouble(0)
    assert(sums < 1e-9, s"weights don't sum to 1: $sums")
    val meanGood = w.filter(col("asset") === "good").agg(avg("weight"))
      .collect()(0).getDouble(0)
    assert(meanGood > 0.6, s"good-asset mean weight $meanGood")
  }
}
