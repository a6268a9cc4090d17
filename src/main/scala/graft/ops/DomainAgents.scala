package graft.ops

import graft.core.PanelCols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain agent packs (reference polars_ts/{supply_chain,energy,marl}_agents):
  * the reference steps numpy envs one observation at a time; every agent
  * formula here is a column/window expression, so each orchestration is a
  * handful of shuffle-free passes over the panel. */
object DomainAgents {

  // ── supply chain (supply_chain_agents/agents.py) ───────────────────────

  /** DemandSensingAgent.sense: sensed = max(0, baseline·(1 + Σ wᵢ·sigᵢ)).
    * `signals`: signal column → weight. */
  def demandSense(forecast: DataFrame, yhatCol: String,
      signals: Map[String, Double]): DataFrame = {
    val uplift = signals.map { case (c, w) => col(c) * lit(w) }
      .reduceOption(_ + _).getOrElse(lit(0.0))
    forecast.withColumn("sensed_demand",
      greatest(lit(0.0), col(yhatCol) * (lit(1.0) + uplift)))
  }

  /** PromotionEffectAgent: per-series difference-in-means lift
    * (promo_mean/base_mean − 1; 0 when degenerate), applied
    * multiplicatively to future rows flagged in `scheduleCol`. */
  def promotionAdjust(history: DataFrame, promoCol: String,
      forecast: DataFrame, scheduleCol: String, yhatCol: String = "y_hat")(
      implicit pc: PanelCols): DataFrame = {
    val lift = history.groupBy(pc.idCol).agg(
        avg(when(col(promoCol) === 1, pc.targetCol)).as("__pm"),
        avg(when(col(promoCol) === 0, pc.targetCol)).as("__bm"))
      .withColumn("promo_lift",
        when(col("__pm").isNull || col("__bm").isNull || col("__bm") <= 0.0, 0.0)
          .otherwise(col("__pm") / col("__bm") - 1.0))
      .select(pc.idCol, col("promo_lift"))
    forecast.join(broadcast(lift), Seq(pc.id), "left")
      .na.fill(0.0, Seq("promo_lift"))
      .withColumn(yhatCol,
        col(yhatCol) * (lit(1.0) + col("promo_lift") * col(scheduleCol)))
  }

  /** InventoryAgent.reorder per series: base-stock policy over the h-step
    * forecast. `onHand`: `[id, on_hand]`. Output:
    * `[id, order_up_to, safety_stock, order_qty, stockout_risk]`. */
  def inventoryReorder(forecast: DataFrame, onHand: DataFrame,
      leadTime: Int = 1, safetyFactor: Double = 1.65,
      yhatCol: String = "y_hat")(implicit pc: PanelCols): DataFrame = {
    require(leadTime >= 1, "lead_time must be >= 1")
    val stats = forecast.groupBy(pc.idCol).agg(
      sum(when(col("step") <= leadTime, col(yhatCol))).as("__lead_demand"),
      coalesce(stddev_pop(col(yhatCol)), lit(0.0)).as("__std"))
    stats.join(onHand, Seq(pc.id))
      .withColumn("safety_stock",
        lit(safetyFactor) * col("__std") * lit(math.sqrt(leadTime.toDouble)))
      .withColumn("order_up_to", col("__lead_demand") + col("safety_stock"))
      .withColumn("order_qty",
        greatest(col("order_up_to") - col("on_hand"), lit(0.0)))
      .withColumn("stockout_risk",
        when(col("on_hand") < col("__lead_demand"), 1.0).otherwise(0.0))
      .select(pc.idCol, col("order_up_to"), col("safety_stock"),
        col("order_qty"), col("stockout_risk"))
  }

  // ── energy (energy_agents/agents.py) ───────────────────────────────────

  /** WeatherContextAgent.adjust: base + cooling·(T−comfort)⁺ +
    * heating·(comfort−T)⁺, column-wise over a forecast frame carrying a
    * temperature path column. */
  def weatherAdjust(forecast: DataFrame, tempCol: String,
      yhatCol: String = "y_hat", comfortTemp: Double = 18.0,
      coolingCoef: Double = 2.0, heatingCoef: Double = 3.0): DataFrame =
    forecast.withColumn("weather_adjusted",
      col(yhatCol) +
        greatest(col(tempCol) - comfortTemp, lit(0.0)) * coolingCoef +
        greatest(lit(comfortTemp) - col(tempCol), lit(0.0)) * heatingCoef)

  /** RenewableAgent.net_demand: demand − generation (floored at 0 when
    * `curtail`). */
  def netDemand(df: DataFrame, demandCol: String, generationCol: String,
      curtail: Boolean = false): DataFrame = {
    val net = col(demandCol) - col(generationCol)
    df.withColumn("net_demand",
      if (curtail) greatest(net, lit(0.0)) else net)
  }

  // ── MARL portfolio (marl/agents.py) ────────────────────────────────────

  /** Risk + Return + Allocation agents over a long-format returns panel
    * `[ds, asset, return]`: rolling population volatility (RiskAgent),
    * EWMA expected return (ReturnAgent, decay weights over the trailing
    * window), and per-timestamp min-shifted risk-adjusted weights
    * (AllocationAgent). Output per (ds, asset):
    * `[.., risk, expected_return, weight]` for rows with a full window. */
  def portfolioWeights(returns: DataFrame, window: Int = 20,
      decay: Double = 0.94, riskAversion: Double = 1.0,
      assetCol: String = "asset", retCol: String = "ret")(
      implicit pc: PanelCols): DataFrame = {
    val w = Window.partitionBy(col(assetCol)).orderBy(pc.timeCol)
      .rowsBetween(-(window - 1), 0)
    val ewmaUdf = udf((xs: Seq[Double]) => {
      val n = xs.length
      var wsum = 0.0; var s = 0.0
      var i = 0
      while (i < n) {
        val wt = math.pow(decay, (n - 1 - i).toDouble)
        wsum += wt; s += wt * xs(i)
        i += 1
      }
      if (wsum > 0) s / wsum else 0.0
    })
    val scored = returns
      .withColumn("__n", count(col(retCol)).over(w))
      .withColumn("risk", stddev_pop(col(retCol)).over(w))
      .withColumn("expected_return", ewmaUdf(collect_list(col(retCol)).over(w)))
      .filter(col("__n") === window)
      .withColumn("__score",
        col("expected_return") / (greatest(col("risk"), lit(1e-10)) * riskAversion))
    val perTs = Window.partitionBy(pc.timeCol)
    scored
      .withColumn("__shifted",
        col("__score") - min(col("__score")).over(perTs) + 1e-10)
      .withColumn("weight", col("__shifted") / sum(col("__shifted")).over(perTs))
      .drop("__n", "__score", "__shifted")
  }
}
