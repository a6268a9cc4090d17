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

  /** EchelonCoordinatorAgent.coordinate per series: exponential smoothing
    * cascaded up `nEchelons` echelons + the bullwhip variance ratio.
    * Per-series kernel over the grouped panel (the smoothing chain is
    * sequential per series, parallel across series). Output:
    * `[id, echelon (0 = demand), ds, orders]` plus a per-series
    * `bullwhip_ratio` on every row. */
  def echelonCoordinate(df: DataFrame, nEchelons: Int = 2,
      smoothing: Double = 0.5)(implicit pc: PanelCols): DataFrame = {
    require(nEchelons >= 1, "n_echelons must be >= 1")
    require(smoothing > 0.0 && smoothing <= 1.0, "smoothing must be in (0, 1]")
    val u = udf((ys: Seq[Double]) => {
      val demand = ys.toArray
      def smooth(s: Array[Double]): Array[Double] = {
        var level = s(0)
        s.map { v => level = smoothing * v + (1.0 - smoothing) * level; level }
      }
      val orders = scala.collection.mutable.ArrayBuffer(demand)
      for (_ <- 0 until nEchelons) orders += smooth(orders.last)
      def popVar(a: Array[Double]): Double = {
        val m = a.sum / a.length
        a.map(v => (v - m) * (v - m)).sum / a.length
      }
      val bullwhip = popVar(orders.last) / (popVar(demand) + 1e-12)
      (orders.map(_.toSeq).toSeq, bullwhip)
    })
    graft.core.Panel.grouped(df)
      .select(pc.idCol, col("ts").as("__ts"), u(col("ys")).as("__r"))
      .select(pc.idCol, col("__ts"), col("__r._2").as("bullwhip_ratio"),
        posexplode(col("__r._1")).as(Seq("echelon", "__orders")))
      .select(pc.idCol, col("echelon"), col("bullwhip_ratio"),
        posexplode(arrays_zip(col("__ts"), col("__orders"))).as(Seq("__i", "__s")))
      .select(pc.idCol, col("echelon"), col("__s.__ts").as(pc.time),
        col("__s.__orders").as("orders"), col("bullwhip_ratio"))
  }

  // ── energy (energy_agents/agents.py) ───────────────────────────────────

  /** DemandResponseAgent.optimize per series: peak energy above `capacity`
    * is shed and water-filled into the lowest periods (stable order),
    * preserving total energy; infeasible profiles flatten to their mean.
    * Output per row: `[.., shifted, energy_shifted]`. */
  def demandResponse(df: DataFrame, capacity: Double)(
      implicit pc: PanelCols): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val u = udf((ys: Seq[Double]) => {
      val prof = ys.toArray.clone()
      val n = prof.length
      val shed = prof.map(v => math.max(v - capacity, 0.0)).sum
      if (shed == 0.0) (prof.toSeq, 0.0)
      else {
        val total = prof.sum
        if (total <= capacity * n) {
          val clipped = prof.map(math.min(_, capacity))
          var deficit = shed
          // stable ascending order (np.argsort kind="stable")
          val order = clipped.zipWithIndex.sortBy(_._1).map(_._2)
          for (i <- order if deficit > 1e-12) {
            val add = math.min(capacity - clipped(i), deficit)
            clipped(i) += add
            deficit -= add
          }
          (clipped.toSeq, shed)
        } else (Array.fill(n)(total / n).toSeq, shed)
      }
    })
    graft.core.Panel.grouped(df)
      .select(pc.idCol, col("ts").as("__ts"), u(col("ys")).as("__r"))
      .select(pc.idCol, col("__ts"), col("__r._1").as("__shift"),
        col("__r._2").as("energy_shifted"))
      .select(pc.idCol, col("energy_shifted"),
        posexplode(arrays_zip(col("__ts"), col("__shift"))).as(Seq("__i", "__s")))
      .select(pc.idCol, col("__s.__ts").as(pc.time),
        col("__s.__shift").as("shifted"), col("energy_shifted"))
  }

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

  // ── healthcare triage (healthcare_agents/agents.py) ────────────────────

  /** Sepsis (qSOFA+SIRS) + vital-range monitoring + NEWS-style escalation
    * per row — the full triage chain as pure column expressions:
    * `[.., sepsis_score, sepsis_flag, n_deranged, news_score, tier]`. */
  def healthTriage(df: DataFrame, hr: String = "hr", sbp: String = "sbp",
      rr: String = "rr", temp: String = "temp", spo2: String = "spo2",
      sepsisThreshold: Int = 2, nTiers: Int = 4): DataFrame = {
    def b(c: Column): Column = c.cast("int")
    val qsofa = b(col(rr) >= 22.0) + b(col(sbp) <= 100.0)
    val sirs = b(col(temp) > 38.0 || col(temp) < 36.0) +
      b(col(hr) > 90.0) + b(col(rr) > 20.0)
    val sepsisScore = (qsofa + sirs).cast("double")
    val deranged =
      b(col(hr) < 60.0 || col(hr) > 100.0) +
      b(col(sbp) < 100.0 || col(sbp) > 140.0) +
      b(col(rr) < 12.0 || col(rr) > 20.0) +
      b(col(temp) < 36.0 || col(temp) > 38.0) +
      b(col(spo2) < 94.0 || col(spo2) > 100.0)
    val news =
      when(col(rr) <= 8 || col(rr) >= 25, 3).when(col(rr) >= 21, 2)
        .when(col(rr) <= 11, 1).otherwise(0) +
      when(col(spo2) <= 91, 3).when(col(spo2) <= 93, 2)
        .when(col(spo2) <= 95, 1).otherwise(0) +
      when(col(sbp) <= 90 || col(sbp) >= 220, 3).when(col(sbp) <= 100, 2)
        .when(col(sbp) <= 110, 1).otherwise(0) +
      when(col(hr) <= 40 || col(hr) >= 131, 3).when(col(hr) >= 111, 2)
        .when(col(hr) >= 91 || col(hr) <= 50, 1).otherwise(0) +
      when(col(temp) <= 35, 3).when(col(temp) >= 39.1, 2)
        .when(col(temp) >= 38.1 || col(temp) <= 36, 1).otherwise(0)
    val scored = df
      .withColumn("sepsis_score", sepsisScore)
      .withColumn("sepsis_flag", sepsisScore >= sepsisThreshold)
      .withColumn("n_deranged", deranged.cast("double"))
      .withColumn("news_score", news)
    val baseTier = when(col("news_score") >= 7, 3)
      .when(col("news_score") >= 5, 2)
      .when(col("news_score") >= 1, 1).otherwise(0)
    scored.withColumn("tier",
      least(
        when(col("n_deranged") >= 3,
          least(greatest(baseTier, when(col("sepsis_flag"), 2).otherwise(0)) + 1,
            lit(nTiers - 1)))
          .otherwise(greatest(baseTier, when(col("sepsis_flag"), 2).otherwise(0))),
        lit(nTiers - 1)))
  }

  // ── IIoT condition monitoring (iiot_agents/agents.py) ──────────────────

  /** HealthIndexAgent + RULEstimator per series: trailing-window RMS vs the
    * first-`warmup`-rows baseline → health index in [0,1]; RUL from the
    * OLS slope of the trailing health history (∞ when stable → null).
    * Output per row: `[.., rms, health, rul]`. */
  def conditionMonitor(df: DataFrame, window: Int = 8, warmup: Int = 5,
      failRatio: Double = 3.0, failureThreshold: Double = 0.2,
      rulHistory: Int = 12)(implicit pc: PanelCols): DataFrame = {
    val y = pc.targetCol.cast("double")
    val wTrail = pc.w.rowsBetween(-(window - 1), 0)
    val rms = sqrt(avg(y * y).over(wTrail))
    val rn = row_number().over(pc.w)
    val withRms = df.withColumn("__rn", rn).withColumn("rms", rms)
    val baseline = withRms.filter(col("__rn") <= warmup)
      .groupBy(pc.idCol)
      .agg((sqrt(avg(y * y)) + 1e-12).as("__baseline"))
    val health = withRms.join(broadcast(baseline), Seq(pc.id))
      .withColumn("__ratio", col("rms") / col("__baseline"))
      .withColumn("health",
        greatest(lit(0.0), least(lit(1.0),
          lit(1.0) - greatest(lit(0.0),
            least((col("__ratio") - 1.0) / lit(failRatio - 1.0), lit(1.0))))))
    // RUL: OLS of health on t over the trailing history window
    val hw = pc.w.rowsBetween(-(rulHistory - 1), 0)
    val n = count(col("health")).over(hw).cast("double")
    val t = col("__rn").cast("double")
    val mT = avg(t).over(hw)
    val mH = avg(col("health")).over(hw)
    val slope = (avg(t * col("health")).over(hw) - mT * mH) /
      (avg(t * t).over(hw) - mT * mT)
    val intercept = mH - slope * mT
    val current = intercept + slope * t
    health
      .withColumn("rul",
        when(n < 3, lit(null))
          .when(current <= failureThreshold, 0.0)
          .when(slope >= -1e-9, lit(null)) // stable or improving → ∞
          .otherwise((current - failureThreshold) / -slope))
      .drop("__rn", "__baseline", "__ratio")
  }

  /** SpectralFeatureAgent.extract per series row: RMS + band-energy
    * fractions of the trailing window's centered rFFT (bounded window →
    * exact kernel). Output `[.., spectral (array: rms, band fracs...)]`. */
  def spectralFeatures(df: DataFrame, window: Int = 16, nBands: Int = 3)(
      implicit pc: PanelCols): DataFrame = {
    val u = udf((xs: Seq[Double]) => {
      val w = xs.toArray
      val rmsV = math.sqrt(w.map(v => v * v).sum / w.length)
      val mean = w.sum / w.length
      val c = w.map(_ - mean)
      val nF = c.length / 2 + 1
      val spec = new Array[Double](nF)
      var k = 0
      while (k < nF) {
        var re = 0.0; var im = 0.0
        var t = 0
        while (t < c.length) {
          val ang = -2.0 * math.Pi * k * t / c.length
          re += c(t) * math.cos(ang); im += c(t) * math.sin(ang)
          t += 1
        }
        spec(k) = re * re + im * im
        k += 1
      }
      val total = spec.sum + 1e-12
      // np.array_split: first (nF % nBands) bands get one extra element
      val base = nF / nBands
      val rem = nF % nBands
      val sizes = Array.tabulate(nBands)(i => if (i < rem) base + 1 else base)
      val fracs = new Array[Double](nBands)
      var off = 0
      for (b <- 0 until nBands) {
        fracs(b) = spec.slice(off, off + sizes(b)).sum / total
        off += sizes(b)
      }
      rmsV +: fracs
    })
    df.withColumn("spectral",
      u(collect_list(pc.targetCol.cast("double")).over(
        pc.w.rowsBetween(-(window - 1), 0))))
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
