package graft.ops

import graft.core.PanelCols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rule-based forecasting agent pipeline (reference
  * polars_ts/agents/scientist.py:26-180 with RuleBasedBackend — the LLM
  * backend is environment-dependent and descoped): curate → plan →
  * forecast → report. Every stage is the library's own distributed ops;
  * the "agent" is the orchestration policy. */
object Agents {

  case class ScientistReport(candidates: Seq[String], bestModel: String,
      scores: Map[String, Double], report: String)

  /** Diagnose → clean → select candidates → backtest → forecast with the
    * winner. Returns (h-step forecast of the best model, report). */
  def scientist(df: DataFrame, horizon: Int = 10, folds: Int = 2)(
      implicit pc: PanelCols): (DataFrame, ScientistReport) = {
    val log = scala.collection.mutable.ArrayBuffer.empty[String]

    // 1. curate: impute forward-fill + clip outliers
    val nullCount = df.filter(pc.targetCol.isNull).count()
    val cleaned0 = if (nullCount > 0) {
      log += s"curator: forward-filled $nullCount missing values"
      Impute.impute(df, "forward_fill")
    } else { log += "curator: no missing values"; df }
    val cleaned = Outliers.treat(Outliers.detect(cleaned0, "zscore", 4.0), "clip")
    log += "curator: clipped |z| > 4 outliers"

    // 2. plan: candidates from seasonal/trend diagnostics
    val strengths = Decomposition.strengthFeatures(cleaned, freq = 24)
      .agg(avg("trend_strength").as("t"), avg("seasonal_strength").as("s"))
      .head()
    val trendS = strengths.getDouble(0)
    val seasS = strengths.getDouble(1)
    val candidates = scala.collection.mutable.ArrayBuffer[
      (String, (DataFrame, Int) => DataFrame)]("naive" -> ((d, h) => ForecastBaselines.naive(d, h)))
    if (seasS > 0.3) {
      candidates += "seasonal_naive" -> ((d, h) => ForecastBaselines.seasonalNaive(d, h, 24))
      log += f"planner: seasonal strength $seasS%.2f → seasonal candidates"
    }
    if (trendS > 0.3) {
      candidates += "holt" -> ((d, h) => ForecastBaselines.holt(d, h))
      candidates += "theta" -> ((d, h) =>
        ForecastBaselines.multiForecast(d, h, Seq(
          "theta" -> (ys => graft.kernels.Arima.thetaForecast(ys, h))))
          .drop("model"))
      log += f"planner: trend strength $trendS%.2f → trend candidates"
    }
    candidates += "ses" -> ((d, h) => ForecastBaselines.ses(d, h))
    candidates += "moving_average" -> ((d, h) => ForecastBaselines.movingAverage(d, h, 12))
    log += s"planner: ${candidates.length} candidates: ${candidates.map(_._1).mkString(", ")}"

    // 3. forecast: backtest, pick best by MAE, refit on all data
    val comparison = Pipeline.compareModels(cleaned, candidates.toSeq, folds, horizon)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    val best = comparison.minBy(_._2)._1
    log += f"forecaster: best model $best (MAE=${comparison(best)}%.4f)"
    val fc = candidates.find(_._1 == best).get._2(cleaned, horizon)

    // 4. report
    val report = (Seq("# Forecast report", "",
      s"- candidates: ${candidates.map(_._1).mkString(", ")}",
      s"- best model: $best",
      "- backtest MAE: " + comparison.toSeq.sortBy(_._2)
        .map { case (m, e) => f"$m=$e%.4f" }.mkString(", "), "", "## log") ++
      log.map("- " + _)).mkString("\n")
    (fc, ScientistReport(candidates.map(_._1).toSeq, best, comparison, report))
  }
}
