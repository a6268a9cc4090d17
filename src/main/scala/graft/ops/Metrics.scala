package graft.ops

import graft.core.PanelCols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Forecast-accuracy metrics (reference polars_ts/metrics/forecast.py).
  *
  * Each metric is a single aggregate expression; `grouped` computes all of
  * them per series in ONE aggregation pass (one shuffle), vs. the
  * reference's one-pass-per-metric.
  */
object Metrics {

  def maeExpr(y: Column, yhat: Column): Column = avg(abs(y - yhat))
  def rmseExpr(y: Column, yhat: Column): Column = sqrt(avg(pow(y - yhat, 2)))
  /** MAPE over rows where y != 0 (reference filters zeros, forecast.py:75-105). */
  def mapeExpr(y: Column, yhat: Column): Column =
    avg(when(y =!= 0.0, abs((y - yhat) / y)))
  /** sMAPE with 0/0 → 0 convention. */
  def smapeExpr(y: Column, yhat: Column): Column =
    avg(when(abs(y) + abs(yhat) =!= 0.0,
      lit(2.0) * abs(y - yhat) / (abs(y) + abs(yhat))).otherwise(0.0))

  /** All four error metrics per series in one pass over (y, yhat). */
  def grouped(df: DataFrame, yCol: String, yhatCol: String)(
      implicit pc: PanelCols): DataFrame = {
    val y = col(yCol); val yhat = col(yhatCol)
    df.groupBy(pc.idCol).agg(
      maeExpr(y, yhat).as("mae"),
      rmseExpr(y, yhat).as("rmse"),
      mapeExpr(y, yhat).as("mape"),
      smapeExpr(y, yhat).as("smape"))
  }

  /** MASE: forecast MAE / in-sample seasonal-naive MAE, with the reference's
    * 0/0 → 0 and x/0 → +inf conventions (forecast.py:144-209). Takes the
    * in-sample panel (actuals) and a forecast frame joined on (id, time). */
  def mase(insample: DataFrame, forecast: DataFrame, yhatCol: String,
      seasonLength: Int = 1)(implicit pc: PanelCols): DataFrame = {
    val y = pc.targetCol
    val scale = insample
      .withColumn("__snaive", lag(y, seasonLength).over(pc.w))
      .groupBy(pc.idCol)
      .agg(avg(abs(y - col("__snaive"))).as("__scale"))
    val fcErr = forecast.join(insample.select(pc.idCol, pc.timeCol, y),
        Seq(pc.id, pc.time))
      .groupBy(pc.idCol).agg(avg(abs(y - col(yhatCol))).as("__mae"))
    fcErr.join(scale, Seq(pc.id))
      .select(pc.idCol,
        when(col("__mae") === 0.0 && col("__scale") === 0.0, 0.0)
          .when(col("__scale") === 0.0, Double.PositiveInfinity)
          .otherwise(col("__mae") / col("__scale")).as("mase"))
  }

  /** Mean pinball loss over quantile forecast columns named `q_<level>`
    * (reference crps, forecast.py:212-279). */
  def crps(df: DataFrame, yCol: String, quantileCols: Map[String, Double])(
      implicit pc: PanelCols): DataFrame = {
    val y = col(yCol)
    val pinballs = quantileCols.toSeq.sortBy(_._2).map { case (c, tau) =>
      val q = col(c)
      when(y >= q, lit(tau) * (y - q)).otherwise(lit(1.0 - tau) * (q - y))
    }
    val mean = pinballs.reduce(_ + _) / lit(pinballs.size.toDouble)
    df.groupBy(pc.idCol).agg(avg(mean).as("crps"))
  }
}
