package graft.ops

import graft.core.PanelCols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classical seasonal decomposition + strength features (reference
  * polars_ts/decomposition/seasonal_decomposition.py:8-99,
  * seasonal_decompose_features.py:16-172). 100% native expressions:
  * centered window mean for trend, phase-group join for seasonal, window
  * variances for strengths.
  */
object Decomposition {

  /** Adds `trend`, `seasonal`, `resid` (+ optional `is_anomaly`).
    * Additive or multiplicative detrending. */
  def seasonal(df: DataFrame, freq: Int, model: String = "additive",
      anomalyK: Double = 0.0)(implicit pc: PanelCols): DataFrame = {
    require(freq >= 2, "freq must be >= 2")
    val y = pc.targetCol
    val half = (freq - 1) / 2
    val frame = pc.w.rowsBetween(-half, freq / 2)
    val cnt = count(y).over(frame)
    val trend = when(cnt >= freq, avg(y).over(frame))
    val withTrend = df
      .withColumn("__phase", pmod(row_number().over(pc.w) - 1, lit(freq)))
      .withColumn("trend", trend)
      .withColumn("__detrended",
        if (model == "additive") y - col("trend") else y / col("trend"))
    // seasonal = per-(id, phase) mean of detrended, re-centered per id
    val phaseMeans = withTrend.groupBy(pc.idCol, col("__phase"))
      .agg(avg(col("__detrended")).as("__pmean"))
    val centered = phaseMeans
      .withColumn("__smean", avg(col("__pmean")).over(pc.wAll))
      .withColumn("seasonal",
        if (model == "additive") col("__pmean") - col("__smean")
        else col("__pmean") / col("__smean"))
      .select(pc.idCol, col("__phase"), col("seasonal"))
    val out = withTrend.join(centered, Seq(pc.id, "__phase"))
      .withColumn("resid",
        if (model == "additive") col("__detrended") - col("seasonal")
        else col("__detrended") / col("seasonal"))
      .drop("__phase", "__detrended")
    if (anomalyK > 0.0)
      out.withColumn("is_anomaly",
        abs(col("resid")) > lit(anomalyK) * stddev_samp(col("resid")).over(pc.wAll))
    else out
  }

  /** Per-series `trend_strength`, `seasonal_strength`, `resid_var`
    * (seasonal_decompose_features.py 'simple' mode):
    * strength = max(0, 1 − var(resid)/var(component + resid)). */
  def strengthFeatures(df: DataFrame, freq: Int)(implicit pc: PanelCols): DataFrame = {
    val dec = seasonal(df, freq)
    dec.filter(col("trend").isNotNull && col("resid").isNotNull)
      .groupBy(pc.idCol)
      .agg(
        // trend strength: resid variance vs deseasonalized (trend + resid)
        greatest(lit(0.0),
          lit(1.0) - var_samp(col("resid")) / var_samp(col("trend") + col("resid")))
          .as("trend_strength"),
        // seasonal strength: resid variance vs detrended (seasonal + resid)
        greatest(lit(0.0),
          lit(1.0) - var_samp(col("resid")) / var_samp(col("seasonal") + col("resid")))
          .as("seasonal_strength"),
        var_samp(col("resid")).as("resid_var"))
  }
}
