package graft.ops

import graft.core.PanelCols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Outlier detection and treatment (reference polars_ts/outliers.py:8-181).
  *
  * zscore / iqr / rolling_zscore / hampel are all window expressions (exact
  * `percentile` for Polars-quantile parity). Appends Boolean `is_outlier`
  * plus the fence columns used by `treat`.
  */
object Outliers {

  /** Detect outliers; appends `is_outlier` (and internal fence columns
    * `__lo`/`__hi` consumed by [[treat]]). */
  def detect(df: DataFrame, method: String = "zscore", threshold: Double = 3.0,
      window: Int = 21)(implicit pc: PanelCols): DataFrame = {
    val y = pc.targetCol
    val (lo, hi): (Column, Column) = method match {
      case "zscore" =>
        val mu = avg(y).over(pc.wAll); val sd = stddev_samp(y).over(pc.wAll)
        (mu - lit(threshold) * sd, mu + lit(threshold) * sd)
      case "iqr" =>
        val q1 = percentile(y, lit(0.25)).over(pc.wAll)
        val q3 = percentile(y, lit(0.75)).over(pc.wAll)
        val iqr = q3 - q1
        (q1 - lit(1.5) * iqr, q3 + lit(1.5) * iqr)
      case "rolling_zscore" =>
        val f = pc.w.rowsBetween(-(window - 1), 0)
        val mu = avg(y).over(f); val sd = stddev_samp(y).over(f)
        (mu - lit(threshold) * sd, mu + lit(threshold) * sd)
      case "hampel" =>
        // centered rolling median ± threshold * 1.4826 * MAD — MAD needs a
        // second pass over |y - median|, done with a self-window on the
        // materialized median column.
        val half = window / 2
        val f = pc.w.rowsBetween(-half, half)
        val med = percentile(y, lit(0.5)).over(f)
        val d2 = df.withColumn("__med", med)
        val mad = percentile(abs(y - col("__med")), lit(0.5)).over(
          pc.w.rowsBetween(-half, half))
        val sigma = lit(1.4826 * threshold) * mad
        return d2.withColumn("__lo", col("__med") - sigma)
          .withColumn("__hi", col("__med") + sigma)
          .withColumn("is_outlier",
            y.isNotNull && (y < col("__lo") || y > col("__hi")))
          .drop("__med")
      case other => throw new IllegalArgumentException(
        s"Unknown method '$other'. Choose from [zscore, iqr, hampel, rolling_zscore]")
    }
    df.withColumn("__lo", lo).withColumn("__hi", hi)
      .withColumn("is_outlier", y.isNotNull && (y < lo || y > hi))
  }

  /** Replace detected outliers: clip to fences, per-series median, null, or
    * linear interpolation (reference outliers.py:101-181). Consumes the
    * columns produced by [[detect]] and drops them. */
  def treat(df: DataFrame, method: String = "clip")(implicit pc: PanelCols): DataFrame = {
    val y = pc.targetCol
    val flagged = if (df.columns.contains("is_outlier")) df else detect(df)
    val treated = method match {
      case "clip" =>
        flagged.withColumn(pc.target,
          when(col("is_outlier"), least(greatest(y, col("__lo")), col("__hi"))).otherwise(y))
      case "median" =>
        flagged.withColumn(pc.target,
          when(col("is_outlier"),
            percentile(when(!col("is_outlier"), y), lit(0.5)).over(pc.wAll)).otherwise(y))
      case "null" =>
        flagged.withColumn(pc.target, when(col("is_outlier"), lit(null)).otherwise(y))
      case "interpolate" => {
        val nulled = flagged.withColumn(pc.target,
          when(col("is_outlier"), lit(null)).otherwise(y))
        Impute.impute(nulled, "linear")
      }
      case other => throw new IllegalArgumentException(
        s"Unknown method '$other'. Choose from [clip, median, interpolate, null]")
    }
    treated.drop("__lo", "__hi")
  }
}
