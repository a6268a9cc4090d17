package graft.ops

import graft.core.PanelCols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-value imputation (reference polars_ts/imputation.py:8-91).
  *
  * All methods are pure window expressions — shuffle once by series id,
  * then whole-stage codegen; no UDFs, no per-group collection. `linear`
  * materializes a row index, finds the nearest non-null neighbor on each
  * side with ignore-nulls windows, and interpolates arithmetically.
  */
object Impute {

  private def wBack(implicit pc: PanelCols) =
    pc.w.rowsBetween(Window.unboundedPreceding, 0)
  private def wFwd(implicit pc: PanelCols) =
    Window.partitionBy(pc.idCol).orderBy(pc.orderCols.map(_.desc): _*)
      .rowsBetween(Window.unboundedPreceding, 0)

  /** Impute `target` with the chosen method; optional `{y}_imputed` flag. */
  def impute(df: DataFrame, method: String = "forward_fill",
      addIndicator: Boolean = false, period: Int = 7)(implicit pc: PanelCols): DataFrame = {
    val y = pc.targetCol
    val out = method match {
      case "forward_fill" =>
        df.withColumn(pc.target, coalesce(y, last(y, ignoreNulls = true).over(wBack)))
      case "backward_fill" =>
        df.withColumn(pc.target, coalesce(y, last(y, ignoreNulls = true).over(wFwd)))
      case "mean" =>
        df.withColumn(pc.target, coalesce(y, avg(y).over(pc.wAll)))
      case "median" =>
        df.withColumn(pc.target, coalesce(y, percentile(y, lit(0.5)).over(pc.wAll)))
      case "linear" => linear(df)
      case "seasonal" => seasonal(df, period)
      case other => throw new IllegalArgumentException(
        s"Unknown method '$other'. Choose from [forward_fill, backward_fill, linear, mean, median, seasonal]")
    }
    if (addIndicator)
      out.withColumn(s"${pc.target}_imputed", y.isNull && col(pc.target).isNotNull)
    else out
  }

  /** Seasonal: fill from the nearest non-null observation at the SAME
    * seasonal phase (previous preferred, then next — reference
    * imputation.py seasonal mode). Windows over (id, phase). */
  private def seasonal(df: DataFrame, period: Int)(implicit pc: PanelCols): DataFrame = {
    val y = pc.targetCol
    val withPhase = df.withColumn("__phase",
      pmod(row_number().over(pc.w) - 1, lit(period)))
    val back = Window.partitionBy(pc.idCol, col("__phase"))
      .orderBy(pc.orderCols: _*).rowsBetween(Window.unboundedPreceding, 0)
    val fwd = Window.partitionBy(pc.idCol, col("__phase"))
      .orderBy(pc.orderCols.map(_.desc): _*).rowsBetween(Window.unboundedPreceding, 0)
    withPhase.withColumn(pc.target,
      coalesce(y, last(y, ignoreNulls = true).over(back),
        last(y, ignoreNulls = true).over(fwd)))
      .drop("__phase")
  }

  /** Linear interpolation between nearest non-null neighbors; endpoints
    * fall back to the nearest available value. */
  private def linear(df: DataFrame)(implicit pc: PanelCols): DataFrame = {
    val y = pc.targetCol
    val withRn = df.withColumn("__rn", row_number().over(pc.w).cast("double"))
    val rn = col("__rn")
    val prevV = last(when(y.isNotNull, y), ignoreNulls = true).over(wBack)
    val prevI = last(when(y.isNotNull, rn), ignoreNulls = true).over(wBack)
    val nextV = last(when(y.isNotNull, y), ignoreNulls = true).over(wFwd)
    val nextI = last(when(y.isNotNull, rn), ignoreNulls = true).over(wFwd)
    val interp = when(y.isNotNull, y)
      .when(prevV.isNotNull && nextV.isNotNull,
        prevV + (nextV - prevV) * (rn - prevI) / (nextI - prevI))
      .otherwise(coalesce(prevV, nextV))
    withRn.withColumn(pc.target, interp).drop("__rn")
  }
}
