package graft.ops

import graft.core.PanelCols
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series cross-validation splitters (reference
  * polars_ts/validation/splits.py:10-233). Folds are cut over DISTINCT
  * sorted time points (panel-global), not rows — matching the reference.
  * Fold boundaries are computed inside the plan (no driver collect);
  * `assignFolds` emits one row per (fold, row) with a train/test marker so
  * downstream backtests stay fully distributed.
  */
object Validation {

  /** Expanding-window folds: for fold f (0-based, k total), test = time
    * points (n − (k−f)·h, n − (k−f−1)·h], train = points ≤ n − (k−f)·h − gap.
    * Output: input columns + `fold` + `split` ('train'/'test'). */
  def expandingWindowCv(df: DataFrame, folds: Int, horizon: Int, gap: Int = 0)(
      implicit pc: PanelCols): DataFrame = {
    val times = df.select(pc.timeCol).distinct()
      .withColumn("__tidx", row_number().over(Window.orderBy(pc.timeCol)))
    val n = times.select(max(col("__tidx")).as("__nt"))
    val indexed = df.join(times, Seq(pc.time)).crossJoin(broadcast(n))
      .crossJoin(broadcast(
        df.sparkSession.range(folds.toLong).select(col("id").cast("int").as("fold"))))
    indexed
      .withColumn("__cut", col("__nt") - (lit(folds) - col("fold")) * horizon)
      .withColumn("split",
        when(col("__tidx") <= col("__cut") - gap, "train")
          .when(col("__tidx") > col("__cut") &&
            col("__tidx") <= col("__cut") + horizon, "test"))
      .filter(col("split").isNotNull)
      .drop("__tidx", "__nt", "__cut")
  }

  /** Sliding-window folds: same test windows, train = the `window` time
    * points immediately before the gap. */
  def slidingWindowCv(df: DataFrame, folds: Int, horizon: Int, window: Int,
      gap: Int = 0)(implicit pc: PanelCols): DataFrame = {
    val times = df.select(pc.timeCol).distinct()
      .withColumn("__tidx", row_number().over(Window.orderBy(pc.timeCol)))
    val n = times.select(max(col("__tidx")).as("__nt"))
    val indexed = df.join(times, Seq(pc.time)).crossJoin(broadcast(n))
      .crossJoin(broadcast(
        df.sparkSession.range(folds.toLong).select(col("id").cast("int").as("fold"))))
    indexed
      .withColumn("__cut", col("__nt") - (lit(folds) - col("fold")) * horizon)
      .withColumn("split",
        when(col("__tidx") <= col("__cut") - gap &&
          col("__tidx") > col("__cut") - gap - window, "train")
          .when(col("__tidx") > col("__cut") &&
            col("__tidx") <= col("__cut") + horizon, "test"))
      .filter(col("split").isNotNull)
      .drop("__tidx", "__nt", "__cut")
  }
}
