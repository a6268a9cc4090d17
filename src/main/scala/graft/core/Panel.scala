package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Column-name configuration for long-format panels.
  *
  * Mirrors the reference's ubiquitous `id_col` / `time_col` / `target_col`
  * kwargs (defaults `unique_id` / `ds` / `y`). `tieBreak` names extra
  * columns appended to every time ordering so that row order is total even
  * when timestamps collide — Spark window functions over a non-total order
  * are nondeterministic, which the reference never has to worry about
  * (Polars preserves input row order).
  */
case class PanelCols(
    id: String = "unique_id",
    time: String = "ds",
    target: String = "y",
    tieBreak: Seq[String] = Nil) {

  def idCol: Column = col(id)
  def timeCol: Column = col(time)
  def targetCol: Column = col(target)
  def orderCols: Seq[Column] = col(time) +: tieBreak.map(col)

  /** Per-series window ordered by time (plus tie-breaks). */
  def w: WindowSpec = Window.partitionBy(col(id)).orderBy(orderCols: _*)
  /** Per-series window over the full partition (no ordering / frame). */
  def wAll: WindowSpec = Window.partitionBy(col(id))
}

object Panel {

  /** Constant-zero partition key for windows over BOUNDED tiny frames
    * (≤|models|, ≤|bins|, ≤|domains| rows — never panel- or corpus-
    * sized). Declares the single partition intentional: a bare
    * `Window.orderBy` logs WindowExec's missing-partition warning, and a
    * foldable `lit(0)` is constant-folded out of the partition spec and
    * warns anyway — so derive 0 non-foldably from any column. Execution
    * is identical (one partition either way); the point is that every
    * REMAINING single-partition window in the engine is one that names a
    * column and asserts boundedness at the call site. */
  def tinyFramePartition(c: Column): Column = pmod(crc32(c.cast("string")), lit(1))

  /** Canonical scale partitioning contract: one shuffle by series id up
    * front, after which every window operator is shuffle-free. On a real
    * cluster pair this with enough partitions that a single series' rows
    * fit an executor; here it documents intent and lets AQE coalesce.
    */
  def repartitionBySeries(df: DataFrame, partitions: Int = 0)(implicit pc: PanelCols): DataFrame = {
    val p = if (partitions > 0) df.repartition(partitions, pc.idCol) else df.repartition(pc.idCol)
    p.sortWithinPartitions(pc.idCol +: pc.orderCols: _*)
  }

  /** Grouped/nested form: one row per series, values time-ordered.
    *
    * `sort_array(collect_list(struct(ds, tiebreaks..., y)))` guarantees a
    * deterministic time order — a bare `collect_list` is NOT
    * order-deterministic in Spark (SURVEY §7.5 risk #1). Output:
    * `[id, ys: Array[Double], ts: Array[Timestamp]]`.
    */
  def grouped(df: DataFrame)(implicit pc: PanelCols): DataFrame = {
    val fields = (pc.timeCol.as("__t") +: pc.tieBreak.zipWithIndex.map {
      case (c, i) => col(c).as(s"__tb$i")
    }) :+ pc.targetCol.cast("double").as("__v")
    df.groupBy(pc.idCol)
      .agg(sort_array(collect_list(struct(fields: _*))).as("__pts"))
      .select(pc.idCol, col("__pts.__v").as("ys"), col("__pts.__t").as("ts"))
  }

  /** Per-series inferred frequency = min successive time delta, in
    * microseconds (reference `_infer_freq`, models/_time_utils.py:15-27).
    * Output: `[id, last_ts, freq_us, n]`.
    */
  def seriesMeta(df: DataFrame)(implicit pc: PanelCols): DataFrame = {
    val tsUs = unix_micros(pc.timeCol.cast("timestamp"))
    df.select(pc.idCol, tsUs.as("__us"))
      .withColumn("__delta", col("__us") - lag("__us", 1).over(
        Window.partitionBy(pc.idCol).orderBy(col("__us"))))
      .groupBy(pc.idCol)
      .agg(
        max(col("__us")).as("last_us"),
        min(col("__delta")).as("freq_us"),
        count(lit(1)).as("n"))
  }

  /** Explode h future steps per series with timestamps extrapolated at the
    * inferred frequency: `[id, step (1-based), ds]`. Pure Spark SQL —
    * `explode(sequence(...))`, no driver loop. */
  def futureDates(df: DataFrame, h: Int)(implicit pc: PanelCols): DataFrame =
    seriesMeta(df)
      .select(pc.idCol, col("last_us"), col("freq_us"),
        explode(sequence(lit(1L), lit(h.toLong))).as("step"))
      .withColumn(pc.time,
        timestamp_micros(col("last_us") + col("step") * col("freq_us"))
          .cast("timestamp_ntz"))
      .select(pc.idCol, col("step"), col(pc.time))
}
