package graft.ops

import graft.core.PanelCols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-bucket resampling (reference polars_ts/resampling.py:8-76).
  *
  * Downsample = `date_trunc`-bucketed groupBy (a single shuffle on
  * (id, bucket); at scale this is the natural pre-aggregation that also
  * shrinks the panel before any per-series work). Upsample = per-series
  * calendar scaffold via `sequence()` + left join + fill.
  */
object Resample {

  private val truncUnits = Set("year", "quarter", "month", "week", "day",
    "hour", "minute", "second")

  /** Downsample to `every` (a date_trunc unit) with the given aggregation. */
  def downsample(df: DataFrame, every: String, agg: String = "mean")(
      implicit pc: PanelCols): DataFrame = {
    require(truncUnits(every), s"Unsupported resample unit '$every'")
    val y = pc.targetCol
    val aggExpr = agg match {
      case "mean" => avg(y)
      case "sum" => sum(y)
      case "min" => min(y)
      case "max" => max(y)
      case "median" => percentile(y, lit(0.5))
      case "first" => min_by(y, struct(pc.orderCols: _*))
      case "last" => max_by(y, struct(pc.orderCols: _*))
      case "count" => count(y)
      case other => throw new IllegalArgumentException(s"Unsupported agg '$other'")
    }
    df.groupBy(pc.idCol, date_trunc(every, pc.timeCol).as(pc.time))
      .agg(aggExpr.as(pc.target))
  }

  /** Dynamic time grouping — polars `group_by_dynamic`: windows of
    * `period` sliding by `every` (tumbling when equal), epoch-aligned
    * (plus `offset`); a row belongs to every window with
    * `start <= t < start + period`. Spark's built-in `window()` IS this
    * operator (one shuffle on (id, window), map-side combined; a sliding
    * row replicates into period/every windows at the scan, never a
    * cross-join). Requires `every <= period` (Spark's slide constraint —
    * gapped windows compose as tumbling + filter). Output: (id, time =
    * window start, target = agg, n_obs). */
  def groupByDynamic(df: DataFrame, every: String, period: String,
      offset: String = "0 seconds", agg: String = "mean")(
      implicit pc: PanelCols): DataFrame = {
    val y = pc.targetCol
    val aggExpr = agg match {
      case "mean" => avg(y)
      case "sum" => sum(y)
      case "min" => min(y)
      case "max" => max(y)
      case "count" => count(y)
      case other => throw new IllegalArgumentException(s"Unsupported agg '$other'")
    }
    df.groupBy(pc.idCol,
        window(pc.timeCol, period, every, offset).as("__w"))
      .agg(aggExpr.as(pc.target), count(lit(1)).as("n_obs"))
      .select(pc.idCol, col("__w.start").as(pc.time), col(pc.target), col("n_obs"))
  }

  /** Upsample to a regular `stepUs`-microsecond grid per series between each
    * series' min and max timestamp, filling gaps with forward-fill or
    * linear interpolation. Pure SQL: sequence() scaffold + join + Impute. */
  def upsample(df: DataFrame, stepUs: Long, fill: String = "forward_fill")(
      implicit pc: PanelCols): DataFrame = {
    require(stepUs > 0, s"upsample: stepUs must be positive, got $stepUs")
    val grid = df.groupBy(pc.idCol)
      .agg(unix_micros(min(pc.timeCol)).as("__lo"), unix_micros(max(pc.timeCol)).as("__hi"))
      .select(pc.idCol,
        explode(sequence(col("__lo"), col("__hi"), lit(stepUs))).as("__us"))
      .select(pc.idCol, timestamp_micros(col("__us")).as(pc.time))
    val joined = grid.join(df, Seq(pc.id, pc.time), "left")
    fill match {
      case "forward_fill" | "linear" => Impute.impute(joined, fill)(
        pc.copy(tieBreak = Nil))
      case "none" => joined
      case other => throw new IllegalArgumentException(s"Unsupported fill '$other'")
    }
  }
}
