package graft.ops

import graft.TestSpark
import graft.core.PanelCols
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Boundary semantics of the duration-window pair (polars
  * `group_by_dynamic` / `rolling_*_by` equivalents): window membership is
  * `start <= t < start + period` for the dynamic grouping, and the
  * trailing rolling window is half-open `(t − window, t]`. */
class DynamicWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  implicit private val pc: PanelCols = PanelCols("user_id", "ts", "value")

  private def ts(s: String) = Timestamp.valueOf(s)

  test("groupByDynamic: sliding membership and edge inclusion") {
    import spark.implicits._
    // one row exactly on a window start boundary
    val df = Seq((1L, ts("2024-01-01 02:00:00"), 10.0))
      .toDF("user_id", "ts", "value")
    val out = Resample.groupByDynamic(df, every = "30 minutes", period = "2 hours")
      .collect().map(r => r.getTimestamp(1)).sorted
    // member of windows starting 00:30..02:00 (start <= t < start+2h): 4 windows
    assert(out.length == 4)
    assert(out.head == ts("2024-01-01 00:30:00") && out.last == ts("2024-01-01 02:00:00"))
    // tumbling when every == period
    val t = Resample.groupByDynamic(df, every = "2 hours", period = "2 hours")
      .collect()
    assert(t.length == 1 && t.head.getTimestamp(1) == ts("2024-01-01 02:00:00"))
  }

  test("rollingByTime: half-open trailing window (t-w, t]") {
    import spark.implicits._
    val w = 3600L * 1000000 // 1h
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 11:00:00"), 2.0),  // exactly 1h after row 1: row 1 excluded
      (1L, ts("2024-01-01 11:30:00"), 4.0)   // includes 11:00 only
    ).toDF("user_id", "ts", "value")
    val out = Features.rollingByTime(df, w, aggs = Seq("mean", "count"))
      .collect()
      .map(r => r.getTimestamp(1).toString -> ((r.getDouble(3), r.getLong(4))))
      .toMap
    assert(out("2024-01-01 11:00:00.0") == (2.0, 1L),
      "row exactly window-width earlier must be EXCLUDED (half-open)")
    assert(out("2024-01-01 11:30:00.0") == (3.0, 2L))
  }
}
