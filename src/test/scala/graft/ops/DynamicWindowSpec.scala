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

  test("ewmFeatures: adjusted matches closed form, unadjusted matches recursion") {
    import spark.implicits._
    val ys = Seq(1.0, 4.0, 2.0, 8.0, 3.0)
    val a = 0.4
    val df = ys.zipWithIndex.map { case (y, i) =>
      (1L, ts(f"2024-01-01 00:0$i:00"), y)
    }.toDF("user_id", "ts", "value")
    val adj = Features.ewmFeatures(df, a).collect()
      .sortBy(_.getTimestamp(1).getTime).map(r => (r.getDouble(2), r.getDouble(3)))
    // closed form: m_t = Σ(1-a)^(t-i) y_i / Σ(1-a)^(t-i)
    ys.indices.foreach { t =>
      val w = (0 to t).map(i => math.pow(1 - a, t - i))
      val m = w.zip(ys).map { case (wi, yi) => wi * yi }.sum / w.sum
      val v = math.max(
        w.zip(ys).map { case (wi, yi) => wi * yi * yi }.sum / w.sum - m * m, 0.0)
      assert(math.abs(adj(t)._1 - m) < 1e-12, s"adjusted mean at $t")
      assert(math.abs(adj(t)._2 - v) < 1e-12, s"adjusted var at $t")
    }
    val un = Features.ewmFeatures(df, a, adjust = false).collect()
      .sortBy(_.getTimestamp(1).getTime).map(_.getDouble(2))
    val expect = ys.tail.scanLeft(ys.head)((m, y) => (1 - a) * m + a * y)
    un.zip(expect).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
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
