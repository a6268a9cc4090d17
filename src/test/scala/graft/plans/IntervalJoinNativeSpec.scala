package graft.plans

import graft.TestSpark
import graft.ops.TemporalJoins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** The second whole-operator node: [[IntervalJoinExec]] must equal the
  * bucketed rangeJoin on randomized data (boundaries, nulls, multiple
  * overlaps), handle intervals far beyond the bucketed form's
  * explosion valve, keep the no-explosion plan shape (no Generate/
  * explode anywhere), and share the pushdown/prune rules. */
class IntervalJoinNativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private lazy val (probes, intervals): (DataFrame, DataFrame) = {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val base = ts("2024-01-01 00:00:00").getTime
    val l = (1 to 400).map { i =>
      val k: java.lang.Long =
        if (i % 19 == 0) null else (rng.nextInt(5) + 1).toLong
      val t =
        if (i % 31 == 0) null
        else new Timestamp(base + rng.nextInt(200000) * 1000L)
      (k, t, i.toLong)
    }.toDF("k", "t", "pid")
    val r = (1 to 150).map { i =>
      val k: java.lang.Long =
        if (i % 23 == 0) null else (rng.nextInt(5) + 1).toLong
      val s0 = base + rng.nextInt(180000) * 1000L
      val len = (rng.nextInt(40000) + 1) * 1000L
      val s: Timestamp =
        if (i % 29 == 0) null else new Timestamp(s0)
      // null ENDS too: the exec's null-end discard branch must agree
      // with the composed form's __etu filter
      val e: Timestamp =
        if (i % 37 == 0) null else new Timestamp(s0 + len)
      (k, s, e, i.toLong)
    }.toDF("k", "w_start", "w_end", "iid")
    (l.cache(), r.cache())
  }

  for (incl <- Seq(false, true))
    test(s"native == bucketed rangeJoin on randomized data, inclusiveEnd=$incl") {
      val bucketed = TemporalJoins.rangeJoin(probes, intervals, Seq("k"),
        "t", "w_start", "w_end", bucketUs = 3600L * 1000000L,
        inclusiveEnd = incl)
      val native = TemporalJoins.rangeJoinNative(probes, intervals, Seq("k"),
        "t", "w_start", "w_end", inclusiveEnd = incl)
      assert(native.columns.toSeq === bucketed.columns.toSeq)
      assert(canon(native) === canon(bucketed))
    }

  test("intervals beyond the bucketed form's valve are fine natively") {
    import spark.implicits._
    // a 2-year interval: at 6h buckets that is ~2920 buckets per row —
    // the bucketed form at default maxBucketsPerInterval=4096 barely
    // admits it (and duplicates each interval 2920x in the shuffle);
    // the native sweep shuffles each interval exactly once
    val l = Seq((1L, ts("2024-06-01 12:00:00"), "in"),
      (1L, ts("2027-01-01 00:00:00"), "out")).toDF("k", "t", "lv")
    val r = Seq((1L, ts("2024-01-01 00:00:00"),
      ts("2026-01-01 00:00:00"), "long")).toDF("k", "w_start", "w_end", "tag")
    val out = TemporalJoins.rangeJoinNative(l, r, Seq("k"), "t",
      "w_start", "w_end")
    val got = out.collect().map(x =>
      x.getAs[String]("lv") -> x.getAs[String]("tag"))
    assert(got.toSeq === Seq("in" -> "long"))
  }

  test("plan shape: IntervalJoin merge, no Generate/explode, per-side sorts") {
    import spark.implicits._
    val l = (1 to 50).map(i => ((i % 5).toLong,
      new Timestamp(1704067200000L + i * 1000L), i.toLong)).toDF("k", "t", "pid")
    val r = (1 to 20).map(i => ((i % 5).toLong,
      new Timestamp(1704067200000L + i * 2000L),
      new Timestamp(1704067200000L + i * 2000L + 30000L), i.toLong))
      .toDF("k", "w_start", "w_end", "iid")
    val df = TemporalJoins.rangeJoinNative(l, r, Seq("k"), "t",
      "w_start", "w_end")
    df.collect()
    val s = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(s.contains("IntervalJoin"), s)
    assert(!s.contains("Generate"), "native form must not explode intervals")
    assert(s.contains("Sort") && s.contains("Exchange"), s)
  }

  test("boundary semantics: inclusive start, exclusive end (default)") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 00:00:00"), "atStart"),
      (1L, ts("2024-01-01 01:00:00"), "atEnd"),
      (1L, ts("2024-01-01 00:30:00"), "inside")).toDF("k", "t", "lv")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"),
      "w")).toDF("k", "w_start", "w_end", "tag")
    def names(incl: Boolean) =
      TemporalJoins.rangeJoinNative(l, r, Seq("k"), "t", "w_start", "w_end",
        inclusiveEnd = incl).collect().map(_.getAs[String]("lv")).sorted.toSeq
    assert(names(false) === Seq("atStart", "inside"))
    assert(names(true) === Seq("atEnd", "atStart", "inside"))
  }

  test("stacked overlapping intervals all match a probe inside them") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 00:30:00"), "p")).toDF("k", "t", "lv")
    val r = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"), 1L),
      (1L, ts("2024-01-01 00:15:00"), ts("2024-01-01 00:45:00"), 2L),
      (1L, ts("2024-01-01 00:29:00"), ts("2024-01-01 00:31:00"), 3L),
      (1L, ts("2024-01-01 00:31:00"), ts("2024-01-01 00:32:00"), 4L))
      .toDF("k", "w_start", "w_end", "iid")
    val got = TemporalJoins.rangeJoinNative(l, r, Seq("k"), "t",
      "w_start", "w_end").collect().map(_.getAs[Long]("iid")).sorted.toSeq
    assert(got === Seq(1L, 2L, 3L))
  }

  test("overlapJoinNative == composed overlapJoin on randomized intervals") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val base = ts("2024-01-01 00:00:00").getTime
    def mk(n: Int, seedOff: Int) = (1 to n).map { i =>
      val k = (rng.nextInt(4) + 1).toLong
      val s0 = base + rng.nextInt(100000) * 1000L
      // a few zero-length (degenerate) and many equal-start intervals
      val len = if (i % 21 == 0) 0L else (rng.nextInt(30000) + 1) * 1000L
      (k, new Timestamp(s0), new Timestamp(s0 + len), (i + seedOff).toLong)
    }
    val l = mk(120, 0).toDF("k", "ls", "le", "lid")
    val r = mk(120, 1000).toDF("k", "rs", "re", "rid")
    // force some exact equal-start pairs across sides (the
    // exactly-once decomposition's boundary case)
    val l2 = l.unionByName(r.select(col("k"), col("rs").as("ls"),
      col("re").as("le"), (col("rid") + 5000L).as("lid")))
    val composed = TemporalJoins.overlapJoin(l2, r, Seq("k"),
      "ls", "le", "rs", "re", bucketUs = 3600L * 1000000L)
    val native = TemporalJoins.overlapJoinNative(l2, r, Seq("k"),
      "ls", "le", "rs", "re")
    assert(native.columns.toSeq === composed.columns.toSeq)
    assert(canon(native) === canon(composed))
  }

  test("shared rules fire: left filter pushed below, unused payload pruned") {
    import spark.implicits._
    val l = (1 to 50).map(i => ((i % 5).toLong,
      new Timestamp(1704067200000L + i * 1000L), i.toLong, s"wide$i"))
      .toDF("k", "t", "pid", "wide_l")
    val r = (1 to 20).map(i => ((i % 5).toLong,
      new Timestamp(1704067200000L + i * 2000L),
      new Timestamp(1704067200000L + i * 2000L + 30000L), i.toLong, s"v$i"))
      .toDF("k", "w_start", "w_end", "iid", "wide_r")
    val joined = TemporalJoins.rangeJoinNative(l, r, Seq("k"), "t",
      "w_start", "w_end")
    val opt = joined.filter(col("pid") < 10).select("k", "pid", "iid")
      .queryExecution.optimizedPlan
    val ij = opt.collectFirst { case n: IntervalJoin => n }.get
    assert(ij.left.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.references.exists(_.name == "pid") => f
    }.isDefined, s"pid filter not pushed:\n$opt")
    assert(!ij.left.output.exists(_.name == "wide_l"), s"wide_l not pruned:\n$opt")
    assert(!ij.payloadAttrs.exists(_.name == "wide_r"), "wide_r not pruned")
  }
}
