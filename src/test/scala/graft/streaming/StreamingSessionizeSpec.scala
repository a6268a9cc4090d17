package graft.streaming

import graft.TestSpark
import graft.ops.TemporalJoins
import graft.streaming.StreamingOps.Obs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Stream≡batch for gap sessionization: the native `session_window`
  * streaming aggregation must produce the same sessions (key, start,
  * count, sum) as the batch lag+cumsum operator, with
  * `session_end(stream) = session_end(batch) + gap` (half-open window
  * convention — see [[StreamingOps.streamingSessionize]] scaladoc).
  * Watermark discipline is exercised for real: sessions only surface in
  * append mode once the watermark passes their end. */
class StreamingSessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val base = 1704067200000L // 2024-01-01 00:00 UTC
  private def obs(id: String, mins: Long, y: Double) =
    Obs(id, new Timestamp(base + mins * 60000L), y)

  test("streaming groupByDynamic matches batch sliding windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val pc: graft.core.PanelCols =
      graft.core.PanelCols("uniqueId", "ts", "y")
    val data = (0 until 8).map(i => StreamingOps.Obs("a", new Timestamp(
      base + i * 20 * 60000L), i.toDouble)) // every 20 min over 2h20m
    val source = MemoryStream[StreamingOps.Obs]
    val out = StreamingOps.streamingGroupByDynamic(source.toDS(),
      every = "30 minutes", period = "1 hour", watermarkDelay = "0 seconds")
    val query = out.writeStream.format("memory").queryName("gbd_out")
      .outputMode("append").start()
    try {
      source.addData(data: _*)
      query.processAllAvailable()
      source.addData(StreamingOps.Obs("zf", new Timestamp(base + 86400000L), 0.0))
      query.processAllAvailable()
      val streamed = spark.table("gbd_out")
        .filter(col("uniqueId") === "a")
        .collect()
        .map(r => (r.getTimestamp(1).getTime, r.getDouble(2), r.getLong(3)))
        .sortBy(_._1)
      val batch = graft.ops.Resample.groupByDynamic(
          data.toDF("uniqueId", "ts", "y", "tie"),
          every = "30 minutes", period = "1 hour")
        .collect()
        .map(r => (r.getTimestamp(1).getTime, r.getDouble(2), r.getLong(3)))
        .sortBy(_._1)
      assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq,
        s"stream=${streamed.toSeq}\nbatch=${batch.toSeq}")
    } finally query.stop()
  }

  test("streaming session_window matches batch sessionize sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapMin = 30L
    // key a: [0,10,25] one session; [120,131] second session
    // key b: [5] single-event session
    val data = Seq(
      obs("a", 0, 1.0), obs("a", 10, 2.0), obs("a", 25, 3.0),
      obs("a", 120, 4.0), obs("a", 131, 5.0),
      obs("b", 5, 7.0))

    val source = MemoryStream[Obs]
    val out = StreamingOps.streamingSessionize(source.toDS(), gap = "30 minutes",
      watermarkDelay = "0 seconds")
    val query = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      source.addData(data: _*)
      query.processAllAvailable()
      // flush: advance the watermark far past every session end so all
      // real sessions close (the flush rows' own session stays open)
      source.addData(obs("zflush", 100000, 0.0))
      query.processAllAvailable()

      val streamed = spark.table("sess_out")
        .filter(col("uniqueId") =!= "zflush")
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4)))
        .sortBy(t => (t._1, t._2.getTime))

      val batch = TemporalJoins.sessionize(
          data.toDF("uniqueId", "ts", "y", "tie"), Seq("uniqueId"), "ts",
          gapUs = gapMin * 60000000L)
        .groupBy(col("uniqueId"), col("session_id"))
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count(lit(1)).as("n_events"), sum("y").as("sum_value"))
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(2), r.getTimestamp(3),
          r.getLong(4), r.getDouble(5)))
        .sortBy(t => (t._1, t._2.getTime))

      assert(streamed.length == 3 && batch.length == 3,
        s"expected 3 sessions, got stream=${streamed.length} batch=${batch.length}")
      streamed.zip(batch).foreach { case ((sk, ss, se, sn, sv), (bk, bs, be, bn, bv)) =>
        assert(sk == bk && ss == bs && sn == bn && math.abs(sv - bv) < 1e-12,
          s"session mismatch: stream=($sk,$ss,$sn,$sv) batch=($bk,$bs,$bn,$bv)")
        assert(se.getTime == be.getTime + gapMin * 60000L,
          s"end convention: stream=$se batch=$be + ${gapMin}m")
      }
    } finally query.stop()
  }
}
