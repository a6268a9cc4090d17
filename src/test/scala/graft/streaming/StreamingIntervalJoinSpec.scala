package graft.streaming

import graft.TestSpark
import graft.ops.TemporalJoins
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

object StreamingIntervalJoinSpec {
  case class Ev(k: Long, id: Long, ts: Timestamp)
}

/** Stream-stream interval join ≡ batch rangeJoin: two live MemoryStreams
  * (openers and events) joined with the native watermarked time-range
  * condition must produce the same pairs as the bucketed batch operator
  * on the union of everything fed, including matches across trigger
  * boundaries (Spark buffers the unmatched side within the watermark). */
class StreamingIntervalJoinSpec extends AnyFunSuite {
  import StreamingIntervalJoinSpec.Ev
  private lazy val spark = TestSpark.spark

  private val base = 1704067200000L
  private def ev(k: Long, id: Long, mins: Long) =
    Ev(k, id, new Timestamp(base + mins * 60000L))

  test("streaming interval join matches batch rangeJoin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val windowUs = 30L * 60 * 1000000 // 30 min

    // openers (left) and events (right), interleaved across triggers
    val openers1 = Seq(ev(1L, 100L, 0), ev(1L, 101L, 60), ev(2L, 102L, 0))
    val events1 = Seq(ev(1L, 200L, 10), ev(2L, 201L, 40))
    val events2 = Seq(ev(1L, 202L, 70), ev(1L, 203L, 95), ev(2L, 204L, 25))

    val lSrc = MemoryStream[Ev]
    val rSrc = MemoryStream[Ev]
    val out = StreamingOps.streamingIntervalJoin(
      lSrc.toDS().toDF("k", "lid", "ts"),
      rSrc.toDS().toDF("k", "rid", "ts"),
      key = "k", windowUs = windowUs, watermarkDelay = "2 hours")
    val query = out.select(col("l.lid"), col("r.rid"))
      .writeStream.format("memory").queryName("sij_out")
      .outputMode("append").start()
    try {
      lSrc.addData(openers1: _*)
      rSrc.addData(events1: _*)
      query.processAllAvailable()
      rSrc.addData(events2: _*) // cross-trigger: must match buffered openers
      query.processAllAvailable()

      val streamed = spark.table("sij_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

      val l = openers1.map(e => (e.k, e.id, e.ts, new Timestamp(
        e.ts.getTime + windowUs / 1000))).toDF("k", "lid", "w_start", "w_end")
      val r = (events1 ++ events2).map(e => (e.k, e.id, e.ts))
        .toDF("k", "rid", "ts")
      val batch = TemporalJoins.rangeJoin(r, l, Seq("k"), "ts",
          "w_start", "w_end", bucketUs = windowUs)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet

      assert(batch.nonEmpty, "fixture must produce matches")
      assert(streamed == batch,
        s"stream-minus-batch=${streamed.diff(batch)} batch-minus-stream=${batch.diff(streamed)}")
      // the cross-trigger match specifically
      assert(streamed.contains((101L, 202L)), "cross-trigger buffered match")
    } finally query.stop()
  }
}
