package graft.streaming

import graft.TestSpark
import graft.ops.{Jpeg, Multimodal}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class MediaRow(doc_id: Long, payload: Array[Byte])

/** The multimodal curation funnel is a stateless narrow map, so its
  * streaming twin is the SAME operator applied to a stream — this spec
  * pins stream ≡ batch over payloads exercising all four branches
  * (real PNG / real JPEG / real WAV / opaque). */
class StreamingMediaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pngPayload(seed: Int): Array[Byte] = {
    val (w, h) = (12, 9)
    val px = Array.tabulate(w * h)(i => ((seed * 31 + i * 97) % 256).toByte)
    Multimodal.pngEncode(w, h, 1, px)
  }

  private def jpegPayload(seed: Int): Array[Byte] = {
    val (w, h) = (17, 11) // 3x2 blocks
    val grid = Array.tabulate(6) { i =>
      val b = new Array[Int](64); b(0) = ((seed * 7 + i * 13) % 111) - 55; b
    }
    Jpeg.encodeFromCoeffs(w, h, Seq(grid), Seq((1, 1)))
  }

  private def wavPayload(seed: Int, n: Int): Array[Byte] =
    Multimodal.wavEncodePcm16(8000, 1,
      Array.tabulate(n)(i => ((seed * 131 + i * 7919) % 65536) - 32768))

  test("streaming mediaFunnel == batch mediaFunnel, all four branches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      MediaRow(1L, pngPayload(3)),
      MediaRow(2L, jpegPayload(5)),
      MediaRow(3L, wavPayload(7, 240)),  // long enough to keep
      MediaRow(4L, wavPayload(9, 60)),   // too short — dropped
      MediaRow(5L, "plain text, not a container".getBytes("UTF-8")),
      MediaRow(6L, Array.emptyByteArray))

    val batch = Multimodal.mediaFunnel(rows.toDF(), "payload")
      .select("doc_id", "media_type", "n_units", "stat", "keep")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getBoolean(4))).sortBy(_._1)

    val source = MemoryStream[MediaRow]
    val out = Multimodal.mediaFunnel(source.toDF(), "payload")
      .select("doc_id", "media_type", "n_units", "stat", "keep")
    val query = out.writeStream.format("memory").queryName("media_out")
      .outputMode("append").start()
    try {
      source.addData(rows.take(3): _*)
      query.processAllAvailable()
      source.addData(rows.drop(3): _*)
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.table("media_out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getBoolean(4))).sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq)
    // branch sanity: the fixture really exercised every media type
    assert(batch.map(_._2).toSet == Set("png", "jpeg", "wav", "opaque"))
    assert(batch.count(_._5) >= 2, "fixture must keep at least png+jpeg")
    assert(!batch.find(_._1 == 4L).get._5, "short wav must drop")
  }

  test("streaming extractFrames == batch (stateless explode twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def y4m(seed: Int, nf: Int): Array[Byte] = {
      val fb = 8 * 6 * 3 / 2
      Multimodal.y4mEncode(8, 6, "C420", (0 until nf).map(f =>
        Array.tabulate(fb)(i => ((seed * 31 + f * 13 + i * 7) % 256).toByte)))
    }
    val rows = Seq(
      MediaRow(1L, y4m(3, 5)),
      MediaRow(2L, y4m(9, 1)),
      MediaRow(3L, "not a video".getBytes("UTF-8"))) // yields no frames
    val cols = Seq("doc_id", "frame_index", "y_sum", "c_sum", "y_min", "y_max")
    val batch = Multimodal.extractFrames(rows.toDF(), "payload", stride = 2)
      .select(cols.head, cols.tail: _*)
      .collect().map(_.toSeq).sortBy(_.toString)
    val source = MemoryStream[MediaRow]
    val query = Multimodal.extractFrames(source.toDF(), "payload", stride = 2)
      .select(cols.head, cols.tail: _*)
      .writeStream.format("memory").queryName("frames_out")
      .outputMode("append").start()
    try {
      source.addData(rows: _*)
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("frames_out")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(streamed.toSeq == batch.toSeq)
    assert(batch.length == 4, "5-frame stride-2 doc + 1-frame doc = 3+1 rows")
  }
}
