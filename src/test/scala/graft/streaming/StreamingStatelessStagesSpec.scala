package graft.streaming

import graft.TestSpark
import graft.ops.{Multimodal, TextOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-9 stateless stages (HTML strip, pre-tokenize, scene/audio
  * segmentation) must run UNCHANGED on a streaming DataFrame — no
  * window, no state, no watermark needed — and emit exactly the batch
  * result. This is the evidence behind the "stateless per row, hence
  * streaming-safe" claims in their docs. */
class StreamingStatelessStagesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("htmlStrip and preTokenize stream == batch, row for row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "<p>Tom &amp; Jerry</p><script>x()</script><p>don't stop</p>"),
      (2L, "plain words, 42 numbers!"),
      (3L, ""))
    val source = MemoryStream[(Long, String)]
    val streamed = TextOps.preTokenize(
      TextOps.htmlStrip(source.toDS().toDF("doc_id", "text")))
      .select(col("doc_id"), col("text"),
        array_join(col("pre_tokens"), "").as("stream_toks"))
    assert(streamed.isStreaming, "pipeline must accept a streaming frame")
    val q = streamed.writeStream.format("memory").queryName("stateless_out")
      .outputMode("append").start()
    try { source.addData(docs: _*); q.processAllAvailable() }
    finally q.stop()
    val got = spark.table("stateless_out").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val batch = TextOps.preTokenize(
      TextOps.htmlStrip(docs.toDF("doc_id", "text")))
      .select(col("doc_id"), col("text"),
        array_join(col("pre_tokens"), ""))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got == batch)
    assert(got(1L)._1 == "Tom & Jerry\ndon't stop")
  }

  test("sceneChanges and audioSegments accept streaming frames") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val video = Multimodal.y4mEncode(4, 4, "C420", Seq(
      Array.fill(24)(10.toByte), Array.fill(24)(200.toByte)))
    val wav = Multimodal.wavEncodePcm16(16000, 1,
      Array.tabulate(512)(i => if (i < 256) 0 else 16000))
    val source = MemoryStream[(Long, Array[Byte], Array[Byte])]
    val df = source.toDS().toDF("doc_id", "video", "audio")
    val scenes = Multimodal.sceneChanges(df, "video", threshold = 50.0)
    val segs = Multimodal.audioSegments(df, "audio", energyThreshold = 0.1)
    assert(scenes.isStreaming && segs.isStreaming)
    val q1 = scenes.writeStream.format("memory").queryName("scenes_out")
      .outputMode("append").start()
    val q2 = segs.writeStream.format("memory").queryName("segs_out")
      .outputMode("append").start()
    try {
      source.addData((7L, video, wav))
      q1.processAllAvailable(); q2.processAllAvailable()
    } finally { q1.stop(); q2.stop() }
    val sc = spark.table("scenes_out").orderBy("frame_index")
      .select("is_scene_change").collect().map(_.getBoolean(0)).toSeq
    assert(sc == Seq(true, true)) // frame 0 opens; the 190-luma jump cuts
    val sg = spark.table("segs_out").orderBy("frame_index")
      .select("segment_id").collect().map(_.getLong(0)).toSeq
    assert(sg == Seq(1L, 2L)) // silent frame then active frame
  }
}
