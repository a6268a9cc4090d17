package graft.streaming

import graft.TestSpark
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming MinHash near-dup novelty: per arriving doc, how many LSH
  * band keys are first-seen. Load-bearing: the streamed novelty counts
  * equal a batch replay of the same signatures against arrival order
  * (exact twin, no probabilistic slack), exact dups emit no row, and the
  * chained stateful plan (dedup → windowed agg) emits once watermarks
  * close the windows. */
class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val bands = 16
  private val rowsPerBand = 4

  /** Batch twin: per doc in arrival order, novel-band count against all
    * earlier docs' band keys (the dropDuplicates state, replayed). */
  private def expectedNovelty(texts: Seq[(Long, String)]): Map[Long, Long] = {
    import spark.implicits._
    val sigs = texts.toDF("doc_id", "text")
      .select(col("doc_id"),
        Dedup.minhashSigFromText(col("text"), 5, bands * rowsPerBand).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val seen = scala.collection.mutable.Set.empty[(Int, Long, Long)]
    texts.map { case (id, _) =>
      val sig = sigs(id)
      var novel = 0L
      for (b <- 0 until bands) {
        val k0 = sig(b * rowsPerBand) * 2147483648L + sig(b * rowsPerBand + 1)
        val k1 = sig(b * rowsPerBand + 2) * 2147483648L + sig(b * rowsPerBand + 3)
        if (seen.add((b, k0, k1))) novel += 1
      }
      id -> novel
    }.toMap
  }

  test("streamed novelty equals the batch arrival-order replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and again", // exact dup
      3L -> "a completely different document about spark physical plans",
      4L -> "the quick brown fox jumps over the lazy dog again and anew") // near-dup
    val expected = expectedNovelty(texts)
    assert(expected(2L) == 0L, "exact dup must have zero novel bands")
    assert(expected(3L) == bands.toLong, "distinct doc is fully novel")
    assert(expected(4L) < bands.toLong, "near-dup shares at least one band")

    val source = MemoryStream[StreamingOps.Doc]
    val out = StreamingOps.streamingNearDupNovelty(source.toDS(),
      bands, rowsPerBand, shingleN = 5,
      watermarkDelay = "30 minutes", windowLength = "1 minute")
    val query = out.writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      // one trigger per doc: cross-trigger state makes suppression
      // deterministic; each doc sits in its own 1-minute window
      texts.zipWithIndex.foreach { case ((id, t), i) =>
        source.addData(StreamingOps.Doc(id,
          new Timestamp(86400000L + i * 60000L), t))
        query.processAllAvailable()
      }
      // flusher far in the future: advances the watermark (minus the
      // 30-minute delay that keeps the dedup state alive across the
      // test docs) past every window end so the chained windowed
      // aggregation emits
      source.addData(StreamingOps.Doc(99L,
        new Timestamp(86400000L + 86400000L), "flusher doc text here"))
      query.processAllAvailable()
      val streamed = spark.table("neardup_out")
        .select("doc_id", "novel_bands", "is_novel").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      // docs with zero novel bands emit nothing
      assert(!streamed.contains(2L), "exact dup must be fully suppressed")
      assert(streamed(1L) == (bands.toLong, true))
      assert(streamed(3L) == (bands.toLong, true))
      assert(streamed(4L) == (expected(4L), false))
    } finally query.stop()
  }
}
