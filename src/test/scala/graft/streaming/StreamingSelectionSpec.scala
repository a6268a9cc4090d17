package graft.streaming

import graft.TestSpark
import graft.ops.Selection
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stateless streaming inference for the data-selection tier: the
  * offline-fit quality classifier and DSIR model score a live document
  * feed per-row (broadcast model, no state, no shuffle). Load-bearing:
  * stream output ≡ the batch scorer on the same documents (same grams,
  * buckets, arithmetic), and unseen-bucket docs score via the Laplace
  * default instead of crashing. */
class StreamingSelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus() = {
    import spark.implicits._
    val code = Vector("spark", "query", "join", "shuffle", "plan", "agg")
    val cook = Vector("butter", "flour", "oven", "stir", "bake", "salt")
    (0 until 40).map { i =>
      val vocab = if (i % 2 == 0) code else cook
      val words = (0 until 20).map(j => vocab((i * 7 + j * 5) % vocab.size))
      (i.toLong, words.mkString(" "), i % 2 == 0)
    }.toDF("doc_id", "text", "is_target")
  }

  test("streaming classifier score equals the batch scorer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val df = corpus()
    val m = Selection.textClassifierFit(df, col("is_target"), buckets = 64,
      sampleCap = 40)
    val batch = Selection.textClassifierScore(df, m).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val source = MemoryStream[(Long, String)]
    val out = StreamingOps.streamingClassifierScore(
      source.toDS().toDF("doc_id", "text"), m)
      .select("doc_id", "n_grams", "quality_prob")
    val query = out.writeStream.format("memory").queryName("clf_out")
      .outputMode("append").start()
    try {
      val rows = df.select("doc_id", "text").as[(Long, String)].collect()
      source.addData(rows.take(20): _*)
      query.processAllAvailable()
      source.addData(rows.drop(20): _*)
      query.processAllAvailable()
      val streamed = spark.table("clf_out").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (id, (n, p)) =>
        assert(n == batch(id)._1, s"doc $id gram count")
        assert(math.abs(p - batch(id)._2) < 1e-9,
          s"doc $id stream $p vs batch ${batch(id)._2}")
      }
    } finally query.stop()
  }

  test("streaming DSIR score equals batch weights; empty docs emit null") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val df = corpus()
    val llr = Selection.dsirModelArray(df, col("is_target"), buckets = 64)
    val batch = Selection.dsirWeights(df, col("is_target"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

    val source = MemoryStream[(Long, String)]
    val out = StreamingOps.streamingDsirScore(
      source.toDS().toDF("doc_id", "text"), llr)
      .select("doc_id", "n_grams", "log_w")
    val query = out.writeStream.format("memory").queryName("dsir_out")
      .outputMode("append").start()
    try {
      val rows = df.select("doc_id", "text").as[(Long, String)].collect()
      source.addData(rows: _*)
      source.addData((100L, ""), (101L, "987 654")) // gram-less
      query.processAllAvailable()
      val streamed = spark.table("dsir_out").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      df.select("doc_id").as[Long].collect().foreach { id =>
        assert(math.abs(streamed(id).get - batch(id)) < 1e-9, s"doc $id")
      }
      assert(streamed(100L).isEmpty && streamed(101L).isEmpty,
        "gram-less docs must emit null, not crash or zero")
    } finally query.stop()
  }

  test("streaming KN score equals batch perplexity; fresh vocab finite") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val df = corpus()
    val m = graft.ops.TextOps.knModelFit(df, buckets = 256)
    val batch = graft.ops.TextOps.knPerplexity(df, buckets = 256)
      .filter(col("n_bigrams") > 0)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("ppl"))).toMap

    val source = MemoryStream[(Long, String)]
    val out = StreamingOps.streamingKnScore(
      source.toDS().toDF("doc_id", "text"), m)
      .select("doc_id", "n_bigrams", "ppl")
    val query = out.writeStream.format("memory").queryName("kn_out")
      .outputMode("append").start()
    try {
      source.addData(df.select("doc_id", "text").as[(Long, String)].collect(): _*)
      source.addData((300L, "zyzzyva qoph xylem wort"), (301L, "single"))
      query.processAllAvailable()
      val streamed = spark.table("kn_out").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None
           else Some((r.getLong(1), r.getDouble(2))))).toMap
      batch.foreach { case (id, (n, ppl)) =>
        val (sn, sppl) = streamed(id).get
        assert(sn == n, s"doc $id bigram count")
        assert(math.abs(sppl - ppl) < 1e-9, s"doc $id stream $sppl vs $ppl")
      }
      val (fn, fppl) = streamed(300L).get
      assert(fn == 3L && !fppl.isNaN && !fppl.isInfinite && fppl > 1.0,
        s"fresh-vocab doc must score finite, got $fppl")
      assert(streamed(301L).isEmpty, "bigram-less doc emits nulls")
    } finally query.stop()
  }

  test("unseen-vocabulary docs score via the Laplace default") {
    import spark.implicits._
    val df = corpus()
    val llr = Selection.dsirModelArray(df, col("is_target"), buckets = 64)
    // a doc of words never seen at fit time still gets a finite score
    val fresh = Seq((200L, "zyzzyva qoph xylem")).toDF("doc_id", "text")
    val out = StreamingOps.streamingDsirScore(fresh, llr).collect()
    assert(out.length == 1)
    val lw = out(0).getAs[Double]("log_w")
    assert(!lw.isNaN && !lw.isInfinite, s"got $lw")
  }
}
