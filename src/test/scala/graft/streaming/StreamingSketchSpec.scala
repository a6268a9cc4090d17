package graft.streaming

import graft.TestSpark
import graft.ops.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sketch maintenance: a corpus arriving in micro-batches,
  * each batch's sketch merged into persisted state via foreachBatch —
  * the bounded-state ingest pattern [[Sketches.cmsMerge]]/[[hllMerge]]
  * exist for. Load-bearing claim: the folded stream state is
  * BIT-IDENTICAL to the one-shot batch sketch of the full corpus (the
  * merges are associative and commutative, so micro-batch boundaries
  * cannot show through), and the state row count never exceeds the
  * fixed bound regardless of how much text has streamed. */
class StreamingSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(range: Range): Seq[(Long, String, String)] =
    range.map { i =>
      val words = (0 until 30).map { j =>
        val r = (i * 31 + j * 17) % 90
        if (r < 30) "alpha" else if (r < 45) "beta" else s"tail${(i * 7 + j) % 97}"
      }
      (i.toLong, words.mkString(" "), if (i % 2 == 0) "web" else "books")
    }

  private def toDf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("foreachBatch-folded CMS state equals the one-shot batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = docs(0 until 120)
    var state: DataFrame = null
    val source = MemoryStream[(Long, String, String)]
    val q = source.toDS().toDF("doc_id", "text", "source").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sk = Sketches.cmsSketch(batch)
        // ALWAYS checkpoint: a foreachBatch frame is only valid within
        // its batch, so even the first batch's sketch must materialize
        state = (if (state == null) sk
          else Sketches.cmsMerge(state, sk)).localCheckpoint(true)
        ()
      }.start()
    all.grouped(40).foreach { g => source.addData(g); q.processAllAvailable() }
    q.stop()
    val streamed = state.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getAs[Long]("cnt")).toMap
    val oneShot = Sketches.cmsSketch(toDf(all)).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getAs[Long]("cnt")).toMap
    assert(streamed == oneShot)
    assert(streamed.size <= 4 * 512, "state exceeds the depth*width bound")
  }

  test("foreachBatch-folded HLL registers equal the one-shot registers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = docs(0 until 90)
    var state: DataFrame = null
    val source = MemoryStream[(Long, String, String)]
    val q = source.toDS().toDF("doc_id", "text", "source").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val regs = Sketches.hllRegisters(
          Sketches.tokens(batch, "text", Seq(col("source"))),
          "source", col("token"))
        state = (if (state == null) regs
          else Sketches.hllMerge(state, regs)).localCheckpoint(true)
        ()
      }.start()
    all.grouped(30).foreach { g => source.addData(g); q.processAllAvailable() }
    q.stop()
    val streamed = state.collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        r.getAs[Int]("max_rank")).toMap
    val oneShot = Sketches.hllRegisters(
        Sketches.tokens(toDf(all), "text", Seq(col("source"))),
        "source", col("token")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        r.getAs[Int]("max_rank")).toMap
    assert(streamed == oneShot)
    // the downstream estimate reads identically from either state
    val estS = Sketches.hllEstimate(state, "source")
      .orderBy("source").collect().map(_.toString)
    val estB = Sketches.hllEstimate(Sketches.hllRegisters(
        Sketches.tokens(toDf(all), "text", Seq(col("source"))),
        "source", col("token")), "source")
      .orderBy("source").collect().map(_.toString)
    assert(estS.sameElements(estB))
  }
}
