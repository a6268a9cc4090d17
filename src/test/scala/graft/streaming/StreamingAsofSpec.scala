package graft.streaming

import graft.TestSpark
import graft.ops.TemporalJoins
import graft.streaming.StreamingOps.{AsofOut, TaggedObs}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Stream≡batch for the as-of enrichment: on per-key in-order delivery
  * (the operator's documented contract) the streamed output must equal
  * the batch `asofJoin(direction = backward)` row for row, including
  * equal-timestamp inclusivity and cross-trigger state carry. */
class StreamingAsofSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val base = 1704067200000L
  private def tob(id: String, mins: Long, right: Boolean, y: Double) =
    TaggedObs(id, new Timestamp(base + mins * 60000L), right, y)

  test("streaming as-of enrich matches batch asofJoin on in-order data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // trigger 1: key a gets a right at 0 and a left at 5 (matches 0),
    //            plus an equal-ts pair at 10 (right must win: inclusive)
    val batch1 = Seq(
      tob("a", 0, right = true, 100.0),
      tob("a", 5, right = false, 1.0),
      tob("a", 10, right = true, 200.0),
      tob("a", 10, right = false, 2.0),
      tob("b", 3, right = false, 9.0)) // no right yet: unmatched
    // trigger 2: state carry — left at 20 must still see the right at 10
    val batch2 = Seq(
      tob("a", 20, right = false, 3.0),
      tob("a", 25, right = true, 300.0),
      tob("a", 30, right = false, 4.0))

    val source = MemoryStream[TaggedObs]
    val out = StreamingOps.streamingAsofEnrich(source.toDS())
    val query = out.writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      source.addData(batch1: _*)
      query.processAllAvailable()
      source.addData(batch2: _*)
      query.processAllAvailable()

      val streamed = spark.table("asof_out").as[AsofOut].collect()
        .map(o => (o.uniqueId, o.ts.getTime, o.y,
          o.asofTs.map(_.getTime), o.asofY))
        .sortBy(t => (t._1, t._2))

      val all = batch1 ++ batch2
      val lefts = all.filter(!_.isRight)
        .map(o => (o.uniqueId, o.ts, o.y)).toDF("uniqueId", "ts", "y")
      val rights = all.filter(_.isRight)
        .map(o => (o.uniqueId, o.ts, o.y)).toDF("uniqueId", "ts", "rv")
      val batch = TemporalJoins.asofJoin(lefts, rights, Seq("uniqueId"),
          "ts", "ts", Seq("rv"))
        .collect()
        .map(r => (r.getAs[String]("uniqueId"), r.getAs[Timestamp]("ts").getTime,
          r.getAs[Double]("y"),
          Option(r.getAs[Timestamp]("asof_ts")).map(_.getTime),
          Option(r.getAs[java.lang.Double]("rv")).map(_.doubleValue)))
        .sortBy(t => (t._1, t._2))

      assert(streamed.length == 5)
      assert(streamed.toSeq == batch.toSeq,
        s"stream=${streamed.toSeq}\nbatch=${batch.toSeq}")
      // the load-bearing rows, asserted explicitly
      val m = streamed.map(t => (t._1, t._2) -> (t._4, t._5)).toMap
      assert(m(("a", base + 10 * 60000L)) ==
        (Some(base + 10 * 60000L), Some(200.0)), "equal-ts right must match")
      assert(m(("a", base + 20 * 60000L)) ==
        (Some(base + 10 * 60000L), Some(200.0)), "state must carry across triggers")
      assert(m(("b", base + 3 * 60000L)) == (None, None))
    } finally query.stop()
  }
}
