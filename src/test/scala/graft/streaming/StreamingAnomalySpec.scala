package graft.streaming

import graft.TestSpark
import graft.streaming.StreamingOps.Obs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** stream ≡ batch for the streaming NIG anomaly scorer (deterministic
  * recursion, no draws): streamed p-values must equal
  * Bayesian.nigPValues bit-for-bit across a trigger split, and a planted
  * outlier after warmup must flag. */
class StreamingAnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def obs(id: String, h: Int, y: Double) =
    Obs(id, new Timestamp(1704067200000L + h * 3600000L), y)

  test("streaming NIG anomaly equals the batch recursion across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ys = Array.tabulate(25)(i => 10.0 + math.sin(i / 2.0)) // calm series
    ys(18) = 60.0 // planted spike after warmup
    val source = MemoryStream[Obs]
    val out = StreamingOps.streamingNigAnomaly(source.toDS(), threshold = 0.01)
    val query = out.writeStream.format("memory").queryName("anom_out")
      .outputMode("append").start()
    try {
      source.addData(ys.take(12).zipWithIndex.map { case (y, i) => obs("a", i, y) }.toSeq: _*)
      query.processAllAvailable()
      source.addData(ys.drop(12).zipWithIndex.map { case (y, i) => obs("a", i + 12, y) }.toSeq: _*)
      query.processAllAvailable()
      val rows = spark.table("anom_out").as[StreamingOps.AnomalyOutput]
        .collect().sortBy(_.ts.getTime)
      val expected = graft.kernels.Bayesian.nigPValues(ys)
      assert(rows.length == 25)
      for (i <- ys.indices)
        assert(rows(i).pValue == expected(i),
          s"p[$i]: streamed ${rows(i).pValue} != batch ${expected(i)}")
      assert(rows(18).isAnomaly, "planted spike must flag")
      assert(rows.count(_.isAnomaly) <= 3, "calm series stays mostly quiet")
    } finally query.stop()
  }
}
