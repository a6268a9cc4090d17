package graft.streaming

import graft.TestSpark
import graft.streaming.StreamingOps.Obs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** stream ≡ batch for the streaming EnKF: counter-based draws make the
  * keyed-state recursion independent of micro-batch boundaries, so the
  * streamed outputs must equal Bayesian.enkfLocalLevelDet BIT-FOR-BIT —
  * including across a trigger split and with a second key interleaved. */
class StreamingEnkfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def obs(id: String, h: Int, y: Double) =
    Obs(id, new Timestamp(1704067200000L + h * 3600000L), y)

  test("streaming EnKF equals the batch kernel bit-for-bit across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ysA = Array.tabulate(12)(i => math.sin(i / 3.0) * 5 + i * 0.2)
    val ysB = Array.tabulate(7)(i => 50.0 - i)
    val source = MemoryStream[Obs]
    val out = StreamingOps.streamingEnkf(source.toDS(), q = 1e-3, r = 1.0,
      nEnsemble = 30, seed = 42L)
    val query = out.writeStream.format("memory").queryName("enkf_out")
      .outputMode("append").start()
    try {
      // split series "a" across two triggers; interleave series "b"
      source.addData(ysA.take(5).zipWithIndex.map { case (y, i) => obs("a", i, y) }.toSeq: _*)
      query.processAllAvailable()
      source.addData(ysA.drop(5).zipWithIndex.map { case (y, i) => obs("a", i + 5, y) }.toSeq: _*)
      source.addData(ysB.zipWithIndex.map { case (y, i) => obs("b", i, y) }.toSeq: _*)
      query.processAllAvailable()
      val rows = spark.table("enkf_out").as[StreamingOps.EnkfOutput].collect()
      val (expAM, expAV) = graft.kernels.Bayesian.enkfLocalLevelDet(ysA, 1e-3, 1.0, 30, 42L)
      val (expBM, _) = graft.kernels.Bayesian.enkfLocalLevelDet(ysB, 1e-3, 1.0, 30, 42L)
      val gotA = rows.filter(_.uniqueId == "a").sortBy(_.ts.getTime)
      val gotB = rows.filter(_.uniqueId == "b").sortBy(_.ts.getTime)
      assert(gotA.length == 12 && gotB.length == 7)
      for (i <- ysA.indices) {
        assert(gotA(i).filtered == expAM(i),
          s"a[$i]: streamed ${gotA(i).filtered} != batch ${expAM(i)}")
        assert(gotA(i).filteredVar == expAV(i))
      }
      for (i <- ysB.indices)
        assert(gotB(i).filtered == expBM(i))
    } finally query.stop()
  }
}
