package graft.streaming

import graft.TestSpark
import graft.streaming.StreamingOps.Obs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** stream ≡ batch for the streaming particle filter: counter-based draws
  * (incl. the systematic-resample positions) make the keyed recursion
  * micro-batch-split invariant, so streamed (filtered, ESS) must equal
  * Bayesian.particleFilterLocalLevelDet bit-for-bit — the split is
  * placed where resampling has already fired. */
class StreamingPfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def obs(id: String, h: Int, y: Double) =
    Obs(id, new Timestamp(1704067200000L + h * 3600000L), y)

  test("streaming particle filter equals the batch kernel across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ys = Array.tabulate(20)(i => math.cos(i / 3.0) * 8 + i * 0.5)
    val source = MemoryStream[Obs]
    val out = StreamingOps.streamingParticleFilter(source.toDS(),
      nParticles = 100, sigmaLevel = 0.5, sigmaObs = 1.0, seed = 42L)
    val query = out.writeStream.format("memory").queryName("pf_out")
      .outputMode("append").start()
    try {
      source.addData(ys.take(9).zipWithIndex.map { case (y, i) => obs("a", i, y) }.toSeq: _*)
      query.processAllAvailable()
      source.addData(ys.drop(9).zipWithIndex.map { case (y, i) => obs("a", i + 9, y) }.toSeq: _*)
      query.processAllAvailable()
      val rows = spark.table("pf_out").as[StreamingOps.PfOutput]
        .collect().sortBy(_.ts.getTime)
      val (expM, expV, expEss) = graft.kernels.Bayesian
        .particleFilterLocalLevelDet(ys, 100, 0.5, 1.0, seed = 42L)
      assert(rows.length == 20)
      for (i <- ys.indices) {
        assert(rows(i).filtered == expM(i),
          s"m[$i]: streamed ${rows(i).filtered} != batch ${expM(i)}")
        assert(rows(i).filteredVar == expV(i))
        assert(rows(i).ess == expEss(i))
      }
      // the narrow sigma forces at least one resample inside the run, so
      // the split genuinely crosses resampled state
      assert(expEss.exists(_ < 50.0), "expected a resample to fire")
    } finally query.stop()
  }
}
