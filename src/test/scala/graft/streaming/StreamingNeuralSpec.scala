package graft.streaming

import graft.TestSpark
import graft.kernels.{DetRng, NBeats}
import graft.streaming.StreamingOps.Obs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming N-BEATS inference: the bounded per-key tail buffer must
  * reproduce the batch forward on every prefix, bit-for-bit, and be
  * invariant to how the stream is split into micro-batches. */
class StreamingNeuralSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val seedC = DetRng.seedConst(13L)

  private def series(id: Int, len: Int): Array[Double] =
    Array.tabulate(len)(i =>
      8.0 + 0.3 * i + 2.0 * math.sin(2 * math.Pi * i / 6.0) +
        0.05 * DetRng.gauss(seedC, DetRng.ctr(35, id.toLong, i)))

  private def obs(id: String, h: Int, y: Double) =
    Obs(id, new Timestamp(1704067200000L + h * 3600000L), y)

  test("stream forecast == batch forward on every prefix, split-invariant") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cfg = NBeats.Cfg(h = 3, inputSize = 10, hiddenSize = 8, nBlocks = 1,
      stackTypes = Seq("trend"), maxEpochs = 5)
    val train = (0 until 4).map(series(_, 30))
    val fit = NBeats.fit(train, cfg)

    def run(name: String, splits: Seq[Range]): Map[(String, Long), Seq[Double]] = {
      val source = MemoryStream[Obs]
      val out = StreamingOps.streamingNeuralForecast(source.toDS(), fit)
      val query = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        val ys = series(0, 30)
        splits.foreach { r =>
          source.addData(r.map(i => obs("s0", i, ys(i))): _*)
          query.processAllAvailable()
        }
        spark.table(name).as[StreamingOps.NeuralFcOutput].collect()
          .map(o => (o.uniqueId, o.ts.getTime) -> o.forecast.toSeq).toMap
      } finally query.stop()
    }

    val oneShot = run("nn_fc_a", Seq(0 until 30))
    val split = run("nn_fc_b", Seq(0 until 7, 7 until 8, 8 until 21, 21 until 30))
    assert(oneShot == split, "micro-batch split changed the forecasts")

    // every prefix matches the batch forward (bounded tail loses nothing)
    val ys = series(0, 30)
    (0 until 30).foreach { i =>
      val batch = NBeats.forward(fit, ys.take(i + 1)).toSeq
      val streamed = oneShot(("s0", 1704067200000L + i * 3600000L))
      assert(streamed == batch, s"prefix $i diverged")
    }
  }

  test("streaming PatchTST matches the batch transformer forward") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cfg = graft.kernels.Transformer.PatchCfg(h = 3, inputSize = 12,
      patchLen = 4, dModel = 8, nHeads = 2, nLayers = 1, dropout = 0.0,
      maxEpochs = 3)
    val fit = graft.kernels.Transformer.patchFit((0 until 3).map(series(_, 30)), cfg)
    val source = MemoryStream[Obs]
    val out = StreamingOps.streamingPatchTstForecast(source.toDS(), fit)
    val query = out.writeStream.format("memory").queryName("pt_fc")
      .outputMode("append").start()
    try {
      val ys = series(0, 25)
      source.addData((0 until 11).map(i => obs("p0", i, ys(i))): _*)
      query.processAllAvailable()
      source.addData((11 until 25).map(i => obs("p0", i, ys(i))): _*)
      query.processAllAvailable()
      val rows = spark.table("pt_fc").as[StreamingOps.NeuralFcOutput].collect()
        .map(o => o.ts.getTime -> o.forecast.toSeq).toMap
      (0 until 25).foreach { i =>
        val batch = graft.kernels.Transformer.patchForward(fit, ys.take(i + 1)).toSeq
        assert(rows(1704067200000L + i * 3600000L) == batch, s"prefix $i diverged")
      }
    } finally query.stop()
  }
}
