package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

/** Time-LLM / LLM-PS kernel coverage (adapters/llm_forecast.py):
  * edge-padded contexts, per-window normalization equivariance, full
  * end-to-end learning, and the bit-determinism the pinned forward
  * oracles rest on. */
class LlmForecastSpec extends AnyFunSuite {

  private val seedC = DetRng.seedConst(11L)

  private def synth(n: Int, len: Int): Seq[Array[Double]] =
    (0 until n).map { s =>
      Array.tabulate(len)(i =>
        5.0 + 2.0 * math.sin(2 * math.Pi * i / 8.0) +
          0.05 * DetRng.gauss(seedC, DetRng.ctr(35, s.toLong, i)))
    }

  private val tCfg = TimeLlm.Cfg(h = 4, inputSize = 16, patchLen = 4,
    dModel = 8, nHeads = 2, nProto = 4, maxEpochs = 25, batchSize = 16)
  private val pCfg = LlmPs.Cfg(h = 4, inputSize = 16,
    kernelSizes = Seq(3, 5), dModel = 8, maxEpochs = 25, batchSize = 16)

  test("edgeContext: tail window, edge-pad, passthrough") {
    val ys = Array(3.0, 1.0, 4.0, 1.0, 5.0)
    assert(TimeLlm.edgeContext(ys, 3).sameElements(Array(4.0, 1.0, 5.0)))
    assert(TimeLlm.edgeContext(ys, 5).sameElements(ys))
    // shorter series: np.pad mode="edge" repeats the first value
    assert(TimeLlm.edgeContext(ys, 8)
      .sameElements(Array(3.0, 3.0, 3.0, 3.0, 1.0, 4.0, 1.0, 5.0)))
  }

  test("windowStats: population std + 1e-8 floor") {
    val (mu, sd) = TimeLlm.windowStats(Array(1.0, 2.0, 3.0, 4.0))
    assert(mu == 2.5)
    assert(math.abs(sd - (math.sqrt(1.25) + 1e-8)) < 1e-15)
    val (_, sdc) = TimeLlm.windowStats(Array(7.0, 7.0))
    assert(sdc == 1e-8) // constant window stays finite
  }

  test("Time-LLM fit is deterministic (refit == pin)") {
    val xs = synth(4, 40)
    val f1 = TimeLlm.fit(xs, tCfg.copy(maxEpochs = 3))
    val f2 = TimeLlm.fit(xs, tCfg.copy(maxEpochs = 3))
    f1.proj.w.zip(f2.proj.w).foreach { case (a, b) => assert(a.sameElements(b)) }
    f1.proto.zip(f2.proto).foreach { case (a, b) => assert(a.sameElements(b)) }
    f1.wq.w.zip(f2.wq.w).foreach { case (a, b) => assert(a.sameElements(b)) }
    assert(TimeLlm.forward(f1, xs.head)
      .sameElements(TimeLlm.forward(f2, xs.head)))
  }

  test("Time-LLM training reduces window MSE and beats the naive forecast") {
    val xs = synth(6, 48)
    def mse(f: TimeLlm.Fit): Double = {
      val (xw, yw) = NBeats.buildWindows(xs, tCfg.inputSize, tCfg.h, 8192)
      xw.zip(yw).map { case (x, y) =>
        val p = TimeLlm.forward(f, x)
        p.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum / tCfg.h
      }.sum / xw.length
    }
    val early = mse(TimeLlm.fit(xs, tCfg.copy(maxEpochs = 1)))
    val late = mse(TimeLlm.fit(xs, tCfg))
    assert(late < early, s"mse $early -> $late")
    val s = xs.head
    val pred = TimeLlm.forward(TimeLlm.fit(xs, tCfg), s)
    val truthAt = (i: Int) => 5.0 + 2.0 * math.sin(2 * math.Pi * (48 + i) / 8.0)
    val mae = (0 until 4).map(i => math.abs(pred(i) - truthAt(i))).sum / 4
    val naive = (0 until 4).map(i => math.abs(s.last - truthAt(i))).sum / 4
    assert(mae < naive, s"timellm mae $mae vs naive $naive")
  }

  test("LLM-PS fit is deterministic and spec-exportable") {
    val xs = synth(4, 40)
    val f1 = LlmPs.fit(xs, pCfg.copy(maxEpochs = 3))
    val f2 = LlmPs.fit(xs, pCfg.copy(maxEpochs = 3))
    assert(TimeLlm.edgeContext(xs.head, 16).length == 16)
    assert(LlmPs.forward(f1, xs.head).sameElements(LlmPs.forward(f2, xs.head)))
    // spec shape: concat of one branch per kernel, then the 2-layer MLP
    f1.spec.head match {
      case NeuralNet.NConcat(branches) =>
        assert(branches.length == pCfg.kernelSizes.length)
      case other => fail(s"expected NConcat head, got $other")
    }
    assert(f1.spec.count(_.isInstanceOf[NeuralNet.NLinear]) == 2)
  }

  test("LLM-PS training reduces window MSE and beats the naive forecast") {
    val xs = synth(6, 48)
    def mse(f: LlmPs.Fit): Double = {
      val (xw, yw) = NBeats.buildWindows(xs, pCfg.inputSize, pCfg.h, 8192)
      xw.zip(yw).map { case (x, y) =>
        val p = LlmPs.forward(f, x)
        p.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum / pCfg.h
      }.sum / xw.length
    }
    val early = mse(LlmPs.fit(xs, pCfg.copy(maxEpochs = 1)))
    val late = mse(LlmPs.fit(xs, pCfg))
    assert(late < early, s"mse $early -> $late")
    val s = xs.head
    val pred = LlmPs.forward(LlmPs.fit(xs, pCfg), s)
    val truthAt = (i: Int) => 5.0 + 2.0 * math.sin(2 * math.Pi * (48 + i) / 8.0)
    val mae = (0 until 4).map(i => math.abs(pred(i) - truthAt(i))).sum / 4
    val naive = (0 until 4).map(i => math.abs(s.last - truthAt(i))).sum / 4
    assert(mae < naive, s"llmps mae $mae vs naive $naive")
  }

  test("per-window normalization makes eval forward affine-equivariant") {
    // forward(a·y + b) == a·forward(y) + b: the per-window stats absorb
    // any affine rescale, so the normalized net input is identical
    val xs = synth(4, 40)
    val tf = TimeLlm.fit(xs, tCfg.copy(maxEpochs = 2))
    val pf = LlmPs.fit(xs, pCfg.copy(maxEpochs = 2))
    val s = xs.head
    val scaled = s.map(v => 3.0 * v - 7.0)
    val t0 = TimeLlm.forward(tf, s)
    val t1 = TimeLlm.forward(tf, scaled)
    t0.zip(t1).foreach { case (a, b) =>
      assert(math.abs(b - (3.0 * a - 7.0)) < 1e-6, s"$a vs $b") }
    val p0 = LlmPs.forward(pf, s)
    val p1 = LlmPs.forward(pf, scaled)
    p0.zip(p1).foreach { case (a, b) =>
      assert(math.abs(b - (3.0 * a - 7.0)) < 1e-6, s"$a vs $b") }
  }
}
