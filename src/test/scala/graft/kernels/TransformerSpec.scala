package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

/** Transformer kernel coverage: layernorm/softmax math, full PatchTST
  * end-to-end learning + determinism, and eval-path self-consistency
  * (the properties the forward-replay oracle rests on). */
class TransformerSpec extends AnyFunSuite {

  private val seedC = DetRng.seedConst(9L)

  test("layerNorm normalizes and applies affine") {
    val x = Array(1.0, 2.0, 3.0, 4.0)
    val y = Transformer.layerNorm(x, Array.fill(4)(1.0), Array.fill(4)(0.0))
    assert(math.abs(y.sum) < 1e-12)
    val n = y.map(v => v * v).sum / 4
    assert(math.abs(n - 1.0) < 1e-4) // eps makes it slightly < 1
    val y2 = Transformer.layerNorm(x, Array.fill(4)(2.0), Array.fill(4)(1.0))
    y.zip(y2).foreach { case (a, b) => assert(math.abs(b - (2 * a + 1)) < 1e-12) }
  }

  test("softmax rows sum to one and order by score") {
    val p = Transformer.softmax(Array(1.0, 3.0, 2.0))
    assert(math.abs(p.sum - 1.0) < 1e-12)
    assert(p(1) > p(2) && p(2) > p(0))
  }

  private def synth(n: Int, len: Int): Seq[Array[Double]] =
    (0 until n).map { s =>
      Array.tabulate(len)(i =>
        5.0 + 2.0 * math.sin(2 * math.Pi * i / 8.0) +
          0.05 * DetRng.gauss(seedC, DetRng.ctr(34, s.toLong, i)))
    }

  private val cfg = Transformer.PatchCfg(h = 4, inputSize = 16, patchLen = 4,
    dModel = 8, nHeads = 2, nLayers = 1, dropout = 0.0, maxEpochs = 25,
    batchSize = 16)

  test("PatchTST fit is deterministic (refit == pin)") {
    val xs = synth(4, 40)
    val f1 = Transformer.patchFit(xs, cfg.copy(maxEpochs = 3))
    val f2 = Transformer.patchFit(xs, cfg.copy(maxEpochs = 3))
    f1.proj.w.zip(f2.proj.w).foreach { case (a, b) => assert(a.sameElements(b)) }
    f1.enc.layers.zip(f2.enc.layers).foreach { case (a, b) =>
      a.wq.w.zip(b.wq.w).foreach { case (r1, r2) => assert(r1.sameElements(r2)) }
      assert(a.ln1g.sameElements(b.ln1g))
    }
    val p1 = Transformer.patchForward(f1, xs.head)
    val p2 = Transformer.patchForward(f2, xs.head)
    assert(p1.sameElements(p2))
  }

  test("PatchTST training reduces window MSE and beats the naive forecast") {
    val xs = synth(6, 48)
    def mse(f: Transformer.PatchFit): Double = {
      val (xw, yw) = NBeats.buildWindows(xs, cfg.inputSize, cfg.h, 8192)
      xw.zip(yw).map { case (x, y) =>
        val p = Transformer.patchForward(f, x)
        p.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum / cfg.h
      }.sum / xw.length
    }
    val early = mse(Transformer.patchFit(xs, cfg.copy(maxEpochs = 1)))
    val late = mse(Transformer.patchFit(xs, cfg))
    assert(late < early, s"mse $early -> $late")
    // against seasonal structure, must beat repeat-last
    val s = xs.head
    val fit = Transformer.patchFit(xs, cfg)
    val pred = Transformer.patchForward(fit, s)
    val truthAt = (i: Int) => 5.0 + 2.0 * math.sin(2 * math.Pi * (48 + i) / 8.0)
    val mae = (0 until 4).map(i => math.abs(pred(i) - truthAt(i))).sum / 4
    val naive = (0 until 4).map(i => math.abs(s.last - truthAt(i))).sum / 4
    assert(mae < naive, s"patchtst mae $mae vs naive $naive")
  }

  test("dropout training still deterministic and learns") {
    val xs = synth(4, 40)
    val cfgD = cfg.copy(dropout = 0.1, maxEpochs = 5)
    val f1 = Transformer.patchFit(xs, cfgD)
    val f2 = Transformer.patchFit(xs, cfgD)
    val p1 = Transformer.patchForward(f1, xs.head)
    assert(p1.sameElements(Transformer.patchForward(f2, xs.head)))
    assert(p1.forall(v => !v.isNaN))
  }

  test("multivariate fits are deterministic and learn coupled structure") {
    // two coupled variables: v1 = sin wave, v2 = lagged copy
    val len = 64
    val mat = Array.tabulate(len, 2) { (i, v) =>
      if (v == 0) 3.0 * math.sin(2 * math.Pi * i / 8.0)
      else 3.0 * math.sin(2 * math.Pi * (i - 2) / 8.0) + 1.0
    }
    val cfg = Transformer.MvCfg(h = 4, inputSize = 16, patchLen = 4,
      dModel = 8, nHeads = 2, nLayers = 1, dropout = 0.0, maxEpochs = 20,
      batchSize = 16)
    for (kind <- Seq("mvpatch", "itransformer")) {
      val f1 = Transformer.mvFit(Seq(mat), cfg, kind)
      val f2 = Transformer.mvFit(Seq(mat), cfg, kind)
      val p1 = Transformer.mvForward(f1, mat)
      val p2 = Transformer.mvForward(f2, mat)
      assert(p1.flatten[Double].sameElements(p2.flatten[Double]),
        s"$kind nondeterministic")
      // must beat repeat-last on the seasonal structure
      val truth = Array.tabulate(4, 2)((t, v) =>
        if (v == 0) 3.0 * math.sin(2 * math.Pi * (len + t) / 8.0)
        else 3.0 * math.sin(2 * math.Pi * (len + t - 2) / 8.0) + 1.0)
      val mae = (for (t <- 0 until 4; v <- 0 until 2)
        yield math.abs(p1(t)(v) - truth(t)(v))).sum / 8
      val naive = (for (t <- 0 until 4; v <- 0 until 2)
        yield math.abs(mat(len - 1)(v) - truth(t)(v))).sum / 8
      assert(mae < naive, s"$kind mae $mae vs naive $naive")
    }
  }

  test("different seeds give different fits; invalid configs fail loudly") {
    val xs = synth(4, 40)
    val f1 = Transformer.patchFit(xs, cfg.copy(maxEpochs = 2))
    val f2 = Transformer.patchFit(xs, cfg.copy(maxEpochs = 2, seed = 43L))
    assert(!Transformer.patchForward(f1, xs.head)
      .sameElements(Transformer.patchForward(f2, xs.head)))
    // input_size not divisible by patch_len → loud failure (reference
    // patchtst.py:47-49 raises the same)
    intercept[IllegalArgumentException] {
      Transformer.patchFit(xs, cfg.copy(inputSize = 15))
    }
    // series too short for any window → loud failure
    intercept[IllegalArgumentException] {
      Transformer.patchFit(Seq(Array(1.0, 2.0)), cfg)
    }
  }

  test("mvContext pads leading rows with zeros") {
    val short = Array(Array(1.0, 2.0), Array(3.0, 4.0))
    val c = Transformer.mvContext(short, 4, 2)
    assert(c(0).sameElements(Array(0.0, 0.0)) && c(1).sameElements(Array(0.0, 0.0)))
    assert(c(2).sameElements(Array(1.0, 2.0)) && c(3).sameElements(Array(3.0, 4.0)))
  }

  test("encode matches a hand-rolled single-layer attention on tiny input") {
    // identity-ish check: with 1 head, q=k=v=identity weights and zero
    // ff, the encoder output equals layernorm twice around attention
    val d = 2
    val id = Transformer.Dense(Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0),
      Array.fill(d)(0.0))
    val zero = Transformer.Dense(Array.fill(d, d)(0.0), Array.fill(d)(0.0))
    val zeroFf1 = Transformer.Dense(Array.fill(4, d)(0.0), Array.fill(4)(0.0))
    val zeroFf2 = Transformer.Dense(Array.fill(d, 4)(0.0), Array.fill(d)(0.0))
    val layer = Transformer.EncLayerFit(id, id, id, id,
      Array.fill(d)(1.0), Array.fill(d)(0.0),
      Array.fill(d)(1.0), Array.fill(d)(0.0), zeroFf1, zeroFf2, 1)
    val toks = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val out = Transformer.encode(Transformer.EncoderFit(Array.fill(2, d)(0.0),
      Seq(layer)), toks)
    // attention mixes the two tokens; with symmetric input, outputs are
    // mirror images of each other
    assert(math.abs(out(0)(0) - out(1)(1)) < 1e-12)
    assert(math.abs(out(0)(1) - out(1)(0)) < 1e-12)
    val _ = zero
  }
}
