package graft

import graft.kernels.{DeepModels, DetRng, NeuralNet}
import graft.kernels.NeuralNet._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the deterministic neural kernel: finite-difference
  * gradient checks for every layer (the hand-written backprop is the
  * load-bearing part), eval-spec/train-path consistency, and fit
  * determinism (the refit-reproduces-pin property the oracles rely on). */
class NeuralNetSpec extends AnyFunSuite {

  private val seedC = DetRng.seedConst(7L)

  /** Deterministic pseudo-random batch. */
  private def mkBatch(b: Int, c: Int, l: Int, stream: Long): Batch =
    Array.tabulate(b, c, l)((bi, ci, p) =>
      DetRng.gauss(seedC, DetRng.ctr(stream, bi.toLong * 64 + ci, p)))

  /** Scalar loss Σ y² over the output batch; returns (loss, dL/dy). */
  private def sqLoss(y: Batch): (Double, Batch) = {
    var s = 0.0
    y.foreach(_.foreach(_.foreach(v => s += v * v)))
    (s, y.map(_.map(_.map(v => 2.0 * v))))
  }

  /** Check analytic grads of `layer` (params + input) against central
    * finite differences of Σ y². */
  private def gradCheck(layer: TLayer, x: Batch, tol: Double = 1e-5): Unit = {
    val y = layer.forward(x, train = true)
    val (_, gy) = sqLoss(y)
    layer.params.foreach(p => java.util.Arrays.fill(p.g, 0.0))
    val gx = layer.backward(gy)
    val eps = 1e-6
    // parameter grads
    layer.params.foreach { p =>
      val idxs = if (p.v.length <= 8) p.v.indices else Seq(0, p.v.length / 2, p.v.length - 1)
      idxs.foreach { i =>
        val orig = p.v(i)
        p.v(i) = orig + eps
        val lp = sqLoss(layer.forward(x, train = true))._1
        p.v(i) = orig - eps
        val lm = sqLoss(layer.forward(x, train = true))._1
        p.v(i) = orig
        val num = (lp - lm) / (2 * eps)
        assert(math.abs(num - p.g(i)) <= tol * math.max(1.0, math.abs(num)),
          s"param grad mismatch at $i: analytic ${p.g(i)} vs numeric $num")
      }
    }
    // input grads (spot-check a few positions)
    val bi = 0
    for (ci <- x(bi).indices.take(2); p <- Seq(0, x(bi)(ci).length - 1)) {
      val orig = x(bi)(ci)(p)
      x(bi)(ci)(p) = orig + eps
      val lp = sqLoss(layer.forward(x, train = true))._1
      x(bi)(ci)(p) = orig - eps
      val lm = sqLoss(layer.forward(x, train = true))._1
      x(bi)(ci)(p) = orig
      val num = (lp - lm) / (2 * eps)
      assert(math.abs(num - gx(bi)(ci)(p)) <= tol * math.max(1.0, math.abs(num)),
        s"input grad mismatch at ($bi,$ci,$p): ${gx(bi)(ci)(p)} vs $num")
    }
  }

  test("conv1d gradients match finite differences") {
    gradCheck(new TConv(2, 3, 3, 1, seedC, 50), mkBatch(2, 2, 7, 1))
  }

  test("conv-transpose gradients match finite differences") {
    gradCheck(new TConvT(2, 2, 3, 1, seedC, 51), mkBatch(2, 2, 6, 2))
  }

  test("batchnorm gradients match finite differences") {
    gradCheck(new TBn(3), mkBatch(3, 3, 5, 3), tol = 1e-4)
  }

  test("linear gradients match finite differences") {
    gradCheck(new TLinear(4, 3, seedC, 52), mkBatch(2, 4, 1, 4))
  }

  test("maxpool + gap + relu gradients match finite differences") {
    gradCheck(new TSequential(Seq(new TMaxPool(3, 1), new TRelu, new TGap)),
      mkBatch(2, 2, 6, 5))
  }

  test("residual block gradients match finite differences") {
    gradCheck(new TResBlock(2, 3, seedC, 53), mkBatch(2, 2, 9, 6), tol = 1e-4)
  }

  test("inception module gradients match finite differences") {
    // length > 40 so the k=40 branch has real support
    gradCheck(new TInception(2, 2, seedC, 54), mkBatch(2, 2, 44, 7), tol = 1e-4)
  }

  test("full conv-bn-relu-gap-linear stack gradient check") {
    val net = new TSequential(Seq(
      new TConv(1, 3, 5, 2, seedC, 55), new TBn(3), new TRelu, new TGap,
      new TLinear(3, 2, seedC, 56)))
    gradCheck(net, mkBatch(3, 1, 11, 8), tol = 1e-4)
  }

  test("eval spec reproduces eval-mode layer forward exactly") {
    val net = new TSequential(Seq(
      new TConv(1, 4, 7, 3, seedC, 57), new TBn(4), new TRelu,
      new TConv(4, 8, 5, 2, seedC, 58), new TBn(8), new TRelu, new TGap,
      new TLinear(8, 3, seedC, 59)))
    // a few train steps so BN running stats are non-trivial
    val opt = new Adam(net.params, 1e-3)
    for (_ <- 0 until 3) {
      val y = net.forward(mkBatch(4, 1, 20, 9), train = true)
      val (_, gy) = sqLoss(y)
      opt.zeroGrad(); net.backward(gy); opt.step()
    }
    val x = mkBatch(1, 1, 20, 10)
    val viaLayers = net.forward(x, train = false)(0).map(_(0))
    val viaSpec = evalVector(net.evalOps, x(0))
    viaLayers.zip(viaSpec).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("residual/inception eval specs reproduce eval-mode forward") {
    val rb = new TResBlock(1, 3, seedC, 60)
    val x = mkBatch(2, 1, 15, 11)
    rb.forward(x, train = true) // populate BN batch stats into running stats
    val viaLayer = rb.forward(Array(x(0)), train = false)(0)
    val viaSpec = evalForward(rb.evalOps, x(0))
    assert(viaLayer.length == viaSpec.length)
    viaLayer.zip(viaSpec).foreach { case (a, b) =>
      a.zip(b).foreach { case (u, v) => assert(u == v) } }

    val im = new TInception(1, 2, seedC, 61)
    val xi = mkBatch(2, 1, 44, 12)
    im.forward(xi, train = true)
    val vl = im.forward(Array(xi(0)), train = false)(0)
    val vs = evalForward(im.evalOps, xi(0))
    assert(vl.length == vs.length)
    vl.zip(vs).foreach { case (a, b) =>
      a.zip(b).foreach { case (u, v) => assert(u == v) } }
  }

  test("adam converges on a quadratic") {
    val p = new Param(Array(5.0, -3.0))
    val opt = new Adam(Seq(p), 0.1)
    for (_ <- 0 until 500) {
      opt.zeroGrad()
      p.g(0) = 2 * (p.v(0) - 1.0); p.g(1) = 2 * (p.v(1) + 2.0)
      opt.step()
    }
    assert(math.abs(p.v(0) - 1.0) < 1e-3 && math.abs(p.v(1) + 2.0) < 1e-3)
  }

  private def toySeries(n: Int, l: Int): Seq[Array[Double]] =
    (0 until n).map { i =>
      // two obvious families: upward vs downward ramps + small noise
      val slope = if (i % 2 == 0) 1.0 else -1.0
      Array.tabulate(l)(p =>
        slope * p + 0.1 * DetRng.gauss(seedC, DetRng.ctr(30, i.toLong, p)))
    }

  test("DEC fit is deterministic and separates ramp families") {
    val cfg = DeepModels.DeepCfg(k = 2, embeddingDim = 3, nFilters = 2,
      pretrainEpochs = 4, finetuneEpochs = 3, batchSize = 8)
    val xs = toySeries(16, 20)
    val f1 = DeepModels.decFit(xs, cfg, idec = false)
    val f2 = DeepModels.decFit(xs, cfg, idec = false)
    assert(f1.labels.sameElements(f2.labels))
    f1.centroids.zip(f2.centroids).foreach { case (a, b) =>
      a.zip(b).foreach { case (u, v) => assert(u == v) } }
    // the two ramp families must land in different clusters
    val even = f1.labels.zipWithIndex.filter(_._2 % 2 == 0).map(_._1).toSet
    val odd = f1.labels.zipWithIndex.filter(_._2 % 2 == 1).map(_._1).toSet
    assert(even.size == 1 && odd.size == 1 && even != odd)
  }

  test("IDEC fit runs and is deterministic") {
    val cfg = DeepModels.DeepCfg(k = 2, embeddingDim = 3, nFilters = 2,
      pretrainEpochs = 6, finetuneEpochs = 4, batchSize = 8)
    val xs = toySeries(12, 18)
    val f1 = DeepModels.decFit(xs, cfg, idec = true)
    val f2 = DeepModels.decFit(xs, cfg, idec = true)
    assert(f1.labels.sameElements(f2.labels))
    assert(f1.labels.toSet.size == 2)
  }

  test("contrastive fit is deterministic and separates ramp families") {
    val cfg = DeepModels.ContrastiveCfg(k = 2, embeddingDim = 3,
      projectionDim = 3, nFilters = 2, maxEpochs = 5, batchSize = 8)
    val xs = toySeries(16, 20)
    val f1 = DeepModels.contrastiveFit(xs, cfg)
    val f2 = DeepModels.contrastiveFit(xs, cfg)
    assert(f1.labels.sameElements(f2.labels))
    val even = f1.labels.zipWithIndex.filter(_._2 % 2 == 0).map(_._1).toSet
    val odd = f1.labels.zipWithIndex.filter(_._2 % 2 == 1).map(_._1).toSet
    assert(even.size == 1 && odd.size == 1 && even != odd)
  }

  test("NT-Xent gradient matches finite differences") {
    val bN = 3; val d = 4
    val z = Array.tabulate(2 * bN, d)((i, j) =>
      DetRng.gauss(seedC, DetRng.ctr(31, i.toLong, j)))
    def loss(zz: Array[Array[Double]]): Double = {
      val m = 2 * bN
      val norm = zz.map(r => math.max(math.sqrt(r.map(v => v * v).sum), 1e-12))
      val u = Array.tabulate(m, d)((i, j) => zz(i)(j) / norm(i))
      var total = 0.0
      for (i <- 0 until m) {
        val s = Array.tabulate(m)(j => if (i == j) Double.NegativeInfinity
          else (0 until d).map(c => u(i)(c) * u(j)(c)).sum / 0.5)
        val mx = s.max
        val lse = mx + math.log(s.map(v =>
          if (v == Double.NegativeInfinity) 0.0 else math.exp(v - mx)).sum)
        val pos = if (i < bN) i + bN else i - bN
        total += (lse - s(pos)) / m
      }
      total
    }
    val g = DeepModels.ntXentGrad(z, bN, 0.5)
    val eps = 1e-6
    for (i <- Seq(0, 2, 5); j <- Seq(0, 3)) {
      val orig = z(i)(j)
      z(i)(j) = orig + eps; val lp = loss(z)
      z(i)(j) = orig - eps; val lm = loss(z)
      z(i)(j) = orig
      val num = (lp - lm) / (2 * eps)
      assert(math.abs(num - g(i)(j)) <= 1e-4 * math.max(1.0, math.abs(num)),
        s"ntxent grad ($i,$j): ${g(i)(j)} vs $num")
    }
  }

  test("ResNet classifier reaches 100% train accuracy on separable ramps") {
    val xs = toySeries(12, 24)
    val labels = (0 until 12).map(i => if (i % 2 == 0) "up" else "down")
    val cfg = DeepModels.ClassifierCfg(nFilters = 2, maxEpochs = 80, batchSize = 6)
    val fit = DeepModels.resnetFit(xs, labels, cfg)
    val correct = xs.zip(labels).count { case (ys, lbl) =>
      val x = Array(NeuralNet.padTo(ys, fit.seqLen).map(v => (v - fit.mean) / fit.std))
      val logits = evalVector(fit.spec, x)
      fit.classes(logits.indices.maxBy(i => (logits(i), -i))) == lbl
    }
    assert(correct == 12, s"train accuracy $correct/12")
  }

  test("InceptionTime classifier reaches 100% train accuracy on separable ramps") {
    val xs = toySeries(12, 44)
    val labels = (0 until 12).map(i => if (i % 2 == 0) "up" else "down")
    val cfg = DeepModels.ClassifierCfg(nFilters = 2, maxEpochs = 80, batchSize = 6)
    val fit = DeepModels.inceptionFit(xs, labels, cfg)
    val correct = xs.zip(labels).count { case (ys, lbl) =>
      val x = Array(NeuralNet.padTo(ys, fit.seqLen).map(v => (v - fit.mean) / fit.std))
      val logits = evalVector(fit.spec, x)
      fit.classes(logits.indices.maxBy(i => (logits(i), -i))) == lbl
    }
    assert(correct == 12, s"train accuracy $correct/12")
  }

  test("DEC pretrain reduces reconstruction error") {
    val xs = toySeries(12, 20)
    val (x, _, _, seqLen) = DeepModels.prep(xs)
    val seedC2 = DetRng.seedConst(42L)
    val ae = new DeepModels.Autoencoder(seqLen, 3, 2, seedC2)
    def recon(): Double = {
      val xb: Batch = x.map(s => Array(s))
      val xhat = ae.decode(ae.encode(xb, train = false), train = false)
      var s = 0.0
      for (b <- x.indices; p <- 0 until seqLen) {
        val d = xhat(b)(0)(p) - x(b)(p); s += d * d
      }
      s / (x.length * seqLen)
    }
    val before = recon()
    val opt = new Adam(ae.allParams, 1e-2)
    for (epoch <- 0 until 30) {
      val xb: Batch = x.map(s => Array(s))
      val xhat = ae.decode(ae.encode(xb, train = true), train = true)
      val scale = 2.0 / (x.length.toLong * seqLen)
      val g: Batch = Array.tabulate(x.length)(b => Array(Array.tabulate(seqLen)(p =>
        scale * (xhat(b)(0)(p) - x(b)(p)))))
      opt.zeroGrad(); ae.backward(null, g); opt.step()
    }
    val after = recon()
    assert(after < before * 0.9, s"recon $before -> $after")
  }
}
