package graft.kernels

/** Minimal deterministic neural-network kernel (pure JVM, doubles).
  *
  * Powers the JVM equivalents of the reference's torch tier: deep embedded
  * clustering (reference `polars_ts/clustering/deep_cluster.py:32-384`,
  * `_autoencoder.py:9-115`), contrastive clustering
  * (`clustering/contrastive.py:25-224`, `_contrastive_loss.py:10-93`),
  * and the CNN classifiers (`classification/resnet_classifier.py:23-180`,
  * `inception_time.py:24-208`). The reference trains float32 nets with
  * torch autograd; behavior there is torch-version-defined. Here the same
  * ARCHITECTURES and LOSSES are trained with hand-written backprop over
  * IEEE doubles and counter-based [[DetRng]] draws, which buys two
  * properties torch cannot give this engine:
  *
  *  - full determinism: init, batch shuffling and augmentation draws are
  *    pure functions of structured counters, so a refit reproduces the
  *    pinned fit bit-for-bit on any JVM;
  *  - an oracle-replayable eval pass: the trained model exports an
  *    [[NOp]] spec (weights + topology) that BOTH the executor-side
  *    predict UDF and the DuckDB oracle interpret with identical
  *    accumulation order — so the full forward pass, not just the head,
  *    is hash-checked cross-engine (`NeuralOracle.forwardSql`).
  *
  * Scale model: `fit` runs on the driver over a bounded collected sample
  * (the BPE / PQ-codebook discipline — minibatch SGD never observes 100 TB
  * anyway); predict/assign is a narrow broadcast-weights map, one shuffle
  * for the grouped panel and nothing else.
  *
  * ACCUMULATION-ORDER CONTRACT (kept in lockstep with
  * `NeuralOracle.forwardSql`; changing any loop order here breaks the
  * cross-engine bit-equality the oracles rely on):
  *  - conv: out[p] = Σ over (inChannel ascending, tap ascending), summed
  *    left-to-right onto a single accumulator;
  *  - GAP: 0.0 + x(0) + x(1) + ... then / L;
  *  - linear: bias + Σ inputs ascending;
  *  - batchnorm eval: ((x - rm) / sqrt(rv + eps)) * gamma + beta.
  */
object NeuralNet {

  final val BnEps = 1e-5
  final val BnMomentum = 0.1

  // ====================== eval-mode spec =============================

  /** Eval-mode ops on (channels, length) feature maps; vectors are (C, 1).
    * Serializable so a trained spec broadcasts to executors. */
  sealed trait NOp extends Serializable
  /** Conv1d, no bias; w(outC)(inC)(k); zero padding `pad` both sides;
    * outLen = L + 2·pad − k + 1 (the torch length formula). */
  final case class NConv(w: Array[Array[Array[Double]]], pad: Int) extends NOp
  /** BatchNorm1d in eval mode (running stats). */
  final case class NBn(rm: Array[Double], rv: Array[Double],
      ga: Array[Double], be: Array[Double]) extends NOp
  case object NRelu extends NOp
  /** MaxPool1d stride 1, −∞ padding (torch semantics). */
  final case class NMaxPool(k: Int, pad: Int) extends NOp
  /** AdaptiveAvgPool1d(1): (C, L) → (C, 1). */
  case object NGap extends NOp
  /** Linear on a (C, 1) vector: w(out)(in), bias b. */
  final case class NLinear(w: Array[Array[Double]], b: Array[Double]) extends NOp
  /** main/shortcut both applied to the block input, trimmed to the common
    * length, added, then ReLU (the 1D ResNet residual block). */
  final case class NResidual(main: Seq[NOp], shortcut: Seq[NOp]) extends NOp
  /** Branches applied to the module input, trimmed to the common length,
    * channel-concatenated (Inception module; bn/relu follow as ops). */
  final case class NConcat(branches: Seq[Seq[NOp]]) extends NOp

  /** Interpret an eval spec on one sample. Input (C, L); output (C', L'). */
  def evalForward(ops: Seq[NOp], x0: Array[Array[Double]]): Array[Array[Double]] = {
    var x = x0
    ops.foreach { op => x = evalOp(op, x) }
    x
  }

  private def padChannel(ch: Array[Double], pad: Int, fill: Double): Array[Double] = {
    if (pad == 0) return ch
    val out = Array.fill(ch.length + 2 * pad)(fill)
    System.arraycopy(ch, 0, out, pad, ch.length)
    out
  }

  private def evalOp(op: NOp, x: Array[Array[Double]]): Array[Array[Double]] = op match {
    case NConv(w, pad) =>
      val l = x(0).length
      val k = w(0)(0).length
      val outLen = l + 2 * pad - k + 1
      val xp = x.map(padChannel(_, pad, 0.0))
      Array.tabulate(w.length) { co =>
        val row = new Array[Double](outLen)
        var p = 0
        while (p < outLen) {
          var s = 0.0
          var ci = 0
          while (ci < x.length) {
            val wk = w(co)(ci); val xc = xp(ci)
            var t = 0
            while (t < k) { s += wk(t) * xc(p + t); t += 1 }
            ci += 1
          }
          row(p) = s; p += 1
        }
        row
      }
    case NBn(rm, rv, ga, be) =>
      Array.tabulate(x.length) { c =>
        val sd = math.sqrt(rv(c) + BnEps)
        x(c).map(v => (v - rm(c)) / sd * ga(c) + be(c))
      }
    case NRelu => x.map(_.map(v => if (v > 0.0) v else 0.0))
    case NMaxPool(k, pad) =>
      val l = x(0).length
      val outLen = l + 2 * pad - k + 1
      x.map { ch =>
        val cp = padChannel(ch, pad, Double.NegativeInfinity)
        Array.tabulate(outLen) { p =>
          var m = cp(p)
          var t = 1
          while (t < k) { if (cp(p + t) > m) m = cp(p + t); t += 1 }
          m
        }
      }
    case NGap =>
      x.map { ch =>
        var s = 0.0
        var i = 0
        while (i < ch.length) { s += ch(i); i += 1 }
        Array(s / ch.length)
      }
    case NLinear(w, b) =>
      Array.tabulate(w.length) { j =>
        var s = b(j)
        var i = 0
        while (i < w(j).length) { s += w(j)(i) * x(i)(0); i += 1 }
        Array(s)
      }
    case NResidual(main, shortcut) =>
      val a = evalForward(main, x)
      val r = evalForward(shortcut, x)
      val len = math.min(a(0).length, r(0).length)
      Array.tabulate(a.length)(c => Array.tabulate(len) { p =>
        val v = a(c)(p) + r(c)(p)
        if (v > 0.0) v else 0.0
      })
    case NConcat(branches) =>
      val outs = branches.map(evalForward(_, x))
      val len = outs.map(_(0).length).min
      outs.flatMap(_.map(_.take(len))).toArray
  }

  /** Eval spec → flat vector (expects the spec to end at a (C, 1) map). */
  def evalVector(ops: Seq[NOp], x0: Array[Array[Double]]): Array[Double] =
    evalForward(ops, x0).map(_(0))

  // ====================== parameters & Adam ==========================

  final class Param(val v: Array[Double]) extends Serializable {
    val g = new Array[Double](v.length)
  }

  /** Adam with torch defaults (β₁ 0.9, β₂ 0.999, ε 1e-8). Moment state
    * lives on the optimizer, not the Param — a new optimizer (e.g. DEC's
    * fine-tune phase) starts with fresh state, as torch's does. */
  final class Adam(params: Seq[Param], lr: Double) {
    private var t = 0
    private val m = params.map(p => new Array[Double](p.v.length))
    private val u = params.map(p => new Array[Double](p.v.length))
    def zeroGrad(): Unit = params.foreach(p => java.util.Arrays.fill(p.g, 0.0))
    def step(): Unit = {
      t += 1
      val bc1 = 1.0 - math.pow(0.9, t)
      val bc2 = 1.0 - math.pow(0.999, t)
      var pi = 0
      while (pi < params.length) {
        val p = params(pi); val pm = m(pi); val pu = u(pi)
        var i = 0
        while (i < p.v.length) {
          pm(i) = 0.9 * pm(i) + 0.1 * p.g(i)
          pu(i) = 0.999 * pu(i) + 0.001 * p.g(i) * p.g(i)
          p.v(i) -= lr * (pm(i) / bc1) / (math.sqrt(pu(i) / bc2) + 1e-8)
          i += 1
        }
        pi += 1
      }
    }
  }

  // ====================== training layers ============================

  /** Batch tensor: (B, C, L). */
  type Batch = Array[Array[Array[Double]]]

  trait TLayer {
    def params: Seq[Param] = Nil
    def forward(x: Batch, train: Boolean): Batch
    def backward(gy: Batch): Batch
    def evalOps: Seq[NOp]
  }

  /** Kaiming-uniform-style init bound 1/√fanIn (the effective torch
    * default for conv/linear), drawn from counter-based [[DetRng]]. */
  private def initUniform(seedC: Long, stream: Long, n: Int, fanIn: Int): Array[Double] = {
    val bound = 1.0 / math.sqrt(fanIn.toDouble)
    Array.tabulate(n)(i =>
      (2.0 * DetRng.uniform(seedC, DetRng.ctr(stream, i >> 12, i & 4095)) - 1.0) * bound)
  }

  final class TConv(val inC: Int, val outC: Int, val k: Int, val pad: Int,
      seedC: Long, stream: Long) extends TLayer {
    val w = new Param(initUniform(seedC, stream, outC * inC * k, inC * k))
    override def params: Seq[Param] = Seq(w)
    private var xpCache: Batch = _
    private var inLen = 0
    private def wAt(co: Int, ci: Int, t: Int): Double = w.v((co * inC + ci) * k + t)

    def forward(x: Batch, train: Boolean): Batch = {
      inLen = x(0)(0).length
      val outLen = inLen + 2 * pad - k + 1
      val xp = x.map(_.map(padChannel(_, pad, 0.0)))
      if (train) xpCache = xp
      xp.map { s =>
        Array.tabulate(outC) { co =>
          val row = new Array[Double](outLen)
          var p = 0
          while (p < outLen) {
            var acc = 0.0
            var ci = 0
            while (ci < inC) {
              val xc = s(ci); val base = (co * inC + ci) * k
              var t = 0
              while (t < k) { acc += w.v(base + t) * xc(p + t); t += 1 }
              ci += 1
            }
            row(p) = acc; p += 1
          }
          row
        }
      }
    }

    def backward(gy: Batch): Batch = {
      val outLen = gy(0)(0).length
      val gx = Array.ofDim[Double](gy.length, inC, inLen + 2 * pad)
      var b = 0
      while (b < gy.length) {
        var co = 0
        while (co < outC) {
          val gr = gy(b)(co)
          var ci = 0
          while (ci < inC) {
            val xc = xpCache(b)(ci); val gc = gx(b)(ci)
            val base = (co * inC + ci) * k
            var t = 0
            while (t < k) {
              var gw = 0.0
              val wv = w.v(base + t)
              var p = 0
              while (p < outLen) {
                gw += gr(p) * xc(p + t)
                gc(p + t) += gr(p) * wv
                p += 1
              }
              w.g(base + t) += gw
              t += 1
            }
            ci += 1
          }
          co += 1
        }
        b += 1
      }
      gx.map(_.map(ch => ch.slice(pad, pad + inLen)))
    }

    def evalOps: Seq[NOp] = Seq(NConv(
      Array.tabulate(outC, inC, k)((co, ci, t) => wAt(co, ci, t)), pad))
  }

  final class TBn(val c: Int) extends TLayer {
    val ga = new Param(Array.fill(c)(1.0))
    val be = new Param(new Array[Double](c))
    val rm = new Array[Double](c)
    val rv = Array.fill(c)(1.0)
    override def params: Seq[Param] = Seq(ga, be)
    private var xhat: Batch = _
    private var invStd: Array[Double] = _

    def forward(x: Batch, train: Boolean): Batch = {
      val bN = x.length; val l = x(0)(0).length
      if (!train) {
        return x.map(s => Array.tabulate(c) { ci =>
          val sd = math.sqrt(rv(ci) + BnEps)
          s(ci).map(v => (v - rm(ci)) / sd * ga.v(ci) + be.v(ci))
        })
      }
      val n = bN * l
      val mu = new Array[Double](c)
      val va = new Array[Double](c)
      var ci = 0
      while (ci < c) {
        var s = 0.0
        var b = 0
        while (b < bN) { val ch = x(b)(ci); var p = 0; while (p < l) { s += ch(p); p += 1 }; b += 1 }
        mu(ci) = s / n
        var s2 = 0.0
        b = 0
        while (b < bN) { val ch = x(b)(ci); var p = 0; while (p < l) { val d = ch(p) - mu(ci); s2 += d * d; p += 1 }; b += 1 }
        va(ci) = s2 / n
        // torch: running stats use the unbiased batch variance
        val unb = if (n > 1) s2 / (n - 1) else s2
        rm(ci) = (1.0 - BnMomentum) * rm(ci) + BnMomentum * mu(ci)
        rv(ci) = (1.0 - BnMomentum) * rv(ci) + BnMomentum * unb
        ci += 1
      }
      invStd = va.map(v => 1.0 / math.sqrt(v + BnEps))
      xhat = x.map(s => Array.tabulate(c)(ci => s(ci).map(v => (v - mu(ci)) * invStd(ci))))
      xhat.map(s => Array.tabulate(c)(ci => s(ci).map(v => v * ga.v(ci) + be.v(ci))))
    }

    def backward(gy: Batch): Batch = {
      val bN = gy.length; val l = gy(0)(0).length; val n = bN * l
      val out = Array.ofDim[Double](bN, c, l)
      var ci = 0
      while (ci < c) {
        var sumG = 0.0; var sumGx = 0.0
        var b = 0
        while (b < bN) {
          val gc = gy(b)(ci); val xh = xhat(b)(ci)
          var p = 0
          while (p < l) { sumG += gc(p); sumGx += gc(p) * xh(p); p += 1 }
          b += 1
        }
        ga.g(ci) += sumGx
        be.g(ci) += sumG
        val mg = sumG / n; val mgx = sumGx / n
        val a = ga.v(ci) * invStd(ci)
        b = 0
        while (b < bN) {
          val gc = gy(b)(ci); val xh = xhat(b)(ci)
          var p = 0
          while (p < l) { out(b)(ci)(p) = a * (gc(p) - mg - xh(p) * mgx); p += 1 }
          b += 1
        }
        ci += 1
      }
      out
    }

    def evalOps: Seq[NOp] = Seq(NBn(rm.clone(), rv.clone(), ga.v.clone(), be.v.clone()))
  }

  final class TRelu extends TLayer {
    private var mask: Batch = _
    def forward(x: Batch, train: Boolean): Batch = {
      val y = x.map(_.map(_.map(v => if (v > 0.0) v else 0.0)))
      if (train) mask = y
      y
    }
    def backward(gy: Batch): Batch =
      Array.tabulate(gy.length)(b => Array.tabulate(gy(b).length)(c =>
        Array.tabulate(gy(b)(c).length)(p => if (mask(b)(c)(p) > 0.0) gy(b)(c)(p) else 0.0)))
    def evalOps: Seq[NOp] = Seq(NRelu)
  }

  final class TMaxPool(val k: Int, val pad: Int) extends TLayer {
    private var argIdx: Array[Array[Array[Int]]] = _
    private var inLen = 0
    def forward(x: Batch, train: Boolean): Batch = {
      inLen = x(0)(0).length
      val outLen = inLen + 2 * pad - k + 1
      if (train) argIdx = Array.ofDim[Int](x.length, x(0).length, outLen)
      Array.tabulate(x.length) { b =>
        Array.tabulate(x(b).length) { c =>
          val cp = padChannel(x(b)(c), pad, Double.NegativeInfinity)
          Array.tabulate(outLen) { p =>
            var m = cp(p); var mi = p
            var t = 1
            while (t < k) { if (cp(p + t) > m) { m = cp(p + t); mi = p + t }; t += 1 }
            if (train) argIdx(b)(c)(p) = mi - pad // index in unpadded input
            m
          }
        }
      }
    }
    def backward(gy: Batch): Batch = {
      val gx = Array.ofDim[Double](gy.length, gy(0).length, inLen)
      for (b <- gy.indices; c <- gy(b).indices; p <- gy(b)(c).indices) {
        val i = argIdx(b)(c)(p)
        if (i >= 0 && i < inLen) gx(b)(c)(i) += gy(b)(c)(p)
      }
      gx
    }
    def evalOps: Seq[NOp] = Seq(NMaxPool(k, pad))
  }

  final class TGap extends TLayer {
    private var inLen = 0
    def forward(x: Batch, train: Boolean): Batch = {
      inLen = x(0)(0).length
      x.map(_.map { ch =>
        var s = 0.0
        var i = 0
        while (i < ch.length) { s += ch(i); i += 1 }
        Array(s / ch.length)
      })
    }
    def backward(gy: Batch): Batch =
      gy.map(_.map(g => Array.fill(inLen)(g(0) / inLen)))
    def evalOps: Seq[NOp] = Seq(NGap)
  }

  final class TLinear(val inD: Int, val outD: Int, seedC: Long, stream: Long) extends TLayer {
    val w = new Param(initUniform(seedC, stream, outD * inD, inD))
    val b = new Param(initUniform(seedC, stream + 1, outD, inD))
    override def params: Seq[Param] = Seq(w, b)
    private var xCache: Batch = _
    def forward(x: Batch, train: Boolean): Batch = {
      if (train) xCache = x
      x.map { s =>
        Array.tabulate(outD) { j =>
          var acc = b.v(j)
          var i = 0
          while (i < inD) { acc += w.v(j * inD + i) * s(i)(0); i += 1 }
          Array(acc)
        }
      }
    }
    def backward(gy: Batch): Batch = {
      val gx = Array.ofDim[Double](gy.length, inD, 1)
      var bi = 0
      while (bi < gy.length) {
        var j = 0
        while (j < outD) {
          val g = gy(bi)(j)(0)
          b.g(j) += g
          var i = 0
          while (i < inD) {
            w.g(j * inD + i) += g * xCache(bi)(i)(0)
            gx(bi)(i)(0) += g * w.v(j * inD + i)
            i += 1
          }
          j += 1
        }
        bi += 1
      }
      gx
    }
    def evalOps: Seq[NOp] = Seq(NLinear(
      Array.tabulate(outD, inD)((j, i) => w.v(j * inD + i)), b.v.clone()))
  }

  /** Upsample from (C, 1) to (C, target) — linear interpolation from a
    * single point is a broadcast (the autoencoder decoder's upsample). */
  final class TUpsample(val target: Int) extends TLayer {
    def forward(x: Batch, train: Boolean): Batch =
      x.map(_.map(ch => Array.fill(target)(ch(0))))
    def backward(gy: Batch): Batch =
      gy.map(_.map { g =>
        var s = 0.0
        var i = 0
        while (i < g.length) { s += g(i); i += 1 }
        Array(s)
      })
    def evalOps: Seq[NOp] =
      throw new UnsupportedOperationException("decoder ops are train-only")
  }

  /** ConvTranspose1d stride 1, no bias; torch weight shape (inC, outC, k);
    * outLen = L + k − 1 − 2·pad. Train-only (decoder path). */
  final class TConvT(val inC: Int, val outC: Int, val k: Int, val pad: Int,
      seedC: Long, stream: Long) extends TLayer {
    val w = new Param(initUniform(seedC, stream, inC * outC * k, inC * k))
    override def params: Seq[Param] = Seq(w)
    private var xCache: Batch = _
    private var inLen = 0
    def forward(x: Batch, train: Boolean): Batch = {
      inLen = x(0)(0).length
      val outLen = inLen + k - 1 - 2 * pad
      if (train) xCache = x
      x.map { s =>
        Array.tabulate(outC) { co =>
          val row = new Array[Double](outLen)
          var p = 0
          while (p < outLen) {
            var acc = 0.0
            var ci = 0
            while (ci < inC) {
              val xc = s(ci); val base = (ci * outC + co) * k
              var t = 0
              while (t < k) {
                val q = p + pad - t
                if (q >= 0 && q < inLen) acc += w.v(base + t) * xc(q)
                t += 1
              }
              ci += 1
            }
            row(p) = acc; p += 1
          }
          row
        }
      }
    }
    def backward(gy: Batch): Batch = {
      val outLen = gy(0)(0).length
      val gx = Array.ofDim[Double](gy.length, inC, inLen)
      var b = 0
      while (b < gy.length) {
        var co = 0
        while (co < outC) {
          val gr = gy(b)(co)
          var ci = 0
          while (ci < inC) {
            val xc = xCache(b)(ci); val gc = gx(b)(ci)
            val base = (ci * outC + co) * k
            var t = 0
            while (t < k) {
              var gw = 0.0
              val wv = w.v(base + t)
              var p = 0
              while (p < outLen) {
                val q = p + pad - t
                if (q >= 0 && q < inLen) { gw += gr(p) * xc(q); gc(q) += gr(p) * wv }
                p += 1
              }
              w.g(base + t) += gw
              t += 1
            }
            ci += 1
          }
          co += 1
        }
        b += 1
      }
      gx
    }
    def evalOps: Seq[NOp] =
      throw new UnsupportedOperationException("decoder ops are train-only")
  }

  final class TSequential(val layers: Seq[TLayer]) extends TLayer {
    override def params: Seq[Param] = layers.flatMap(_.params)
    def forward(x: Batch, train: Boolean): Batch =
      layers.foldLeft(x)((h, l) => l.forward(h, train))
    def backward(gy: Batch): Batch =
      layers.reverse.foldLeft(gy)((g, l) => l.backward(g))
    def evalOps: Seq[NOp] = layers.flatMap(_.evalOps)
  }

  private def trimBatch(x: Batch, len: Int): Batch = x.map(_.map(_.take(len)))

  private def padGrad(g: Batch, len: Int): Batch =
    g.map(_.map { ch =>
      if (ch.length >= len) ch
      else { val out = new Array[Double](len); System.arraycopy(ch, 0, out, 0, ch.length); out }
    })

  /** 1D residual block (reference resnet_classifier.py:23-50): three
    * conv-bn(-relu) stages plus an identity/1×1-conv shortcut, trim to the
    * common length, add, ReLU. */
  final class TResBlock(inC: Int, outC: Int, seedC: Long, stream: Long) extends TLayer {
    val main = new TSequential(Seq(
      new TConv(inC, outC, 8, 4, seedC, stream), new TBn(outC), new TRelu,
      new TConv(outC, outC, 5, 2, seedC, stream + 2), new TBn(outC), new TRelu,
      new TConv(outC, outC, 3, 1, seedC, stream + 4), new TBn(outC)))
    val shortcut: Option[TSequential] =
      if (inC == outC) None
      else Some(new TSequential(Seq(
        new TConv(inC, outC, 1, 0, seedC, stream + 6), new TBn(outC))))
    override def params: Seq[Param] = main.params ++ shortcut.toSeq.flatMap(_.params)
    private var addCache: Batch = _
    private var mainLen = 0
    private var resLen = 0

    def forward(x: Batch, train: Boolean): Batch = {
      val a = main.forward(x, train)
      val r = shortcut.map(_.forward(x, train)).getOrElse(x)
      mainLen = a(0)(0).length
      resLen = r(0)(0).length
      val len = math.min(mainLen, resLen)
      val sum = Array.tabulate(a.length)(b => Array.tabulate(outC)(c =>
        Array.tabulate(len)(p => a(b)(c)(p) + r(b)(c)(p))))
      val y = sum.map(_.map(_.map(v => if (v > 0.0) v else 0.0)))
      if (train) addCache = y
      y
    }

    def backward(gy: Batch): Batch = {
      val gAdd = Array.tabulate(gy.length)(b => Array.tabulate(outC)(c =>
        Array.tabulate(gy(b)(c).length)(p =>
          if (addCache(b)(c)(p) > 0.0) gy(b)(c)(p) else 0.0)))
      val gMain = main.backward(padGrad(gAdd, mainLen))
      val gRes = shortcut match {
        case Some(s) => s.backward(padGrad(gAdd, resLen))
        case None    => padGrad(gAdd, resLen)
      }
      Array.tabulate(gMain.length)(b => Array.tabulate(gMain(b).length)(c =>
        Array.tabulate(gMain(b)(c).length)(p => gMain(b)(c)(p) + gRes(b)(c)(p))))
    }

    def evalOps: Seq[NOp] = Seq(NResidual(main.evalOps,
      shortcut.map(_.evalOps).getOrElse(Nil)))
  }

  /** Inception module (reference inception_time.py:24-54): shared 1×1
    * bottleneck feeding k∈{10,20,40} convs, plus maxpool→1×1 branch;
    * trim, concat, BN, ReLU. */
  final class TInception(inC: Int, nF: Int, seedC: Long, stream: Long) extends TLayer {
    val bottleneck = new TConv(inC, nF, 1, 0, seedC, stream)
    val conv10 = new TConv(nF, nF, 10, 5, seedC, stream + 1)
    val conv20 = new TConv(nF, nF, 20, 10, seedC, stream + 2)
    val conv40 = new TConv(nF, nF, 40, 20, seedC, stream + 3)
    val pool = new TMaxPool(3, 1)
    val convPool = new TConv(inC, nF, 1, 0, seedC, stream + 4)
    val bn = new TBn(nF * 4)
    val relu = new TRelu
    override def params: Seq[Param] =
      Seq(bottleneck, conv10, conv20, conv40, convPool, bn).flatMap(_.params)
    private var branchLens: Array[Int] = _
    private var minLen = 0

    def forward(x: Batch, train: Boolean): Batch = {
      val bo = bottleneck.forward(x, train)
      val c10 = conv10.forward(bo, train)
      val c20 = conv20.forward(bo, train)
      val c40 = conv40.forward(bo, train)
      val pl = convPool.forward(pool.forward(x, train), train)
      val branches = Array(c10, c20, c40, pl)
      branchLens = branches.map(_(0)(0).length)
      minLen = branchLens.min
      val cat = Array.tabulate(x.length)(b =>
        branches.flatMap(br => br(b).map(_.take(minLen))))
      relu.forward(bn.forward(cat, train), train)
    }

    def backward(gy: Batch): Batch = {
      val gCat = bn.backward(relu.backward(gy))
      def slice(i: Int): Batch = gCat.map(s =>
        padGrad(Array(s.slice(i * nF, (i + 1) * nF)), branchLens(i))(0))
      val g10 = conv10.backward(slice(0))
      val g20 = conv20.backward(slice(1))
      val g40 = conv40.backward(slice(2))
      val gBo = Array.tabulate(g10.length)(b => Array.tabulate(nF)(c =>
        Array.tabulate(g10(b)(c).length)(p =>
          g10(b)(c)(p) + g20(b)(c)(p) + g40(b)(c)(p))))
      val gx1 = bottleneck.backward(gBo)
      val gx2 = pool.backward(convPool.backward(slice(3)))
      Array.tabulate(gx1.length)(b => Array.tabulate(gx1(b).length)(c =>
        Array.tabulate(gx1(b)(c).length)(p => gx1(b)(c)(p) + gx2(b)(c)(p))))
    }

    def evalOps: Seq[NOp] = {
      val bOps = bottleneck.evalOps
      Seq(NConcat(Seq(
        bOps ++ conv10.evalOps, bOps ++ conv20.evalOps, bOps ++ conv40.evalOps,
        pool.evalOps ++ convPool.evalOps))) ++ bn.evalOps ++ relu.evalOps
    }
  }

  // ====================== shared fit plumbing ========================

  /** Pad/truncate series to `len` with zeros (reference `_prepare_data` /
    * `extract_classification_data` pad-to-max semantics). */
  def padTo(ys: Array[Double], len: Int): Array[Double] = {
    val out = new Array[Double](len)
    System.arraycopy(ys, 0, out, 0, math.min(ys.length, len))
    out
  }

  /** Global population mean/std of the padded matrix (std 0 → 1). */
  def meanStd(x: Array[Array[Double]]): (Double, Double) = {
    var s = 0.0; var n = 0L
    x.foreach(_.foreach { v => s += v; n += 1 })
    val mu = s / n
    var s2 = 0.0
    x.foreach(_.foreach { v => val d = v - mu; s2 += d * d })
    val sd = math.sqrt(s2 / n)
    (mu, if (sd > 0.0) sd else 1.0)
  }

  /** Deterministic epoch shuffle: sort indices by a counter-keyed draw. */
  def shuffled(n: Int, seedC: Long, epoch: Int): Array[Int] =
    Array.range(0, n).sortBy(i =>
      DetRng.mix(DetRng.ctr(40, epoch.toLong, i.toLong) ^ seedC))

  def batches(order: Array[Int], batchSize: Int): Iterator[Array[Int]] =
    order.grouped(batchSize)

  /** DEC's k-means init (reference deep_cluster.py:212-231): counter-drawn
    * distinct start indices, Lloyd with argmin assignment / mean update,
    * stop when centroids stop moving. */
  def kmeans(x: Array[Array[Double]], k: Int, seedC: Long,
      maxIter: Int = 100): (Array[Int], Array[Array[Double]]) = {
    val n = x.length; val d = x(0).length
    val starts = Array.range(0, n)
      .sortBy(i => DetRng.mix(DetRng.ctr(41, 0, i.toLong) ^ seedC)).take(k)
    var centroids = starts.map(x(_).clone())
    val labels = new Array[Int](n)
    var it = 0
    var moved = true
    while (it < maxIter && moved) {
      var i = 0
      while (i < n) {
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          var dd = 0.0
          var j = 0
          while (j < d) { val t = x(i)(j) - centroids(c)(j); dd += t * t; j += 1 }
          if (dd < bd) { bd = dd; best = c }
          c += 1
        }
        labels(i) = best; i += 1
      }
      val sums = Array.ofDim[Double](k, d); val cnt = new Array[Int](k)
      i = 0
      while (i < n) {
        cnt(labels(i)) += 1
        var j = 0
        while (j < d) { sums(labels(i))(j) += x(i)(j); j += 1 }
        i += 1
      }
      moved = false
      var c = 0
      while (c < k) {
        var j = 0
        while (j < d) {
          val nv = if (cnt(c) > 0) sums(c)(j) / cnt(c) else centroids(c)(j)
          if (math.abs(nv - centroids(c)(j)) > 1e-8) moved = true
          centroids(c)(j) = nv
          j += 1
        }
        c += 1
      }
      it += 1
    }
    (labels, centroids)
  }
}
