package graft.kernels

import NeuralNet.{Adam, Param, batches, shuffled}

/** Deterministic transformer-encoder kernel for the PatchTST /
  * iTransformer / MultivariatePatchTST forecasters (reference
  * `polars_ts/dl/patchtst.py:27-266`, `dl/multivariate.py:127-242`;
  * Nie et al. ICLR 2023, Liu et al. ICLR 2024).
  *
  * Same contract as the rest of the neural tier: counter-based init /
  * shuffles / dropout masks (a refit reproduces the pin bit-for-bit),
  * hand-written backprop over doubles, driver-side training on pooled
  * windows, broadcast-weights narrow-map predict. Post-norm encoder
  * layers exactly as torch's default `TransformerEncoderLayer`
  * (self-attn → add → LayerNorm → ReLU FFN → add → LayerNorm, dropout
  * on attention probabilities, after activation, and on both residual
  * branches — at train time only, so the eval pass the oracle replays
  * is dropout-free).
  *
  * Eval-mode accumulation orders are shared with
  * `NeuralOracle.transformerSql`. The ONLY transcendental in the eval
  * pass is softmax's `exp`; JVM and DuckDB exps can differ in the last
  * ulp, which the 6-decimal output rounding absorbs (unlike the rest of
  * the neural tier this oracle is exact-to-rounding, not bit-exact —
  * the same discipline as the repo's float window aggregates). */
object Transformer {

  /** (B, T, D) token tensor. */
  type Tok = Array[Array[Array[Double]]]

  final val LnEps = 1e-5

  // ======================= fitted weights ============================

  final case class Dense(w: Array[Array[Double]], b: Array[Double])
      extends Serializable

  final case class EncLayerFit(
      wq: Dense, wk: Dense, wv: Dense, wo: Dense,
      ln1g: Array[Double], ln1b: Array[Double],
      ln2g: Array[Double], ln2b: Array[Double],
      ff1: Dense, ff2: Dense, nHeads: Int) extends Serializable

  /** Shared eval-mode net: tokenizer-specific projection is applied by
    * the caller; this holds posEmbed + encoder stack. */
  final case class EncoderFit(posEmbed: Array[Array[Double]],
      layers: Seq[EncLayerFit]) extends Serializable

  // ======================= eval forward ==============================

  private[kernels] def dense(d: Dense, x: Array[Double]): Array[Double] =
    Array.tabulate(d.w.length) { j =>
      var acc = d.b(j)
      var i = 0
      while (i < d.w(j).length) { acc += d.w(j)(i) * x(i); i += 1 }
      acc
    }

  /** LayerNorm over the feature dim: ((x − μ)/sqrt(σ² + ε))·γ + β with
    * population σ², μ and σ² summed index-ascending. */
  def layerNorm(x: Array[Double], g: Array[Double], b: Array[Double]): Array[Double] = {
    val d = x.length
    var mu = 0.0
    var i = 0
    while (i < d) { mu += x(i); i += 1 }
    mu /= d
    var va = 0.0
    i = 0
    while (i < d) { val t = x(i) - mu; va += t * t; i += 1 }
    va /= d
    val sd = math.sqrt(va + LnEps)
    Array.tabulate(d)(j => (x(j) - mu) / sd * g(j) + b(j))
  }

  /** Softmax row: exp(s − max)/Σ, max and Σ scanned index-ascending. */
  def softmax(s: Array[Double]): Array[Double] = {
    var mx = s(0)
    var i = 1
    while (i < s.length) { if (s(i) > mx) mx = s(i); i += 1 }
    val e = s.map(v => math.exp(v - mx))
    var sum = 0.0
    i = 0
    while (i < e.length) { sum += e(i); i += 1 }
    e.map(_ / sum)
  }

  /** Eval-mode encoder forward for ONE sample: tokens (T, D) after
    * projection+posEmbed → encoded (T, D). */
  def encode(fit: EncoderFit, tokens0: Array[Array[Double]]): Array[Array[Double]] = {
    var x = tokens0
    fit.layers.foreach { l =>
      val t = x.length
      val d = x(0).length
      val dh = d / l.nHeads
      val q = x.map(dense(l.wq, _))
      val k = x.map(dense(l.wk, _))
      val v = x.map(dense(l.wv, _))
      val attnOut = Array.tabulate(t) { i =>
        val out = new Array[Double](d)
        var h = 0
        while (h < l.nHeads) {
          val off = h * dh
          val scores = Array.tabulate(t) { j =>
            var acc = 0.0
            var c = 0
            while (c < dh) { acc += q(i)(off + c) * k(j)(off + c); c += 1 }
            acc / math.sqrt(dh.toDouble)
          }
          val p = softmax(scores)
          var c = 0
          while (c < dh) {
            var acc = 0.0
            var j = 0
            while (j < t) { acc += p(j) * v(j)(off + c); j += 1 }
            out(off + c) = acc
            c += 1
          }
          h += 1
        }
        dense(l.wo, out)
      }
      val x1 = Array.tabulate(t)(i =>
        layerNorm(Array.tabulate(d)(c => x(i)(c) + attnOut(i)(c)), l.ln1g, l.ln1b))
      val ff = x1.map { tok =>
        dense(l.ff2, dense(l.ff1, tok).map(v0 => if (v0 > 0.0) v0 else 0.0))
      }
      x = Array.tabulate(t)(i =>
        layerNorm(Array.tabulate(d)(c => x1(i)(c) + ff(i)(c)), l.ln2g, l.ln2b))
    }
    x
  }

  // ======================= training layers ===========================

  /** Per-token linear with backprop; x (B, T, inD). */
  private[kernels] final class TDense(inD: Int, outD: Int, seedC: Long, stream: Long) {
    val w = new Param(NeuralNetInit.uniform(seedC, stream, outD * inD, inD))
    val b = new Param(NeuralNetInit.uniform(seedC, stream + 1, outD, inD))
    private var xc: Tok = _
    def params: Seq[Param] = Seq(w, b)
    def forward(x: Tok, train: Boolean): Tok = {
      if (train) xc = x
      x.map(_.map { tok =>
        Array.tabulate(outD) { j =>
          var acc = b.v(j)
          var i = 0
          while (i < inD) { acc += w.v(j * inD + i) * tok(i); i += 1 }
          acc
        }
      })
    }
    def backward(g: Tok): Tok =
      Array.tabulate(g.length)(bi => Array.tabulate(g(bi).length) { ti =>
        val gt = g(bi)(ti); val xt = xc(bi)(ti)
        val gx = new Array[Double](inD)
        var j = 0
        while (j < outD) {
          b.g(j) += gt(j)
          var i = 0
          while (i < inD) {
            w.g(j * inD + i) += gt(j) * xt(i)
            gx(i) += gt(j) * w.v(j * inD + i)
            i += 1
          }
          j += 1
        }
        gx
      })
    def toFit: Dense =
      Dense(Array.tabulate(outD, inD)((j, i) => w.v(j * inD + i)), b.v.clone())
  }

  private final class TLayerNorm(d: Int) {
    val g = new Param(Array.fill(d)(1.0))
    val b = new Param(new Array[Double](d))
    private var xhat: Tok = _
    private var invSd: Array[Array[Double]] = _
    def params: Seq[Param] = Seq(g, b)
    def forward(x: Tok, train: Boolean): Tok = {
      if (train) {
        xhat = Array.ofDim[Array[Double]](x.length, x(0).length)
        invSd = Array.ofDim[Double](x.length, x(0).length)
      }
      Array.tabulate(x.length)(bi => Array.tabulate(x(bi).length) { ti =>
        val tok = x(bi)(ti)
        var mu = 0.0
        var i = 0
        while (i < d) { mu += tok(i); i += 1 }
        mu /= d
        var va = 0.0
        i = 0
        while (i < d) { val t = tok(i) - mu; va += t * t; i += 1 }
        va /= d
        val isd = 1.0 / math.sqrt(va + LnEps)
        val xh = Array.tabulate(d)(j => (tok(j) - mu) * isd)
        if (train) { xhat(bi)(ti) = xh; invSd(bi)(ti) = isd }
        Array.tabulate(d)(j => xh(j) * g.v(j) + b.v(j))
      })
    }
    def backward(gy: Tok): Tok =
      Array.tabulate(gy.length)(bi => Array.tabulate(gy(bi).length) { ti =>
        val gt = gy(bi)(ti); val xh = xhat(bi)(ti)
        var mg = 0.0; var mgx = 0.0
        var j = 0
        while (j < d) {
          g.g(j) += gt(j) * xh(j)
          b.g(j) += gt(j)
          val dxh = gt(j) * g.v(j)
          mg += dxh; mgx += dxh * xh(j)
          j += 1
        }
        mg /= d; mgx /= d
        Array.tabulate(d)(j => (gt(j) * g.v(j) - mg - xh(j) * mgx) * invSd(bi)(ti))
      })
  }

  /** Counter-keyed inverted dropout (train only). */
  private final class TDropout(p: Double, seedC: Long, stream: Long) {
    private var mask: Array[Double] = _
    private var shape: (Int, Int, Int) = _
    private var step = 0L
    def forward(x: Tok, train: Boolean): Tok = {
      if (!train || p <= 0.0) return x
      step += 1
      shape = (x.length, x(0).length, x(0)(0).length)
      val (nb, nt, nd) = shape
      mask = new Array[Double](nb * nt * nd)
      var idx = 0
      val scale = 1.0 / (1.0 - p)
      val out = Array.tabulate(nb, nt, nd) { (bi, ti, di) =>
        val u = DetRng.uniform(seedC, DetRng.ctr(stream, step * 512 + bi, ti * nd + di))
        val m = if (u < p) 0.0 else scale
        mask(idx) = m; idx += 1
        x(bi)(ti)(di) * m
      }
      out
    }
    def backward(g: Tok): Tok = {
      if (mask == null) return g
      val (_, nt, nd) = shape
      Array.tabulate(g.length)(bi => Array.tabulate(g(bi).length)(ti =>
        Array.tabulate(g(bi)(ti).length)(di =>
          g(bi)(ti)(di) * mask((bi * nt + ti) * nd + di))))
    }
  }

  /** One post-norm encoder layer with training state. */
  private final class TEncLayer(d: Int, nHeads: Int, dFf: Int, dropout: Double,
      seedC: Long, stream: Long) {
    private val dh = d / nHeads
    val wq = new TDense(d, d, seedC, stream)
    val wk = new TDense(d, d, seedC, stream + 2)
    val wv = new TDense(d, d, seedC, stream + 4)
    val wo = new TDense(d, d, seedC, stream + 6)
    val ln1 = new TLayerNorm(d)
    val ln2 = new TLayerNorm(d)
    val ff1 = new TDense(d, dFf, seedC, stream + 8)
    val ff2 = new TDense(dFf, d, seedC, stream + 10)
    val dropAttn = new TDropout(dropout, seedC, stream + 12)
    val drop1 = new TDropout(dropout, seedC, stream + 13)
    val dropAct = new TDropout(dropout, seedC, stream + 14)
    val drop2 = new TDropout(dropout, seedC, stream + 15)
    def params: Seq[Param] =
      Seq(wq, wk, wv, wo, ff1, ff2).flatMap(_.params) ++ ln1.params ++ ln2.params

    private var qc: Tok = _
    private var kc: Tok = _
    private var vc: Tok = _
    private var pc: Array[Array[Array[Array[Double]]]] = _ // (B, head, T, T)
    private var x1c: Tok = _
    private var reluMask: Tok = _

    def forward(x: Tok, train: Boolean): Tok = {
      val q = wq.forward(x, train)
      val k = wk.forward(x, train)
      val v = wv.forward(x, train)
      val bN = x.length; val t = x(0).length
      if (train) { qc = q; kc = k; vc = v; pc = Array.ofDim(bN, nHeads, t, t) }
      val heads = Array.tabulate(bN) { bi =>
        Array.tabulate(t) { i =>
          val out = new Array[Double](d)
          var h = 0
          while (h < nHeads) {
            val off = h * dh
            val scores = Array.tabulate(t) { j =>
              var acc = 0.0
              var c = 0
              while (c < dh) { acc += q(bi)(i)(off + c) * k(bi)(j)(off + c); c += 1 }
              acc / math.sqrt(dh.toDouble)
            }
            val p = softmax(scores)
            if (train) pc(bi)(h)(i) = p
            var c = 0
            while (c < dh) {
              var acc = 0.0
              var j = 0
              while (j < t) { acc += p(j) * v(bi)(j)(off + c); j += 1 }
              out(off + c) = acc
              c += 1
            }
            h += 1
          }
          out
        }
      }
      // NOTE: train-mode attention-prob dropout is folded into dropAttn
      // applied to the head output (an engine simplification — the loss
      // still regularizes attention; eval semantics are unaffected)
      val attn = wo.forward(dropAttn.forward(heads, train), train)
      val attnD = drop1.forward(attn, train)
      val res1 = Array.tabulate(bN, t, d)((bi, ti, c) =>
        x(bi)(ti)(c) + attnD(bi)(ti)(c))
      val x1 = ln1.forward(res1, train)
      if (train) x1c = x1
      val ffh = ff1.forward(x1, train)
      val relu = ffh.map(_.map(_.map(v0 => if (v0 > 0.0) v0 else 0.0)))
      if (train) reluMask = relu
      val ff = ff2.forward(dropAct.forward(relu, train), train)
      val ffd = drop2.forward(ff, train)
      ln2.forward(Array.tabulate(bN, t, d)((bi, ti, c) =>
        x1(bi)(ti)(c) + ffd(bi)(ti)(c)), train)
    }

    def backward(gy: Tok): Tok = {
      val bN = gy.length; val t = gy(0).length
      val gRes2 = ln2.backward(gy)
      val gFf = drop2.backward(gRes2)
      val gRelu = dropAct.backward(ff2.backward(gFf))
      val gFfh = Array.tabulate(bN, t, gRelu(0)(0).length)((bi, ti, c) =>
        if (reluMask(bi)(ti)(c) > 0.0) gRelu(bi)(ti)(c) else 0.0)
      val gFromFf = ff1.backward(gFfh)
      val gX1 = Array.tabulate(bN, t, d)((bi, ti, c) =>
        gRes2(bi)(ti)(c) + gFromFf(bi)(ti)(c))
      val gRes1 = ln1.backward(gX1)
      val gAttnOut = drop1.backward(gRes1)
      val gHeads = dropAttn.backward(wo.backward(gAttnOut))
      // attention backward
      val gq: Tok = Array.fill(bN, t, d)(0.0)
      val gk: Tok = Array.fill(bN, t, d)(0.0)
      val gv: Tok = Array.fill(bN, t, d)(0.0)
      var bi = 0
      while (bi < bN) {
        var h = 0
        while (h < nHeads) {
          val off = h * dh
          val scale = 1.0 / math.sqrt(dh.toDouble)
          var i = 0
          while (i < t) {
            val p = pc(bi)(h)(i)
            // dP_j = Σ_c gHeads_i(off+c) · v_j(off+c)
            val dP = Array.tabulate(t) { j =>
              var acc = 0.0
              var c = 0
              while (c < dh) { acc += gHeads(bi)(i)(off + c) * vc(bi)(j)(off + c); c += 1 }
              acc
            }
            // dV_j += p_j · gHeads_i
            var j = 0
            while (j < t) {
              var c = 0
              while (c < dh) { gv(bi)(j)(off + c) += p(j) * gHeads(bi)(i)(off + c); c += 1 }
              j += 1
            }
            var dot = 0.0
            j = 0
            while (j < t) { dot += dP(j) * p(j); j += 1 }
            j = 0
            while (j < t) {
              val dS = p(j) * (dP(j) - dot) * scale
              var c = 0
              while (c < dh) {
                gq(bi)(i)(off + c) += dS * kc(bi)(j)(off + c)
                gk(bi)(j)(off + c) += dS * qc(bi)(i)(off + c)
                c += 1
              }
              j += 1
            }
            i += 1
          }
          h += 1
        }
        bi += 1
      }
      val gx1 = wq.backward(gq)
      val gx2 = wk.backward(gk)
      val gx3 = wv.backward(gv)
      Array.tabulate(bN, t, d)((b2, t2, c) =>
        gRes1(b2)(t2)(c) + gx1(b2)(t2)(c) + gx2(b2)(t2)(c) + gx3(b2)(t2)(c))
    }

    def toFit: EncLayerFit = EncLayerFit(wq.toFit, wk.toFit, wv.toFit, wo.toFit,
      ln1.g.v.clone(), ln1.b.v.clone(), ln2.g.v.clone(), ln2.b.v.clone(),
      ff1.toFit, ff2.toFit, nHeads)
  }

  // ======================= PatchTST ==================================

  final case class PatchCfg(
      h: Int = 12,
      inputSize: Int = 64,
      patchLen: Int = 16,
      dModel: Int = 64,
      nHeads: Int = 4,
      nLayers: Int = 2,
      dropout: Double = 0.1,
      maxEpochs: Int = 100,
      lr: Double = 1e-3,
      batchSize: Int = 32,
      windowCap: Int = 8192,
      seed: Long = 42L)

  final case class PatchFit(
      proj: Dense, enc: EncoderFit, head: Dense,
      mean: Double, std: Double, inputSize: Int, patchLen: Int, h: Int)
      extends Serializable

  /** PatchTST fit over pooled univariate windows (reference
    * patchtst.py:173-266). */
  def patchFit(series: Seq[Array[Double]], cfg: PatchCfg): PatchFit = {
    require(cfg.inputSize % cfg.patchLen == 0,
      s"input_size (${cfg.inputSize}) must be divisible by patch_len (${cfg.patchLen})")
    val seedC = DetRng.seedConst(cfg.seed)
    val nP = cfg.inputSize / cfg.patchLen
    val (xw, yw) = NBeats.buildWindows(series, cfg.inputSize, cfg.h, cfg.windowCap)
    require(xw.nonEmpty, "no training windows")
    val (mu, sd) = NeuralNet.meanStd(xw)
    val xn = xw.map(_.map(v => (v - mu) / sd))
    val yn = yw.map(_.map(v => (v - mu) / sd))
    val proj = new TDense(cfg.patchLen, cfg.dModel, seedC, 1)
    val pos = new Param(Array.tabulate(nP * cfg.dModel)(i =>
      DetRng.gauss(seedC, DetRng.ctr(3, i >> 12, i & 4095)) * 0.02))
    val layers = (0 until cfg.nLayers).map(li =>
      new TEncLayer(cfg.dModel, cfg.nHeads, cfg.dModel * 4, cfg.dropout,
        seedC, 20 + li * 16))
    val head = new TDense(nP * cfg.dModel, cfg.h, seedC, 5)
    val opt = new Adam(proj.params ++ Seq(pos) ++ layers.flatMap(_.params)
      ++ head.params, cfg.lr)
    val n = xn.length
    for (epoch <- 0 until cfg.maxEpochs;
         idx <- batches(shuffled(n, seedC, epoch), cfg.batchSize)) {
      val bN = idx.length
      val patches: Tok = idx.map(i =>
        Array.tabulate(nP)(p => xn(i).slice(p * cfg.patchLen, (p + 1) * cfg.patchLen)))
      var tok = proj.forward(patches, train = true)
      tok = Array.tabulate(bN, nP, cfg.dModel)((b, t, c) =>
        tok(b)(t)(c) + pos.v(t * cfg.dModel + c))
      var x = tok
      layers.foreach(l => x = l.forward(x, train = true))
      // flatten → head (treat as 1-token sequence for TDense)
      val flat: Tok = x.map(s => Array(s.flatten))
      val pred = head.forward(flat, train = true)
      val scale = 2.0 / (bN.toLong * cfg.h)
      val gPred: Tok = Array.tabulate(bN)(b => Array(Array.tabulate(cfg.h)(i =>
        scale * (pred(b)(0)(i) - yn(idx(b))(i)))))
      opt.zeroGrad()
      val gFlat = head.backward(gPred)
      var gx: Tok = gFlat.map(s => Array.tabulate(nP)(t =>
        s(0).slice(t * cfg.dModel, (t + 1) * cfg.dModel)))
      layers.reverse.foreach(l => gx = l.backward(gx))
      // posEmbed grad: sum over batch
      for (b <- 0 until bN; t <- 0 until nP; c <- 0 until cfg.dModel)
        pos.g(t * cfg.dModel + c) += gx(b)(t)(c)
      proj.backward(gx)
      opt.step()
    }
    PatchFit(proj.toFit,
      EncoderFit(Array.tabulate(nP, cfg.dModel)((t, c) => pos.v(t * cfg.dModel + c)),
        layers.map(_.toFit)),
      head.toFit, mu, sd, cfg.inputSize, cfg.patchLen, cfg.h)
  }

  /** Eval forward: raw series → RAW-scale h forecasts (contract shared
    * with NeuralOracle.patchTstSql). */
  def patchForward(f: PatchFit, ysRaw: Array[Double]): Array[Double] = {
    val x = NBeats.context(ysRaw, f.inputSize).map(v => (v - f.mean) / f.std)
    val nP = f.inputSize / f.patchLen
    val tokens = Array.tabulate(nP) { p =>
      val t = dense(f.proj, x.slice(p * f.patchLen, (p + 1) * f.patchLen))
      Array.tabulate(t.length)(c => t(c) + f.enc.posEmbed(p)(c))
    }
    val enc = encode(f.enc, tokens)
    val flat = enc.flatten
    dense(f.head, flat).map(v => v * f.std + f.mean)
  }

  // ======================= multivariate variants =====================

  final case class MvCfg(
      h: Int = 12,
      inputSize: Int = 32,
      patchLen: Int = 8, // MVPatchTST only
      dModel: Int = 64,
      nHeads: Int = 4,
      nLayers: Int = 2,
      dropout: Double = 0.1,
      maxEpochs: Int = 50,
      lr: Double = 1e-3,
      batchSize: Int = 32,
      windowCap: Int = 8192,
      seed: Long = 42L)

  /** kind ∈ {"mvpatch", "itransformer"}; mean/std are PER-VARIABLE
    * (reference multivariate.py:320-323, std + 1e-8). For mvpatch the
    * head maps nP·D → h·V (row-major (t, v)); for itransformer the head
    * maps each variate token D → h. */
  final case class MvFit(kind: String, proj: Dense, enc: EncoderFit,
      head: Dense, mean: Array[Double], std: Array[Double],
      inputSize: Int, patchLen: Int, h: Int, nVars: Int) extends Serializable

  /** Multivariate sliding windows over (L, V) matrices
    * (reference `_build_mv_windows`). */
  def buildMvWindows(arrays: Seq[Array[Array[Double]]], inputSize: Int,
      h: Int, cap: Int): (Array[Array[Array[Double]]], Array[Array[Array[Double]]]) = {
    val xs = Array.newBuilder[Array[Array[Double]]]
    val ys = Array.newBuilder[Array[Array[Double]]]
    var count = 0
    arrays.iterator.takeWhile(_ => count < cap).foreach { arr =>
      var t = inputSize
      while (t <= arr.length - h && count < cap) {
        xs += arr.slice(t - inputSize, t)
        ys += arr.slice(t, t + h)
        count += 1
        t += 1
      }
    }
    (xs.result(), ys.result())
  }

  /** Last `inputSize` rows, leading-zero-padded (reference
    * multivariate.py:370-377). */
  def mvContext(arr: Array[Array[Double]], inputSize: Int, nVars: Int)
      : Array[Array[Double]] = {
    val out = Array.fill(inputSize)(new Array[Double](nVars))
    val n = math.min(arr.length, inputSize)
    var i = 0
    while (i < n) { out(inputSize - n + i) = arr(arr.length - n + i); i += 1 }
    out
  }

  /** Tokenize one normalized (inputSize, V) context into the model's
    * token sequence (pre-encoder, posEmbed added). */
  private def mvTokens(f: MvFit, xn: Array[Array[Double]]): Array[Array[Double]] =
    f.kind match {
      case "mvpatch" =>
        val nP = math.max(f.inputSize / f.patchLen, 1)
        val usable = nP * f.patchLen
        val start = f.inputSize - usable
        Array.tabulate(nP) { p =>
          // row-major (time, var) flatten of the patch
          val flat = new Array[Double](f.patchLen * f.nVars)
          var r = 0
          while (r < f.patchLen) {
            var v = 0
            while (v < f.nVars) {
              flat(r * f.nVars + v) = xn(start + p * f.patchLen + r)(v)
              v += 1
            }
            r += 1
          }
          val t = dense(f.proj, flat)
          Array.tabulate(t.length)(c => t(c) + f.enc.posEmbed(p)(c))
        }
      case "itransformer" =>
        Array.tabulate(f.nVars) { v =>
          val hist = Array.tabulate(f.inputSize)(r => xn(r)(v))
          val t = dense(f.proj, hist)
          Array.tabulate(t.length)(c => t(c) + f.enc.posEmbed(v)(c))
        }
      case other => throw new IllegalArgumentException(other)
    }

  /** Eval forward: raw (L, V) history → RAW-scale (h, V) forecasts. */
  def mvForward(f: MvFit, raw: Array[Array[Double]]): Array[Array[Double]] = {
    val ctx = mvContext(raw, f.inputSize, f.nVars)
    val xn = Array.tabulate(f.inputSize, f.nVars)((r, v) =>
      (ctx(r)(v) - f.mean(v)) / f.std(v))
    val enc = encode(f.enc, mvTokens(f, xn))
    f.kind match {
      case "mvpatch" =>
        val out = dense(f.head, enc.flatten) // h·V row-major (t, v)
        Array.tabulate(f.h, f.nVars)((t, v) =>
          out(t * f.nVars + v) * f.std(v) + f.mean(v))
      case _ =>
        val perVar = enc.map(dense(f.head, _)) // (V, h)
        Array.tabulate(f.h, f.nVars)((t, v) =>
          perVar(v)(t) * f.std(v) + f.mean(v))
    }
  }

  /** Shared multivariate trainer (reference multivariate.py:313-357 /
    * 453-496): pooled (inputSize, V) windows, per-var normalization,
    * MSE over (B, h, V). */
  def mvFit(arrays: Seq[Array[Array[Double]]], cfg: MvCfg, kind: String): MvFit = {
    val seedC = DetRng.seedConst(cfg.seed)
    val nVars = arrays.head(0).length
    val (xw, yw) = buildMvWindows(arrays, cfg.inputSize, cfg.h, cfg.windowCap)
    require(xw.nonEmpty, "Not enough data for the given input_size and horizon")
    val mean = Array.tabulate(nVars) { v =>
      var s = 0.0; var n = 0L
      xw.foreach(_.foreach { row => s += row(v); n += 1 })
      s / n
    }
    val std = Array.tabulate(nVars) { v =>
      var s = 0.0; var n = 0L
      xw.foreach(_.foreach { row => val d = row(v) - mean(v); s += d * d; n += 1 })
      math.sqrt(s / n) + 1e-8 // reference: std + 1e-8
    }
    val xn = xw.map(w => Array.tabulate(cfg.inputSize, nVars)((r, v) =>
      (w(r)(v) - mean(v)) / std(v)))
    val yn = yw.map(w => Array.tabulate(cfg.h, nVars)((r, v) =>
      (w(r)(v) - mean(v)) / std(v)))
    val nP = if (kind == "mvpatch") math.max(cfg.inputSize / cfg.patchLen, 1)
             else nVars
    val projIn = if (kind == "mvpatch") cfg.patchLen * nVars else cfg.inputSize
    val headIn = if (kind == "mvpatch") nP * cfg.dModel else cfg.dModel
    val headOut = if (kind == "mvpatch") cfg.h * nVars else cfg.h
    val proj = new TDense(projIn, cfg.dModel, seedC, 1)
    val pos = new Param(Array.tabulate(nP * cfg.dModel)(i =>
      DetRng.gauss(seedC, DetRng.ctr(3, i >> 12, i & 4095)) * 0.02))
    val layers = (0 until cfg.nLayers).map(li =>
      new TEncLayer(cfg.dModel, cfg.nHeads, cfg.dModel * 4, cfg.dropout,
        seedC, 20 + li * 16))
    val head = new TDense(headIn, headOut, seedC, 5)
    val opt = new Adam(proj.params ++ Seq(pos) ++ layers.flatMap(_.params)
      ++ head.params, cfg.lr)
    val n = xn.length
    for (epoch <- 0 until cfg.maxEpochs;
         idx <- batches(shuffled(n, seedC, epoch), cfg.batchSize)) {
      val bN = idx.length
      val rawToks: Tok = idx.map { i =>
        if (kind == "mvpatch") {
          val usable = nP * cfg.patchLen
          val start = cfg.inputSize - usable
          Array.tabulate(nP) { p =>
            val flat = new Array[Double](cfg.patchLen * nVars)
            for (r <- 0 until cfg.patchLen; v <- 0 until nVars)
              flat(r * nVars + v) = xn(i)(start + p * cfg.patchLen + r)(v)
            flat
          }
        } else {
          Array.tabulate(nVars)(v => Array.tabulate(cfg.inputSize)(r => xn(i)(r)(v)))
        }
      }
      var tok = proj.forward(rawToks, train = true)
      tok = Array.tabulate(bN, nP, cfg.dModel)((b, t, c) =>
        tok(b)(t)(c) + pos.v(t * cfg.dModel + c))
      var x = tok
      layers.foreach(l => x = l.forward(x, train = true))
      val headInToks: Tok =
        if (kind == "mvpatch") x.map(s => Array(s.flatten)) else x
      val pred = head.forward(headInToks, train = true)
      val scale = 2.0 / (bN.toLong * cfg.h * nVars)
      // gPred mirrors pred's token structure
      val gPred: Tok =
        if (kind == "mvpatch")
          Array.tabulate(bN)(b => Array(Array.tabulate(cfg.h * nVars) { o =>
            val t = o / nVars; val v = o % nVars
            scale * (pred(b)(0)(o) - yn(idx(b))(t)(v))
          }))
        else
          Array.tabulate(bN)(b => Array.tabulate(nVars)(v =>
            Array.tabulate(cfg.h)(t => scale * (pred(b)(v)(t) - yn(idx(b))(t)(v)))))
      opt.zeroGrad()
      val gHeadIn = head.backward(gPred)
      var gx: Tok =
        if (kind == "mvpatch")
          gHeadIn.map(s => Array.tabulate(nP)(t =>
            s(0).slice(t * cfg.dModel, (t + 1) * cfg.dModel)))
        else gHeadIn
      layers.reverse.foreach(l => gx = l.backward(gx))
      for (b <- 0 until bN; t <- 0 until nP; c <- 0 until cfg.dModel)
        pos.g(t * cfg.dModel + c) += gx(b)(t)(c)
      proj.backward(gx)
      opt.step()
    }
    MvFit(kind, proj.toFit,
      EncoderFit(Array.tabulate(nP, cfg.dModel)((t, c) => pos.v(t * cfg.dModel + c)),
        layers.map(_.toFit)),
      head.toFit, mean, std, cfg.inputSize, cfg.patchLen, cfg.h, nVars)
  }
}

/** Init helper shared with NeuralNet's layers (same uniform law). */
private[kernels] object NeuralNetInit {
  def uniform(seedC: Long, stream: Long, n: Int, fanIn: Int): Array[Double] = {
    val bound = 1.0 / math.sqrt(fanIn.toDouble)
    Array.tabulate(n)(i =>
      (2.0 * DetRng.uniform(seedC, DetRng.ctr(stream, i >> 12, i & 4095)) - 1.0) * bound)
  }
}
