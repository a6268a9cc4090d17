package graft.kernels

import NeuralNet.{Adam, Param, batches, shuffled}
import Transformer.{Dense, Tok, dense, softmax, TDense}

/** Time-LLM global forecaster kernel (reference
  * `polars_ts/adapters/llm_forecast.py:37-286`; Jin et al., ICLR 2024):
  * patch embedding → cross-attention against learned text-like
  * prototypes → MLP decoder, trained from scratch with Adam on MSE over
  * pooled per-window-normalized sliding windows. The reference's
  * "LLM adapter" framing notwithstanding, its `_TimeLLMNet` downloads
  * nothing and trains every parameter locally — so unlike the
  * foundation-model trio (Chronos/TimesFM/Moirai, which need published
  * pretrained weights) this is fully implementable in the engine.
  *
  * Same engineering contract as the rest of the neural tier:
  * counter-based [[DetRng]] init and shuffles (a refit reproduces the
  * pin bit-for-bit), hand-written backprop over doubles, driver-side
  * training on pooled windows, broadcast-weights narrow-map predict.
  * The eval forward shares its accumulation order with
  * `NeuralOracle.timeLlmSql`; softmax's `exp` is the only
  * transcendental (exact-to-6dp-rounding oracle discipline, as
  * PatchTST).
  *
  * Deviations from the torch net, both documented engine conventions:
  * train-mode attention dropout does not exist here (the reference's
  * `nn.MultiheadAttention` default is dropout=0, so semantics match),
  * and normalization uses the reference's own per-window population
  * std + 1e-8 (llm_forecast.py:230-233).
  */
object TimeLlm {

  final case class Cfg(
      h: Int = 12,
      inputSize: Int = 36,
      patchLen: Int = 8,
      dModel: Int = 64,
      nHeads: Int = 4,
      nProto: Int = 16,
      maxEpochs: Int = 50,
      lr: Double = 1e-3,
      batchSize: Int = 32,
      windowCap: Int = 8192,
      seed: Long = 42L) {
    require(dModel % nHeads == 0, s"dModel ($dModel) % nHeads ($nHeads) != 0")
    require(nProto >= 1 && patchLen >= 1 && inputSize >= patchLen)
    /** Reference: n_patches = max(input_size // patch_len, 1). */
    def nPatches: Int = math.max(inputSize / patchLen, 1)
  }

  final case class Fit(
      proj: Dense, proto: Array[Array[Double]],
      wq: Dense, wk: Dense, wv: Dense, wo: Dense,
      dec1: Dense, dec2: Dense,
      nHeads: Int, inputSize: Int, patchLen: Int, h: Int)
      extends Serializable {
    def nPatches: Int = math.max(inputSize / patchLen, 1)
  }

  /** Reference predict context (llm_forecast.py:276-280): last
    * `inputSize` values, EDGE-padded at the front (np.pad mode="edge":
    * the truncated window's first value repeats) when the series is
    * shorter. */
  def edgeContext(ys: Array[Double], inputSize: Int): Array[Double] = {
    require(ys.nonEmpty, "empty series")
    val x = if (ys.length > inputSize) ys.takeRight(inputSize) else ys
    if (x.length == inputSize) x
    else Array.fill(inputSize - x.length)(x(0)) ++ x
  }

  /** Population mean/std of one window; std floored with the
    * reference's +1e-8. Index-ascending accumulation (oracle order). */
  def windowStats(x: Array[Double]): (Double, Double) = {
    var mu = 0.0
    var i = 0
    while (i < x.length) { mu += x(i); i += 1 }
    mu /= x.length
    var va = 0.0
    i = 0
    while (i < x.length) { val t = x(i) - mu; va += t * t; i += 1 }
    (mu, math.sqrt(va / x.length) + 1e-8)
  }

  /** Cross-attention head pass shared by train/eval: queries from
    * `q` (T rows), keys/values `k`/`v` (P rows), head-concatenated
    * output (no out-projection). When `pOut` is non-null the softmax
    * rows are captured for backprop. */
  private def attnHeads(q: Tok, k: Tok, v: Tok, nHeads: Int,
      pOut: Array[Array[Array[Array[Double]]]]): Tok = {
    val bN = q.length; val t = q(0).length; val p = k(0).length
    val d = q(0)(0).length; val dh = d / nHeads
    Array.tabulate(bN) { bi =>
      Array.tabulate(t) { i =>
        val out = new Array[Double](d)
        var h = 0
        while (h < nHeads) {
          val off = h * dh
          val scores = Array.tabulate(p) { j =>
            var acc = 0.0
            var c = 0
            while (c < dh) { acc += q(bi)(i)(off + c) * k(bi)(j)(off + c); c += 1 }
            acc / math.sqrt(dh.toDouble)
          }
          val pr = softmax(scores)
          if (pOut != null) pOut(bi)(h)(i) = pr
          var c = 0
          while (c < dh) {
            var acc = 0.0
            var j = 0
            while (j < p) { acc += pr(j) * v(bi)(j)(off + c); j += 1 }
            out(off + c) = acc
            c += 1
          }
          h += 1
        }
        out
      }
    }
  }

  /** Train on pooled stride-1 windows (reference fit,
    * llm_forecast.py:220-261): per-window normalization, Adam on MSE,
    * deterministic epoch shuffles. */
  def fit(series: Seq[Array[Double]], cfg: Cfg): Fit = {
    val seedC = DetRng.seedConst(cfg.seed)
    val nP = cfg.nPatches
    val usable = nP * cfg.patchLen
    val d = cfg.dModel
    val dh = d / cfg.nHeads
    val (xw, yw) = NBeats.buildWindows(series, cfg.inputSize, cfg.h, cfg.windowCap)
    require(xw.nonEmpty,
      s"No training windows; series need >= ${cfg.inputSize + cfg.h} points")
    // per-window stats normalize BOTH x and y (reference lines 230-233)
    val stats = xw.map(windowStats)
    val xn = Array.tabulate(xw.length)(i =>
      xw(i).map(v => (v - stats(i)._1) / stats(i)._2))
    val yn = Array.tabulate(yw.length)(i =>
      yw(i).map(v => (v - stats(i)._1) / stats(i)._2))

    val proj = new TDense(cfg.patchLen, d, seedC, 60)
    val proto = new Param(Array.tabulate(cfg.nProto * d)(i =>
      DetRng.gauss(seedC, DetRng.ctr(62, i >> 12, i & 4095)) * 0.02))
    val wq = new TDense(d, d, seedC, 64)
    val wk = new TDense(d, d, seedC, 66)
    val wv = new TDense(d, d, seedC, 68)
    val wo = new TDense(d, d, seedC, 70)
    val dec1 = new TDense(nP * d, d, seedC, 72)
    val dec2 = new TDense(d, cfg.h, seedC, 74)
    val opt = new Adam(Seq(proj, wq, wk, wv, wo, dec1, dec2).flatMap(_.params)
      ++ Seq(proto), cfg.lr)

    val protoMat = () => Array.tabulate(cfg.nProto)(j =>
      Array.tabulate(d)(c => proto.v(j * d + c)))
    val n = xn.length
    for (epoch <- 0 until cfg.maxEpochs;
         idx <- batches(shuffled(n, seedC, epoch), cfg.batchSize)) {
      val bN = idx.length
      val patches: Tok = idx.map { i =>
        val xt = xn(i).takeRight(usable)
        Array.tabulate(nP)(p => xt.slice(p * cfg.patchLen, (p + 1) * cfg.patchLen))
      }
      val tokens = proj.forward(patches, train = true)
      val pm = protoMat()
      val protoB: Tok = Array.fill(bN)(pm)
      val q = wq.forward(tokens, train = true)
      val k = wk.forward(protoB, train = true)
      val v = wv.forward(protoB, train = true)
      val pc = Array.ofDim[Array[Double]](bN, cfg.nHeads, nP)
      val heads = attnHeads(q, k, v, cfg.nHeads, pc)
      val attn = wo.forward(heads, train = true)
      val flat: Tok = attn.map(s => Array(s.flatten))
      val hid = dec1.forward(flat, train = true)
      val relu = hid.map(_.map(_.map(x => if (x > 0.0) x else 0.0)))
      val pred = dec2.forward(relu, train = true)
      // MSE grad
      val scale = 2.0 / (bN.toLong * cfg.h)
      val gPred: Tok = Array.tabulate(bN)(b => Array(Array.tabulate(cfg.h)(i =>
        scale * (pred(b)(0)(i) - yn(idx(b))(i)))))
      opt.zeroGrad()
      val gRelu = dec2.backward(gPred)
      val gHid: Tok = Array.tabulate(bN)(b => Array(Array.tabulate(d)(c =>
        if (relu(b)(0)(c) > 0.0) gRelu(b)(0)(c) else 0.0)))
      val gFlat = dec1.backward(gHid)
      val gAttn: Tok = gFlat.map(s => Array.tabulate(nP)(t =>
        s(0).slice(t * d, (t + 1) * d)))
      val gHeads = wo.backward(gAttn)
      // cross-attention backward: grads to q (→ tokens) and k/v (→ protos)
      val gq: Tok = Array.fill(bN, nP, d)(0.0)
      val gk: Tok = Array.fill(bN, cfg.nProto, d)(0.0)
      val gv: Tok = Array.fill(bN, cfg.nProto, d)(0.0)
      var bi = 0
      while (bi < bN) {
        var h = 0
        while (h < cfg.nHeads) {
          val off = h * dh
          val sc = 1.0 / math.sqrt(dh.toDouble)
          var i = 0
          while (i < nP) {
            val pr = pc(bi)(h)(i)
            val dP = Array.tabulate(cfg.nProto) { j =>
              var acc = 0.0
              var c = 0
              while (c < dh) { acc += gHeads(bi)(i)(off + c) * v(bi)(j)(off + c); c += 1 }
              acc
            }
            var j = 0
            while (j < cfg.nProto) {
              var c = 0
              while (c < dh) { gv(bi)(j)(off + c) += pr(j) * gHeads(bi)(i)(off + c); c += 1 }
              j += 1
            }
            var dot = 0.0
            j = 0
            while (j < cfg.nProto) { dot += dP(j) * pr(j); j += 1 }
            j = 0
            while (j < cfg.nProto) {
              val dS = pr(j) * (dP(j) - dot) * sc
              var c = 0
              while (c < dh) {
                gq(bi)(i)(off + c) += dS * k(bi)(j)(off + c)
                gk(bi)(j)(off + c) += dS * q(bi)(i)(off + c)
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
      val gTok = wq.backward(gq)
      val gProtoK = wk.backward(gk)
      val gProtoV = wv.backward(gv)
      // prototypes are shared across the batch: sum both paths
      bi = 0
      while (bi < bN) {
        var j = 0
        while (j < cfg.nProto) {
          var c = 0
          while (c < d) {
            proto.g(j * d + c) += gProtoK(bi)(j)(c) + gProtoV(bi)(j)(c)
            c += 1
          }
          j += 1
        }
        bi += 1
      }
      proj.backward(gTok)
      opt.step()
    }
    Fit(proj.toFit,
      Array.tabulate(cfg.nProto)(j => Array.tabulate(d)(c => proto.v(j * d + c))),
      wq.toFit, wk.toFit, wv.toFit, wo.toFit, dec1.toFit, dec2.toFit,
      cfg.nHeads, cfg.inputSize, cfg.patchLen, cfg.h)
  }

  /** Eval forward: raw series → RAW-scale h forecasts (accumulation
    * order shared with NeuralOracle.timeLlmSql). */
  def forward(f: Fit, ysRaw: Array[Double]): Array[Double] = {
    val ctx = edgeContext(ysRaw, f.inputSize)
    val (mu, sd) = windowStats(ctx)
    val xn = ctx.map(v => (v - mu) / sd)
    val nP = f.nPatches
    val usable = nP * f.patchLen
    val xt = xn.takeRight(usable)
    val tokens = Array.tabulate(nP)(p =>
      dense(f.proj, xt.slice(p * f.patchLen, (p + 1) * f.patchLen)))
    val q = tokens.map(dense(f.wq, _))
    val k = f.proto.map(dense(f.wk, _))
    val v = f.proto.map(dense(f.wv, _))
    val heads = attnHeads(Array(q), Array(k), Array(v), f.nHeads, null)(0)
    val attn = heads.map(dense(f.wo, _))
    val flat = attn.flatten
    val hid = dense(f.dec1, flat).map(x => if (x > 0.0) x else 0.0)
    dense(f.dec2, hid).map(v0 => v0 * sd + mu)
  }
}
