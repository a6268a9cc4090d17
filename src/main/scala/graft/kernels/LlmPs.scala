package graft.kernels

import NeuralNet._

/** LLM-PS global forecaster kernel (reference
  * `polars_ts/adapters/llm_forecast.py:103-407`; "LLM-PS",
  * arXiv:2503.09656): parallel multi-scale Conv1d pattern extractors
  * (kernel sizes 3/5/7, ReLU, adaptive-average-pool-to-1) →
  * channel-concat → 2-layer MLP decoder, trained from scratch with
  * Adam on MSE over pooled per-window-normalized sliding windows. Like
  * Time-LLM, the reference's `_LLMPSNet` trains every parameter
  * locally — no pretrained weights — so the op is fully implementable.
  *
  * Built from the shared [[NeuralNet]] training layers; the trained net
  * exports a plain `Seq[NOp]` eval spec, so `NeuralOracle`'s generic
  * NOp renderer replays the full forward pass in DuckDB.
  *
  * Documented deviation (shared with the CNN-classifier tier): convs
  * are bias-free. After the GAP the bias would be a per-channel
  * constant; the decoder's first affine layer absorbs it up to the
  * ReLU nonlinearity inside the branch. Normalization follows the
  * reference exactly: per-window population std + 1e-8. */
object LlmPs {

  final case class Cfg(
      h: Int = 12,
      inputSize: Int = 36,
      kernelSizes: Seq[Int] = Seq(3, 5, 7),
      dModel: Int = 64,
      maxEpochs: Int = 50,
      lr: Double = 1e-3,
      batchSize: Int = 32,
      windowCap: Int = 8192,
      seed: Long = 42L) {
    require(kernelSizes.nonEmpty && kernelSizes.forall(_ >= 1))
    require(inputSize >= kernelSizes.max, "window shorter than largest kernel")
  }

  /** Trained net as an eval spec (NConcat of conv branches → NLinear →
    * NRelu → NLinear); per-window normalization happens outside the
    * spec, in [[forward]]. */
  final case class Fit(spec: Seq[NOp], inputSize: Int, h: Int)
      extends Serializable

  /** Train on pooled stride-1 windows (reference fit,
    * llm_forecast.py:343-381). */
  def fit(series: Seq[Array[Double]], cfg: Cfg): Fit = {
    val seedC = DetRng.seedConst(cfg.seed)
    val (xw, yw) = NBeats.buildWindows(series, cfg.inputSize, cfg.h, cfg.windowCap)
    require(xw.nonEmpty,
      s"No training windows; series need >= ${cfg.inputSize + cfg.h} points")
    val stats = xw.map(TimeLlm.windowStats)
    val xn = Array.tabulate(xw.length)(i =>
      xw(i).map(v => (v - stats(i)._1) / stats(i)._2))
    val yn = Array.tabulate(yw.length)(i =>
      yw(i).map(v => (v - stats(i)._1) / stats(i)._2))

    val nS = cfg.kernelSizes.length
    val convs = cfg.kernelSizes.zipWithIndex.map { case (k, i) =>
      new TConv(1, cfg.dModel, k, k / 2, seedC, 80 + 2 * i)
    }
    val relus = convs.map(_ => new TRelu)
    val gaps = convs.map(_ => new TGap)
    val dec1 = new TLinear(nS * cfg.dModel, cfg.dModel, seedC, 90)
    val dRelu = new TRelu
    val dec2 = new TLinear(cfg.dModel, cfg.h, seedC, 92)
    val opt = new Adam(convs.flatMap(_.params) ++ dec1.params ++ dec2.params,
      cfg.lr)

    val n = xn.length
    for (epoch <- 0 until cfg.maxEpochs;
         idx <- batches(shuffled(n, seedC, epoch), cfg.batchSize)) {
      val bN = idx.length
      val x0: Batch = idx.map(i => Array(xn(i)))
      // forward through each branch, concat pooled channels
      val branchOut = (0 until nS).map { s =>
        gaps(s).forward(relus(s).forward(convs(s).forward(x0, train = true),
          train = true), train = true)
      }
      val cat: Batch = Array.tabulate(bN)(b =>
        branchOut.flatMap(_(b)).toArray)
      val hid = dec1.forward(cat, train = true)
      val act = dRelu.forward(hid, train = true)
      val pred = dec2.forward(act, train = true)
      val scale = 2.0 / (bN.toLong * cfg.h)
      val gPred: Batch = Array.tabulate(bN)(b => Array.tabulate(cfg.h)(j =>
        Array(scale * (pred(b)(j)(0) - yn(idx(b))(j)))))
      opt.zeroGrad()
      val gCat = dec1.backward(dRelu.backward(dec2.backward(gPred)))
      // split channel grads back to branches; input grads all hit the
      // same window but conv weight grads are what training needs
      (0 until nS).foreach { s =>
        val gb: Batch = Array.tabulate(bN)(b =>
          Array.tabulate(cfg.dModel)(c => gCat(b)(s * cfg.dModel + c)))
        convs(s).backward(relus(s).backward(gaps(s).backward(gb)))
      }
      opt.step()
    }
    val spec = Seq(NConcat(convs.indices.map(s =>
      convs(s).evalOps ++ relus(s).evalOps ++ gaps(s).evalOps))) ++
      dec1.evalOps ++ Seq(NRelu) ++ dec2.evalOps
    Fit(spec, cfg.inputSize, cfg.h)
  }

  /** Eval forward: raw series → RAW-scale h forecasts. Edge-padded
    * context and per-window stats exactly as [[TimeLlm.forward]]. */
  def forward(f: Fit, ysRaw: Array[Double]): Array[Double] = {
    val ctx = TimeLlm.edgeContext(ysRaw, f.inputSize)
    val (mu, sd) = TimeLlm.windowStats(ctx)
    val xn = ctx.map(v => (v - mu) / sd)
    evalVector(f.spec, Array(xn)).map(v => v * sd + mu)
  }
}
