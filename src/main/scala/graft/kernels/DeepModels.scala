package graft.kernels

import NeuralNet._

/** Driver-side trainers for the deep tier: DEC / IDEC deep embedded
  * clustering (reference `polars_ts/clustering/deep_cluster.py:32-384`),
  * contrastive clustering (`clustering/contrastive.py:25-190`) and the
  * CNN classifiers (`classification/resnet_classifier.py:72-180`,
  * `inception_time.py:98-208`).
  *
  * Every fit is a pure function of (data, config): init, shuffling and
  * augmentation draws come from counter-based [[DetRng]], so a refit
  * reproduces the pinned fit exactly — the property the pin-the-fit /
  * replay-the-forward oracles depend on. Fits run on a driver-collected
  * bounded sample (the BPE/PQ-codebook discipline); inference is a
  * broadcast-spec narrow map (see ops.DeepClustering / ops.Classification).
  *
  * Known deviation from the reference (documented, torch-defined behavior
  * either way): contrastive training forwards both augmented views as ONE
  * 2B batch so batch-norm caches stay single-pass — the reference runs two
  * B-sized passes. Loss and architecture are identical.
  */
object DeepModels {

  /** Config shared by the deep clusterers (reference defaults:
    * embedding_dim 64, n_filters 32, 50+50 epochs, lr 1e-3, batch 32). */
  final case class DeepCfg(
      k: Int = 2,
      embeddingDim: Int = 64,
      nFilters: Int = 32,
      pretrainEpochs: Int = 50,
      finetuneEpochs: Int = 50,
      lr: Double = 1e-3,
      batchSize: Int = 32,
      gamma: Double = 0.1,
      seed: Long = 42L)

  /** Fit surface the oracle pins: the eval-mode encoder spec (ends at the
    * (embeddingDim, 1) bottleneck), normalization constants, the padded
    * length, and the assignment centroids. `labels` is the final
    * eval-mode argmax assignment per input row. */
  final case class DeepFit(
      spec: Seq[NOp],
      centroids: Array[Array[Double]],
      mean: Double,
      std: Double,
      seqLen: Int,
      labels: Array[Int],
      emb: Array[Array[Double]])

  /** 1D conv autoencoder (reference `_autoencoder.py:9-72`). */
  final class Autoencoder(seqLen: Int, embDim: Int, nF: Int, seedC: Long) {
    val encoder = new TSequential(Seq(
      new TConv(1, nF, 7, 3, seedC, 1), new TBn(nF), new TRelu,
      new TConv(nF, 2 * nF, 5, 2, seedC, 2), new TBn(2 * nF), new TRelu,
      new TConv(2 * nF, 2 * nF, 3, 1, seedC, 3), new TBn(2 * nF), new TRelu,
      new TGap))
    val fcEnc = new TLinear(2 * nF, embDim, seedC, 4)
    val fcDec = new TLinear(embDim, 2 * nF, seedC, 6)
    val up = new TUpsample(seqLen)
    val decoder = new TSequential(Seq(
      new TConvT(2 * nF, nF, 3, 1, seedC, 8), new TBn(nF), new TRelu,
      new TConvT(nF, 1, 3, 1, seedC, 9)))

    def encParams: Seq[Param] = encoder.params ++ fcEnc.params
    def allParams: Seq[Param] = encParams ++ fcDec.params ++ decoder.params

    def encode(x: Batch, train: Boolean): Batch =
      fcEnc.forward(encoder.forward(x, train), train)
    def decode(z: Batch, train: Boolean): Batch =
      decoder.forward(up.forward(fcDec.forward(z, train), train), train)

    /** Backprop: `gz` hits the bottleneck directly (clustering loss),
      * `gxhat` flows back through the decoder (reconstruction loss);
      * either may be null. Assumes the matching forwards ran last. */
    def backward(gz: Batch, gxhat: Batch): Unit = {
      var g = gz
      if (gxhat != null) {
        val gzRec = fcDec.backward(up.backward(decoder.backward(gxhat)))
        g = if (g == null) gzRec
        else Array.tabulate(g.length)(b => Array.tabulate(g(b).length)(c =>
          Array.tabulate(g(b)(c).length)(p => g(b)(c)(p) + gzRec(b)(c)(p))))
      }
      encoder.backward(fcEnc.backward(g))
    }

    /** Eval-mode encoder spec — what the oracle replays. */
    def encSpec: Seq[NOp] = encoder.evalOps ++ fcEnc.evalOps
  }

  /** Series → padded normalized (1, L) sample matrix + (mean, std). */
  def prep(series: Seq[Array[Double]]): (Array[Array[Double]], Double, Double, Int) = {
    val seqLen = series.map(_.length).max
    val x = series.map(padTo(_, seqLen)).toArray
    val (mu, sd) = meanStd(x)
    (x.map(_.map(v => (v - mu) / sd)), mu, sd, seqLen)
  }

  private def toBatch(x: Array[Array[Double]], idx: Array[Int]): Batch =
    idx.map(i => Array(x(i)))

  /** Student-t soft assignment q (α = 1) and its squared distances
    * (reference `_autoencoder.py:75-105`). */
  def studentT(z: Array[Double], mu: Array[Array[Double]]): (Array[Double], Array[Double]) = {
    val k = mu.length
    val d2 = Array.tabulate(k) { c =>
      var s = 0.0
      var j = 0
      while (j < z.length) { val t = z(j) - mu(c)(j); s += t * t; j += 1 }
      s
    }
    val num = d2.map(d => 1.0 / (1.0 + d))
    val sum = num.sum
    (num.map(_ / sum), d2)
  }

  /** Sharpened target distribution p from q (reference
    * `_autoencoder.py:108-115`): q² / column-sum, row-normalized. */
  def targetDistribution(q: Array[Array[Double]]): Array[Array[Double]] = {
    val k = q(0).length
    val colSum = Array.tabulate(k)(j => q.map(_(j)).sum)
    q.map { row =>
      val w = Array.tabulate(k)(j => row(j) * row(j) / colSum(j))
      val s = w.sum
      w.map(_ / s)
    }
  }

  /** DEC (idec = false) / IDEC (idec = true) fit. `series` must already be
    * in the caller's canonical (sorted-id) order. */
  def decFit(series: Seq[Array[Double]], cfg: DeepCfg, idec: Boolean): DeepFit = {
    require(cfg.k <= series.length,
      s"Cannot create ${cfg.k} clusters from ${series.length} time series")
    val seedC = DetRng.seedConst(cfg.seed)
    val (x, mu0, sd0, seqLen) = prep(series)
    val n = x.length
    val ae = new Autoencoder(seqLen, cfg.embeddingDim, cfg.nFilters, seedC)

    // Phase 1: pretrain on reconstruction MSE
    val pre = new Adam(ae.allParams, cfg.lr)
    for (epoch <- 0 until cfg.pretrainEpochs;
         idx <- batches(shuffled(n, seedC, epoch), cfg.batchSize)) {
      val xb = toBatch(x, idx)
      val xhat = ae.decode(ae.encode(xb, train = true), train = true)
      val scale = 2.0 / (idx.length.toLong * seqLen)
      val g = Array.tabulate(xb.length)(b => Array(Array.tabulate(seqLen)(p =>
        scale * (xhat(b)(0)(p) - xb(b)(0)(p)))))
      pre.zeroGrad()
      ae.backward(null, g)
      pre.step()
    }

    // k-means init of the clustering layer on eval-mode embeddings
    def encodeAll(): Array[Array[Double]] = {
      val spec = ae.encSpec
      x.map(s => evalVector(spec, Array(s)))
    }
    val mu = kmeans(encodeAll(), cfg.k, seedC)._2
    val muParam = new Param(Array.tabulate(cfg.k * cfg.embeddingDim)(i =>
      mu(i / cfg.embeddingDim)(i % cfg.embeddingDim)))
    def muRows: Array[Array[Double]] = Array.tabulate(cfg.k, cfg.embeddingDim)(
      (c, j) => muParam.v(c * cfg.embeddingDim + j))

    // Phase 2: fine-tune with KL(p ‖ q) (+ γ·MSE for IDEC)
    val ftParams = (if (idec) ae.allParams else ae.encParams) :+ muParam
    val ft = new Adam(ftParams, cfg.lr)
    for (epoch <- 0 until cfg.finetuneEpochs) {
      val qFull = encodeAll().map(z => studentT(z, muRows)._1)
      val pFull = targetDistribution(qFull)
      for (idx <- batches(shuffled(n, seedC, 100000 + epoch), cfg.batchSize)) {
        val xb = toBatch(x, idx)
        val zb = ae.encode(xb, train = true)
        val xhat = if (idec) ae.decode(zb, train = true) else null
        val mrows = muRows
        val bN = idx.length
        ft.zeroGrad() // before the loop below writes muParam.g directly
        val gz = Array.ofDim[Double](bN, cfg.embeddingDim, 1)
        var b = 0
        while (b < bN) {
          val z = Array.tabulate(cfg.embeddingDim)(j => zb(b)(j)(0))
          val (q, d2) = studentT(z, mrows)
          val p = pFull(idx(b))
          // dL/dq_j = −p_j / (q_j · B); through the softmax-style norm:
          // dL/dn_j = (g_j − Σ_l g_l q_l) / S with n_j = 1/(1+d2_j)
          val gq = Array.tabulate(cfg.k)(j => -p(j) / (q(j) * bN))
          var dot = 0.0
          var j = 0
          while (j < cfg.k) { dot += gq(j) * q(j); j += 1 }
          val sumN = d2.map(d => 1.0 / (1.0 + d)).sum
          j = 0
          while (j < cfg.k) {
            val nj = 1.0 / (1.0 + d2(j))
            val gn = (gq(j) - dot) / sumN
            val gd2 = -gn * nj * nj // dn/dd2 = −n²  (α = 1)
            var c = 0
            while (c < cfg.embeddingDim) {
              val diff = z(c) - mrows(j)(c)
              gz(b)(c)(0) += gd2 * 2.0 * diff
              muParam.g(j * cfg.embeddingDim + c) += -gd2 * 2.0 * diff
              c += 1
            }
            j += 1
          }
          b += 1
        }
        val gxhat = if (idec) {
          val scale = cfg.gamma * 2.0 / (bN.toLong * seqLen)
          Array.tabulate(bN)(b2 => Array(Array.tabulate(seqLen)(p =>
            scale * (xhat(b2)(0)(p) - xb(b2)(0)(p)))))
        } else null
        ae.backward(gz, gxhat)
        ft.step()
      }
    }

    // Final eval-mode assignment
    val spec = ae.encSpec
    val emb = x.map(s => evalVector(spec, Array(s)))
    val centers = muRows
    val labels = emb.map { z =>
      val (q, _) = studentT(z, centers)
      var best = 0
      var c = 1
      while (c < cfg.k) { if (q(c) > q(best)) best = c; c += 1 }
      best
    }
    DeepFit(spec, centers, mu0, sd0, seqLen, labels, emb)
  }

  // ====================== contrastive ================================

  final case class ContrastiveCfg(
      k: Int = 2,
      embeddingDim: Int = 64,
      projectionDim: Int = 32,
      nFilters: Int = 32,
      maxEpochs: Int = 50,
      lr: Double = 1e-3,
      batchSize: Int = 32,
      temperature: Double = 0.5,
      jitterSigma: Double = 0.1,
      scaleSigma: Double = 0.1,
      seed: Long = 42L)

  /** Contrastive clusterer (reference `contrastive.py:93-166`): NT-Xent
    * over two DetRng-augmented views, then k-means on the eval-mode
    * embeddings. */
  def contrastiveFit(series: Seq[Array[Double]], cfg: ContrastiveCfg): DeepFit = {
    require(cfg.k <= series.length,
      s"Cannot create ${cfg.k} clusters from ${series.length} time series")
    val seedC = DetRng.seedConst(cfg.seed)
    val (x, mu0, sd0, seqLen) = prep(series)
    val n = x.length
    val enc = new TSequential(Seq(
      new TConv(1, cfg.nFilters, 7, 3, seedC, 1), new TBn(cfg.nFilters), new TRelu,
      new TConv(cfg.nFilters, 2 * cfg.nFilters, 5, 2, seedC, 2), new TBn(2 * cfg.nFilters), new TRelu,
      new TConv(2 * cfg.nFilters, 2 * cfg.nFilters, 3, 1, seedC, 3), new TBn(2 * cfg.nFilters), new TRelu,
      new TGap))
    val fc = new TLinear(2 * cfg.nFilters, cfg.embeddingDim, seedC, 4)
    val proj = new TSequential(Seq(
      new TLinear(cfg.embeddingDim, cfg.embeddingDim, seedC, 10), new TRelu,
      new TLinear(cfg.embeddingDim, cfg.projectionDim, seedC, 12)))
    val opt = new Adam(enc.params ++ fc.params ++ proj.params, cfg.lr)

    // jitter (per element) + scaling (per sample), counter-keyed so draws
    // are independent of batch composition (reference _augmentation.py)
    def augment(view: Int, epoch: Int, i: Int, ys: Array[Double]): Array[Double] = {
      val t = epoch.toLong * 2048 + i
      val factor = 1.0 + cfg.scaleSigma * DetRng.gauss(seedC, DetRng.ctr(44 + view, t, 0))
      Array.tabulate(ys.length)(p =>
        (ys(p) + cfg.jitterSigma * DetRng.gauss(seedC, DetRng.ctr(42 + view, t, p + 1))) * factor)
    }

    for (epoch <- 0 until cfg.maxEpochs;
         idx <- batches(shuffled(n, seedC, epoch), cfg.batchSize)) {
      val bN = idx.length
      // one 2B pass: rows 0..B-1 = view 1, B..2B-1 = view 2
      val xb: Batch =
        (idx.zipWithIndex.map { case (i, _) => Array(augment(0, epoch, i, x(i))) } ++
         idx.zipWithIndex.map { case (i, _) => Array(augment(1, epoch, i, x(i))) }).toArray
      val z = proj.forward(fc.forward(enc.forward(xb, train = true), train = true), train = true)
      val d = cfg.projectionDim
      val zv = Array.tabulate(2 * bN, d)((b, j) => z(b)(j)(0))
      val gzv = ntXentGrad(zv, bN, cfg.temperature)
      val gz: Batch = Array.tabulate(2 * bN)(b => Array.tabulate(d)(j => Array(gzv(b)(j))))
      opt.zeroGrad()
      enc.backward(fc.backward(proj.backward(gz)))
      opt.step()
    }

    val spec = enc.evalOps ++ fc.evalOps
    val emb = x.map(s => evalVector(spec, Array(s)))
    val (labels, centers) = kmeans(emb, cfg.k, seedC)
    DeepFit(spec, centers, mu0, sd0, seqLen, labels, emb)
  }

  /** NT-Xent gradient wrt the raw (un-normalized) projections
    * (reference `_contrastive_loss.py:61-93`). Rows 0..B-1 and B..2B-1
    * are the positive pairs. */
  def ntXentGrad(z: Array[Array[Double]], bN: Int, tau: Double): Array[Array[Double]] = {
    val m = 2 * bN; val d = z(0).length
    val norm = z.map(r => math.max(math.sqrt(r.map(v => v * v).sum), 1e-12))
    val u = Array.tabulate(m, d)((i, j) => z(i)(j) / norm(i))
    // softmax over masked similarity rows
    val gS = Array.ofDim[Double](m, m)
    for (i <- 0 until m) {
      val s = Array.tabulate(m)(j => if (i == j) Double.NegativeInfinity
        else {
          var acc = 0.0
          var c = 0
          while (c < d) { acc += u(i)(c) * u(j)(c); c += 1 }
          acc / tau
        })
      val mx = s.max
      val ex = s.map(v => if (v == Double.NegativeInfinity) 0.0 else math.exp(v - mx))
      val sum = ex.sum
      val pos = if (i < bN) i + bN else i - bN
      for (j <- 0 until m if i != j)
        gS(i)(j) = (ex(j) / sum - (if (j == pos) 1.0 else 0.0)) / m
    }
    // dL/du_i = Σ_j (gS(i)(j) + gS(j)(i)) · u_j / τ, then through the
    // row normalization: (g − u (u·g)) / ‖z‖
    val gu = Array.ofDim[Double](m, d)
    for (i <- 0 until m; j <- 0 until m if i != j) {
      val w = (gS(i)(j) + gS(j)(i)) / tau
      var c = 0
      while (c < d) { gu(i)(c) += w * u(j)(c); c += 1 }
    }
    Array.tabulate(m, d) { (i, c) =>
      var dot = 0.0
      var cc = 0
      while (cc < d) { dot += u(i)(cc) * gu(i)(cc); cc += 1 }
      (gu(i)(c) - u(i)(c) * dot) / norm(i)
    }
  }

  // ====================== CNN classifiers ============================

  final case class ClassifierCfg(
      nFilters: Int = 64,
      maxEpochs: Int = 50,
      lr: Double = 1e-3,
      batchSize: Int = 32,
      seed: Long = 42L)

  final case class ClassifierFit(
      spec: Seq[NOp],
      classes: Array[String],
      mean: Double,
      std: Double,
      seqLen: Int)

  /** Shared trainer: `net` body (blocks) + GAP + linear head, softmax CE,
    * minibatch Adam (reference resnet_classifier.py:114-157 /
    * inception_time.py:140-185; their loaders shuffle with an unseeded
    * torch generator — here the shuffle is counter-keyed, deterministic). */
  private def trainClassifier(series: Seq[Array[Double]], labels: Seq[String],
      cfg: ClassifierCfg, body: TLayer, bodyOutC: Int, seedC: Long): ClassifierFit = {
    val (x, mu0, sd0, seqLen) = prep(series)
    val n = x.length
    val classes = labels.distinct.sorted.toArray
    val classIdx = classes.zipWithIndex.toMap
    val y = labels.map(classIdx).toArray
    val gap = new TGap
    val head = new TLinear(bodyOutC, classes.length, seedC, 30)
    val opt = new Adam(body.params ++ head.params, cfg.lr)
    for (epoch <- 0 until cfg.maxEpochs;
         idx <- batches(shuffled(n, seedC, epoch), cfg.batchSize)) {
      val xb = toBatch(x, idx)
      val logits = head.forward(gap.forward(body.forward(xb, train = true), train = true), train = true)
      val bN = idx.length
      val g: Batch = Array.tabulate(bN) { b =>
        val lo = Array.tabulate(classes.length)(j => logits(b)(j)(0))
        val mx = lo.max
        val ex = lo.map(v => math.exp(v - mx))
        val sum = ex.sum
        Array.tabulate(classes.length)(j =>
          Array((ex(j) / sum - (if (j == y(idx(b))) 1.0 else 0.0)) / bN))
      }
      opt.zeroGrad()
      body.backward(gap.backward(head.backward(g)))
      opt.step()
    }
    ClassifierFit(body.evalOps ++ gap.evalOps ++ head.evalOps,
      classes, mu0, sd0, seqLen)
  }

  /** 1D ResNet fit (reference resnet_classifier.py:53-69: three residual
    * blocks 1→f→2f→2f, GAP, linear head). */
  def resnetFit(series: Seq[Array[Double]], labels: Seq[String],
      cfg: ClassifierCfg): ClassifierFit = {
    val seedC = DetRng.seedConst(cfg.seed)
    val f = cfg.nFilters
    val body = new TSequential(Seq(
      new TResBlock(1, f, seedC, 1),
      new TResBlock(f, 2 * f, seedC, 10),
      new TResBlock(2 * f, 2 * f, seedC, 20)))
    trainClassifier(series, labels, cfg, body, 2 * f, seedC)
  }

  /** InceptionTime fit (reference inception_time.py:57-95: one Inception
    * block = three modules + residual, GAP, linear head). */
  def inceptionFit(series: Seq[Array[Double]], labels: Seq[String],
      cfg: ClassifierCfg): ClassifierFit = {
    val seedC = DetRng.seedConst(cfg.seed)
    val f = cfg.nFilters
    val body = new InceptionBlockLayer(1, f, seedC)
    trainClassifier(series, labels, cfg, body, 4 * f, seedC)
  }

  /** Inception block with residual (reference inception_time.py:57-79). */
  final class InceptionBlockLayer(inC: Int, nF: Int, seedC: Long) extends TLayer {
    val m1 = new TInception(inC, nF, seedC, 1)
    val m2 = new TInception(nF * 4, nF, seedC, 10)
    val m3 = new TInception(nF * 4, nF, seedC, 15)
    val residual = new TSequential(Seq(
      new TConv(inC, nF * 4, 1, 0, seedC, 20), new TBn(nF * 4)))
    override def params: Seq[Param] =
      m1.params ++ m2.params ++ m3.params ++ residual.params
    private var addCache: Batch = _
    private var mainLen = 0
    private var resLen = 0

    def forward(x: Batch, train: Boolean): Batch = {
      val a = m3.forward(m2.forward(m1.forward(x, train), train), train)
      val r = residual.forward(x, train)
      mainLen = a(0)(0).length
      resLen = r(0)(0).length
      val len = math.min(mainLen, resLen)
      val y = Array.tabulate(a.length)(b => Array.tabulate(a(b).length)(c =>
        Array.tabulate(len) { p =>
          val v = a(b)(c)(p) + r(b)(c)(p)
          if (v > 0.0) v else 0.0
        }))
      if (train) addCache = y
      y
    }

    def backward(gy: Batch): Batch = {
      val gAdd = Array.tabulate(gy.length)(b => Array.tabulate(gy(b).length)(c =>
        Array.tabulate(gy(b)(c).length)(p =>
          if (addCache(b)(c)(p) > 0.0) gy(b)(c)(p) else 0.0)))
      val gMain = m1.backward(m2.backward(m3.backward(
        NeuralNetPad.pad(gAdd, mainLen))))
      val gRes = residual.backward(NeuralNetPad.pad(gAdd, resLen))
      Array.tabulate(gMain.length)(b => Array.tabulate(gMain(b).length)(c =>
        Array.tabulate(gMain(b)(c).length)(p => gMain(b)(c)(p) + gRes(b)(c)(p))))
    }

    def evalOps: Seq[NOp] = Seq(NResidual(
      m1.evalOps ++ m2.evalOps ++ m3.evalOps, residual.evalOps))
  }
}

/** Zero-pad gradients back to a pre-trim length (residual plumbing). */
private[kernels] object NeuralNetPad {
  def pad(g: NeuralNet.Batch, len: Int): NeuralNet.Batch =
    g.map(_.map { ch =>
      if (ch.length >= len) ch
      else { val out = new Array[Double](len); System.arraycopy(ch, 0, out, 0, ch.length); out }
    })
}
