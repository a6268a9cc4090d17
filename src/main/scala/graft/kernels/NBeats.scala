package graft.kernels

import NeuralNet._

/** N-BEATS — neural basis expansion forecasting (Oreshkin et al., ICLR
  * 2020; reference `polars_ts/dl/nbeats.py:24-295`): stacks of blocks,
  * each producing a backcast (subtracted from the running residual) and
  * a forecast (summed into the output), with generic (learned basis),
  * polynomial-trend, and Fourier-seasonality block types.
  *
  * Same engineering contract as the rest of the neural tier: training is
  * a pure function of (windows, config) — DetRng init and shuffles,
  * hand-written backprop, driver-side over bounded sliding windows — and
  * the fitted blocks export plain weight matrices that the executor
  * predict UDF and the DuckDB oracle evaluate with identical
  * accumulation order (linear = bias + ascending terms; basis matmul =
  * ascending basis index; forecast = 0-seeded block-ascending sum;
  * ReLU = `if (v > 0) v else 0`). The trend/seasonality basis matrices
  * are computed once at fit time (JVM `pow`/`cos`/`sin`) and inlined as
  * literals on both sides, so no transcendental ever evaluates
  * cross-engine. */
object NBeats {

  final case class Cfg(
      h: Int = 12,
      inputSize: Int = 36,
      hiddenSize: Int = 128,
      nBlocks: Int = 3,
      stackTypes: Seq[String] = Seq("generic", "generic"),
      maxEpochs: Int = 100,
      lr: Double = 1e-3,
      batchSize: Int = 32,
      degree: Int = 3,
      nHarmonics: Int = 5,
      windowCap: Int = 8192,
      seed: Long = 42L)

  /** One fitted block: ReLU fc stack, theta heads, optional fixed basis
    * ((nBasis, len) matrices; None ⇒ generic, theta is the output). */
  final case class BlockFit(
      fc: Seq[(Array[Array[Double]], Array[Double])],
      thetaB: (Array[Array[Double]], Array[Double]),
      thetaF: (Array[Array[Double]], Array[Double]),
      basisBack: Option[Array[Array[Double]]],
      basisFore: Option[Array[Array[Double]]]) extends Serializable

  final case class Fit(blocks: Seq[BlockFit], mean: Double, std: Double,
      inputSize: Int, h: Int) extends Serializable

  /** torch.linspace(0, 1, n): endpoints included. */
  private def linspace(n: Int): Array[Double] =
    if (n == 1) Array(0.0) else Array.tabulate(n)(i => i.toDouble / (n - 1))

  /** Polynomial basis (degree+1, len): t^d. */
  def polyBasis(degree: Int, len: Int): Array[Array[Double]] = {
    val t = linspace(len)
    Array.tabulate(degree + 1, len)((d, i) => math.pow(t(i), d.toDouble))
  }

  /** Fourier basis (2·nHarmonics, len): cos rows then sin rows,
    * frequencies k·2π, k = 1..nHarmonics. */
  def fourierBasis(nHarmonics: Int, len: Int): Array[Array[Double]] = {
    val t = linspace(len)
    val cos = Array.tabulate(nHarmonics, len)((k, i) =>
      math.cos((k + 1) * 2.0 * math.Pi * t(i)))
    val sin = Array.tabulate(nHarmonics, len)((k, i) =>
      math.sin((k + 1) * 2.0 * math.Pi * t(i)))
    cos ++ sin
  }

  /** Training block (reference nbeats.py:24-103): fc stack of
    * (in→hid, relu) + 3×(hid→hid, relu), then theta heads. */
  private final class TBlock(kind: String, inputSize: Int, h: Int,
      hidden: Int, degree: Int, nHarm: Int, seedC: Long, stream: Long) {
    val fc = new TSequential(
      Seq(new TLinear(inputSize, hidden, seedC, stream), new TRelu) ++
      (0 until 3).flatMap(i =>
        Seq(new TLinear(hidden, hidden, seedC, stream + 2 + 2 * i), new TRelu)))
    val (nbB, nbF) = kind match {
      case "generic"     => (inputSize, h)
      case "trend"       => (degree + 1, degree + 1)
      case "seasonality" => (2 * nHarm, 2 * nHarm)
      case other => throw new IllegalArgumentException(s"unknown stack type $other")
    }
    val thetaB = new TLinear(hidden, nbB, seedC, stream + 10)
    val thetaF = new TLinear(hidden, nbF, seedC, stream + 12)
    val basisBack: Option[Array[Array[Double]]] = kind match {
      case "generic"     => None
      case "trend"       => Some(polyBasis(degree, inputSize))
      case "seasonality" => Some(fourierBasis(nHarm, inputSize))
    }
    val basisFore: Option[Array[Array[Double]]] = kind match {
      case "generic"     => None
      case "trend"       => Some(polyBasis(degree, h))
      case "seasonality" => Some(fourierBasis(nHarm, h))
    }
    def params: Seq[Param] = fc.params ++ thetaB.params ++ thetaF.params

    private var tbCache: Batch = _
    private var tfCache: Batch = _

    private def expand(theta: Batch, basis: Option[Array[Array[Double]]],
        len: Int): Batch = basis match {
      case None => theta
      case Some(bm) => theta.map { s =>
        Array.tabulate(len) { i =>
          var acc = 0.0
          var d = 0
          while (d < bm.length) { acc += s(d)(0) * bm(d)(i); d += 1 }
          Array(acc)
        }
      }
    }

    /** (backcast, forecast), both (B, len, 1). */
    def forward(x: Batch, train: Boolean): (Batch, Batch) = {
      val hdd = fc.forward(x, train)
      val tb = thetaB.forward(hdd, train)
      val tf = thetaF.forward(hdd, train)
      if (train) { tbCache = tb; tfCache = tf }
      (expand(tb, basisBack, inputSize), expand(tf, basisFore, h))
    }

    /** Accumulate param grads; return dL/dx. */
    def backward(gB: Batch, gF: Batch): Batch = {
      def contract(g: Batch, basis: Option[Array[Array[Double]]], nb: Int): Batch =
        basis match {
          case None => g
          case Some(bm) => g.map { s =>
            Array.tabulate(nb) { d =>
              var acc = 0.0
              var i = 0
              while (i < s.length) { acc += s(i)(0) * bm(d)(i); i += 1 }
              Array(acc)
            }
          }
        }
      val gTb = thetaB.backward(contract(gB, basisBack, nbB))
      val gTf = thetaF.backward(contract(gF, basisFore, nbF))
      val gH = Array.tabulate(gTb.length)(b => Array.tabulate(gTb(b).length)(c =>
        Array(gTb(b)(c)(0) + gTf(b)(c)(0))))
      fc.backward(gH)
    }

    def toFit: BlockFit = {
      def lin(l: TLinear): (Array[Array[Double]], Array[Double]) = {
        val Seq(NeuralNet.NLinear(w, b)) = l.evalOps
        (w, b)
      }
      BlockFit(fc.layers.collect { case l: TLinear => lin(l) },
        lin(thetaB), lin(thetaF), basisBack, basisFore)
    }
  }

  /** Sliding windows over every series in canonical order
    * (reference `_training.build_windows`), capped deterministically. */
  def buildWindows(series: Seq[Array[Double]], inputSize: Int, h: Int,
      cap: Int): (Array[Array[Double]], Array[Array[Double]]) = {
    val xs = Array.newBuilder[Array[Double]]
    val ys = Array.newBuilder[Array[Double]]
    var count = 0
    series.iterator.takeWhile(_ => count < cap).foreach { arr =>
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

  def fit(series: Seq[Array[Double]], cfg: Cfg): Fit = {
    val seedC = DetRng.seedConst(cfg.seed)
    val (xw, yw) = buildWindows(series, cfg.inputSize, cfg.h, cfg.windowCap)
    require(xw.nonEmpty,
      s"No training windows; series need >= ${cfg.inputSize + cfg.h} points")
    // global window normalization (reference nbeats.py:226-229)
    val (mu, sd) = meanStd(xw)
    val xn = xw.map(_.map(v => (v - mu) / sd))
    val yn = yw.map(_.map(v => (v - mu) / sd))
    val blocks = cfg.stackTypes.zipWithIndex.flatMap { case (st, si) =>
      (0 until cfg.nBlocks).map(bi =>
        new TBlock(st, cfg.inputSize, cfg.h, cfg.hiddenSize, cfg.degree,
          cfg.nHarmonics, seedC, (si * cfg.nBlocks + bi) * 16 + 1))
    }
    val opt = new Adam(blocks.flatMap(_.params), cfg.lr)
    val n = xn.length
    for (epoch <- 0 until cfg.maxEpochs;
         idx <- batches(shuffled(n, seedC, epoch), cfg.batchSize)) {
      val xb: Batch = idx.map(i => xn(i).map(Array(_)))
      val yb = idx.map(yn)
      // forward through the residual chain, remembering each residual
      var residual = xb
      val fcasts = Array.ofDim[Batch](blocks.length)
      blocks.zipWithIndex.foreach { case (blk, k) =>
        val (bc, fc0) = blk.forward(residual, train = true)
        fcasts(k) = fc0
        residual = Array.tabulate(residual.length)(b =>
          Array.tabulate(cfg.inputSize)(c => Array(residual(b)(c)(0) - bc(b)(c)(0))))
      }
      val bN = idx.length
      val pred = Array.tabulate(bN, cfg.h) { (b, i) =>
        var acc = 0.0
        var k = 0
        while (k < blocks.length) { acc += fcasts(k)(b)(i)(0); k += 1 }
        acc
      }
      val scale = 2.0 / (bN.toLong * cfg.h)
      val gF: Batch = Array.tabulate(bN)(b => Array.tabulate(cfg.h)(i =>
        Array(scale * (pred(b)(i) - yb(b)(i)))))
      opt.zeroGrad()
      // reverse pass: g_k = dL/dresidual_k; last residual is unused
      var gRes: Batch = Array.fill(bN)(Array.fill(cfg.inputSize)(Array(0.0)))
      blocks.indices.reverse.foreach { k =>
        val gB = gRes.map(_.map(c => Array(-c(0)))) // residual_k = r_{k-1} − b_k
        val gIn = blocks(k).backward(gB, gF)
        gRes = Array.tabulate(bN)(b => Array.tabulate(cfg.inputSize)(c =>
          Array(gRes(b)(c)(0) + gIn(b)(c)(0))))
      }
      opt.step()
    }
    Fit(blocks.map(_.toFit), mu, sd, cfg.inputSize, cfg.h)
  }

  /** Last `inputSize` values, LEADING-zero padded for short series
    * (reference nbeats.py:284-290). */
  def context(ys: Array[Double], inputSize: Int): Array[Double] = {
    val out = new Array[Double](inputSize)
    val n = math.min(ys.length, inputSize)
    var i = 0
    while (i < n) { out(inputSize - n + i) = ys(ys.length - n + i); i += 1 }
    out
  }

  /** Eval forward on one normalized context → RAW-scale h forecasts.
    * ACCUMULATION-ORDER CONTRACT with NeuralOracle.nbeatsSql. */
  def forward(f: Fit, ysRaw: Array[Double]): Array[Double] = {
    var residual = context(ysRaw, f.inputSize).map(v => (v - f.mean) / f.std)
    val forecast = new Array[Double](f.h)
    f.blocks.foreach { blk =>
      var hdd = residual
      blk.fc.foreach { case (w, b) =>
        hdd = Array.tabulate(w.length) { j =>
          var acc = b(j)
          var i = 0
          while (i < w(j).length) { acc += w(j)(i) * hdd(i); i += 1 }
          if (acc > 0.0) acc else 0.0
        }
      }
      def head(theta: (Array[Array[Double]], Array[Double]),
          basis: Option[Array[Array[Double]]], len: Int): Array[Double] = {
        val (w, b) = theta
        val th = Array.tabulate(w.length) { j =>
          var acc = b(j)
          var i = 0
          while (i < w(j).length) { acc += w(j)(i) * hdd(i); i += 1 }
          acc
        }
        basis match {
          case None => th
          case Some(bm) => Array.tabulate(len) { i =>
            var acc = 0.0
            var d = 0
            while (d < bm.length) { acc += th(d) * bm(d)(i); d += 1 }
            acc
          }
        }
      }
      val bc = head(blk.thetaB, blk.basisBack, f.inputSize)
      val fc = head(blk.thetaF, blk.basisFore, f.h)
      var i = 0
      while (i < f.inputSize) { residual(i) -= bc(i); i += 1 }
      i = 0
      while (i < f.h) { forecast(i) += fc(i); i += 1 }
    }
    forecast.map(v => v * f.std + f.mean)
  }
}
