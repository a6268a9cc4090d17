package graft.kernels

import scala.util.Random

/** ROCKET / MiniRocket random-convolution features (reference
  * polars_ts/features/rocket.py:22-258). Pure per-series kernels; the op
  * layer broadcasts one seeded kernel bank to all executors so every
  * series sees identical kernels.
  */
object Rocket {

  final case class Kernel(weights: Array[Double], bias: Double, dilation: Int,
      padding: Int)

  /** Seeded random kernel bank (lengths ∈ {7,9,11}, N(0,1) weights
    * mean-centred, U(−1,1) bias, exponential dilation, optional padding). */
  def randomKernels(nKernels: Int, inputLen: Int, seed: Long = 42L): Array[Kernel] = {
    val rng = new Random(seed)
    Array.fill(nKernels) {
      val len = Array(7, 9, 11)(rng.nextInt(3))
      val w = Array.fill(len)(rng.nextGaussian())
      val mean = w.sum / len
      val weights = w.map(_ - mean)
      val bias = rng.nextDouble() * 2.0 - 1.0
      val maxExp = math.log((inputLen - 1).toDouble / (len - 1)) / math.log(2.0)
      val dilation = math.pow(2.0, rng.nextDouble() * math.max(maxExp, 0.0)).toInt.max(1)
      val padding = if (rng.nextBoolean()) ((len - 1) * dilation) / 2 else 0
      Kernel(weights, bias, dilation, padding)
    }
  }

  /** Apply one kernel: returns (ppv, max) of the dilated convolution. */
  def apply1(x: Array[Double], k: Kernel): (Double, Double) = {
    val n = x.length
    val len = k.weights.length
    val span = (len - 1) * k.dilation
    val start = -k.padding
    val end = n - 1 + k.padding - span
    var pos = 0; var mx = Double.NegativeInfinity; var cnt = 0
    var i = start
    while (i <= end) {
      var s = k.bias
      var j = 0
      while (j < len) {
        val idx = i + j * k.dilation
        if (idx >= 0 && idx < n) s += k.weights(j) * x(idx)
        j += 1
      }
      if (s > 0) pos += 1
      if (s > mx) mx = s
      cnt += 1
      i += 1
    }
    if (cnt == 0) (0.0, 0.0) else (pos.toDouble / cnt, mx)
  }

  /** Full ROCKET feature vector: [ppv_0, max_0, ppv_1, max_1, …]. */
  def transform(x: Array[Double], kernels: Array[Kernel]): Array[Double] = {
    val out = new Array[Double](kernels.length * 2)
    var i = 0
    while (i < kernels.length) {
      val (ppv, mx) = apply1(x, kernels(i))
      out(2 * i) = ppv; out(2 * i + 1) = mx
      i += 1
    }
    out
  }

  /** MiniRocket-style fixed bank: all C(9,3)=84 patterns of length 9 with
    * three +2 weights and six −1 weights, one dilation per pattern cycled
    * from {1,2,4,8}, bias = median of the pattern's own convolution
    * (reference rocket.py:141-258 samples bias from conv output). PPV-only
    * features, one per pattern. */
  def miniRocketTransform(x: Array[Double]): Array[Double] = {
    val combos = (for {
      a <- 0 until 9; b <- a + 1 until 9; c <- b + 1 until 9
    } yield (a, b, c)).toArray
    val dilations = Array(1, 2, 4, 8)
    val out = new Array[Double](combos.length)
    var ci = 0
    while (ci < combos.length) {
      val (a, b, c) = combos(ci)
      val w = Array.fill(9)(-1.0)
      w(a) = 2.0; w(b) = 2.0; w(c) = 2.0
      val dilation = dilations(ci % dilations.length)
      val span = 8 * dilation
      val n = x.length
      if (n > span) {
        val conv = new Array[Double](n - span)
        var i = 0
        while (i < n - span) {
          var s = 0.0
          var j = 0
          while (j < 9) { s += w(j) * x(i + j * dilation); j += 1 }
          conv(i) = s
          i += 1
        }
        val sortedConv = conv.clone()
        java.util.Arrays.sort(sortedConv)
        val bias = sortedConv(sortedConv.length / 2)
        var pos = 0
        i = 0
        while (i < conv.length) { if (conv(i) > bias) pos += 1; i += 1 }
        out(ci) = pos.toDouble / conv.length
      }
      ci += 1
    }
    out
  }
}

/** GARCH(1,1) via Nelder-Mead Gaussian MLE on returns + σ² recursion
  * forecast (reference polars_ts/volatility.py:25-174). */
object Garch {

  /** Negative log-likelihood of GARCH(1,1) params on returns. */
  private def nll(r: Array[Double], omega: Double, alpha: Double, beta: Double): Double = {
    if (omega <= 0 || alpha < 0 || beta < 0 || alpha + beta >= 1.0) return 1e12
    val n = r.length
    var varU = r.map(x => x * x).sum / n // unconditional init
    var ll = 0.0
    var t = 0
    var sigma2 = varU
    while (t < n) {
      if (t > 0) sigma2 = omega + alpha * r(t - 1) * r(t - 1) + beta * sigma2
      if (sigma2 <= 0) return 1e12
      ll += 0.5 * (math.log(2.0 * math.Pi) + math.log(sigma2) + r(t) * r(t) / sigma2)
      t += 1
    }
    ll
  }

  /** Nelder-Mead simplex minimization (standard reflection/expansion/
    * contraction/shrink coefficients). */
  def nelderMead(f: Array[Double] => Double, x0: Array[Double],
      step: Double = 0.05, maxIter: Int = 400, tol: Double = 1e-9): Array[Double] = {
    val d = x0.length
    var simplex = Array(x0) ++ (0 until d).map { i =>
      val p = x0.clone(); p(i) += step; p
    }
    var fv = simplex.map(f)
    var iter = 0
    while (iter < maxIter && (fv.max - fv.min) > tol) {
      val order = fv.zipWithIndex.sortBy(_._1).map(_._2)
      simplex = order.map(simplex)
      fv = order.map(fv)
      val centroid = new Array[Double](d)
      for (i <- 0 until d; j <- 0 until d) centroid(j) += simplex(i)(j) / d
      val worst = simplex(d)
      val refl = Array.tabulate(d)(j => centroid(j) + (centroid(j) - worst(j)))
      val fr = f(refl)
      if (fr < fv(0)) {
        val exp = Array.tabulate(d)(j => centroid(j) + 2.0 * (centroid(j) - worst(j)))
        val fe = f(exp)
        if (fe < fr) { simplex(d) = exp; fv(d) = fe } else { simplex(d) = refl; fv(d) = fr }
      } else if (fr < fv(d - 1)) { simplex(d) = refl; fv(d) = fr }
      else {
        val con = Array.tabulate(d)(j => centroid(j) + 0.5 * (worst(j) - centroid(j)))
        val fc = f(con)
        if (fc < fv(d)) { simplex(d) = con; fv(d) = fc }
        else {
          for (i <- 1 to d) {
            simplex(i) = Array.tabulate(d)(j => simplex(0)(j) + 0.5 * (simplex(i)(j) - simplex(0)(j)))
            fv(i) = f(simplex(i))
          }
        }
      }
      iter += 1
    }
    simplex(fv.zipWithIndex.minBy(_._1)._2)
  }

  /** Fit (omega, alpha, beta) on returns; h-step σ forecast. */
  def fitForecast(returns: Array[Double], h: Int): (Array[Double], Array[Double]) = {
    val v = returns.map(x => x * x).sum / math.max(returns.length, 1)
    val p0 = Array(0.1 * v, 0.1, 0.8)
    val p = nelderMead(x => nll(returns, x(0), x(1), x(2)), p0)
    val Array(omega, alpha, beta) = p
    // final in-sample sigma2
    var sigma2 = v
    var t = 1
    while (t < returns.length) {
      sigma2 = omega + alpha * returns(t - 1) * returns(t - 1) + beta * sigma2
      t += 1
    }
    val lastR = if (returns.nonEmpty) returns.last else 0.0
    val fc = new Array[Double](h)
    var s = omega + alpha * lastR * lastR + beta * sigma2
    var i = 0
    while (i < h) {
      fc(i) = math.sqrt(math.max(s, 0.0))
      s = omega + (alpha + beta) * s
      i += 1
    }
    (p, fc)
  }
}

/** Gaussian HMM regime detection via log-space Baum-Welch + posterior
  * decode (reference polars_ts/changepoint/regime.py:9-157). */
object Hmm {

  private def logSumExp(xs: Array[Double]): Double = {
    val m = xs.max
    if (m.isNegInfinity) m
    else m + math.log(xs.map(x => math.exp(x - m)).sum)
  }

  /** Fitted HMM parameters (log-space transition/initial). */
  case class HmmParams(means: Array[Double], vars: Array[Double],
      logPi: Array[Double], logA: Array[Array[Double]])

  /** Baum-Welch EM: fixed quantile-mean init, `nIter` iterations. Split
    * from [[decode]] so the correctness oracle can pin the fitted params
    * and replay only the forward-backward posterior (see OraclePins). */
  def fitParams(y: Array[Double], k: Int, nIter: Int = 30): HmmParams = {
    val n = y.length
    require(k >= 2, "k must be >= 2")
    // init: means from sorted quantiles, shared variance, uniform trans
    val sorted = y.clone(); java.util.Arrays.sort(sorted)
    val means = Array.tabulate(k)(i => sorted(((i + 0.5) / k * n).toInt.min(n - 1)))
    val gmean = y.sum / n
    val gvar = y.map(v => (v - gmean) * (v - gmean)).sum / n
    val vars = Array.fill(k)(math.max(gvar, 1e-8))
    val logPi = Array.fill(k)(math.log(1.0 / k))
    val logA = Array.fill(k, k)(0.0)
    for (i <- 0 until k; j <- 0 until k)
      logA(i)(j) = if (i == j) math.log(0.9) else math.log(0.1 / (k - 1))

    def logB(t: Int, s: Int): Double =
      -0.5 * (math.log(2.0 * math.Pi * vars(s)) + (y(t) - means(s)) * (y(t) - means(s)) / vars(s))

    (0 until nIter).foreach { _ =>
      // forward
      val la = Array.ofDim[Double](n, k)
      for (s <- 0 until k) la(0)(s) = logPi(s) + logB(0, s)
      for (t <- 1 until n; s <- 0 until k)
        la(t)(s) = logSumExp(Array.tabulate(k)(p => la(t - 1)(p) + logA(p)(s))) + logB(t, s)
      // backward
      val lb = Array.ofDim[Double](n, k)
      for (t <- n - 2 to 0 by -1; s <- 0 until k)
        lb(t)(s) = logSumExp(Array.tabulate(k)(q => logA(s)(q) + logB(t + 1, q) + lb(t + 1)(q)))
      val ll = logSumExp(la(n - 1))
      val gamma = Array.tabulate(n, k)((t, s) => math.exp(la(t)(s) + lb(t)(s) - ll))
      // M-step
      for (s <- 0 until k) {
        val w = (0 until n).map(t => gamma(t)(s)).sum
        if (w > 1e-10) {
          means(s) = (0 until n).map(t => gamma(t)(s) * y(t)).sum / w
          vars(s) = math.max((0 until n).map(t =>
            gamma(t)(s) * (y(t) - means(s)) * (y(t) - means(s))).sum / w, 1e-8)
        }
        logPi(s) = math.log(math.max(gamma(0)(s), 1e-12))
      }
      for (s <- 0 until k) {
        val denom = (0 until n - 1).map(t => gamma(t)(s)).sum
        for (q <- 0 until k) {
          val num = (0 until n - 1).map { t =>
            math.exp(la(t)(s) + logA(s)(q) + logB(t + 1, q) + lb(t + 1)(q) - ll)
          }.sum
          logA(s)(q) = math.log(math.max(num / math.max(denom, 1e-12), 1e-12))
        }
      }
    }
    HmmParams(means, vars, logPi, logA)
  }

  /** Posterior decode at fixed params: per-row (regime, prob), regimes
    * relabeled by ascending state mean for determinism. */
  def decode(y: Array[Double], p: HmmParams): Array[(Int, Double)] = {
    val n = y.length
    val k = p.means.length
    def logB(t: Int, s: Int): Double =
      -0.5 * (math.log(2.0 * math.Pi * p.vars(s)) + (y(t) - p.means(s)) * (y(t) - p.means(s)) / p.vars(s))
    val la = Array.ofDim[Double](n, k)
    for (s <- 0 until k) la(0)(s) = p.logPi(s) + logB(0, s)
    for (t <- 1 until n; s <- 0 until k)
      la(t)(s) = logSumExp(Array.tabulate(k)(q => la(t - 1)(q) + p.logA(q)(s))) + logB(t, s)
    val lb = Array.ofDim[Double](n, k)
    for (t <- n - 2 to 0 by -1; s <- 0 until k)
      lb(t)(s) = logSumExp(Array.tabulate(k)(q => p.logA(s)(q) + logB(t + 1, q) + lb(t + 1)(q)))
    val ll = logSumExp(la(n - 1))
    val gamma = Array.tabulate(n, k)((t, s) => math.exp(la(t)(s) + lb(t)(s) - ll))
    val order = p.means.zipWithIndex.sortBy(_._1).map(_._2)
    val rank = new Array[Int](k)
    order.zipWithIndex.foreach { case (orig, r) => rank(orig) = r }
    Array.tabulate(n) { t =>
      val s = (0 until k).maxBy(gamma(t)(_))
      (rank(s), gamma(t)(s))
    }
  }

  /** Fit a k-state Gaussian HMM; returns per-row (regime, prob) from the
    * posterior at the final fitted parameters. */
  def fit(y: Array[Double], k: Int, nIter: Int = 30, seed: Long = 42L): Array[(Int, Double)] = {
    if (y.length < k * 3) return Array.fill(y.length)((0, 1.0))
    decode(y, fitParams(y, k, nIter))
  }
}
