package graft.kernels

/** Series→matrix imaging transforms (reference polars_ts/imaging/):
  * Gramian angular fields, Markov transition fields, recurrence plots +
  * RQA. Pure per-series kernels returning row-major matrices.
  */
object Imaging {

  /** Min-max scale to [-1, 1] (constant series → 0). */
  def scaleToUnit(x: Array[Double]): Array[Double] = {
    val mn = x.min; val mx = x.max
    if (mx == mn) Array.fill(x.length)(0.0)
    else x.map(v => 2.0 * (v - mn) / (mx - mn) - 1.0)
  }

  /** Gramian Angular Summation Field: cos(φ_i + φ_j), φ = arccos(x̃)
    * (imaging/angular.py:50-115). */
  def gasf(x: Array[Double]): Array[Array[Double]] = {
    val phi = scaleToUnit(x).map(v => math.acos(math.max(-1.0, math.min(1.0, v))))
    Array.tabulate(x.length, x.length)((i, j) => math.cos(phi(i) + phi(j)))
  }

  /** Gramian Angular Difference Field: sin(φ_i − φ_j). */
  def gadf(x: Array[Double]): Array[Array[Double]] = {
    val phi = scaleToUnit(x).map(v => math.acos(math.max(-1.0, math.min(1.0, v))))
    Array.tabulate(x.length, x.length)((i, j) => math.sin(phi(i) - phi(j)))
  }

  /** Markov Transition Field over `q` quantile bins
    * (imaging/transition.py:52). */
  def mtf(x: Array[Double], q: Int = 8): Array[Array[Double]] = {
    val n = x.length
    val sorted = x.clone(); java.util.Arrays.sort(sorted)
    // quantile-bin membership (ties to lower bin, last bin inclusive)
    def bin(v: Double): Int = {
      var b = 0
      while (b < q - 1 && v > sorted(((b + 1).toDouble / q * (n - 1)).toInt)) b += 1
      b
    }
    val bins = x.map(bin)
    val w = Array.fill(q, q)(0.0)
    var t = 0
    while (t < n - 1) { w(bins(t))(bins(t + 1)) += 1.0; t += 1 }
    // row-normalize
    for (i <- 0 until q) {
      val s = w(i).sum
      if (s > 0) for (j <- 0 until q) w(i)(j) /= s
    }
    Array.tabulate(n, n)((i, j) => w(bins(i))(bins(j)))
  }

  /** Recurrence plot: 1 when |x_i − x_j| ≤ eps (imaging/recurrence.py:42). */
  def recurrencePlot(x: Array[Double], eps: Double): Array[Array[Double]] =
    Array.tabulate(x.length, x.length)((i, j) =>
      if (math.abs(x(i) - x(j)) <= eps) 1.0 else 0.0)

  /** RQA summary (recurrence.py:100-171): (recurrence_rate, determinism)
    * with determinism = share of recurrent points on diagonal lines of
    * length ≥ 2 (main diagonal excluded). */
  def rqa(x: Array[Double], eps: Double): (Double, Double) = {
    val n = x.length
    if (n < 2) return (0.0, 0.0)
    val r = recurrencePlot(x, eps)
    var recur = 0L; var diag = 0L
    for (i <- 0 until n; j <- 0 until n if i != j) {
      if (r(i)(j) > 0) {
        recur += 1
        val onLine = (i > 0 && j > 0 && r(i - 1)(j - 1) > 0) ||
          (i < n - 1 && j < n - 1 && r(i + 1)(j + 1) > 0)
        if (onLine) diag += 1
      }
    }
    val total = n.toLong * n - n
    (recur.toDouble / total, if (recur == 0) 0.0 else diag.toDouble / recur)
  }

  /** STFT spectrogram magnitude (reference imaging/spectral.py:15-38):
    * Hann-windowed segments with `noverlap` overlap, zero-extended ends,
    * one-sided DFT; optional log1p. Output (nperseg/2+1) × nFrames,
    * row-major flat with dims prepended [nFreq, nFrames, data...]. */
  def spectrogram(x: Array[Double], npersegIn: Int = 64,
      noverlapIn: Int = -1, logScale: Boolean = true): Array[Array[Double]] = {
    val nperseg = math.min(npersegIn, x.length)
    val noverlap = math.min(if (noverlapIn < 0) nperseg / 2 else noverlapIn,
      nperseg - 1)
    val hop = nperseg - noverlap
    // zero-extend by nperseg/2 on both ends (scipy stft boundary/padding)
    val pad = nperseg / 2
    val ext = new Array[Double](x.length + 2 * pad)
    System.arraycopy(x, 0, ext, pad, x.length)
    val window = Array.tabulate(nperseg)(i =>
      0.5 - 0.5 * math.cos(2.0 * math.Pi * i / nperseg))
    val nFreq = nperseg / 2 + 1
    val frames = (0 to ext.length - nperseg by hop).toArray
    val out = Array.ofDim[Double](nFreq, frames.length)
    for ((start, f) <- frames.zipWithIndex) {
      for (k <- 0 until nFreq) {
        var re = 0.0; var im = 0.0
        var i = 0
        while (i < nperseg) {
          val v = ext(start + i) * window(i)
          val ang = -2.0 * math.Pi * k * i / nperseg
          re += v * math.cos(ang); im += v * math.sin(ang)
          i += 1
        }
        val mag = math.sqrt(re * re + im * im)
        out(k)(f) = if (logScale) math.log1p(mag) else mag
      }
    }
    out
  }

  /** CWT scalogram magnitude (spectral.py:41-111): Morlet (complex) or
    * Ricker wavelet, 'same'-mode convolution per scale. Output
    * nScales × n. Scales default to log-spaced 1..n/4. */
  def scalogram(x: Array[Double], wavelet: String = "morlet",
      scalesIn: Array[Double] = Array.empty, nScales: Int = 16): Array[Array[Double]] = {
    val n = x.length
    val scales =
      if (scalesIn.nonEmpty) scalesIn
      else {
        val hi = math.max(n / 4.0, 2.0)
        Array.tabulate(nScales)(i =>
          math.exp(math.log(1.0) + (math.log(hi) - math.log(1.0)) * i /
            math.max(nScales - 1, 1)))
      }
    val out = Array.ofDim[Double](scales.length, n)
    for ((scale, si) <- scales.zipWithIndex) {
      val m = math.max(math.min(10 * math.ceil(scale).toInt, n), 1)
      // wavelet support [-m/2, m/2]
      val ts = Array.tabulate(m + 1)(i => (i - m / 2).toDouble)
      val (wRe, wIm) = wavelet match {
        case "morlet" | "morl" =>
          val norm = math.pow(math.Pi, -0.25)
          (ts.map(t => norm * math.cos(5.0 * t / scale) * math.exp(-0.5 * (t / scale) * (t / scale))),
            ts.map(t => norm * math.sin(5.0 * t / scale) * math.exp(-0.5 * (t / scale) * (t / scale))))
        case "ricker" | "mexh" =>
          val norm = 2.0 / (math.sqrt(3 * scale) * math.pow(math.Pi, 0.25))
          (ts.map { t0 => val t = t0 / scale; norm * (1 - t * t) * math.exp(-0.5 * t * t) },
            Array.fill(ts.length)(0.0))
        case other => throw new IllegalArgumentException(
          s"Unknown wavelet '$other'. Supported: morlet, ricker")
      }
      // 'same' convolution with the conjugate-reversed wavelet
      val half = wRe.length / 2
      var t = 0
      while (t < n) {
        var re = 0.0; var im = 0.0
        var j = 0
        while (j < wRe.length) {
          val idx = t + j - half
          if (idx >= 0 && idx < n) {
            re += x(idx) * wRe(j)
            im -= x(idx) * wIm(j) // conjugate
          }
          j += 1
        }
        out(si)(t) = math.sqrt(re * re + im * im)
        t += 1
      }
    }
    out
  }

  /** Truncated path signature with time augmentation (reference
    * imaging/signature.py:20-120, depth ≤ 3): iterated integrals over the
    * (t, x) path. Returns d + d² (+ d³) features, d = 2. */
  def pathSignature(x: Array[Double], depth: Int = 3): Array[Double] = {
    require(depth >= 1 && depth <= 3, "depth must be in [1, 3]")
    val n = x.length
    val d = 2
    // path = [(t_i, x_i)], increments
    val inc = Array.tabulate(math.max(n - 1, 0), d) { (i, c) =>
      if (c == 0) 1.0 / math.max(n - 1, 1) else x(i + 1) - x(i)
    }
    val m = inc.length
    val terms = scala.collection.mutable.ArrayBuffer.empty[Double]
    val s1 = Array.tabulate(d)(c => inc.map(_(c)).sum)
    terms ++= s1
    if (depth >= 2) {
      val cumsum = Array.ofDim[Double](m, d)
      for (t <- 0 until m; c <- 0 until d)
        cumsum(t)(c) = (if (t > 0) cumsum(t - 1)(c) else 0.0) + inc(t)(c)
      for (i <- 0 until d; j <- 0 until d) {
        var v = 0.0
        for (t <- 1 until m) v += cumsum(t - 1)(i) * inc(t)(j)
        terms += v
      }
    }
    if (depth >= 3) {
      for (i <- 0 until d; j <- 0 until d; k <- 0 until d) {
        var v = 0.0; var cumI = 0.0; var cumIj = 0.0
        for (t <- 0 until m) {
          cumIj += cumI * inc(t)(j)
          v += cumIj * inc(t)(k)
          cumI += inc(t)(i)
        }
        terms += v
      }
    }
    terms.toArray
  }
}

/** ARIMA-lite: ARIMA(p, d, 0) per series — d-fold differencing + AR(p)
  * OLS (small normal equations, Gaussian elimination) + recursive
  * forecast + integration back. The reference delegates SARIMA to
  * statsmodels (models/arima.py:95-182); this is the documented
  * JVM-native restriction (SURVEY §7.5 risk #6). */
object ArimaLite {

  /** Solve A x = b in place (partial pivoting); A is n×n row-major. */
  def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    for (col <- 0 until n) {
      var piv = col
      for (r <- col + 1 until n) if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val tb = b(col); b(col) = b(piv); b(piv) = tb
      val d = a(col)(col)
      if (math.abs(d) > 1e-12) {
        for (r <- col + 1 until n) {
          val f = a(r)(col) / d
          for (c <- col until n) a(r)(c) -= f * a(col)(c)
          b(r) -= f * b(col)
        }
      }
    }
    val x = new Array[Double](n)
    for (r <- n - 1 to 0 by -1) {
      var s = b(r)
      for (c <- r + 1 until n) s -= a(r)(c) * x(c)
      x(r) = if (math.abs(a(r)(r)) > 1e-12) s / a(r)(r) else 0.0
    }
    x
  }

  /** Fit AR(p)+intercept by OLS; returns coefficients [φ_1..φ_p, c]. */
  def arFit(y: Array[Double], p: Int): Array[Double] = {
    val n = y.length
    require(n > p + 1, s"series too short (n=$n) for AR($p)")
    val rows = n - p
    val dim = p + 1
    val xtx = Array.fill(dim, dim)(0.0)
    val xty = Array.fill(dim)(0.0)
    for (i <- 0 until rows) {
      val x = Array.tabulate(dim)(j => if (j < p) y(p + i - 1 - j) else 1.0)
      for (a <- 0 until dim) {
        xty(a) += x(a) * y(p + i)
        for (b <- 0 until dim) xtx(a)(b) += x(a) * x(b)
      }
    }
    solve(xtx, xty)
  }

  /** ARIMA(p,d,0) forecast h steps. */
  def forecast(y: Array[Double], p: Int, d: Int, h: Int): Array[Double] = {
    // difference d times, remembering last values for integration
    var cur = y
    val lastVals = new Array[Double](d)
    for (k <- 0 until d) {
      lastVals(k) = cur.last
      cur = cur.indices.drop(1).map(i => cur(i) - cur(i - 1)).toArray
    }
    val coef = arFit(cur, p)
    val buf = scala.collection.mutable.ArrayBuffer(cur: _*)
    val diffFc = (1 to h).map { _ =>
      var v = coef(p)
      for (j <- 0 until p) v += coef(j) * buf(buf.length - 1 - j)
      buf += v
      v
    }.toArray
    // integrate back d times
    var fc = diffFc
    for (k <- d - 1 to 0 by -1) {
      var acc = lastVals(k)
      fc = fc.map { v => acc += v; acc }
    }
    fc
  }
}
