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
