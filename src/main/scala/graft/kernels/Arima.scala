package graft.kernels

/** ARMA(p,q) with drift via Hannan-Rissanen initialization + CSS
  * (conditional-sum-of-squares) Nelder-Mead refinement, and an AICc
  * stepwise-grid auto-ARIMA with KPSS-based differencing selection.
  *
  * Semantics follow the reference's auto_arima contract
  * (polars_ts/models/arima.py:23-91 — statsforecast AutoARIMA: choose d by
  * unit-root test, then (p,q) by AICc, forecast h steps) re-implemented
  * natively: the reference delegates to statsforecast/statsmodels, which
  * have no JVM equivalent, so the estimator here is CSS rather than full
  * state-space MLE — same model family, same selection criteria.
  */
object Arima {

  /** Conditional-SS residuals of ARMA(p,q) with intercept c.
    * e_t = y_t − c − Σφᵢy_{t−i} − Σθⱼe_{t−j}; first max(p,q) residuals
    * conditioned to zero. */
  def cssResiduals(y: Array[Double], phi: Array[Double], theta: Array[Double],
      c: Double): Array[Double] = {
    val n = y.length
    val p = phi.length
    val q = theta.length
    val m = math.max(p, q)
    val e = new Array[Double](n)
    var t = m
    while (t < n) {
      var pred = c
      var i = 0
      while (i < p) { pred += phi(i) * y(t - 1 - i); i += 1 }
      var j = 0
      while (j < q) { pred += theta(j) * e(t - 1 - j); j += 1 }
      e(t) = y(t) - pred
      t += 1
    }
    e
  }

  private def css(y: Array[Double], phi: Array[Double], theta: Array[Double],
      c: Double): Double = {
    val m = math.max(phi.length, theta.length)
    val e = cssResiduals(y, phi, theta, c)
    var s = 0.0
    var t = m
    while (t < y.length) { s += e(t) * e(t); t += 1 }
    s
  }

  /** Fitted ARMA: AR coefficients, MA coefficients, intercept, CSS, and
    * the effective sample size used by the CSS sum. */
  case class ArmaFit(phi: Array[Double], theta: Array[Double], c: Double,
      css: Double, nEff: Int) {
    def k: Int = phi.length + theta.length + 1
    /** AICc on the conditional Gaussian likelihood (variance profiled). */
    def aicc: Double = {
      val kk = k + 1 // + variance
      val base = nEff * math.log(math.max(css / nEff, 1e-300)) + 2.0 * kk
      if (nEff - kk - 1 > 0) base + 2.0 * kk * (kk + 1) / (nEff - kk - 1.0)
      else Double.PositiveInfinity
    }
  }

  /** Fit ARMA(p,q)+c by Hannan-Rissanen (long-AR residual proxy + OLS on
    * lags and lagged residuals), then CSS Nelder-Mead polish. */
  def fitArma(y: Array[Double], p: Int, q: Int): ArmaFit = {
    val n = y.length
    val m = math.max(p, q)
    require(n > m + p + q + 2, s"series too short (n=$n) for ARMA($p,$q)")
    // stage 1: long AR to proxy the innovations
    val e0: Array[Double] =
      if (q == 0) new Array[Double](n)
      else {
        val pLong = math.min(math.max(2 * (p + q), 4), n / 3)
        val arc = ArimaLite.arFit(y, pLong)
        val e = new Array[Double](n)
        var t = pLong
        while (t < n) {
          var pred = arc(pLong) // intercept
          var i = 0
          while (i < pLong) { pred += arc(i) * y(t - 1 - i); i += 1 }
          e(t) = y(t) - pred
          t += 1
        }
        e
      }
    // stage 2: OLS of y_t on [y lags, e0 lags, 1]
    val dim = p + q + 1
    val start = math.max(m, if (q == 0) p else math.min(math.max(2 * (p + q), 4), n / 3))
    val xtx = Array.fill(dim, dim)(0.0)
    val xty = Array.fill(dim)(0.0)
    var t = start
    while (t < n) {
      val x = new Array[Double](dim)
      var i = 0
      while (i < p) { x(i) = y(t - 1 - i); i += 1 }
      var j = 0
      while (j < q) { x(p + j) = e0(t - 1 - j); j += 1 }
      x(dim - 1) = 1.0
      var a = 0
      while (a < dim) {
        xty(a) += x(a) * y(t)
        var b = 0
        while (b < dim) { xtx(a)(b) += x(a) * x(b); b += 1 }
        a += 1
      }
      t += 1
    }
    val init = ArimaLite.solve(xtx, xty)
    // stage 3: CSS polish (skip when pure AR — OLS is already the optimum
    // of the conditional SS for AR(p))
    val x0 = init
    val best =
      if (q == 0) x0
      else Garch.nelderMead(v => {
        val phi = v.slice(0, p); val th = v.slice(p, p + q)
        // soft stationarity/invertibility guard
        if (phi.map(math.abs).sum > 4.0 || th.map(math.abs).sum > 4.0) 1e100
        else css(y, phi, th, v(p + q))
      }, x0, step = 0.05, maxIter = 300)
    val phi = best.slice(0, p)
    val th = best.slice(p, p + q)
    val cc = best(p + q)
    ArmaFit(phi, th, cc, css(y, phi, th, cc), n - m)
  }

  /** KPSS level-stationarity statistic with Bartlett long-run variance
    * (lags = ⌊4(n/100)^0.25⌋). Rejecting (stat > 0.463 at 5%) ⇒ difference. */
  def kpss(y: Array[Double]): Double = {
    val n = y.length
    if (n < 8) return 0.0
    val mean = y.sum / n
    val e = y.map(_ - mean)
    val s = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += e(i); s(i) = acc; i += 1 }
    val lags = math.max(1, (4.0 * math.pow(n / 100.0, 0.25)).toInt)
    var lrv = e.map(x => x * x).sum / n
    var l = 1
    while (l <= lags) {
      var g = 0.0
      var t = l
      while (t < n) { g += e(t) * e(t - l); t += 1 }
      lrv += 2.0 * (1.0 - l / (lags + 1.0)) * g / n
      l += 1
    }
    if (lrv <= 0.0) return 0.0
    s.map(x => x * x).sum / (n.toDouble * n * lrv)
  }

  private def diff(y: Array[Double]): Array[Double] =
    Array.tabulate(y.length - 1)(i => y(i + 1) - y(i))

  /** Choose d ∈ [0, maxD] by repeated KPSS tests (statsforecast ndiffs). */
  def selectD(y: Array[Double], maxD: Int = 2): Int = {
    var cur = y
    var d = 0
    while (d < maxD && kpss(cur) > 0.463 && cur.length > 10) {
      cur = diff(cur); d += 1
    }
    d
  }

  /** Order selection + fit: KPSS-selected d, then AICc grid over
    * p ∈ [0,maxP], q ∈ [0,maxQ] on the differenced series. */
  def autoFit(y: Array[Double], maxP: Int = 3, maxQ: Int = 3): (Int, Int, Int, ArmaFit) = {
    val d = selectD(y)
    var cur = y
    for (_ <- 0 until d) cur = diff(cur)
    var best: (Int, Int, ArmaFit) = null
    for (p <- 0 to maxP; q <- 0 to maxQ) {
      if (cur.length > math.max(p, q) + p + q + 4) {
        try {
          val f = fitArma(cur, p, q)
          if (best == null || f.aicc < best._3.aicc) best = (p, q, f)
        } catch { case _: Exception => }
      }
    }
    if (best == null) { val f = fitArma(cur, 0, 0); best = (0, 0, f) }
    (best._1, d, best._2, best._3)
  }

  /** h-step forecast from a fitted ARMA on the (already differenced)
    * series: recursion with future innovations zero. */
  def forecastArma(y: Array[Double], fit: ArmaFit, h: Int): Array[Double] = {
    val p = fit.phi.length
    val q = fit.theta.length
    val e = cssResiduals(y, fit.phi, fit.theta, fit.c)
    val ybuf = scala.collection.mutable.ArrayBuffer(y: _*)
    val ebuf = scala.collection.mutable.ArrayBuffer(e: _*)
    val out = new Array[Double](h)
    var s = 0
    while (s < h) {
      var pred = fit.c
      var i = 0
      while (i < p) { pred += fit.phi(i) * ybuf(ybuf.length - 1 - i); i += 1 }
      var j = 0
      while (j < q) {
        val idx = ebuf.length - 1 - j
        if (idx >= 0) pred += fit.theta(j) * ebuf(idx)
        j += 1
      }
      out(s) = pred
      ybuf += pred
      ebuf += 0.0
      s += 1
    }
    out
  }

  private def integrate(diffFc: Array[Double], lastVals: Array[Double]): Array[Double] = {
    var fc = diffFc
    var k = lastVals.length - 1
    while (k >= 0) {
      var acc = lastVals(k)
      fc = fc.map { v => acc += v; acc }
      k -= 1
    }
    fc
  }

  /** ARIMA(p,d,q) forecast: difference, fit, forecast, integrate back. */
  def forecast(y: Array[Double], p: Int, d: Int, q: Int, h: Int): Array[Double] = {
    var cur = y
    val lastVals = new Array[Double](d)
    var k = 0
    while (k < d) { lastVals(k) = cur.last; cur = diff(cur); k += 1 }
    integrate(forecastArma(cur, fitArma(cur, p, q), h), lastVals)
  }

  /** auto-ARIMA forecast (order selection + fit + integrate). */
  def autoForecast(y: Array[Double], h: Int, maxP: Int = 3, maxQ: Int = 3): Array[Double] = {
    val (_, d, _, fit) = autoFit(y, maxP, maxQ)
    var cur = y
    val lastVals = new Array[Double](d)
    var k = 0
    while (k < d) { lastVals(k) = cur.last; cur = diff(cur); k += 1 }
    integrate(forecastArma(cur, fit, h), lastVals)
  }
}
