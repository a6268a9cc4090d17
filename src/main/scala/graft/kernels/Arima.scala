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

  /** Standard Theta method (θ=2, Assimakopoulos & Nikolopoulos 2000;
    * reference SCUM's DynamicOptimizedTheta sub-model family): OLS trend
    * line + SES (optimized α) on the θ=2 line 2y − line; forecast =
    * average of the SES flat forecast and the line extrapolation. */
  def thetaForecast(y: Array[Double], h: Int): Array[Double] = {
    val n = y.length
    require(n >= 3, "theta needs at least 3 observations")
    // OLS line a + b t
    val tMean = (n - 1) / 2.0
    val yMean = y.sum / n
    var num = 0.0; var den = 0.0
    var t = 0
    while (t < n) {
      num += (t - tMean) * (y(t) - yMean)
      den += (t - tMean) * (t - tMean)
      t += 1
    }
    val b = if (den > 0) num / den else 0.0
    val a = yMean - b * tMean
    val theta2 = Array.tabulate(n)(i => 2.0 * y(i) - (a + b * i))
    val alpha = optimizeSesAlpha(theta2)
    var level = theta2(0)
    var i = 1
    while (i < n) { level = alpha * theta2(i) + (1.0 - alpha) * level; i += 1 }
    Array.tabulate(h) { s =>
      val line = a + b * (n + s)
      0.5 * (level + line)
    }
  }

  /** One-step-SSE-optimal SES α by golden-section search on [0.01, 0.99]. */
  def optimizeSesAlpha(y: Array[Double]): Double = {
    def sse(alpha: Double): Double = {
      var level = y(0)
      var s = 0.0
      var i = 1
      while (i < y.length) {
        val e = y(i) - level
        s += e * e
        level = alpha * y(i) + (1.0 - alpha) * level
        i += 1
      }
      s
    }
    goldenMin(sse, 0.01, 0.99)
  }

  private def goldenMin(f: Double => Double, lo0: Double, hi0: Double,
      iters: Int = 40): Double = {
    val phi = (math.sqrt(5.0) - 1.0) / 2.0
    var lo = lo0; var hi = hi0
    var c = hi - phi * (hi - lo)
    var d = lo + phi * (hi - lo)
    var fc = f(c); var fd = f(d)
    var i = 0
    while (i < iters) {
      if (fc < fd) { hi = d; d = c; fd = fc; c = hi - phi * (hi - lo); fc = f(c) }
      else { lo = c; c = d; fc = fd; d = lo + phi * (hi - lo); fd = f(d) }
      i += 1
    }
    (lo + hi) / 2.0
  }

  /** Damped-trend Holt (Gardner-McKenzie): fixed φ, Nelder-Mead (α, β) on
    * one-step SSE. Forecast: level + (φ + φ² + … + φ^s)·trend. */
  def dampedHoltForecast(y: Array[Double], h: Int, phi: Double = 0.9): Array[Double] = {
    require(y.length >= 3, "damped holt needs at least 3 observations")
    def sse(params: Array[Double]): Double = {
      val alpha = 1.0 / (1.0 + math.exp(-params(0)))
      val beta = 1.0 / (1.0 + math.exp(-params(1)))
      var level = y(0)
      var trend = y(1) - y(0)
      var s = 0.0
      var i = 1
      while (i < y.length) {
        val pred = level + phi * trend
        val e = y(i) - pred
        s += e * e
        val prevLevel = level
        level = alpha * y(i) + (1.0 - alpha) * (level + phi * trend)
        trend = beta * (level - prevLevel) + (1.0 - beta) * phi * trend
        i += 1
      }
      s
    }
    val best = Garch.nelderMead(sse, Array(0.0, -2.0), step = 0.5, maxIter = 150)
    val alpha = 1.0 / (1.0 + math.exp(-best(0)))
    val beta = 1.0 / (1.0 + math.exp(-best(1)))
    var level = y(0)
    var trend = y(1) - y(0)
    var i = 1
    while (i < y.length) {
      val prevLevel = level
      level = alpha * y(i) + (1.0 - alpha) * (level + phi * trend)
      trend = beta * (level - prevLevel) + (1.0 - beta) * phi * trend
      i += 1
    }
    Array.tabulate(h) { s =>
      var damp = 0.0
      var j = 1
      while (j <= s + 1) { damp += math.pow(phi, j); j += 1 }
      level + damp * trend
    }
  }

  /** auto-ETS fitted state: AICc-winning model (0=SES, 1=Holt, 2=HW) plus
    * the optimized smoothing weights of every fitted candidate (unfitted
    * slots 0.0). Split out of [[autoEtsForecast]] so the correctness
    * oracle can pin the fitted weights as SQL literals and replay only
    * the smoothing recursion (the NM search stays in Scala). */
  case class AutoEtsFit(choice: Int, sesAlpha: Double,
      holtAlpha: Double, holtBeta: Double,
      hwAlpha: Double, hwBeta: Double, hwGamma: Double)

  def autoEtsFit(y: Array[Double], m: Int = 1): AutoEtsFit = {
    val n = y.length
    case class Cand(id: Int, k: Int, sse: Double)
    val cands = scala.collection.mutable.ArrayBuffer.empty[Cand]
    // SES
    val alphaS = optimizeSesAlpha(y)
    var level = y(0); var s = 0.0
    for (i <- 1 until n) { val e = y(i) - level; s += e * e
      level = alphaS * y(i) + (1.0 - alphaS) * level }
    cands += Cand(0, 2, s)
    var ah = 0.0; var bb = 0.0
    if (n >= 3) {
      // Holt via NM on (alpha, beta)
      def holtSse(p: Array[Double]): Double = {
        val a = 1.0 / (1.0 + math.exp(-p(0)))
        val b = 1.0 / (1.0 + math.exp(-p(1)))
        var l = y(0); var t = y(1) - y(0); var acc = 0.0
        for (i <- 1 until n) {
          val e = y(i) - (l + t); acc += e * e
          val pl = l
          l = a * y(i) + (1.0 - a) * (l + t)
          t = b * (l - pl) + (1.0 - b) * t
        }
        acc
      }
      val bh = Garch.nelderMead(holtSse, Array(0.0, -2.0), step = 0.5, maxIter = 150)
      ah = 1.0 / (1.0 + math.exp(-bh(0)))
      bb = 1.0 / (1.0 + math.exp(-bh(1)))
      cands += Cand(1, 4, holtSse(bh))
    }
    var aw = 0.0; var bwb = 0.0; var gw = 0.0
    if (m >= 2 && n >= 2 * m + 3) {
      def hwSse(p: Array[Double]): Double = {
        val a = 1.0 / (1.0 + math.exp(-p(0)))
        val b = 1.0 / (1.0 + math.exp(-p(1)))
        val g = 1.0 / (1.0 + math.exp(-p(2)))
        var acc = 0.0
        var sum1 = 0.0; var sum2 = 0.0
        for (i <- 0 until m) sum1 += y(i)
        for (i <- m until 2 * m) sum2 += y(i)
        var l = sum1 / m
        var t = (sum2 / m - sum1 / m) / m
        val sea = Array.tabulate(m)(i => y(i) - sum1 / m)
        for (ti <- m until n) {
          val si = ti % m
          val e = y(ti) - (l + t + sea(si)); acc += e * e
          val pl = l
          l = a * (y(ti) - sea(si)) + (1.0 - a) * (l + t)
          t = b * (l - pl) + (1.0 - b) * t
          sea(si) = g * (y(ti) - l) + (1.0 - g) * sea(si)
        }
        acc
      }
      val bw = Garch.nelderMead(hwSse, Array(0.0, -2.0, -2.0), step = 0.5, maxIter = 200)
      aw = 1.0 / (1.0 + math.exp(-bw(0)))
      bwb = 1.0 / (1.0 + math.exp(-bw(1)))
      gw = 1.0 / (1.0 + math.exp(-bw(2)))
      cands += Cand(2, 5 + m, hwSse(bw))
    }
    def aicc(c: Cand): Double = {
      val nEff = n - 1
      val base = nEff * math.log(math.max(c.sse / nEff, 1e-300)) + 2.0 * c.k
      if (nEff - c.k - 1 > 0) base + 2.0 * c.k * (c.k + 1) / (nEff - c.k - 1.0)
      else Double.PositiveInfinity
    }
    AutoEtsFit(cands.minBy(aicc).id, alphaS, ah, bb, aw, bwb, gw)
  }

  /** auto-ETS lite (reference SCUM's AutoETS sub-model): optimize SES,
    * Holt and (when ≥ 2 seasons) additive Holt-Winters on one-step SSE,
    * select by AICc, forecast with the winner. */
  def autoEtsForecast(y: Array[Double], h: Int, m: Int = 1): Array[Double] = {
    val f = autoEtsFit(y, m)
    f.choice match {
      case 0 => Ets.ses(y, f.sesAlpha, h)
      case 1 => Ets.holt(y, f.holtAlpha, f.holtBeta, h)
      case _ => Ets.holtWinters(y, f.hwAlpha, f.hwBeta, f.hwGamma, m, true, h)
    }
  }

  /** Minimal non-seasonal Complex Exponential Smoothing (Svetunkov &
    * Kourentzes, "Complex exponential smoothing"; the reference SCUM's
    * AutoCES leg, scum.py:15 — statsforecast AutoCES at season_length=1
    * reduces to the "none"-seasonality CES). Real-valued transition of
    * the complex level ℓ = l + i·c:
    *   ŷ_t = l_{t−1};  e_t = y_t − ŷ_t
    *   l_t = l_{t−1} − (1−α1)·c_{t−1} + (α0−α1)·e_t
    *   c_t = l_{t−1} + (1−α0)·c_{t−1} + (α0+α1)·e_t
    * (α0, α1) fitted by Nelder-Mead on one-step SSE from the classic
    * (1.3, 1.0) init; forecasting iterates the transition with e = 0. */
  private def cesRun(y: Array[Double], a0: Double, a1: Double)
      : (Double, Double, Double) = {
    var l = y(0); var c = y(1) - y(0); var s = 0.0
    var t = 1
    while (t < y.length) {
      val e = y(t) - l
      s += e * e
      val pl = l
      l = pl - (1.0 - a1) * c + (a0 - a1) * e
      c = pl + (1.0 - a0) * c + (a0 + a1) * e
      t += 1
    }
    (l, c, s)
  }

  /** CES smoothing-parameter fit (the NM search [[cesForecast]] runs) —
    * exposed so OraclePins can pin the identical (a0, a1). */
  def cesFit(y: Array[Double]): Array[Double] =
    Garch.nelderMead(p => {
      val s = cesRun(y, p(0), p(1))._3
      if (s.isNaN || s.isInfinite) 1e100 else s
    }, Array(1.3, 1.0), step = 0.1, maxIter = 200)

  def cesForecast(y: Array[Double], h: Int): Array[Double] = {
    require(y.length >= 3, "ces needs at least 3 observations")
    val best = cesFit(y)
    val (l0, c0, _) = cesRun(y, best(0), best(1))
    var l = l0; var c = c0
    Array.tabulate(h) { _ =>
      val out = l
      val pl = l
      l = pl - (1.0 - best(1)) * c
      c = pl + (1.0 - best(0)) * c
      out
    }
  }

  /** SCUM ensemble (reference models/scum.py:10-68): elementwise mean of
    * the four auto sub-model families — auto-ARIMA, auto-ETS, CES, and
    * Theta (the reference's DynamicOptimizedTheta leg) — matching the
    * reference's median-of-four composition model-for-model. */
  def scumForecast(y: Array[Double], h: Int, m: Int = 1): Array[Double] = {
    val subs = Array(
      autoForecast(y, h, maxP = 2, maxQ = 2),
      autoEtsForecast(y, h, m),
      cesForecast(y, h),
      thetaForecast(y, h))
    Array.tabulate(h)(s => subs.map(_(s)).sum / subs.length)
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
