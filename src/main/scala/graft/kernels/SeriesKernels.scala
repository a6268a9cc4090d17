package graft.kernels

import scala.collection.mutable.ArrayBuffer

/** Special functions needed by the statistical kernels (log-gamma,
  * regularized incomplete gamma / chi-square survival). Standard
  * Lanczos + series/continued-fraction formulations (Numerical Recipes
  * style, public domain algorithms). */
object Special {
  private val lanczosG = 7.0
  private val lanczosCoef = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  /** log Γ(x) for x > 0 (Lanczos approximation). */
  def logGamma(x0: Double): Double = {
    if (x0 < 0.5)
      math.log(math.Pi / math.sin(math.Pi * x0)) - logGamma(1.0 - x0)
    else {
      val x = x0 - 1.0
      var a = lanczosCoef(0)
      val t = x + lanczosG + 0.5
      var i = 1
      while (i < lanczosCoef.length) { a += lanczosCoef(i) / (x + i); i += 1 }
      0.5 * math.log(2.0 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Regularized lower incomplete gamma P(a, x). */
  def gammaP(a: Double, x: Double): Double = {
    if (x <= 0.0) return 0.0
    if (x < a + 1.0) {
      // series expansion
      var ap = a
      var sum = 1.0 / a
      var del = sum
      var n = 0
      while (n < 500 && math.abs(del) >= math.abs(sum) * 1e-14) {
        ap += 1.0; del *= x / ap; sum += del; n += 1
      }
      sum * math.exp(-x + a * math.log(x) - logGamma(a))
    } else 1.0 - gammaQcf(a, x)
  }

  /** Regularized upper incomplete gamma Q(a, x) via continued fraction. */
  private def gammaQcf(a: Double, x: Double): Double = {
    val eps = 1e-14; val fpmin = 1e-300
    var b = x + 1.0 - a
    var c = 1.0 / fpmin
    var d = 1.0 / b
    var h = d
    var i = 1
    var cont = true
    while (i <= 500 && cont) {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b; if (math.abs(d) < fpmin) d = fpmin
      c = b + an / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < eps) cont = false
      i += 1
    }
    math.exp(-x + a * math.log(x) - logGamma(a)) * h
  }

  /** Chi-square survival function P(X > q) with k degrees of freedom. */
  def chi2Sf(q: Double, k: Double): Double =
    if (q <= 0.0) 1.0 else 1.0 - gammaP(k / 2.0, q / 2.0)
}

/** Exponential-smoothing forecast cores. Semantics: reference
  * src/ets.rs:12-110 (SES flat forecast, Holt linear extrapolation,
  * Holt-Winters additive/multiplicative with two-season init). */
object Ets {
  def ses(values: Array[Double], alpha: Double, h: Int): Array[Double] = {
    require(values.nonEmpty, "ses needs at least one observation")
    var level = values(0)
    var i = 1
    while (i < values.length) { level = alpha * values(i) + (1.0 - alpha) * level; i += 1 }
    Array.fill(h)(level)
  }

  def holt(values: Array[Double], alpha: Double, beta: Double, h: Int): Array[Double] = {
    require(values.length >= 2, "holt needs at least two observations")
    var level = values(0)
    var trend = values(1) - values(0)
    var i = 1
    while (i < values.length) {
      val prevLevel = level
      level = alpha * values(i) + (1.0 - alpha) * (level + trend)
      trend = beta * (level - prevLevel) + (1.0 - beta) * trend
      i += 1
    }
    Array.tabulate(h)(s => level + (s + 1) * trend)
  }

  def holtWinters(values: Array[Double], alpha: Double, beta: Double,
      gamma: Double, m: Int, additive: Boolean, h: Int): Array[Double] = {
    val n = values.length
    require(m >= 2 && n >= 2 * m, s"holt-winters needs >= 2 full seasons (m=$m, n=$n)")
    var sum1 = 0.0; var sum2 = 0.0
    var i = 0
    while (i < m) { sum1 += values(i); i += 1 }
    while (i < 2 * m) { sum2 += values(i); i += 1 }
    val avg1 = sum1 / m; val avg2 = sum2 / m
    var level = avg1
    var trend = (avg2 - avg1) / m
    val seasons = new Array[Double](m)
    i = 0
    while (i < m) {
      seasons(i) =
        if (additive) values(i) - avg1
        else if (avg1 != 0.0) values(i) / avg1 else 1.0
      i += 1
    }
    var t = m
    while (t < n) {
      val v = values(t)
      val sIdx = t % m
      val prevLevel = level
      if (additive) {
        level = alpha * (v - seasons(sIdx)) + (1.0 - alpha) * (level + trend)
        trend = beta * (level - prevLevel) + (1.0 - beta) * trend
        seasons(sIdx) = gamma * (v - level) + (1.0 - gamma) * seasons(sIdx)
      } else {
        level = (if (seasons(sIdx) != 0.0) alpha * (v / seasons(sIdx)) else alpha * v) +
          (1.0 - alpha) * (level + trend)
        trend = beta * (level - prevLevel) + (1.0 - beta) * trend
        seasons(sIdx) = gamma * (if (level != 0.0) v / level else 1.0) +
          (1.0 - gamma) * seasons(sIdx)
      }
      t += 1
    }
    Array.tabulate(h) { s =>
      val step = s + 1
      val sIdx = (n - 1 + step) % m
      if (additive) level + step * trend + seasons(sIdx)
      else (level + step * trend) * seasons(sIdx)
    }
  }
}

/** PELT changepoint detection with O(1) prefix-sum segment costs and
  * candidate pruning. Semantics: reference src/pelt.rs:12-160
  * (costs mean / var / meanvar; default penalty 2·ln n applied by caller). */
object Pelt {
  sealed trait Cost
  case object MeanCost extends Cost
  case object VarCost extends Cost
  case object MeanVarCost extends Cost

  def cost(name: String): Cost = name match {
    case "mean" => MeanCost
    case "var" => VarCost
    case "meanvar" => MeanVarCost
    case other => throw new IllegalArgumentException(
      s"Unknown cost '$other'. Choose from [mean, meanvar, var]")
  }

  /** Changepoint indices (1-based segment starts) for one series.
    *
    * `prune = false` disables PELT candidate pruning: exact optimal
    * partitioning by full O(n²) scan. The pruned path is minSize-aware
    * (the ruptures discipline): a candidate enters the scan list only
    * once it is admissible (`t - s >= minSize`), and a candidate
    * dominated at time t (`f(s) + segCost(s, t) > f(t)`) is removed only
    * after `t + minSize - 1`, because the dominating candidate t cannot
    * itself be used before `t + minSize`. With that delay the pruned
    * chain returns the same optimal partitioning as the exact scan
    * (standard PELT domination argument with K = 0 subadditive costs),
    * so prune=true is safe as the production default. */
  def detect(data: Array[Double], costModel: Cost, penalty: Double,
      minSize: Int = 2, prune: Boolean = true): Array[Long] = {
    val n = data.length
    if (n < 2 * minSize) return Array.empty
    val cumsum = new Array[Double](n + 1)
    val cumsumSq = new Array[Double](n + 1)
    var i = 0
    while (i < n) {
      cumsum(i + 1) = cumsum(i) + data(i)
      cumsumSq(i + 1) = cumsumSq(i) + data(i) * data(i)
      i += 1
    }
    def segMean(s: Int, e: Int): Double = {
      val cnt = e - s
      if (cnt == 0) 0.0 else (cumsum(e) - cumsum(s)) / cnt
    }
    def costMean(s: Int, e: Int): Double = {
      val cnt = (e - s).toDouble
      if (cnt == 0) 0.0
      else {
        val mu = segMean(s, e)
        (cumsumSq(e) - cumsumSq(s)) - cnt * mu * mu
      }
    }
    def costVar(s: Int, e: Int): Double = {
      val cnt = e - s
      if (cnt < 2) 0.0
      else {
        val nf = cnt.toDouble
        val mu = segMean(s, e)
        val v = ((cumsumSq(e) - cumsumSq(s)) - nf * mu * mu) / (nf - 1.0)
        if (v <= 0.0) 0.0 else nf * math.log(v)
      }
    }
    def segCost(s: Int, e: Int): Double = costModel match {
      case MeanCost => costMean(s, e)
      case VarCost => costVar(s, e)
      case MeanVarCost => costMean(s, e) + costVar(s, e)
    }

    val f = Array.fill(n + 1)(Double.PositiveInfinity)
    f(0) = -penalty
    val lastCp = new Array[Int](n + 1)
    // removeAt(s): first time the prune may actually drop s; a candidate
    // dominated at t may still be needed while the dominator t is itself
    // inadmissible, i.e. up to t + minSize - 1
    val removeAt = Array.fill(n + 1)(Int.MaxValue)
    var candidates = ArrayBuffer.empty[Int]
    var t = minSize
    while (t <= n) {
      candidates += t - minSize // just became admissible at t
      if (prune) candidates = candidates.filter(s => removeAt(s) > t)
      var bestCost = Double.PositiveInfinity
      var bestS = 0
      var ci = 0
      while (ci < candidates.length) {
        val s = candidates(ci)
        val c = f(s) + segCost(s, t) + penalty
        if (c < bestCost) { bestCost = c; bestS = s }
        ci += 1
      }
      f(t) = bestCost
      lastCp(t) = bestS
      if (prune) {
        var cj = 0
        while (cj < candidates.length) {
          val s = candidates(cj)
          // ruptures condition, K = penalty: var-model segment costs
          // n·log(v) are not K=0 subadditive (log v < 0 shrinks when a
          // point leaves a segment), so the prune keeps penalty slack
          if (removeAt(s) == Int.MaxValue &&
              f(s) + segCost(s, t) > f(t) + penalty)
            removeAt(s) = t + minSize
          cj += 1
        }
      }
      t += 1
    }
    val cps = ArrayBuffer.empty[Long]
    var idx = n
    while (idx > 0) {
      val prev = lastCp(idx)
      if (prev > 0) cps += prev.toLong
      idx = prev
    }
    cps.sorted.toArray
  }
}

/** Mann-Kendall normalized trend statistic S / (0.5·n·(n-1)), Fenwick-tree
  * O(n log n) with tie handling. Semantics: reference src/mann_kendall.rs:24-77. */
object MannKendall {
  def stat(vals: Array[Double]): Double = {
    val n = vals.length
    if (n < 2) return 0.0
    val unique = vals.distinct.sorted
    val bit = new Array[Long](unique.length + 1)
    def update(i0: Int): Unit = {
      var i = i0
      while (i < bit.length) { bit(i) += 1; i += i & (-i) }
    }
    def query(i0: Int): Long = {
      var i = i0; var s = 0L
      while (i > 0) { s += bit(i); i -= i & (-i) }
      s
    }
    var sStat = 0L
    var i = n - 1
    while (i >= 0) {
      val c = java.util.Arrays.binarySearch(unique, vals(i)) + 1
      val less = query(c - 1)
      val equal = query(c) - less
      sStat += (n - 1 - i).toLong - 2 * less - equal
      update(c)
      i -= 1
    }
    sStat.toDouble / (0.5 * n * (n - 1.0))
  }
}

/** Theil-Sen slope: median of all pairwise slopes (x_j - x_i)/(j - i).
  * Semantics: reference src/sens_slope.rs:20-49. */
object SensSlope {
  def slope(vals: Array[Double]): Double = {
    val n = vals.length
    if (n < 2) return 0.0
    val slopes = new Array[Double](n * (n - 1) / 2)
    var k = 0; var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        slopes(k) = (vals(j) - vals(i)) / (j - i)
        k += 1; j += 1
      }
      i += 1
    }
    java.util.Arrays.sort(slopes)
    val len = slopes.length
    if (len % 2 == 0) (slopes(len / 2 - 1) + slopes(len / 2)) / 2.0
    else slopes(len / 2)
  }
}

/** Autocorrelation diagnostics. Semantics: reference
  * polars_ts/diagnostics.py:11-201 (biased ACF with mean-centred products,
  * Durbin-Levinson PACF, Ljung-Box Q with chi-square p-value). */
object AcfKernels {
  /** ACF values for lags 0..maxLag (lag 0 = 1.0). */
  def acf(vals: Array[Double], maxLag: Int): Array[Double] = {
    val n = vals.length
    val mean = vals.sum / n
    var denom = 0.0
    var i = 0
    while (i < n) { val d = vals(i) - mean; denom += d * d; i += 1 }
    val L = math.min(maxLag, n - 1)
    val out = new Array[Double](L + 1)
    var k = 0
    while (k <= L) {
      var num = 0.0
      var t = 0
      while (t + k < n) { num += (vals(t) - mean) * (vals(t + k) - mean); t += 1 }
      out(k) = if (denom == 0.0) (if (k == 0) 1.0 else 0.0) else num / denom
      k += 1
    }
    out
  }

  /** PACF via Durbin-Levinson recursion from the ACF. Index 0 = 1.0. */
  def pacf(vals: Array[Double], maxLag: Int): Array[Double] = {
    val r = acf(vals, maxLag)
    val L = r.length - 1
    val out = new Array[Double](L + 1)
    out(0) = 1.0
    if (L == 0) return out
    val phi = Array.ofDim[Double](L + 1, L + 1)
    phi(1)(1) = r(1)
    out(1) = r(1)
    var k = 2
    while (k <= L) {
      var num = r(k)
      var j = 1
      while (j < k) { num -= phi(k - 1)(j) * r(k - j); j += 1 }
      var den = 1.0
      j = 1
      while (j < k) { den -= phi(k - 1)(j) * r(j); j += 1 }
      val pk = if (den == 0.0) 0.0 else num / den
      phi(k)(k) = pk
      j = 1
      while (j < k) { phi(k)(j) = phi(k - 1)(j) - pk * phi(k - 1)(k - j); j += 1 }
      out(k) = pk
      k += 1
    }
    out
  }

  /** Ljung-Box Q statistic and p-value for lags 1..maxLag. */
  def ljungBox(vals: Array[Double], maxLag: Int): (Double, Double) = {
    val n = vals.length
    val r = acf(vals, maxLag)
    val L = r.length - 1
    var q = 0.0
    var k = 1
    while (k <= L) { q += r(k) * r(k) / (n - k); k += 1 }
    q *= n * (n + 2.0)
    (q, Special.chi2Sf(q, L.toDouble))
  }
}

/** Bayesian Online Changepoint Detection, Normal-Inverse-Gamma conjugate
  * model with constant hazard 1/λ and Student-t predictive.
  * Semantics: reference polars_ts/changepoint/bocpd.py:11-157. */
object Bocpd {
  /** Per-row (run_length, changepoint_prob, is_changepoint).
    *
    * `pruneThreshold = 0` (default) keeps every run-length hypothesis —
    * the exact Adams–MacKay recursion, O(n²) time/O(n) state, the form
    * the DuckDB oracle replays bit-for-bit. A positive threshold drops
    * hypotheses whose posterior falls below it after each normalization
    * (the standard truncation from the reference implementation's
    * lineage), bounding the state to O(K) and the scan to O(n·K) — the
    * LONG-series form: at 1/hazard = 200 the surviving set is tens of
    * hypotheses, so a 10⁶-point series streams in one task instead of
    * dying quadratically. Posterior mass dropped per step is < K·ε and
    * the kept vector is renormalized, so at ε ≤ 1e-12 the emitted
    * 6-dp-rounded probabilities match the exact recursion. */
  def detect(data: Array[Double], hazardRate: Double = 200.0,
      muPrior: Double = 0.0, kappaPrior: Double = 1.0, alphaPrior: Double = 1.0,
      betaPrior: Double = 1.0, threshold: Double = 0.5,
      pruneThreshold: Double = 0.0): Array[(Int, Double, Boolean)] = {
    require(hazardRate > 0, "hazard_rate must be positive")
    require(pruneThreshold >= 0 && pruneThreshold < 1,
      "prune threshold must be in [0, 1)")
    val h = 1.0 / hazardRate
    val n = data.length
    val out = new Array[(Int, Double, Boolean)](n)
    var mu = Array(muPrior)
    var kappa = Array(kappaPrior)
    var alpha = Array(alphaPrior)
    var beta = Array(betaPrior)
    var rProbs = Array(1.0)
    var runLens = Array(0)
    var t = 0
    while (t < n) {
      val x = data(t)
      val len = rProbs.length
      val predProbs = new Array[Double](len)
      var i = 0
      while (i < len) {
        val dfT = 2.0 * alpha(i)
        val scale = beta(i) * (kappa(i) + 1.0) / (alpha(i) * kappa(i))
        val z = (x - mu(i)) * (x - mu(i)) / scale
        val logP = Special.logGamma((dfT + 1.0) / 2.0) - Special.logGamma(dfT / 2.0) -
          0.5 * math.log(math.Pi * dfT * scale) - (dfT + 1.0) / 2.0 * math.log1p(z / dfT)
        predProbs(i) = math.exp(logP)
        i += 1
      }
      var cpProb = 0.0
      val newR = new Array[Double](len + 1)
      val newRuns = new Array[Int](len + 1)
      i = 0
      while (i < len) {
        val rp = rProbs(i) * predProbs(i)
        newR(i + 1) = rp * (1.0 - h)
        newRuns(i + 1) = runLens(i) + 1
        cpProb += rp * h
        i += 1
      }
      newR(0) = cpProb
      newRuns(0) = 0
      var total = 0.0
      i = 0
      while (i < newR.length) { total += newR(i); i += 1 }
      if (total > 0) {
        i = 0
        while (i < newR.length) { newR(i) /= total; i += 1 }
      }
      var argmax = 0; var best = newR(0)
      i = 1
      while (i < newR.length) { if (newR(i) > best) { best = newR(i); argmax = i }; i += 1 }
      out(t) = (newRuns(argmax), newR(0), newR(0) > threshold)
      val nm = new Array[Double](len + 1); val nk = new Array[Double](len + 1)
      val na = new Array[Double](len + 1); val nb = new Array[Double](len + 1)
      nm(0) = muPrior; nk(0) = kappaPrior; na(0) = alphaPrior; nb(0) = betaPrior
      i = 0
      while (i < len) {
        nm(i + 1) = (kappa(i) * mu(i) + x) / (kappa(i) + 1.0)
        nk(i + 1) = kappa(i) + 1.0
        na(i + 1) = alpha(i) + 0.5
        nb(i + 1) = beta(i) + kappa(i) * (x - mu(i)) * (x - mu(i)) / (2.0 * (kappa(i) + 1.0))
        i += 1
      }
      if (pruneThreshold > 0) {
        // truncate: keep r = 0 (index 0) plus every hypothesis at or
        // above the threshold; compact in place and renormalize the
        // survivors so the vector stays a distribution
        var kept = 1
        i = 1
        while (i < newR.length) { if (newR(i) >= pruneThreshold) kept += 1; i += 1 }
        val pR = new Array[Double](kept); val pRuns = new Array[Int](kept)
        val pm = new Array[Double](kept); val pk = new Array[Double](kept)
        val pa = new Array[Double](kept); val pb = new Array[Double](kept)
        var w = 0
        i = 0
        while (i < newR.length) {
          if (i == 0 || newR(i) >= pruneThreshold) {
            pR(w) = newR(i); pRuns(w) = newRuns(i)
            pm(w) = nm(i); pk(w) = nk(i); pa(w) = na(i); pb(w) = nb(i)
            w += 1
          }
          i += 1
        }
        var keptSum = 0.0
        i = 0
        while (i < kept) { keptSum += pR(i); i += 1 }
        if (keptSum > 0) {
          i = 0
          while (i < kept) { pR(i) /= keptSum; i += 1 }
        }
        rProbs = pR; runLens = pRuns
        mu = pm; kappa = pk; alpha = pa; beta = pb
      } else {
        rProbs = newR; runLens = newRuns
        mu = nm; kappa = nk; alpha = na; beta = nb
      }
      t += 1
    }
    out
  }
}

/** FFT-based forecast: real DFT, keep DC + top-k harmonics by magnitude,
  * extrapolate cosines. Semantics: reference polars_ts/models/baselines.py:181-255.
  * Direct O(n²) real DFT — series in a panel are short; swap in a true FFT
  * if per-series length grows beyond ~10⁴. */
object FftForecast {
  def forecast(y: Array[Double], h: Int, nHarmonics: Int = 5): Array[Double] = {
    require(h > 0, "Horizon h must be a positive integer")
    require(nHarmonics > 0, "n_harmonics must be a positive integer")
    val n = y.length
    val nFreq = n / 2 + 1
    val re = new Array[Double](nFreq)
    val im = new Array[Double](nFreq)
    var k = 0
    while (k < nFreq) {
      var sr = 0.0; var si = 0.0
      var t = 0
      while (t < n) {
        val ang = -2.0 * math.Pi * k * t / n
        sr += y(t) * math.cos(ang)
        si += y(t) * math.sin(ang)
        t += 1
      }
      re(k) = sr; im(k) = si
      k += 1
    }
    // top nHarmonics among indices 1..nFreq-1 by magnitude (stable by index,
    // matching numpy argsort tie behaviour closely enough for distinct mags)
    val kTop = math.min(nHarmonics, nFreq - 1)
    val order = (1 until nFreq).sortBy(i => math.hypot(re(i), im(i)))
    val top = order.takeRight(kTop)
    Array.tabulate(h) { step =>
      val t = n + step
      var v = re(0) / n
      top.foreach { idx =>
        val mag = math.hypot(re(idx), im(idx))
        val phase = math.atan2(im(idx), re(idx))
        v += 2.0 * mag / n * math.cos(2.0 * math.Pi * (idx.toDouble / n) * t + phase)
      }
      v
    }
  }
}
