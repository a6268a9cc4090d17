package graft.kernels

import breeze.linalg.{cholesky, inv, DenseMatrix, DenseVector}

/** Bayesian state-space kernels (reference polars_ts/bayesian/): matrix
  * Kalman filter/smoother, BSTS, UKF, EnKF, particle filter, MH-MCMC
  * forecaster, Normal-Inverse-Gamma online anomaly scoring, and GP
  * regression. All are per-series cores executed inside grouped-panel
  * UDFs — the panel parallelism is across series, each kernel is O(series)
  * local work. */
object Bayesian {

  /** splitmix64-based deterministic RNG (seedable, serializable-free). */
  final class Rng(seed: Long) {
    private var s = seed
    def nextDouble(): Double = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z >>> 11).toDouble / (1L << 53).toDouble
    }
    /** Box-Muller standard normal. */
    def nextGaussian(): Double = {
      var u1 = nextDouble()
      if (u1 < 1e-300) u1 = 1e-300
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * nextDouble())
    }
  }

  // ── matrix Kalman filter + RTS smoother (bayesian/kalman.py) ───────────

  case class KalmanOut(filtered: Array[DenseVector[Double]],
      filteredCov: Array[DenseMatrix[Double]],
      predicted: Array[DenseVector[Double]],
      predictedCov: Array[DenseMatrix[Double]],
      smoothed: Array[DenseVector[Double]],
      logLik: Double)

  /** Linear-Gaussian filter + RTS smoother for scalar observations.
    * NaN observations are treated as missing (predict-only step). */
  def kalmanSmooth(y: Array[Double], f: DenseMatrix[Double],
      h: DenseMatrix[Double], q: DenseMatrix[Double], r: Double,
      x0: DenseVector[Double], p0: DenseMatrix[Double]): KalmanOut = {
    val t = y.length
    val n = x0.length
    val xf = new Array[DenseVector[Double]](t)
    val pf = new Array[DenseMatrix[Double]](t)
    val xp = new Array[DenseVector[Double]](t)
    val pp = new Array[DenseMatrix[Double]](t)
    var x = x0.copy
    var p = p0.copy
    var ll = 0.0
    var i = 0
    while (i < t) {
      val xPred = f * x
      val pPred = f * p * f.t + q
      xp(i) = xPred; pp(i) = pPred
      if (y(i).isNaN) { x = xPred; p = pPred }
      else {
        val hx = h * xPred
        val yPred = hx(0)
        val hph = h * pPred * h.t
        val s = hph(0, 0) + r
        val k = (pPred * h.t) / s
        val innov = y(i) - yPred
        x = xPred + k(::, 0) * innov
        p = pPred - k * h * pPred
        ll += -0.5 * (math.log(2 * math.Pi * s) + innov * innov / s)
      }
      xf(i) = x.copy; pf(i) = p.copy
      i += 1
    }
    // RTS smoother
    val xs = new Array[DenseVector[Double]](t)
    if (t > 0) {
      xs(t - 1) = xf(t - 1)
      var j = t - 2
      while (j >= 0) {
        val c = pf(j) * f.t * breeze.linalg.pinv(pp(j + 1))
        xs(j) = xf(j) + c * (xs(j + 1) - xp(j + 1))
        j -= 1
      }
    }
    KalmanOut(xf, pf, xp, pp, xs, ll)
  }

  /** Linear-Gaussian filter + Durbin–Koopman state smoother (Durbin &
    * Koopman 2012 §4.4.4, eq. 4.44) for scalar observations — the same
    * smoothed means as [[kalmanSmooth]]'s RTS pass in exact arithmetic
    * (KalmanDkSpec pins the agreement), but the backward recursion is
    * matrix-VECTOR only:
    *
    *   r_T = 0;  r_{t−1} = Fᵀ r_t + Hᵀ (v_t/s_t − k_tᵀ (Fᵀ r_t))
    *   α̂_t = xp_t + Pp_t r_{t−1}
    *
    * (k_t = Pp_t Hᵀ / s_t, the posterior gain; missing y_t drops the
    * observation term: r_{t−1} = Fᵀ r_t). No covariance inverse at all —
    * O(n²) per step vs the RTS gain's O(n³) LAPACK pinv, and, because
    * every backward step is a short fixed-order linear fold, exactly the
    * recursion `SeasonalKalmanOracle.bstsSeasonalDecompSql` replays in
    * DuckDB (the pinv-SVD was the documented r9 oracle blocker). */
  def kalmanSmoothDk(y: Array[Double], f: DenseMatrix[Double],
      h: DenseMatrix[Double], q: DenseMatrix[Double], r: Double,
      x0: DenseVector[Double], p0: DenseMatrix[Double]): KalmanOut = {
    val t = y.length
    val n = x0.length
    val xf = new Array[DenseVector[Double]](t)
    val pf = new Array[DenseMatrix[Double]](t)
    val xp = new Array[DenseVector[Double]](t)
    val pp = new Array[DenseMatrix[Double]](t)
    val vs = new Array[Double](t)
    val ss = new Array[Double](t)
    var x = x0.copy
    var p = p0.copy
    var ll = 0.0
    var i = 0
    while (i < t) {
      val xPred = f * x
      val pPred = f * p * f.t + q
      xp(i) = xPred; pp(i) = pPred
      if (y(i).isNaN) { x = xPred; p = pPred; vs(i) = Double.NaN; ss(i) = 0.0 }
      else {
        val hx = h * xPred
        val hph = h * pPred * h.t
        val s = hph(0, 0) + r
        val k = (pPred * h.t) / s
        val innov = y(i) - hx(0)
        vs(i) = innov; ss(i) = s
        x = xPred + k(::, 0) * innov
        p = pPred - k * h * pPred
        ll += -0.5 * (math.log(2 * math.Pi * s) + innov * innov / s)
      }
      xf(i) = x.copy; pf(i) = p.copy
      i += 1
    }
    val xs = new Array[DenseVector[Double]](t)
    val hT = h.t(::, 0)
    var rv = DenseVector.zeros[Double](n)
    var j = t - 1
    while (j >= 0) {
      val u = f.t * rv
      val rNew =
        if (y(j).isNaN) u
        else {
          val pht: DenseMatrix[Double] = pp(j) * h.t
          val k = pht(::, 0) / ss(j)
          val c = vs(j) / ss(j) - (k dot u)
          u + hT * c
        }
      xs(j) = xp(j) + pp(j) * rNew
      rv = rNew
      j -= 1
    }
    KalmanOut(xf, pf, xp, pp, xs, ll)
  }

  // ── BSTS (bayesian/bsts.py:59-260) ──────────────────────────────────────

  /** Assemble (F, H, Q, r) for trend ∈ {level, local_linear} + optional
    * dummy-seasonal block (sum-to-zero constraint). */
  def bstsSystem(trend: String, seasonal: Option[Int], sigmaObs: Double,
      sigmaLevel: Double, sigmaTrend: Double, sigmaSeasonal: Double)
      : (DenseMatrix[Double], DenseMatrix[Double], DenseMatrix[Double], Double) = {
    val (ft, ht, qt) = trend match {
      case "level" =>
        (DenseMatrix((1.0)), DenseMatrix((1.0)), DenseMatrix((sigmaLevel * sigmaLevel)))
      case "local_linear" =>
        (DenseMatrix((1.0, 1.0), (0.0, 1.0)), DenseMatrix((1.0, 0.0)),
          breeze.linalg.diag(DenseVector(sigmaLevel * sigmaLevel, sigmaTrend * sigmaTrend)))
      case other => throw new IllegalArgumentException(s"Unknown trend '$other'")
    }
    seasonal match {
      case None => (ft, ht, qt, sigmaObs * sigmaObs)
      case Some(m) =>
        val s = m - 1
        val fs = DenseMatrix.zeros[Double](s, s)
        for (j <- 0 until s) fs(0, j) = -1.0
        for (j <- 0 until s - 1) fs(j + 1, j) = 1.0
        val hs = DenseMatrix.zeros[Double](1, s); hs(0, 0) = 1.0
        val qs = DenseMatrix.zeros[Double](s, s); qs(0, 0) = sigmaSeasonal * sigmaSeasonal
        val nt = ft.rows
        val n = nt + s
        val ff = DenseMatrix.zeros[Double](n, n)
        ff(0 until nt, 0 until nt) := ft
        ff(nt until n, nt until n) := fs
        val qq = DenseMatrix.zeros[Double](n, n)
        qq(0 until nt, 0 until nt) := qt
        qq(nt until n, nt until n) := qs
        val hh = DenseMatrix.zeros[Double](1, n)
        hh(0, 0 until nt) := ht(0, ::).t.t
        hh(0, nt until n) := hs(0, ::).t.t
        (ff, hh, qq, sigmaObs * sigmaObs)
    }
  }

  /** BSTS fit + forecast: returns per-row (level, trend?, seasonal?) from
    * the smoother plus (forecast, forecastVar) for h future steps. */
  def bstsFitForecast(y: Array[Double], h: Int, trend: String = "local_linear",
      seasonal: Option[Int] = None, sigmaObs: Double = 1.0,
      sigmaLevel: Double = 0.1, sigmaTrend: Double = 0.01,
      sigmaSeasonal: Double = 0.01)
      : (Array[Double], Array[Double], Array[Double], Array[Double], Array[Double]) = {
    val (f, hm, q, r) = bstsSystem(trend, seasonal, sigmaObs, sigmaLevel,
      sigmaTrend, sigmaSeasonal)
    val n = f.rows
    val x0 = DenseVector.zeros[Double](n)
    if (y.nonEmpty) x0(0) = y(0)
    val p0 = DenseMatrix.eye[Double](n) * 10.0
    // DK smoother: same smoothed means as the RTS pass (exact
    // arithmetic) with no per-step pinv — and SQL-replayable at ANY
    // state dimension, which lifts the period-24 seasonal decomposition
    // from rows-only to a full hash oracle
    val kr = kalmanSmoothDk(y, f, hm, q, r, x0, p0)
    val level = kr.smoothed.map(_(0))
    val trendC =
      if (trend == "local_linear") kr.smoothed.map(_(1)) else Array.empty[Double]
    val seasIdx = if (trend == "local_linear") 2 else 1
    val seasC = seasonal.map(_ => kr.smoothed.map(_(seasIdx))).getOrElse(Array.empty[Double])
    // forward propagate
    var x = kr.filtered.last.copy
    var p = kr.filteredCov.last.copy
    val fc = new Array[Double](h)
    val fv = new Array[Double](h)
    var s = 0
    while (s < h) {
      x = f * x
      p = f * p * f.t + q
      val hx = hm * x
      fc(s) = hx(0)
      val hph = hm * p * hm.t
      fv(s) = hph(0, 0) + r
      s += 1
    }
    (level, trendC, seasC, fc, fv)
  }

  // ── UKF (bayesian/ukf.py:21-188), scalar observation ────────────────────

  /** Sigma points + weights (Julier & Uhlmann); jitter keeps cholesky PD. */
  private def sigmaPoints(x: DenseVector[Double], p: DenseMatrix[Double],
      alpha: Double, beta: Double, kappa: Double)
      : (Array[DenseVector[Double]], Array[Double], Array[Double]) = {
    val n = x.length
    val lam = alpha * alpha * (n + kappa) - n
    var c = n + lam
    if (c <= 0) c = 1e-6
    var m = (p + p.t) * (0.5 * c)
    val eig = breeze.linalg.eigSym(m).eigenvalues
    val minEv = breeze.linalg.min(eig)
    if (minEv < 1e-10) m = m + DenseMatrix.eye[Double](n) * (1e-10 - minEv)
    val l = cholesky(m)
    val pts = new Array[DenseVector[Double]](2 * n + 1)
    pts(0) = x.copy
    for (i <- 0 until n) {
      pts(i + 1) = x + l(::, i)
      pts(n + i + 1) = x - l(::, i)
    }
    val wm = Array.fill(2 * n + 1)(1.0 / (2.0 * c))
    val wc = wm.clone()
    wm(0) = lam / c
    wc(0) = lam / c + (1.0 - alpha * alpha + beta)
    (pts, wm, wc)
  }

  /** UKF forward pass with scalar observations; NaN = missing. Returns
    * (filteredMeans[state0], filteredVars[state0]). */
  def ukfFilter(y: Array[Double], f: DenseVector[Double] => DenseVector[Double],
      h: DenseVector[Double] => Double, q: DenseMatrix[Double], r: Double,
      x0: DenseVector[Double], p0: DenseMatrix[Double], alpha: Double = 1e-3,
      beta: Double = 2.0, kappa: Double = 0.0): (Array[Double], Array[Double]) = {
    val t = y.length
    val n = x0.length
    var x = x0.copy
    var p = p0.copy
    val outM = new Array[Double](t)
    val outV = new Array[Double](t)
    var ti = 0
    while (ti < t) {
      val (pts, wm, wc) = sigmaPoints(x, p, alpha, beta, kappa)
      val prop = pts.map(f)
      val xPred = DenseVector.zeros[Double](n)
      for (i <- prop.indices) xPred += prop(i) * wm(i)
      var pPred = q.copy
      for (i <- prop.indices) {
        val dx = prop(i) - xPred
        pPred = pPred + (dx * dx.t) * wc(i)
      }
      if (y(ti).isNaN) { x = xPred; p = pPred }
      else {
        val (pts2, wm2, wc2) = sigmaPoints(xPred, pPred, alpha, beta, kappa)
        val ys = pts2.map(h)
        var yPred = 0.0
        for (i <- ys.indices) yPred += wm2(i) * ys(i)
        var s = r
        val pxy = DenseVector.zeros[Double](n)
        for (i <- ys.indices) {
          val dy = ys(i) - yPred
          s += wc2(i) * dy * dy
          pxy += (pts2(i) - xPred) * (wc2(i) * dy)
        }
        val k = pxy / s
        x = xPred + k * (y(ti) - yPred)
        p = pPred - (k * k.t) * s
        p = (p + p.t) * 0.5 + DenseMatrix.eye[Double](n) * 1e-10
      }
      outM(ti) = x(0)
      outV(ti) = p(0, 0)
      ti += 1
    }
    (outM, outV)
  }

  // ── EnKF (bayesian/enkf.py:21-153), scalar observation ──────────────────

  def enkfFilter(y: Array[Double], f: DenseVector[Double] => DenseVector[Double],
      h: DenseVector[Double] => Double, q: DenseMatrix[Double], r: Double,
      x0: DenseVector[Double], p0: DenseMatrix[Double], nEnsemble: Int = 50,
      seed: Long = 42L): (Array[Double], Array[Double]) = {
    val rng = new Rng(seed)
    val n = x0.length
    val lp = cholesky((p0 + p0.t) * 0.5 + DenseMatrix.eye[Double](n) * 1e-10)
    val lq = cholesky((q + q.t) * 0.5 + DenseMatrix.eye[Double](n) * 1e-10)
    var ens = Array.fill(nEnsemble) {
      val z = DenseVector.fill(n)(rng.nextGaussian())
      x0 + lp * z
    }
    val t = y.length
    val outM = new Array[Double](t)
    val outV = new Array[Double](t)
    var ti = 0
    while (ti < t) {
      // propagate with process noise
      ens = ens.map { e =>
        val z = DenseVector.fill(n)(rng.nextGaussian())
        f(e) + lq * z
      }
      if (!y(ti).isNaN) {
        val hx = ens.map(h)
        val hMean = hx.sum / nEnsemble
        val xMean = DenseVector.zeros[Double](n)
        ens.foreach(e => xMean += e)
        xMean :/= nEnsemble.toDouble
        var pyy = r
        val pxy = DenseVector.zeros[Double](n)
        for (i <- ens.indices) {
          val dy = hx(i) - hMean
          pyy += dy * dy / (nEnsemble - 1.0)
          pxy += (ens(i) - xMean) * (dy / (nEnsemble - 1.0))
        }
        val k = pxy / pyy
        ens = ens.indices.toArray.map { i =>
          val pert = y(ti) + math.sqrt(r) * rng.nextGaussian()
          ens(i) + k * (pert - hx(i))
        }
      }
      val m0 = ens.map(_(0)).sum / nEnsemble
      val v0 = ens.map(e => (e(0) - m0) * (e(0) - m0)).sum / (nEnsemble - 1.0)
      outM(ti) = m0
      outV(ti) = v0
      ti += 1
    }
    (outM, outV)
  }

  /** Scalar local-level EnKF with counter-based draws — the deterministic
    * twin of [[enkfFilter]] for the f = identity, h = x₀ instance the
    * engine query exposes. Every draw is [[DetRng]].gauss of a structured
    * counter (streams: 0 = init, 1 = process, 2 = observation
    * perturbation), so the DuckDB oracle replays the filter bit-exactly.
    * Same recursion as enkfFilter with n = 1 (cholesky of a 1×1 = sqrt). */
  def enkfLocalLevelDet(y: Array[Double], q: Double, r: Double,
      nEnsemble: Int, seed: Long): (Array[Double], Array[Double]) = {
    val sc = DetRng.seedConst(seed)
    var ens = enkfInitEnsemble(y.headOption.getOrElse(0.0), nEnsemble, sc)
    val t = y.length
    val outM = new Array[Double](t)
    val outV = new Array[Double](t)
    var ti = 0
    while (ti < t) {
      val (next, m0, v0) = enkfStepDet(ens, y(ti), ti.toLong, q, r, sc)
      ens = next
      outM(ti) = m0
      outV(ti) = v0
      ti += 1
    }
    (outM, outV)
  }

  /** Seeded init ensemble around the first observation (stream 0) —
    * shared by the batch kernel and the streaming operator so
    * stream ≡ batch holds bit-for-bit. */
  def enkfInitEnsemble(y0: Double, nEnsemble: Int, seedC: Long): Array[Double] = {
    val lp = math.sqrt(1.0 + 1e-10)
    Array.tabulate(nEnsemble)(i =>
      y0 + lp * DetRng.gauss(seedC, DetRng.ctr(0, 0, i)))
  }

  /** One EnKF step at 0-based position `ti` (propagate stream 1 →
    * perturbed-observation update stream 2): returns (next ensemble,
    * filtered mean, filtered variance). Pure function of its inputs —
    * the unit a keyed streaming state advances per arrival. */
  def enkfStepDet(ens0: Array[Double], y: Double, ti: Long, q: Double,
      r: Double, seedC: Long): (Array[Double], Double, Double) = {
    val nEnsemble = ens0.length
    val lq = math.sqrt(q + 1e-10)
    val sr = math.sqrt(r)
    var ens = Array.tabulate(nEnsemble)(i =>
      ens0(i) + lq * DetRng.gauss(seedC, DetRng.ctr(1, ti, i)))
    if (!y.isNaN) {
      var hMean = 0.0
      var i = 0
      while (i < nEnsemble) { hMean += ens(i); i += 1 }
      hMean /= nEnsemble
      var pyy = r
      var pxy = 0.0
      i = 0
      while (i < nEnsemble) {
        val dy = ens(i) - hMean
        pyy += dy * dy / (nEnsemble - 1.0)
        pxy += dy * (dy / (nEnsemble - 1.0))
        i += 1
      }
      val k = pxy / pyy
      val base = ens
      ens = Array.tabulate(nEnsemble)(i =>
        base(i) + k * (y + sr * DetRng.gauss(seedC, DetRng.ctr(2, ti, i)) - base(i)))
    }
    var m0 = 0.0
    var i = 0
    while (i < nEnsemble) { m0 += ens(i); i += 1 }
    m0 /= nEnsemble
    var v0 = 0.0
    i = 0
    while (i < nEnsemble) { val d = ens(i) - m0; v0 += d * d; i += 1 }
    v0 /= (nEnsemble - 1.0)
    (ens, m0, v0)
  }

  // ── Particle filter (bayesian/particle_filter.py:149-290) ────────────────

  /** Local-level bootstrap particle filter with systematic resampling.
    * Returns (filteredMean, filteredVar, ess). */
  def particleFilterLocalLevel(y: Array[Double], nParticles: Int = 500,
      sigmaLevel: Double = 1.0, sigmaObs: Double = 1.0,
      resampleThreshold: Double = 0.5, seed: Long = 42L)
      : (Array[Double], Array[Double], Array[Double]) = {
    val rng = new Rng(seed)
    val t = y.length
    val np = nParticles
    var particles = Array.fill(np)(y.headOption.getOrElse(0.0) + rng.nextGaussian())
    var weights = Array.fill(np)(1.0 / np)
    val outM = new Array[Double](t)
    val outV = new Array[Double](t)
    val outEss = new Array[Double](t)
    val logNorm = -0.5 * math.log(2 * math.Pi * sigmaObs * sigmaObs)
    var ti = 0
    while (ti < t) {
      if (ti > 0) particles = particles.map(_ + sigmaLevel * rng.nextGaussian())
      val logW = particles.map { p =>
        val d = (y(ti) - p) / sigmaObs
        logNorm - 0.5 * d * d
      }
      val maxW = logW.max
      val w = logW.map(lw => math.exp(lw - maxW))
      val wSum = w.sum
      weights =
        if (wSum > 0) w.map(_ / wSum)
        else Array.fill(np)(1.0 / np)
      var m = 0.0
      for (i <- 0 until np) m += particles(i) * weights(i)
      var v = 0.0
      for (i <- 0 until np) { val d = particles(i) - m; v += d * d * weights(i) }
      val ess = 1.0 / weights.map(x => x * x).sum
      outM(ti) = m; outV(ti) = v; outEss(ti) = ess
      if (ess < resampleThreshold * np) {
        // systematic resample
        val positions = Array.tabulate(np)(i => (i + rng.nextDouble()) / np)
        val cums = weights.scanLeft(0.0)(_ + _).tail
        val next = new Array[Double](np)
        var i = 0; var j = 0
        while (i < np) {
          while (j < np - 1 && cums(j) < positions(i)) j += 1
          next(i) = particles(j)
          i += 1
        }
        particles = next
        weights = Array.fill(np)(1.0 / np)
      }
      ti += 1
    }
    (outM, outV, outEss)
  }

  /** Local-level bootstrap particle filter with counter-based draws — the
    * deterministic twin of [[particleFilterLocalLevel]] (streams: 0 =
    * init, 1 = process, 2 = systematic-resample positions). The exp in
    * the weight normalization is the only transcendental; it feeds
    * weighted means that the shared r6 rounding absorbs, and resampling
    * decisions flip only on exact float ties. */
  def particleFilterLocalLevelDet(y: Array[Double], nParticles: Int = 500,
      sigmaLevel: Double = 1.0, sigmaObs: Double = 1.0,
      resampleThreshold: Double = 0.5, seed: Long = 42L)
      : (Array[Double], Array[Double], Array[Double]) = {
    val sc = DetRng.seedConst(seed)
    val t = y.length
    var particles = pfInitParticles(y.headOption.getOrElse(0.0), nParticles, sc)
    val outM = new Array[Double](t)
    val outV = new Array[Double](t)
    val outEss = new Array[Double](t)
    var ti = 0L
    while (ti < t) {
      val (next, m, v, ess) = pfStepDet(particles, y(ti.toInt), ti,
        sigmaLevel, sigmaObs, resampleThreshold, sc)
      particles = next
      outM(ti.toInt) = m; outV(ti.toInt) = v; outEss(ti.toInt) = ess
      ti += 1
    }
    (outM, outV, outEss)
  }

  /** Seeded init particle cloud around the first observation (stream 0)
    * — shared by the batch kernel and the streaming operator. */
  def pfInitParticles(y0: Double, nParticles: Int, seedC: Long): Array[Double] =
    Array.tabulate(nParticles)(i => y0 + DetRng.gauss(seedC, DetRng.ctr(0, 0, i)))

  /** One bootstrap-particle-filter step at 0-based position `ti`:
    * propagate (stream 1, skipped at ti = 0 like the batch loop), weight,
    * summarize, systematic-resample (stream 2) when ESS collapses.
    * Returns (next particles, weighted mean, weighted var, ESS). Pure
    * function of its inputs — the keyed streaming state unit. */
  def pfStepDet(parts0: Array[Double], y: Double, ti: Long,
      sigmaLevel: Double, sigmaObs: Double, resampleThreshold: Double,
      seedC: Long): (Array[Double], Double, Double, Double) = {
    val np = parts0.length
    val logNorm = -0.5 * math.log(2 * math.Pi * sigmaObs * sigmaObs)
    val particles =
      if (ti > 0) {
        val prev = parts0
        Array.tabulate(np)(i =>
          prev(i) + sigmaLevel * DetRng.gauss(seedC, DetRng.ctr(1, ti, i)))
      } else parts0
    val logW = particles.map { p =>
      val d = (y - p) / sigmaObs
      logNorm - 0.5 * d * d
    }
    val maxW = logW.max
    val w = logW.map(lw => math.exp(lw - maxW))
    val wSum = w.sum
    val weights =
      if (wSum > 0) w.map(_ / wSum)
      else Array.fill(np)(1.0 / np)
    var m = 0.0
    for (i <- 0 until np) m += particles(i) * weights(i)
    var v = 0.0
    for (i <- 0 until np) { val d = particles(i) - m; v += d * d * weights(i) }
    val ess = 1.0 / weights.map(x => x * x).sum
    val next =
      if (ess < resampleThreshold * np) {
        val positions = Array.tabulate(np)(i =>
          (i + DetRng.uniform(seedC, DetRng.ctr(2, ti, i))) / np)
        val cums = weights.scanLeft(0.0)(_ + _).tail
        val res = new Array[Double](np)
        var i = 0; var j = 0
        while (i < np) {
          while (j < np - 1 && cums(j) < positions(i)) j += 1
          res(i) = particles(j)
          i += 1
        }
        res
      } else particles
    (next, m, v, ess)
  }

  // ── MH-MCMC forecaster (bayesian/mcmc.py + samplers + forecast) ─────────

  /** Metropolis-Hastings with per-dimension 2% proposal scale
    * (mcmc_samplers.py:104-135). Returns post-burn-in samples. */
  def mhSample(logpost: Array[Double] => Double, x0: Array[Double],
      nSamples: Int, burnIn: Int, seed: Long): Array[Array[Double]] = {
    val rng = new Rng(seed)
    val d = x0.length
    val scale = x0.map(v => math.max(math.abs(v) * 0.02, 1e-4))
    var theta = x0.clone()
    var lp = logpost(theta)
    val out = new Array[Array[Double]](nSamples)
    var i = 0
    val total = nSamples + burnIn
    var it = 0
    while (it < total) {
      val prop = Array.tabulate(d)(j => theta(j) + scale(j) * rng.nextGaussian())
      val lpProp = logpost(prop)
      val ratio = lpProp - lp
      if (!ratio.isNaN && math.log(rng.nextDouble()) < ratio) {
        theta = prop; lp = lpProp
      }
      if (it >= burnIn) { out(i) = theta.clone(); i += 1 }
      it += 1
    }
    out
  }

  /** Metropolis-Hastings with counter-based draws — the deterministic
    * twin of [[mhSample]] (streams: 0 = proposal gaussians per (iter,
    * dim), 1 = accept uniform per iter). log(u) in the accept test is
    * transcendental, but an accept decision flips only when u sits within
    * an ulp of the boundary — not an accumulating error. */
  def mhSampleDet(logpost: Array[Double] => Double, x0: Array[Double],
      nSamples: Int, burnIn: Int, seed: Long): Array[Array[Double]] = {
    val sc = DetRng.seedConst(seed)
    val d = x0.length
    val scale = x0.map(v => math.max(math.abs(v) * 0.02, 1e-4))
    var theta = x0.clone()
    var lp = logpost(theta)
    val out = new Array[Array[Double]](nSamples)
    var i = 0
    val total = nSamples + burnIn
    var it = 0
    while (it < total) {
      val prop = Array.tabulate(d)(j =>
        theta(j) + scale(j) * DetRng.gauss(sc, DetRng.ctr(0, it, j)))
      val lpProp = logpost(prop)
      val ratio = lpProp - lp
      if (!ratio.isNaN &&
          math.log(DetRng.uniform(sc, DetRng.ctr(1, it, 0))) < ratio) {
        theta = prop; lp = lpProp
      }
      if (it >= burnIn) { out(i) = theta.clone(); i += 1 }
      it += 1
    }
    out
  }

  /** Posterior-predictive AR(p) paths with counter-based draws — the
    * deterministic twin of [[arForecastPaths]] (stream 2, keyed by
    * (sample index, step)). */
  def arForecastPathsDet(y: Array[Double], samples: Array[Array[Double]],
      h: Int, p: Int, seed: Long): Array[Array[Double]] = {
    val sc = DetRng.seedConst(seed)
    samples.zipWithIndex.map { case (s, si) =>
      val sigma = math.abs(s(0)); val mu = s(1)
      val hist = scala.collection.mutable.ArrayBuffer(y.takeRight(p): _*)
      Array.tabulate(h) { step =>
        var pred = mu
        var j = 0
        while (j < p) { pred += s(2 + j) * (hist(hist.length - 1 - j) - mu); j += 1 }
        pred += sigma * DetRng.gauss(sc, DetRng.ctr(2, si, step))
        hist += pred
        pred
      }
    }
  }

  /** AR(p) log-posterior (mcmc_samplers.py:39-64). */
  def arLogpost(params: Array[Double], y: Array[Double], p: Int): Double = {
    val sigma = params(0); val mu = params(1)
    if (sigma <= 0) return Double.NegativeInfinity
    val logNorm = -0.5 * math.log(2 * math.Pi * sigma * sigma)
    val invS = 1.0 / sigma
    var ll = 0.0
    var t = p
    while (t < y.length) {
      var pred = mu
      var j = 0
      while (j < p) { pred += params(2 + j) * (y(t - j - 1) - mu); j += 1 }
      val d = (y(t) - pred) * invS
      ll += logNorm - 0.5 * d * d
      t += 1
    }
    var lp = -0.5 * math.pow(sigma / 10.0, 2) - 0.5 * math.pow(mu / 100.0, 2)
    var j = 0
    while (j < p) { lp += -0.5 * params(2 + j) * params(2 + j); j += 1 }
    ll + lp
  }

  /** Posterior-predictive AR(p) forecast paths (mcmc_forecast.py:30-50):
    * one recursive noisy path per posterior sample → (nSamples × h). */
  def arForecastPaths(y: Array[Double], samples: Array[Array[Double]], h: Int,
      p: Int, seed: Long): Array[Array[Double]] = {
    val rng = new Rng(seed)
    samples.map { s =>
      val sigma = math.abs(s(0)); val mu = s(1)
      val hist = scala.collection.mutable.ArrayBuffer(y.takeRight(p): _*)
      Array.tabulate(h) { _ =>
        var pred = mu
        var j = 0
        while (j < p) { pred += s(2 + j) * (hist(hist.length - 1 - j) - mu); j += 1 }
        pred += sigma * rng.nextGaussian()
        hist += pred
        pred
      }
    }
  }

  // ── NIG online anomaly scoring (bayesian/anomaly.py:51-200) ─────────────

  /** Student-t CDF via the regularized incomplete beta. */
  def tCdf(x: Double, df: Double): Double = {
    val ib = graft.ops.VarModels.incompleteBeta(df / (df + x * x), df / 2.0, 0.5)
    if (x >= 0) 1.0 - 0.5 * ib else 0.5 * ib
  }

  /** Per-row two-sided posterior-predictive p-values from an online
    * Normal-Inverse-Gamma model; first `warmup` rows only update. */
  /** Online NIG posterior state: (μ, κ, α, β, observations seen). */
  case class NigState(mu: Double, kappa: Double, alpha: Double, beta: Double,
    t: Long)

  def nigInit(y0: Double, priorMu: Option[Double] = None,
      priorKappa: Double = 1.0, priorAlpha: Double = 2.0,
      priorBeta: Double = 1.0): NigState =
    NigState(priorMu.getOrElse(y0), priorKappa, priorAlpha, priorBeta, 0L)

  /** One online NIG update: score the arrival against the posterior
    * predictive (two-sided t p-value; 1.0 during warmup), then absorb
    * it. Pure function of (state, value) — the unit a keyed streaming
    * state advances per arrival (shared with the batch kernel so
    * stream ≡ batch exactly). */
  def nigStep(s: NigState, v: Double, warmup: Int = 10): (NigState, Double) = {
    val p =
      if (s.t < warmup) 1.0
      else {
        val scale = math.sqrt(s.beta * (s.kappa + 1) / (s.alpha * s.kappa))
        if (scale <= 0) 1.0
        else {
          val ts = (v - s.mu) / scale
          val pl = tCdf(ts, 2.0 * s.alpha)
          2.0 * math.min(pl, 1.0 - pl)
        }
      }
    val kappaNew = s.kappa + 1
    val muNew = (s.kappa * s.mu + v) / kappaNew
    val betaNew = s.beta + 0.5 * s.kappa * (v - s.mu) * (v - s.mu) / kappaNew
    (NigState(muNew, kappaNew, s.alpha + 0.5, betaNew, s.t + 1), p)
  }

  def nigPValues(y: Array[Double], priorMu: Option[Double] = None,
      priorKappa: Double = 1.0, priorAlpha: Double = 2.0,
      priorBeta: Double = 1.0, warmup: Int = 10): Array[Double] = {
    var s = nigInit(y.headOption.getOrElse(0.0), priorMu, priorKappa,
      priorAlpha, priorBeta)
    val out = new Array[Double](y.length)
    var t = 0
    while (t < y.length) {
      val (next, p) = nigStep(s, y(t), warmup)
      s = next
      out(t) = p
      t += 1
    }
    out
  }

  // ── GP regression (bayesian/gp.py:30-260) ───────────────────────────────
  //
  // Kernel family matching the reference: RBF, Matérn 3/2 & 5/2, periodic,
  // spectral mixture, and sum/product composition (gp.py:52-226). Params
  // are exposed in log space exactly as the reference's get/set_params so
  // the marginal-likelihood optimizer treats every kernel uniformly.

  sealed trait GpKernel {
    def apply(x1: Double, x2: Double): Double
    /** log-space parameter vector (reference get_params order). */
    def params: Array[Double]
    def withParams(p: Array[Double]): GpKernel
    def nParams: Int = params.length
  }

  object GpKernel {
    /** Squared exponential (gp.py:52-73). */
    case class Rbf(variance: Double = 1.0, lengthscale: Double = 1.0) extends GpKernel {
      def apply(x1: Double, x2: Double): Double = {
        val d = (x1 - x2) / lengthscale
        variance * math.exp(-0.5 * d * d)
      }
      def params: Array[Double] = Array(math.log(variance), math.log(lengthscale))
      def withParams(p: Array[Double]): GpKernel = Rbf(math.exp(p(0)), math.exp(p(1)))
    }

    /** Matérn 3/2 (gp.py:76-97). */
    case class Matern32(variance: Double = 1.0, lengthscale: Double = 1.0) extends GpKernel {
      def apply(x1: Double, x2: Double): Double = {
        val r = math.abs(x1 - x2) / lengthscale
        val s3 = math.sqrt(3.0) * r
        variance * (1.0 + s3) * math.exp(-s3)
      }
      def params: Array[Double] = Array(math.log(variance), math.log(lengthscale))
      def withParams(p: Array[Double]): GpKernel = Matern32(math.exp(p(0)), math.exp(p(1)))
    }

    /** Matérn 5/2 (gp.py:100-121). */
    case class Matern52(variance: Double = 1.0, lengthscale: Double = 1.0) extends GpKernel {
      def apply(x1: Double, x2: Double): Double = {
        val r = math.abs(x1 - x2) / lengthscale
        val s5 = math.sqrt(5.0) * r
        variance * (1.0 + s5 + 5.0 / 3.0 * r * r) * math.exp(-s5)
      }
      def params: Array[Double] = Array(math.log(variance), math.log(lengthscale))
      def withParams(p: Array[Double]): GpKernel = Matern52(math.exp(p(0)), math.exp(p(1)))
    }

    /** Periodic (gp.py:124-147). */
    case class Periodic(variance: Double = 1.0, lengthscale: Double = 1.0,
        period: Double = 1.0) extends GpKernel {
      def apply(x1: Double, x2: Double): Double = {
        val s = math.sin(math.Pi * (x1 - x2) / period)
        variance * math.exp(-2.0 * s * s / (lengthscale * lengthscale))
      }
      def params: Array[Double] =
        Array(math.log(variance), math.log(lengthscale), math.log(period))
      def withParams(p: Array[Double]): GpKernel =
        Periodic(math.exp(p(0)), math.exp(p(1)), math.exp(p(2)))
    }

    /** Spectral mixture (Wilson & Adams 2013; gp.py:150-181). Weights are
      * softmax-normalized on set, as in the reference. */
    case class SpectralMixture(weights: Array[Double], means: Array[Double],
        variances: Array[Double]) extends GpKernel {
      def apply(x1: Double, x2: Double): Double = {
        val tau = x1 - x2
        var k = 0.0
        var q = 0
        while (q < weights.length) {
          k += weights(q) *
            math.exp(-2.0 * math.Pi * math.Pi * tau * tau * variances(q)) *
            math.cos(2.0 * math.Pi * tau * means(q))
          q += 1
        }
        k
      }
      def params: Array[Double] =
        weights.map(w => math.log(w + 1e-10)) ++
          means.map(m => math.log(m + 1e-10)) ++
          variances.map(v => math.log(v + 1e-10))
      def withParams(p: Array[Double]): GpKernel = {
        val m = weights.length
        val w = p.slice(0, m).map(math.exp)
        val ws = w.sum
        SpectralMixture(w.map(_ / ws), p.slice(m, 2 * m).map(math.exp),
          p.slice(2 * m, 3 * m).map(math.exp))
      }
    }

    object SpectralMixture {
      /** Reference default init: uniform weights, linspace means, 0.1 vars. */
      def apply(nMixtures: Int): SpectralMixture = SpectralMixture(
        Array.fill(nMixtures)(1.0 / nMixtures),
        Array.tabulate(nMixtures)(q =>
          if (nMixtures == 1) 0.1 else 0.1 + 0.9 * q / (nMixtures - 1.0)),
        Array.fill(nMixtures)(0.1))
    }

    /** k1 + k2 (gp.py:184-204). */
    case class Sum(k1: GpKernel, k2: GpKernel) extends GpKernel {
      def apply(x1: Double, x2: Double): Double = k1(x1, x2) + k2(x1, x2)
      def params: Array[Double] = k1.params ++ k2.params
      def withParams(p: Array[Double]): GpKernel =
        Sum(k1.withParams(p.slice(0, k1.nParams)), k2.withParams(p.drop(k1.nParams)))
    }

    /** k1 · k2 (gp.py:207-226). */
    case class Product(k1: GpKernel, k2: GpKernel) extends GpKernel {
      def apply(x1: Double, x2: Double): Double = k1(x1, x2) * k2(x1, x2)
      def params: Array[Double] = k1.params ++ k2.params
      def withParams(p: Array[Double]): GpKernel =
        Product(k1.withParams(p.slice(0, k1.nParams)), k2.withParams(p.drop(k1.nParams)))
    }
  }

  /** GP fit on t=0..n−1 (normalized y) + h-step forecast with variance.
    * `kernel` None ⇒ RBF(1, max(n/10, 1)) — the original default. When
    * `optimize`, the kernel's log params + log noise are tuned by
    * Nelder-Mead on the log marginal likelihood. */
  def gpForecast(y: Array[Double], h: Int, optimize: Boolean = true,
      noiseVar0: Double = 0.1, kernel: Option[GpKernel] = None)
      : (Array[Double], Array[Double]) = {
    val n = y.length
    val mean = y.sum / n
    var std = math.sqrt(y.map(v => (v - mean) * (v - mean)).sum / n)
    if (std < 1e-10) std = 1.0
    val yn = y.map(v => (v - mean) / std)
    val k0 = kernel.getOrElse(GpKernel.Rbf(1.0, math.max(n / 10.0, 1.0)))
    def negLml(lp: Array[Double]): Double = {
      if (lp.exists(v => !v.isFinite)) return 1e100
      val kk = k0.withParams(lp.dropRight(1))
      val nv = math.exp(lp.last)
      if (!nv.isFinite) return 1e100
      val k = DenseMatrix.tabulate(n, n)((i, j) =>
        kk(i, j) + (if (i == j) nv else 0.0))
      try {
        val l = cholesky((k + k.t) * 0.5 + DenseMatrix.eye[Double](n) * 1e-10)
        val yv = DenseVector(yn)
        val a = l \ yv
        val quad = a.t * a
        var logDet = 0.0
        for (i <- 0 until n) logDet += math.log(l(i, i))
        0.5 * quad + logDet + 0.5 * n * math.log(2 * math.Pi)
      } catch { case _: Exception => 1e100 }
    }
    val init = k0.params :+ math.log(noiseVar0)
    val best = if (optimize) Garch.nelderMead(negLml, init, step = 0.5, maxIter = 120) else init
    // fixed-hyperparameter path keeps the caller's exact values — an
    // exp∘log round-trip can perturb them by 1 ulp, which the oracle
    // (which bakes the literals) would then miss
    val kf = if (optimize) k0.withParams(best.dropRight(1)) else k0
    val nv = if (optimize) math.exp(best.last) else noiseVar0
    val k = DenseMatrix.tabulate(n, n)((i, j) =>
      kf(i, j) + (if (i == j) nv else 0.0))
    val l = cholesky((k + k.t) * 0.5 + DenseMatrix.eye[Double](n) * 1e-10)
    val alphaV = l.t \ (l \ DenseVector(yn))
    val fc = new Array[Double](h)
    val fv = new Array[Double](h)
    for (s <- 0 until h) {
      val xs = (n + s).toDouble
      val ks = DenseVector.tabulate(n)(i => kf(i, xs))
      val m = ks.t * alphaV
      val vvec = l \ ks
      val varS = math.max(kf(xs, xs) + nv - (vvec.t * vvec), 1e-12)
      fc(s) = m * std + mean
      fv(s) = varS * std * std
    }
    (fc, fv)
  }

  // ── Bayesian ETS (models/bayesian_ets): MAP SES with log-post ───────────

  /** SES Gaussian log-likelihood over one-step errors
    * (bayesian_ets/inference.py:19-33). params = (logitAlpha, level0, logSigma). */
  def sesLogpost(params: Array[Double], y: Array[Double]): Double = {
    val alpha = 1.0 / (1.0 + math.exp(-params(0)))
    val level0 = params(1)
    val sigma = math.exp(params(2))
    if (sigma <= 0) return Double.NegativeInfinity
    var level = level0
    var ll = 0.0
    val logNorm = -0.5 * math.log(2 * math.Pi * sigma * sigma)
    var t = 0
    while (t < y.length) {
      val d = (y(t) - level) / sigma
      ll += logNorm - 0.5 * d * d
      level = alpha * y(t) + (1 - alpha) * level
      t += 1
    }
    // weak priors: alpha ~ flat on (0,1), level0 ~ N(y0, 100), log sigma ~ N(0, 10)
    ll - 0.5 * math.pow((level0 - y.headOption.getOrElse(0.0)) / 100.0, 2) -
      0.5 * math.pow(params(2) / 10.0, 2)
  }

  /** MAP SES parameters (logitAlpha, level0, logSigma) — the NM search
    * shared by [[bayesianEtsForecast]] and the OraclePins fit, so the
    * pinned oracle replays exactly the fit the query ran. */
  def bayesianEtsMap(y: Array[Double]): Array[Double] = {
    val x0 = Array(0.0, y.headOption.getOrElse(0.0),
      math.log(math.max(breeze.stats.stddev(DenseVector(y)), 1e-3)))
    Garch.nelderMead(p => -sesLogpost(p, y), x0, step = 0.2, maxIter = 300)
  }

  /** MAP SES fit + h-step forecast. The point forecast is the MAP
    * plug-in (deterministic: run the SES level recursion at the MAP
    * (α, level₀), forecast flat — the pinned oracle replays it);
    * intervals are posterior-predictive quantiles over MH draws around
    * the MAP (chain-dependent, verified rows-only + spec invariants).
    * Returns (yHat, lower, upper) arrays of length h at `coverage`. */
  def bayesianEtsForecast(y: Array[Double], h: Int, coverage: Double = 0.9,
      nSamples: Int = 200, seed: Long = 42L)
      : (Array[Double], Array[Double], Array[Double]) = {
    val map = bayesianEtsMap(y)
    // counter-based draws (DetRng) so the MH chain + posterior-predictive
    // paths replay bit-exactly in the DuckDB oracle (streams 0/1 inside
    // mhSampleDet; stream 2 keyed by (sample, step) for the path noise)
    val samples = mhSampleDet(p => sesLogpost(p, y), map, nSamples, nSamples / 2, seed)
    val sc2 = DetRng.seedConst(seed + 1)
    val paths = samples.zipWithIndex.map { case (s, si) =>
      val alpha = 1.0 / (1.0 + math.exp(-s(0)))
      val sigma = math.exp(s(2))
      var level = s(1)
      var t = 0
      while (t < y.length) { level = alpha * y(t) + (1 - alpha) * level; t += 1 }
      Array.tabulate(h) { step =>
        level + sigma * DetRng.gauss(sc2, DetRng.ctr(2, si, step))
      }
    }
    val lo = (1 - coverage) / 2
    // MAP plug-in point forecast: SES level recursion at the MAP params,
    // flat across the horizon (deterministic, unlike the sample mean)
    val mapAlpha = 1.0 / (1.0 + math.exp(-map(0)))
    var mapLevel = map(1)
    var t = 0
    while (t < y.length) { mapLevel = mapAlpha * y(t) + (1 - mapAlpha) * mapLevel; t += 1 }
    val yHat = Array.fill(h)(mapLevel)
    val lower = new Array[Double](h)
    val upper = new Array[Double](h)
    for (s <- 0 until h) {
      val col = paths.map(_(s)).sorted
      lower(s) = col(math.max(0, (lo * (col.length - 1)).round.toInt))
      upper(s) = col(math.min(col.length - 1, ((1 - lo) * (col.length - 1)).round.toInt))
    }
    (yHat, lower, upper)
  }

  // ── Bayesian VAR (bayesian_var/, analytical conjugate posterior) ─────────

  /** Minnesota prior precision diagonal (bayesian_var/priors.py:96-145
    * `_minnesota_prior_precision` with its shared-V0 simplification):
    * own-lag variance (λ1/l^λ3)², cross-lag (λ1λ2/l^λ3)²·(σ²ᵢ/σ²ⱼ) with
    * the TIGHTEST precision winning per column (the reference's max), a
    * diffuse 1e-6 intercept, and per-variable residual variances from
    * univariate AR(p) least squares (ddof = p+1, floored at 1e-10 —
    * priors.py:78-92). The prior mean is structural: random walk, own
    * first lag = 1. */
  def minnesotaV0Inv(data: Array[Array[Double]], p: Int, lambda1: Double = 0.2,
      lambda2: Double = 0.5, lambda3: Double = 1.0): Array[Double] = {
    val n = data.length
    val k = data(0).length
    val dim = k * p + 1
    val sigmas = Array.fill(k)(1.0)
    if (n > p + 1) {
      val rows = n - p
      for (j <- 0 until k) {
        val xa = DenseMatrix.zeros[Double](rows, p + 1)
        val ya = DenseVector.zeros[Double](rows)
        for (t <- 0 until rows) {
          for (i <- 0 until p) xa(t, i) = data(p - i - 1 + t)(j)
          xa(t, p) = 1.0
          ya(t) = data(p + t)(j)
        }
        val beta = xa \ ya
        val resid = ya - xa * beta
        val mu = breeze.linalg.sum(resid) / rows
        val v = breeze.linalg.sum(resid.map(r => (r - mu) * (r - mu))) /
          math.max(rows - (p + 1), 1).toDouble
        sigmas(j) = math.max(v, 1e-10)
      }
    }
    val v0inv = new Array[Double](dim)
    for (lag <- 1 to p; j <- 0 until k) {
      val colIdx = (lag - 1) * k + j
      val varOwn = math.pow(lambda1 / math.pow(lag.toDouble, lambda3), 2)
      v0inv(colIdx) = 1.0 / math.max(varOwn, 1e-20)
      for (i <- 0 until k if i != j) {
        val sRatio = sigmas(i) / math.max(sigmas(j), 1e-20)
        val varCross =
          math.pow(lambda1 * lambda2 / math.pow(lag.toDouble, lambda3), 2) * sRatio
        v0inv(colIdx) = math.max(v0inv(colIdx), 1.0 / math.max(varCross, 1e-20))
      }
    }
    v0inv(dim - 1) = 1e-6
    v0inv
  }

  /** Analytical BVAR(p): conjugate Gaussian update with either a ridge
    * prior (λI, zero mean) or the Minnesota prior
    * (prior = "minnesota": [[minnesotaV0Inv]] diagonal precision +
    * random-walk mean, B = (XᵀX + V₀⁻¹)⁻¹(XᵀY + V₀⁻¹B₀ᵀ) —
    * bayesian_var/inference.py:33-41); recursive h-step forecast;
    * intervals from per-equation residual sd (grows with step via the
    * companion recursion's first-order term only — matching the
    * reference's analytical mode). Data: (n × k) time-major. */
  def bvarForecast(data: Array[Array[Double]], p: Int, h: Int,
      lambda: Double = 0.1, coverage: Double = 0.9, prior: String = "ridge")
      : (Array[Array[Double]], Array[Array[Double]], Array[Array[Double]]) = {
    val n = data.length
    val k = data(0).length
    require(n > p + 1, "series too short for BVAR")
    val rows = n - p
    val dim = k * p + 1
    val x = DenseMatrix.zeros[Double](rows, dim)
    val yM = DenseMatrix.zeros[Double](rows, k)
    for (i <- 0 until rows) {
      var c = 0
      for (l <- 1 to p; j <- 0 until k) { x(i, c) = data(p + i - l)(j); c += 1 }
      x(i, dim - 1) = 1.0
      for (j <- 0 until k) yM(i, j) = data(p + i)(j)
    }
    val (prec, priorRhs) = prior match {
      case "minnesota" =>
        val v0 = minnesotaV0Inv(data, p)
        val pm = DenseMatrix.zeros[Double](dim, dim)
        for (i <- 0 until dim) pm(i, i) = v0(i)
        // V₀⁻¹·B₀ᵀ: B₀ is the random walk (own first lag = 1), so the
        // only non-zero RHS entries are (j, j) = v0inv(j), j < k
        val rhs = DenseMatrix.zeros[Double](dim, k)
        for (j <- 0 until k) rhs(j, j) = v0(j)
        (pm, rhs)
      case _ =>
        (DenseMatrix.eye[Double](dim) * lambda, DenseMatrix.zeros[Double](dim, k))
    }
    val b = inv(x.t * x + prec) * (x.t * yM + priorRhs)
    val resid = yM - x * b
    val sd = Array.tabulate(k)(j =>
      math.sqrt(breeze.linalg.sum(resid(::, j).map(v => v * v)) /
        math.max(rows - dim, 1).toDouble))
    val z = math.sqrt(2.0) * inverseErf(coverage) // two-sided coverage z-score
    val hist = scala.collection.mutable.ArrayBuffer(data.map(_.clone()): _*)
    val fc = Array.ofDim[Double](h, k)
    val loB = Array.ofDim[Double](h, k)
    val hiB = Array.ofDim[Double](h, k)
    for (s <- 0 until h) {
      val xr = DenseVector.zeros[Double](dim)
      var c = 0
      for (l <- 1 to p; j <- 0 until k) { xr(c) = hist(hist.length - l)(j); c += 1 }
      xr(dim - 1) = 1.0
      val pred = (b.t * xr).toArray
      fc(s) = pred
      val width = math.sqrt(s + 1.0)
      for (j <- 0 until k) {
        loB(s)(j) = pred(j) - z * sd(j) * width
        hiB(s)(j) = pred(j) + z * sd(j) * width
      }
      hist += pred
    }
    (fc, loB, hiB)
  }

  /** Inverse error function (Winitzki approximation) for interval z-scores. */
  def inverseErf(x: Double): Double = {
    val a = 0.147
    val ln = math.log(1 - x * x)
    val t1 = 2.0 / (math.Pi * a) + ln / 2.0
    math.signum(x) * math.sqrt(math.sqrt(t1 * t1 - ln / a) - t1)
  }
}
