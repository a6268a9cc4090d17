package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

class SeriesKernelsSpec extends AnyFunSuite {

  private def approx(x: Double, y: Double, tol: Double = 1e-9): Boolean =
    math.abs(x - y) <= tol

  // ---- ETS (reference src/ets.rs + tests/models/test_exponential_smoothing.py)

  test("ses: flat forecast at smoothed level") {
    val f = Ets.ses(Array(10.0, 10.0, 10.0, 10.0), alpha = 0.5, h = 3)
    assert(f.length == 3 && f.forall(approx(_, 10.0)))
    val f2 = Ets.ses(Array(1.0, 2.0, 3.0), alpha = 0.5, h = 2)
    assert(f2(0) == f2(1)) // SES is flat
    // level after folding: l0=1; l1=.5*2+.5*1=1.5; l2=.5*3+.5*1.5=2.25
    assert(approx(f2(0), 2.25))
  }

  test("holt: linear extrapolation increases on trending series") {
    val y = Array.tabulate(20)(i => 2.0 * i + 1.0)
    val f = Ets.holt(y, 0.5, 0.5, h = 5)
    assert(f.length == 5)
    assert((1 until 5).forall(i => f(i) > f(i - 1)))
    // exact linear series: trend converges to 2.0
    assert(approx(f(1) - f(0), 2.0, 1e-6))
  }

  test("holt-winters additive: recovers exact seasonal pattern") {
    val season = Array(0.0, 10.0, 0.0, -10.0)
    val y = Array.tabulate(24)(i => 100.0 + season(i % 4))
    val f = Ets.holtWinters(y, 0.5, 0.1, 0.1, m = 4, additive = true, h = 8)
    assert(f.length == 8)
    var i = 0
    while (i < 8) {
      assert(approx(f(i), 100.0 + season((24 + i) % 4), 1e-6), s"step $i: ${f(i)}")
      i += 1
    }
  }

  test("holt-winters multiplicative: positive seasonal series") {
    val season = Array(1.0, 1.2, 1.0, 0.8)
    val y = Array.tabulate(24)(i => 100.0 * season(i % 4))
    val f = Ets.holtWinters(y, 0.5, 0.1, 0.1, m = 4, additive = false, h = 4)
    assert(f.length == 4)
    assert(f.forall(_ > 0.0))
    assert(approx(f(1) / f(0), 1.2 / 1.0, 0.05))
  }

  // ---- PELT (reference src/pelt.rs tests: changepoint within ±5 of truth)

  test("pelt: finds a single mean shift near the true location") {
    val y = Array.fill(50)(0.0) ++ Array.fill(50)(10.0)
    val cps = Pelt.detect(y, Pelt.MeanCost, penalty = 2.0 * math.log(100))
    assert(cps.length == 1)
    assert(math.abs(cps(0) - 50) <= 5)
  }

  test("pelt: constant series has no changepoints") {
    val y = Array.fill(100)(5.0)
    assert(Pelt.detect(y, Pelt.MeanCost, penalty = 2.0 * math.log(100)).isEmpty)
  }

  test("pelt: variance shift detected with var cost") {
    val rng = new scala.util.Random(42)
    val y = Array.fill(100)(rng.nextGaussian() * 0.1) ++
      Array.fill(100)(rng.nextGaussian() * 5.0)
    val cps = Pelt.detect(y, Pelt.VarCost, penalty = 2.0 * math.log(200))
    assert(cps.nonEmpty)
    assert(cps.exists(cp => math.abs(cp - 100) <= 5))
  }

  // ---- Mann-Kendall (reference tests/test_mann_kendall.py:12-52)

  test("mann-kendall: monotone up 1.0, down -1.0, constant 0.0, ties") {
    assert(approx(MannKendall.stat(Array(1.0, 2.0, 3.0, 4.0, 5.0)), 1.0))
    assert(approx(MannKendall.stat(Array(5.0, 4.0, 3.0, 2.0, 1.0)), -1.0))
    assert(approx(MannKendall.stat(Array(3.0, 3.0, 3.0, 3.0)), 0.0))
    // S for [1,2,1,2]: +1 +0 +1 -1 +0 +1 = 2, denom 0.5*4*3 = 6
    assert(approx(MannKendall.stat(Array(1.0, 2.0, 1.0, 2.0)), 1.0 / 3.0))
  }

  // ---- Sen's slope (reference tests/test_sens_slope.py:12-42)

  test("sens slope: unit up 1.0, unit down -1.0, slope 2 series 2.0") {
    assert(approx(SensSlope.slope(Array(1.0, 2.0, 3.0, 4.0, 5.0)), 1.0))
    assert(approx(SensSlope.slope(Array(5.0, 4.0, 3.0, 2.0, 1.0)), -1.0))
    assert(approx(SensSlope.slope(Array(1.0, 3.0, 5.0, 7.0)), 2.0))
    assert(approx(SensSlope.slope(Array(2.0, 2.0, 2.0)), 0.0))
  }

  // ---- ACF / PACF / Ljung-Box (reference polars_ts/diagnostics.py)

  test("acf: lag0 is 1; alternating series lag1 ~ -1") {
    val y = Array.tabulate(100)(i => if (i % 2 == 0) 1.0 else -1.0)
    val r = AcfKernels.acf(y, 2)
    assert(approx(r(0), 1.0))
    assert(r(1) < -0.9)
    assert(r(2) > 0.9)
  }

  test("pacf: AR(1) process has large lag-1, small lag-2 pacf") {
    val rng = new scala.util.Random(7)
    val y = new Array[Double](500)
    var i = 1
    while (i < 500) { y(i) = 0.8 * y(i - 1) + rng.nextGaussian(); i += 1 }
    val p = AcfKernels.pacf(y, 5)
    assert(p(0) == 1.0)
    assert(p(1) > 0.6)
    assert(math.abs(p(2)) < 0.2)
  }

  test("ljung-box: white noise high p-value, AR series low p-value") {
    val rng = new scala.util.Random(11)
    val wn = Array.fill(300)(rng.nextGaussian())
    val (_, pWn) = AcfKernels.ljungBox(wn, 10)
    assert(pWn > 0.01)
    val ar = new Array[Double](300)
    var i = 1
    while (i < 300) { ar(i) = 0.9 * ar(i - 1) + rng.nextGaussian(); i += 1 }
    val (qAr, pAr) = AcfKernels.ljungBox(ar, 10)
    assert(qAr > 100.0 && pAr < 1e-6)
  }

  test("chi2 survival function sanity") {
    // chi2 k=1: P(X > 3.841) ~ 0.05
    assert(approx(Special.chi2Sf(3.841458820694124, 1.0), 0.05, 1e-6))
    assert(approx(Special.chi2Sf(0.0, 5.0), 1.0))
  }

  // ---- BOCPD (reference polars_ts/changepoint/bocpd.py)

  test("bocpd: run length grows on stationary data, resets near a shift") {
    val y = Array.fill(60)(0.0).map(_ + 0.01) ++ Array.fill(60)(50.0)
    val out = Bocpd.detect(y, hazardRate = 100.0)
    assert(out.length == 120)
    // run length at t=59 should be large (steady segment)
    assert(out(59)._1 > 40)
    // shortly after the shift the most probable run length collapses
    assert(out(61)._1 < 5)
  }

  test("bocpd: pruned recursion matches exact to 6dp, and stays O(n·K)") {
    // noisy two-regime series: deterministic hash noise + a level shift
    val y = Array.tabulate(400) { t =>
      val noise = DetRng.uniform(DetRng.seedConst(77L), t.toLong) - 0.5
      (if (t < 200) 0.0 else 8.0) + noise
    }
    val exact = Bocpd.detect(y, hazardRate = 200.0)
    val pruned = Bocpd.detect(y, hazardRate = 200.0, pruneThreshold = 1e-12)
    exact.indices.foreach { t =>
      assert(exact(t)._1 == pruned(t)._1, s"run length t=$t")
      assert(math.abs(exact(t)._2 - pruned(t)._2) < 1e-7,
        s"cp prob t=$t ${exact(t)._2} vs ${pruned(t)._2}")
      assert(exact(t)._3 == pruned(t)._3, s"flag t=$t")
    }
    // pruneThreshold = 0 is the EXACT recursion, bit-for-bit
    val exact2 = Bocpd.detect(y, hazardRate = 200.0, pruneThreshold = 0.0)
    exact.indices.foreach(t => assert(exact(t) == exact2(t)))
    // the length story: 50k points with aggressive pruning completes in
    // seconds (the untruncated recursion would be 2.5e9 hypothesis
    // updates); wall-clock bound generous for CI noise
    val long = Array.tabulate(50000) { t =>
      DetRng.uniform(DetRng.seedConst(78L), t.toLong) +
        (if ((t / 5000) % 2 == 0) 0.0 else 4.0)
    }
    val t0 = System.nanoTime()
    val outL = Bocpd.detect(long, hazardRate = 200.0, pruneThreshold = 1e-8)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(outL.length == 50000)
    assert(secs < 30.0, s"pruned bocpd took $secs s on 50k points")
  }

  // ---- FFT forecast (reference polars_ts/models/baselines.py:181-255)

  test("fft forecast: extrapolates a pure cosine") {
    val n = 64
    val y = Array.tabulate(n)(t => 5.0 + 3.0 * math.cos(2.0 * math.Pi * 4.0 * t / n))
    val f = FftForecast.forecast(y, h = 8, nHarmonics = 3)
    assert(f.length == 8)
    var t = 0
    while (t < 8) {
      val expect = 5.0 + 3.0 * math.cos(2.0 * math.Pi * 4.0 * (n + t) / n)
      assert(approx(f(t), expect, 1e-6), s"step $t: ${f(t)} vs $expect")
      t += 1
    }
  }
}
