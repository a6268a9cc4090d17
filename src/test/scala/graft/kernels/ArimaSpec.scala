package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's qualitative ARIMA assertions
  * (tests/models/test_arima.py): forecasts track known processes,
  * auto-order selection picks sensible (p,d,q). */
class ArimaSpec extends AnyFunSuite {

  private def ar1(n: Int, phi: Double, c: Double = 0.0, seed: Long = 7L): Array[Double] = {
    val rng = new scala.util.Random(seed)
    val y = new Array[Double](n)
    y(0) = c / (1 - phi)
    for (t <- 1 until n) y(t) = c + phi * y(t - 1) + rng.nextGaussian() * 0.1
    y
  }

  test("fitArma recovers an AR(1) coefficient") {
    val y = ar1(400, phi = 0.7, c = 1.0)
    val fit = Arima.fitArma(y, p = 1, q = 0)
    assert(math.abs(fit.phi(0) - 0.7) < 0.1, s"phi=${fit.phi(0)}")
  }

  test("fitArma recovers an MA(1) coefficient") {
    val rng = new scala.util.Random(11L)
    val n = 600
    val e = Array.fill(n)(rng.nextGaussian() * 0.5)
    val y = Array.tabulate(n)(t => e(t) + (if (t > 0) 0.6 * e(t - 1) else 0.0))
    val fit = Arima.fitArma(y, p = 0, q = 1)
    assert(math.abs(fit.theta(0) - 0.6) < 0.15, s"theta=${fit.theta(0)}")
  }

  test("AICc prefers the true AR order over overfit") {
    val y = ar1(500, phi = 0.8)
    val f1 = Arima.fitArma(y, 1, 0)
    val f33 = Arima.fitArma(y, 3, 3)
    assert(f1.aicc < f33.aicc + 1e-6)
  }

  test("KPSS flags a random walk, passes white noise") {
    val rng = new scala.util.Random(3L)
    val wn = Array.fill(300)(rng.nextGaussian())
    val rw = wn.scanLeft(0.0)(_ + _).tail
    assert(Arima.kpss(wn) < 0.463)
    assert(Arima.kpss(rw) > 0.463)
    assert(Arima.selectD(wn) == 0)
    assert(Arima.selectD(rw) == 1)
  }

  test("autoForecast extrapolates a trend via differencing") {
    val y = Array.tabulate(120)(t => 2.0 * t + 5.0)
    val fc = Arima.autoForecast(y, h = 5)
    // linear trend: differenced series is constant 2.0; forecasts continue it
    for (s <- 0 until 5)
      assert(math.abs(fc(s) - (2.0 * (120 + s) + 5.0)) < 1.0, s"fc=${fc.toSeq}")
  }

  test("arima forecast of stationary AR(1) reverts toward the mean") {
    val y = ar1(400, phi = 0.7, c = 3.0) // mean = 10
    val fc = Arima.forecast(y, p = 1, d = 0, q = 0, h = 50)
    assert(math.abs(fc.last - 10.0) < 1.0, s"fc.last=${fc.last}")
  }
}
