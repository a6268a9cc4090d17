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

  test("theta method: known SES-with-half-drift behavior on a pure line") {
    val y = Array.tabulate(100)(t => 3.0 + 1.5 * t)
    val fc = Arima.thetaForecast(y, 4)
    // classic theta ≈ SES + drift/2: per-step increment is b/2
    val incs = fc.sliding(2).map(p => p(1) - p(0)).toArray
    incs.foreach(inc => assert(math.abs(inc - 0.75) < 1e-6, s"inc $inc"))
    // first step stays near the last observation
    assert(math.abs(fc(0) - y.last) < 3.0, s"fc0=${fc(0)} vs ${y.last}")
  }

  test("damped holt flattens out at long horizons") {
    val rng = new scala.util.Random(5L)
    val y = Array.tabulate(80)(t => 2.0 * t + rng.nextGaussian() * 0.1)
    val fc = Arima.dampedHoltForecast(y, 100, phi = 0.9)
    // damping: increments shrink geometrically
    val early = fc(1) - fc(0)
    val late = fc(99) - fc(98)
    assert(late < early * 0.1, s"early=$early late=$late")
  }

  test("autoEts picks seasonality when present") {
    val m = 12
    val y = Array.tabulate(96)(t => 10.0 + 5.0 * math.sin(2 * math.Pi * t / m))
    val fc = Arima.autoEtsForecast(y, m, m)
    // one full future season should reproduce the sine pattern, not a flat line
    val truth = Array.tabulate(m)(s => 10.0 + 5.0 * math.sin(2 * math.Pi * (96 + s) / m))
    val err = fc.zip(truth).map { case (a, b) => math.abs(a - b) }.max
    assert(err < 2.0, s"max err $err")
  }

  test("scum averages the sub-model forecasts") {
    val rng = new scala.util.Random(2L)
    val y = Array.tabulate(120)(t => 50.0 + 0.3 * t + rng.nextGaussian())
    val fc = Arima.scumForecast(y, 3)
    val subs = Array(
      Arima.autoForecast(y, 3, 2, 2),
      Arima.autoEtsForecast(y, 3, 1),
      Arima.cesForecast(y, 3),
      Arima.thetaForecast(y, 3))
    for (s <- 0 until 3) {
      val mean = subs.map(_(s)).sum / 4
      assert(math.abs(fc(s) - mean) < 1e-9)
      assert(math.abs(fc(s) - (50.0 + 0.3 * (120 + s))) < 3.0)
    }
  }

  test("arima forecast of stationary AR(1) reverts toward the mean") {
    val y = ar1(400, phi = 0.7, c = 3.0) // mean = 10
    val fc = Arima.forecast(y, p = 1, d = 0, q = 0, h = 50)
    assert(math.abs(fc.last - 10.0) < 1.0, s"fc.last=${fc.last}")
  }
}
