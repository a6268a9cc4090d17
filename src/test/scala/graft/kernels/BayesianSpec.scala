package graft.kernels

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

class BayesianSpec extends AnyFunSuite {

  private def noisyLevel(n: Int, seed: Long = 3L): Array[Double] = {
    val rng = new scala.util.Random(seed)
    var level = 10.0
    Array.fill(n) { level += rng.nextGaussian() * 0.1; level + rng.nextGaussian() * 0.5 }
  }

  test("UKF on a linear model matches the linear Kalman filter") {
    val y = noisyLevel(80)
    val (ukfM, _) = Bayesian.ukfFilter(y, x => x, x => x(0),
      DenseMatrix((1e-3)), 1.0, DenseVector(y(0)), DenseMatrix((1.0)))
    val (kfM, _) = Kalman.filterSmooth(y, q = 1e-3, r = 1.0)
    val maxErr = ukfM.zip(kfM).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr < 1e-4, s"max err $maxErr")
  }

  test("EnKF tracks the level within Monte Carlo error") {
    val y = noisyLevel(80)
    val (m, _) = Bayesian.enkfFilter(y, x => x, x => x(0),
      DenseMatrix((1e-2)), 0.25, DenseVector(y(0)), DenseMatrix((1.0)),
      nEnsemble = 200, seed = 5L)
    val (kfM, _) = Kalman.filterSmooth(y, q = 1e-2, r = 0.25)
    val rmse = math.sqrt(m.zip(kfM).map { case (a, b) => (a - b) * (a - b) }.sum / m.length)
    assert(rmse < 0.2, s"rmse $rmse")
  }

  test("particle filter follows a level shift") {
    val y = Array.fill(50)(0.0) ++ Array.fill(50)(8.0)
    val (m, _, ess) = Bayesian.particleFilterLocalLevel(y, nParticles = 500,
      sigmaLevel = 0.5, sigmaObs = 0.5)
    assert(math.abs(m.take(40).map(math.abs).max) < 1.0)
    assert(math.abs(m.last - 8.0) < 1.0)
    assert(ess.forall(_ > 1.0))
  }

  test("BSTS recovers trend slope and seasonal shape") {
    val m = 6
    val y = Array.tabulate(120)(t => 0.5 * t + 3.0 * math.sin(2 * math.Pi * t / m))
    val (level, trend, _, fc, fv) = Bayesian.bstsFitForecast(y, 7,
      trend = "local_linear", seasonal = Some(m),
      sigmaLevel = 0.5, sigmaTrend = 0.1, sigmaSeasonal = 0.5, sigmaObs = 0.5)
    // smoothed trend converges near the true slope
    assert(math.abs(trend.drop(60).sum / 60 - 0.5) < 0.15)
    // forecasts continue the trend: one full season apart cancels the
    // seasonal component, leaving m·slope
    assert(math.abs((fc(6) - fc(0)) / 6.0 - 0.5) < 0.25,
      s"season-apart slope ${(fc(6) - fc(0)) / 6.0}")
    assert(fv.forall(_ > 0))
    assert(level.length == 120)
  }

  test("MCMC AR(1) posterior concentrates near the true coefficient") {
    val rng = new scala.util.Random(11L)
    val n = 300
    val y = new Array[Double](n)
    for (t <- 1 until n) y(t) = 0.7 * y(t - 1) + rng.nextGaussian() * 0.5
    // OLS-adjacent init (the ops layer does the same): a zero phi init
    // cannot move under the 2%-of-|θ| proposal scale
    val ols = ArimaLite.arFit(y, 1)
    val x0 = Array(0.5, 0.0, ols(0))
    val samples = Bayesian.mhSample(th => Bayesian.arLogpost(th, y, 1),
      x0, 400, 200, 7L)
    val phiMean = samples.map(_(2)).sum / samples.length
    assert(math.abs(phiMean - 0.7) < 0.2, s"phi $phiMean")
  }

  test("GP forecast continues a smooth function") {
    val y = Array.tabulate(60)(t => math.sin(t / 6.0) * 5.0)
    val (fc, fv) = Bayesian.gpForecast(y, 5)
    val truth = Array.tabulate(5)(s => math.sin((60 + s) / 6.0) * 5.0)
    val err = fc.zip(truth).map { case (a, b) => math.abs(a - b) }.max
    assert(err < 2.0, s"max err $err, fc=${fc.toSeq}")
    assert(fv.forall(_ > 0))
  }

  test("NIG anomaly p-values flag a spike and pass normal data") {
    val rng = new scala.util.Random(2L)
    val y = Array.tabulate(100)(i => if (i == 70) 60.0 else rng.nextGaussian())
    val p = Bayesian.nigPValues(y)
    assert(p(70) < 0.01, s"spike p=${p(70)}")
    val normalLow = p.zipWithIndex.count { case (v, i) => i != 70 && i >= 10 && v < 0.01 }
    assert(normalLow <= 3, s"$normalLow false flags")
  }

  test("bayesianEtsForecast brackets the point forecast") {
    val y = noisyLevel(60)
    val (m, lo, hi) = Bayesian.bayesianEtsForecast(y, 4, nSamples = 100)
    for (i <- 0 until 4) assert(lo(i) <= m(i) && m(i) <= hi(i))
    assert(hi(0) - lo(0) > 0)
  }

  test("BVAR forecast of coupled series stays bounded and ordered") {
    val rng = new scala.util.Random(6L)
    val n = 120
    val data = new Array[Array[Double]](n)
    data(0) = Array(0.0, 0.0)
    for (t <- 1 until n) {
      val prev = data(t - 1)
      data(t) = Array(
        0.6 * prev(0) + 0.2 * prev(1) + rng.nextGaussian() * 0.3,
        0.3 * prev(0) + 0.5 * prev(1) + rng.nextGaussian() * 0.3)
    }
    val (fc, lo, hi) = Bayesian.bvarForecast(data, p = 2, h = 5)
    for (s <- 0 until 5; j <- 0 until 2) {
      assert(lo(s)(j) < fc(s)(j) && fc(s)(j) < hi(s)(j))
      assert(math.abs(fc(s)(j)) < 5.0)
    }
  }
}
