package graft.kernels

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

/** The Durbin–Koopman state smoother returns the RTS smoother's means:
  * identical in exact arithmetic for PD predicted covariances (DK 2012
  * §4.4.4), so the two implementations must agree to float noise — on
  * the 2-state local-linear system, on the 25-dim period-24 BSTS
  * system, and with missing observations. */
class KalmanDkSpec extends AnyFunSuite {

  private def series(n: Int, withNaN: Boolean = false): Array[Double] =
    Array.tabulate(n) { i =>
      if (withNaN && i % 11 == 5) Double.NaN
      else 10.0 + 0.05 * i + 3.0 * math.sin(i / 3.0) +
        ((i * 2654435761L & 0xffff) / 65536.0 - 0.5)
    }

  private def maxDiff(sys: (DenseMatrix[Double], DenseMatrix[Double],
      DenseMatrix[Double], Double), y: Array[Double]): Double = {
    val (f, h, q, r) = sys
    val n = f.rows
    val x0 = DenseVector.zeros[Double](n); if (y.nonEmpty) x0(0) = y(0)
    val p0 = DenseMatrix.eye[Double](n) * 10.0
    val rts = Bayesian.kalmanSmooth(y, f, h, q, r, x0, p0)
    val dk = Bayesian.kalmanSmoothDk(y, f, h, q, r, x0, p0)
    assert(math.abs(rts.logLik - dk.logLik) < 1e-9)
    (0 until y.length).flatMap(t => (0 until n).map(i =>
      math.abs(rts.smoothed(t)(i) - dk.smoothed(t)(i)))).max
  }

  test("DK == RTS on the 2-state local-linear system") {
    val sys = Bayesian.bstsSystem("local_linear", None, 1.0, 0.1, 0.01, 0.01)
    assert(maxDiff(sys, series(80)) < 1e-8)
  }

  test("DK == RTS on the 25-dim period-24 seasonal system") {
    val sys = Bayesian.bstsSystem("local_linear", Some(24), 1.0, 0.1, 0.01, 0.01)
    assert(maxDiff(sys, series(90)) < 1e-6)
  }

  test("DK == RTS with missing observations") {
    val sys = Bayesian.bstsSystem("local_linear", Some(4), 1.0, 0.1, 0.01, 0.01)
    assert(maxDiff(sys, series(60, withNaN = true)) < 1e-8)
  }
}
