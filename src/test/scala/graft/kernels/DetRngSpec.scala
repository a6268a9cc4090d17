package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

class DetRngSpec extends AnyFunSuite {

  test("draws are pure functions of (seed, counter) — order-free") {
    val sc = DetRng.seedConst(42L)
    val a = DetRng.gauss(sc, DetRng.ctr(1, 7, 3))
    val b = DetRng.gauss(sc, DetRng.ctr(1, 8, 0))
    assert(a == DetRng.gauss(sc, DetRng.ctr(1, 7, 3)))
    assert(a != b)
    assert(DetRng.uniform(sc, 5) == DetRng.uniform(sc, 5))
  }

  test("distinct seeds and counters decorrelate") {
    val s1 = DetRng.seedConst(1L); val s2 = DetRng.seedConst(2L)
    assert(DetRng.gauss(s1, 10) != DetRng.gauss(s2, 10))
    // gauss sub-slots (0..11) never collide with uniform's slot 12
    assert(DetRng.uniform(s1, 10) != DetRng.gauss(s1, 10))
  }

  test("uniform in [0,1); Irwin-Hall(12) gauss has mean ~0, var ~1") {
    val sc = DetRng.seedConst(42L)
    val us = (0 until 20000).map(i => DetRng.uniform(sc, i))
    assert(us.forall(u => u >= 0.0 && u < 1.0))
    assert(math.abs(us.sum / us.size - 0.5) < 0.01)
    val gs = (0 until 20000).map(i => DetRng.gauss(sc, i))
    val m = gs.sum / gs.size
    val v = gs.map(g => (g - m) * (g - m)).sum / gs.size
    assert(math.abs(m) < 0.02)
    assert(math.abs(v - 1.0) < 0.03)
    // bounded tails by construction
    assert(gs.forall(g => g > -6.0 && g < 6.0))
  }

  test("deterministic kernels reproduce bit-identically across calls") {
    val y = Array.tabulate(60)(i => math.sin(i / 5.0) * 10 + i * 0.1)
    val (m1, v1) = Bayesian.enkfLocalLevelDet(y, 1e-3, 1.0, 30, 42L)
    val (m2, v2) = Bayesian.enkfLocalLevelDet(y, 1e-3, 1.0, 30, 42L)
    assert(m1.sameElements(m2) && v1.sameElements(v2))
    val (pm1, _, pe1) = Bayesian.particleFilterLocalLevelDet(y, 200, 0.5, 1.0, seed = 42L)
    val (pm2, _, pe2) = Bayesian.particleFilterLocalLevelDet(y, 200, 0.5, 1.0, seed = 42L)
    assert(pm1.sameElements(pm2) && pe1.sameElements(pe2))
    // EnKF with q = 1e-3 smooths hard; still beats the global-mean
    // predictor on a trending sine
    val mean = y.sum / y.length
    val maeFilter = y.indices.map(i => math.abs(m1(i) - y(i))).sum / y.length
    val maeMean = y.map(v => math.abs(v - mean)).sum / y.length
    assert(maeFilter < maeMean, s"EnKF MAE $maeFilter vs mean-predictor $maeMean")
  }
}
