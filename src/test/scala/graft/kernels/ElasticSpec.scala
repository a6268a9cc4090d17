package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

/** Conformance fixtures lifted from the reference test suite
  * (tests/conftest.py:5-68, tests/distance): A=[1,2,3,4],
  * B=[1,2,3,5] differ in one point; C is A reversed. Expected values are
  * the reference's own assertions (e.g. DTW(A,B)==1.0, EDR(A,B)==0.25).
  */
class ElasticSpec extends AnyFunSuite {

  private val A = Array(1.0, 2.0, 3.0, 4.0)
  private val B = Array(1.0, 2.0, 3.0, 5.0)
  private val C = Array(4.0, 3.0, 2.0, 1.0)
  private val shiftA = Array(1.0, 1.0, 1.0, 1.0, 5.0, 5.0, 5.0, 5.0)
  private val shiftB = Array(5.0, 5.0, 5.0, 5.0, 1.0, 1.0, 1.0, 1.0)

  private def approx(x: Double, y: Double, tol: Double = 1e-10): Boolean =
    math.abs(x - y) <= tol

  test("dtw: identical is zero, basic distance 1.0 (test_dtw.py:24,29)") {
    assert(Elastic.dtw(A, A) == 0.0)
    assert(Elastic.dtw(A, B) == 1.0)
  }

  test("dtw: non-negativity + triangle inequality on three_series") {
    val ab = Elastic.dtw(A, B); val ac = Elastic.dtw(A, C); val bc = Elastic.dtw(B, C)
    assert(ab >= 0 && ac >= 0 && bc >= 0)
    assert(ac <= ab + bc + 1e-10)
  }

  test("dtw sakoe-chiba: zero/basic, band >= |n-m| (test_dtw.py:78,83)") {
    assert(Elastic.dtwSakoeChiba(A, A, 2) == 0.0)
    assert(Elastic.dtwSakoeChiba(A, B, 2) == 1.0)
    // tight band costs at least the unconstrained distance
    assert(Elastic.dtwSakoeChiba(shiftA, shiftB, 1) >= Elastic.dtw(shiftA, shiftB))
  }

  test("dtw itakura: zero/basic (test_dtw.py:125,130)") {
    assert(Elastic.dtwItakura(A, A, 2.0) == 0.0)
    assert(Elastic.dtwItakura(A, B, 2.0) == 1.0)
  }

  test("fastDtw: zero/basic, matches exact dtw on short series (test_dtw.py:162,168)") {
    assert(Elastic.fastDtw(A, A, 1) == 0.0)
    assert(Elastic.fastDtw(A, B, 1) == 1.0)
    val long1 = Array.tabulate(64)(i => math.sin(i / 5.0))
    val long2 = Array.tabulate(64)(i => math.sin((i + 2) / 5.0))
    assert(Elastic.fastDtw(long1, long1, 5) == 0.0)
    // approximation is an upper bound on the exact distance
    assert(Elastic.fastDtw(long1, long2, 5) >= Elastic.dtw(long1, long2) - 1e-9)
  }

  test("ddtw: identical/linear-trend share derivative -> zero (test_ddtw.py:11,92)") {
    assert(Elastic.ddtw(A, A) == 0.0)
    val shifted = A.map(_ + 10.0) // same derivative
    assert(Elastic.ddtw(A, shifted) == 0.0)
  }

  test("wdtw: identity zero, symmetric, non-negative (test_wdtw.py)") {
    assert(Elastic.wdtw(A, A) == 0.0)
    assert(approx(Elastic.wdtw(A, B), Elastic.wdtw(B, A)))
    assert(Elastic.wdtw(A, C) > 0.0)
  }

  test("msm: identity zero, one-point diff = 1.0 with c=1") {
    assert(Elastic.msm(A, A) == 0.0)
    assert(Elastic.msm(A, B) == 1.0)
    assert(approx(Elastic.msm(A, C, 1.0), Elastic.msm(C, A, 1.0)))
  }

  test("erp: identity zero with g=0, one-point diff = 1.0") {
    assert(Elastic.erp(A, A) == 0.0)
    assert(Elastic.erp(A, B) == 1.0)
  }

  test("lcss: eps=1 matches the off-by-one point -> 0.0; far series -> 1.0") {
    assert(Elastic.lcss(A, B, 1.0) == 0.0)
    val far = Array(100.0, 200.0, 300.0, 400.0)
    assert(Elastic.lcss(A, far, 1.0) == 1.0)
  }

  test("twe: identity zero, symmetric") {
    assert(Elastic.twe(A, A) == 0.0)
    assert(approx(Elastic.twe(A, B), Elastic.twe(B, A)))
  }

  test("sbd: identical -> 0, scale-invariant (shape-based)") {
    assert(approx(Elastic.sbd(A, A), 0.0))
    assert(approx(Elastic.sbd(A, A.map(_ * 3.0)), 0.0))
    assert(Elastic.sbd(A, C) > 0.0)
  }

  test("frechet: identity zero, one-point diff = 1.0") {
    assert(Elastic.frechet(A, A) == 0.0)
    assert(Elastic.frechet(A, B) == 1.0)
  }

  test("edr: identity zero, one edit over 4 = 0.25 (test_edr.py + metrics:102)") {
    assert(approx(Elastic.edr(A, A), 0.0))
    assert(Elastic.edr(A, B, 0.1) == 0.25)
  }

  test("dtwMulti: identity zero, manhattan vs euclidean ordering") {
    val ma = Array(Array(1.0, 1.0), Array(2.0, 2.0), Array(3.0, 3.0))
    val mb = Array(Array(1.0, 1.0), Array(2.0, 2.0), Array(3.0, 4.0))
    assert(Elastic.dtwMulti(ma, ma) == 0.0)
    assert(Elastic.dtwMulti(ma, mb) == 1.0) // manhattan: |3-3|+|3-4|
    assert(Elastic.dtwMulti(ma, mb, euclidean = true) == 1.0)
  }

  test("msmMulti: identity zero, symmetric") {
    val ma = Array(Array(1.0, 1.0), Array(2.0, 2.0), Array(3.0, 3.0))
    val mb = Array(Array(1.0, 1.0), Array(2.0, 2.0), Array(3.0, 4.0))
    assert(Elastic.msmMulti(ma, ma) == 0.0)
    assert(approx(Elastic.msmMulti(ma, mb), Elastic.msmMulti(mb, ma)))
  }

  test("derivative: Keogh-Pazzani drops endpoints; linear series constant slope") {
    val d = Elastic.derivative(Array(1.0, 2.0, 3.0, 4.0))
    assert(d.length == 2)
    assert(d.forall(approx(_, 1.0)))
  }
}
