package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

class ImagingExtraSpec extends AnyFunSuite {

  test("spectrogram peaks at the driving frequency bin") {
    val n = 256
    // pure tone at k=4 cycles per 32-sample segment
    val x = Array.tabulate(n)(t => math.sin(2 * math.Pi * 4 * t / 32.0))
    val sp = Imaging.spectrogram(x, npersegIn = 32, logScale = false)
    assert(sp.length == 17)
    // average magnitude per frequency bin: bin 4 dominates
    val perBin = sp.map(row => row.sum / row.length)
    assert(perBin.indices.maxBy(perBin) == 4, perBin.toSeq.toString)
  }

  test("scalogram responds more at matching scale for slow oscillation") {
    val x = Array.tabulate(128)(t => math.sin(t / 8.0))
    val sc = Imaging.scalogram(x, nScales = 8)
    assert(sc.length == 8 && sc(0).length == 128)
    assert(sc.flatten.forall(v => v >= 0 && !v.isNaN))
  }

  test("path signature: linear path has zero antisymmetric area") {
    val lin = Array.tabulate(50)(i => 2.0 * i)
    val sig = Imaging.pathSignature(lin, depth = 2)
    // features: [s_t, s_x, s_tt, s_tx, s_xt, s_xx]; for any path
    // s_t = 1, s_x = total increment; area = (s_tx - s_xt)/2 = 0 for a line
    assert(math.abs(sig(0) - 1.0) < 1e-9)
    assert(math.abs(sig(1) - 98.0) < 1e-9)
    // the reference's discrete iterated integral omits the diagonal
    // half-terms, so a line's Levy area is O(1/n), not exactly 0
    assert(math.abs((sig(3) - sig(4)) / 2.0) < 0.05, s"area ${(sig(3) - sig(4)) / 2.0}")
    // S^tt ≈ (S^t)²/2 up to the same O(1/n) discretization
    assert(math.abs(sig(2) - 0.5) < 0.02)
  }

  test("path signature area is nonzero for a curved path") {
    val curve = Array.tabulate(50)(i => (i * i).toDouble)
    val sig = Imaging.pathSignature(curve, depth = 2)
    assert(math.abs((sig(3) - sig(4)) / 2.0) > 1.0)
  }
}
