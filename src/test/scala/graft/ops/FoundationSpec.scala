package graft.ops

import graft.ops.Foundation._
import org.scalatest.funsuite.AnyFunSuite

/** Chronos foundation-adapter tier: tokenizer roundtrip bounds, sampler
  * determinism and support, quantile assembly, dispatcher contract. */
class FoundationSpec extends AnyFunSuite {

  private val q = ChronosCfg(nBins = 64)

  test("tokenize/detokenize roundtrip error bounded by half a bin width") {
    val ys = Array(3.2, -1.7, 0.0, 14.9, 5.5, -8.25)
    val s = meanAbsScale(ys)
    ys.foreach { v =>
      val z = v / s
      assert(z > q.low && z < q.high, "fixture must stay in-support")
      val recon = q.center(q.token(z)) * s
      assert(math.abs(recon - v) <= q.width / 2 * s + 1e-12,
        s"$v -> $recon (scale $s)")
    }
  }

  test("token ids clamp at the vocabulary edges") {
    assert(q.token(q.low - 100.0) == 0)
    assert(q.token(q.high + 100.0) == q.nBins - 1)
    assert(q.token(q.high) == q.nBins - 1) // exact upper edge stays in-vocab
  }

  test("meanAbsScale: degenerate contexts scale by 1") {
    assert(meanAbsScale(Array.empty[Double]) == 1.0)
    assert(meanAbsScale(Array(0.0, 0.0)) == 1.0)
    assert(meanAbsScale(Array(-2.0, 2.0)) == 2.0)
  }

  test("npQuantile matches the numpy linear-interpolation definition") {
    val xs = Array(4.0, 1.0, 3.0, 2.0)
    assert(npQuantile(xs, 0.5) == 2.5)
    assert(npQuantile(xs, 0.0) == 1.0)
    assert(npQuantile(xs, 1.0) == 4.0)
    assert(math.abs(npQuantile(xs, 0.25) - 1.75) < 1e-12)
  }

  test("sampler is deterministic, in-support, and interval-ordered") {
    val ys = Array.tabulate(60)(i => 10.0 + 3.0 * math.sin(i / 4.0))
    val cfg = ChronosForecastCfg(h = 5, numSamples = 16, quant = q)
    val a = chronosSample(ys, cfg)
    val b = chronosSample(ys, cfg)
    assert(a.flatten[Double].sameElements(b.flatten[Double]))
    val s = meanAbsScale(ys)
    a.foreach { case Array(med, lo, hi) =>
      assert(lo <= med && med <= hi)
      // every sampled value is a context-token bin center × scale
      assert(lo >= q.center(0) * s && hi <= q.center(q.nBins - 1) * s)
    }
    // a different seed must change the draws
    val c = chronosSample(ys, cfg.copy(seed = 7L))
    assert(!a.flatten[Double].sameElements(c.flatten[Double]))
  }

  test("sampler only emits tokens observed in the context") {
    val ys = Array(1.0, 2.0, 1.0, 2.0, 1.0, 2.0)
    val cfg = ChronosForecastCfg(h = 8, numSamples = 8, quant = q)
    val s = meanAbsScale(ys)
    val observed = ys.map(v => q.center(q.token(v / s)) * s).toSet
    chronosSample(ys, cfg).foreach(row =>
      row.foreach(v => assert(observed.exists(o => math.abs(o - v) < 1e-9),
        s"$v not a context bin center")))
  }

  test("dispatcher rejects unknown model families loudly") {
    val e = intercept[IllegalArgumentException] {
      // df is never touched before the match fails
      Foundation.foundationForecast(null, "prophet", h = 4)(
        graft.core.PanelCols("user_id", "ts", "value"))
    }
    assert(e.getMessage.contains("chronos"))
  }
}
