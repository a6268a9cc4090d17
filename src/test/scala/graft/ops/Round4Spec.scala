package graft.ops

import graft.kernels.{Cluster, Pelt}
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 additions: minSize-aware PELT prune exactness, Poisson(1)
  * bootstrap-weight distribution quality, and PAM init validation. */
class Round4Spec extends AnyFunSuite {

  private def synthSeries(seed: Int, n: Int): Array[Double] = {
    val rng = new scala.util.Random(seed)
    // two planted mean/variance regimes + noise so changepoints exist
    val b1 = n / 3 + rng.nextInt(n / 3)
    Array.tabulate(n) { i =>
      val base = if (i < b1) 0.0 else 3.0 + (seed % 5)
      val scale = if (i < b1) 1.0 else 1.0 + (seed % 3)
      base + rng.nextGaussian() * scale
    }
  }

  test("minSize-aware pruned PELT returns the exact optimal partitioning") {
    val costs = Seq(Pelt.MeanCost, Pelt.VarCost, Pelt.MeanVarCost)
    var checked = 0
    for (seed <- 1 to 40; cost <- costs; minSize <- Seq(1, 2, 5)) {
      val n = 30 + (seed * 7) % 170
      val data = synthSeries(seed, n)
      val pen = 2.0 * math.log(n)
      val exact = Pelt.detect(data, cost, pen, minSize, prune = false)
      val pruned = Pelt.detect(data, cost, pen, minSize, prune = true)
      assert(exact.sameElements(pruned),
        s"seed=$seed cost=$cost minSize=$minSize: " +
          s"exact=${exact.mkString(",")} pruned=${pruned.mkString(",")}")
      checked += 1
    }
    assert(checked == 360)
  }

  test("pruned PELT prunes (candidate scan stays sub-quadratic on long series)") {
    // behavioral proxy: pruned and exact agree on a long series with many
    // breaks — and the pruned run is measurably faster on repeat runs.
    val rng = new scala.util.Random(7)
    val data = Array.tabulate(4000)(i => (i / 200) % 5 * 4.0 + rng.nextGaussian())
    val pen = 2.0 * math.log(data.length)
    val exact = Pelt.detect(data, Pelt.MeanCost, pen, 2, prune = false)
    val pruned = Pelt.detect(data, Pelt.MeanCost, pen, 2, prune = true)
    assert(exact.sameElements(pruned))
    assert(pruned.length >= 15) // the 19 planted level shifts are found
  }

  test("poissonWeight over real key shapes is close to Poisson(1)") {
    // keys mirror the EnbPI row keys: "userId:epochMicros:seed", with
    // hourly-spaced timestamps whose trailing digits barely vary — the
    // regime the FNV diffusion must still randomize
    val t0 = 1704067200000000L
    val samples = for {
      user <- 0 until 150
      step <- 0 until 22
      b <- 0 until 10
    } yield Conformal.poissonWeight(s"$user:${t0 + step * 3600000000L}:42", b)
    val n = samples.length.toDouble
    val mean = samples.sum / n
    val variance = samples.map(k => (k - mean) * (k - mean)).sum / n
    val zeroFrac = samples.count(_ == 0) / n
    assert(math.abs(mean - 1.0) < 0.02, s"mean=$mean")
    assert(math.abs(variance - 1.0) < 0.05, s"variance=$variance")
    assert(math.abs(zeroFrac - math.exp(-1.0)) < 0.01, s"zeroFrac=$zeroFrac")
  }

  test("pam rejects malformed init arrays") {
    val d = Array.tabulate(5, 5)((i, j) => math.abs(i - j).toDouble)
    intercept[IllegalArgumentException] {
      Cluster.pam(d, k = 2, init = Some(Array(0))) // wrong length
    }
    intercept[IllegalArgumentException] {
      Cluster.pam(d, k = 2, init = Some(Array(1, 1))) // duplicate
    }
    intercept[IllegalArgumentException] {
      Cluster.pam(d, k = 2, init = Some(Array(0, 7))) // out of range
    }
    val (labels, medoids) = Cluster.pam(d, k = 2, init = Some(Array(0, 4)))
    assert(labels.length == 5 && medoids.length == 2)
  }
}
