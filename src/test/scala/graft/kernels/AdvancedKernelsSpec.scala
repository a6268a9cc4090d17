package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

class AdvancedKernelsSpec extends AnyFunSuite {

  // ── clustering cores ──────────────────────────────────────────────────
  private def twoBlobs: Array[Array[Double]] = {
    // 6 points: indices 0-2 close together, 3-5 close together, far apart
    val n = 6
    val m = Array.fill(n, n)(0.0)
    def d(i: Int, j: Int, v: Double): Unit = { m(i)(j) = v; m(j)(i) = v }
    for (i <- 0 until 3; j <- i + 1 until 3) d(i, j, 1.0)
    for (i <- 3 until 6; j <- i + 1 until 6) d(i, j, 1.0)
    for (i <- 0 until 3; j <- 3 until 6) d(i, j, 10.0)
    m
  }

  test("pam recovers two separated clusters") {
    val (labels, medoids) = Cluster.pam(twoBlobs, 2)
    assert(labels.slice(0, 3).distinct.length == 1)
    assert(labels.slice(3, 6).distinct.length == 1)
    assert(labels(0) != labels(3))
    assert(medoids.length == 2)
  }

  test("silhouetteSamples: separated blobs score near 1, mean matches silhouette") {
    val labels = Array(0, 0, 0, 1, 1, 1)
    val s = Cluster.silhouetteSamples(twoBlobs, labels)
    assert(s.forall(v => v > 0.8))
    val mean = s.sum / s.length
    assert(math.abs(mean - Cluster.silhouette(twoBlobs, labels)) < 1e-12)
  }

  test("calinskiHarabasz: correct clustering beats a shuffled one") {
    val good = Cluster.calinskiHarabasz(twoBlobs, Array(0, 0, 0, 1, 1, 1))
    val bad = Cluster.calinskiHarabasz(twoBlobs, Array(0, 1, 0, 1, 0, 1))
    assert(good > bad, s"$good vs $bad")
    assert(Cluster.calinskiHarabasz(twoBlobs, Array(0, 0, 0, 0, 0, 0)) == 0.0)
  }

  test("pam is deterministic for a fixed seed") {
    val a = Cluster.pam(twoBlobs, 2, seed = 7L)._1.toSeq
    val b = Cluster.pam(twoBlobs, 2, seed = 7L)._1.toSeq
    assert(a == b)
  }

  test("clara matches pam structure on small data") {
    val (labels, _) = Cluster.clara(twoBlobs, 2, sampleSize = 6)
    assert(labels(0) != labels(3))
  }

  test("dbscan separates blobs and marks isolated noise") {
    val labels = Cluster.dbscan(twoBlobs, eps = 2.0, minPts = 2)
    assert(labels(0) == labels(1) && labels(1) == labels(2))
    assert(labels(3) == labels(4) && labels(4) == labels(5))
    assert(labels(0) != labels(3))
    assert(!labels.contains(-1))
  }

  test("agglomerative cut at 2 recovers blobs for all linkages") {
    for (linkage <- Seq("single", "complete", "average")) {
      val labels = Cluster.agglomerative(twoBlobs, 2, linkage)
      assert(labels(0) == labels(1) && labels(1) == labels(2), linkage)
      assert(labels(3) == labels(4), linkage)
      assert(labels(0) != labels(3), linkage)
    }
  }

  test("silhouette high for good labels, lower for bad labels") {
    val good = Cluster.silhouette(twoBlobs, Array(0, 0, 0, 1, 1, 1))
    val bad = Cluster.silhouette(twoBlobs, Array(0, 1, 0, 1, 0, 1))
    assert(good > 0.7)
    assert(bad < good)
  }

  test("davies-bouldin lower for good clustering") {
    val good = Cluster.daviesBouldin(twoBlobs, Array(0, 0, 0, 1, 1, 1))
    val bad = Cluster.daviesBouldin(twoBlobs, Array(0, 1, 0, 1, 0, 1))
    assert(good < bad)
  }

  // ── rocket ────────────────────────────────────────────────────────────
  test("rocket transform is deterministic and sized 2*k") {
    val bank = Rocket.randomKernels(10, 50, seed = 42L)
    val x = Array.tabulate(50)(i => math.sin(i / 3.0))
    val f1 = Rocket.transform(x, bank)
    val f2 = Rocket.transform(x, Rocket.randomKernels(10, 50, seed = 42L))
    assert(f1.length == 20)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.zipWithIndex.filter(_._2 % 2 == 0).forall { case (v, _) => v >= 0.0 && v <= 1.0 })
  }

  test("minirocket yields 84 ppv features in [0,1]") {
    val x = Array.tabulate(100)(i => math.sin(i / 5.0) + 0.01 * i)
    val f = Rocket.miniRocketTransform(x)
    assert(f.length == 84)
    assert(f.forall(v => v >= 0.0 && v <= 1.0))
  }

  // ── garch ─────────────────────────────────────────────────────────────
  test("garch fit on heteroscedastic returns: valid params, positive sigma") {
    val rng = new scala.util.Random(42)
    val n = 500
    val r = new Array[Double](n)
    var sigma2 = 1.0
    for (t <- 0 until n) {
      sigma2 = 0.1 + 0.2 * (if (t > 0) r(t - 1) * r(t - 1) else 0.0) + 0.7 * sigma2
      r(t) = math.sqrt(sigma2) * rng.nextGaussian()
    }
    val (p, fc) = Garch.fitForecast(r, 5)
    assert(p(0) > 0, "omega positive")
    assert(p(1) >= 0 && p(2) >= 0 && p(1) + p(2) < 1.0, "stationarity")
    assert(fc.forall(_ > 0), "positive vol forecast")
  }

  test("nelder-mead minimizes a quadratic") {
    val opt = Garch.nelderMead(x => (x(0) - 3.0) * (x(0) - 3.0) + (x(1) + 1.0) * (x(1) + 1.0),
      Array(0.0, 0.0), step = 0.5)
    assert(math.abs(opt(0) - 3.0) < 1e-3)
    assert(math.abs(opt(1) + 1.0) < 1e-3)
  }

  // ── hmm ───────────────────────────────────────────────────────────────
  test("hmm separates two well-separated regimes; states ordered by mean") {
    val y = Array.fill(60)(0.0).zipWithIndex.map { case (_, i) =>
      if (i < 30) 0.0 + 0.1 * math.sin(i.toDouble) else 10.0 + 0.1 * math.cos(i.toDouble)
    }
    val out = Hmm.fit(y, k = 2)
    val firstHalf = out.slice(5, 25).map(_._1)
    val secondHalf = out.slice(35, 55).map(_._1)
    assert(firstHalf.forall(_ == 0), "low regime labeled 0")
    assert(secondHalf.forall(_ == 1), "high regime labeled 1")
    assert(out.forall { case (_, p) => p >= 0.0 && p <= 1.0 + 1e-9 })
  }

  // ── kalman ────────────────────────────────────────────────────────────
  test("kalman filter tracks a level shift; smoother is smoother") {
    val y = Array.tabulate(100)(i => if (i < 50) 1.0 else 5.0)
    val (f, s) = Kalman.filterSmooth(y, q = 0.1, r = 1.0)
    assert(math.abs(f(40) - 1.0) < 0.3)
    assert(math.abs(f(99) - 5.0) < 0.3)
    assert(s.length == 100)
    // smoothed transitions earlier than filtered at the shift
    assert(s(49) > f(49) - 1e-9)
  }

  // ── F-distribution tail (granger) ─────────────────────────────────────
  test("incomplete beta / F survival sanity") {
    import graft.ops.VarModels
    assert(math.abs(VarModels.incompleteBeta(0.5, 1.0, 1.0) - 0.5) < 1e-9)
    val p = VarModels.fSf(1.0, 5.0, 100.0)
    assert(p > 0.3 && p < 0.6) // F(5,100)=1 → p ≈ 0.42
    assert(VarModels.fSf(100.0, 5.0, 100.0) < 1e-6)
  }
}
