package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

/** ADVICE r7: the CLARA/CLARANS assignment tie-break must stay pinned to
  * first-min (lowest cluster index) — the semantics the DuckDB replay
  * mirrors with `ORDER BY dd, cluster`. Duplicate / equidistant points
  * are exactly where a drifting tie-break would silently diverge. */
class MedoidTieBreakSpec extends AnyFunSuite {

  /** 6 points: two tight blobs {0,1,2} and {3,4,5}; point 2 and point 3
    * EXACTLY equidistant from both blob centers. */
  private def tieMatrix: Array[Array[Double]] = {
    val m = Array.fill(6, 6)(0.0)
    def set(i: Int, j: Int, d: Double): Unit = { m(i)(j) = d; m(j)(i) = d }
    set(0, 1, 0.1); set(0, 2, 1.0); set(1, 2, 1.0)
    set(3, 4, 0.1); set(3, 5, 1.0); set(4, 5, 1.0)
    for (i <- 0 to 2; j <- 3 to 5 if !(i == 2 && j == 3)) set(i, j, 5.0)
    set(2, 3, 1.0) // the straddler pair: 2 and 3 equidistant to both medoids
    m
  }

  test("claransFit assignment ties break to the lowest cluster index") {
    val (labels, medoids) = Cluster.claransFit(tieMatrix, k = 2, seed = 7L)
    // whatever medoids the search picked, any point equidistant to both
    // must land on the FIRST medoid in search order (minBy semantics)
    for (i <- 0 until 6) {
      val d0 = tieMatrix(i)(medoids(0))
      val d1 = tieMatrix(i)(medoids(1))
      if (d0 == d1) assert(labels(i) == 0,
        s"point $i equidistant (${d0}) must take cluster 0, got ${labels(i)}")
      else assert(labels(i) == (if (d0 < d1) 0 else 1))
    }
  }

  test("clara assignment ties break to the lowest (sorted-medoid) index") {
    val (labels, medoids) = Cluster.clara(tieMatrix, k = 2, sampleSize = 6)
    assert(medoids.sorted.sameElements(medoids), "clara medoids are sorted")
    for (i <- 0 until 6) {
      val d0 = tieMatrix(i)(medoids(0))
      val d1 = tieMatrix(i)(medoids(1))
      if (d0 == d1) assert(labels(i) == 0)
      else assert(labels(i) == (if (d0 < d1) 0 else 1))
    }
  }

  test("duplicate series assign identically (pure function of distances)") {
    // rows 0 and 1 are exact duplicates (identical distance profiles)
    val m = Array.fill(5, 5)(0.0)
    def set(i: Int, j: Int, d: Double): Unit = { m(i)(j) = d; m(j)(i) = d }
    set(0, 2, 1.0); set(1, 2, 1.0); set(0, 3, 4.0); set(1, 3, 4.0)
    set(0, 4, 4.0); set(1, 4, 4.0); set(0, 1, 0.0)
    set(2, 3, 3.0); set(2, 4, 3.0); set(3, 4, 0.5)
    val (labels, _) = Cluster.claransFit(m, k = 2, seed = 42L)
    assert(labels(0) == labels(1), "duplicates must share a cluster")
    val (labels2, _) = Cluster.clara(m, k = 2, sampleSize = 5)
    assert(labels2(0) == labels2(1))
  }

  test("claransFit rejects degenerate arguments loudly") {
    val m = tieMatrix
    intercept[IllegalArgumentException](Cluster.claransFit(m, k = 2, numLocal = 0))
    intercept[IllegalArgumentException](Cluster.claransFit(m, k = 2, maxNeighbor = -1))
    intercept[IllegalArgumentException](Cluster.claransFit(m, k = 0))
  }
}
