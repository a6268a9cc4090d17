package graft.kernels

import scala.collection.mutable

/** Elastic distance kernels between univariate (and multivariate) series.
  *
  * Pure Scala, Spark-free, unit-testable. Each kernel is a
  * `(Array[Double], Array[Double]) => Double` mirroring the semantics of
  * the reference implementation (drumtorben/polars-ts `src/<kernel>.rs` — see
  * per-function citations), re-expressed from scratch. All DP kernels use
  * the O(m)-memory two-row formulation so a 10k-point series costs ~160KB
  * of scratch, not 800MB — essential when thousands of these run
  * concurrently inside Spark tasks.
  */
/** Default elastic-distance parameters. Single source of truth shared by
  * the kernels (default args), the driver queries, and the DuckDB oracle
  * SQL (`ElasticOracle`) so the two engines can never drift apart on a
  * parameter value. */
object ElasticParams {
  val WdtwG = 0.05
  val MsmC = 1.0
  val ErpG = 0.0
  val LcssEpsilon = 1.0
  val TweNu = 0.001
  val TweLambda = 1.0
  val EdrEpsilon = 0.1
  /** dtw_multi test channel: value2 = Multi2Scale·value + Multi2Shift. */
  val Multi2Scale = 0.5
  val Multi2Shift = 1.0
  val ItakuraMaxSlope = 2.0
  /** Sakoe-Chiba band half-width for the ts_pairwise_sakoe gate query. */
  val SakoeWindow = 10
}

object Elastic {

  private final val Inf = Double.MaxValue

  /** Standard unconstrained DTW with |a-b| point cost.
    * Semantics: reference src/dtw.rs:12-29. */
  def dtw(a: Array[Double], b: Array[Double]): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return Double.PositiveInfinity
    var prev = Array.fill(m + 1)(Inf)
    var curr = Array.fill(m + 1)(Inf)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      curr(0) = Inf
      val ai = a(i - 1)
      var j = 1
      while (j <= m) {
        val cost = math.abs(ai - b(j - 1))
        var mp = prev(j)
        if (curr(j - 1) < mp) mp = curr(j - 1)
        if (prev(j - 1) < mp) mp = prev(j - 1)
        curr(j) = cost + mp
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m)
  }

  /** DTW constrained to a Sakoe-Chiba band of half-width `window`
    * (widened to at least |n-m|). Semantics: src/dtw.rs:32-55. */
  def dtwSakoeChiba(a: Array[Double], b: Array[Double], window: Int): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return Double.PositiveInfinity
    val w = math.max(window, math.abs(n - m))
    var prev = Array.fill(m + 1)(Inf)
    var curr = Array.fill(m + 1)(Inf)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      curr(0) = Inf
      val jStart = if (i > w) i - w else 1
      val jEnd = math.min(i + w, m)
      if (jStart > 1) curr(jStart - 1) = Inf
      val ai = a(i - 1)
      var j = jStart
      while (j <= jEnd) {
        val cost = math.abs(ai - b(j - 1))
        var mp = prev(j)
        if (curr(j - 1) < mp) mp = curr(j - 1)
        if (prev(j - 1) < mp) mp = prev(j - 1)
        curr(j) = cost + mp
        j += 1
      }
      // cells right of the band must not leak stale values into row i+1
      var k = jEnd + 1
      while (k <= m) { curr(k) = Inf; k += 1 }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m)
  }

  /** DTW constrained to an Itakura parallelogram with slope `maxSlope`.
    * Semantics: src/dtw.rs:58-86. */
  def dtwItakura(a: Array[Double], b: Array[Double], maxSlope: Double): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return Double.PositiveInfinity
    var prev = Array.fill(m + 1)(Inf)
    var curr = Array.fill(m + 1)(Inf)
    prev(0) = 0.0
    val nf = n.toDouble; val mf = m.toDouble
    var i = 1
    while (i <= n) {
      curr(0) = Inf
      val fi = i.toDouble
      val lower = math.max(fi / maxSlope, mf - (nf - fi) * maxSlope)
      val upper = math.min(fi * maxSlope, mf - (nf - fi) / maxSlope)
      val ai = a(i - 1)
      var j = 1
      while (j <= m) {
        val fj = j.toDouble
        if (fj < lower || fj > upper) curr(j) = Inf
        else {
          val cost = math.abs(ai - b(j - 1))
          var mp = prev(j)
          if (curr(j - 1) < mp) mp = curr(j - 1)
          if (prev(j - 1) < mp) mp = prev(j - 1)
          curr(j) = cost + mp
        }
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m)
  }

  /** Average consecutive pairs (FastDTW coarsening). src/dtw.rs:89-101. */
  private def reduceByHalf(x: Array[Double]): Array[Double] = {
    val out = new Array[Double]((x.length + 1) / 2)
    var i = 0; var o = 0
    while (i + 1 < x.length) { out(o) = (x(i) + x(i + 1)) / 2.0; i += 2; o += 1 }
    if (i < x.length) { out(o) = x(i) }
    out
  }

  /** FastDTW multiresolution approximation (radius-expanded projected path).
    * Semantics: src/dtw.rs:104-197. */
  def fastDtw(a: Array[Double], b: Array[Double], radius: Int): Double = {
    val minSize = radius + 2
    if (a.length <= minSize || b.length <= minSize) return dtw(a, b)
    val path = fastDtwPath(reduceByHalf(a), reduceByHalf(b), radius)
    val window = expandWindow(path, a.length, b.length, radius)
    dtwWithWindow(a, b, window)
  }

  /** The FINAL-level FastDTW search band: 1-based inclusive per-row
    * column bounds [lo(i), hi(i)] of the projected-and-expanded window
    * the top-resolution DP is constrained to. Exposed so the correctness
    * oracle can replay the final constrained DP with the sakoe/itakura
    * banded machinery (VERDICT r8 ask #3) — the multiresolution
    * recursion itself stays Scala-side, but its OUTPUT (this band) is a
    * deterministic function of the data, and the banded DP over it IS
    * the fastDtw result. For series at or below the radius+2 base size
    * fastDtw degenerates to exact DTW, so the band is the full grid.
    * Each expanded-window row is a single contiguous interval (boxes of
    * half-width `radius` ≥ 1 around a monotone projected path overlap);
    * the per-row scan below asserts that contract, so [lo, hi] encodes
    * the window exactly — never a superset. */
  def fastDtwBand(a: Array[Double], b: Array[Double],
      radius: Int): (Array[Int], Array[Int]) = {
    val n = a.length; val m = b.length
    val minSize = radius + 2
    if (n <= minSize || m <= minSize)
      return (Array.fill(n)(1), Array.fill(n)(m))
    val path = fastDtwPath(reduceByHalf(a), reduceByHalf(b), radius)
    val window = expandWindow(path, n, m, radius)
    val lo = Array.fill(n)(Int.MaxValue)
    val hi = Array.fill(n)(Int.MinValue)
    window.foreach { cell =>
      val i = (cell / m).toInt; val j = (cell % m).toInt
      if (j + 1 < lo(i)) lo(i) = j + 1
      if (j + 1 > hi(i)) hi(i) = j + 1
    }
    var i = 0
    while (i < n) {
      require(lo(i) <= hi(i), s"fastDtwBand: empty window row $i")
      var j = lo(i)
      while (j <= hi(i)) {
        require(window.contains(i.toLong * m + (j - 1)),
          s"fastDtwBand: non-contiguous window at row $i col $j")
        j += 1
      }
      i += 1
    }
    (lo, hi)
  }

  private def expandWindow(path: IndexedSeq[(Int, Int)], n: Int, m: Int,
      radius: Int): mutable.HashSet[Long] = {
    val window = new mutable.HashSet[Long]
    path.foreach { case (pi, pj) =>
      var di = 0
      while (di < 2) {
        var dj = 0
        while (dj < 2) {
          val oi = pi * 2 + di; val oj = pj * 2 + dj
          if (oi < n && oj < m) {
            val ri0 = math.max(0, oi - radius); val ri1 = math.min(oi + radius, n - 1)
            val rj0 = math.max(0, oj - radius); val rj1 = math.min(oj + radius, m - 1)
            var ri = ri0
            while (ri <= ri1) {
              var rj = rj0
              while (rj <= rj1) { window.add(ri.toLong * m + rj); rj += 1 }
              ri += 1
            }
          }
          dj += 1
        }
        di += 1
      }
    }
    window
  }

  private def dtwWithWindow(a: Array[Double], b: Array[Double],
      window: mutable.HashSet[Long]): Double = {
    val n = a.length; val m = b.length
    val cost = Array.fill(n + 1, m + 1)(Inf)
    cost(0)(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        if (window.contains((i - 1).toLong * m + (j - 1))) {
          val c = math.abs(a(i - 1) - b(j - 1))
          var mp = cost(i - 1)(j)
          if (cost(i)(j - 1) < mp) mp = cost(i)(j - 1)
          if (cost(i - 1)(j - 1) < mp) mp = cost(i - 1)(j - 1)
          cost(i)(j) = c + mp
        }
        j += 1
      }
      i += 1
    }
    cost(n)(m)
  }

  private def fastDtwPath(a: Array[Double], b: Array[Double],
      radius: Int): IndexedSeq[(Int, Int)] = {
    val minSize = radius + 2
    if (a.length <= minSize || b.length <= minSize) return dtwFullPath(a, b)
    val path = fastDtwPath(reduceByHalf(a), reduceByHalf(b), radius)
    val window = expandWindow(path, a.length, b.length, radius)
    dtwPathWithWindow(a, b, window)
  }

  private def backtrack(cost: Array[Array[Double]], n: Int, m: Int): IndexedSeq[(Int, Int)] = {
    val path = mutable.ArrayBuffer.empty[(Int, Int)]
    var i = n; var j = m
    while (i > 0 && j > 0) {
      path += ((i - 1, j - 1))
      val diag = cost(i - 1)(j - 1); val left = cost(i)(j - 1); val up = cost(i - 1)(j)
      if (diag <= left && diag <= up) { i -= 1; j -= 1 }
      else if (up <= left) i -= 1
      else j -= 1
    }
    path.reverse.toIndexedSeq
  }

  private def dtwFullPath(a: Array[Double], b: Array[Double]): IndexedSeq[(Int, Int)] = {
    val n = a.length; val m = b.length
    val cost = Array.fill(n + 1, m + 1)(Inf)
    cost(0)(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        val c = math.abs(a(i - 1) - b(j - 1))
        var mp = cost(i - 1)(j)
        if (cost(i)(j - 1) < mp) mp = cost(i)(j - 1)
        if (cost(i - 1)(j - 1) < mp) mp = cost(i - 1)(j - 1)
        cost(i)(j) = c + mp
        j += 1
      }
      i += 1
    }
    backtrack(cost, n, m)
  }

  private def dtwPathWithWindow(a: Array[Double], b: Array[Double],
      window: mutable.HashSet[Long]): IndexedSeq[(Int, Int)] = {
    val n = a.length; val m = b.length
    val cost = Array.fill(n + 1, m + 1)(Inf)
    cost(0)(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        if (window.contains((i - 1).toLong * m + (j - 1))) {
          val c = math.abs(a(i - 1) - b(j - 1))
          var mp = cost(i - 1)(j)
          if (cost(i)(j - 1) < mp) mp = cost(i)(j - 1)
          if (cost(i - 1)(j - 1) < mp) mp = cost(i - 1)(j - 1)
          cost(i)(j) = c + mp
        }
        j += 1
      }
      i += 1
    }
    backtrack(cost, n, m)
  }

  /** Keogh-Pazzani (2001) derivative estimate; drops both endpoints.
    * Semantics: src/ddtw.rs:7-19. */
  def derivative(q: Array[Double]): Array[Double] = {
    if (q.length < 3) return Array.empty
    val out = new Array[Double](q.length - 2)
    var i = 1
    while (i < q.length - 1) {
      out(i - 1) = ((q(i) - q(i - 1)) + (q(i + 1) - q(i - 1)) / 2.0) / 2.0
      i += 1
    }
    out
  }

  /** Derivative DTW: DTW over Keogh-Pazzani derivatives. src/ddtw.rs:44-53. */
  def ddtw(a: Array[Double], b: Array[Double]): Double = {
    val ad = derivative(a); val bd = derivative(b)
    if (ad.isEmpty || bd.isEmpty) Double.PositiveInfinity else dtw(ad, bd)
  }

  /** Weighted DTW: sigmoid weight on |i-j|, squared point cost.
    * Semantics: src/wdtw.rs:7-40 (g default 0.05). */
  def wdtw(a: Array[Double], b: Array[Double], g: Double = ElasticParams.WdtwG): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return Double.PositiveInfinity
    val maxLen = math.max(n, m)
    val half = maxLen / 2.0
    val weight = Array.tabulate(maxLen)(i => 1.0 / (1.0 + math.exp(-g * (i - half))))
    var prev = Array.fill(m + 1)(Double.PositiveInfinity)
    var curr = Array.fill(m + 1)(Double.PositiveInfinity)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      curr(0) = Double.PositiveInfinity
      val ai = a(i - 1)
      var j = 1
      while (j <= m) {
        val w = weight(math.abs(i - j))
        val d = ai - b(j - 1)
        var mp = prev(j - 1)
        if (prev(j) < mp) mp = prev(j)
        if (curr(j - 1) < mp) mp = curr(j - 1)
        curr(j) = mp + w * d * d
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m)
  }

  /** Move-Split-Merge cost helper. src/msm.rs:7-13. */
  @inline private def msmCost(x: Double, y: Double, z: Double, c: Double): Double =
    if ((y <= x && x <= z) || (y >= x && x >= z)) c
    else c + math.min(math.abs(x - y), math.abs(x - z))

  /** Move-Split-Merge edit distance. Semantics: src/msm.rs:16-40 (c=1.0). */
  def msm(a: Array[Double], b: Array[Double], c: Double = ElasticParams.MsmC): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return 0.0
    var prev = Array.fill(m)(Inf)
    var curr = Array.fill(m)(Inf)
    prev(0) = math.abs(a(0) - b(0))
    var j = 1
    while (j < m) { prev(j) = prev(j - 1) + msmCost(b(j), a(0), b(j - 1), c); j += 1 }
    var i = 1
    while (i < n) {
      curr(0) = prev(0) + msmCost(a(i), a(i - 1), b(0), c)
      j = 1
      while (j < m) {
        val d1 = prev(j - 1) + math.abs(a(i) - b(j))
        val d2 = prev(j) + msmCost(a(i), a(i - 1), b(j), c)
        val d3 = curr(j - 1) + msmCost(b(j), a(i), b(j - 1), c)
        curr(j) = math.min(d1, math.min(d2, d3))
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m - 1)
  }

  /** Edit distance with Real Penalty (gap value g). src/erp.rs:7-32 (g=0.0). */
  def erp(a: Array[Double], b: Array[Double], g: Double = ElasticParams.ErpG): Double = {
    val n = a.length; val m = b.length
    var prev = new Array[Double](m + 1)
    var curr = new Array[Double](m + 1)
    var j = 1
    while (j <= m) { prev(j) = prev(j - 1) + math.abs(b(j - 1) - g); j += 1 }
    var firstCol = 0.0
    var i = 1
    while (i <= n) {
      firstCol += math.abs(a(i - 1) - g)
      curr(0) = firstCol
      j = 1
      while (j <= m) {
        val dMatch = prev(j - 1) + math.abs(a(i - 1) - b(j - 1))
        val dDel = prev(j) + math.abs(a(i - 1) - g)
        val dIns = curr(j - 1) + math.abs(b(j - 1) - g)
        curr(j) = math.min(dMatch, math.min(dDel, dIns))
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m)
  }

  /** LCSS distance 1 - len/min(n,m) with ε-matching. src/lcss.rs:7-36 (ε=1.0). */
  def lcss(a: Array[Double], b: Array[Double], epsilon: Double = ElasticParams.LcssEpsilon): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return 1.0
    var prev = new Array[Int](m + 1)
    var curr = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        curr(j) =
          if (math.abs(a(i - 1) - b(j - 1)) <= epsilon) prev(j - 1) + 1
          else math.max(prev(j), curr(j - 1))
        j += 1
      }
      val t = prev; prev = curr; curr = t
      java.util.Arrays.fill(curr, 0)
      i += 1
    }
    1.0 - prev(m).toDouble / math.min(n, m).toDouble
  }

  /** Time Warp Edit distance (stiffness ν, gap penalty λ).
    * Semantics: src/twe.rs:7-46 (ν=0.001, λ=1.0). */
  def twe(a: Array[Double], b: Array[Double], nu: Double = ElasticParams.TweNu,
      lambda: Double = ElasticParams.TweLambda): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return 0.0
    var prev = Array.fill(m + 1)(Inf)
    var curr = Array.fill(m + 1)(Inf)
    prev(0) = 0.0
    var j = 1
    while (j <= m) {
      val bPrev = if (j > 1) b(j - 2) else 0.0
      prev(j) = prev(j - 1) + math.abs(b(j - 1) - bPrev) + nu + lambda
      j += 1
    }
    var i = 1
    while (i <= n) {
      val ai = a(i - 1)
      val aPrev = if (i > 1) a(i - 2) else 0.0
      curr(0) = prev(0) + math.abs(ai - aPrev) + nu + lambda
      j = 1
      while (j <= m) {
        val bj = b(j - 1)
        val bPrev = if (j > 1) b(j - 2) else 0.0
        val dMatch = prev(j - 1) + math.abs(ai - bj) + math.abs(aPrev - bPrev) +
          math.min(nu * math.abs(i.toDouble - j.toDouble), 2.0 * nu)
        val dDel = prev(j) + math.abs(ai - aPrev) + nu + lambda
        val dIns = curr(j - 1) + math.abs(bj - bPrev) + nu + lambda
        curr(j) = math.min(dMatch, math.min(dDel, dIns))
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m)
  }

  /** Shape-Based Distance = 1 - max normalized cross-correlation.
    * Direct O(nm) NCC. Semantics: src/sbd.rs:8-53. Range [0, 2]. */
  def sbd(a: Array[Double], b: Array[Double]): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return 2.0
    var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) { na += a(i) * a(i); i += 1 }
    i = 0
    while (i < m) { nb += b(i) * b(i); i += 1 }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) return 1.0
    var maxNcc = Double.NegativeInfinity
    var k = 0
    val len = n + m - 1
    while (k < len) {
      val shift = k - (m - 1)
      var sum = 0.0
      var ii = math.max(0, shift)
      val iEnd = math.min(n - 1, m - 1 + shift)
      while (ii <= iEnd) {
        sum += a(ii) * b(ii - shift)
        ii += 1
      }
      val ncc = sum / denom
      if (ncc > maxNcc) maxNcc = ncc
      k += 1
    }
    1.0 - maxNcc
  }

  /** Discrete Fréchet distance, O(m)-memory DP. src/frechet.rs:7-35. */
  def frechet(a: Array[Double], b: Array[Double]): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return Double.PositiveInfinity
    var prev = new Array[Double](m)
    var curr = new Array[Double](m)
    prev(0) = math.abs(a(0) - b(0))
    var j = 1
    while (j < m) { prev(j) = math.max(prev(j - 1), math.abs(a(0) - b(j))); j += 1 }
    var i = 1
    while (i < n) {
      val ai = a(i)
      curr(0) = math.max(prev(0), math.abs(ai - b(0)))
      j = 1
      while (j < m) {
        var mp = prev(j - 1)
        if (prev(j) < mp) mp = prev(j)
        if (curr(j - 1) < mp) mp = curr(j - 1)
        curr(j) = math.max(mp, math.abs(ai - b(j)))
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m - 1)
  }

  /** Edit Distance on Real sequences / max(n,m). src/edr.rs:8-46 (ε=0.1). */
  def edr(a: Array[Double], b: Array[Double], epsilon: Double = ElasticParams.EdrEpsilon): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return 1.0
    var prev = Array.tabulate(m + 1)(identity)
    var curr = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      curr(0) = i
      var j = 1
      while (j <= m) {
        val sub = if (math.abs(a(i - 1) - b(j - 1)) <= epsilon) 0 else 1
        var v = prev(j - 1) + sub
        if (prev(j) + 1 < v) v = prev(j) + 1
        if (curr(j - 1) + 1 < v) v = curr(j - 1) + 1
        curr(j) = v
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m).toDouble / math.max(n, m).toDouble
  }

  /** Manhattan distance between two channel-vectors. */
  @inline private def manhattan(x: Array[Double], y: Array[Double]): Double = {
    var s = 0.0; var c = 0
    val len = math.min(x.length, y.length)
    while (c < len) { s += math.abs(x(c) - y(c)); c += 1 }
    s
  }

  /** Squared Euclidean distance between two channel-vectors. */
  @inline private def sqDist(x: Array[Double], y: Array[Double]): Double = {
    var s = 0.0; var c = 0
    val len = math.min(x.length, y.length)
    while (c < len) { val d = x(c) - y(c); s += d * d; c += 1 }
    s
  }

  /** Multivariate DTW over time-major series (`series(t)` = channel vector),
    * manhattan or euclidean pointwise metric. Semantics: src/dtw_multi.rs:14-43. */
  def dtwMulti(a: Array[Array[Double]], b: Array[Array[Double]],
      euclidean: Boolean = false): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return Double.PositiveInfinity
    var prev = Array.fill(m + 1)(Inf)
    var curr = Array.fill(m + 1)(Inf)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      curr(0) = Inf
      val ai = a(i - 1)
      var j = 1
      while (j <= m) {
        val cost = if (euclidean) math.sqrt(sqDist(ai, b(j - 1))) else manhattan(ai, b(j - 1))
        var mp = prev(j)
        if (curr(j - 1) < mp) mp = curr(j - 1)
        if (prev(j - 1) < mp) mp = prev(j - 1)
        curr(j) = cost + mp
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m)
  }

  /** Dependent MSM cost for vectors: c if x lies within the hypersphere
    * centred at midpoint(y, z), else c + min(d²(y,x), d²(z,x)).
    * Semantics: src/msm_multi.rs:20-29. */
  @inline private def costDependent(x: Array[Double], y: Array[Double],
      z: Array[Double], c: Double): Double = {
    val diameter = sqDist(y, z)
    val len = math.min(y.length, z.length)
    val mid = new Array[Double](len)
    var k = 0
    while (k < len) { mid(k) = (y(k) + z(k)) / 2.0; k += 1 }
    if (sqDist(mid, x) <= diameter / 2.0) c
    else c + math.min(sqDist(y, x), sqDist(z, x))
  }

  /** Multivariate MSM over time-major series with dependent cost.
    * Semantics: src/msm_multi.rs:32-59 (c=1.0). */
  def msmMulti(a: Array[Array[Double]], b: Array[Array[Double]],
      c: Double = 1.0): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return 0.0
    var prev = Array.fill(m)(Inf)
    var curr = Array.fill(m)(Inf)
    prev(0) = manhattan(a(0), b(0))
    var j = 1
    while (j < m) { prev(j) = prev(j - 1) + costDependent(b(j), b(j - 1), a(0), c); j += 1 }
    var i = 1
    while (i < n) {
      curr(0) = prev(0) + costDependent(a(i), a(i - 1), b(0), c)
      j = 1
      while (j < m) {
        val d1 = prev(j - 1) + manhattan(a(i), b(j))
        val d2 = prev(j) + costDependent(a(i), a(i - 1), b(j), c)
        val d3 = curr(j - 1) + costDependent(b(j), a(i), b(j - 1), c)
        curr(j) = math.min(d1, math.min(d2, d3))
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m - 1)
  }

  /** Sakoe-Chiba envelope of half-width `w`: per position the running
    * max/min of the band — the classic LB_Keogh envelope (Keogh &
    * Ratanamahatana 2005). Returned flat as [U.. , L..] so it can live in
    * one array column. */
  def envelope(b: Array[Double], w: Int): Array[Double] = {
    val m = b.length
    val out = new Array[Double](2 * m)
    var i = 0
    while (i < m) {
      var hi = Double.NegativeInfinity
      var lo = Double.PositiveInfinity
      var j = math.max(0, i - w)
      val end = math.min(m - 1, i + w)
      while (j <= end) {
        val v = b(j)
        if (v > hi) hi = v
        if (v < lo) lo = v
        j += 1
      }
      out(i) = hi; out(m + i) = lo
      i += 1
    }
    out
  }

  /** LB_Keogh lower bound of band-constrained DTW with L1 point cost
    * (matches [[dtwSakoeChiba]]'s cost): Σ max(0, a_i − U_i, L_i − a_i)
    * over the aligned prefix. Cheap O(n) reject test before the O(n·w)
    * DP — sound for equal-length series within the same band width. */
  def lbKeogh(a: Array[Double], env: Array[Double]): Double = {
    val m = env.length / 2
    val n = math.min(a.length, m)
    var s = 0.0
    var i = 0
    while (i < n) {
      val v = a(i)
      if (v > env(i)) s += v - env(i)
      else if (v < env(m + i)) s += env(m + i) - v
      i += 1
    }
    s
  }
}
