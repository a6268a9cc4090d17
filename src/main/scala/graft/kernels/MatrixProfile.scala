package graft.kernels

/** Matrix profile (Yeh et al. 2016, ICDM "Matrix Profile I"): for every
  * length-`m` subsequence of a series, the z-normalized Euclidean
  * distance to its nearest non-trivial neighbor within the same series —
  * THE primitive behind motif discovery (low profile values) and
  * discord/anomaly detection (high values).
  *
  * [[stomp]] is the O(n²) STOMP recursion (Zhu et al. 2016: the dot
  * product QT(i, j) updates diagonally in O(1)), [[brute]] the
  * O(n²·m) direct definition both the spec and the DuckDB oracle
  * replay. Trivial matches are excluded by |i − j| < m/2 (the standard
  * exclusion zone). Distances use
  *   d²(i, j) = 2m · (1 − (QT − m·μᵢ·μⱼ) / (m·σᵢ·σⱼ)),
  * clamped at 0 (rounding can push the correlation a ulp past 1);
  * flat windows (σ = 0): two flat windows are identical after
  * z-normalization (d = 0); flat-vs-moving is maximally uncorrelated
  * (d² = 2m) — the convention both implementations and the oracle
  * share.
  *
  * Scale: one series' profile is a single grouped-kernel call — series
  * distribute across the cluster, nothing crosses series boundaries. */
object MatrixProfile {

  /** Sliding means and standard deviations (population) of all
    * length-m windows, via prefix sums. */
  private def slidingStats(xs: Array[Double], m: Int)
      : (Array[Double], Array[Double]) = {
    val n = xs.length - m + 1
    val mu = new Array[Double](n)
    val sd = new Array[Double](n)
    var s = 0.0; var s2 = 0.0
    var i = 0
    while (i < xs.length) {
      s += xs(i); s2 += xs(i) * xs(i)
      if (i >= m) { s -= xs(i - m); s2 -= xs(i - m) * xs(i - m) }
      if (i >= m - 1) {
        val j = i - m + 1
        mu(j) = s / m
        val v = s2 / m - mu(j) * mu(j)
        sd(j) = if (v > 0) math.sqrt(v) else 0.0
      }
      i += 1
    }
    (mu, sd)
  }

  private def distSq(qt: Double, m: Int, mui: Double, sdi: Double,
      muj: Double, sdj: Double): Double = {
    if (sdi <= 0 && sdj <= 0) 0.0
    else if (sdi <= 0 || sdj <= 0) 2.0 * m
    else {
      val corr = (qt - m * mui * muj) / (m * sdi * sdj)
      math.max(0.0, 2.0 * m * (1.0 - corr))
    }
  }

  /** Direct O(n²·m) definition — the oracle-shaped reference. */
  def brute(xs: Array[Double], m: Int): (Array[Double], Array[Int]) = {
    require(m >= 2, s"matrix profile: window m must be >= 2, got $m")
    val n = xs.length - m + 1
    require(n >= 2, s"matrix profile: series of ${xs.length} has < 2 windows of $m")
    val (mu, sd) = slidingStats(xs, m)
    val excl = math.max(1, m / 2)
    val mp = Array.fill(n)(Double.PositiveInfinity)
    val mpi = Array.fill(n)(-1)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        if (math.abs(i - j) >= excl) {
          var qt = 0.0
          var k = 0
          while (k < m) { qt += xs(i + k) * xs(j + k); k += 1 }
          val d = math.sqrt(distSq(qt, m, mu(i), sd(i), mu(j), sd(j)))
          if (d < mp(i)) { mp(i) = d; mpi(i) = j }
        }
        j += 1
      }
      i += 1
    }
    (mp, mpi)
  }

  /** Distance profile (the MASS computation, direct form): z-normalized
    * Euclidean distance of ONE query pattern `q` against every length-
    * |q| window of `xs` — the pattern-search primitive ("where does
    * this shape occur?"). Same distance formula and flat-window
    * conventions as the self-join profile; no exclusion zone (the query
    * is external). O(n·m) direct dot products — exactly what the SQL
    * oracle replays (MASS's FFT convolution would differ by ulps for
    * zero asymptotic benefit at typical m). */
  def distanceProfile(xs: Array[Double], q: Array[Double]): Array[Double] = {
    val m = q.length
    require(m >= 2, s"distance profile: query length must be >= 2, got $m")
    require(xs.length >= m,
      s"distance profile: series of ${xs.length} shorter than query $m")
    val n = xs.length - m + 1
    val (mu, sd) = slidingStats(xs, m)
    var qs = 0.0; var qs2 = 0.0
    var k = 0
    while (k < m) { qs += q(k); qs2 += q(k) * q(k); k += 1 }
    val qmu = qs / m
    val qv = qs2 / m - qmu * qmu
    val qsd = if (qv > 0) math.sqrt(qv) else 0.0
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var qt = 0.0
      k = 0
      while (k < m) { qt += xs(i + k) * q(k); k += 1 }
      out(i) = math.sqrt(distSq(qt, m, mu(i), sd(i), qmu, qsd))
      i += 1
    }
    out
  }

  /** STOMP: the same profile in O(n²) — QT along each diagonal updates
    * as QT(i, j) = QT(i−1, j−1) − x(i−1)·x(j−1) + x(i+m−1)·x(j+m−1).
    * Values equal [[brute]] to float noise (accumulation order differs);
    * the argmin uses strict `<` over ascending j, so ties keep the
    * smallest neighbor index, like brute. */
  def stomp(xs: Array[Double], m: Int): (Array[Double], Array[Int]) = {
    val n = xs.length - m + 1
    stompDiagBlock(xs, m, math.max(1, m / 2), n)
  }

  /** Partial STOMP over the diagonal range `[diagLo, diagHi)` only
    * (diag = j − i; the full profile is `diagLo = excl, diagHi = n`).
    * Windows no diagonal in the range touches stay
    * `(+Infinity, -1)` — the caller's merge drops or min-combines them.
    *
    * The distributed contract: each diagonal's QT recursion is seeded
    * independently (one O(m) dot product at i = 0), so a partial block
    * computes BIT-IDENTICAL distances to the same diagonal inside the
    * monolithic walk, and the per-window combine rule is the
    * order-independent lexicographic (d, j) minimum — merging block
    * partials with `min(struct(d, j))` reproduces the monolithic
    * profile exactly, not just to rounding. */
  def stompDiagBlock(xs: Array[Double], m: Int, diagLo: Int, diagHi: Int)
      : (Array[Double], Array[Int]) = {
    require(m >= 2, s"matrix profile: window m must be >= 2, got $m")
    val n = xs.length - m + 1
    require(n >= 2, s"matrix profile: series of ${xs.length} has < 2 windows of $m")
    val excl = math.max(1, m / 2)
    require(diagLo >= excl, s"matrix profile: diagLo $diagLo inside exclusion $excl")
    require(diagHi <= n, s"matrix profile: diagHi $diagHi past $n windows")
    val (mu, sd) = slidingStats(xs, m)
    val mp = Array.fill(n)(Double.PositiveInfinity)
    val mpi = Array.fill(n)(-1)
    // lexicographic (d, j) minimum: the diagonal walk feeds row j its
    // candidates in DESCENDING index order, so a bare strict `<` would
    // keep the larger index on exact ties where brute keeps the smaller
    def consider(i: Int, j: Int, d: Double): Unit =
      if (d < mp(i) || (d == mp(i) && j < mpi(i))) { mp(i) = d; mpi(i) = j }
    // walk each diagonal once (j − i = const ≥ excl), updating QT in O(1)
    var diag = diagLo
    while (diag < diagHi) {
      var qt = 0.0
      var k = 0
      while (k < m) { qt += xs(k) * xs(diag + k); k += 1 }
      var i = 0
      var j = diag
      while (j < n) {
        if (i > 0)
          qt += xs(i + m - 1) * xs(j + m - 1) - xs(i - 1) * xs(j - 1)
        val d = math.sqrt(distSq(qt, m, mu(i), sd(i), mu(j), sd(j)))
        consider(i, j, d) // symmetric: the pair serves both windows
        consider(j, i, d)
        i += 1; j += 1
      }
      diag += 1
    }
    (mp, mpi)
  }

  /** Splits the admissible diagonal domain `[excl, n)` into up to
    * `numBlocks` contiguous ranges of ~equal PAIR count (diagonal
    * `diag` holds `n − diag` pairs, so equal-width ranges would load
    * the first block quadratically heavier). Returns `(lo, hi)` pairs
    * covering the domain exactly, without overlap. */
  def diagRanges(n: Int, m: Int, numBlocks: Int): Seq[(Int, Int)] = {
    val excl = math.max(1, m / 2)
    require(numBlocks >= 1, s"matrix profile: numBlocks must be >= 1, got $numBlocks")
    if (excl >= n) return Seq.empty
    val total = (excl until n).map(d => (n - d).toLong).sum
    val target = math.max(1L, total / numBlocks)
    val out = Seq.newBuilder[(Int, Int)]
    var made = 0
    var lo = excl
    var acc = 0L
    var d = excl
    while (d < n) {
      acc += n - d
      val isLast = d == n - 1
      if ((acc >= target && made + 1 < numBlocks) || isLast) {
        out += ((lo, d + 1)); made += 1; lo = d + 1; acc = 0L
      }
      d += 1
    }
    out.result()
  }

  /** AB-join profile (Yeh et al. 2016 §IV, the join counterpart of the
    * self-join profile): for every length-`m` window of `a`, the
    * z-normalized distance to its nearest window of `b` — and the
    * neighbor's index. No exclusion zone (the series are distinct);
    * same distance formula and flat-window conventions; argmin is the
    * lexicographic (d, j) minimum like [[stomp]]. O(nA·nB) via the same
    * per-diagonal QT recursion, each diagonal of the CROSS matrix
    * seeded with one O(m) dot product. */
  def abJoin(a: Array[Double], b: Array[Double], m: Int)
      : (Array[Double], Array[Int]) = {
    require(m >= 2, s"ab-join: window m must be >= 2, got $m")
    require(a.length >= m, s"ab-join: query series of ${a.length} has no window of $m")
    require(b.length >= m, s"ab-join: reference series of ${b.length} has no window of $m")
    val nA = a.length - m + 1
    val nB = b.length - m + 1
    val (muA, sdA) = slidingStats(a, m)
    val (muB, sdB) = slidingStats(b, m)
    val mp = Array.fill(nA)(Double.PositiveInfinity)
    val mpi = Array.fill(nA)(-1)
    def consider(i: Int, j: Int, d: Double): Unit =
      if (d < mp(i) || (d == mp(i) && j < mpi(i))) { mp(i) = d; mpi(i) = j }
    // cross-matrix diagonals: offset c = j − i ∈ (−nA, nB)
    var c = -(nA - 1)
    while (c < nB) {
      var i = math.max(0, -c)
      var j = i + c
      var qt = 0.0
      var k = 0
      while (k < m) { qt += a(i + k) * b(j + k); k += 1 }
      var first = true
      while (i < nA && j < nB) {
        if (!first)
          qt += a(i + m - 1) * b(j + m - 1) - a(i - 1) * b(j - 1)
        first = false
        consider(i, j,
          math.sqrt(distSq(qt, m, muA(i), sdA(i), muB(j), sdB(j))))
        i += 1; j += 1
      }
      c += 1
    }
    (mp, mpi)
  }
}
