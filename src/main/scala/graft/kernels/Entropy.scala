package graft.kernels

/** Complexity measures over a single series — classic TS features for
  * classification / regime characterization, chosen for EXACT
  * replayability: both reduce to integer counts of comparison outcomes
  * on the raw doubles (no accumulation-order-sensitive float math
  * before the final log), so a SQL oracle reproduces them bit-for-bit.
  *
  *  - [[permutationEntropy]] (Bandt & Pompe 2002): Shannon entropy of
  *    the ordinal-pattern distribution of length-`m` windows,
  *    normalized by ln(m!). Ties rank by POSITION (stable rank — the
  *    deterministic variant both engines replay identically).
  *  - [[sampleEntropy]] (Richman & Moorman 2000): −ln(A/B) where B/A
  *    count template pairs matching at length m / m+1 under the
  *    Chebyshev distance with an ABSOLUTE tolerance `r` (absolute, not
  *    the usual 0.2·σ: σ's float summation differs across engines by
  *    ulps and would make near-boundary pair decisions unstable;
  *    callers who want the σ-scaled form pass r = 0.2·σ themselves). */
object Entropy {

  /** Stable ordinal rank code of each window: for window start i,
    * code = Σ_j rank_j · m^j with rank_j = #{k : x_k < x_j, or
    * x_k == x_j and k < j} over the window. */
  def ordinalCode(xs: Array[Double], i: Int, m: Int): Int = {
    var code = 0
    var pw = 1
    var j = 0
    while (j < m) {
      var r = 0
      var k = 0
      while (k < m) {
        if (xs(i + k) < xs(i + j) ||
            (xs(i + k) == xs(i + j) && k < j)) r += 1
        k += 1
      }
      code += r * pw
      pw *= m
      j += 1
    }
    code
  }

  /** Normalized permutation entropy in [0, 1]; requires at least one
    * window. */
  def permutationEntropy(xs: Array[Double], m: Int = 3): Double = {
    require(m >= 2 && m <= 7, s"permutation entropy: m in [2,7], got $m")
    val n = xs.length - m + 1
    require(n >= 1, s"permutation entropy: series of ${xs.length} has no window of $m")
    val counts = scala.collection.mutable.Map.empty[Int, Long]
    var i = 0
    while (i < n) {
      val c = ordinalCode(xs, i, m)
      counts(c) = counts.getOrElse(c, 0L) + 1L
      i += 1
    }
    var h = 0.0
    counts.valuesIterator.foreach { c =>
      val p = c.toDouble / n
      h -= p * math.log(p)
    }
    var fact = 1.0
    var j = 2
    while (j <= m) { fact *= j; j += 1 }
    h / math.log(fact)
  }

  /** SampEn(m, r): −ln(A/B); NaN when either count is zero (too short
    * or too irregular a series for the tolerance — the caller surfaces
    * it as null). Pairs i < j, self-matches excluded by construction. */
  def sampleEntropy(xs: Array[Double], m: Int = 2, r: Double = 0.5): Double = {
    require(m >= 1, s"sample entropy: m must be >= 1, got $m")
    require(r > 0, s"sample entropy: tolerance must be positive, got $r")
    val nA = xs.length - m // windows of length m+1
    require(nA >= 2, s"sample entropy: series of ${xs.length} too short for m=$m")
    var a = 0L
    var b = 0L
    var i = 0
    while (i < nA - 1) {
      var j = i + 1
      while (j < nA) {
        // Chebyshev over the first m elements, then the (m+1)-th
        var dm = 0.0
        var k = 0
        while (k < m) {
          val d = math.abs(xs(i + k) - xs(j + k))
          if (d > dm) dm = d
          k += 1
        }
        if (dm <= r) {
          b += 1
          val d1 = math.abs(xs(i + m) - xs(j + m))
          if (math.max(dm, d1) <= r) a += 1
        }
        j += 1
      }
      i += 1
    }
    if (a == 0 || b == 0) Double.NaN else -math.log(a.toDouble / b)
  }
}
