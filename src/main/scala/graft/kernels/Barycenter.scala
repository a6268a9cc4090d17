package graft.kernels

/** Elastic barycenter kernels: DTW Barycentric Averaging (reference
  * polars_ts/clustering/dba.py:13-133, Petitjean 2011) and KASBA's MSM
  * stochastic-subgradient averaging (reference src/kasba/average.rs:15-129,
  * alignment/mod.rs, alignment/traceback.rs). Univariate; the multivariate
  * (dependent-channel) mode is descoped with the rest of the multichannel
  * tier. */
object Barycenter {

  /** Full-matrix DTW with squared point cost + greedy traceback, matching
    * dba.py:_dtw_alignment_path (argmin preference diag, up, left).
    * Returns (i over `s`, j over `t`) pairs, path order irrelevant to DBA. */
  def dtwPathSq(s: Array[Double], t: Array[Double]): Array[(Int, Int)] = {
    val n = s.length; val m = t.length
    val cost = Array.fill((n + 1) * (m + 1))(Double.PositiveInfinity)
    cost(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        val d = { val x = s(i - 1) - t(j - 1); x * x }
        val a = cost((i - 1) * (m + 1) + (j - 1))
        val b = cost((i - 1) * (m + 1) + j)
        val cc = cost(i * (m + 1) + (j - 1))
        cost(i * (m + 1) + j) = d + math.min(a, math.min(b, cc))
        j += 1
      }
      i += 1
    }
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var ii = n; var jj = m
    while (ii >= 1 && jj >= 1) {
      buf += ((ii - 1, jj - 1))
      if (ii == 1 && jj == 1) { ii = 0 }
      else if (ii == 1) jj -= 1
      else if (jj == 1) ii -= 1
      else {
        val diag = cost((ii - 1) * (m + 1) + (jj - 1))
        val up = cost((ii - 1) * (m + 1) + jj)
        val left = cost(ii * (m + 1) + (jj - 1))
        if (diag <= up && diag <= left) { ii -= 1; jj -= 1 }
        else if (up <= left) ii -= 1
        else jj -= 1
      }
    }
    buf.toArray
  }

  /** One DBA refinement (dba.py:_dba_update): align every series to the
    * centroid, average member values per centroid position; positions no
    * path visits become 0 (reference semantics). */
  def dbaUpdate(centroid: Array[Double], series: Iterable[Array[Double]]): Array[Double] = {
    val cLen = centroid.length
    val total = new Array[Double](cLen)
    val counts = new Array[Double](cLen)
    series.foreach { s =>
      val path = dtwPathSq(centroid, s)
      var p = 0
      while (p < path.length) {
        val (ci, si) = path(p)
        total(ci) += s(si); counts(ci) += 1.0
        p += 1
      }
    }
    Array.tabulate(cLen)(i => if (counts(i) > 0) total(i) / counts(i) else 0.0)
  }

  /** Driver-side DBA (dba.py:50-95): medoid-free init = caller-provided
    * (the ops layer initializes from a member), iterate until mean |Δ| <
    * tol. */
  def dba(series: Array[Array[Double]], init: Array[Double], maxIter: Int = 30,
      tol: Double = 1e-5): Array[Double] = {
    if (series.isEmpty) return init
    if (series.length == 1) return series(0).clone()
    var centroid = init.clone()
    var it = 0
    var done = false
    while (it < maxIter && !done) {
      val next = dbaUpdate(centroid, series)
      var change = 0.0
      var i = 0
      while (i < centroid.length) { change += math.abs(next(i) - centroid(i)); i += 1 }
      centroid = next
      if (change / centroid.length < tol) done = true
      it += 1
    }
    centroid
  }

  @inline private def msmC(x: Double, y: Double, z: Double, c: Double): Double =
    if ((y <= x && x <= z) || (y >= x && x >= z)) c
    else c + math.min(math.abs(x - y), math.abs(x - z))

  /** Full MSM cost matrix (alignment/mod.rs:11-42), row-major n×m. */
  def msmCostMatrix(a: Array[Double], b: Array[Double], c: Double): Array[Double] = {
    val n = a.length; val m = b.length
    val cm = new Array[Double](n * m)
    cm(0) = math.abs(a(0) - b(0))
    var i = 1
    while (i < n) { cm(i * m) = cm((i - 1) * m) + msmC(a(i), a(i - 1), b(0), c); i += 1 }
    var j = 1
    while (j < m) { cm(j) = cm(j - 1) + msmC(b(j), a(0), b(j - 1), c); j += 1 }
    i = 1
    while (i < n) {
      val ai = a(i); val ai1 = a(i - 1)
      j = 1
      while (j < m) {
        val bj = b(j); val bj1 = b(j - 1)
        val d1 = cm((i - 1) * m + (j - 1)) + math.abs(ai - bj)
        val d2 = cm((i - 1) * m + j) + msmC(ai, ai1, bj, c)
        val d3 = cm(i * m + (j - 1)) + msmC(bj, ai, bj1, c)
        cm(i * m + j) = math.min(d1, math.min(d2, d3))
        j += 1
      }
      i += 1
    }
    cm
  }

  /** Greedy min-cost traceback (alignment/traceback.rs:2-32): (i, j) pairs
    * from (n−1, m−1) back to (0, 0). */
  def minReturnPath(cm: Array[Double], n: Int, m: Int): Array[(Int, Int)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = n - 1; var j = m - 1
    while (i > 0 || j > 0) {
      buf += ((i, j))
      if (i == 0) j -= 1
      else if (j == 0) i -= 1
      else {
        val diag = cm((i - 1) * m + (j - 1))
        val up = cm((i - 1) * m + j)
        val left = cm(i * m + (j - 1))
        if (diag <= up && diag <= left) { i -= 1; j -= 1 }
        else if (up <= left) i -= 1
        else j -= 1
      }
    }
    buf += ((0, 0))
    buf.toArray
  }

  /** One KASBA SSG epoch (average.rs:kasba_refine_one_iter): sequential
    * subgradient steps over the shuffled member order; path is computed
    * ts-vs-barycenter so (j over ts, k over barycenter). */
  def kasbaRefineOnce(barycenter: Array[Double], members: IndexedSeq[Array[Double]],
      order: Seq[Int], stepSize: Double, c: Double): Array[Double] = {
    val len = barycenter.length
    val bc = barycenter.clone()
    val grad = new Array[Double](len)
    order.foreach { idx =>
      val ts = members(idx)
      val path = minReturnPath(msmCostMatrix(ts, bc, c), ts.length, bc.length)
      java.util.Arrays.fill(grad, 0.0)
      var p = 0
      while (p < path.length) {
        val (j, k) = path(p)
        grad(k) += bc(k) - ts(j)
        p += 1
      }
      val factor = 2.0 * stepSize
      var i = 0
      while (i < len) { bc(i) -= factor * grad(i); i += 1 }
    }
    bc
  }

  /** KASBA barycenter averaging (average.rs:kasba_average): epoch 0 visits
    * every member, later epochs a shuffled subset; exponentially decaying
    * step; early stop when the summed MSM cost converges or rises. */
  def kasbaAverage(members: IndexedSeq[Array[Double]], init: Array[Double],
      previousCost: Double, maxIters: Int = 30, tol: Double = 1e-5,
      baSubsetSize: Double = 0.5, initialStepSize: Double = 0.05,
      decayRate: Double = 0.1, c: Double = 1.0,
      rng: scala.util.Random): Array[Double] = {
    val n = members.length
    if (n <= 1) return init.clone()
    val numUse = math.min(n, math.max(10, (baSubsetSize * n).toInt))
    var barycenter = init.clone()
    var prevBarycenter = init.clone()
    var prevCost = previousCost
    var it = 0
    var stop = false
    while (it < maxIters && !stop) {
      val perm = rng.shuffle((0 until n).toVector)
      val order = if (it > 0) perm.take(numUse) else perm
      val step = initialStepSize * math.exp(-decayRate * it)
      barycenter = kasbaRefineOnce(barycenter, members, order, step, c)
      var cost = 0.0
      members.foreach(m => cost += Elastic.msm(m, barycenter, c))
      if (math.abs(prevCost - cost) < tol) {
        if (prevCost < cost) barycenter = prevBarycenter
        stop = true
      } else if (prevCost < cost) {
        barycenter = prevBarycenter
        stop = true
      } else {
        prevBarycenter = barycenter.clone()
        prevCost = cost
      }
      it += 1
    }
    barycenter
  }
}
