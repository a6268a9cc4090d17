package graft.kernels

import scala.collection.mutable
import scala.util.Random

/** Distance-matrix clustering cores (reference polars_ts/clustering/).
  *
  * These run on the driver over the n×n series-distance matrix — n is the
  * number of SERIES (not rows), small by construction (reference operates
  * the same way single-node; SURVEY §2.12). The distance matrix itself is
  * computed distributed by [[graft.ops.Distances]]; only the O(n²) label
  * assignment runs here. Documented limit n ≲ 2·10⁴ (3.2 GB doubles).
  */
object Cluster {

  /** PAM k-medoids: greedy best-swap loop from seeded random init
    * (reference clustering/kmedoids.py:134-253, src/kmedoids.rs:19-160).
    * Returns (labels, medoid indices). Deterministic for a given seed. */
  /** The default PAM init: seeded shuffle of the point indexes, first k,
    * sorted. Exposed so the pinned-init oracle replays (and OraclePins
    * pins) exactly the indexes [[pam]] starts from — one definition, no
    * drift. */
  def pamDefaultInit(n: Int, k: Int, seed: Long = 42L): Array[Int] = {
    val rng = new Random(seed)
    rng.shuffle((0 until n).toVector).take(k).toArray.sorted
  }

  def pam(dist: Array[Array[Double]], k: Int, seed: Long = 42L,
      maxIter: Int = 100, init: Option[Array[Int]] = None): (Array[Int], Array[Int]) = {
    val n = dist.length
    require(k >= 1 && k <= n, s"k=$k out of range for n=$n")
    init.foreach(a => require(a.length == k && a.distinct.length == k &&
      a.forall(i => i >= 0 && i < n),
      s"init must be $k distinct medoid indices in [0, $n), got ${a.mkString("[", ",", "]")}"))
    // explicit init (e.g. first-k) keeps the greedy swap chain free of
    // RNG so the oracle can replay it; default stays the seeded shuffle
    var medoids = init.map(_.sorted).getOrElse(pamDefaultInit(n, k, seed))
    def assignAll(): Array[Int] = Array.tabulate(n) { i =>
      var best = 0; var bd = Double.MaxValue
      var c = 0
      while (c < k) { val d = dist(i)(medoids(c)); if (d < bd) { bd = d; best = c }; c += 1 }
      best
    }
    def totalCost(ms: Array[Int]): Double = {
      var s = 0.0; var i = 0
      while (i < n) {
        var bd = Double.MaxValue; var c = 0
        while (c < k) { val d = dist(i)(ms(c)); if (d < bd) bd = d; c += 1 }
        s += bd; i += 1
      }
      s
    }
    var cost = totalCost(medoids)
    var improved = true
    var iter = 0
    while (improved && iter < maxIter) {
      improved = false
      var c = 0
      while (c < k) {
        var cand = 0
        while (cand < n) {
          if (!medoids.contains(cand)) {
            val trial = medoids.clone(); trial(c) = cand
            val tc = totalCost(trial)
            if (tc + 1e-12 < cost) { medoids = trial; cost = tc; improved = true }
          }
          cand += 1
        }
        c += 1
      }
      iter += 1
    }
    (assignAll(), medoids)
  }

  /** CLARA: PAM on `samples` random subsets, keep the medoid set with the
    * best full-data cost (reference clustering/scalable.py:26-120). */
  def clara(dist: Array[Array[Double]], k: Int, sampleSize: Int,
      samples: Int = 5, seed: Long = 42L): (Array[Int], Array[Int]) = {
    val n = dist.length
    val rng = new Random(seed)
    var bestCost = Double.MaxValue
    var bestMedoids: Array[Int] = null
    (0 until samples).foreach { _ =>
      val idx = rng.shuffle((0 until n).toVector).take(math.min(sampleSize, n)).toArray
      val sub = Array.tabulate(idx.length, idx.length)((a, b) => dist(idx(a))(idx(b)))
      val (_, subMed) = pam(sub, k, rng.nextLong())
      val medoids = subMed.map(idx)
      var cost = 0.0
      var i = 0
      while (i < n) {
        var bd = Double.MaxValue; var c = 0
        while (c < k) { val d = dist(i)(medoids(c)); if (d < bd) bd = d; c += 1 }
        cost += bd; i += 1
      }
      if (cost < bestCost) { bestCost = cost; bestMedoids = medoids.sorted }
    }
    val labels = Array.tabulate(n) { i =>
      var best = 0; var bd = Double.MaxValue
      var c = 0
      while (c < k) { val d = dist(i)(bestMedoids(c)); if (d < bd) { bd = d; best = c }; c += 1 }
      best
    }
    (labels, bestMedoids)
  }

  /** DBSCAN on a precomputed distance matrix (reference
    * clustering/density.py:90-156, metric="precomputed"). Noise = -1. */
  def dbscan(dist: Array[Array[Double]], eps: Double, minPts: Int): Array[Int] = {
    val n = dist.length
    val labels = Array.fill(n)(-2) // -2 unvisited, -1 noise
    var cluster = -1
    def neighbors(i: Int): mutable.ArrayBuffer[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      var j = 0
      while (j < n) { if (dist(i)(j) <= eps) out += j; j += 1 }
      out
    }
    var i = 0
    while (i < n) {
      if (labels(i) == -2) {
        val ns = neighbors(i)
        if (ns.length < minPts) labels(i) = -1
        else {
          cluster += 1
          labels(i) = cluster
          val queue = mutable.Queue(ns.toSeq: _*)
          while (queue.nonEmpty) {
            val q = queue.dequeue()
            if (labels(q) == -1) labels(q) = cluster
            else if (labels(q) == -2) {
              labels(q) = cluster
              val qn = neighbors(q)
              if (qn.length >= minPts) queue.enqueueAll(qn)
            }
          }
        }
      }
      i += 1
    }
    labels
  }

  /** Agglomerative clustering with single/complete/average linkage, cut at
    * k clusters (reference clustering/hierarchical.py:23-150).
    *
    * O(n²) storage, ~O(n²) amortized merging via per-cluster nearest-
    * neighbor caching: each merge only rescans rows whose cached nearest
    * was touched. (The previous closest-pair scan re-sorted the active
    * set and indexed a List per probe — accidentally O(n⁴) and minutes at
    * 1.5k series; same merges, same ties, 1000× faster.) */
  def agglomerative(dist: Array[Array[Double]], k: Int,
      linkage: String = "average"): Array[Int] = {
    val n = dist.length
    require(linkage == "single" || linkage == "complete" || linkage == "average",
      s"Unknown linkage '$linkage'")
    if (n == 0) return Array.empty
    val d = Array.tabulate(n, n)((i, j) => dist(i)(j))
    val activeArr = Array.fill(n)(true)
    val sizeArr = Array.fill(n)(1)
    val membersOf = Array.tabulate(n)(i => mutable.ArrayBuffer(i))
    // nearest active partner per active cluster (ties → smallest index,
    // matching the previous deterministic scan order)
    val nearest = new Array[Int](n)
    def recomputeNearest(i: Int): Unit = {
      var best = -1
      var bd = Double.MaxValue
      var j = 0
      while (j < n) {
        if (j != i && activeArr(j)) {
          val dd = d(math.min(i, j))(math.max(i, j))
          // tie-break equals the old (min,max)-ordered scan: strictly less
          if (dd < bd) { bd = dd; best = j }
        }
        j += 1
      }
      nearest(i) = best
    }
    for (i <- 0 until n) recomputeNearest(i)
    var remaining = n
    while (remaining > k) {
      // global closest pair from the caches
      var a = -1; var b = -1
      var bd = Double.MaxValue
      var i = 0
      while (i < n) {
        if (activeArr(i) && nearest(i) >= 0) {
          val j = nearest(i)
          val dd = d(math.min(i, j))(math.max(i, j))
          val lo = math.min(i, j); val hi = math.max(i, j)
          if (dd < bd || (dd == bd && (lo < a || (lo == a && hi < b)))) {
            bd = dd; a = lo; b = hi
          }
        }
        i += 1
      }
      // merge b into a
      activeArr(b) = false
      var c = 0
      while (c < n) {
        if (activeArr(c) && c != a) {
          val dac = d(math.min(a, c))(math.max(a, c))
          val dbc = d(math.min(b, c))(math.max(b, c))
          val combined = linkage match {
            case "single" => math.min(dac, dbc)
            case "complete" => math.max(dac, dbc)
            case "average" =>
              val na = sizeArr(a).toDouble; val nb = sizeArr(b).toDouble
              (dac * na + dbc * nb) / (na + nb)
          }
          d(math.min(a, c))(math.max(a, c)) = combined
        }
        c += 1
      }
      membersOf(a) ++= membersOf(b)
      sizeArr(a) += sizeArr(b)
      remaining -= 1
      // refresh caches: a's row changed for everyone; any cluster whose
      // nearest pointed at a or b must rescan, and a may have become the
      // new nearest of clusters pointing elsewhere
      recomputeNearest(a)
      c = 0
      while (c < n) {
        if (activeArr(c) && c != a) {
          if (nearest(c) == a || nearest(c) == b) recomputeNearest(c)
          else if (nearest(c) >= 0) {
            val dac = d(math.min(a, c))(math.max(a, c))
            val cur = d(math.min(c, nearest(c)))(math.max(c, nearest(c)))
            if (dac < cur || (dac == cur && a < nearest(c))) nearest(c) = a
          }
        }
        c += 1
      }
    }
    val labels = new Array[Int](n)
    (0 until n).filter(activeArr).zipWithIndex.foreach { case (root, c) =>
      membersOf(root).foreach(i => labels(i) = c)
    }
    labels
  }

  /** Spectral clustering (reference clustering/spectral.py:52-150):
    * Gaussian affinity → normalized Laplacian → k smallest eigenvectors →
    * Lloyd k-means on the embedding rows. Driver-side breeze eig. */
  def spectral(dist: Array[Array[Double]], k: Int, sigma: Double = 0.0,
      seed: Long = 42L): Array[Int] =
    lloydFit(spectralEmbedding(dist, k, sigma), k, seed)._1

  /** The row-normalized k-smallest-eigenvector embedding spectral
    * clustering runs Lloyd over — exposed so the pinned oracle
    * (ClusterOracles.spectralSql) can inline it and replay only the
    * final k-means assignment. */
  def spectralEmbedding(dist: Array[Array[Double]], k: Int,
      sigma: Double = 0.0): Array[Array[Double]] = {
    import breeze.linalg.{eigSym, DenseMatrix}
    val n = dist.length
    val s = if (sigma > 0) sigma else {
      val ds = for (i <- 0 until n; j <- i + 1 until n) yield dist(i)(j)
      val sorted = ds.sorted
      math.max(sorted(sorted.length / 2), 1e-12) // median distance
    }
    val a = DenseMatrix.tabulate(n, n)((i, j) =>
      if (i == j) 0.0 else math.exp(-dist(i)(j) * dist(i)(j) / (2.0 * s * s)))
    val deg = Array.tabulate(n)(i => (0 until n).map(a(i, _)).sum)
    val lsym = DenseMatrix.tabulate(n, n)((i, j) => {
      val id = if (i == j) 1.0 else 0.0
      id - a(i, j) / math.sqrt(math.max(deg(i) * deg(j), 1e-12))
    })
    val es = eigSym(lsym)
    // k smallest eigenvalues → embedding rows, row-normalized
    val order = es.eigenvalues.toArray.zipWithIndex.sortBy(_._1).map(_._2).take(k)
    val emb = Array.tabulate(n, k)((i, c) => es.eigenvectors(i, order(c)))
    for (i <- 0 until n) {
      val norm = math.sqrt(emb(i).map(v => v * v).sum)
      if (norm > 0) for (c <- 0 until k) emb(i)(c) /= norm
    }
    emb
  }

  /** Plain Lloyd k-means on points (seeded init, 50 iters); also the IVF
    * coarse quantizer's trainer. Returns labels; [[lloydCenters]] returns
    * the centroids. */
  def lloyd(x: Array[Array[Double]], k: Int, seed: Long): Array[Int] =
    lloydFit(x, k, seed)._1

  /** Lloyd loop exposing (labels, centers used for the FINAL assignment
    * — i.e. the snapshot BEFORE the last update step, so an argmin replay
    * over them reproduces `labels` exactly even when 50 iterations did
    * not converge). */
  def lloydFit(x: Array[Array[Double]], k: Int,
      seed: Long): (Array[Int], Array[Array[Double]]) = {
    val n = x.length; val d = x(0).length
    val rng = new Random(seed)
    var centers = rng.shuffle(x.indices.toVector).take(k).map(i => x(i).clone()).toArray
    var assignCenters = centers
    val labels = Array.fill(n)(0)
    for (_ <- 0 until 50) {
      assignCenters = centers.map(_.clone())
      for (i <- 0 until n) {
        var best = 0; var bd = Double.MaxValue
        for (c <- 0 until k) {
          var dd = 0.0
          for (j <- 0 until d) { val t = x(i)(j) - centers(c)(j); dd += t * t }
          if (dd < bd) { bd = dd; best = c }
        }
        labels(i) = best
      }
      val sums = Array.fill(k, d)(0.0); val cnt = Array.fill(k)(0)
      for (i <- 0 until n) {
        cnt(labels(i)) += 1
        for (j <- 0 until d) sums(labels(i))(j) += x(i)(j)
      }
      for (c <- 0 until k if cnt(c) > 0; j <- 0 until d)
        centers(c)(j) = sums(c)(j) / cnt(c)
    }
    (labels, assignCenters)
  }

  /** Lloyd centroids for IVF training (same loop, returns centers). */
  def lloydCenters(x: Array[Array[Double]], k: Int, seed: Long = 42L): Array[Array[Double]] = {
    val labels = lloyd(x, k, seed)
    val d = x(0).length
    val sums = Array.fill(k, d)(0.0); val cnt = Array.fill(k)(0)
    for (i <- x.indices) {
      cnt(labels(i)) += 1
      for (j <- 0 until d) sums(labels(i))(j) += x(i)(j)
    }
    Array.tabulate(k, d)((c, j) =>
      if (cnt(c) > 0) sums(c)(j) / cnt(c) else 0.0)
  }

  /** z-normalize a series (constant → zeros). */
  def zNorm(x: Array[Double]): Array[Double] = {
    val n = x.length
    val mu = x.sum / n
    val sd = math.sqrt(x.map(v => (v - mu) * (v - mu)).sum / n)
    if (sd == 0.0) Array.fill(n)(0.0) else x.map(v => (v - mu) / sd)
  }

  /** Best-alignment shift of `x` against `ref` by cross-correlation. */
  def alignTo(ref: Array[Double], x: Array[Double]): Array[Double] = {
    val n = math.min(ref.length, x.length)
    var bestShift = 0; var bestCc = Double.NegativeInfinity
    var s = -(n - 1)
    while (s < n) {
      var cc = 0.0
      var i = math.max(0, s)
      val end = math.min(n - 1, n - 1 + s)
      while (i <= end) { cc += ref(i) * x(i - s); i += 1 }
      if (cc > bestCc) { bestCc = cc; bestShift = s }
      s += 1
    }
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val j = i - bestShift
      out(i) = if (j >= 0 && j < n) x(j) else 0.0
      i += 1
    }
    out
  }

  /** k-Shape clustering (reference clustering/kshape.py:9-160): z-norm,
    * SBD assignment, centroid = dominant eigenvector of the aligned
    * member matrix (power iteration). Series must share one length. */
  def kShape(series: Array[Array[Double]], k: Int, seed: Long = 42L,
      maxIter: Int = 20): Array[Int] = {
    val n = series.length
    require(n >= k, s"need at least k=$k series")
    val len = series.map(_.length).min
    val z = series.map(s => zNorm(s.take(len)))
    val rng = new Random(seed)
    var centroids = rng.shuffle(z.indices.toVector).take(k).map(i => z(i).clone()).toArray
    var labels = Array.fill(n)(0)
    var it = 0
    var changed = true
    while (it < maxIter && changed) {
      changed = false
      // assignment by SBD
      var i = 0
      while (i < n) {
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          val d = Elastic.sbd(z(i), centroids(c))
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        if (labels(i) != best) { labels(i) = best; changed = true }
        i += 1
      }
      // centroid update: power iteration on M = Σ aligned·alignedᵀ
      for (c <- 0 until k) {
        val members = z.indices.filter(labels(_) == c)
        if (members.nonEmpty) {
          val aligned = members.map(m => alignTo(centroids(c), z(m)))
          var v = centroids(c).clone()
          if (v.forall(_ == 0.0)) v = Array.tabulate(len)(i => 1.0 / math.sqrt(len))
          var p = 0
          while (p < 15) {
            val mv = new Array[Double](len)
            aligned.foreach { a =>
              var dot = 0.0
              var j = 0
              while (j < len) { dot += a(j) * v(j); j += 1 }
              j = 0
              while (j < len) { mv(j) += dot * a(j); j += 1 }
            }
            val norm = math.sqrt(mv.map(x => x * x).sum)
            if (norm > 0) { var j = 0; while (j < len) { v(j) = mv(j) / norm; j += 1 } }
            p += 1
          }
          // sign convention: positive correlation with cluster mean
          val mean = new Array[Double](len)
          aligned.foreach { a => var j = 0; while (j < len) { mean(j) += a(j); j += 1 } }
          val dot = v.zip(mean).map { case (a, b) => a * b }.sum
          centroids(c) = if (dot < 0) v.map(-_) else v
        }
      }
      it += 1
    }
    labels
  }

  /** Mean silhouette score from the distance matrix
    * (clustering/evaluation.py:12-120). */
  def silhouette(dist: Array[Array[Double]], labels: Array[Int]): Double = {
    val n = dist.length
    val clusters = labels.distinct.filter(_ >= 0)
    if (clusters.length < 2) return 0.0
    var total = 0.0; var counted = 0
    var i = 0
    while (i < n) {
      if (labels(i) >= 0) {
        val own = labels(i)
        var a = 0.0; var na = 0
        val bByCluster = mutable.Map.empty[Int, (Double, Int)]
        var j = 0
        while (j < n) {
          if (j != i && labels(j) >= 0) {
            if (labels(j) == own) { a += dist(i)(j); na += 1 }
            else {
              val (s, c) = bByCluster.getOrElse(labels(j), (0.0, 0))
              bByCluster(labels(j)) = (s + dist(i)(j), c + 1)
            }
          }
          j += 1
        }
        if (na > 0 && bByCluster.nonEmpty) {
          val ai = a / na
          val bi = bByCluster.values.map { case (s, c) => s / c }.min
          total += (bi - ai) / math.max(ai, bi)
          counted += 1
        }
      }
      i += 1
    }
    if (counted == 0) 0.0 else total / counted
  }

  /** Per-sample silhouette values (clustering/evaluation.py:108-178):
    * s_i = (b_i − a_i)/max(a_i, b_i); 0 for singleton clusters and when
    * fewer than two clusters exist. */
  def silhouetteSamples(dist: Array[Array[Double]], labels: Array[Int]): Array[Double] = {
    val n = dist.length
    val clusters = labels.distinct.filter(_ >= 0)
    val out = new Array[Double](n)
    if (clusters.length < 2 || n <= 1) return out
    var i = 0
    while (i < n) {
      if (labels(i) >= 0) {
        val own = labels(i)
        var a = 0.0; var na = 0
        val bByCluster = mutable.Map.empty[Int, (Double, Int)]
        var j = 0
        while (j < n) {
          if (j != i && labels(j) >= 0) {
            if (labels(j) == own) { a += dist(i)(j); na += 1 }
            else {
              val (s, c) = bByCluster.getOrElse(labels(j), (0.0, 0))
              bByCluster(labels(j)) = (s + dist(i)(j), c + 1)
            }
          }
          j += 1
        }
        val ai = if (na > 0) a / na else 0.0
        if (bByCluster.nonEmpty) {
          val bi = bByCluster.values.map { case (s, c) => s / c }.min
          val denom = math.max(ai, bi)
          out(i) = if (denom > 0) (bi - ai) / denom else 0.0
        }
      }
      i += 1
    }
    out
  }

  /** Medoid-based Calinski-Harabasz index
    * (clustering/evaluation.py:251-326): between-cluster dispersion over
    * within-cluster dispersion, both measured via medoids on the distance
    * matrix. Higher is better; 0 for degenerate clusterings. */
  def calinskiHarabasz(dist: Array[Array[Double]], labels: Array[Int]): Double = {
    val n = dist.length
    val clusters = labels.distinct.filter(_ >= 0).sorted
    val k = clusters.length
    if (k <= 1 || n <= k) return 0.0
    val byC = clusters.map(c => labels.indices.filter(labels(_) == c).toArray)
    val medoids = byC.map(m => m.minBy(i => m.map(j => dist(i)(j)).sum))
    val globalMedoid = (0 until n).minBy(i => (0 until n).map(j => dist(i)(j)).sum)
    var wk = 0.0
    byC.zip(medoids).foreach { case (m, med) =>
      m.foreach { i => val d = dist(i)(med); wk += d * d }
    }
    var bk = 0.0
    byC.zip(medoids).foreach { case (m, med) =>
      val d = dist(med)(globalMedoid); bk += m.length * d * d
    }
    if (wk == 0.0) 0.0 else (bk / (k - 1)) / (wk / (n - k))
  }

  /** Davies-Bouldin index with medoid "centroids" over the distance matrix
    * (clustering/evaluation.py:180-260). Lower is better. */
  def daviesBouldin(dist: Array[Array[Double]], labels: Array[Int]): Double = {
    val clusters = labels.distinct.filter(_ >= 0).sorted
    if (clusters.length < 2) return 0.0
    val byC = clusters.map(c => labels.indices.filter(labels(_) == c).toArray)
    // medoid = member minimizing summed in-cluster distance
    val medoids = byC.map { m =>
      m.minBy(i => m.map(j => dist(i)(j)).sum)
    }
    val scatter = byC.zip(medoids).map { case (m, med) =>
      m.map(i => dist(i)(med)).sum / m.length
    }
    val k = clusters.length
    var sum = 0.0
    for (a <- 0 until k) {
      var worst = 0.0
      for (b <- 0 until k if b != a) {
        val sep = dist(medoids(a))(medoids(b))
        if (sep > 0) worst = math.max(worst, (scatter(a) + scatter(b)) / sep)
      }
      sum += worst
    }
    sum / k
  }

  /** The condensed-tree surface [[hdbscanFit]] exposes for the pinned
    * oracle: cluster `parent`/`stability` arrays (index = creation order,
    * parents created before children), the root cluster id, each point's
    * final condensed-tree cluster, and the MST edges `(weight, a, b)`.
    * The excess-of-mass cut + label resolution are a pure function of
    * these — ClusterOracles.hdbscanSql replays exactly that in DuckDB. */
  case class HdbscanTree(parent: Array[Int], stability: Array[Double],
    root: Int, memberCluster: Array[Int], mstEdges: Array[(Double, Int, Int)])

  /** HDBSCAN over a precomputed distance matrix (reference
    * clustering/density.py:31-84, which delegates to sklearn; native
    * re-implementation of Campello-Moulavi-Sander): mutual-reachability
    * distances → Prim MST → single-linkage hierarchy → condensed tree at
    * `minClusterSize` → excess-of-mass cluster selection. Noise = −1. */
  def hdbscan(dist: Array[Array[Double]], minClusterSize: Int = 5,
      minSamplesOpt: Option[Int] = None): Array[Int] =
    hdbscanFit(dist, minClusterSize, minSamplesOpt)._1

  /** hdbscan + the condensed tree (the pinned-oracle surface). */
  def hdbscanFit(dist: Array[Array[Double]], minClusterSize: Int = 5,
      minSamplesOpt: Option[Int] = None): (Array[Int], HdbscanTree) = {
    val n = dist.length
    if (n == 0) return (Array.empty,
      HdbscanTree(Array(-1), Array(0.0), 0, Array.empty, Array.empty))
    val minSamples = minSamplesOpt.getOrElse(minClusterSize)
    // core distance = distance to the minSamples-th nearest neighbor
    val core = Array.tabulate(n) { i =>
      val ds = dist(i).clone().sorted
      ds(math.min(minSamples, n - 1))
    }
    def mreach(i: Int, j: Int): Double =
      math.max(dist(i)(j), math.max(core(i), core(j)))
    // Prim MST over the mutual-reachability graph
    val inTree = new Array[Boolean](n)
    val minEdge = Array.fill(n)(Double.MaxValue)
    val minFrom = new Array[Int](n)
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Double, Int, Int)]
    inTree(0) = true
    for (j <- 1 until n) { minEdge(j) = mreach(0, j); minFrom(j) = 0 }
    for (_ <- 1 until n) {
      var best = -1
      for (j <- 0 until n if !inTree(j))
        if (best < 0 || minEdge(j) < minEdge(best)) best = j
      inTree(best) = true
      edges += ((minEdge(best), minFrom(best), best))
      for (j <- 0 until n if !inTree(j)) {
        val d = mreach(best, j)
        if (d < minEdge(j)) { minEdge(j) = d; minFrom(j) = best }
      }
    }
    // single-linkage hierarchy: merge edges ascending; nodes n..2n-2
    val sortedEdges = edges.toArray.sortBy(_._1)
    val parent = Array.tabulate(2 * n - 1)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    val childL = new Array[Int](n - 1)
    val childR = new Array[Int](n - 1)
    val mergeDist = new Array[Double](n - 1)
    val sizeOf = Array.fill(2 * n - 1)(1)
    var next = n
    sortedEdges.foreach { case (w, a, b) =>
      val ra = find(a); val rb = find(b)
      childL(next - n) = ra; childR(next - n) = rb
      mergeDist(next - n) = w
      sizeOf(next) = sizeOf(ra) + sizeOf(rb)
      parent(ra) = next; parent(rb) = next
      next += 1
    }
    // condensed tree: walk top-down; a child spawns a new cluster only if
    // both sides have ≥ minClusterSize, else points fall out of the parent
    // at lambda = 1/mergeDist. Track per-cluster stability.
    val root = 2 * n - 2
    val stability = scala.collection.mutable.ArrayBuffer.empty[Double]
    val birthLambda = scala.collection.mutable.ArrayBuffer.empty[Double]
    val clusterChildren = scala.collection.mutable.ArrayBuffer.empty[List[Int]]
    val clusterParent = scala.collection.mutable.ArrayBuffer.empty[Int]
    def newCluster(birth: Double, par: Int): Int = {
      stability += 0.0
      birthLambda += birth
      clusterChildren += Nil
      clusterParent += par
      stability.length - 1
    }
    val rootCluster = newCluster(0.0, -1)
    // BFS from root
    val stack = scala.collection.mutable.Stack[(Int, Int)]((root, rootCluster))
    val memberLambda = Array.fill(n)(0.0)
    val memberCluster = Array.fill(n)(rootCluster)
    while (stack.nonEmpty) {
      val (node, cl) = stack.pop()
      if (node < n) { memberCluster(node) = cl; memberLambda(node) = Double.MaxValue }
      else {
        val idx = node - n
        val l = childL(idx); val r = childR(idx)
        val lam = if (mergeDist(idx) > 0) 1.0 / mergeDist(idx) else Double.MaxValue
        val bigL = sizeOf(l) >= minClusterSize
        val bigR = sizeOf(r) >= minClusterSize
        if (bigL && bigR) {
          // true split: two new clusters born at lam
          val cl1 = newCluster(lam, cl)
          val cl2 = newCluster(lam, cl)
          clusterChildren(cl) = cl1 :: cl2 :: clusterChildren(cl)
          stack.push((l, cl1)); stack.push((r, cl2))
        } else {
          // points of small side(s) fall out of cl at lam
          def fallOut(sub: Int): Unit = {
            val s2 = scala.collection.mutable.Stack[Int](sub)
            while (s2.nonEmpty) {
              val m = s2.pop()
              if (m < n) {
                memberCluster(m) = cl
                memberLambda(m) = lam
                stability(cl) += lam - birthLambda(cl)
              } else { s2.push(childL(m - n)); s2.push(childR(m - n)) }
            }
          }
          if (!bigL && !bigR) { fallOut(l); fallOut(r) }
          else if (!bigL) { fallOut(l); stack.push((r, cl)) }
          else { fallOut(r); stack.push((l, cl)) }
        }
      }
    }
    // leaf members that never fell out contribute at their cluster's death
    // (handled above via Double.MaxValue → cap at the cluster subtree's
    // max lambda: use birth of children or their own merge lambda). For
    // selection, excess-of-mass: a cluster is selected if its stability
    // exceeds the summed stability of its (selected) children.
    val nC = stability.length
    val selected = new Array[Boolean](nC)
    val subtreeStab = new Array[Double](nC)
    def unselectSubtree(k: Int): Unit = {
      selected(k) = false
      clusterChildren(k).foreach(unselectSubtree)
    }
    // process clusters in reverse creation order (children were created
    // after parents, so reverse order is bottom-up)
    for (c <- nC - 1 to 0 by -1) {
      val kids = clusterChildren(c)
      if (kids.isEmpty) { subtreeStab(c) = stability(c); selected(c) = true }
      else {
        val kidSum = kids.map(subtreeStab).sum
        if (stability(c) >= kidSum && c != rootCluster) {
          selected(c) = true
          kids.foreach(unselectSubtree)
          subtreeStab(c) = stability(c)
        } else subtreeStab(c) = math.max(kidSum, stability(c))
      }
    }
    selected(rootCluster) = false
    // label: walk up from each member's cluster to the nearest selected
    val labelOfCluster = Array.fill(nC)(-2)
    def resolve(c: Int): Int = {
      if (c < 0) -1
      else if (labelOfCluster(c) != -2) labelOfCluster(c)
      else {
        val r = if (selected(c)) c else resolve(clusterParent(c))
        labelOfCluster(c) = r
        r
      }
    }
    val chosen = (0 until nC).filter(c => resolve(c) == c && selected(c))
    val relabel = chosen.zipWithIndex.toMap
    val labels = Array.tabulate(n) { i =>
      val r = resolve(memberCluster(i))
      if (r >= 0 && relabel.contains(r)) relabel(r) else -1
    }
    (labels, HdbscanTree(clusterParent.toArray, stability.toArray,
      rootCluster, memberCluster.clone(), sortedEdges))
  }

  /** CLARANS randomized medoid search on a distance matrix (reference
    * clustering/scalable.py:153-233): `numLocal` seeded restarts, up to
    * `maxNeighbor` random single-medoid swaps each; keeps the best cost. */
  def clarans(dist: Array[Array[Double]], k: Int, numLocal: Int = 2,
      maxNeighbor: Int = 10, seed: Long = 42L): Array[Int] =
    claransFit(dist, k, numLocal, maxNeighbor, seed)._1

  /** clarans + the winning medoid indices (cluster c = medoids(c)), so
    * the gate can pin the medoids and replay only the nearest-medoid
    * assignment in SQL (the ts_kshape pin pattern). */
  def claransFit(dist: Array[Array[Double]], k: Int, numLocal: Int = 2,
      maxNeighbor: Int = 10, seed: Long = 42L): (Array[Int], Array[Int]) = {
    val n = dist.length
    require(k >= 1 && k <= n, s"k must be in [1, $n]")
    require(numLocal >= 1, s"numLocal must be >= 1, got $numLocal")
    require(maxNeighbor >= 0, s"maxNeighbor must be >= 0, got $maxNeighbor")
    val rng = new Random(seed)
    def assign(medoids: Array[Int]): Array[Int] =
      Array.tabulate(n)(i => medoids.indices.minBy(c => dist(i)(medoids(c))))
    def cost(medoids: Array[Int], asg: Array[Int]): Double = {
      var s = 0.0
      for (i <- 0 until n) s += dist(i)(medoids(asg(i)))
      s
    }
    var bestAsg: Array[Int] = null
    var bestMedoids: Array[Int] = null
    var bestCost = Double.MaxValue
    for (li <- 0 until numLocal) {
      val localRng = new Random(seed + li)
      var medoids = localRng.shuffle((0 until n).toVector).take(k).toArray
      var asg = assign(medoids)
      var cur = cost(medoids, asg)
      var neighbor = 0
      while (neighbor < maxNeighbor) {
        val swapIdx = rng.nextInt(k)
        val candidates = (0 until n).filterNot(medoids.contains)
        if (candidates.nonEmpty) {
          val cand = candidates(rng.nextInt(candidates.length))
          val trial = medoids.clone()
          trial(swapIdx) = cand
          val tAsg = assign(trial)
          val tCost = cost(trial, tAsg)
          if (tCost < cur) {
            medoids = trial; asg = tAsg; cur = tCost
            neighbor = 0
          } else neighbor += 1
        } else neighbor += 1
      }
      if (cur < bestCost) { bestCost = cur; bestAsg = asg; bestMedoids = medoids }
    }
    (bestAsg, bestMedoids)
  }
}
