package graft.kernels

/** HNSW small-world-graph ANN (Malkov & Yashunin 2016,
  * arXiv:1603.09320) — DETERMINISTIC variant for a distributed engine:
  *
  *  - level draws are a pure function of (seed, id) (splitmix64 →
  *    uniform → geometric via floor(−ln u · mL)), not a shared RNG, so
  *    the same id set builds the same graph under any task order/retry
  *    (the DetRng discipline of the stochastic tier);
  *  - every heap comparison tie-breaks on node index, so graphs and
  *    search results are total-order deterministic;
  *  - neighbor selection is the paper's Algorithm 3
  *    (SELECT-NEIGHBORS-SIMPLE, M closest) — documented deviation from
  *    the optional diversity heuristic (Algorithm 4);
  *  - distance is cosine distance (1 − cos) over L2-normalized copies,
  *    matching the engine's ANN stack.
  *
  * The index is partition-local by design: Spark builds one per
  * corpus partition (embarrassingly parallel, no global state) and
  * merges per-partition top-k — the union of exact partition results
  * under a graph search whose recall is audited, never assumed.
  * Reference analogue: the kNN/classification tier of polars-ts
  * (`polars_ts/classification/knn.py`) has no ANN index at all; this is
  * engine-beyond-reference surface.
  */
object Hnsw {

  final case class Params(m: Int = 8, efConstruction: Int = 64,
      seed: Long = 42L) {
    require(m >= 2, s"m must be >= 2, got $m")
    require(efConstruction >= 1)
    val maxM0: Int = 2 * m
    val mL: Double = 1.0 / math.log(m.toDouble)
  }

  /** Built graph: normalized vectors + per-level adjacency. */
  final class Index(
      val ids: Array[Long],
      val vecs: Array[Array[Double]],
      val levels: Array[Int],
      /** node → level → neighbor node indices (sorted ascending). */
      val neighbors: Array[Array[Array[Int]]],
      val entry: Int,
      val maxLevel: Int,
      val params: Params) {
    def size: Int = ids.length
  }

  private def splitmix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Level for a node: geometric via the paper's floor(−ln(u)·mL),
    * u ∈ (0,1] a pure function of (seed, id). */
  private[kernels] def levelOf(id: Long, p: Params): Int = {
    val bits = splitmix(splitmix(p.seed) ^ id) >>> 11
    val u = (bits + 1).toDouble / (1L << 53).toDouble // (0, 1]
    math.floor(-math.log(u) * p.mL).toInt
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    if (s <= 0) return new Array[Double](v.length)
    val inv = 1.0 / math.sqrt(s)
    val out = new Array[Double](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i) * inv; i += 1 }
    out
  }

  /** Cosine DISTANCE between normalized vectors. */
  private def dist(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { d += a(i) * b(i); i += 1 }
    1.0 - d
  }

  // (dist, node) orderings with index tie-break — total and deterministic
  private def cmpNearest(d1: Double, n1: Int, d2: Double, n2: Int): Int =
    if (d1 < d2) -1 else if (d1 > d2) 1 else Integer.compare(n1, n2)

  private final class Candidates(nearestFirst: Boolean) {
    // flat parallel arrays managed as a binary heap
    private var ds = new Array[Double](16)
    private var ns = new Array[Int](16)
    var size = 0
    private def lt(i: Int, j: Int): Boolean = {
      val c = cmpNearest(ds(i), ns(i), ds(j), ns(j))
      if (nearestFirst) c < 0 else c > 0
    }
    private def swap(i: Int, j: Int): Unit = {
      val d = ds(i); ds(i) = ds(j); ds(j) = d
      val n = ns(i); ns(i) = ns(j); ns(j) = n
    }
    def push(d: Double, n: Int): Unit = {
      if (size == ds.length) {
        ds = java.util.Arrays.copyOf(ds, size * 2)
        ns = java.util.Arrays.copyOf(ns, size * 2)
      }
      ds(size) = d; ns(size) = n
      var i = size; size += 1
      while (i > 0 && lt(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
    }
    def peekDist: Double = ds(0)
    def peekNode: Int = ns(0)
    def pop(): (Double, Int) = {
      val out = (ds(0), ns(0))
      size -= 1
      if (size > 0) {
        ds(0) = ds(size); ns(0) = ns(size)
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = l + 1
          var m = i
          if (l < size && lt(l, m)) m = l
          if (r < size && lt(r, m)) m = r
          if (m == i) done = true else { swap(i, m); i = m }
        }
      }
      out
    }
    def toArraysSortedNearest: Array[(Double, Int)] = {
      val out = Array.ofDim[(Double, Int)](size)
      var i = 0
      while (size > 0) { out(i) = pop(); i += 1 }
      if (nearestFirst) out else out.reverse
    }
  }

  /** Greedy ef-search at one layer (paper Algorithm 2). Returns the ef
    * nearest (dist, node) found, nearest first. */
  private def searchLayer(vecs: Array[Array[Double]],
      neigh: Array[Array[Array[Int]]], level: Int,
      q: Array[Double], entries: Seq[Int], ef: Int): Array[(Double, Int)] = {
    val visited = new java.util.HashSet[Int]()
    val cand = new Candidates(nearestFirst = true)
    val found = new Candidates(nearestFirst = false) // farthest first
    entries.distinct.foreach { e =>
      if (visited.add(e)) {
        val d = dist(q, vecs(e))
        cand.push(d, e); found.push(d, e)
      }
    }
    while (cand.size > 0) {
      val (cd, cn) = cand.pop()
      if (found.size >= ef && cd > found.peekDist) {
        cand.size = 0 // nearest candidate is farther than the worst kept
      } else {
        val ns = neigh(cn)(level)
        var i = 0
        while (i < ns.length) {
          val e = ns(i)
          if (visited.add(e)) {
            val d = dist(q, vecs(e))
            if (found.size < ef) { cand.push(d, e); found.push(d, e) }
            else {
              val c = cmpNearest(d, e, found.peekDist, found.peekNode)
              if (c < 0) { cand.push(d, e); found.push(d, e); found.pop() }
            }
          }
          i += 1
        }
      }
    }
    found.toArraysSortedNearest
  }

  /** Build the graph over (id, vector) pairs. Insertion order is the
    * given order — callers sort by id for determinism. */
  def build(ids: Array[Long], rawVecs: Array[Array[Double]],
      p: Params = Params()): Index = {
    require(ids.length == rawVecs.length)
    val n = ids.length
    // ragged embedding lengths (a common upstream data bug) would make
    // dist() silently truncate to the shared prefix and return bogus
    // neighbors the recall audit can't see per-pair — fail loudly here
    if (n > 0) {
      val d0 = rawVecs(0).length
      var i = 1
      while (i < n) {
        require(rawVecs(i).length == d0,
          s"hnsw: vector for id ${ids(i)} has dim ${rawVecs(i).length}, " +
            s"corpus dim is $d0")
        i += 1
      }
    }
    val vecs = rawVecs.map(normalize)
    val levels = Array.tabulate(n)(i => levelOf(ids(i), p))
    val neigh = Array.tabulate(n)(i =>
      Array.fill(levels(i) + 1)(Array.emptyIntArray))
    var entry = -1
    var entryLevel = -1

    def capAt(l: Int): Int = if (l == 0) p.maxM0 else p.m

    /** Re-select the M closest among current + incoming (Algorithm 3). */
    def connect(node: Int, level: Int, picked: Array[(Double, Int)]): Unit = {
      neigh(node)(level) = picked.map(_._2).sorted
      picked.foreach { case (_, nb) =>
        val cur = neigh(nb)(level)
        if (!cur.contains(node)) {
          val merged = cur :+ node
          val cap = capAt(level)
          if (merged.length <= cap) neigh(nb)(level) = merged.sorted
          else {
            val scored = merged.map(x => (dist(vecs(nb), vecs(x)), x))
              .sortWith((a, b) => cmpNearest(a._1, a._2, b._1, b._2) < 0)
            neigh(nb)(level) = scored.take(cap).map(_._2).sorted
          }
        }
      }
    }

    var i = 0
    while (i < n) {
      val l = levels(i)
      if (entry < 0) { entry = i; entryLevel = l }
      else {
        var ep = entry
        // greedy descent through layers above the node's level
        var lc = entryLevel
        while (lc > l) {
          // lc starts at entryLevel and only decreases, so it is always
          // a valid layer of the current entry point
          val r = searchLayer(vecs, neigh, lc, vecs(i), Seq(ep), 1)
          if (r.nonEmpty) ep = r(0)._2
          lc -= 1
        }
        // insert at each layer from min(l, entryLevel) down to 0
        var lev = math.min(l, entryLevel)
        var eps: Seq[Int] = Seq(ep)
        while (lev >= 0) {
          val w = searchLayer(vecs, neigh, lev, vecs(i), eps, p.efConstruction)
          val picked = w.take(capAt(lev))
          connect(i, lev, picked)
          eps = w.map(_._2).toSeq
          lev -= 1
        }
        if (l > entryLevel) { entry = i; entryLevel = l }
      }
      i += 1
    }
    new Index(ids, vecs, levels, neigh, entry, entryLevel.max(0), p)
  }

  /** k nearest neighbors of `q` by cosine similarity (descending), as
    * (id, cosine). `efSearch` ≥ k controls the recall/latency trade. */
  def search(ix: Index, q: Array[Double], k: Int, efSearch: Int): Array[(Long, Double)] = {
    if (ix.size == 0) return Array.empty
    val qn = normalize(q)
    var ep = ix.entry
    var lc = ix.maxLevel
    while (lc > 0) {
      val r = searchLayer(ix.vecs, ix.neighbors, lc, qn, Seq(ep), 1)
      if (r.nonEmpty) ep = r(0)._2
      lc -= 1
    }
    val w = searchLayer(ix.vecs, ix.neighbors, 0, qn, Seq(ep),
      math.max(k, efSearch))
    w.take(k).map { case (d, n) => (ix.ids(n), 1.0 - d) }
  }
}
