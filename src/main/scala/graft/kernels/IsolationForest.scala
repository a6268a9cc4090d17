package graft.kernels

/** Isolation forest core (reference polars_ts/anomaly_forest.py:10-104,
  * which delegates to scikit-learn; re-implemented natively): seeded
  * random binary trees over feature vectors, anomaly score
  * 2^(−E[pathLen]/c(ψ)) (Liu, Ting & Zhou 2008). Trees are tiny (ψ=256
  * subsamples) — they train on the driver and broadcast; scoring is a
  * narrow per-row map. */
object IsolationForest {

  /** Node encoded as a flat tree: internal (feature, split, left, right)
    * or leaf (size). */
  sealed trait Node extends Serializable
  final case class Internal(feature: Int, split: Double, left: Node, right: Node) extends Node
  final case class Leaf(size: Int) extends Node

  /** Average unsuccessful-search path length in a BST of n nodes. */
  def c(n: Double): Double =
    if (n <= 1.0) 0.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649015329) - 2.0 * (n - 1.0) / n

  private def build(data: Array[Array[Double]], idx: Array[Int], depth: Int,
      maxDepth: Int, rng: scala.util.Random): Node = {
    if (idx.length <= 1 || depth >= maxDepth) Leaf(idx.length)
    else {
      val nf = data(0).length
      // pick among features with spread; give up after a few tries
      var tries = 0
      var feature = -1
      var lo = 0.0; var hi = 0.0
      while (tries < nf && feature < 0) {
        val f = rng.nextInt(nf)
        var mn = Double.MaxValue; var mx = -Double.MaxValue
        var i = 0
        while (i < idx.length) {
          val v = data(idx(i))(f)
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        if (mx > mn) { feature = f; lo = mn; hi = mx }
        tries += 1
      }
      if (feature < 0) Leaf(idx.length)
      else {
        val split = lo + rng.nextDouble() * (hi - lo)
        val (l, r) = idx.partition(i => data(i)(feature) < split)
        if (l.isEmpty || r.isEmpty) Leaf(idx.length)
        else Internal(feature, split,
          build(data, l, depth + 1, maxDepth, rng),
          build(data, r, depth + 1, maxDepth, rng))
      }
    }
  }

  /** Train `nTrees` trees, each on a ψ-subsample of `sample`. */
  def fit(sample: Array[Array[Double]], nTrees: Int = 100, psi: Int = 256,
      seed: Long = 42L): Array[Node] = {
    require(sample.nonEmpty, "empty training sample")
    val rng = new scala.util.Random(seed)
    val maxDepth = math.ceil(math.log(math.max(psi, 2).toDouble) / math.log(2.0)).toInt
    Array.fill(nTrees) {
      val take = math.min(psi, sample.length)
      val idx = rng.shuffle(sample.indices.toVector).take(take).toArray
      build(sample, idx, 0, maxDepth, rng)
    }
  }

  private def pathLength(x: Array[Double], node: Node, depth: Int): Double =
    node match {
      case Leaf(size) => depth + c(size.toDouble)
      case Internal(f, s, l, r) =>
        if (x(f) < s) pathLength(x, l, depth + 1) else pathLength(x, r, depth + 1)
    }

  /** (mean path length, anomaly score): score in (0, 1], higher = more
    * anomalous. The mean path length is exposed because it is exactly
    * engine-replayable (integer depths + closed-form leaf terms), while
    * the 2^(−eh/c) power is only pow-ulp-replayable — the correctness
    * oracle hashes the path length and leaves the power to unit tests. */
  def pathScore(x: Array[Double], trees: Array[Node], psi: Int): (Double, Double) = {
    var s = 0.0
    var i = 0
    while (i < trees.length) { s += pathLength(x, trees(i), 0); i += 1 }
    val eh = s / trees.length
    (eh, math.pow(2.0, -eh / math.max(c(psi.toDouble), 1e-12)))
  }

  /** Anomaly score in (0, 1]: higher = more anomalous. */
  def score(x: Array[Double], trees: Array[Node], psi: Int): Double =
    pathScore(x, trees, psi)._2
}
