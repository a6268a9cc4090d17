package graft.ops

import graft.TestSpark
import graft.core.PanelCols
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 additions: fused minhash signatures, multi-probe LSH recall,
  * deterministic-init PAM, and unpruned-PELT optimality. */
class Round3Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fused minhash signature equals the two-stage shingle+minima path") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different text with no overlap at all"),
      (4L, "   Mixed   CASE and   whitespace   normalization test   ")
    ).toDF("doc_id", "text")
    val fused = docs.select(col("doc_id"),
      Dedup.minhashSigFromText(col("text"), 5, 64).as("sig"))
    val staged = docs.select(col("doc_id"),
      Dedup.minhashSignature(Dedup.hashedShingles(col("text"), 5), 64).as("sig"))
    val joined = fused.as("a").join(staged.as("b"), "doc_id")
      .filter(col("a.sig") =!= col("b.sig"))
    assert(joined.count() == 0, "fused and staged signatures must be identical")
  }

  test("multi-probe LSH recall beats single-probe and reaches 0.9 on clustered vectors") {
    import spark.implicits._
    val rng = new scala.util.Random(7L)
    val dim = 16
    // 5 well-separated centers with small jitter: brute-force neighbors are
    // same-cluster, so bucket recall is meaningful
    val centers = Array.fill(5, dim)(rng.nextGaussian() * 5.0)
    val rows = for (i <- 0 until 200) yield {
      val c = centers(i % 5)
      (i.toLong, c.map(_ + rng.nextGaussian() * 0.2).toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, q, k = 3)
      .select(col("query_id"), col("neighbor_id"))
    val truth = brute.count().toDouble
    def recall(probes: Int): Double = {
      val approx = Similarity.lshTopK(emb, q, k = 3, dim = dim, bits = 6, probes = probes)
      approx.select(col("query_id"), col("neighbor_id"))
        .join(brute, Seq("query_id", "neighbor_id")).count() / truth
    }
    val r0 = recall(0)
    val r8 = recall(8)
    assert(r8 >= r0, s"multi-probe recall $r8 must not regress single-probe $r0")
    assert(r8 >= 0.9, s"multi-probe recall $r8 below 0.9")
  }

  test("PAM with explicit init is deterministic and reaches the seeded-shuffle cost") {
    val rng = new scala.util.Random(11L)
    val n = 40
    // three planted groups on a line → distances with clear structure
    val pts = Array.tabulate(n)(i => (i % 3) * 10.0 + rng.nextGaussian())
    val d = Array.tabulate(n, n)((i, j) => math.abs(pts(i) - pts(j)))
    def cost(medoids: Array[Int]): Double =
      (0 until n).map(i => medoids.map(m => d(i)(m)).min).sum
    val (l1, m1) = graft.kernels.Cluster.pam(d, 3, init = Some(Array(0, 1, 2)))
    val (l2, m2) = graft.kernels.Cluster.pam(d, 3, init = Some(Array(0, 1, 2)))
    assert(l1.toSeq == l2.toSeq && m1.toSeq == m2.toSeq, "explicit init must be deterministic")
    val (_, mShuffle) = graft.kernels.Cluster.pam(d, 3)
    assert(cost(m1) <= cost(mShuffle) * 1.001,
      s"first-k init cost ${cost(m1)} much worse than shuffle init ${cost(mShuffle)}")
    // groups recovered: all three planted levels appear as distinct labels
    assert(l1.distinct.length == 3)
  }

  test("unpruned PELT equals exact optimal partitioning and finds the planted break") {
    val rng = new scala.util.Random(3L)
    val data = Array.tabulate(60)(i => (if (i < 30) 0.0 else 8.0) + rng.nextGaussian() * 0.5)
    val pen = 2.0 * math.log(data.length)
    val cps = graft.kernels.Pelt.detect(data, graft.kernels.Pelt.MeanCost, pen,
      minSize = 2, prune = false)
    // brute-force optimal partitioning via the same cost
    val n = data.length
    val cs = data.scanLeft(0.0)(_ + _)
    val ss = data.scanLeft(0.0)((a, v) => a + v * v)
    def seg(s: Int, e: Int): Double = {
      val cnt = (e - s).toDouble
      val mu = (cs(e) - cs(s)) / cnt
      (ss(e) - ss(s)) - cnt * mu * mu
    }
    val f = Array.fill(n + 1)(Double.PositiveInfinity)
    f(0) = -pen
    val last = new Array[Int](n + 1)
    for (t <- 2 to n) {
      var best = Double.PositiveInfinity; var bs = 0
      for (s <- 0 to t - 2) {
        val c = f(s) + seg(s, t) + pen
        if (c < best) { best = c; bs = s }
      }
      f(t) = best; last(t) = bs
    }
    val expected = scala.collection.mutable.ArrayBuffer.empty[Long]
    var idx = n
    while (idx > 0) { val p = last(idx); if (p > 0) expected += p.toLong; idx = p }
    assert(cps.toSeq == expected.sorted.toSeq)
    assert(cps.contains(30L), s"planted break at 30 not found: ${cps.mkString(",")}")
  }
}
