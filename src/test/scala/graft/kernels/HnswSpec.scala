package graft.kernels

import graft.TestSpark
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HNSW kernel + operator: exactness when the graph must contain
  * everything, graph-structure invariants, build determinism, recall
  * vs brute force on the real embeddings, and partition-merge
  * behavior of the Spark operator. */
class HnswSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecs(n: Int, d: Int, seed: Long): Array[Array[Double]] = {
    var h = seed
    def next(): Double = {
      h = h * 6364136223846793005L + 1442695040888963407L
      ((h >>> 20) % 2000).toDouble / 1000.0 - 1.0
    }
    Array.fill(n)(Array.fill(d)(next()))
  }

  test("k = n-1 search returns every other vector (graph is connected)") {
    val n = 60
    val vs = vecs(n, 8, 1L)
    val ids = Array.tabulate(n)(_.toLong)
    val ix = Hnsw.build(ids, vs)
    for (q <- 0 until n) {
      val got = Hnsw.search(ix, vs(q), n, efSearch = n * 2).map(_._1).toSet
      assert(got.size == n, s"query $q reached only ${got.size}/$n nodes")
    }
  }

  test("graph invariants: neighbor caps, symmetry of level arrays") {
    val n = 200
    val vs = vecs(n, 12, 2L)
    val ids = Array.tabulate(n)(i => i.toLong * 3 + 1)
    val p = Hnsw.Params(m = 6, efConstruction = 40)
    val ix = Hnsw.build(ids, vs, p)
    for (node <- 0 until n; lev <- ix.neighbors(node).indices) {
      val ns = ix.neighbors(node)(lev)
      val cap = if (lev == 0) p.maxM0 else p.m
      assert(ns.length <= cap, s"node $node level $lev: ${ns.length} > $cap")
      assert(ns.forall(x => ix.levels(x) >= lev),
        s"node $node links to a lower-level node at level $lev")
      assert(!ns.contains(node), "self-link")
    }
    assert(ix.levels(ix.entry) == ix.maxLevel)
  }

  test("build is deterministic: same ids+vectors → identical graphs") {
    val n = 150
    val vs = vecs(n, 10, 3L)
    val ids = Array.tabulate(n)(_.toLong)
    val a = Hnsw.build(ids, vs)
    val b = Hnsw.build(ids.clone(), vs.map(_.clone()))
    assert(a.entry == b.entry && a.maxLevel == b.maxLevel)
    for (i <- 0 until n) {
      assert(a.levels(i) == b.levels(i))
      assert(a.neighbors(i).length == b.neighbors(i).length)
      a.neighbors(i).zip(b.neighbors(i)).foreach { case (x, y) =>
        assert(x.sameElements(y), s"node $i adjacency differs")
      }
    }
    // and search is too
    val q = vecs(1, 10, 9L)(0)
    assert(Hnsw.search(a, q, 5, 32).toSeq == Hnsw.search(b, q, 5, 32).toSeq)
  }

  test("kernel recall >= 0.95 vs exact on the real embeddings") {
    val emb = graft.core.IO.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val ids = emb.map(_._1)
    val vs = emb.map(_._2)
    val ix = Hnsw.build(ids, vs, Hnsw.Params(m = 8, efConstruction = 64))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val k = 5
    var hit = 0; var tot = 0
    for (qi <- 0 until math.min(30, ids.length)) {
      val truth = ids.indices.filter(_ != qi)
        .map(j => (ids(j), cos(vs(qi), vs(j))))
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
      val got = Hnsw.search(ix, vs(qi), k + 1, efSearch = 64)
        .filter(_._1 != ids(qi)).take(k).map(_._1).toSet
      hit += truth.intersect(got).size; tot += k
    }
    val recall = hit.toDouble / tot
    assert(recall >= 0.95, s"kernel recall $recall < 0.95")
  }

  test("Spark operator: deterministic across runs, recall >= 0.9, schema") {
    val emb = graft.core.IO.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") < 10)
    val r1 = Similarity.hnswTopK(emb, q, k = 3, numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(x => (x._1, x._3))
    val r2 = Similarity.hnswTopK(emb, q, k = 3, numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(x => (x._1, x._3))
    assert(r1.toSeq == r2.toSeq, "operator must be run-deterministic")
    val brute = Similarity.bruteForceTopK(emb, q, k = 3)
      .select("query_id", "neighbor_id")
    val approx = Similarity.hnswTopK(emb, q, k = 3, numPartitions = 4)
      .select("query_id", "neighbor_id")
    val inter = approx.join(brute, Seq("query_id", "neighbor_id")).count()
    val truth = brute.count()
    assert(inter.toDouble / truth >= 0.9,
      s"operator recall ${inter.toDouble / truth} < 0.9")
  }

  test("hnswTopKAll at one shard equals the bounded-batch operator") {
    val emb = graft.core.IO.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") < 10)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .sortBy(x => (x._1, x._3)).toSeq
    val bounded = canon(Similarity.hnswTopK(emb, q, k = 3, numPartitions = 1))
    val all = canon(Similarity.hnswTopKAll(emb, q, k = 3, corpusParts = 1))
    assert(all === bounded,
      "one shard = one graph: both paths must search identically")
  }

  test("hnswTopKAll: query batching is invisible; corpus x corpus runs") {
    val emb = graft.core.IO.embeddings(spark, "/root/testdata/sf0.001")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .sortBy(x => (x._1, x._3)).toSeq
    // corpus x corpus: the whole table queries itself, nothing on the
    // driver — the path hnswTopK's bounded-broadcast contract excludes
    val b1 = canon(Similarity.hnswTopKAll(emb, emb, k = 3,
      corpusParts = 4, queryBatches = 1))
    val b3 = canon(Similarity.hnswTopKAll(emb, emb, k = 3,
      corpusParts = 4, queryBatches = 3))
    assert(b1 === b3,
      "per-shard graphs are batch-invariant, so results must be too")
    val n = emb.count()
    assert(b1.map(_._1).distinct.size.toLong === n,
      "every corpus row must be answered as a query")
    assert(b1.forall(x => x._1 != x._2), "self-matches excluded")
  }
}
