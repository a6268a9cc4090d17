package graft.plans

import graft.TestSpark
import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen minhash-signature expression must be bit-identical
  * to the ScalaUDF it replaced (same normalization chain, FNV shingle
  * walk, distinct guard, k running minima, null sentinel) — the whole
  * near-dup oracle stack depends on these exact values. */
class MinhashSigSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference reimplementation of the replaced UDF (String semantics). */
  private def refSig(text: String, n: Int, k: Int, seed: Int): Array[Long] = {
    val p = 2147483647L
    val (as, bs) = Dedup.minhashParams(k, seed)
    if (text == null) return Array.fill(k)(Long.MaxValue)
    val norm = text.trim.toLowerCase.replaceAll("\\s+", " ")
    val seen = new java.util.HashSet[Long]()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val last = math.max(norm.length - n, 0)
    while (i <= last) {
      var h = 0xcbf29ce484222325L
      var j = i
      val end = math.min(i + n, norm.length)
      while (j < end) { h ^= norm.charAt(j); h *= 1099511628211L; j += 1 }
      val m = ((h % p) + p) % p
      if (seen.add(m)) {
        var t = 0
        while (t < k) {
          val v = (as(t) * m + bs(t)) % p
          if (v < mins(t)) mins(t) = v
          t += 1
        }
      }
      i += 1
    }
    mins
  }

  test("native expression matches the reference on varied inputs incl. null") {
    import spark.implicits._
    val fixtures = Seq[String](null, "", "abc", "short", "  Spaced   OUT  text ",
      "The quick brown fox jumps over the lazy dog",
      "Tabs\tand\nnewlines collapse", "ümlaut Straße Café", "あいうえおかきく",
      ("repeat me " * 40).trim)
    val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, Option(t)) }
      .toDF("id", "t")
    val rows = df.select(col("id"),
        Dedup.minhashSigFromText(col("t"), 5, 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    fixtures.zipWithIndex.foreach { case (t, i) =>
      assert(rows(i.toLong).sameElements(refSig(t, 5, 64, 42)),
        s"mismatch on fixture $i")
    }
    // non-default n/k/seed too
    val r2 = df.select(col("id"),
        Dedup.minhashSigFromText(col("t"), 3, 16, 7).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    fixtures.zipWithIndex.foreach { case (t, i) =>
      assert(r2(i.toLong).sameElements(refSig(t, 3, 16, 7)), s"n=3 fixture $i")
    }
  }

  test("schema is non-nullable array<long> and codegen survives on the corpus") {
    val docs = graft.core.IO.documents(spark, "/root/testdata/sf0.001")
    val out = docs.select(col("doc_id"),
      Dedup.minhashSigFromText(col("text")).as("sig"))
    assert(!out.schema("sig").nullable)
    val sample = out.orderBy("doc_id").limit(20).collect()
    val texts = docs.orderBy("doc_id").limit(20).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    sample.foreach { r =>
      assert(r.getSeq[Long](1).toArray.sameElements(
        refSig(texts(r.getLong(0)), 5, 64, 42)), s"doc ${r.getLong(0)}")
    }
    out.collect()
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"),
      s"expected a codegen span in:\n${plan.take(500)}")
  }
}
