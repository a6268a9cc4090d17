package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-trained BPE: hand-computed fixture merges, greedy-fold
  * semantics, fit determinism, and the learned-budget wiring into the
  * pack/chunk plans (VERDICT r6 ask #8). */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("applyMerge is greedy left-to-right, non-overlapping") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(Bpe.applyMerge(Array("b", "a"), "a", "b").toSeq == Seq("b", "a"))
  }

  test("bpeFit learns the frequency-ordered merges on a fixture") {
    // ab×4, cd×3 → merge (a,b) first, then (c,d); then no pairs remain
    val df = Seq((0L, "ab ab ab cd"), (1L, "ab cd cd")).toDF("doc_id", "text")
    val merges = Bpe.bpeFit(df, numMerges = 10, sampleSize = 10)
    assert(merges == Seq(("a", "b"), ("c", "d")))
    assert(Bpe.countTokens("ab cd ef", merges) == 4L) // 1 + 1 + (e,f)
    assert(Bpe.encodeWord("abcd", merges).toSeq == Seq("ab", "cd"))
  }

  test("lexicographic tie-break and minCount stop") {
    // zz×2 vs yy×2 — tie broken to (y,y) first
    val df = Seq((0L, "zz yy"), (1L, "zz yy")).toDF("doc_id", "text")
    val merges = Bpe.bpeFit(df, numMerges = 1, sampleSize = 10)
    assert(merges == Seq(("y", "y")))
    // singleton pairs (count 1 < minCount 2) learn nothing
    val none = Bpe.bpeFit(Seq((0L, "qx")).toDF("doc_id", "text"),
      numMerges = 5, sampleSize = 10)
    assert(none.isEmpty)
  }

  test("fit is deterministic and counts hold invariants on the real corpus") {
    val docs = graft.core.IO.documents(spark, "/root/testdata/sf0.001")
    val m1 = Bpe.bpeFit(docs)
    val m2 = Bpe.bpeFit(docs)
    assert(m1 == m2, "refit must land on identical merges")
    assert(m1.nonEmpty, "real corpus must yield merges")
    val counts = Bpe.tokenCounts(docs, m1)
      .join(docs.select(col("doc_id"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("long").as("n_chars_ns")),
        Seq("doc_id")).cache()
    // n_words <= n_bpe_tokens <= non-space chars, and merges actually fire
    assert(counts.filter(col("n_bpe_tokens") < col("n_words")).count() == 0)
    assert(counts.filter(col("n_bpe_tokens") > col("n_chars_ns")).count() == 0)
    val Seq(bpe, chars) = counts.agg(sum("n_bpe_tokens"), sum("n_chars_ns"))
      .head.toSeq.map(_.asInstanceOf[Long])
    assert(bpe < chars, "learned merges must compress below char count")
    counts.unpersist()
  }

  test("pack/chunk plans consume learned token budgets") {
    val docs = graft.core.IO.documents(spark, "/root/testdata/sf0.001").limit(50)
    val merges = Bpe.bpeFit(docs)
    val tok = Some(Bpe.tokenCountUdf(merges)(col("text")))
    val pack = Packing.packPlan(docs, seqLen = 128, nShards = 4, tokens = tok)
    val expected = Bpe.tokenCounts(docs, merges)
      .agg(sum("n_bpe_tokens")).head.getLong(0)
    assert(pack.agg(sum("n_tokens")).head.getLong(0) == expected,
      "pack plan must budget exactly the learned token counts")
    val chunk = Packing.chunkPlan(docs, tokens = tok)
    assert(chunk.filter(col("end_tok") > col("n_tokens")).count() == 0)
    assert(chunk.select("doc_id").distinct.count() == 50)
  }
}
