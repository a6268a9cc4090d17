package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MMR re-rank contracts: pure-relevance at λ=1, diversity suppression
  * of near-duplicates at moderate λ, smaller-id tie-breaks, k ≥ n
  * degeneracy, and partitioning invariance. */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 4 candidates for one query: a and b are identical vectors (dup pair)
  // with top relevance; c orthogonal-ish; d opposite.
  private def cands = {
    import spark.implicits._
    Seq(
      (1L, 10L, 0.95, Seq(1.0, 0.0, 0.0)),
      (1L, 11L, 0.94, Seq(1.0, 0.0, 0.0)),
      (1L, 12L, 0.60, Seq(0.0, 1.0, 0.0)),
      (1L, 13L, 0.40, Seq(0.0, 0.0, 1.0)))
      .toDF("query_id", "cand_id", "rel", "embedding")
  }

  test("lambda=1 is pure relevance order") {
    val out = Similarity.mmrRerank(cands, k = 4, lambda = 1.0)
      .orderBy("mmr_rank").collect().map(_.getAs[Long]("cand_id")).toSeq
    assert(out === Seq(10L, 11L, 12L, 13L))
  }

  test("moderate lambda suppresses the duplicate of the first pick") {
    val out = Similarity.mmrRerank(cands, k = 3, lambda = 0.5)
      .orderBy("mmr_rank").collect().map(_.getAs[Long]("cand_id")).toSeq
    // 11 is identical to the picked 10: its diversity penalty is 1.0, so
    // 12 (rel .60, sim 0) and 13 outrank it
    assert(out.head === 10L)
    assert(!out.tail.contains(11L), s"duplicate picked: $out")
  }

  test("exact ties break toward the smaller id; k > n picks all") {
    import spark.implicits._
    val tied = Seq(
      (2L, 21L, 0.5, Seq(1.0, 0.0)),
      (2L, 20L, 0.5, Seq(0.0, 1.0)))
      .toDF("query_id", "cand_id", "rel", "embedding")
    val out = Similarity.mmrRerank(tied, k = 5, lambda = 1.0)
      .orderBy("mmr_rank").collect()
    assert(out.map(_.getAs[Long]("cand_id")).toSeq === Seq(20L, 21L))
    assert(out.map(_.getAs[Int]("mmr_rank")).toSeq === Seq(1, 2))
  }

  test("partitioning-invariant and deterministic") {
    val a = Similarity.mmrRerank(cands.repartition(7), k = 4, lambda = 0.7)
      .collect().map(_.toString).sorted.toSeq
    val b = Similarity.mmrRerank(cands.coalesce(1), k = 4, lambda = 0.7)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("negative similarity REWARDS: anti-aligned candidate outranks a better-rel near-dup") {
    import spark.implicits._
    // 31 points opposite the first pick (cos = −1): its penalty term is
    // −0.5·(−1) = +0.5, so it must beat 32 (higher rel but cos ≈ 0).
    // A zero-floored maxsim would wrongly pick 32.
    val cs = Seq(
      (5L, 30L, 0.9, Seq(1.0, 0.0)),
      (5L, 31L, 0.10, Seq(-1.0, 0.0)),
      (5L, 32L, 0.50, Seq(0.0, 1.0)))
      .toDF("query_id", "cand_id", "rel", "embedding")
    val out = Similarity.mmrRerank(cs, k = 2, lambda = 0.5)
      .orderBy("mmr_rank").collect()
    assert(out.map(_.getAs[Long]("cand_id")).toSeq === Seq(30L, 31L))
    // 31's score: 0.5·0.10 − 0.5·(−1) = 0.55
    assert(math.abs(out(1).getAs[Double]("mmr_score") - 0.55) < 1e-12)
  }

  test("score recursion: second pick's score carries the diversity term") {
    val rows = Similarity.mmrRerank(cands, k = 2, lambda = 0.5)
      .orderBy("mmr_rank").collect()
    assert(math.abs(rows(0).getAs[Double]("mmr_score") - 0.5 * 0.95) < 1e-12)
    // second pick is 12: 0.5*0.60 - 0.5*cos(12,10)=0.5*0.6 - 0.5*0 = 0.3
    assert(rows(1).getAs[Long]("cand_id") === 12L)
    assert(math.abs(rows(1).getAs[Double]("mmr_score") - 0.3) < 1e-12)
  }
}
