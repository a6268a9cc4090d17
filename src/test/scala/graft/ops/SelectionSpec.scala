package graft.ops

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 data-selection tier: DSIR importance weights / Gumbel top-k
  * resampling and the hashed-n-gram logistic quality classifier. The
  * load-bearing properties: weights actually separate target-like from
  * non-target-like text, every path is bit-deterministic under
  * repartitioning (the pin/oracle contract), and the classifier refit
  * reproduces itself exactly (the refit-vs-pin audit relies on it). */
class SelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Corpus of two dialects: target docs (label true) draw from a "code"
    * vocabulary, raw-only docs from a "cooking" vocabulary, with a few
    * mixed docs in between. */
  private def corpus(): DataFrame = {
    import spark.implicits._
    val code = Vector("spark", "query", "join", "shuffle", "plan", "agg")
    val cook = Vector("butter", "flour", "oven", "stir", "bake", "salt")
    val rows = (0 until 60).map { i =>
      val vocab =
        if (i % 3 == 0) code
        else if (i % 3 == 1) cook
        else code.take(3) ++ cook.take(3) // mixed
      val words = (0 until 30).map(j => vocab((i * 7 + j * 5) % vocab.size))
      (i.toLong, words.mkString(" "), i % 3 == 0)
    }
    rows.toDF("doc_id", "text", "is_target")
  }

  test("dsir weights rank target-dialect docs above the other dialect") {
    val df = corpus()
    val w = Selection.dsirWeights(df, col("is_target"), buckets = 64)
      .join(df.select("doc_id", "is_target"), Seq("doc_id"))
      .collect()
    assert(w.length == 60)
    // 30 words -> 30 unigrams + 29 bigrams
    assert(w.forall(_.getAs[Long]("n_grams") == 59L))
    val byKind = w.groupBy(_.getAs[Long]("doc_id") % 3)
      .map { case (k, rs) =>
        k -> rs.map(_.getAs[Double]("log_w")).sum / rs.length
      }
    assert(byKind(0L) > byKind(2L) + 1.0,
      s"target ${byKind(0L)} should beat mixed ${byKind(2L)}")
    assert(byKind(2L) > byKind(1L) + 1.0,
      s"mixed ${byKind(2L)} should beat cooking ${byKind(1L)}")
  }

  test("dsir weights are bit-identical under repartitioning") {
    val df = corpus()
    def run(d: DataFrame): Map[Long, Double] =
      Selection.dsirWeights(d, col("is_target"), buckets = 32).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val a = run(df.repartition(1))
    val b = run(df.repartition(13, col("doc_id")))
    assert(a.keySet == b.keySet)
    // identical modulo float reduce order; the gate rounds at 6dp, assert
    // far tighter here
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-9, s"doc $k") }
  }

  test("gumbel top-k resample is deterministic and target-heavy") {
    val df = corpus()
    val sel = Selection.dsirResample(df, col("is_target"), k = 15,
      buckets = 64)
    val rows = sel.collect()
    assert(rows.length == 15)
    val again = Selection.dsirResample(df, col("is_target"), k = 15,
      buckets = 64).collect()
    assert(rows.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
    // importance-weighted sampling should overselect the target dialect
    // relative to its 1/3 base rate and underselect the opposite dialect
    val kinds = rows.map(_.getLong(0) % 3)
    assert(kinds.count(_ == 0L) >= 8, s"got ${kinds.count(_ == 0L)} target docs")
    assert(kinds.count(_ == 1L) <= 2, s"got ${kinds.count(_ == 1L)} cooking docs")
  }

  test("single-word and empty docs produce 1 and 0 grams") {
    import spark.implicits._
    val df = Seq((1L, "word"), (2L, ""), (3L, "two words"))
      .toDF("doc_id", "text")
    val w = Selection.dsirWeights(df, col("doc_id") === 1L, buckets = 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_grams")).toMap
    assert(w(1L) == 1L) // 1 unigram, no bigram
    assert(!w.contains(2L)) // zero grams -> no row (documented)
    assert(w(3L) == 3L) // 2 unigrams + 1 bigram
  }

  test("domain mix weights: softmax favors high-score domains, quotas bound") {
    import spark.implicits._
    val df = Seq(
      ("web", 2.0), ("web", 2.2), ("web", 1.8),
      ("books", 0.0), ("books", 0.2),
      ("junk", -3.0), ("junk", -2.8)).toDF("source", "score")
    val w = Selection.domainMixWeights(df, "source", "score",
      temperature = 1.0, budget = 100L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Double]("mix_weight"), r.getLong(4))).toMap
    assert(w.keySet == Set("web", "books", "junk"))
    assert(w("web")._1 == 3 && w("books")._1 == 2)
    // softmax ordering follows mean score; weights sum to 1
    assert(w("web")._2 > w("books")._2 && w("books")._2 > w("junk")._2)
    assert(math.abs(w.values.map(_._2).sum - 1.0) < 1e-12)
    // hand softmax: means (2.0, 0.1, -2.9), max-subtracted
    val es = Seq(2.0, 0.1, -2.9).map(m => math.exp(m - 2.0))
    assert(math.abs(w("web")._2 - es(0) / es.sum) < 1e-12)
    // quotas: floor(budget*w) — never exceed budget in total
    assert(w.values.map(_._3).sum <= 100L)
    assert(w("web")._3 >= w("books")._3 && w("books")._3 >= w("junk")._3)
    // higher temperature flattens the mix
    val flat = Selection.domainMixWeights(df, "source", "score",
      temperature = 100.0, budget = 100L)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("mix_weight")).toMap
    assert(flat("web") - flat("junk") < w("web")._2 - w("junk")._2)
  }

  test("quality classifier separates the dialects and refits identically") {
    val df = corpus()
    val m = Selection.textClassifierFit(df, col("is_target"), buckets = 64,
      sampleCap = 60)
    val m2 = Selection.textClassifierFit(
      df.repartition(7, col("doc_id")), col("is_target"), buckets = 64,
      sampleCap = 60)
    assert(m.bias == m2.bias)
    assert(m.weights.sameElements(m2.weights), "refit must be bit-identical")

    val scored = Selection.textClassifierScore(df, m)
      .join(df.select("doc_id", "is_target"), Seq("doc_id")).collect()
    val pos = scored.filter(_.getAs[Boolean]("is_target"))
      .map(_.getAs[Double]("quality_prob"))
    val neg = scored.filterNot(_.getAs[Boolean]("is_target"))
      .filter(_.getAs[Long]("doc_id") % 3 == 1)
      .map(_.getAs[Double]("quality_prob"))
    assert(pos.min > neg.max,
      s"classifier should separate: min pos ${pos.min} vs max neg ${neg.max}")
    assert(pos.forall(p => p > 0.5))
    assert(neg.forall(p => p < 0.5))
  }
}
