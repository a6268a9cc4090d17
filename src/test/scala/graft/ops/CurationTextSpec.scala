package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 curation additions: cross-corpus line dedup (RefinedWeb §3)
  * and the bigram Kneser-Ney perplexity filter (CCNet head/middle/tail).
  * Load-bearing properties: line dedup removes exactly the lines shared
  * across >= minDocs distinct documents and preserves original line order;
  * KN probabilities are a proper conditional distribution and the
  * tercile bucketing is deterministic under repartitioning. */
class CurationTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("lineDedup removes cross-doc boilerplate, keeps unique lines in order") {
    import spark.implicits._
    val df = Seq(
      (1L, "subscribe now\nalpha beta gamma\nfooter text"),
      (2L, "subscribe now\ndelta epsilon\nfooter text"),
      (3L, "unique opening\nzeta eta theta"),
      // within-doc repeat only: NOT removed (one distinct doc)
      (4L, "solo line\nsolo line"),
      (5L, "")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(df, minDocs = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_lines") == 3)
    assert(out(1L).getAs[Long]("n_removed") == 2)
    assert(out(1L).getAs[String]("clean_text") == "alpha beta gamma")
    assert(out(2L).getAs[String]("clean_text") == "delta epsilon")
    assert(out(3L).getAs[Long]("n_removed") == 0)
    assert(out(3L).getAs[String]("clean_text") == "unique opening\nzeta eta theta")
    assert(out(4L).getAs[Long]("n_removed") == 0,
      "within-doc repeats are not cross-corpus boilerplate")
    assert(out(4L).getAs[String]("clean_text") == "solo line\nsolo line")
    // blank line: kept verbatim, never counted as duplicate
    assert(out(5L).getAs[Long]("n_lines") == 1)
    assert(out(5L).getAs[Long]("n_removed") == 0)
    assert(out(5L).getAs[String]("clean_text") == "")
  }

  test("lineDedup compares lines after trim and respects minDocs") {
    import spark.implicits._
    val df = Seq(
      (1L, "  padded line  \nkeep a"),
      (2L, "padded line\nkeep b"),
      (3L, "padded line\nkeep c")).toDF("doc_id", "text")
    val at2 = Dedup.lineDedup(df, minDocs = 2).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_removed")).toMap
    assert(at2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      "trim-normalized match must catch the padded variant")
    val at4 = Dedup.lineDedup(df, minDocs = 4).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_removed")).toMap
    assert(at4.values.forall(_ == 0L), "below minDocs nothing is removed")
  }

  test("spanDedup deletes long shared spans, keeps short overlaps and self-repeats") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 words
    val df = Seq(
      (1L, s"intro one two $shared outro"),
      (2L, s"different opening words here $shared closing"),
      // only a 5-word overlap -> single dup window, below minRun
      (3L, "alpha beta gamma delta epsilon standalone tail words here"),
      (4L, "unique content with no duplication at all present"),
      // within-doc repetition only: df counts distinct docs -> kept
      (5L, "rep one two three four rep one two three four rep one two three four"))
      .toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, n = 5, minRun = 4).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[String]("clean_text"))).toMap
    // docs 1 and 2: the 8-word shared span gives 4 consecutive dup
    // windows -> the span (8 words) is deleted from both
    assert(out(1L)._2 >= 8, s"doc1 removed ${out(1L)._2}")
    assert(!out(1L)._3.contains("gamma") && out(1L)._3.contains("intro"))
    assert(!out(2L)._3.contains("delta") && out(2L)._3.contains("different"))
    // doc 3 shares only one 5-gram window with docs 1/2 (run of 1 < 4)
    assert(out(3L)._2 == 0, s"doc3 removed ${out(3L)._2}")
    assert(out(4L)._2 == 0)
    assert(out(5L)._2 == 0, "within-doc repeats never trigger removal")
    assert(out(5L)._3 == df.collect().find(_.getLong(0) == 5L).get.getString(1))
  }

  test("normalizeText: NFC, zero-width/control strip, whitespace canon") {
    import spark.implicits._
    val df = Seq(
      (1L, "Cafe\u0301"), // combining acute -> precomposed
      (2L, "a\u200Bb\u00ADc"), // zero-width space + soft hyphen vanish
      (3L, "x\u00A0y\u3000z"), // NBSP + ideographic space -> ASCII
      (4L, "one \r\n two \r\n"), // CRLF -> LF, spaces trimmed around newline
      (5L, "bell\u0007 and\ttab   runs"),
      (6L, "  padded  ")).toDF("doc_id", "text")
    val out = TextOps.normalizeText(df).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("norm_text")).toMap
    assert(out(1L) == "Caf\u00E9")
    assert(out(1L).length == 4)
    assert(out(2L) == "abc")
    assert(out(3L) == "x y z")
    assert(out(4L) == "one\ntwo")
    assert(out(5L) == "bell and tab runs")
    assert(out(6L) == "padded")
  }

  test("executePack: concat-and-split layout, per-shard order by doc id") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c"), (2L, "d e"), (3L, "f g h i")).toDF("doc_id", "text")
    val out = Packing.executePack(df, seqLen = 4, nShards = 1, vocab = 1 << 20)
      .orderBy("seq_index").collect()
    // 9 tokens -> sequences of 4, 4, 1
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 4L, 1L))
    def ids(text: String) = text.trim.split("\\s+").map { t =>
      val x = TextOps.fnv64(t) % (1 << 20)
      if (x < 0) x + (1 << 20) else x
    }
    val stream = ids("a b c") ++ ids("d e") ++ ids("f g h i")
    val packed = out.flatMap(_.getAs[String]("token_ids").split(",").map(_.toLong))
    assert(packed.toSeq == stream.toSeq,
      "token stream must be docs concatenated in doc-id order, split at seqLen")
    // tensor-shaped twin (VERDICT r8 ask #9): array<int> ids must mirror
    // the CSV column element for element
    val arr = out.flatMap(_.getAs[scala.collection.Seq[Int]]("token_id_arr")
      .map(_.toLong))
    assert(arr.toSeq == packed.toSeq)
  }

  /** KN model sanity on a corpus small enough to check by hand is brittle
    * (hash buckets), so assert distributional invariants instead. */
  test("knPerplexity: proper distribution, fluent docs score head") {
    import spark.implicits._
    // 30 "fluent" docs repeat a stock phrase (high bigram counts -> low
    // perplexity); 10 "junk" docs are unique word salad
    val fluent = (0 until 30).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again"))
    // letters-only unique salad (the tokenizer strips digits, so numeric
    // suffixes would collapse all docs to the same words)
    def alpha(n: Int): String = n.toString.map(c => ('a' + (c - '0')).toChar)
    val junk = (30 until 40).map(i =>
      (i.toLong, s"zx${alpha(i)} qw${alpha(i * 7)} er${alpha(i * 13)} " +
        s"ty${alpha(i * 29)} ui${alpha(i * 31)} op${alpha(i * 37)}"))
    val df = (fluent ++ junk).toDF("doc_id", "text")
    val out = TextOps.knPerplexity(df, buckets = 512).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 40)
    val fluentPpl = (0 until 30).map(i => out(i.toLong).getAs[Double]("ppl"))
    val junkPpl = (30 until 40).map(i => out(i.toLong).getAs[Double]("ppl"))
    assert(fluentPpl.max < junkPpl.min,
      s"fluent ppl ${fluentPpl.max} must undercut junk ${junkPpl.min}")
    assert(fluentPpl.forall(_ >= 1.0 - 1e-9), "perplexity is >= 1")
    // CCNet buckets: the repeated-phrase docs all land in head, the junk
    // docs in tail, and bucketing is the head<=middle<=tail tercile order
    assert((0 until 30).forall(i => out(i.toLong).getAs[String]("bucket") == "head"))
    assert((30 until 40).forall(i => out(i.toLong).getAs[String]("bucket") == "tail"))
  }

  test("knPerplexity probabilities sum to ~1 per observed context") {
    import spark.implicits._
    // tiny fixed corpus, small bucket space, no hash collisions among the
    // 5 distinct words at 512 buckets (checked via distinct count)
    val df = Seq(
      (1L, "a b a c a b"),
      (2L, "b c a a d")).toDF("doc_id", "text")
    // reconstruct the model exactly as the operator does and check that
    // sum_w p_KN(w|v) == 1 for every observed context v over the FULL
    // word space (the interpolation term covers unseen successors)
    val words = Seq("a", "b", "c", "d")
    val b = 512
    def h(w: String): Int = {
      val x = TextOps.fnv64(w) % b
      (if (x < 0) x + b else x).toInt
    }
    assert(words.map(h).distinct.size == words.size)
    val bigrams = Seq("a" -> "b", "b" -> "a", "a" -> "c", "c" -> "a",
      "a" -> "b", "b" -> "c", "c" -> "a", "a" -> "a", "a" -> "d")
    val cvw = bigrams.groupBy(identity).map { case (k, v) => k -> v.size }
    val cv = bigrams.groupBy(_._1).map { case (k, v) => k -> v.size }
    val n1f = cvw.keys.groupBy(_._1).map { case (k, v) => k -> v.size }
    val n1b = cvw.keys.groupBy(_._2).map { case (k, v) => k -> v.size }
    val bTot = cvw.size.toDouble
    val d = 0.75
    for (v <- cv.keys) {
      val mass = words.map { w =>
        val disc = cvw.get(v -> w).map(c => (c - d) / cv(v)).getOrElse(0.0)
        disc + d * n1f(v) / cv(v) * n1b.getOrElse(w, 0) / bTot
      }.sum
      // continuation mass sums to 1 only over the full vocab when every
      // word appears as a successor somewhere; here it does
      assert(math.abs(mass - 1.0) < 1e-12, s"context $v mass $mass")
    }
    // and the operator's per-doc avg_logp matches the hand model exactly
    def p(v: String, w: String): Double =
      (cvw(v -> w) - d) / cv(v) + d * n1f(v) / cv(v) * n1b(w) / bTot
    val exp1 = (math.log(p("a", "b")) + math.log(p("b", "a")) +
      math.log(p("a", "c")) + math.log(p("c", "a")) +
      math.log(p("a", "b"))) / 5
    val exp2 = (math.log(p("b", "c")) + math.log(p("c", "a")) +
      math.log(p("a", "a")) + math.log(p("a", "d"))) / 4
    val out = TextOps.knPerplexity(df, buckets = b).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_logp")).toMap
    assert(math.abs(out(1L) - exp1) < 1e-12, s"doc1 ${out(1L)} vs $exp1")
    assert(math.abs(out(2L) - exp2) < 1e-12, s"doc2 ${out(2L)} vs $exp2")
  }

  test("knPerplexity is deterministic under repartitioning; short docs na") {
    import spark.implicits._
    val base = (0 until 24).map(i =>
      (i.toLong, if (i % 4 == 0) "common phrase common phrase common"
      else s"word${i} mix${i * 3} common phrase tail${i * 5}")) ++
      Seq((100L, "single"), (101L, ""))
    val df = base.toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame): Map[Long, (Long, String)] =
      TextOps.knPerplexity(d, buckets = 256).collect()
        .map(r => r.getLong(0) ->
          (r.getAs[Long]("n_bigrams"), r.getAs[String]("bucket"))).toMap
    val a = run(df.repartition(1))
    val c = run(df.repartition(7, col("doc_id")))
    assert(a == c, "bucketing must not depend on partitioning")
    assert(a(100L) == (0L, "na"))
    assert(a(101L) == (0L, "na"))
  }

  test("lineDedup and spanDedup keep null-text documents as rows (ADVICE r8)") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("shared line\nalpha")),
      (2L, Some("shared line\nbeta")),
      (3L, None: Option[String])).toDF("doc_id", "text")
    val ld = Dedup.lineDedup(df, minDocs = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(ld.keySet == Set(1L, 2L, 3L),
      "a null text must not drop the document from the output")
    assert(ld(3L).getAs[Long]("n_lines") == 1L) // one blank line, like ""
    assert(ld(3L).getAs[Long]("n_removed") == 0L)
    assert(ld(3L).getAs[String]("clean_text") == "")
    assert(ld(1L).getAs[String]("clean_text") == "alpha")
    val sd = Dedup.spanDedup(df, n = 2, minRun = 1).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(sd.keySet == Set(1L, 2L, 3L))
    assert(sd(3L).getAs[Long]("n_words") == 0L)
    assert(sd(3L).getAs[String]("clean_text") == "")
  }

  test("knModelFit driver collect is bounded by maxEntries, top-count head") {
    import spark.implicits._
    // "a b" appears in 3 docs (count 3), "b c" twice, the rest once
    val df = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b"),
      (4L, "d e"), (5L, "f g")).toDF("doc_id", "text")
    val full = TextOps.knModelFit(df, buckets = 64)
    val capped = TextOps.knModelFit(df, buckets = 64, maxEntries = 2)
    // under the cap the fit is exact: identical model maps
    assert(TextOps.knModelFit(df, buckets = 64, maxEntries = 2000000).logp
      == full.logp)
    // the capped fit holds exactly maxEntries entries - the highest-count
    // bigrams (a b: 3, b c: 2) - and bTotal still reflects the FULL
    // distinct-bigram table so backoff mass is scaled correctly
    assert(capped.logp.size == 2)
    assert(capped.bTotal == full.bTotal)
    def key(v: String, w: String): Long = {
      def b(g: String): Int = {
        val x = TextOps.fnv64(g) % 64; (if (x < 0) x + 64 else x).toInt
      }
      b(v).toLong * 64 + b(w)
    }
    assert(capped.logp.contains(key("a", "b")))
    assert(capped.logp.contains(key("b", "c")))
    // dropped tail still scores finite via the backoff
    val lp = TextOps.knLogProb(capped, 5, 9)
    assert(lp < 0 && java.lang.Double.isFinite(lp))
  }
}
