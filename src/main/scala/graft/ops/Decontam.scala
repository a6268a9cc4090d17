package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora (the GPT-3 appendix-C /
  * PaLM recipe): flag every training document that shares a word n-gram
  * with a held-out benchmark set, so evaluation data can be purged from
  * the training mix.
  *
  * Scale shape: the benchmark side is small by construction (benchmarks
  * are MBs, corpora are TBs), so its distinct gram set is BROADCAST and
  * the 100 TB training side streams through the join without shuffling
  * text — the only shuffle is the per-doc count aggregation on
  * (doc_id, matched-gram) rows, which map-side combines. Ref semantics:
  * polars_ts text-curation surface (n-gram overlap gate).
  */
object Decontam {

  /** All word `n`-grams of normalized text (lowercased, whitespace-split)
    * as space-joined strings; empty array when the doc has < n words.
    *
    * One tight per-document UDF pass, not a
    * `transform(sequence, slice+concat_ws)` expression chain: Spark
    * evaluates higher-order functions interpreted per element, and that
    * chain was ~80% of the curation funnel's wall time (the
    * minhashSigFromText lesson). Values are identical, so the gram-string
    * oracles are unchanged. */
  def wordGrams(text: Column, n: Int): Column = {
    val u = udf((s: String) => {
      if (s == null) Array.empty[String]
      else {
        val words = TextOps.WsRe.split(s.trim.toLowerCase).filter(_.nonEmpty)
        if (words.length < n) Array.empty[String]
        else {
          val out = new Array[String](words.length - n + 1)
          val sb = new java.lang.StringBuilder()
          var i = 0
          while (i < out.length) {
            sb.setLength(0)
            var j = 0
            while (j < n) {
              if (j > 0) sb.append(' ')
              sb.append(words(i + j))
              j += 1
            }
            out(i) = sb.toString
            i += 1
          }
          out
        }
      }
    })
    u(text)
  }

    /** Semantic decontamination (the embedding-space complement of the
    * n-gram overlap check — paraphrased or lightly-reworded benchmark
    * items evade exact n-gram matching but stay cosine-close in
    * embedding space; the eval-contamination analogue of SemDeDup's
    * near-dup criterion): every corpus vector is scored by its maximum
    * cosine to ANY benchmark vector and flagged at `threshold`.
    *
    * Scale: benchmark suites are MBs against a 100 TB corpus, so the
    * bench side broadcasts and the corpus streams once — a narrow
    * broadcast nested-loop scoring pass, no shuffle of corpus vectors.
    * Cost is |corpus|·|bench| cosines; for large benches, pre-bucket
    * with the LSH/IVF machinery first. */
  def semanticOverlap(corpus: DataFrame, bench: DataFrame,
      threshold: Double = 0.95, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol),
      col(vecCol).cast("array<double>").as("__cv"))
    val b = bench.select(col(vecCol).cast("array<double>").as("__bv"))
    c.join(broadcast(b))
      .groupBy(col(idCol))
      .agg(max(Similarity.cosine(col("__cv"), col("__bv")))
        .as("max_bench_cosine"))
      .withColumn("contaminated", col("max_bench_cosine") >= threshold)
  }

/** Per-training-doc count of distinct n-grams that also occur anywhere
    * in `bench`, plus a contaminated flag. Output: (idCol, n_overlap,
    * contaminated), one row per training doc (zero-overlap docs kept:
    * `explode_outer` emits a null-gram row per gramless/overlap-free doc,
    * so one groupBy covers the whole corpus and there is no back-join —
    * the corpus is scanned once and shuffles only map-side-combined
    * (doc_id, count) rows). */
  def ngramOverlap(train: DataFrame, bench: DataFrame, n: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val trainGrams = train
      .select(col(idCol),
        explode_outer(array_distinct(wordGrams(col(textCol), n))).as("gram"))
    val benchGrams = bench
      .select(explode(array_distinct(wordGrams(col(textCol), n))).as("gram"))
      .distinct()
      .withColumn("__hit", lit(1))
    trainGrams
      .join(broadcast(benchGrams), Seq("gram"), "left")
      .groupBy(idCol)
      .agg(count(col("__hit")).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  /** [[ngramOverlap]] with a Bloom-filter pre-filter on the bench-gram
    * membership test — the 100 TB shape. A raw broadcast of the bench
    * grams ships the STRINGS to every executor; at benchmark-suite scale
    * (10⁸⁺ grams) that broadcast is the bottleneck, while the Bloom
    * filter is ~1.2 bytes/gram at 1% fpp. Bloom has no false negatives,
    * so filtering train grams through it then exact-verifying the
    * survivors returns BIT-IDENTICAL output to [[ngramOverlap]] — false
    * positives die in the verify join, whose input shrinks to the true
    * hits plus an expected fpp·|train grams| stragglers — the survivors
    * are what shuffles when the verify join outgrows broadcast, so the
    * bloom cut IS the scale win. Zero-overlap docs rejoin through a thin
    * ids-only back-join (deliberately different from [[ngramOverlap]]'s
    * explode_outer retention: keeping bloom-missed rows alive would
    * funnel them to one null-key shuffle partition). Spark's
    * `stat.bloomFilter` is deterministic (fixed-seed Murmur3,
    * order-independent bit-OR inserts). */
  def ngramOverlapBloom(train: DataFrame, bench: DataFrame, n: Int = 8,
      fpp: Double = 0.01, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // cached: the gram table feeds three consumers (count, bloom fit,
    // verify join) — uncached it re-tokenized the bench thrice
    val benchGrams = bench
      .select(explode(array_distinct(wordGrams(col(textCol), n))).as("gram"))
      .distinct().cache()
    val expected = math.max(benchGrams.count(), 1L)
    val bloom = benchGrams.stat.bloomFilter("gram", expected, fpp)
    val bc = train.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((g: String) =>
      g != null && bc.value.mightContainString(g))
    // NO broadcast hint on the verify join: the Bloom exists precisely
    // because the bench gram STRINGS may outgrow a broadcast (10^8+
    // grams) — a forced broadcast would OOM at exactly that scale. The
    // Bloom prefilter shrinks the train side to survivors first; AQE
    // broadcasts the gram table when it IS small, and shuffles the
    // (already Bloom-thinned) survivors when it is not.
    val hits = train
      .select(col(idCol),
        explode(array_distinct(wordGrams(col(textCol), n))).as("gram"))
      .filter(mightContain(col("gram")))
      .join(benchGrams.select(col("gram")), Seq("gram"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("__c"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__c"), lit(0L)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }
}
