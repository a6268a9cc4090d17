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
    * as space-joined strings; empty array when the doc has < n words. */
  def wordGrams(text: Column, n: Int): Column = {
    val words = filter(split(lower(trim(text)), "\\s+"), w => length(w) > 0)
    when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
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
}
