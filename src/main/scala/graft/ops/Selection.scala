package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-selection operators for LM training corpora — the "pick the 10%
  * of the crawl that looks like the target domain" tier that sits between
  * dedup/quality filtering and tokenization in a 100 TB pipeline.
  *
  * Two public methods are implemented:
  *
  *  - DSIR — Data Selection via Importance Resampling (Xie et al.,
  *    NeurIPS 2023): hashed-n-gram bag-of-words unigram models over a
  *    target corpus and the raw corpus; each raw document is scored by
  *    its importance log-weight Σ_gram [ln p̂_target(b) − ln p̂_raw(b)]
  *    and resampled by Gumbel top-k, which samples without replacement
  *    proportionally to the (temperature-1) importance weights.
  *  - A fastText-style hashed bag-of-n-grams logistic classifier (the
  *    GPT-3 / LLaMA-family "quality filter" pattern: train a tiny linear
  *    model to separate a trusted reference corpus from the crawl, keep
  *    documents the classifier scores highly).
  *
  * Scale design: features are hashed buckets, so model state is O(buckets)
  * regardless of corpus size — both bucket-count aggregations are plain
  * `groupBy(bucket).count()` with map-side combine (a ≤`buckets`-row
  * shuffle), the model/log-prob tables broadcast back, and per-document
  * scoring is one (doc_id)-keyed aggregation. The only driver-side step is
  * the classifier's bounded-sample logistic fit (`sampleCap` docs); DSIR
  * has NO driver-side step at all. Gumbel keys use the engine-reproducible
  * FNV/fmix64 uniform ([[Sampling.stableUniform]]) so selection is
  * bit-stable across engines, re-runs, and partitionings.
  *
  * Reference scope note: drumtorben/polars-ts has no data-selection tier;
  * these extend the curation surface (SURVEY round-9) from public
  * methods: Xie et al. 2023 (DSIR), Joulin et al. 2016 (fastText),
  * Brown et al. 2020 §A (quality-classifier filtering).
  */
object Selection {

  /** One-pass gram-bucket walker over the tier's shared tokenization
    * (lowercase, letters-only `[^\p{L}]+` split — the same boundaries
    * TextOps.unigramLogProb / languageId and every DuckDB oracle use):
    * walk unigrams then bigrams ("w", then "w w2" — the DSIR paper's
    * feature set), FNV-bucket each gram — a single UDF per document
    * instead of a string-gram explode + per-row hash UDF. The earlier
    * HOF formulation re-evaluated the captured words array inside every
    * lambda element (the wordGrams O(n²) lesson, Decontam), and shuffled
    * gram STRINGS; this emits the int buckets directly. */
  private[graft] def gramBucketsUdf(buckets: Int) = udf((s: String) => {
    if (s == null) Array.empty[Int]
    else {
      val ws = TextOps.NonLetterRe.split(s.toLowerCase).filter(_.nonEmpty)
      val out = new Array[Int](ws.length + math.max(ws.length - 1, 0))
      def b(g: String): Int = {
        val x = TextOps.fnv64(g) % buckets
        (if (x < 0) x + buckets else x).toInt
      }
      var i = 0
      while (i < ws.length) { out(i) = b(ws(i)); i += 1 }
      i = 0
      while (i < ws.length - 1) {
        out(ws.length + i) = b(ws(i) + " " + ws(i + 1))
        i += 1
      }
      out
    }
  })

  /** Exploded (id, extra..., bucket) gram rows: each n-gram FNV-hashed
    * into [0, buckets). Narrow — no shuffle; int buckets, never gram
    * strings, cross the stage boundary. */
  private def bucketed(df: DataFrame, idCol: String, textCol: String,
      buckets: Int, extra: Seq[(String, Column)] = Nil): DataFrame = {
    val cols = col(idCol) +: extra.map { case (n, c) => c.as(n) } :+
      explode(gramBucketsUdf(buckets)(col(textCol))).as("__b")
    df.select(cols: _*)
  }

  /** DSIR importance log-weights (Xie et al. 2023, §2-3): per document,
    * `log_w = Σ_grams [ln p̂_t(bucket) − ln p̂_r(bucket)]` where p̂_t / p̂_r
    * are Laplace-smoothed hashed-n-gram unigram models of the target
    * slice (`isTarget` rows) and the full raw corpus. Output:
    * (idCol, n_grams, log_w). Higher log_w ⇒ the document looks more like
    * the target distribution.
    *
    * Plan: one gram scan → bucket `groupBy` (≤`buckets` rows, map-side
    * combine); totals via a single-partition window over that ≤`buckets`-row
    * frame (NOT over the corpus); log-ratio table broadcast back onto a
    * second gram scan; one (doc)-keyed aggregation. Nothing driver-side. */
  def dsirWeights(df: DataFrame, isTarget: Column, buckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val grams = bucketed(df, idCol, textCol, buckets,
      extra = Seq("__t" -> isTarget))
    val counts = grams.groupBy("__b").agg(
      count(lit(1)).as("__cr"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"))
    // totals: a window over the ≤buckets-row count table; intentional
    // single partition (graft.core.Panel.tinyFramePartition doc)
    val w = Window.partitionBy(graft.core.Panel.tinyFramePartition(col("__b")))
    val llr = counts.select(col("__b"),
      (log((col("__ct") + lit(1.0)) / (sum("__ct").over(w) + lit(buckets.toDouble))) -
        log((col("__cr") + lit(1.0)) / (sum("__cr").over(w) + lit(buckets.toDouble))))
        .as("__llr"))
    grams.join(broadcast(llr), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum("__llr").as("log_w"))
  }

  /** Collected DSIR model: the per-bucket log-likelihood ratio as a dense
    * `buckets`-length array — the broadcastable form a stateless
    * streaming scorer needs ([[graft.streaming.StreamingOps
    * .streamingDsirScore]]). Buckets unobserved at fit time get the
    * Laplace default `ln((tr+B)/(tt+B))` (set c_t = c_r = 0 in the
    * smoothed ratio), so NEW documents hashing into fresh buckets score
    * consistently. The collect is the ≤`buckets`-row count table — O(1)
    * in corpus size. */
  def dsirModelArray(df: DataFrame, isTarget: Column, buckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): Array[Double] = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val counts = bucketed(df, idCol, textCol, buckets,
        extra = Seq("__t" -> isTarget))
      .groupBy("__b").agg(
        count(lit(1)).as("__cr"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val tr = counts.map(_._2).sum.toDouble
    val tt = counts.map(_._3).sum.toDouble
    val llr = Array.fill(buckets)(
      math.log(1.0 / (tt + buckets)) - math.log(1.0 / (tr + buckets)))
    counts.foreach { case (b, cr, ct) =>
      llr(b) = math.log((ct + 1.0) / (tt + buckets)) -
        math.log((cr + 1.0) / (tr + buckets))
    }
    llr
  }

  /** DSIR Gumbel top-k resampling: key = log_w + Gumbel(0,1) with the
    * Gumbel drawn from the deterministic FNV/fmix64 uniform of the doc id
    * (−ln(−ln u)); the k largest keys are an exact without-replacement
    * sample ∝ importance weight (Gumbel-max trick). `orderBy.limit` plans
    * as TakeOrderedAndProject — a distributed top-k, never a global sort. */
  def dsirResample(df: DataFrame, isTarget: Column, k: Int,
      buckets: Int = 64, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = Sampling.stableUniform(
      concat(lit("dsir:"), col(idCol).cast("string")), 42L)
    dsirWeights(df, isTarget, buckets, idCol, textCol)
      .withColumn("gumbel_key", col("log_w") - log(-log(u)))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }

  /** Score-aware domain mixture weights: per domain, the doc count and
    * mean document score (any per-doc signal — DSIR log-weight,
    * classifier probability, negative perplexity), softmaxed at
    * `temperature` into mixture weights and a per-domain sampling quota
    * `floor(budget · w)`. The quality-aware counterpart of
    * [[Sampling.temperatureMixPlan]] (which mixes on counts alone) — the
    * "upweight domains that look like the target" knob of a pre-training
    * mix (Brown et al. 2020 §2.2 weight corpora by quality; Chowdhery
    * et al. 2022 Table 2 hand-set mixture proportions — this computes
    * them from a score instead).
    *
    * Scale: one map-side-combined groupBy to a ≤|domains|-row frame; the
    * softmax windows run over that tiny frame only. Max-subtraction keeps
    * exp() in range for any score magnitude. */
  def domainMixWeights(df: DataFrame, groupCol: String, scoreCol: String,
      temperature: Double = 1.0, budget: Long = 1000L): DataFrame = {
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), avg(col(scoreCol)).as("mean_score"))
    // intentional single partition over the ≤|domains|-row frame
    val wAll = Window.partitionBy(
      graft.core.Panel.tinyFramePartition(col(groupCol)))
    g.withColumn("__e",
        exp((col("mean_score") - max("mean_score").over(wAll)) / temperature))
      .withColumn("mix_weight", col("__e") / sum("__e").over(wAll))
      // +1e-9 before floor: a sum-order ulp in the softmax must not flip
      // a quota across an integer boundary between engines
      .withColumn("quota",
        floor(col("mix_weight") * budget + 1e-9).cast("long"))
      .drop("__e")
  }

  /** Hashed bag-of-n-grams logistic model: `buckets` term-frequency
    * weights + bias (fastText's linear classifier with the hashing trick,
    * Joulin et al. 2016 §2; Weinberger et al. 2009). */
  case class TextClassifierModel(weights: Array[Double], bias: Double,
      buckets: Int)

  /** Per-document hashed term-frequency feature vectors
    * (x_b = count_b / n_grams) with a 0/1 label — the collect side of the
    * bounded-sample fit. Deterministic: sorted by id after collect so the
    * gradient accumulation order never depends on partition layout. */
  private def featureSample(df: DataFrame, label: Column, buckets: Int,
      sampleCap: Int, idCol: String, textCol: String)
      : Array[(Array[Double], Double)] = {
    val capped = df
      .withColumn("__u", Sampling.stableUniform(col(idCol), 7L))
      .orderBy(col("__u"), col(idCol)).limit(sampleCap)
      .drop("__u")
    bucketed(capped, idCol, textCol, buckets,
        extra = Seq("__y" -> label.cast("double")))
      .groupBy(col(idCol), col("__y"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol), col("__y"))
      .agg(collect_list(struct(col("__b"), col("__c"))).as("__bc"))
      .collect()
      .map { r =>
        val x = new Array[Double](buckets)
        var n = 0L
        r.getSeq[org.apache.spark.sql.Row](2).foreach { bc =>
          n += bc.getLong(1)
        }
        r.getSeq[org.apache.spark.sql.Row](2)
          .sortBy(_.getInt(0))
          .foreach(bc => x(bc.getInt(0)) = bc.getLong(1).toDouble / n)
        (r.get(0).toString, x, r.getDouble(1))
      }
      .sortBy(_._1)
      .map(t => (t._2, t._3))
  }

  /** Fit the quality classifier: full-batch gradient descent on a bounded
    * stable sample (`sampleCap` docs — minibatch fits never see 100 TB
    * regardless of engine), zero init, fixed epochs/learning rate ⇒ the
    * fit is a pure function of (data, config) and refits bit-identically,
    * which is what lets the gate pin the weights and audit refit-vs-pin. */
  def textClassifierFit(df: DataFrame, label: Column, buckets: Int = 64,
      sampleCap: Int = 1000, epochs: Int = 80, lr: Double = 2.0,
      idCol: String = "doc_id", textCol: String = "text")
      : TextClassifierModel = {
    require(buckets >= 2 && sampleCap >= 1 && epochs >= 1)
    val sample = featureSample(df, label, buckets, sampleCap, idCol, textCol)
    require(sample.nonEmpty, "textClassifierFit: empty sample")
    val wv = new Array[Double](buckets)
    var b = 0.0
    val m = sample.length.toDouble
    for (_ <- 0 until epochs) {
      val gw = new Array[Double](buckets)
      var gb = 0.0
      sample.foreach { case (x, y) =>
        var s = b
        var i = 0
        while (i < buckets) { s += wv(i) * x(i); i += 1 }
        val err = y - 1.0 / (1.0 + math.exp(-s))
        i = 0
        while (i < buckets) { gw(i) += err * x(i); i += 1 }
        gb += err
      }
      var i = 0
      while (i < buckets) { wv(i) += lr * gw(i) / m; i += 1 }
      b += lr * gb / m
    }
    TextClassifierModel(wv, b, buckets)
  }

  /** Score every document with a fitted model, distributed: grams hash to
    * buckets, each gram looks up its weight in the broadcast ≤`buckets`-row
    * table, and `score = σ(Σ w_bucket(gram) / n_grams + bias)` — one
    * (doc)-keyed shuffle, model broadcast, nothing driver-side. */
  def textClassifierScore(df: DataFrame, model: TextClassifierModel,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = model.weights.zipWithIndex
      .map { case (wt, i) => (i, wt) }.toSeq.toDF("__b", "__w")
    bucketed(df, idCol, textCol, model.buckets)
      .join(broadcast(wdf), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum("__w").as("__sw"))
      .select(col(idCol), col("n_grams"),
        (lit(1.0) / (lit(1.0) +
          exp(-(col("__sw") / col("n_grams") + lit(model.bias)))))
          .as("quality_prob"))
  }
}
