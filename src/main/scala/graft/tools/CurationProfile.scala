package graft.tools

import graft.core.IO
import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profile of the three slowest curation-tier bench queries
  * (curation_funnel / semdedup / minhash_lsh) — the DriftBench
  * methodology pointed at sub-stages, so optimization effort lands on the
  * stage that actually dominates instead of the query name. */
object CurationProfile {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = IO.documents(spark, sfDir).cache()
    docs.count()
    val emb = IO.embeddings(spark, sfDir).select("vec_id", "embedding").cache()
    emb.count()

    val stages: Seq[(String, () => Unit)] = Seq(
      "funnel_quality_only" -> (() =>
        mat(TextOps.qualityMetrics(docs.drop("n_chars")))),
      "funnel_curation_metrics" -> (() =>
        mat(TextOps.curationMetrics(docs.drop("n_chars")))),
      "funnel_ngram_overlap" -> (() =>
        mat(Decontam.ngramOverlap(docs, docs.filter(col("doc_id") % 20 === 0), n = 5))),
      "funnel_full" -> (() => mat({
        val metrics = TextOps.curationMetrics(docs.drop("n_chars"))
        val cont = Decontam
          .ngramOverlap(docs, docs.filter(col("doc_id") % 20 === 0), n = 5)
          .select("doc_id", "contaminated")
        val joined = Sampling.stableSplit(metrics.join(cont, "doc_id"), "doc_id")
        val reason = TextOps.curationReason(Some(col("contaminated")))
        joined.select(col("doc_id"), reason.as("reason"),
          (reason === "keep").as("keep"), col("split"))
      })),
      "metrics_lang_only" -> (() =>
        mat(TextOps.languageId(docs.drop("n_chars")))),
      "metrics_pii_only" -> (() =>
        mat(TextOps.piiMetrics(docs.drop("n_chars")))),
      "metrics_rep_only" -> (() =>
        mat(TextOps.repetitionMetrics(docs.drop("n_chars")))),
      "overlap_train_explode" -> (() => mat(
        docs.select(col("doc_id"), explode_outer(
          array_distinct(Decontam.wordGrams(col("text"), 5))).as("gram")))),
      "overlap_bench_distinct" -> (() => mat(
        docs.filter(col("doc_id") % 20 === 0)
          .select(explode(array_distinct(Decontam.wordGrams(col("text"), 5))).as("gram"))
          .distinct())),
      "overlap_groupby_nojoin" -> (() => mat(
        docs.select(col("doc_id"), explode_outer(
          array_distinct(Decontam.wordGrams(col("text"), 5))).as("gram"))
          .groupBy("doc_id").agg(count(col("gram"))))),
      "semdedup_centroid_fit" -> (() => { Similarity.ivfCentroids(emb); () }),
      "semdedup_given_centroids" -> {
        lazy val c = Similarity.ivfCentroids(emb)
        () => mat(Similarity.semDedup(emb, c, threshold = 0.95))
      },
      "semdedup_pairs_only" -> {
        lazy val c = Similarity.ivfCentroids(emb)
        () => mat({
          val bc = spark.sparkContext.broadcast(c)
          val nearestCell = udf((v: Seq[Double]) => {
            val cs = bc.value
            var best = 0; var bd = Double.MaxValue
            var ci = 0
            while (ci < cs.length) {
              var dd = 0.0; var j = 0
              val cv = cs(ci)
              while (j < cv.length && j < v.length) { val t = v(j) - cv(j); dd += t * t; j += 1 }
              if (dd < bd) { bd = dd; best = ci }
              ci += 1
            }
            best
          })
          val v = emb.select(col("vec_id").as("__id"),
              col("embedding").cast("array<double>").as("__v"))
            .withColumn("cell", nearestCell(col("__v")))
          v.as("a").join(v.as("b"),
            col("a.cell") === col("b.cell") && col("a.__id") < col("b.__id"))
            .select(col("a.__id"), col("b.__id"))
        })
      },
      "minhash_signatures" -> (() =>
        mat(docs.select(col("doc_id"),
          Dedup.minhashSigFromText(col("text"), n = 5, k = 64).as("sig")))),
      "minhash_full" -> (() => mat(Dedup.minhashLsh(docs, threshold = 0.5))),
      "minhash_no_valve" -> (() => mat(
        Dedup.minhashLsh(docs, threshold = 0.5, maxBucketSize = None))))

    mat(docs.limit(100)) // warmup
    for ((name, run) <- stages) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROFILE $name%-28s median ${times(1)}%.3f s (min ${times.head}%.3f)")
    }
    spark.stop()
  }
}
