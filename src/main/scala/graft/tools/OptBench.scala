package graft.tools

import graft.core.{IO, PanelCols}
import graft.ops._
import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 optimization harness: isolated re-bench + plan capture for
  * any subset of the Bench suite's query bodies (exact same expressions,
  * same cached inputs, same noop-sink methodology) without paying the
  * full ~15-minute suite per measurement.
  *
  * Usage:
  *   sbt "runMain graft.tools.OptBench q1_agg,minhash_lsh"
  *   sbt "runMain graft.tools.OptBench all"
  * Env:
  *   SPARK_GRAFT_SF_DIR   data dir           (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS     local core count   (default 32)
  *   OPT_ITERS            timed iterations   (default 5, median reported)
  *   OPT_EXPLAIN_DIR      if set, write `explain(formatted)` of each query
  *                        to $OPT_EXPLAIN_DIR/<name>_$OPT_TAG.txt
  *   OPT_TAG              explain file suffix (default "before")
  */
object OptBench {

  private implicit val PC: PanelCols =
    PanelCols("user_id", "ts", "value", tieBreak = Seq("event_id"))

  private def synthPanel(spark: SparkSession, nSeries: Int, len: Int): DataFrame =
    spark.range(nSeries.toLong * len).select(
      (col("id") / len).cast("long").as("user_id"),
      timestamp_micros((col("id") % len) * 3600000000L +
        lit(1704067200000000L)).cast("timestamp_ntz").as("ts"),
      lit(0L).as("event_id"),
      (sin(col("id") % len / lit(6.0)) * 10.0 +
        (col("id") % len) * 0.01 +
        when(col("id") % len >= len / 2, 5.0).otherwise(0.0) +
        pmod(xxhash64(col("id")), lit(1000)) / lit(1000.0)).as("value"))

  private def procCpuSecs(): Double =
    try {
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean =>
          os.getProcessCpuTime / 1e9
        case _ => -1.0
      }
    } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("OPT_ITERS", "5").toInt.max(1)
    val explainDir = sys.env.get("OPT_EXPLAIN_DIR")
    val tag = sys.env.getOrElse("OPT_TAG", "before")
    val spark = graft.core.GraftSession.withEngineDefaults(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
          sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val events = IO.events(spark, sfDir).cache()
    events.count()
    val docsB = IO.documents(spark, sfDir).cache()
    docsB.count()
    val embB = IO.embeddings(spark, sfDir).select("vec_id", "embedding").cache()
    embB.count()
    val eventsSf = IO.events(spark, sfDir)

    // untimed bounded fits, exactly as in Bench
    lazy val clfModel = Selection.textClassifierFit(docsB, col("lang") === "en",
      buckets = 64, sampleCap = 1000)
    lazy val protoCenters = Similarity.ivfCentroids(embB)
    lazy val knTargetModel = TextOps.knModelFit(
      docsB.filter(col("lang") === "en"), buckets = 1024)
    lazy val decFitForBench = graft.kernels.DeepModels.decFit(
      DeepClustering.collectSeries(events, cap = 256).map(_._2),
      graft.kernels.DeepModels.DeepCfg(k = 3, embeddingDim = 4, nFilters = 4,
        pretrainEpochs = 2, finetuneEpochs = 1), idec = false)

    val gens: Seq[(String, () => DataFrame)] = Seq(
      "q1_agg" -> (() => SparkEntry.queries("q1_agg")(spark, sfDir)),
      "window_pipeline" -> (() =>
        Features.rollingFeatures(
          Features.calendarFeatures(
            Features.lagFeatures(events, Seq(1, 7, 14))), Seq(7))),
      "forecast_score" -> (() => {
        val fc = ForecastBaselines.ses(events, h = 7)
        val pred = events.withColumn("y_hat", lag(col("value"), 1).over(PC.w))
          .filter(col("y_hat").isNotNull)
        Metrics.grouped(pred, "value", "y_hat").join(
          fc.groupBy("user_id").agg(avg("y_hat").as("fc_mean")), Seq("user_id"))
      }),
      "impute_outliers" -> (() =>
        Outliers.treat(Outliers.detect(
          Impute.impute(events, "forward_fill"), "zscore"), "clip")),
      "resample_decompose" -> (() =>
        Decomposition.seasonal(events, freq = 24)),
      "dedup_exact" -> (() => Dedup.exact(IO.documents(spark, sfDir))),
      "minhash_lsh" -> (() =>
        Dedup.minhashLsh(IO.documents(spark, sfDir), threshold = 0.5)),
      "text_quality" -> (() =>
        TextOps.qualityMetrics(IO.documents(spark, sfDir).drop("n_chars"))),
      "knn_brute" -> (() => {
        val emb = IO.embeddings(spark, sfDir)
        Similarity.bruteForceTopK(emb, emb.limit(100), k = 10)
      }),
      "cusum_changepoint" -> (() => Changepoint.cusum(events)),
      "pairwise_dtw_50x30" -> (() =>
        Distances.pairwise(synthPanel(spark, 50, 30), "dtw")),
      "pairwise_dtw_band_500x100" -> (() =>
        Distances.pairwise(synthPanel(spark, 500, 100), "dtw",
          Map("window" -> 10.0))),
      "pelt_panel_1000x1000" -> (() =>
        Changepoint.pelt(synthPanel(spark, 1000, 1000), "mean")),
      "ets_panel_1000x1000" -> (() => {
        val p = synthPanel(spark, 1000, 1000)
        ForecastBaselines.multiForecast(p, h = 12, Seq(
          "ses" -> (ys => graft.kernels.Ets.ses(ys, 0.3, 12)),
          "hw" -> (ys => graft.kernels.Ets.holtWinters(ys, 0.3, 0.1, 0.1, 12, true, 12))))
      }),
      "mann_kendall_panel" -> (() =>
        Changepoint.mannKendall(synthPanel(spark, 1000, 1000))),
      "semdedup" -> (() => {
        val emb = IO.embeddings(spark, sfDir).select("vec_id", "embedding")
        Similarity.semDedup(emb, Similarity.ivfCentroids(emb), threshold = 0.95)
      }),
      "unigram_logprob" -> (() =>
        TextOps.unigramLogProb(IO.documents(spark, sfDir), vocabSize = 500)),
      "pack_plan" -> (() =>
        Packing.packPlan(IO.documents(spark, sfDir), seqLen = 128, nShards = 8)),
      "curation_funnel" -> (() =>
        SparkEntry.queries("doc_curation_pipeline")(spark, sfDir)),
      "neural_assign" -> (() => DeepClustering.assign(events, decFitForBench)),
      "vision_embed" -> (() => VisionEmbed.visionEmbeddings(events)),
      "html_strip" -> (() => TextOps.htmlStrip(SparkEntry.htmlDocs(docsB))),
      "line_dedup" -> (() => Dedup.lineDedup(SparkEntry.linedDocs(docsB))),
      "span_dedup" -> (() => Dedup.spanDedup(docsB)),
      "kn_perplexity" -> (() => TextOps.knPerplexity(docsB, buckets = 4096)),
      "kn_target_ppl" -> (() =>
        graft.streaming.StreamingOps.streamingKnScore(docsB, knTargetModel)),
      "pack_execute" -> (() =>
        Packing.executePack(docsB, seqLen = 128, nShards = 8)),
      "dsir_weights" -> (() =>
        Selection.dsirWeights(docsB, col("lang") === "en", buckets = 64)),
      "classifier_score" -> (() =>
        Selection.textClassifierScore(docsB, clfModel)),
      "prototype_prune" -> (() =>
        Similarity.prototypePrune(embB, protoCenters, keepFrac = 0.7)),
      "media_funnel" -> (() => SparkEntry.queries("mm_curation_funnel")(spark, sfDir)),
      "media_pixels" -> (() => SparkEntry.queries("mm_pixel_features")(spark, sfDir)),
      "media_jpeg" -> (() => SparkEntry.queries("mm_jpeg_features")(spark, sfDir)),
      "media_resize" -> (() => SparkEntry.queries("mm_resize")(spark, sfDir)),
      "media_scenes" -> (() => SparkEntry.queries("mm_scene_changes")(spark, sfDir)),
      "media_audio_seg" -> (() => SparkEntry.queries("mm_audio_segments")(spark, sfDir)),
      "asof_join" -> (() => {
        val l = eventsSf.filter(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts")
        val r = eventsSf.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
            col("value").as("click_value"))
        TemporalJoins.asofJoin(l, r, Seq("user_id"), "ts", "ts",
          Seq("click_id", "click_value"))
      }),
      "asof_native" -> (() => {
        val l = eventsSf.filter(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts")
        val r = eventsSf.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
            col("value").as("click_value"))
        TemporalJoins.asofJoinNative(l, r, Seq("user_id"), "ts", "ts",
          Seq("click_id", "click_value"))
      }),
      "range_join" -> (() => {
        val err = eventsSf.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("error_id"),
            col("ts").as("w_start"),
            (col("ts") + expr("INTERVAL 1 DAY")).as("w_end"))
        val clk = eventsSf.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts"))
        TemporalJoins.rangeJoin(clk, err, Seq("user_id"), "ts",
          "w_start", "w_end", bucketUs = 6L * 3600 * 1000000)
      }),
      "range_native" -> (() => {
        val err = eventsSf.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("error_id"),
            col("ts").as("w_start"),
            (col("ts") + expr("INTERVAL 1 DAY")).as("w_end"))
        val clk = eventsSf.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts"))
        TemporalJoins.rangeJoinNative(clk, err, Seq("user_id"), "ts",
          "w_start", "w_end")
      }),
      "sessionize" -> (() =>
        TemporalJoins.sessionize(eventsSf, Seq("user_id"), "ts",
            gapUs = 6L * 3600 * 1000000, tieBreak = Seq("event_id"))
          .groupBy(col("user_id"), col("session_id"))
          .agg(min("ts").as("session_start"), count(lit(1)).as("n_events"))),
      "zorder_layout" -> (() =>
        Layout.zorderBy(eventsSf.withColumn("hr",
            expr("(unix_micros(cast(ts as timestamp)) div 3600000000) % 4096")),
          Seq("user_id", "hr"), numFiles = 32, bits = 12)),
      "group_dynamic" -> (() =>
        Resample.groupByDynamic(eventsSf, every = "30 minutes",
          period = "2 hours")),
      "rolling_by_time" -> (() =>
        Features.rollingByTime(eventsSf, windowUs = 6L * 3600 * 1000000,
          aggs = Seq("mean", "count"))),
      "cms_heavy" -> (() => Sketches.cmsHeavyHitters(docsB, minFrac = 0.01)),
      "hll_distinct" -> (() => Sketches.hllDistinctTokens(docsB)),
      "chronos_tokens" -> (() => graft.ops.Foundation.chronosTokenize(events)))

    val wanted: Seq[(String, () => DataFrame)] =
      if (args.isEmpty || args(0) == "all") gens
      else {
        val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSet
        val missing = names -- gens.map(_._1).toSet
        require(missing.isEmpty, s"unknown queries: ${missing.mkString(",")}")
        gens.filter(g => names.contains(g._1))
      }

    // warmup, as in Bench
    mat(Features.lagFeatures(events.limit(1000), Seq(1)))
    mat(ForecastBaselines.ses(events.limit(2000), h = 2))

    for ((name, gen) <- wanted) {
      explainDir.foreach { d =>
        val df = gen()
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(d, s"${name}_$tag.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, txt)
      }
      spark.sparkContext.setJobDescription(s"optbench: $name")
      val times = (1 to iters).map { _ =>
        val c0 = procCpuSecs()
        val t0 = System.nanoTime()
        val ok = try { mat(gen()); true } catch { case e: Throwable =>
          System.err.println(s"[optbench] $name failed: ${e.getMessage}"); false
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = procCpuSecs() - c0
        if (ok) (wall, cpu) else (-1.0, -1.0)
      }.filter(_._1 >= 0).sortBy(_._1)
      spark.sparkContext.setJobDescription(null)
      if (times.isEmpty) println(f"OPTBENCH $name%-28s FAILED")
      else {
        val (w, c) = times(times.size / 2)
        val all = times.map(t => f"${t._1}%.3f").mkString(",")
        println(f"OPTBENCH $name%-28s median=$w%.3f cpu=$c%.3f all=[$all]")
      }
    }
    spark.stop()
  }
}
