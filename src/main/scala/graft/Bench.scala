package graft

import graft.core.{IO, PanelCols}
import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main — implements the BASELINE.md suite: the reference's
  * harness shapes (pairwise DTW, PELT, ETS panels — bench_kmedoids.py /
  * bench_pelt.py / bench_ets.py) plus sf-scale engine queries on the
  * driver testdata. Prints ONE JSON line.
  *
  * Methodology: every timed query materializes through the `noop` sink —
  * `count()` would let Catalyst prune exactly the columns under test. A
  * warmup pass absorbs JVM/codegen first-run cost so numbers reflect
  * steady-state throughput.
  */
object Bench {

  private implicit val PC: PanelCols =
    PanelCols("user_id", "ts", "value", tieBreak = Seq("event_id"))

  /** Deterministic synthetic panel: `nSeries` × `len` rows with trend,
    * seasonality, hash-noise, and a level shift halfway (for PELT). */
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

  private def mat(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** 1-minute load average — recorded per query so the bench artifact
    * self-adjudicates co-residency (VERDICT r7 "what's wrong" #1: the
    * recorded r7 run was 5× slow purely because the driver's own
    * compile+verify shared the box). −1 when /proc is unavailable. */
  private def loadAvg(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split("\\s+")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  /** Per-query trailing medians from the prior rounds' recorded
    * BENCH_r*.json artifacts in the cwd (the driver wraps the sbt tail;
    * the JSON line is extracted from `parsed` or scraped from `tail`).
    * Empty on any parse trouble — adjudication then simply never fires. */
  private def trailingMedians(): Map[String, Double] = try {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val re = """\{"metric":.*\}""".r
    val files = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("BENCH_r\\d+\\.json"))
    val perRound: Seq[Map[String, Double]] = files.toSeq.flatMap { f =>
      try {
        val root = JsonMethods.parse(java.nio.file.Files.readString(f.toPath))
        val qjson: Option[JValue] = (root \ "parsed") match {
          case p: JObject => Some(p \ "queries")
          case _ => (root \ "tail") match {
            case JString(t) =>
              re.findFirstIn(t).map(s => JsonMethods.parse(s) \ "queries")
            case _ => None
          }
        }
        qjson.collect { case JObject(fields) =>
          fields.collect {
            case (k, JDouble(v)) => k -> v
            case (k, JInt(v)) => k -> v.toDouble
          }.toMap
        }
      } catch { case _: Throwable => None }
    }
    perRound.flatMap(_.keys).distinct.flatMap { k =>
      val vs = perRound.flatMap(_.get(k)).filter(_ > 0).sorted
      if (vs.isEmpty) None else Some(k -> vs(vs.size / 2))
    }.toMap
  } catch { case _: Throwable => Map.empty }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = IO.events(spark, sfDir).cache()
    events.count() // pin the scan

    val benches: Seq[(String, () => Unit)] = Seq(
      // sf-scale engine queries (headline surface)
      "q1_agg" -> (() => mat(SparkEntry.queries("q1_agg")(spark, sfDir))),
      "window_pipeline" -> (() => mat(
        Features.rollingFeatures(
          Features.calendarFeatures(
            Features.lagFeatures(events, Seq(1, 7, 14))), Seq(7)))),
      "forecast_score" -> (() => mat({
        val fc = ForecastBaselines.ses(events, h = 7)
        val pred = events.withColumn("y_hat", lag(col("value"), 1).over(PC.w))
          .filter(col("y_hat").isNotNull)
        Metrics.grouped(pred, "value", "y_hat").join(
          fc.groupBy("user_id").agg(avg("y_hat").as("fc_mean")), Seq("user_id"))
      })),
      "impute_outliers" -> (() => mat(
        Outliers.treat(Outliers.detect(
          Impute.impute(events, "forward_fill"), "zscore"), "clip"))),
      "resample_decompose" -> (() => mat(
        Decomposition.seasonal(events, freq = 24))),
      "dedup_exact" -> (() => mat(
        Dedup.exact(IO.documents(spark, sfDir)))),
      "minhash_lsh" -> (() => mat(
        Dedup.minhashLsh(IO.documents(spark, sfDir), threshold = 0.5))),
      "text_quality" -> (() => mat(
        TextOps.qualityMetrics(IO.documents(spark, sfDir).drop("n_chars")))),
      "knn_brute" -> (() => mat({
        val emb = IO.embeddings(spark, sfDir)
        Similarity.bruteForceTopK(emb, emb.limit(100), k = 10)
      })),
      "cusum_changepoint" -> (() => mat(Changepoint.cusum(events))),
      // reference harness shapes (BASELINE.md): pairwise / PELT / ETS
      "pairwise_dtw_50x30" -> (() => mat(
        Distances.pairwise(synthPanel(spark, 50, 30), "dtw"))),
      "pairwise_dtw_band_500x100" -> (() => mat(
        Distances.pairwise(synthPanel(spark, 500, 100), "dtw",
          Map("window" -> 10.0)))),
      "pelt_panel_1000x1000" -> (() => mat(
        Changepoint.pelt(synthPanel(spark, 1000, 1000), "mean"))),
      "ets_panel_1000x1000" -> (() => mat({
        // both ETS models from ONE grouped pass: a single shuffle of the
        // 1M-row panel instead of 2 scans × (groupBy + futureDates window)
        val p = synthPanel(spark, 1000, 1000)
        ForecastBaselines.multiForecast(p, h = 12, Seq(
          "ses" -> (ys => graft.kernels.Ets.ses(ys, 0.3, 12)),
          "hw" -> (ys => graft.kernels.Ets.holtWinters(ys, 0.3, 0.1, 0.1, 12, true, 12))))
      })),
      "mann_kendall_panel" -> (() => mat(
        Changepoint.mannKendall(synthPanel(spark, 1000, 1000)))))

    // round-6 curation tier — benched separately so `value` stays
    // like-for-like with earlier rounds (full sum in `total_full`)
    val curationBenches: Seq[(String, () => Unit)] = Seq(
      "semdedup" -> (() => mat({
        val emb = IO.embeddings(spark, sfDir).select("vec_id", "embedding")
        Similarity.semDedup(emb, Similarity.ivfCentroids(emb), threshold = 0.95)
      })),
      "unigram_logprob" -> (() => mat(
        TextOps.unigramLogProb(IO.documents(spark, sfDir), vocabSize = 500))),
      "pack_plan" -> (() => mat(
        Packing.packPlan(IO.documents(spark, sfDir), seqLen = 128, nShards = 8))),
      "curation_funnel" -> (() => mat(
        SparkEntry.queries("doc_curation_pipeline")(spark, sfDir))))

    // round-8 neural tier — benched OUTSIDE both totals (own field) so
    // "value"/"total_full" stay round-over-round comparable. These time
    // the production-scale paths: the broadcast-spec per-series forward
    // (assignment) and the zero-shuffle image-conv embedding map. The
    // small DEC fit runs once, untimed (bounded-sample driver cost).
    val decFitForBench = graft.kernels.DeepModels.decFit(
      DeepClustering.collectSeries(events, cap = 256).map(_._2),
      graft.kernels.DeepModels.DeepCfg(k = 3, embeddingDim = 4, nFilters = 4,
        pretrainEpochs = 2, finetuneEpochs = 1), idec = false)
    val neuralBenches: Seq[(String, () => Unit)] = Seq(
      "neural_assign" -> (() => mat(DeepClustering.assign(events, decFitForBench))),
      "vision_embed" -> (() => mat(VisionEmbed.visionEmbeddings(events))))

    // round-9 selection/curation tier — own field (total_selection) so the
    // earlier totals stay round-over-round comparable. Bounded fits
    // (classifier weights, IVF centroids) run once, untimed — the timed
    // paths are the distributed scoring/dedup passes a 100 TB run repeats.
    val docsB = IO.documents(spark, sfDir).cache()
    docsB.count()
    val embB = IO.embeddings(spark, sfDir).select("vec_id", "embedding").cache()
    embB.count()
    val clfModel = Selection.textClassifierFit(docsB, col("lang") === "en",
      buckets = 64, sampleCap = 1000)
    val protoCenters = Similarity.ivfCentroids(embB)
    val selectionBenches: Seq[(String, () => Unit)] = Seq(
      "line_dedup" -> (() => mat(Dedup.lineDedup(SparkEntry.linedDocs(docsB)))),
      "kn_perplexity" -> (() => mat(TextOps.knPerplexity(docsB, buckets = 4096))),
      "dsir_weights" -> (() => mat(
        Selection.dsirWeights(docsB, col("lang") === "en", buckets = 64))),
      "classifier_score" -> (() => mat(
        Selection.textClassifierScore(docsB, clfModel))),
      "prototype_prune" -> (() => mat(
        Similarity.prototypePrune(embB, protoCenters, keepFrac = 0.7))))

    // warmup: absorb JIT/codegen first-run cost on a small slice
    mat(Features.lagFeatures(events.limit(1000), Seq(1)))
    mat(ForecastBaselines.ses(events.limit(2000), h = 2))

    // Median of N iterations per query: a single-iteration wall time can't
    // distinguish a 1.5× run-to-run swing (shuffle-file reuse, GC, codegen
    // cache) from a real regression, so round-over-round comparisons on one
    // sample produce false regressions. Odd N → true median element.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    val loadStart = loadAvg()
    case class QRes(name: String, secs: Double, loadBefore: Double,
      loadAfter: Double, rerun: Option[Double] = None)
    def timeOnce(name: String, run: () => Unit): Double = {
      val t0 = System.nanoTime()
      val ok = try { run(); true } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    def timeAll(suite: Seq[(String, () => Unit)]): Seq[QRes] =
      suite.map { case (name, run) =>
        val lb = loadAvg()
        val times = (1 to iters).map(_ => timeOnce(name, run))
        val good = times.filter(_ >= 0).sorted
        QRes(name, if (good.isEmpty) -1.0 else good(good.size / 2), lb, loadAvg())
      }
    // contention self-adjudication (VERDICT r7 ask #3): a query whose
    // median exceeds 2× its trailing-round median while the 1-min load
    // ran above ~1.25× the worker count is presumed co-residency noise —
    // settle, rerun once, and record the better time. A real regression
    // (quiet box, or still slow after the settle) keeps the slow number.
    val trailing = trailingMedians()
    val nCpus = cpus.toInt
    val loadThreshold = 1.25 * nCpus
    val allRuns =
      (benches ++ curationBenches ++ neuralBenches ++ selectionBenches).toMap
    def adjudicate(rs: Seq[QRes]): Seq[QRes] = rs.map { r =>
      trailing.get(r.name) match {
        case Some(m) if r.secs > 2.0 * m &&
            math.max(r.loadBefore, r.loadAfter) > loadThreshold =>
          Thread.sleep(10000) // settle
          val again = timeOnce(r.name, allRuns(r.name))
          if (again >= 0 && again < r.secs)
            r.copy(secs = again, rerun = Some(again))
          else r.copy(rerun = Some(again))
        case _ => r
      }
    }
    val results = adjudicate(timeAll(benches))
    val curation = adjudicate(timeAll(curationBenches))
    val neural = adjudicate(timeAll(neuralBenches))
    val selection = adjudicate(timeAll(selectionBenches))
    val loadEnd = loadAvg()
    val all = results ++ curation ++ neural ++ selection
    val qs = all.map(r => "\"" + r.name + "\":" + r.secs).mkString("{", ",", "}")
    val loads = all.map(r =>
      "\"" + r.name + "\":[" + r.loadBefore + "," + r.loadAfter + "]")
      .mkString("{", ",", "}")
    val reruns = all.flatMap(r => r.rerun.map(v => "\"" + r.name + "\":" + v))
      .mkString("{", ",", "}")
    val total = results.map(_.secs).filter(_ >= 0).sum
    val totalFull = total + curation.map(_.secs).filter(_ >= 0).sum
    val totalNeural = neural.map(_.secs).filter(_ >= 0).sum
    val totalSelection = selection.map(_.secs).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"iterations":$iters,"total_full":$totalFull,"total_neural":$totalNeural,"total_selection":$totalSelection,"load":$loads,"load_start":$loadStart,"load_end":$loadEnd,"reruns":$reruns,"sf":"$sfDir"}"""
    // sentinel-prefixed line FIRST (unambiguous to scrape out of the sbt
    // [info] noise that left BENCH_r05-r07 "parsed": null), then the bare
    // JSON line (legacy scrape), then the file (robust path)
    println(s"BENCH_JSON: $json")
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), json)
    spark.stop()
  }
}
