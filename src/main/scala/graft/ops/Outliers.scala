package graft.ops

import graft.core.PanelCols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Outlier detection and treatment (reference polars_ts/outliers.py:8-181).
  *
  * zscore / iqr / rolling_zscore / hampel are all window expressions (exact
  * `percentile` for Polars-quantile parity). Appends Boolean `is_outlier`
  * plus the fence columns used by `treat`.
  */
object Outliers {

  /** Detect outliers; appends `is_outlier` (and internal fence columns
    * `__lo`/`__hi` consumed by [[treat]]). */
  def detect(df: DataFrame, method: String = "zscore", threshold: Double = 3.0,
      window: Int = 21)(implicit pc: PanelCols): DataFrame = {
    val y = pc.targetCol
    val (lo, hi): (Column, Column) = method match {
      case "zscore" =>
        val mu = avg(y).over(pc.wAll); val sd = stddev_samp(y).over(pc.wAll)
        (mu - lit(threshold) * sd, mu + lit(threshold) * sd)
      case "iqr" =>
        val q1 = percentile(y, lit(0.25)).over(pc.wAll)
        val q3 = percentile(y, lit(0.75)).over(pc.wAll)
        val iqr = q3 - q1
        (q1 - lit(1.5) * iqr, q3 + lit(1.5) * iqr)
      case "rolling_zscore" =>
        val f = pc.w.rowsBetween(-(window - 1), 0)
        val mu = avg(y).over(f); val sd = stddev_samp(y).over(f)
        (mu - lit(threshold) * sd, mu + lit(threshold) * sd)
      case "hampel" =>
        // centered rolling median ± threshold * 1.4826 * MAD — MAD needs a
        // second pass over |y - median|, done with a self-window on the
        // materialized median column.
        val half = window / 2
        val f = pc.w.rowsBetween(-half, half)
        val med = percentile(y, lit(0.5)).over(f)
        val d2 = df.withColumn("__med", med)
        val mad = percentile(abs(y - col("__med")), lit(0.5)).over(
          pc.w.rowsBetween(-half, half))
        val sigma = lit(1.4826 * threshold) * mad
        return d2.withColumn("__lo", col("__med") - sigma)
          .withColumn("__hi", col("__med") + sigma)
          .withColumn("is_outlier",
            y.isNotNull && (y < col("__lo") || y > col("__hi")))
          .drop("__med")
      case other => throw new IllegalArgumentException(
        s"Unknown method '$other'. Choose from [zscore, iqr, hampel, rolling_zscore]")
    }
    df.withColumn("__lo", lo).withColumn("__hi", hi)
      .withColumn("is_outlier", y.isNotNull && (y < lo || y > hi))
  }

  /** Isolation-forest anomaly detection over engineered feature columns
    * (reference anomaly_forest.py:10-104, global_model mode). Appends
    * `anomaly_score` (lower = more anomalous, mirroring sklearn's
    * decision_function orientation) and `is_anomaly` (the `contamination`
    * fraction with the lowest scores).
    *
    * Scale shape: the forest trains on a seeded hash-ordered uniform
    * sample (ψ-subsample per tree, Liu et al.'s design — isolation forests
    * are defined on subsamples, so a bounded driver sample IS the
    * algorithm); the trained trees broadcast and scoring is a narrow map.
    * The only wide op is the exact contamination-quantile threshold. */
  /** Seeded-sample tree fit shared by [[isolationForestDetect]] and the
    * correctness-oracle pin path (OraclePins) — both must see the exact
    * same forest. Returns (trees, effective ψ). */
  private[graft] def iforestFitTrees(clean: DataFrame, featureCols: Seq[String],
      nTrees: Int, psi: Int, sampleSize: Int, seed: Long):
      (Array[graft.kernels.IsolationForest.Node], Int) = {
    val total = clean.count()
    val frac = if (total == 0) 1.0 else math.min(1.0, 3.0 * sampleSize / total)
    val featArr = array(featureCols.map(c => col(c).cast("double")): _*)
    val sample = clean.select(featArr.as("__f"))
      .sample(withReplacement = false, frac, seed)
      .orderBy(xxhash64(col("__f").cast("string"), lit(seed)))
      .limit(sampleSize)
      .collect().map(_.getSeq[Double](0).toArray)
    (graft.kernels.IsolationForest.fit(sample, nTrees, psi, seed),
      math.min(psi, sample.length))
  }

  def isolationForestDetect(df: DataFrame, featureCols: Seq[String],
      contamination: Double = 0.05, nTrees: Int = 100, psi: Int = 256,
      sampleSize: Int = 4096, seed: Long = 42L): DataFrame = {
    require(featureCols.nonEmpty, "featureCols must be non-empty")
    require(contamination > 0 && contamination < 1, "contamination must be in (0, 1)")
    val spark = df.sparkSession
    val clean = df.na.drop(featureCols)
    val (trees, effPsi) =
      iforestFitTrees(clean, featureCols, nTrees, psi, sampleSize, seed)
    val bc = spark.sparkContext.broadcast(trees)
    val featArr = array(featureCols.map(c => col(c).cast("double")): _*)
    val scoreUdf = udf((xs: Seq[Double]) => {
      val (eh, sc) = graft.kernels.IsolationForest.pathScore(xs.toArray, bc.value, effPsi)
      (eh, -sc)
    })
    val scored = clean.withColumn("__s", scoreUdf(featArr))
      .withColumn("mean_path_len", col("__s._1"))
      .withColumn("anomaly_score", col("__s._2"))
      .drop("__s")
    // approx threshold: an exact global percentile sorts the full column on
    // one reducer — at corpus scale the 10⁻⁴-accuracy sketch is the only
    // shape that survives, and the flag boundary is approximate anyway
    val thr = scored.agg(
      approx_percentile(col("anomaly_score"), lit(contamination), lit(10000)).as("__t"))
    scored.crossJoin(broadcast(thr))
      .withColumn("is_anomaly", col("anomaly_score") < col("__t"))
      .drop("__t")
  }

  /** Multi-agent consensus anomaly detection (reference
    * polars_ts/anomaly_agents/: ZScoreAgent + RollingStdAgent + MADAgent
    * over a trailing window, aggregated by ConsensusAgent). The reference
    * steps an env one observation at a time; here every agent is a window
    * expression over the trailing `windowSize−1` context, so the whole
    * multi-agent loop is one shuffle-free pass. Rows without a full
    * context are dropped (the env starts once its window fills).
    * Output: `[.., z_score, std_score, mad_score, decision]`. */
  def consensusAnomaly(df: DataFrame, windowSize: Int = 20,
      method: String = "majority", zThreshold: Double = 3.0,
      stdThreshold: Double = 3.0, madThreshold: Double = 3.5)(
      implicit pc: PanelCols): DataFrame = {
    require(windowSize >= 3, "windowSize must be >= 3")
    val y = pc.targetCol
    val ctx = pc.w.rowsBetween(-(windowSize - 1), -1)
    val mu = avg(y).over(ctx)
    val sd = stddev_pop(y).over(ctx) + 1e-10 // np.std is population std
    // median and MAD need the CURRENT row's context median applied to all
    // context values — a windowed percentile of per-row medians would
    // drift; the context array is bounded (windowSize) so an exact kernel
    // over collect_list is both correct and cheap
    val medMadUdf = udf((xs: Seq[Double]) => {
      val arr = xs.toArray.sorted
      def med(a: Array[Double]): Double = {
        val n = a.length
        if (n == 0) 0.0
        else if (n % 2 == 1) a(n / 2)
        else (a(n / 2 - 1) + a(n / 2)) / 2.0
      }
      val m = med(arr)
      val madV = med(arr.map(v => math.abs(v - m)).sorted)
      (m, madV)
    })
    val scored = df
      .withColumn("__n_ctx", count(y).over(ctx))
      .withColumn("__mm", medMadUdf(collect_list(y).over(ctx)))
      .withColumn("__med", col("__mm._1"))
      .withColumn("__mad", col("__mm._2") + 1e-10)
      .withColumn("z_score", abs(y - mu) / sd)
      .withColumn("std_score", abs(y - col("__med")) / sd)
      .withColumn("mad_score", lit(0.6745) * abs(y - col("__med")) / col("__mad"))
      .filter(col("__n_ctx") === (windowSize - 1))
      .drop("__mm", "__mad")
    val zF = col("z_score") > zThreshold
    val sF = col("std_score") > stdThreshold
    val mF = col("mad_score") > madThreshold
    val votes = zF.cast("int") + sF.cast("int") + mF.cast("int")
    val decision = method match {
      case "majority" => votes > lit(1.5)
      case "any" => zF || sF || mF
      case other => throw new IllegalArgumentException(
        s"Unknown consensus method '$other'. Choose from [majority, any]")
    }
    scored.withColumn("decision", decision).drop("__med", "__n_ctx")
  }

  /** Replace detected outliers: clip to fences, per-series median, null, or
    * linear interpolation (reference outliers.py:101-181). Consumes the
    * columns produced by [[detect]] and drops them. */
  def treat(df: DataFrame, method: String = "clip")(implicit pc: PanelCols): DataFrame = {
    val y = pc.targetCol
    val flagged = if (df.columns.contains("is_outlier")) df else detect(df)
    val treated = method match {
      case "clip" =>
        flagged.withColumn(pc.target,
          when(col("is_outlier"), least(greatest(y, col("__lo")), col("__hi"))).otherwise(y))
      case "median" =>
        flagged.withColumn(pc.target,
          when(col("is_outlier"),
            percentile(when(!col("is_outlier"), y), lit(0.5)).over(pc.wAll)).otherwise(y))
      case "null" =>
        flagged.withColumn(pc.target, when(col("is_outlier"), lit(null)).otherwise(y))
      case "interpolate" => {
        val nulled = flagged.withColumn(pc.target,
          when(col("is_outlier"), lit(null)).otherwise(y))
        Impute.impute(nulled, "linear")
      }
      case other => throw new IllegalArgumentException(
        s"Unknown method '$other'. Choose from [clip, median, interpolate, null]")
    }
    treated.drop("__lo", "__hi")
  }
}
