package graft.ops

import graft.core.{Panel, PanelCols}
import graft.kernels.{Garch, Hmm, MatrixProfile, Rocket}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kernel-backed advanced operators: ROCKET features, GARCH volatility,
  * HMM regimes. Grouped-array form → broadcast kernel state → per-series
  * execution in tasks.
  */
object Advanced {

  /** Default per-task series-length valve for the monolithic
    * [[matrixProfile]] (and per-task pair bound for [[mpAbJoin]]):
    * 65536 points ≈ 2×10⁹ window pairs ≈ seconds on one core. Past it,
    * [[matrixProfileBlocked]] distributes one series' O(n²) across the
    * cluster. */
  val MpMaxLen: Int = 1 << 16

  /** ROCKET features `rocket_0..rocket_{2n-1}` per series (reference
    * features/rocket.py:22-133): one row per series, PPV+max per kernel.
    * The seeded kernel bank is generated once on the driver and broadcast
    * (identical kernels on every executor). */
  def rocketFeatures(df: DataFrame, nKernels: Int = 100, inputLen: Int = 64,
      seed: Long = 42L)(implicit pc: PanelCols): DataFrame = {
    val spark = df.sparkSession
    val bank = spark.sparkContext.broadcast(Rocket.randomKernels(nKernels, inputLen, seed))
    val u = udf((ys: Seq[Double]) => Rocket.transform(ys.toArray, bank.value))
    val g = Panel.grouped(df).select(pc.idCol, u(col("ys")).as("__f"))
    (0 until nKernels * 2).foldLeft(g)((d, i) =>
      d.withColumn(s"rocket_$i", element_at(col("__f"), i + 1))).drop("__f")
  }

  /** MiniRocket PPV features `minirocket_0..83` (rocket.py:141-258). */
  def miniRocketFeatures(df: DataFrame)(implicit pc: PanelCols): DataFrame = {
    val u = udf((ys: Seq[Double]) => Rocket.miniRocketTransform(ys.toArray))
    val g = Panel.grouped(df).select(pc.idCol, u(col("ys")).as("__f"))
    (0 until 84).foldLeft(g)((d, i) =>
      d.withColumn(s"minirocket_$i", element_at(col("__f"), i + 1))).drop("__f")
  }

  /** GARCH(1,1) fit + h-step volatility forecast per series:
    * `[id, omega, alpha, beta, step, sigma]` (volatility.py:25-174).
    * Input series is converted to returns (diff) inside the op. */
  def garchForecast(df: DataFrame, h: Int)(implicit pc: PanelCols): DataFrame = {
    val u = udf((ys: Seq[Double]) => {
      val arr = ys.toArray
      val returns = arr.indices.drop(1).map(i => arr(i) - arr(i - 1)).toArray
      val (params, fc) = Garch.fitForecast(returns, h)
      (params(0), params(1), params(2), fc)
    })
    Panel.grouped(df)
      .select(pc.idCol, u(col("ys")).as("__r"))
      .select(pc.idCol, col("__r._1").as("omega"), col("__r._2").as("alpha"),
        col("__r._3").as("beta"), posexplode(col("__r._4")).as(Seq("__i", "sigma")))
      .withColumn("step", col("__i") + 1)
      .select(pc.idCol, col("omega"), col("alpha"), col("beta"), col("step"), col("sigma"))
  }

  /** ARIMA(p,d,q) forecast per series (reference models/arima.py:95-182):
    * `[id, step, ds, y_hat]`, CSS-estimated ARMA on the d-differenced
    * series. One grouped pass via multiForecast. */
  def arimaForecast(df: DataFrame, p: Int, d: Int, q: Int, h: Int)(
      implicit pc: PanelCols): DataFrame =
    ForecastBaselines.multiForecast(df, h, Seq(
      "arima" -> (ys => graft.kernels.Arima.forecast(ys, p, d, q, h))))
      .select(pc.idCol, col("step"), pc.timeCol, col("y_hat"))

  /** auto-ARIMA forecast per series (reference models/arima.py:23-91):
    * KPSS-selected d + AICc grid over (p,q) ≤ (3,3), executed entirely on
    * executors — the order search is per-series-local, so the panel stays
    * one grouped pass. Output `[id, step, ds, y_hat]`. */
  def autoArima(df: DataFrame, h: Int, maxP: Int = 3, maxQ: Int = 3)(
      implicit pc: PanelCols): DataFrame =
    ForecastBaselines.multiForecast(df, h, Seq(
      "auto_arima" -> (ys => graft.kernels.Arima.autoForecast(ys, h, maxP, maxQ))))
      .select(pc.idCol, col("step"), pc.timeCol, col("y_hat"))

  /** Per-series selected auto-ARIMA orders `[id, p, d, q, aicc]` —
    * the diagnostic companion of [[autoArima]]. */
  def autoArimaOrders(df: DataFrame, maxP: Int = 3, maxQ: Int = 3)(
      implicit pc: PanelCols): DataFrame = {
    val u = udf((ys: Seq[Double]) => {
      val (p, d, q, fit) = graft.kernels.Arima.autoFit(ys.toArray, maxP, maxQ)
      (p, d, q, fit.aicc)
    })
    Panel.grouped(df)
      .select(pc.idCol, u(col("ys")).as("__r"))
      .select(pc.idCol, col("__r._1").as("p"), col("__r._2").as("d"),
        col("__r._3").as("q"), col("__r._4").as("aicc"))
  }

  /** Gaussian-HMM regimes per row: `[.., regime, regime_prob]`
    * (changepoint/regime.py:9-157). */
  def regimeDetect(df: DataFrame, k: Int = 2)(implicit pc: PanelCols): DataFrame = {
    val u = udf((ys: Seq[Double]) => Hmm.fit(ys.toArray, k).map { case (r, p) => (r, p) })
    Panel.grouped(df)
      .select(pc.idCol, col("ts").as("__ts"), u(col("ys")).as("__r"))
      .select(pc.idCol, posexplode(col("__r")).as(Seq("__i", "__s")), col("__ts"))
      .select(pc.idCol, expr("__ts[__i]").as(pc.time),
        col("__s._1").as("regime"), col("__s._2").as("regime_prob"))
  }

  /** Matrix profile per series ([[graft.kernels.MatrixProfile]], STOMP):
    * one row per length-`m` window — `[id, <time of window start>, idx,
    * mp, mp_idx]` where `mp` is the z-normalized distance to the
    * window's nearest non-trivial neighbor and `mp_idx` that neighbor's
    * start index. Low mp = motif, high mp = discord (the per-series
    * anomaly primitive). Grouped kernel: series distribute, O(n²)
    * inside the group, nothing crosses series.
    *
    * Length valve: the per-series O(n²) runs inside ONE task, so an
    * unexpectedly long series is a silent scale-killer — `maxLen`
    * (default [[MpMaxLen]] = 65536 ≈ 2×10⁹ pairs, seconds on one core)
    * fails loud instead; [[matrixProfileBlocked]] is the distributed
    * long-series path. */
  def matrixProfile(df: DataFrame, m: Int, maxLen: Int = MpMaxLen)(
      implicit pc: PanelCols): DataFrame = {
    val u = udf((ys: Seq[Double]) =>
      if (ys.length < m + math.max(1, m / 2)) Seq.empty[(Int, Double, Int)]
      else {
        require(ys.length <= maxLen,
          s"matrixProfile: series of ${ys.length} points exceeds maxLen=" +
            s"$maxLen — STOMP is O(n²) inside one task; use " +
            "matrixProfileBlocked for long series (or raise maxLen " +
            "deliberately)")
        val (mp, mpi) = MatrixProfile.stomp(ys.toArray, m)
        // windows with no admissible neighbor (series shorter than
        // m - 1 + 2·excl leave interior windows with every |i-j| < excl)
        // carry mp = +Inf / mp_idx = -1: drop them — the pair-join
        // oracle produces no row for them, and a discord ranking must
        // never surface an Infinity window as the top anomaly
        mp.indices.collect { case i if mpi(i) >= 0 => (i, mp(i), mpi(i)) }
      })
    Panel.grouped(df)
      .select(pc.idCol, col("ts").as("__ts"), u(col("ys")).as("__r"))
      .select(pc.idCol, explode(col("__r")).as("__s"), col("__ts"))
      .select(pc.idCol, expr("__ts[__s._1]").as(pc.time),
        col("__s._1").as("idx"), col("__s._2").as("mp"),
        col("__s._3").as("mp_idx"))
  }

  /** Distributed matrix profile for LONG series — the same profile as
    * [[matrixProfile]], computed as `numBlocks` independent diagonal
    * blocks per series so one series' O(n²) spreads across the cluster
    * instead of sitting in one task (the length axis [[matrixProfile]]'s
    * `maxLen` valve guards).
    *
    * Plan: group once → explode each series into its balanced diagonal
    * ranges ([[graft.kernels.MatrixProfile.diagRanges]] — equal PAIR
    * count, not equal width) → repartition on (id, block) so blocks of
    * one series land on different cores → each block runs the STOMP
    * recursion over its own diagonals (each diagonal's QT seed is one
    * O(m) dot product, so block values are BIT-identical to the
    * monolithic walk) → per-window `min(struct(mp, mp_idx))` merge (the
    * lexicographic (d, j) rule, order-independent) → time join.
    * Exactness is spec-pinned: blocked ≡ monolithic on the unrounded
    * profile, not just to 6dp.
    *
    * Cost note: the explode ships `numBlocks` copies of each series
    * through one shuffle (8·n·numBlocks bytes/series) — at n = 10⁷ and
    * 32 blocks that is ~2.5 GB moved once to distribute ~5×10¹³ pair
    * ops, the right trade everywhere past [[MpMaxLen]]. */
  def matrixProfileBlocked(df: DataFrame, m: Int, numBlocks: Int = 32)(
      implicit pc: PanelCols): DataFrame = {
    require(numBlocks >= 1, "matrixProfileBlocked: numBlocks must be >= 1")
    val excl = math.max(1, m / 2)
    val rangesU = udf((len: Int) =>
      if (len < m + excl) Seq.empty[(Int, Int)]
      else MatrixProfile.diagRanges(len - m + 1, m, numBlocks))
    val partU = udf((ys: Seq[Double], lo: Int, hi: Int) => {
      val (mp, mpi) = MatrixProfile.stompDiagBlock(ys.toArray, m, lo, hi)
      mp.indices.collect { case i if mpi(i) >= 0 => (i, mp(i), mpi(i)) }
    })
    val g = Panel.grouped(df).select(pc.idCol, col("ys"))
    // window-start times from the RAW panel (row_number over the same
    // (time, tieBreak, value) order Panel.grouped sorts by) — re-deriving
    // them from the grouped arrays would rebuild every series array a
    // second time just to explode it back out
    val ord = (pc.timeCol.asc +: pc.tieBreak.map(col(_).asc)) :+
      pc.targetCol.cast("double").asc
    val times = df.select(pc.idCol, pc.timeCol,
      (row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(pc.idCol).orderBy(ord: _*)) - 1).as("idx"))
    val prof = g
      .select(pc.idCol, col("ys"),
        explode(rangesU(size(col("ys")))).as("__b"))
      .repartition(pc.idCol, col("__b._1"))
      .select(pc.idCol,
        explode(partU(col("ys"), col("__b._1"), col("__b._2"))).as("__s"))
      .groupBy(pc.idCol, col("__s._1").as("idx"))
      .agg(min(struct(col("__s._2").as("mp"),
        col("__s._3").as("mp_idx"))).as("__m"))
    prof.join(times, Seq(pc.id, "idx"))
      .select(pc.idCol, col(pc.time), col("idx"),
        col("__m.mp").as("mp"), col("__m.mp_idx").as("mp_idx"))
  }

  /** AB-join matrix profile (Yeh et al. 2016 §IV): for every window of
    * the QUERY panel's series, the z-normalized distance to the nearest
    * window of the REFERENCE panel's series with the same id — "where
    * does each stretch of A occur in B?", the cross-series companion of
    * [[matrixProfile]] (no exclusion zone: the series are distinct).
    * Output `[id, <time of window start>, idx, mp, mp_idx]` with
    * `mp_idx` the reference window index. One grouped pass per panel +
    * an id-equi join; the O(nA·nB) kernel runs per id in tasks —
    * `maxLen` bounds the per-task pair count like [[matrixProfile]]'s
    * valve. Ids present in only one panel drop (inner join): there is
    * no profile without both sides. */
  def mpAbJoin(query: DataFrame, ref: DataFrame, m: Int,
      maxLen: Int = MpMaxLen)(implicit pc: PanelCols): DataFrame = {
    val u = udf((a: Seq[Double], b: Seq[Double]) =>
      if (a.length < m || b.length < m) Seq.empty[(Int, Double, Int)]
      else {
        require(a.length.toLong * b.length <= maxLen.toLong * maxLen,
          s"mpAbJoin: ${a.length}×${b.length} window pairs exceed " +
            s"maxLen²=$maxLen² in one task — split the reference panel " +
            "(or raise maxLen deliberately)")
        val (mp, mpi) = MatrixProfile.abJoin(a.toArray, b.toArray, m)
        mp.indices.map(i => (i, mp(i), mpi(i)))
      })
    val q = Panel.grouped(query)
      .select(pc.idCol, col("ts").as("__qts"), col("ys").as("__qys"))
    val r = Panel.grouped(ref).select(pc.idCol, col("ys").as("__rys"))
    q.join(r, Seq(pc.id))
      .select(pc.idCol, col("__qts"),
        explode(u(col("__qys"), col("__rys"))).as("__s"))
      .select(pc.idCol, expr("__qts[__s._1]").as(pc.time),
        col("__s._1").as("idx"), col("__s._2").as("mp"),
        col("__s._3").as("mp_idx"))
  }

  /** Pattern search: the top-`k` closest matches of one query `pattern`
    * in every series — the distance profile ([[graft.kernels.
    * MatrixProfile.distanceProfile]], z-normalized so matches are
    * shape-matches regardless of level/scale) ranked ascending on the
    * 6-dp-rounded distance (window index on ties — reproducible across
    * engines like [[discords]]). The pattern broadcasts inside the UDF
    * closure; each series' scan is narrow — 100 TB of panels search in
    * one grouped pass. */
  def patternSearch(df: DataFrame, pattern: Array[Double], k: Int = 3)
      (implicit pc: PanelCols): DataFrame = {
    require(k >= 1, "patternSearch: k must be >= 1")
    val m = pattern.length
    val u = udf((ys: Seq[Double]) =>
      if (ys.length < m) Seq.empty[(Int, Double)]
      else {
        val d = MatrixProfile.distanceProfile(ys.toArray, pattern)
        d.indices.map(i => (i, d(i)))
      })
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pc.idCol)
      .orderBy(col("__rd"), col("idx"))
    Panel.grouped(df)
      .select(pc.idCol, col("ts").as("__ts"), u(col("ys")).as("__r"))
      .select(pc.idCol, explode(col("__r")).as("__s"), col("__ts"))
      .select(pc.idCol, expr("__ts[__s._1]").as(pc.time),
        col("__s._1").as("idx"), col("__s._2").as("dist"))
      .withColumn("__rd", round(col("dist") + 1e-9, 6))
      .withColumn("match_rank", row_number().over(w))
      .filter(col("match_rank") <= k)
      .select(pc.idCol, col(pc.time), col("idx"),
        col("__rd").as("dist"), col("match_rank"))
  }

  /** Top-`k` motifs per series — the dual of [[discords]]: the windows
    * CLOSEST to their nearest neighbor (lowest profile = most-repeated
    * shape). Same reproducible ranking: 6-dp-rounded profile ascending,
    * window index on ties. */
  def motifs(df: DataFrame, m: Int, k: Int = 3)
      (implicit pc: PanelCols): DataFrame = {
    require(k >= 1, "motifs: k must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pc.idCol)
      .orderBy(col("__rmp"), col("idx"))
    matrixProfile(df, m)
      .withColumn("__rmp", round(col("mp") + 1e-9, 6))
      .withColumn("motif_rank", row_number().over(w))
      .filter(col("motif_rank") <= k)
      .select(pc.idCol, col(pc.time), col("idx"),
        col("__rmp").as("mp"), col("motif_rank"))
  }

  /** Top-`k` discords per series: the windows FARTHEST from everything
    * else in their own series — [[matrixProfile]]'s anomaly reading.
    * Ranking uses the 6-dp-rounded profile (descending, window index
    * ascending on ties): rounding first makes the rank reproducible
    * across engines — ulp-level mp differences between the STOMP
    * recursion and a direct replay cannot flip it. */
  def discords(df: DataFrame, m: Int, k: Int = 3)
      (implicit pc: PanelCols): DataFrame = {
    require(k >= 1, "discords: k must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pc.idCol)
      .orderBy(col("__rmp").desc, col("idx"))
    matrixProfile(df, m)
      .withColumn("__rmp", round(col("mp") + 1e-9, 6))
      .withColumn("discord_rank", row_number().over(w))
      .filter(col("discord_rank") <= k)
      .select(pc.idCol, col(pc.time), col("idx"),
        col("__rmp").as("mp"), col("discord_rank"))
  }
}
