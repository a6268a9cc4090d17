package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus-sampling operators for dataset curation — the
  * stable train/test-split machinery a 100 TB pipeline needs around the
  * dedup/quality tiers. Both are pure per-row expressions on an
  * engine-reproducible FNV-1a hash (the EnbPI bootstrap-weight pattern),
  * so membership is bit-identical across engines and re-runs: adding or
  * removing OTHER documents never changes a document's assignment, unlike
  * `df.sample` (partition-layout-dependent) or rand() (nondeterministic).
  */
object Sampling {

  /** Uniform-in-[0,1) from FNV-1a("seed:id") put through the murmur3
    * fmix64 finalizer, top 53 bits. The finalizer matters: raw FNV's high
    * bits barely avalanche on short keys ("42:7"), skewing the uniform by
    * >10×; fmix64's xor-shift-multiply chain is wrap-arithmetic the
    * DuckDB oracle replays exactly with HUGEINT mod-2⁶⁴ math. */
  // Now the native codegen expression graft.plans.StableUniformExpr —
  // identical arithmetic, no UDF boundary on the per-row membership draw.
  def stableUniform(id: Column, seed: Long): Column =
    graft.plans.StableUniformExpr(
      concat_ws(":", lit(seed.toString), id.cast("string")))

  /** Keep each row independently iff u(id) < rate. Stable: a document's
    * membership depends only on (seed, id). */
  def stableSample(df: DataFrame, idCol: String, rate: Double,
      seed: Long = 42L): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0, 1]")
    df.filter(stableUniform(col(idCol), seed) < rate)
  }

  /** Deterministic train/validation/test split label per id from the same
    * uniform: `train` below trainFrac, then `valid`, then `test`. */
  def stableSplit(df: DataFrame, idCol: String, trainFrac: Double = 0.8,
      validFrac: Double = 0.1, seed: Long = 42L): DataFrame = {
    require(trainFrac >= 0 && validFrac >= 0 && trainFrac + validFrac <= 1.0,
      "fractions must be non-negative and sum to <= 1")
    val u = stableUniform(col(idCol), seed)
    df.withColumn("split",
      when(u < trainFrac, "train")
        .when(u < trainFrac + validFrac, "valid")
        .otherwise("test"))
  }

  /** Temperature-weighted source mixing plan (the multinomial-sampling
    * exponent of multilingual/multi-source LM training, Lample & Conneau
    * 2019 §3.1): pᵢ = nᵢ^α / Σⱼ nⱼ^α, quotaᵢ = min(nᵢ,
    * ⌊pᵢ·budget + 0.5⌋) documents per source — α < 1 upsamples tail
    * sources relative to their natural share. Per-source frame:
    * (group, n_docs, p, quota). The count aggregation is the only
    * shuffle; the Σwᵢ normalizer is a broadcast one-row cross join (no
    * unpartitioned window). The rounding is written as floor(x + 0.5) so
    * an oracle replays it exactly (engine round() conventions differ). */
  def temperatureMixPlan(df: DataFrame, groupCol: String, budget: Long,
      alpha: Double): DataFrame = {
    val counts = df.groupBy(groupCol)
      .agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__w", pow(col("__n"), alpha))
    val tot = counts.agg(sum("__w").as("__tw"))
    counts.crossJoin(broadcast(tot))
      .withColumn("p", col("__w") / col("__tw"))
      .select(col(groupCol), col("__n").cast("long").as("n_docs"), col("p"),
        least(col("__n"), floor(col("p") * budget + 0.5)).cast("long").as("quota"))
  }

  /** Epoch-capped token allocation — the data-constrained-scaling mix
    * plan (Muennighoff et al. 2023, arXiv:2305.16264: past ~4 epochs,
    * repeated tokens stop contributing; cap repetition per source and
    * surface the shortfall instead of silently over-repeating).
    *
    * Per domain: `tokens_available` T_d (sum of per-doc token counts),
    * temperature weight `p` ∝ T_d^alpha, desired = p·budget, and
    * `allocated_tokens` = min(desired, maxEpochs·T_d) — the closed-form
    * cap with NO redistribution, so the plan is exactly replayable and
    * the operator-facing `shortfall` column (Σ desired − Σ allocated,
    * same value on every row) says how many budgeted tokens the caps
    * left unplaced (raise alpha, maxEpochs, or add data). `epochs` =
    * allocated/T_d ≤ maxEpochs.
    *
    * Scale: one groupBy over (domain, doc-token) rows + a ≤#domains
    * broadcast — the temperatureMixPlan shape. */
  def epochCapMixPlan(df: DataFrame, groupCol: String, budgetTokens: Long,
      maxEpochs: Double, alpha: Double = 0.5,
      tokens: Option[Column] = None, textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, "epochCapMixPlan: budgetTokens must be positive")
    require(maxEpochs > 0, "epochCapMixPlan: maxEpochs must be positive")
    val tok = tokens.getOrElse(TextOps.tokenCount(col(textCol))).cast("long")
    val counts = df.groupBy(groupCol)
      .agg(sum(tok).cast("double").as("__t"))
      .withColumn("__w", pow(col("__t"), alpha))
    val tot = counts.agg(sum("__w").as("__tw"))
    val planned = counts.crossJoin(broadcast(tot))
      .withColumn("p", col("__w") / col("__tw"))
      .withColumn("__desired", col("p") * budgetTokens)
      .withColumn("allocated_tokens",
        least(col("__desired"), col("__t") * maxEpochs))
    val short = planned.agg(
      (sum("__desired") - sum("allocated_tokens")).as("__s"))
    planned.crossJoin(broadcast(short))
      .select(col(groupCol), col("__t").cast("long").as("tokens_available"),
        col("p"),
        floor(col("allocated_tokens")).cast("long").as("allocated_tokens"),
        (col("allocated_tokens") / col("__t")).as("epochs"),
        // double, not floored: a difference of two distributed float
        // sums sits within ulps of the true value, and a floor there
        // would be engine-order-sensitive; round at the consumer
        col("__s").as("shortfall"))
  }

  /** Materialize a [[temperatureMixPlan]]: keep the first `quota` rows of
    * each group in stable hash order — the stratifiedQuota rank with a
    * per-group quota joined in (broadcast; the plan is #groups rows). */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
      budget: Long, alpha: Double, seed: Long = 42L): DataFrame = {
    val plan = temperatureMixPlan(df, groupCol, budget, alpha)
      .select(col(groupCol), col("quota"))
    df.join(broadcast(plan), Seq(groupCol))
      .withColumn("__u", stableUniform(col(idCol), seed))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("__u"), col(idCol))))
      .filter(col("__rk") <= col("quota"))
      .drop("__u", "__rk", "quota")
  }

  /** At most `quota` rows per group, chosen by hash order (u, id) — a
    * deterministic per-stratum cap (e.g. balance languages or sources).
    * One shuffle on the group key; the rank is a window over (u, id), so
    * the same rows survive regardless of partitioning. */
  def stratifiedQuota(df: DataFrame, groupCol: String, idCol: String,
      quota: Int, seed: Long = 42L): DataFrame = {
    require(quota > 0, "quota must be positive")
    val u = stableUniform(col(idCol), seed)
    df.withColumn("__u", u)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("__u"), col(idCol))))
      .filter(col("__rk") <= quota)
      .drop("__u", "__rk")
  }
}
