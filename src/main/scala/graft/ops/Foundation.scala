package graft.ops

import graft.core.{Panel, PanelCols}
import graft.kernels.DetRng
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Foundation-model forecasting adapter surface (reference
  * `polars_ts/adapters/foundation_forecast.py`): the Chronos-style
  * series→token preprocessing as first-class engine ops, the
  * sample-path quantile assembly, and the `foundation_forecast`
  * dispatcher.
  *
  * Honesty boundary, stated up front: the reference's three forecasters
  * wrap PUBLISHED PRETRAINED backbones (Chronos T5 / TimesFM / Moirai)
  * that cannot ship into a zero-egress JVM. What IS implementable — and
  * is implemented here for real — is everything around the backbone:
  * the Chronos tokenizer (mean-absolute scaling + uniform binning into
  * a fixed token vocabulary, Ansari et al. 2024 §3.1, arXiv:2403.07815
  * — the exact preprocessing a 100 TB corpus needs to BECOME
  * foundation-model training data), the de-tokenizer, the per-series
  * autoregressive token sampler, and the reference's sample-path →
  * median/quantile-interval output assembly
  * (foundation_forecast.py:165-190). The backbone slot is filled by a
  * context-fitted bigram token LM — a real autoregressive sampler over
  * the Chronos token space, deterministic via counter-based [[DetRng]]
  * draws, documented as a LOCAL SURROGATE (not a pretrained model).
  *
  * Scale design: tokenization is one per-series aggregate (the scale)
  * joined back to a narrow pure-expression map — no UDF, fully
  * codegen, embarrassingly parallel. The forecaster is the panel
  * tier's standard grouped-series narrow map. */
object Foundation {

  /** Chronos quantization config. `nBins` defaults to the paper's 4094
    * value-token vocabulary; [low, high] is the paper's clipped
    * scaled-value support. */
  final case class ChronosCfg(nBins: Int = 4094, low: Double = -15.0,
      high: Double = 15.0) {
    require(nBins >= 2 && high > low)
    def width: Double = (high - low) / nBins
    def center(tok: Int): Double = low + (tok + 0.5) * width
    /** Scaled value → token id (clamped to the vocabulary). */
    def token(z: Double): Int = {
      val zc = math.min(high, math.max(low, z))
      math.min(nBins - 1, math.floor((zc - low) / width).toInt)
    }
  }

  /** Mean-absolute context scale with the Chronos degenerate-context
    * convention: an all-zero (or empty) context scales by 1. */
  def meanAbsScale(ys: Array[Double]): Double = {
    if (ys.isEmpty) return 1.0
    var s = 0.0
    var i = 0
    while (i < ys.length) { s += math.abs(ys(i)); i += 1 }
    val m = s / ys.length
    if (m > 0.0 && java.lang.Double.isFinite(m)) m else 1.0
  }

  /** Per-series round-6 mean-|y| scale as a window expression (rounded
    * so the token ids are engine-reproducible — summation-order ulps on
    * the un-rounded mean could flip a floor() boundary; after rounding
    * a flip needs the mean within an ulp of a 0.5e-6 edge, the repo's
    * accepted measure-zero class). */
  private def scaleCol(cfg: ChronosCfg)(implicit pc: PanelCols): Column = {
    // ordered unbounded frame, NOT pc.wAll: an unordered window sums in
    // partition-arrival order, which depends on the upstream physical
    // layout (the r12 scan-parallelism normalization flipped 49 recon
    // values at the 6-dp edge through exactly this). Summing in
    // (time, tieBreak) order is layout-independent and matches both the
    // oracle's file-order fold (events are time-ordered per series) and
    // the kernel's meanAbsScale walk. The sort is shared with the
    // row_number window in [[chronosTokenize]] — no extra exchange/sort.
    val m = round(avg(abs(pc.targetCol)).over(
      pc.w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)), 6)
    when(m > 0.0, m).otherwise(lit(1.0))
  }

  /** Clamp-and-bin token id from the target and a bound `scale`
    * column. A NULL measurement stays NULL — Spark's (and DuckDB's)
    * `greatest` IGNORES nulls, so without the explicit guard a missing
    * value would silently clamp to the extreme-low token 0 and
    * masquerade as a real observation in every pooled embedding. */
  private def tokenCol(cfg: ChronosCfg)(implicit pc: PanelCols): Column = {
    val z = least(lit(cfg.high),
      greatest(lit(cfg.low), pc.targetCol.cast("double") / col("scale")))
    when(pc.targetCol.isNull, lit(null))
      .otherwise(least(lit(cfg.nBins - 1),
        floor((z - cfg.low) / cfg.width)).cast("int"))
  }

  /** Chronos tokenization as a distributed pure-expression map: the
    * [[scaleCol]] window aggregate, then token/center arithmetic
    * inline. Output: (id, pos, token_id, scale, recon) where `recon`
    * is the de-tokenized (bin-center × scale) reconstruction. */
  def chronosTokenize(df: DataFrame, cfg: ChronosCfg = ChronosCfg())(
      implicit pc: PanelCols): DataFrame = {
    val ord = Window.partitionBy(pc.idCol)
      .orderBy((pc.timeCol +: pc.tieBreak.map(col)): _*)
    df.select((Seq(pc.idCol, pc.timeCol) ++ pc.tieBreak.map(col) :+
        pc.targetCol): _*)
      .withColumn("scale", scaleCol(cfg))
      .withColumn("pos", row_number().over(ord))
      .withColumn("token_id", tokenCol(cfg))
      .withColumn("recon",
        round((lit(cfg.low) + (col("token_id") + 0.5) * cfg.width) *
          col("scale") + 1e-9, 6))
      .select(pc.idCol, col("pos"), col("token_id"),
        round(col("scale"), 6).as("scale"), col("recon"))
  }

  /** De-tokenize a (id, pos, token_id, scale) frame back to values —
    * the inverse map, pure expressions. */
  def chronosDetokenize(tokens: DataFrame, cfg: ChronosCfg = ChronosCfg())(
      implicit pc: PanelCols): DataFrame =
    tokens.withColumn("value",
      (lit(cfg.low) + (col("token_id") + 0.5) * cfg.width) * col("scale"))

  // ================== series embeddings ==============================
  // (reference adapters/embeddings.py:47-127 to_chronos_embeddings,
  //  :130-193 to_moment_embeddings)

  /** Engine-side [[DetRng.uniform]] as a pure codegen expression over a
    * long counter column: bit-identical to the kernel and to
    * `StochOracle.uniformExpr`, so every draw replays in DuckDB. */
  private def unifCol(c: Column, seedC: Long): Column =
    shiftrightunsigned(
      graft.plans.Mix64((c * lit(16L) + lit(12L)).bitwiseXOR(lit(seedC))),
      11).cast("double") / lit(9007199254740992.0)

  /** Signed embedding-table entry in [−1, 1): row `c` of a deterministic
    * weight table, component drawn at counter `c` (no stored matrix —
    * the table IS the counter function, so executors need no broadcast
    * and the oracle needs no pins). */
  private def embEntry(c: Column, seedC: Long): Column =
    unifCol(c, seedC) * 2.0 - 1.0

  /** Chronos-style series embeddings (reference
    * `adapters/embeddings.py:47` `to_chronos_embeddings`): tokenize each
    * series with the REAL Chronos quantizer ([[chronosTokenize]] — the
    * part of the reference path that is engine arithmetic), then
    * mean-pool a per-token embedding over the sequence, exactly the
    * reference's `hidden.mean(dim=1)` pooling. The token embedding
    * table is the documented LOCAL SURROGATE for the pretrained T5
    * encoder (which cannot ship into a zero-egress JVM): a
    * deterministic counter-based random table — the same deviation
    * class as [[graft.ops.VisionEmbed]]'s random-weight CNN. Random
    * projections of token ids preserve token identity geometry
    * (Johnson–Lindenstrauss), so downstream clustering over these
    * embeddings still separates series by their quantized shape.
    *
    * Output: one row per series, `[id, emb_0 … emb_{dim−1}]` — the
    * reference's wide-column shape (`_arrays_to_result`).
    *
    * Scale: tokenization is the existing pure-expression map; pooling
    * is ONE hash aggregation with map-side combine carrying `dim`
    * doubles per group — no UDF, no broadcast, no driver step; the
    * whole plan stays inside whole-stage codegen ([[graft.plans.Mix64]]
    * is a native expression). */
  def chronosEmbed(df: DataFrame, dim: Int = 16, seed: Long = 7L,
      cfg: ChronosCfg = ChronosCfg(),
      weights: Option[DataFrame] = None)(implicit pc: PanelCols): DataFrame = {
    require(dim >= 1 && dim <= 4096, s"dim must be in [1, 4096], got $dim")
    // slim tokenize: the pool is order-independent, so skip
    // chronosTokenize's per-series row_number (and recon column) — this
    // path is scale window + bin arithmetic + ONE hash aggregate. The
    // time/tieBreak columns ride along (dropped by the groupBy) because
    // scaleCol folds |y| in time order for layout independence.
    val base = df.select(
        (Seq(pc.idCol, pc.timeCol) ++ pc.tieBreak.map(col) :+ pc.targetCol): _*)
      .withColumn("scale", scaleCol(cfg))
      .withColumn("token_id", tokenCol(cfg))
    weights match {
      case None =>
        val seedC = DetRng.seedConst(seed)
        val ctrBase = col("token_id").cast("long") * dim
        val aggs = (0 until dim).map { j =>
          round(avg(embEntry(ctrBase + j, seedC)), 6).as(s"emb_$j")
        }
        base.groupBy(pc.idCol).agg(aggs.head, aggs.tail: _*)
      case Some(w) =>
        // REAL-weights hook (closes the checkpoint honesty gap without
        // egress): `w` is a token-embedding table (row = token_id,
        // vec = dim doubles) loaded from a LOCAL file — e.g. a published
        // Chronos encoder's token embeddings exported to plain parquet
        // via [[loadTensorTable]]. Plan shape is unchanged except the
        // counter-function table becomes a broadcast-joined real one;
        // a token with no row (or a short vector) fails loudly rather
        // than silently pooling nulls. The assert valve below catches a
        // PARTIAL table per-row; a fully EMPTY table is caught here —
        // empty-relation propagation would constant-fold the left join
        // (and the valve with it) into silent all-null embeddings.
        require(!w.isEmpty, "chronosEmbed: empty weight table")
        val tbl = broadcast(w.select(col("row").cast("long").as("__wrow"),
          col("vec").cast("array<double>").as("__wvec")))
        val vec = when(assert_true(
          col("__wvec").isNotNull && size(col("__wvec")) === dim,
          concat(lit(s"chronosEmbed: weight table row missing or not dim=$dim for token_id "),
            col("token_id").cast("string"))).isNull, col("__wvec"))
        val aggs = (0 until dim).map { j =>
          round(avg(element_at(vec, j + 1)), 6).as(s"emb_$j")
        }
        base.join(tbl, col("token_id").cast("long") === col("__wrow"), "left")
          .groupBy(pc.idCol).agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Reads a local plain-parquet tensor store — rows `(name: string,
    * row: long, vec: array<double>)` — and returns the `(row, vec)`
    * table for one named tensor. The no-egress weight-loading hook: a
    * user exports a published checkpoint's tensors to this layout once
    * (any tool that writes parquet) and [[chronosEmbed]] /
    * [[momentEmbed]] consume them in place of the DetRng surrogate. */
  def loadTensorTable(spark: org.apache.spark.sql.SparkSession,
      path: String, name: String): DataFrame =
    spark.read.parquet(path).filter(col("name") === name)
      .select(col("row"), col("vec"))

  /** MOMENT-style series embeddings (reference
    * `adapters/embeddings.py:130` `to_moment_embeddings`): instance-
    * normalize each series (RevIN's (y−μ)/σ, Goswami et al. 2024
    * arXiv:2402.03885 §3), patchify into length-`patchLen` patches,
    * linearly project each patch through a deterministic weight table,
    * squash, and mean-pool over patches — the MOMENT embedding pipeline
    * with the pretrained transformer trunk replaced by the documented
    * local-surrogate projection (same honesty boundary as
    * [[chronosEmbed]]).
    *
    * Two deliberate deviations from the torch wrapper, both stated:
    * (1) no zero-padding to a batch-wide max length — padding is an
    * artifact of rectangular tensor batching; a dataflow engine pools
    * over each series' REAL patches (a trailing partial patch sums only
    * its real elements, which equals zero-padding within that patch);
    * (2) the squash is softsign z/(1+|z|), not tanh — arithmetic-only,
    * so the JVM and DuckDB produce bit-identical values (libm tanh
    * differs across runtimes by ulps; the engine's RNG discipline keeps
    * every nonlinearity exactly replayable).
    *
    * Scale: two chained hash aggregations — (id, patch) then (id) —
    * each map-side combined with `dim` doubles of state; μ/σ come from
    * one per-series window (rounded 6dp so both engines bin
    * identically). No UDF, no broadcast, no driver step. */
  def momentEmbed(df: DataFrame, dim: Int = 8, patchLen: Int = 8,
      seed: Long = 11L,
      weights: Option[DataFrame] = None)(implicit pc: PanelCols): DataFrame = {
    require(dim >= 1 && dim <= 4096, s"dim must be in [1, 4096], got $dim")
    require(patchLen >= 1, s"patchLen must be >= 1, got $patchLen")
    val seedC = DetRng.seedConst(seed)
    val mu = round(avg(pc.targetCol).over(pc.wAll), 6)
    val sd = round(coalesce(stddev(pc.targetCol).over(pc.wAll),
      lit(0.0)), 6)
    val base0 = df
      .withColumn("__pos", row_number().over(pc.w) - 1)
      .withColumn("__z", (pc.targetCol.cast("double") - mu) /
        when(sd > 0.0, sd).otherwise(lit(1.0)))
      .withColumn("__p", floor(col("__pos") / patchLen))
      .withColumn("__k", pmod(col("__pos"), lit(patchLen)).cast("long"))
    // patch-projection entry (k, j): the DetRng surrogate table, or —
    // via the same no-egress hook as [[chronosEmbed]] — a REAL projection
    // loaded from a local tensor file (row = in-patch position k,
    // vec = dim doubles), broadcast-joined (patchLen rows)
    val (base, entry): (DataFrame, Int => Column) = weights match {
      case None =>
        (base0, j => embEntry(col("__k") * dim + j, seedC))
      case Some(w) =>
        require(!w.isEmpty, "momentEmbed: empty weight table")
        val tbl = broadcast(w.select(col("row").cast("long").as("__wrow"),
          col("vec").cast("array<double>").as("__wvec")))
        val vec = when(assert_true(
          col("__wvec").isNotNull && size(col("__wvec")) === dim,
          concat(lit(s"momentEmbed: weight table row missing or not dim=$dim for patch position "),
            col("__k").cast("string"))).isNull, col("__wvec"))
        (base0.join(tbl, col("__k") === col("__wrow"), "left"),
          j => element_at(vec, j + 1))
    }
    val patchAggs = (0 until dim).map { j =>
      sum(col("__z") * entry(j)).as(s"__s_$j")
    }
    val softsign = (0 until dim).map { j =>
      val s = col(s"__s_$j")
      round(avg(s / (lit(1.0) + abs(s))), 6).as(s"emb_$j")
    }
    base.groupBy(pc.idCol, col("__p"))
      .agg(patchAggs.head, patchAggs.tail: _*)
      .groupBy(pc.idCol).agg(softsign.head, softsign.tail: _*)
  }

  // ================== sample-path forecaster =========================

  final case class ChronosForecastCfg(
      h: Int = 12,
      numSamples: Int = 20,
      coverage: Double = 0.9,
      quant: ChronosCfg = ChronosCfg(nBins = 64),
      seed: Long = 42L) {
    require(numSamples >= 1 && coverage > 0 && coverage < 1 && h >= 1)
  }

  /** np.quantile linear interpolation over an UNSORTED sample array
    * (sorted copy inside): lo + frac·(hi − lo) at rank (n−1)·q. */
  def npQuantile(xs: Array[Double], q: Double): Double = {
    val s = xs.sorted
    val r = (s.length - 1) * q
    val lo = math.floor(r).toInt
    val hi = math.min(lo + 1, s.length - 1)
    s(lo) + (r - lo) * (s(hi) - s(lo))
  }

  /** Per-series token-space sampler: context-fitted bigram counts, h
    * autoregressive steps × numSamples paths, counter-based inverse-CDF
    * draws. A previous token with no observed outgoing transition backs
    * off to the context's unigram distribution USING THE SAME DRAW.
    * Returns (h, 3): y_hat (median), lower, upper — the reference's
    * sample-path assembly — in RAW scale. */
  def chronosSample(ys: Array[Double], cfg: ChronosForecastCfg): Array[Array[Double]] = {
    val q = cfg.quant
    val seedC = DetRng.seedConst(cfg.seed)
    val s = meanAbsScale(ys)
    val toks = ys.map(v => q.token(v / s))
    // ascending-token CDF tables from the context
    val uni = toks.groupBy(identity).toArray.sortBy(_._1)
      .map { case (t, a) => (t, a.length.toLong) }
    val uniTot = toks.length.toDouble
    val trans: Map[Int, (Array[(Int, Long)], Double)] =
      toks.dropRight(1).zip(toks.drop(1))
        .groupBy(_._1)
        .map { case (p, pairs) =>
          val cdf = pairs.groupBy(_._2).toArray.sortBy(_._1)
            .map { case (n, a) => (n, a.length.toLong) }
          p -> (cdf, cdf.map(_._2).sum.toDouble)
        }
    // first ascending token whose cumulative fraction reaches u (the
    // last token catches u unconditionally: its fraction is 1)
    def pick(cdf: Array[(Int, Long)], tot: Double, u: Double): Int = {
      var cum = 0L
      var i = 0
      while (i < cdf.length - 1 && (cum + cdf(i)._2).toDouble / tot < u) {
        cum += cdf(i)._2; i += 1
      }
      cdf(i)._1
    }
    val paths = Array.ofDim[Double](cfg.numSamples, cfg.h)
    var k = 0
    while (k < cfg.numSamples) {
      var prev = toks.last
      var j = 0
      while (j < cfg.h) {
        val u = DetRng.uniform(seedC, DetRng.ctr(55, j.toLong + 1, k.toLong))
        val next = trans.get(prev) match {
          case Some((cdf, tot)) => pick(cdf, tot, u)
          case None => pick(uni, uniTot, u)
        }
        paths(k)(j) = q.center(next) * s
        prev = next
        j += 1
      }
      k += 1
    }
    val alpha = (1 - cfg.coverage) / 2
    Array.tabulate(cfg.h) { j =>
      val col0 = Array.tabulate(cfg.numSamples)(k0 => paths(k0)(j))
      Array(npQuantile(col0, 0.5), npQuantile(col0, alpha),
        npQuantile(col0, 1 - alpha))
    }
  }

  /** Chronos-style forecast over the panel: grouped series → per-series
    * token sampler (narrow map) → future-date scaffold. Output:
    * (id, step, ds, y_hat, y_hat_lower, y_hat_upper). */
  def chronosForecast(df: DataFrame, cfg: ChronosForecastCfg = ChronosForecastCfg())(
      implicit pc: PanelCols): DataFrame = {
    val fcUdf = udf((ys: Seq[Double]) =>
      chronosSample(ys.toArray, cfg).map(_.toSeq).toSeq)
    DeepForecast.stepScaffoldCols(df, cfg.h, fcUdf,
      Seq("y_hat", "y_hat_lower", "y_hat_upper"))
  }

  /** Point-forecast adapter shaped like the reference's TimesFM wrapper
    * (context-length truncation, y_hat only): the backbone slot is the
    * engine's locally trained PatchTST — a LOCAL SURROGATE, documented;
    * the pretrained TimesFM checkpoint is out of engine scope. */
  def timesFmStyleForecast(df: DataFrame, contextLength: Int,
      cfg: graft.kernels.Transformer.PatchCfg)(
      implicit pc: PanelCols): DataFrame = {
    require(contextLength >= cfg.inputSize,
      s"contextLength ($contextLength) must cover inputSize (${cfg.inputSize})")
    val fit = graft.kernels.Transformer.patchFit(
      DeepClustering.collectSeries(df).map(_._2.takeRight(contextLength)), cfg)
    val bc = df.sparkSession.sparkContext.broadcast(fit)
    val fcUdf = udf((ys: Seq[Double]) => graft.kernels.Transformer
      .patchForward(bc.value, ys.toArray.takeRight(contextLength)).toSeq)
    DeepForecast.stepScaffold(df, cfg.h, fcUdf)
  }

  /** Unified dispatcher (reference foundation_forecast.py:371-408):
    * model-family aliases route to the engine's local pipelines;
    * unknown families fail loudly with the supported list. */
  def foundationForecast(df: DataFrame, model: String, h: Int,
      numSamples: Int = 20, coverage: Double = 0.9,
      contextLength: Int = 512)(implicit pc: PanelCols): DataFrame =
    model.toLowerCase match {
      case "chronos" | "chronos-2" =>
        chronosForecast(df, ChronosForecastCfg(h = h,
          numSamples = numSamples, coverage = coverage))
      case "moirai" | "moirai-2" =>
        // same sample-path assembly contract; distinct draw stream
        chronosForecast(df, ChronosForecastCfg(h = h,
          numSamples = numSamples, coverage = coverage, seed = 43L))
      case "timesfm" =>
        timesFmStyleForecast(df, contextLength,
          graft.kernels.Transformer.PatchCfg(h = h,
            inputSize = math.min(contextLength, 32), patchLen = 8,
            dModel = 8, nHeads = 2, nLayers = 1, maxEpochs = 8))
      case other => throw new IllegalArgumentException(
        s"Unknown model '$other'. Supported: chronos, chronos-2, " +
          "moirai, moirai-2, timesfm")
    }
}
