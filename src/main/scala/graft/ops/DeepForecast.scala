package graft.ops

import graft.core.{Panel, PanelCols}
import graft.kernels.NBeats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deep panel forecasters (reference `polars_ts/dl/`): N-BEATS here;
  * PatchTST / iTransformer in [[Transformer]]-backed ops. Fit trains
  * once on pooled sliding windows from a bounded driver sample (a
  * GLOBAL model — one network forecasts every series, the
  * Nixtla-style global-forecasting regime the reference follows);
  * predict broadcasts the weights and maps each series' last window
  * through the network — one grouped-panel shuffle, then narrow. */
object DeepForecast {

  /** N-BEATS fit + distributed forecast: `[id, step, ds, y_hat]` on the
    * repo's futureDates scaffold (reference dl/nbeats.py:202-295). */
  def nbeatsForecastFull(df: DataFrame, cfg: NBeats.Cfg)(
      implicit pc: PanelCols): (DataFrame, NBeats.Fit) = {
    val fit = NBeats.fit(DeepClustering.collectSeries(df).map(_._2), cfg)
    (forecastWith(df, fit), fit)
  }

  def nbeatsForecast(df: DataFrame, cfg: NBeats.Cfg)(
      implicit pc: PanelCols): DataFrame = nbeatsForecastFull(df, cfg)._1

  /** Broadcast-fit per-series forward: context window → h forecasts,
    * joined to the future-date scaffold. */
  private[graft] def forecastWith(df: DataFrame, fit: NBeats.Fit)(
      implicit pc: PanelCols): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(fit)
    val fcUdf = udf((ys: Seq[Double]) => NBeats.forward(bc.value, ys.toArray).toSeq)
    stepScaffold(df, fit.h, fcUdf)
  }

  private[ops] def stepScaffold(df: DataFrame, h: Int,
      fcUdf: org.apache.spark.sql.expressions.UserDefinedFunction)(
      implicit pc: PanelCols): DataFrame = {
    val fc = Panel.grouped(df).select(pc.idCol.as(pc.id), col("ys"))
      .select(col(pc.id), posexplode(fcUdf(col("ys"))).as(Seq("__p", "__v")))
      .select(col(pc.id), (col("__p") + 1).cast("long").as("step"),
        round(col("__v") + lit(1e-9), 6).as("y_hat"))
    Panel.futureDates(df, h).join(fc, Seq(pc.id, "step"))
      .select(pc.idCol, col("step"), col(pc.time), col("y_hat"))
  }

  /** Multi-column variant of [[stepScaffold]] for forecasters whose
    * per-step output is a vector (e.g. median + interval bounds): the
    * UDF returns h rows of `outCols.length` values each. Same grouped →
    * posexplode → future-date join skeleton, one definition. */
  private[ops] def stepScaffoldCols(df: DataFrame, h: Int,
      fcUdf: org.apache.spark.sql.expressions.UserDefinedFunction,
      outCols: Seq[String])(implicit pc: PanelCols): DataFrame = {
    val named = outCols.zipWithIndex.map { case (n, i) =>
      round(col("__v").getItem(i) + lit(1e-9), 6).as(n)
    }
    val fc = Panel.grouped(df).select(pc.idCol.as(pc.id), col("ys"))
      .select(col(pc.id), posexplode(fcUdf(col("ys"))).as(Seq("__p", "__v")))
      .select(col(pc.id) +: (col("__p") + 1).cast("long").as("step") +:
        named: _*)
    Panel.futureDates(df, h).join(fc, Seq(pc.id, "step"))
      .select(pc.idCol +: col("step") +: col(pc.time) +:
        outCols.map(col): _*)
  }

  /** PatchTST fit + distributed forecast (reference dl/patchtst.py:
    * 104-266): same global-model regime and output scaffold as
    * [[nbeatsForecastFull]]. */
  def patchTstForecastFull(df: DataFrame, cfg: graft.kernels.Transformer.PatchCfg)(
      implicit pc: PanelCols): (DataFrame, graft.kernels.Transformer.PatchFit) = {
    val fit = graft.kernels.Transformer.patchFit(
      DeepClustering.collectSeries(df).map(_._2), cfg)
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(fit)
    val fcUdf = udf((ys: Seq[Double]) =>
      graft.kernels.Transformer.patchForward(bc.value, ys.toArray).toSeq)
    (stepScaffold(df, fit.h, fcUdf), fit)
  }

  def patchTstForecast(df: DataFrame, cfg: graft.kernels.Transformer.PatchCfg)(
      implicit pc: PanelCols): DataFrame = patchTstForecastFull(df, cfg)._1

  /** Time-LLM fit + distributed forecast (reference
    * adapters/llm_forecast.py:163-286): patch → cross-attention with
    * learned prototypes → MLP decoder. Same global-model regime and
    * output scaffold as [[nbeatsForecastFull]]; per-series per-window
    * normalization happens inside the broadcast forward. */
  def timeLlmForecastFull(df: DataFrame, cfg: graft.kernels.TimeLlm.Cfg)(
      implicit pc: PanelCols): (DataFrame, graft.kernels.TimeLlm.Fit) = {
    val fit = graft.kernels.TimeLlm.fit(
      DeepClustering.collectSeries(df).map(_._2), cfg)
    val bc = df.sparkSession.sparkContext.broadcast(fit)
    val fcUdf = udf((ys: Seq[Double]) =>
      graft.kernels.TimeLlm.forward(bc.value, ys.toArray).toSeq)
    (stepScaffold(df, fit.h, fcUdf), fit)
  }

  def timeLlmForecast(df: DataFrame, cfg: graft.kernels.TimeLlm.Cfg)(
      implicit pc: PanelCols): DataFrame = timeLlmForecastFull(df, cfg)._1

  /** LLM-PS fit + distributed forecast (reference
    * adapters/llm_forecast.py:294-407): multi-scale conv pattern
    * extraction → MLP decoder, same scaffold as [[timeLlmForecastFull]]. */
  def llmPsForecastFull(df: DataFrame, cfg: graft.kernels.LlmPs.Cfg)(
      implicit pc: PanelCols): (DataFrame, graft.kernels.LlmPs.Fit) = {
    val fit = graft.kernels.LlmPs.fit(
      DeepClustering.collectSeries(df).map(_._2), cfg)
    val bc = df.sparkSession.sparkContext.broadcast(fit)
    val fcUdf = udf((ys: Seq[Double]) =>
      graft.kernels.LlmPs.forward(bc.value, ys.toArray).toSeq)
    (stepScaffold(df, fit.h, fcUdf), fit)
  }

  def llmPsForecast(df: DataFrame, cfg: graft.kernels.LlmPs.Cfg)(
      implicit pc: PanelCols): DataFrame = llmPsForecastFull(df, cfg)._1

  /** Global hourly multivariate series: pivot `event_type` → one
    * (nHours, V) matrix with sorted variable names and hour epochs. The
    * pivot aggregation is fully distributed; only the tiny pivoted
    * series (≤ hours × V doubles) reaches the driver. */
  def mvSeries(df: DataFrame)(implicit pc: PanelCols)
      : (Array[String], Array[Array[Double]], Array[Long]) = {
    val wide = df.groupBy(date_trunc("hour", pc.timeCol).as("__hh"))
      .pivot("event_type").agg(avg(pc.targetCol)).na.fill(0.0)
    val names = wide.columns.filter(_ != "__hh").sorted
    val rows = wide.orderBy(col("__hh"))
      .select(unix_micros(col("__hh").cast("timestamp")).as("__us") +:
        names.map(n => col(n).cast("double")): _*)
      .collect()
    val mat = rows.map(r => Array.tabulate(names.length)(v => r.getDouble(v + 1)))
    val us = rows.map(_.getLong(0))
    (names, mat, us)
  }

  /** Multivariate transformer forecast (reference dl/multivariate.py:
    * 250-523): kind ∈ {"mvpatch", "itransformer"}. One global series →
    * h rows of per-variable forecasts `[user_id='events', step, ts,
    * <var>_hat...]`. */
  def mvTransformerForecastFull(df: DataFrame,
      cfg: graft.kernels.Transformer.MvCfg, kind: String)(implicit pc: PanelCols)
      : (DataFrame, graft.kernels.Transformer.MvFit, Array[String]) = {
    val spark = df.sparkSession
    val (names, mat, us) = mvSeries(df)
    val fit = graft.kernels.Transformer.mvFit(Seq(mat), cfg, kind)
    val fc = graft.kernels.Transformer.mvForward(fit, mat)
    val lastUs = us.max
    val freq = us.sorted.sliding(2).map(p => p(1) - p(0)).min
    import spark.implicits._
    val rows = (1 to fit.h).map(step =>
      (("events", step.toLong, lastUs + step * freq), fc(step - 1)))
    val base = rows.map { case ((id, step, t), vs) => (id, step, t, vs.toSeq) }
      .toDF(pc.id, "step", "__us", "__vs")
    val out = base.select(col(pc.id) +: col("step") +:
      timestamp_micros(col("__us")).cast("timestamp_ntz").as(pc.time) +:
      names.zipWithIndex.map { case (n, v) =>
        round(element_at(col("__vs"), v + 1) + lit(1e-9), 6).as(s"${n}_hat")
      }: _*)
    (out, fit, names)
  }

  def mvPatchTstForecast(df: DataFrame, cfg: graft.kernels.Transformer.MvCfg)(
      implicit pc: PanelCols): DataFrame =
    mvTransformerForecastFull(df, cfg, "mvpatch")._1

  def iTransformerForecast(df: DataFrame, cfg: graft.kernels.Transformer.MvCfg)(
      implicit pc: PanelCols): DataFrame =
    mvTransformerForecastFull(df, cfg, "itransformer")._1
}
