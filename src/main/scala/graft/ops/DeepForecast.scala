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
  private[ops] def forecastWith(df: DataFrame, fit: NBeats.Fit)(
      implicit pc: PanelCols): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(fit)
    val fcUdf = udf((ys: Seq[Double]) => NBeats.forward(bc.value, ys.toArray).toSeq)
    val fc = Panel.grouped(df).select(pc.idCol.as(pc.id), col("ys"))
      .select(col(pc.id), posexplode(fcUdf(col("ys"))).as(Seq("__p", "__v")))
      .select(col(pc.id), (col("__p") + 1).cast("long").as("step"),
        round(col("__v") + lit(1e-9), 6).as("y_hat"))
    Panel.futureDates(df, fit.h).join(fc, Seq(pc.id, "step"))
      .select(pc.idCol, col("step"), col(pc.time), col("y_hat"))
  }
}
