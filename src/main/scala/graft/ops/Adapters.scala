package graft.ops

import graft.core.{Panel, PanelCols}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frame-conversion adapters (reference polars_ts/adapters/huggingface.py:
  * `to_hf_dataset` — one row per series with the target as a list, the
  * format foundation time-series models consume). The external-model
  * integrations themselves (Chronos/TimesFM/torch bridges) are
  * environment-dependent and descoped; the conversion surface is the
  * portable part. */
object Adapters {

  /** Long panel → one nested row per series:
    * `[id (string), target array<double>, ts array, start (string)]`. */
  def toSeriesDataset(df: DataFrame)(implicit pc: PanelCols): DataFrame =
    Panel.grouped(df)
      .select(pc.idCol.cast("string").as("id"),
        col("ys").as("target"), col("ts"),
        date_format(element_at(col("ts"), 1), "yyyy-MM-dd HH:mm:ss").as("start"))

  /** Inverse: nested series rows → long panel `[id, ds, y]`. */
  def fromSeriesDataset(ds: DataFrame)(implicit pc: PanelCols): DataFrame =
    ds.select(col("id").as(pc.id),
        posexplode(arrays_zip(col("ts"), col("target"))).as(Seq("__i", "__s")))
      .select(pc.idCol, col("__s.ts").as(pc.time), col("__s.target").as(pc.target))
}
