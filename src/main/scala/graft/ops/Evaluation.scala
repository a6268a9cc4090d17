package graft.ops

import graft.core.PanelCols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bias diagnostics/correction, calibration tables, weighted ensembles,
  * and k-NN classification — the reference's evaluation tier
  * (polars_ts/bias.py, calibration.py, ensemble/weighted.py,
  * classification/knn.py). All pure Spark SQL.
  */
object Evaluation {

  /** Per-series bias stats on (y, yhat): mean_error, sign_ratio (share of
    * over-predictions), bias_ratio (mean yhat / mean y)
    * (reference bias.py:9-80). */
  def biasDetect(df: DataFrame, yCol: String, yhatCol: String)(
      implicit pc: PanelCols): DataFrame = {
    val y = col(yCol); val yhat = col(yhatCol)
    df.groupBy(pc.idCol).agg(
      avg(yhat - y).as("mean_error"),
      avg(when(yhat > y, 1.0).otherwise(0.0)).as("sign_ratio"),
      (avg(yhat) / avg(y)).as("bias_ratio"))
  }

  /** Mean-bias correction: yhat − mean_error per series (bias.py:82-120). */
  def biasCorrectMean(df: DataFrame, yCol: String, yhatCol: String)(
      implicit pc: PanelCols): DataFrame =
    df.withColumn(yhatCol + "_corrected",
      col(yhatCol) - avg(col(yhatCol) - col(yCol)).over(pc.wAll))

  /** Calibration table: empirical coverage of `y <= q_c` per quantile
    * column vs its nominal level (reference calibration.py:9-80).
    * quantileCols maps column name → nominal level. */
  def calibrationTable(df: DataFrame, yCol: String,
      quantileCols: Map[String, Double]): DataFrame = {
    val rows = quantileCols.toSeq.sortBy(_._2).map { case (c, level) =>
      df.agg(
        lit(level).as("nominal"),
        avg(when(col(yCol) <= col(c), 1.0).otherwise(0.0)).as("empirical"))
    }
    rows.reduce(_ unionByName _)
  }

  /** PIT histogram (reference calibration.py:51-105): per row, the PIT
    * value is the fraction of quantile forecasts ≤ actual; binned into
    * `nBins` equal bins over [0,1] (last bin right-inclusive). Output:
    * `[bin_lower, bin_upper, count, density]` including empty bins. */
  def pitHistogram(df: DataFrame, yCol: String, quantileCols: Seq[String],
      nBins: Int = 10): DataFrame = {
    require(quantileCols.nonEmpty, "need at least one quantile column")
    val spark = df.sparkSession
    val pit = quantileCols.map(q =>
      when(col(q) <= col(yCol), 1.0).otherwise(0.0)).reduce(_ + _) /
      lit(quantileCols.size.toDouble)
    val binned = df.withColumn("__bin",
        least(floor(pit * nBins), lit(nBins - 1)).cast("long"))
      .groupBy(col("__bin")).agg(count(lit(1)).as("__c"))
    val total = df.count().toDouble
    spark.range(nBins.toLong).select(col("id").as("__bin"))
      .join(binned, Seq("__bin"), "left")
      .select(
        (col("__bin") / nBins).cast("double").as("bin_lower"),
        ((col("__bin") + 1) / nBins).cast("double").as("bin_upper"),
        coalesce(col("__c"), lit(0L)).cast("double").as("count"),
        (coalesce(col("__c"), lit(0L)) / lit(math.max(total, 1.0))).as("density"))
  }

  /** Reliability diagram data (reference calibration.py:107-138):
    * `[expected, observed]` — the calibration table reshaped for plotting. */
  def reliabilityDiagram(df: DataFrame, yCol: String,
      quantileCols: Map[String, Double]): DataFrame =
    calibrationTable(df, yCol, quantileCols)
      .select(col("nominal").as("expected"), col("empirical").as("observed"))

  /** Combine k forecast frames on (id, time): equal or explicit weights
    * (reference ensemble/weighted.py:12-165). Each frame contributes its
    * `yhatCol`; output replaces it with the weighted combination. */
  def weightedEnsemble(frames: Seq[DataFrame], yhatCol: String,
      weights: Option[Seq[Double]] = None)(implicit pc: PanelCols): DataFrame = {
    require(frames.nonEmpty, "need at least one frame")
    val w = weights.getOrElse(Seq.fill(frames.size)(1.0 / frames.size))
    require(w.size == frames.size, "one weight per frame")
    val keyed = frames.zipWithIndex.map { case (f, i) =>
      f.select(pc.idCol, pc.timeCol, (col(yhatCol) * w(i)).as(s"__c$i"))
    }
    val joined = keyed.reduce((a, b) => a.join(b, Seq(pc.id, pc.time)))
    joined.withColumn(yhatCol,
        frames.indices.map(i => col(s"__c$i")).reduce(_ + _))
      .select(pc.idCol, pc.timeCol, col(yhatCol))
  }

  /** Majority-vote k-NN classification over a pairwise distance (or
    * similarity) table `[query_id, neighbor_id, score]` joined to labels
    * (reference classification/knn.py:13-165, vote tie → smallest label).
    * `ascending=true` for distances, false for similarities. */
  def knnClassify(pairs: DataFrame, labels: DataFrame, k: Int,
      scoreCol: String = "score", labelCol: String = "label",
      ascending: Boolean = true): DataFrame = {
    val ord = if (ascending) col(scoreCol).asc else col(scoreCol).desc
    val topk = pairs
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(ord, col("neighbor_id"))))
      .filter(col("__rk") <= k)
      .join(labels.select(col("vec_id").as("neighbor_id"), col(labelCol)), Seq("neighbor_id"))
    topk.groupBy(col("query_id"), col(labelCol))
      .agg(count(lit(1)).as("__votes"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("__votes").desc, col(labelCol).asc)))
      .filter(col("__rk") === 1)
      .select(col("query_id"), col(labelCol).as("predicted_label"), col("__votes").as("votes"))
  }
}
