package graft.ops

import graft.core.PanelCols
import graft.kernels.Cluster
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Panel clustering: distributed pairwise distances → small n×n matrix on
  * the driver → label table back as a DataFrame (reference §2.12 operates
  * the same way single-node; n = series count, not row count).
  */
object Clustering {

  /** Collect a symmetric distance matrix from an upper-triangle pair table
    * `[id_1, id_2, metricCol]`. Returns (sorted ids, matrix). */
  def collectMatrix(pairs: DataFrame, metricCol: String): (Array[String], Array[Array[Double]]) = {
    val rows = pairs.select(col("id_1").cast("string"), col("id_2").cast("string"),
      col(metricCol).cast("double")).collect()
    val ids = rows.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val n = ids.length
    val m = Array.fill(n, n)(0.0)
    rows.foreach { r =>
      val i = idx(r.getString(0)); val j = idx(r.getString(1)); val d = r.getDouble(2)
      m(i)(j) = d; m(j)(i) = d
    }
    (ids, m)
  }

  private def labelFrame(df: DataFrame, ids: Array[String], labels: Array[Int])(
      implicit pc: PanelCols): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ids.zip(labels).toSeq.toDF("__id_str", "cluster")
      .join(df.select(pc.idCol).distinct()
        .withColumn("__id_str", pc.idCol.cast("string")), Seq("__id_str"))
      .select(pc.idCol, col("cluster"))
  }

  /** K-medoids (PAM) labels `[id, cluster]` over any pairwise metric. */
  def kmedoids(df: DataFrame, k: Int, metric: String = "dtw",
      params: Map[String, Double] = Map.empty, seed: Long = 42L)(
      implicit pc: PanelCols): DataFrame = {
    val (ids, m) = collectMatrix(Distances.pairwise(df, metric, params), metric)
    val (labels, _) = Cluster.pam(m, k, seed)
    labelFrame(df, ids, labels)
  }

  /** DBSCAN labels (−1 = noise). */
  def dbscanCluster(df: DataFrame, eps: Double, minPts: Int,
      metric: String = "dtw", params: Map[String, Double] = Map.empty)(
      implicit pc: PanelCols): DataFrame = {
    val (ids, m) = collectMatrix(Distances.pairwise(df, metric, params), metric)
    labelFrame(df, ids, Cluster.dbscan(m, eps, minPts))
  }

  /** Agglomerative labels cut at k. */
  def agglomerativeCluster(df: DataFrame, k: Int, linkage: String = "average",
      metric: String = "dtw", params: Map[String, Double] = Map.empty)(
      implicit pc: PanelCols): DataFrame = {
    val (ids, m) = collectMatrix(Distances.pairwise(df, metric, params), metric)
    labelFrame(df, ids, Cluster.agglomerative(m, k, linkage))
  }

  /** Clustering quality summary `[method, k, silhouette, davies_bouldin]`
    * for a fitted labeling (reference clustering/evaluation.py). */
  def evaluate(df: DataFrame, labelsDf: DataFrame, metric: String = "dtw",
      params: Map[String, Double] = Map.empty)(implicit pc: PanelCols): DataFrame = {
    val (ids, m) = collectMatrix(Distances.pairwise(df, metric, params), metric)
    val lmap = labelsDf.select(pc.idCol.cast("string"), col("cluster"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val labels = ids.map(lmap.getOrElse(_, -1))
    val spark = df.sparkSession
    import spark.implicits._
    Seq((Cluster.silhouette(m, labels), Cluster.daviesBouldin(m, labels)))
      .toDF("silhouette", "davies_bouldin")
  }
}
