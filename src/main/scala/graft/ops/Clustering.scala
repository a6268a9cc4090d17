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

  /** Distributed k-Shape (reference clustering/kshape.py:9-160): z-norm,
    * SBD assignment and alignment run on executors; only the k per-cluster
    * len×len Gram matrices (for the dominant-eigenvector centroid) ever
    * reach the driver — the raw series never do, so the algorithm scales
    * with the number of series, bounded by len², not n·len.
    *
    * Per iteration: broadcast k centroids → assignment UDF → one
    * treeAggregate of Σ alignedᵢ·alignedᵢᵀ + Σ alignedᵢ per cluster →
    * driver power-iteration on the k small matrices. Deterministic init:
    * the first k series by id. */
  def kshapeCluster(df: DataFrame, k: Int, maxIter: Int = 20)(
      implicit pc: PanelCols): DataFrame = {
    val spark = df.sparkSession
    val g = graft.core.Panel.grouped(df).select(pc.idCol.as("__id"), col("ys"))
    val minLen = g.agg(min(size(col("ys")))).head().getInt(0)
    val zUdf = udf((ys: Seq[Double]) => Cluster.zNorm(ys.toArray.take(minLen)))
    val z = g.select(col("__id"), zUdf(col("ys")).as("__z")).cache()
    var centroids = z.orderBy(col("__id")).limit(k).collect()
      .map(_.getSeq[Double](1).toArray)
    var labels: DataFrame = null
    var it = 0
    var changed = true
    while (it < maxIter && changed) {
      val bc = spark.sparkContext.broadcast(centroids)
      val assignUdf = udf((zs: Seq[Double]) => {
        val arr = zs.toArray
        val cs = bc.value
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < cs.length) {
          val d = graft.kernels.Elastic.sbd(arr, cs(c))
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        best
      })
      val newLabels = z.withColumn("cluster", assignUdf(col("__z"))).cache()
      newLabels.count() // materialize before comparing / aggregating
      changed = labels == null ||
        newLabels.as("a").join(labels.as("b"), "__id")
          .filter(col("a.cluster") =!= col("b.cluster")).limit(1).count() > 0
      if (labels != null) labels.unpersist()
      labels = newLabels
      if (changed) {
        val len = minLen
        val kk = k
        // per-cluster Gram (len²) + mean (len) + count, combined map-side:
        // the shuffle is k·(len²+len) doubles per partition, never a series
        val zero = (Array.ofDim[Double](kk, len * len),
          Array.ofDim[Double](kk, len), new Array[Long](kk))
        val (gram, sums, counts) = newLabels.select(col("cluster"), col("__z"))
          .rdd.treeAggregate(zero)(
            { case ((m, s, cnt), row) =>
              val c = row.getInt(0)
              val a = Cluster.alignTo(bc.value(c), row.getSeq[Double](1).toArray)
              var i = 0
              while (i < len) {
                val ai = a(i); val base = i * len
                var j = 0
                while (j < len) { m(c)(base + j) += ai * a(j); j += 1 }
                s(c)(i) += ai
                i += 1
              }
              cnt(c) += 1
              (m, s, cnt)
            },
            { case ((m1, s1, c1), (m2, s2, c2)) =>
              var c = 0
              while (c < kk) {
                var i = 0
                while (i < len * len) { m1(c)(i) += m2(c)(i); i += 1 }
                i = 0
                while (i < len) { s1(c)(i) += s2(c)(i); i += 1 }
                c1(c) += c2(c)
                c += 1
              }
              (m1, s1, c1)
            })
        centroids = Array.tabulate(kk) { c =>
          if (counts(c) == 0) centroids(c)
          else {
            val m = gram(c)
            var v = centroids(c).clone()
            if (v.forall(_ == 0.0)) v = Array.fill(len)(1.0 / math.sqrt(len.toDouble))
            var p = 0
            while (p < 15) {
              val mv = new Array[Double](len)
              var i = 0
              while (i < len) {
                var dot = 0.0; val base = i * len
                var j = 0
                while (j < len) { dot += m(base + j) * v(j); j += 1 }
                mv(i) = dot
                i += 1
              }
              val norm = math.sqrt(mv.map(x => x * x).sum)
              if (norm > 0) { var j = 0; while (j < len) { v(j) = mv(j) / norm; j += 1 } }
              p += 1
            }
            // sign convention: positive correlation with the cluster mean
            var dot = 0.0
            var j = 0
            while (j < len) { dot += v(j) * sums(c)(j); j += 1 }
            if (dot < 0) v.map(-_) else v
          }
        }
      }
      it += 1
    }
    val out = labels.select(col("__id").as(pc.id), col("cluster"))
    z.unpersist()
    out
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
