package graft.ops

import breeze.linalg.{inv, DenseMatrix}
import graft.core.PanelCols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchical forecast reconciliation (reference
  * polars_ts/reconciliation.py:41-590): bottom_up, top_down (historical
  * proportions), and OLS MinTrace.
  *
  * The hierarchy (edges parent→child) is small metadata: the summing
  * matrix S and the MinT projection live on the driver; the projection is
  * applied DISTRIBUTED as a sparse-matmul join — `[node_out, node_in, w]`
  * joined to forecasts, grouped per (out, time). No per-timestamp driver
  * loop, so 10⁹ timestamps reconcile as one shuffle.
  */
object Reconciliation {

  /** Bottom-up: aggregate bottom-level forecasts up the tree. Pure SQL.
    * `edges` = (parent, child); forecasts must cover the bottom nodes. */
  def bottomUp(forecasts: DataFrame, edges: Seq[(String, String)],
      yhatCol: String = "y_hat")(implicit pc: PanelCols): DataFrame = {
    val spark = forecasts.sparkSession
    import spark.implicits._
    val (nodes, bottoms, desc) = hierarchy(edges)
    // map every node to its bottom descendants
    val pairs = nodes.flatMap(n => desc(n).map(b => (n, b))).toDF("__node", "__bottom")
    forecasts.withColumnRenamed(pc.id, "__bottom")
      .join(broadcast(pairs), Seq("__bottom"))
      .groupBy(col("__node").as(pc.id), pc.timeCol)
      .agg(sum(col(yhatCol)).as(yhatCol))
  }

  /** Top-down with historical proportions: distribute each top-level
    * forecast to bottoms by their share of historical totals. */
  def topDown(forecasts: DataFrame, history: DataFrame, root: String,
      edges: Seq[(String, String)], yhatCol: String = "y_hat")(
      implicit pc: PanelCols): DataFrame = {
    val spark = forecasts.sparkSession
    import spark.implicits._
    val (_, bottoms, desc) = hierarchy(edges)
    val rootBottoms = desc(root)
    val hist = history.filter(pc.idCol.isin(rootBottoms: _*))
      .groupBy(pc.idCol).agg(sum(pc.targetCol).as("__tot"))
    val props = hist.crossJoin(broadcast(hist.agg(sum(col("__tot")).as("__all"))))
      .select(pc.idCol.as("__bottom"), (col("__tot") / col("__all")).as("__prop"))
    forecasts.filter(pc.idCol === root)
      .crossJoin(broadcast(props))
      .select(col("__bottom").as(pc.id), pc.timeCol,
        (col(yhatCol) * col("__prop")).as(yhatCol))
  }

  /** OLS MinTrace: ŷ_rec = S(SᵀS)⁻¹Sᵀ ŷ across the whole node vector per
    * timestamp. P is computed on the driver (m×m, m = node count) and
    * applied as a join-matmul. */
  def minTraceOls(forecasts: DataFrame, edges: Seq[(String, String)],
      yhatCol: String = "y_hat")(implicit pc: PanelCols): DataFrame = {
    val spark = forecasts.sparkSession
    import spark.implicits._
    val (nodes, bottoms, desc) = hierarchy(edges)
    val nodeIdx = nodes.zipWithIndex.toMap
    val botIdx = bottoms.zipWithIndex.toMap
    val s = DenseMatrix.zeros[Double](nodes.length, bottoms.length)
    nodes.foreach(n => desc(n).foreach(b => s(nodeIdx(n), botIdx(b)) = 1.0))
    val p = s * inv(s.t * s) * s.t // m×m projection
    val weights = (for {
      i <- nodes.indices; j <- nodes.indices if math.abs(p(i, j)) > 1e-12
    } yield (nodes(i), nodes(j), p(i, j))).toDF("__out", "__in", "__w")
    forecasts.withColumnRenamed(pc.id, "__in")
      .join(broadcast(weights), Seq("__in"))
      .groupBy(col("__out").as(pc.id), pc.timeCol)
      .agg(sum(col("__w") * col(yhatCol)).as(yhatCol))
  }

  /** (all nodes, bottom nodes, node → bottom descendants). */
  private def hierarchy(edges: Seq[(String, String)])
      : (Seq[String], Seq[String], Map[String, Seq[String]]) = {
    val children = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val bottoms = nodes.filterNot(children.contains)
    def desc(n: String): Seq[String] =
      if (!children.contains(n)) Seq(n)
      else children(n).flatMap(desc)
    (nodes, bottoms, nodes.map(n => n -> desc(n)).toMap)
  }
}
