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

  /** Middle-out (reference reconciliation.py:392-480): keep `middleLevel`
    * forecasts as-is; below, disaggregate each middle forecast to its
    * bottom descendants by mean historical-forecast proportions; above,
    * aggregate the disaggregated bottoms (other interior nodes likewise).
    * Assumes every bottom node sits under some middle node. */
  def middleOut(forecasts: DataFrame, edges: Seq[(String, String)],
      middleLevel: Seq[String], yhatCol: String = "y_hat")(
      implicit pc: PanelCols): DataFrame = {
    val spark = forecasts.sparkSession
    import spark.implicits._
    val (nodes, bottoms, desc) = hierarchy(edges)
    val pairs = middleLevel.flatMap(m => desc(m).map(b => (m, b)))
      .toDF("__mid", "__bottom")
    val botFc = forecasts.withColumnRenamed(pc.id, "__bottom")
      .join(broadcast(pairs), Seq("__bottom"))
    val tot = botFc.groupBy(col("__mid"), pc.timeCol)
      .agg(sum(col(yhatCol)).as("__total"))
    val props = botFc.join(tot, Seq("__mid", pc.time))
      .groupBy(col("__mid"), col("__bottom"))
      .agg(avg(col(yhatCol) / col("__total")).as("__prop"))
    val middleKept = forecasts.filter(pc.idCol.isin(middleLevel: _*))
      .select(pc.idCol, pc.timeCol, col(yhatCol))
    val bottomOut = forecasts.filter(pc.idCol.isin(middleLevel: _*))
      .withColumnRenamed(pc.id, "__mid")
      .join(broadcast(props), Seq("__mid"))
      .select(col("__bottom").as(pc.id), pc.timeCol,
        (col(yhatCol) * col("__prop")).as(yhatCol))
    val others = nodes.filterNot(n =>
      middleLevel.contains(n) || bottoms.contains(n))
    val upward = bottomUp(bottomOut, edges, yhatCol)
      .filter(pc.idCol.isin(others: _*))
    middleKept.unionByName(bottomOut).unionByName(upward)
  }

  /** Covariance-weighted MinTrace projection
    * P = S(SᵀW⁻¹S)⁻¹SᵀW⁻¹, applied distributed as the same join-matmul as
    * [[minTraceOls]]. W lives on the driver — covariance reconciliation is
    * inherently O(m²) in the node count, same as the reference. */
  private def applyCovProjection(forecasts: DataFrame,
      edges: Seq[(String, String)], w: DenseMatrix[Double],
      nodes: Seq[String], yhatCol: String)(implicit pc: PanelCols): DataFrame = {
    val spark = forecasts.sparkSession
    import spark.implicits._
    val (_, bottoms, desc) = hierarchy(edges)
    val nodeIdx = nodes.zipWithIndex.toMap
    val botIdx = bottoms.zipWithIndex.toMap
    val s = DenseMatrix.zeros[Double](nodes.length, bottoms.length)
    nodes.foreach(n => desc(n).foreach(b => s(nodeIdx(n), botIdx(b)) = 1.0))
    val wInv = breeze.linalg.pinv(w)
    val p = s * breeze.linalg.pinv(s.t * wInv * s) * s.t * wInv
    val weights = (for {
      i <- nodes.indices; j <- nodes.indices if math.abs(p(i, j)) > 1e-12
    } yield (nodes(i), nodes(j), p(i, j))).toDF("__out", "__in", "__w")
    forecasts.withColumnRenamed(pc.id, "__in")
      .join(broadcast(weights), Seq("__in"))
      .groupBy(col("__out").as(pc.id), pc.timeCol)
      .agg(sum(col("__w") * col(yhatCol)).as(yhatCol))
  }

  /** PERMBU (reference reconciliation.py:483-523): MinTrace weighted by
    * the empirical residual covariance, shrunk halfway to its diagonal.
    * `residuals`: `[id, ds, residual]` historical residuals per node. */
  def permbu(forecasts: DataFrame, edges: Seq[(String, String)],
      residuals: DataFrame, yhatCol: String = "y_hat")(
      implicit pc: PanelCols): DataFrame = {
    val (nodes, _, _) = hierarchy(edges)
    val nodeIdx = nodes.zipWithIndex.toMap
    val rows = residuals.select(pc.idCol.cast("string"), pc.timeCol.cast("string"),
      col("residual").cast("double")).collect()
    val times = rows.map(_.getString(1)).distinct.sorted
    val tIdx = times.zipWithIndex.toMap
    val e = DenseMatrix.zeros[Double](nodes.length, times.length)
    rows.foreach { r =>
      nodeIdx.get(r.getString(0)).foreach(i => e(i, tIdx(r.getString(1))) = r.getDouble(2))
    }
    val w = (e * e.t) / math.max(times.length, 1).toDouble
    val wReg = DenseMatrix.tabulate(nodes.length, nodes.length)((i, j) =>
      if (i == j) w(i, j) else 0.5 * w(i, j))
    applyCovProjection(forecasts, edges, wReg, nodes, yhatCol)
  }

  /** MinT-CV (reference reconciliation.py:525-590): covariance estimated
    * as the average of per-fold residual covariances (value − train-split
    * mean per node), shrunk halfway to its diagonal. `train`:
    * `[id, ds, target]` historical values per node. */
  def minTraceCv(forecasts: DataFrame, edges: Seq[(String, String)],
      train: DataFrame, nFolds: Int = 3, yhatCol: String = "y_hat")(
      implicit pc: PanelCols): DataFrame = {
    val (nodes, _, _) = hierarchy(edges)
    val nodeIdx = nodes.zipWithIndex.toMap
    val rows = train.select(pc.idCol.cast("string"), pc.timeCol.cast("string"),
      pc.targetCol.cast("double")).collect()
    val times = rows.map(_.getString(1)).distinct.sorted
    val tIdx = times.zipWithIndex.toMap
    val nT = times.length
    val y = DenseMatrix.zeros[Double](nodes.length, nT)
    rows.foreach { r =>
      nodeIdx.get(r.getString(0)).foreach(i => y(i, tIdx(r.getString(1))) = r.getDouble(2))
    }
    val folds = math.max(1, math.min(nFolds, nT))
    val foldSize = math.max(1, nT / folds)
    var wSum = DenseMatrix.zeros[Double](nodes.length, nodes.length)
    for (f <- 0 until folds) {
      val valStart = f * foldSize
      val valEnd = if (f < folds - 1) valStart + foldSize else nT
      val trainIdx = (0 until valStart) ++ (valEnd until nT)
      if (trainIdx.nonEmpty && valEnd > valStart) {
        val mean = DenseMatrix.tabulate(nodes.length, 1)((i, _) =>
          trainIdx.map(t => y(i, t)).sum / trainIdx.length)
        val res = DenseMatrix.tabulate(nodes.length, valEnd - valStart)(
          (i, t) => y(i, valStart + t) - mean(i, 0))
        wSum = wSum + (res * res.t) / (valEnd - valStart).toDouble
      }
    }
    val w = wSum / folds.toDouble
    val wReg = DenseMatrix.tabulate(nodes.length, nodes.length)((i, j) =>
      if (i == j) w(i, j) else 0.5 * w(i, j))
    applyCovProjection(forecasts, edges, wReg, nodes, yhatCol)
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
