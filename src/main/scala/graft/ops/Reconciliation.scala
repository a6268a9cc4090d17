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

  /** Per-fold time-slice Gram: for each fold f, returns
    * (G_f = Σ_{t∈f} v_t·v_tᵀ, T_f = Σ_{t∈f} v_t, L_f = |fold times|) where
    * v_t is the m-vector of `valCol` over nodes at time t (absent entries
    * are 0, matching the dense-panel semantics). ONE shuffle groups values
    * per (fold, time); a treeAggregate folds the m-length slices into
    * m×m Grams on executors — driver traffic is O(folds·m²), never the
    * [node × time] panel (at a 100k-node hierarchy with years of history
    * a panel collect is a driver OOM). Same pattern as the KASBA cluster
    * Gram (Clustering.scala) and Pipeline.fitGlobalRidge. */
  private def foldGrams(data: DataFrame, nodes: Seq[String], valCol: String,
      foldCol: org.apache.spark.sql.Column)(implicit pc: PanelCols)
      : Map[Int, (DenseMatrix[Double], Array[Double], Long)] = {
    import org.apache.spark.sql.Row
    val m = nodes.length
    val idx = nodes.zipWithIndex.toMap
    val idxUdf = udf((s: String) => idx.getOrElse(s, -1))
    val slices = data
      .select(foldCol.cast("int").as("__fold"),
        idxUdf(pc.idCol.cast("string")).as("__i"),
        col(valCol).cast("double").as("__v"), pc.timeCol.as("__t"))
      .filter(col("__i") >= 0)
      .groupBy(col("__fold"), col("__t"))
      .agg(collect_list(struct(col("__i"), col("__v"))).as("__s"))
      .select(col("__fold"), col("__s"))
    val zero = scala.collection.mutable.HashMap
      .empty[Int, (Array[Double], Array[Double], Long)]
    def slot(acc: scala.collection.mutable.HashMap[Int, (Array[Double], Array[Double], Long)],
        f: Int) = acc.getOrElseUpdate(f, (new Array[Double](m * m), new Array[Double](m), 0L))
    val agg = slices.rdd.treeAggregate(zero)(
      { (acc, row) =>
        val f = row.getInt(0)
        val (g, t, _) = slot(acc, f)
        val xs = row.getSeq[Row](1)
        val v = new Array[Double](m)
        xs.foreach(r => v(r.getInt(0)) = r.getDouble(1))
        var i = 0
        while (i < m) {
          val vi = v(i)
          t(i) += vi
          if (vi != 0.0) {
            val base = i * m
            var j = 0
            while (j < m) { g(base + j) += vi * v(j); j += 1 }
          }
          i += 1
        }
        val (g2, t2, l2) = acc(f)
        acc.update(f, (g2, t2, l2 + 1))
        acc
      },
      { (a, b) =>
        b.foreach { case (f, (g2, t2, l2)) =>
          val (g1, t1, _) = slot(a, f)
          var i = 0
          while (i < m * m) { g1(i) += g2(i); i += 1 }
          i = 0
          while (i < m) { t1(i) += t2(i); i += 1 }
          val (gg, tt, l1) = a(f)
          a.update(f, (gg, tt, l1 + l2))
        }
        a
      })
    agg.map { case (f, (g, t, l)) =>
      f -> (new DenseMatrix(m, m, g), t, l) // Gram is symmetric → layout-safe
    }.toMap
  }

  /** PERMBU (reference reconciliation.py:483-523): MinTrace weighted by
    * the empirical residual covariance, shrunk halfway to its diagonal.
    * `residuals`: `[id, ds, residual]` historical residuals per node.
    * W = E·Eᵀ/nT is computed as a distributed time-slice Gram — the
    * residual panel never collects to the driver. */
  def permbu(forecasts: DataFrame, edges: Seq[(String, String)],
      residuals: DataFrame, yhatCol: String = "y_hat")(
      implicit pc: PanelCols): DataFrame = {
    val (nodes, _, _) = hierarchy(edges)
    val grams = foldGrams(residuals, nodes, "residual", lit(0))
    val (g, _, nT) = grams.getOrElse(0,
      (DenseMatrix.zeros[Double](nodes.length, nodes.length),
        new Array[Double](nodes.length), 0L))
    val w = g / math.max(nT, 1L).toDouble
    val wReg = DenseMatrix.tabulate(nodes.length, nodes.length)((i, j) =>
      if (i == j) w(i, j) else 0.5 * w(i, j))
    applyCovProjection(forecasts, edges, wReg, nodes, yhatCol)
  }

  /** MinT-CV (reference reconciliation.py:525-590): covariance estimated
    * as the average of per-fold residual covariances (value − train-split
    * mean per node), shrunk halfway to its diagonal. `train`:
    * `[id, ds, target]` historical values per node.
    *
    * Distributed: times are rank-assigned to folds, per-fold Grams/sums
    * come from ONE treeAggregate, and each fold covariance expands as
    * Σ(y−m)(y−m)ᵀ = G_f − m·T_fᵀ − T_f·mᵀ + L_f·m·mᵀ with the train-split
    * mean m derived from global-minus-fold sums — all O(folds·m²) driver
    * math, no panel collect. */
  def minTraceCv(forecasts: DataFrame, edges: Seq[(String, String)],
      train: DataFrame, nFolds: Int = 3, yhatCol: String = "y_hat")(
      implicit pc: PanelCols): DataFrame = {
    val (nodes, _, _) = hierarchy(edges)
    val mN = nodes.length
    // dense rank over distinct times via the bucketed index (same
    // machinery as the CV splitters — no single-partition WindowExec;
    // epoch order ≡ the old ISO-string order)
    val ranked = Validation.timeIndex(train)
      .withColumn("__r", col("__tidx") - 1)
    val nT = ranked.count().toInt
    val folds = math.max(1, math.min(nFolds, nT))
    val foldSize = math.max(1, nT / folds)
    val withFold = train
      .join(ranked, Seq(pc.time))
      .withColumn("__fold",
        least(floor(col("__r") / foldSize), lit(folds - 1)).cast("int"))
    val grams = foldGrams(withFold.withColumnRenamed(pc.target, "__y"),
      nodes, "__y", col("__fold"))
    // global per-node sums = Σ over folds of fold sums
    val totSum = new Array[Double](mN)
    grams.values.foreach { case (_, t, _) =>
      var i = 0; while (i < mN) { totSum(i) += t(i); i += 1 }
    }
    var wSum = DenseMatrix.zeros[Double](mN, mN)
    for (f <- 0 until folds) {
      grams.get(f).foreach { case (gF, tF, lF) =>
        val nTrain = nT - lF
        if (nTrain > 0 && lF > 0) {
          val mean = Array.tabulate(mN)(i => (totSum(i) - tF(i)) / nTrain)
          val cov = DenseMatrix.tabulate(mN, mN)((i, j) =>
            (gF(i, j) - mean(i) * tF(j) - mean(j) * tF(i) +
              lF * mean(i) * mean(j)) / lF.toDouble)
          wSum = wSum + cov
        }
      }
    }
    val w = wSum / folds.toDouble
    val wReg = DenseMatrix.tabulate(mN, mN)((i, j) =>
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
