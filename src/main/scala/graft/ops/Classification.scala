package graft.ops

import graft.core.{Panel, PanelCols}
import graft.kernels.{Cluster, Elastic, Rocket}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series classification (reference polars_ts/classification/):
  * nearest-shape (k-Shape centroid) and ROCKET + ridge. Both split as
  * fit-on-aggregates / predict-as-narrow-map: only per-class centroids or
  * a (2·nKernels)² Gram ever reach the driver. */
object Classification {

  /** k-Shape nearest-centroid classifier (reference
    * classification/kshape_classifier.py:11-120, n_centroids_per_class=1):
    * per class, the z-normalized mean shape (computed distributed as an
    * element-wise average over z-normed members), re-z-normalized; predict
    * = argmin SBD to the broadcast centroids.
    * `labels`: `[id, label]`. Output: `[id, predicted_label]`. */
  def kshapeClassify(train: DataFrame, labels: DataFrame, test: DataFrame)(
      implicit pc: PanelCols): DataFrame = {
    val spark = train.sparkSession
    val g = Panel.grouped(train).select(pc.idCol.as("__id"), col("ys"))
    val minLen = g.agg(min(size(col("ys")))).head().getInt(0)
    val zUdf = udf((ys: Seq[Double]) => Cluster.zNorm(ys.toArray.take(minLen)))
    val z = g.select(col("__id"), zUdf(col("ys")).as("__z"))
      .join(labels.select(pc.idCol.cast("string").as("__ids"),
        col("label").cast("string").as("__label")),
        col("__id").cast("string") === col("__ids"))
    // per-class element-wise mean of z-normed members: explode positions →
    // groupBy(label, pos) → avg — one shuffle of len-scalars per member
    val means = z.select(col("__label"), posexplode(col("__z")).as(Seq("__p", "__v")))
      .groupBy(col("__label"), col("__p")).agg(avg(col("__v")).as("__m"))
      .groupBy(col("__label"))
      .agg(sort_array(collect_list(struct(col("__p"), col("__m")))).as("__pm"))
      .select(col("__label"), col("__pm.__m").as("__centroid"))
      .collect()
      .map(r => r.getString(0) -> Cluster.zNorm(r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(means)
    val predictUdf = udf((zs: Seq[Double]) => {
      val arr = Cluster.zNorm(zs.toArray.take(minLen))
      bc.value.minBy { case (_, c) => Elastic.sbd(arr, c) }._1
    })
    Panel.grouped(test).select(pc.idCol.as("__tid"), col("ys"))
      .select(col("__tid").as(pc.id), predictUdf(col("ys")).as("predicted_label"))
  }

  /** ROCKET + one-vs-rest ridge classifier (reference
    * classification/rocket_classifier.py:23-160): seeded kernel bank →
    * distributed feature transform → per-class ±1 ridge via ONE
    * treeAggregate of the shared Gram + per-class moment vectors →
    * argmax score predict with broadcast coefficients. */
  /** One-vs-rest ridge fit over ROCKET features → (minLen, sorted class
    * names, per-class coefficient vectors). Extracted from
    * [[rocketClassify]] so OraclePins can pin the identical fit. */
  def rocketFit(train: DataFrame, labels: DataFrame, nKernels: Int = 50,
      l2: Double = 1.0, seed: Long = 42L)(
      implicit pc: PanelCols): (Int, Array[String], Array[Array[Double]]) = {
    val spark = train.sparkSession
    val g = Panel.grouped(train).select(pc.idCol.as("__id"), col("ys"))
    val minLen = g.agg(min(size(col("ys")))).head().getInt(0)
    val bank = spark.sparkContext.broadcast(Rocket.randomKernels(nKernels, minLen, seed))
    val featUdf = udf((ys: Seq[Double]) => Rocket.transform(ys.toArray.take(minLen), bank.value))
    val d = nKernels * 2 + 1 // features + intercept
    val feats = g.select(col("__id"), featUdf(col("ys")).as("__f"))
      .join(labels.select(pc.idCol.cast("string").as("__ids"),
        col("label").cast("string").as("__label")),
        col("__id").cast("string") === col("__ids"))
      .select(col("__label"), col("__f"))
    val classes = feats.select(col("__label")).distinct()
      .collect().map(_.getString(0)).sorted
    val classIdx = classes.zipWithIndex.toMap
    val nc = classes.length
    // one pass: Gram (d×d, shared) + per-class Xᵀ(±1) vectors
    val zero = (Array.ofDim[Double](d * d), Array.ofDim[Double](nc, d))
    val (gram, rhs) = feats.rdd.treeAggregate(zero)(
      { case ((gm, b), row) =>
        val label = row.getString(0)
        val f = row.getSeq[Double](1).toArray :+ 1.0
        val ci = classIdx(label)
        var i = 0
        while (i < d) {
          val fi = f(i); val base = i * d
          var j = 0
          while (j < d) { gm(base + j) += fi * f(j); j += 1 }
          i += 1
        }
        var c = 0
        while (c < nc) {
          val y = if (c == ci) 1.0 else -1.0
          var k = 0
          while (k < d) { b(c)(k) += f(k) * y; k += 1 }
          c += 1
        }
        (gm, b)
      },
      { case ((g1, b1), (g2, b2)) =>
        var i = 0
        while (i < d * d) { g1(i) += g2(i); i += 1 }
        var c = 0
        while (c < nc) {
          var k = 0
          while (k < d) { b1(c)(k) += b2(c)(k); k += 1 }
          c += 1
        }
        (g1, b1)
      })
    val coefs = Array.tabulate(nc) { c =>
      val a = Array.tabulate(d, d)((i, j) =>
        gram(i * d + j) + (if (i == j && i < d - 1) l2 else 0.0))
      graft.kernels.ArimaLite.solve(a, rhs(c).clone())
    }
    (minLen, classes, coefs)
  }

  /** Collect (id, series, label) for a driver-side CNN fit, ordered by
    * the native id (reference `_dl_utils.extract_classification_data`
    * sorts by id_col before grouping). Bounded by `cap` via the same
    * hash-stable sample as DeepClustering.collectSeries. */
  def collectLabeled(train: DataFrame, labels: DataFrame, cap: Int = 2048)(
      implicit pc: PanelCols): Seq[(String, Array[Double], String)] = {
    val g = Panel.grouped(train).select(pc.idCol.as("__nid"), col("ys"))
      .join(labels.select(pc.idCol.cast("string").as("__ids"),
        col("label").cast("string").as("__label")),
        col("__nid").cast("string") === col("__ids"))
    // unconditional hash-ordered top-K — no count() pre-pass
    g.orderBy(xxhash64(col("__nid").cast("string")), col("__nid")).limit(cap)
      .orderBy(col("__nid"))
      .select(col("__nid").cast("string"), col("ys"), col("__label"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getSeq[Double](1).toArray, r.getString(2)))
  }

  /** Shared CNN predict: broadcast eval spec, per-series forward + argmax
    * logit (first index on ties — strict `>` scan). */
  private def cnnPredict(test: DataFrame, fit: graft.kernels.DeepModels.ClassifierFit)(
      implicit pc: PanelCols): DataFrame = {
    val spark = test.sparkSession
    val bc = spark.sparkContext.broadcast(fit)
    val predictUdf = udf((ys: Seq[Double]) => {
      val f = bc.value
      val x = graft.kernels.NeuralNet.padTo(ys.toArray, f.seqLen)
        .map(v => (v - f.mean) / f.std)
      val logits = graft.kernels.NeuralNet.evalVector(f.spec, Array(x))
      var best = 0
      var i = 1
      while (i < logits.length) { if (logits(i) > logits(best)) best = i; i += 1 }
      f.classes(best)
    })
    Panel.grouped(test).select(pc.idCol.as("__tid"), col("ys"))
      .select(col("__tid").as(pc.id), predictUdf(col("ys")).as("predicted_label"))
  }

  /** 1D ResNet classifier (reference classification/resnet_classifier.py:
    * 72-180), trained with the deterministic NeuralNet kernel on a
    * bounded collected sample; predict is a broadcast-weights narrow map. */
  def resnetClassify(train: DataFrame, labels: DataFrame, test: DataFrame,
      cfg: graft.kernels.DeepModels.ClassifierCfg =
        graft.kernels.DeepModels.ClassifierCfg())(
      implicit pc: PanelCols): DataFrame = {
    val rows = collectLabeled(train, labels)
    val fit = graft.kernels.DeepModels.resnetFit(rows.map(_._2), rows.map(_._3), cfg)
    cnnPredict(test, fit)
  }

  /** InceptionTime classifier (reference classification/inception_time.py:
    * 98-208), same fit/predict split as [[resnetClassify]]. */
  def inceptionClassify(train: DataFrame, labels: DataFrame, test: DataFrame,
      cfg: graft.kernels.DeepModels.ClassifierCfg =
        graft.kernels.DeepModels.ClassifierCfg())(
      implicit pc: PanelCols): DataFrame = {
    val rows = collectLabeled(train, labels)
    val fit = graft.kernels.DeepModels.inceptionFit(rows.map(_._2), rows.map(_._3), cfg)
    cnnPredict(test, fit)
  }

  def rocketClassify(train: DataFrame, labels: DataFrame, test: DataFrame,
      nKernels: Int = 50, l2: Double = 1.0, seed: Long = 42L)(
      implicit pc: PanelCols): DataFrame = {
    val spark = train.sparkSession
    val (minLen, classes, coefs) = rocketFit(train, labels, nKernels, l2, seed)
    val bank = spark.sparkContext.broadcast(Rocket.randomKernels(nKernels, minLen, seed))
    val bcC = spark.sparkContext.broadcast((classes, coefs))
    val predictUdf = udf((ys: Seq[Double]) => {
      val f = Rocket.transform(ys.toArray.take(minLen), bank.value) :+ 1.0
      val (cls, cs) = bcC.value
      var best = 0; var bs = Double.NegativeInfinity
      var c = 0
      while (c < cs.length) {
        var s = 0.0
        var i = 0
        while (i < f.length) { s += f(i) * cs(c)(i); i += 1 }
        if (s > bs) { bs = s; best = c }
        c += 1
      }
      cls(best)
    })
    Panel.grouped(test).select(pc.idCol.as("__tid"), col("ys"))
      .select(col("__tid").as(pc.id), predictUdf(col("ys")).as("predicted_label"))
  }
}
