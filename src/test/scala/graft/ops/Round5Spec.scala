package graft.ops

import breeze.linalg.DenseMatrix
import graft.TestSpark
import graft.core.PanelCols
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 additions: the PERMBU / MinT-CV covariance refactor (driver
  * panel collect → distributed time-slice Gram) must be value-identical
  * to the dense-panel math it replaced. */
class Round5Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit val pc: PanelCols = PanelCols()

  private def panel(ids: Seq[String], nT: Int)(f: (Int, Int) => Double) = {
    import spark.implicits._
    ids.zipWithIndex.flatMap { case (id, i) =>
      (0 until nT).map(t => (id, t, f(i, t)))
    }.toDF("unique_id", "__h", "y")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L))
      .drop("__h")
  }

  // 2 groups × 2 bottoms; deterministic values with per-node scale + drift
  private val edges = Seq(("total", "g0"), ("total", "g1"),
    ("g0", "a"), ("g0", "b"), ("g1", "c"), ("g1", "d"))
  private val bottoms = Seq("a", "b", "c", "d")
  private val nodes = Seq("total", "g0", "g1") ++ bottoms

  private def histFor(ids: Seq[String], nT: Int) =
    panel(ids, nT)((i, t) => (i + 1.0) * math.sin(t * 0.7 + i) + 0.1 * t * (i - 1))

  /** Dense-panel covariance exactly as the pre-round-5 implementation
    * computed it: [node × time] matrix with zeros for absent cells. */
  private def densePanelCov(hist: Map[(String, Int), Double], nT: Int): DenseMatrix[Double] = {
    val e = DenseMatrix.zeros[Double](nodes.length, nT)
    for (((id, t), v) <- hist; i = nodes.indexOf(id) if i >= 0) e(i, t) = v
    (e * e.t) / math.max(nT, 1).toDouble
  }

  test("permbu distributed Gram matches the dense-panel covariance path") {
    val nT = 12
    // residuals over ALL nodes (bottoms + aggregates), like the query builds
    val resid = panel(nodes, nT)((i, t) => math.cos(t * 0.9 + 2 * i) * (1.0 + i))
      .withColumnRenamed("y", "residual")
    val fc = panel(bottoms, 3)((i, t) => 10.0 * (i + 1) + t)
      .withColumnRenamed("y", "y_hat")
    val all = Reconciliation.bottomUp(fc, edges)
    val rec = Reconciliation.permbu(all, edges, resid)

    // reference computation: dense covariance → same projection applied
    val histMap = nodes.zipWithIndex.flatMap { case (id, i) =>
      (0 until nT).map(t => (id, t) -> math.cos(t * 0.9 + 2 * i) * (1.0 + i))
    }.toMap
    val w = densePanelCov(histMap, nT)
    val wReg = DenseMatrix.tabulate(nodes.length, nodes.length)((i, j) =>
      if (i == j) w(i, j) else 0.5 * w(i, j))
    // re-derive with the projection helper by reflection-free route:
    // apply the public permbu on a single-time residual panel is circular,
    // so instead assert coherence + agreement with an independent breeze
    // computation of P·ŷ for one timestamp.
    val s = DenseMatrix.zeros[Double](nodes.length, bottoms.length)
    val desc = Map("total" -> bottoms, "g0" -> Seq("a", "b"), "g1" -> Seq("c", "d")) ++
      bottoms.map(b => b -> Seq(b)).toMap
    nodes.zipWithIndex.foreach { case (n, i) =>
      desc(n).foreach(b => s(i, bottoms.indexOf(b)) = 1.0) }
    val wInv = breeze.linalg.pinv(wReg)
    val p = s * breeze.linalg.pinv(s.t * wInv * s) * s.t * wInv
    // ŷ at the first forecast timestamp, node order as `nodes`
    val t0 = all.agg(min("ds")).collect()(0).getTimestamp(0)
    val yh = all.filter(col("ds") === lit(t0)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val yv = breeze.linalg.DenseVector(nodes.map(yh): _*)
    val expect = p * yv
    val got = rec.filter(col("ds") === lit(t0)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    nodes.zipWithIndex.foreach { case (n, i) =>
      assert(math.abs(got(n) - expect(i)) < 1e-8,
        s"node $n: got ${got(n)} expected ${expect(i)}")
    }
  }

  test("minTraceCv distributed fold covariance matches the dense-panel folds") {
    val nT = 13
    val nFolds = 3
    val hist = histFor(nodes, nT).withColumnRenamed("y", "y_hat")
    val fc = panel(bottoms, 2)((i, t) => 5.0 * (i + 1) - t)
      .withColumnRenamed("y", "y_hat")
    val hpc = PanelCols(target = "y_hat")
    val all = Reconciliation.bottomUp(fc, edges)(hpc)
    val rec = Reconciliation.minTraceCv(all, edges, hist, nFolds)(hpc)

    // dense-panel replica of the pre-round-5 fold loop
    val y = DenseMatrix.tabulate(nodes.length, nT)((i, t) =>
      (i + 1.0) * math.sin(t * 0.7 + i) + 0.1 * t * (i - 1))
    val foldSize = math.max(1, nT / nFolds)
    var wSum = DenseMatrix.zeros[Double](nodes.length, nodes.length)
    for (f <- 0 until nFolds) {
      val valStart = f * foldSize
      val valEnd = if (f < nFolds - 1) valStart + foldSize else nT
      val trainIdx = (0 until valStart) ++ (valEnd until nT)
      val mean = Array.tabulate(nodes.length)(i =>
        trainIdx.map(t => y(i, t)).sum / trainIdx.length)
      val res = DenseMatrix.tabulate(nodes.length, valEnd - valStart)(
        (i, t) => y(i, valStart + t) - mean(i))
      wSum = wSum + (res * res.t) / (valEnd - valStart).toDouble
    }
    val w = wSum / nFolds.toDouble
    val wReg = DenseMatrix.tabulate(nodes.length, nodes.length)((i, j) =>
      if (i == j) w(i, j) else 0.5 * w(i, j))
    val s = DenseMatrix.zeros[Double](nodes.length, bottoms.length)
    val desc = Map("total" -> bottoms, "g0" -> Seq("a", "b"), "g1" -> Seq("c", "d")) ++
      bottoms.map(b => b -> Seq(b)).toMap
    nodes.zipWithIndex.foreach { case (n, i) =>
      desc(n).foreach(b => s(i, bottoms.indexOf(b)) = 1.0) }
    val wInv = breeze.linalg.pinv(wReg)
    val p = s * breeze.linalg.pinv(s.t * wInv * s) * s.t * wInv
    val t0 = all.agg(min("ds")).collect()(0).getTimestamp(0)
    val yh = all.filter(col("ds") === lit(t0)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val yv = breeze.linalg.DenseVector(nodes.map(yh): _*)
    val expect = p * yv
    val got = rec.filter(col("ds") === lit(t0)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    nodes.zipWithIndex.foreach { case (n, i) =>
      assert(math.abs(got(n) - expect(i)) < 1e-8,
        s"node $n: got ${got(n)} expected ${expect(i)}")
    }
  }

  test("GP kernel family matches reference formulas (gp.py:52-226)") {
    import graft.kernels.Bayesian.GpKernel._
    val eps = 1e-12
    // RBF: v·exp(-0.5 d²/ls²)
    assert(math.abs(Rbf(2.0, 3.0)(1.0, 4.0) - 2.0 * math.exp(-0.5)) < eps)
    // Matern32 at r = |1-4|/3 = 1: v(1+√3)e^{-√3}
    val s3 = math.sqrt(3.0)
    assert(math.abs(Matern32(2.0, 3.0)(1.0, 4.0) - 2.0 * (1 + s3) * math.exp(-s3)) < eps)
    // Matern52 at r=1: v(1+√5+5/3)e^{-√5}
    val s5 = math.sqrt(5.0)
    assert(math.abs(Matern52(1.0, 3.0)(1.0, 4.0) -
      (1 + s5 + 5.0 / 3.0) * math.exp(-s5)) < eps)
    // Periodic: diff = period ⇒ sin(π)≈0 ⇒ k = v
    assert(math.abs(Periodic(1.5, 2.0, 5.0)(0.0, 5.0) - 1.5) < 1e-9)
    // spectral mixture at tau=0: Σ w_q = 1
    assert(math.abs(SpectralMixture(3)(0.0, 0.0) - 1.0) < eps)
    // sum/product compose pointwise
    val a = Rbf(1.0, 2.0); val b = Periodic(0.5, 1.0, 24.0)
    assert(math.abs(Sum(a, b)(1.0, 7.0) - (a(1.0, 7.0) + b(1.0, 7.0))) < eps)
    assert(math.abs(Product(a, b)(1.0, 7.0) - a(1.0, 7.0) * b(1.0, 7.0)) < eps)
    // log-space params round-trip through withParams
    val k = Sum(Matern52(2.0, 7.0), Periodic(0.5, 1.0, 24.0))
    val rt = k.withParams(k.params)
    assert(math.abs(rt(0.0, 3.0) - k(0.0, 3.0)) < 1e-9)
  }

  test("GP posterior mean with fixed hyperparameters tracks a smooth series") {
    val y = Array.tabulate(40)(i => math.sin(i / 5.0) * 3.0 + 10.0)
    val (fc, fv) = graft.kernels.Bayesian.gpForecast(y, 3, optimize = false,
      kernel = Some(graft.kernels.Bayesian.GpKernel.Matern52(1.0, 8.0)))
    // next values of the sine stay within ~1.5 of the forecast
    (0 until 3).foreach { s =>
      val truth = math.sin((40 + s) / 5.0) * 3.0 + 10.0
      assert(math.abs(fc(s) - truth) < 1.5, s"step $s: ${fc(s)} vs $truth")
      assert(fv(s) > 0.0)
    }
  }

  test("CES tracks level and trend series (SCUM fourth leg)") {
    import graft.kernels.Arima
    // flat series: forecast stays at the level
    val flat = Array.fill(30)(5.0)
    val f1 = Arima.cesForecast(flat, 3)
    f1.foreach(v => assert(math.abs(v - 5.0) < 0.2, s"flat: $v"))
    // linear trend: CES extrapolates the direction
    val lin = Array.tabulate(40)(i => 2.0 + 0.5 * i)
    val f2 = Arima.cesForecast(lin, 3)
    assert(f2(0) > lin.last - 1.0, s"trend continuation: ${f2(0)}")
    assert(f2(2) >= f2(0) - 0.5, "trend keeps rising")
    // scum ensemble composes four legs and returns h values
    val noisy = Array.tabulate(60)(i => 10.0 + math.sin(i / 3.0) + 0.05 * i)
    val sc = Arima.scumForecast(noisy, 5, m = 12)
    assert(sc.length == 5 && sc.forall(v => math.abs(v - 13.0) < 8.0))
  }

  test("minhash LSH bucket cap drops flood buckets but keeps true near-dups") {
    import spark.implicits._
    // 30 distinct docs + a 40-doc flood of one identical text
    val docs = ((0 until 30).map(i => (i.toLong, s"the quick brown fox $i jumps over the lazy dog number $i with tail"))
      ++ (100 until 140).map(i => (i.toLong, "identical flood document text that repeats verbatim across the corpus")))
      .toDF("doc_id", "text")
    val capped = Dedup.minhashLsh(docs, threshold = 0.5, maxBucketSize = Some(10))
    // flood pairs (both ids >= 100) must be gone; no spurious pairs appear
    assert(capped.filter(col("id_a") >= 100 && col("id_b") >= 100).count() == 0)
    val uncapped = Dedup.minhashLsh(docs, threshold = 0.5, maxBucketSize = None)
    assert(uncapped.filter(col("id_a") >= 100 && col("id_b") >= 100).count() == (40L * 39) / 2)
  }
}
