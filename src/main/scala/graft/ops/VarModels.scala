package graft.ops

import breeze.linalg.{inv, DenseMatrix, DenseVector}
import graft.core.PanelCols
import graft.kernels.Special
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** VAR(p) fitting/forecasting and Granger causality on a wide
  * single-series frame `[ds, col_1..col_k]` (reference
  * polars_ts/var_model.py:23-218). The design matrix is collected to the
  * driver — same as the reference; the T×k frame is tiny by construction
  * (one multivariate series, not the panel).
  */
object VarModels {

  /** OLS fit of VAR(p): returns coefficient matrix ((k*p+1) × k) with
    * intercept in the last row, plus the lag-ordered column names. */
  def fit(df: DataFrame, cols: Seq[String], p: Int)(
      implicit pc: PanelCols): (DenseMatrix[Double], Seq[String]) = {
    val data = df.orderBy(pc.timeCol).select(cols.map(col): _*).collect()
      .map(r => cols.indices.map(i => r.getDouble(i)).toArray)
    val t = data.length
    require(t > p * cols.length + 1, s"series too short (T=$t) for VAR($p)")
    val rows = t - p
    val kk = cols.length
    val x = DenseMatrix.zeros[Double](rows, kk * p + 1)
    val y = DenseMatrix.zeros[Double](rows, kk)
    for (i <- 0 until rows) {
      for (l <- 1 to p; j <- 0 until kk)
        x(i, (l - 1) * kk + j) = data(p + i - l)(j)
      x(i, kk * p) = 1.0
      for (j <- 0 until kk) y(i, j) = data(p + i)(j)
    }
    val beta = inv(x.t * x) * (x.t * y)
    (beta, cols)
  }

  /** Recursive h-step VAR forecast: `[step, col_1..col_k]`. */
  def forecast(df: DataFrame, cols: Seq[String], p: Int, h: Int)(
      implicit pc: PanelCols): DataFrame = {
    val (beta, _) = fit(df, cols, p)
    val kk = cols.length
    val hist = df.orderBy(pc.timeCol.desc).limit(p).orderBy(pc.timeCol)
      .select(cols.map(col): _*).collect()
      .map(r => cols.indices.map(i => r.getDouble(i)).toArray)
    val buf = scala.collection.mutable.ArrayBuffer(hist: _*)
    val out = (1 to h).map { step =>
      val x = new Array[Double](kk * p + 1)
      for (l <- 1 to p; j <- 0 until kk) x((l - 1) * kk + j) = buf(buf.length - l)(j)
      x(kk * p) = 1.0
      val pred = Array.tabulate(kk)(j =>
        (0 until kk * p + 1).map(i => x(i) * beta(i, j)).sum)
      buf += pred
      step.toLong +: pred.toSeq
    }
    val spark = df.sparkSession
    import org.apache.spark.sql.{Row}
    import org.apache.spark.sql.types._
    val schema = StructType(StructField("step", LongType) +:
      cols.map(c => StructField(c, DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.map(Row.fromSeq(_))), schema)
  }

  /** Granger causality: does `causeCol` improve prediction of `effectCol`
    * beyond its own lags? Restricted-vs-full OLS F-test
    * (var_model.py:149-218). Returns (fStat, pValue). */
  def granger(df: DataFrame, causeCol: String, effectCol: String, p: Int)(
      implicit pc: PanelCols): (Double, Double) = {
    val data = df.orderBy(pc.timeCol).select(col(effectCol), col(causeCol)).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val t = data.length
    val rows = t - p
    def ssr(useCause: Boolean): Double = {
      val ncol = (if (useCause) 2 * p else p) + 1
      val x = DenseMatrix.zeros[Double](rows, ncol)
      val y = DenseVector.zeros[Double](rows)
      for (i <- 0 until rows) {
        for (l <- 1 to p) x(i, l - 1) = data(p + i - l)._1
        if (useCause) for (l <- 1 to p) x(i, p + l - 1) = data(p + i - l)._2
        x(i, ncol - 1) = 1.0
        y(i) = data(p + i)._1
      }
      val beta = inv(x.t * x) * (x.t * y)
      val resid = y - x * beta
      resid.t * resid
    }
    val ssrR = ssr(useCause = false)
    val ssrF = ssr(useCause = true)
    val dfDenom = rows - 2 * p - 1
    val f = ((ssrR - ssrF) / p) / (ssrF / dfDenom)
    val pv = fSf(f, p.toDouble, dfDenom.toDouble)
    (f, pv)
  }

  /** F-distribution survival function via the regularized incomplete
    * beta (continued fraction). */
  def fSf(f: Double, d1: Double, d2: Double): Double =
    if (f <= 0) 1.0 else incompleteBeta(d2 / (d2 + d1 * f), d2 / 2.0, d1 / 2.0)

  /** Regularized incomplete beta I_x(a,b), Lentz continued fraction. */
  def incompleteBeta(x: Double, a: Double, b: Double): Double = {
    if (x <= 0) return 0.0
    if (x >= 1) return 1.0
    val lbeta = Special.logGamma(a) + Special.logGamma(b) - Special.logGamma(a + b)
    val front = math.exp(a * math.log(x) + b * math.log(1 - x) - lbeta)
    def cf(x: Double, a: Double, b: Double): Double = {
      val fpmin = 1e-300
      var c = 1.0; var d = 1.0 - (a + b) * x / (a + 1.0)
      if (math.abs(d) < fpmin) d = fpmin
      d = 1.0 / d
      var h = d
      var m = 1
      while (m <= 300) {
        val m2 = 2 * m
        var aa = m * (b - m) * x / ((a + m2 - 1.0) * (a + m2))
        d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
        c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
        d = 1.0 / d; h *= d * c
        aa = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1.0))
        d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
        c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
        d = 1.0 / d
        val del = d * c
        h *= del
        if (math.abs(del - 1.0) < 1e-12) return h
        m += 1
      }
      h
    }
    if (x < (a + 1.0) / (a + b + 2.0)) front * cf(x, a, b) / a
    else 1.0 - math.exp(b * math.log(1 - x) + a * math.log(x) - lbeta) *
      cf(1 - x, b, a) / b
  }
}
