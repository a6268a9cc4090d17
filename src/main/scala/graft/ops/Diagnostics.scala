package graft.ops

import graft.core.{Panel, PanelCols}
import graft.kernels.AcfKernels
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Autocorrelation diagnostics as panel operators (reference
  * polars_ts/diagnostics.py:11-201): grouped-array form → kernel →
  * explode. One shuffle (the groupBy); kernels run per series in tasks.
  */
object Diagnostics {

  /** `[id, lag, acf, ci_lower, ci_upper]` for lags 0..maxLag. */
  def acf(df: DataFrame, maxLag: Int)(implicit pc: PanelCols): DataFrame = {
    val u = udf((ys: Seq[Double]) => AcfKernels.acf(ys.toArray, maxLag))
    Panel.grouped(df)
      .select(pc.idCol, size(col("ys")).as("__n"), posexplode(u(col("ys"))).as(Seq("lag", "acf")))
      .withColumn("ci_upper", lit(1.96) / sqrt(col("__n")))
      .withColumn("ci_lower", -col("ci_upper"))
      .select(pc.idCol, col("lag"), col("acf"), col("ci_lower"), col("ci_upper"))
  }

  /** `[id, lag, pacf]` via Durbin-Levinson (diagnostics.py:71-141). */
  def pacf(df: DataFrame, maxLag: Int)(implicit pc: PanelCols): DataFrame = {
    val u = udf((ys: Seq[Double]) => AcfKernels.pacf(ys.toArray, maxLag))
    Panel.grouped(df)
      .select(pc.idCol, posexplode(u(col("ys"))).as(Seq("lag", "pacf")))
  }

  /** `[id, q_stat, p_value]` Ljung-Box at maxLag (diagnostics.py:144-201). */
  def ljungBox(df: DataFrame, maxLag: Int)(implicit pc: PanelCols): DataFrame = {
    val u = udf((ys: Seq[Double]) => {
      val (q, p) = AcfKernels.ljungBox(ys.toArray, maxLag); Array(q, p)
    })
    Panel.grouped(df)
      .select(pc.idCol, u(col("ys")).as("__qp"))
      .select(pc.idCol, element_at(col("__qp"), 1).as("q_stat"),
        element_at(col("__qp"), 2).as("p_value"))
  }

  /** `[id, perm_entropy, sample_entropy]` complexity features
    * ([[graft.kernels.Entropy]]). SampEn's tolerance is ABSOLUTE
    * (see the kernel note); a NaN SampEn (no matching templates)
    * surfaces as null. */
  def complexity(df: DataFrame, m: Int = 3, sampM: Int = 2,
      sampR: Double = 0.5)(implicit pc: PanelCols): DataFrame = {
    // too-short series DROP (no row), mirroring the oracle's shape: the
    // SQL replay's pe⋈se inner join emits nothing when the series has
    // no ordinal window (len < m) or fewer than two SampEn templates
    // (len < sampM + 2) — without this guard one 3-point series would
    // throw the kernels' require() and fail the whole job
    val uT = udf((ys: Seq[Double]) =>
      if (ys.length < m || ys.length < sampM + 2)
        None
      else {
        val xs = ys.toArray
        val se = graft.kernels.Entropy.sampleEntropy(xs, sampM, sampR)
        Some((graft.kernels.Entropy.permutationEntropy(xs, m),
          if (se.isNaN) None else Some(se)))
      })
    Panel.grouped(df)
      .select(pc.idCol, uT(col("ys")).as("__c"))
      .filter(col("__c").isNotNull)
      .select(pc.idCol, col("__c._1").as("perm_entropy"),
        col("__c._2").as("sample_entropy"))
  }
}
