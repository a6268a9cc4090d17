package graft.ops

import graft.core.PanelCols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals (reference
  * polars_ts/probabilistic/conformal.py:21-187): the finite-sample
  * corrected quantile of calibration-set absolute residuals widens point
  * forecasts into `[y_hat_lower, y_hat_upper]`. Pure SQL: one aggregate
  * per series + a broadcastable join.
  */
object Conformal {

  /** Per-series conformal interval.
    * @param cal  calibration frame with actuals `yCol` and predictions `yhatCol`
    * @param pred prediction frame with `yhatCol`
    * @param alpha miscoverage (0.1 → 90% interval)
    * Corrected level = min(1, ceil((n+1)(1−α))/n), quantile with linear
    * interpolation (matches the oracle's quantile_cont).
    */
  def interval(cal: DataFrame, pred: DataFrame, yCol: String, yhatCol: String,
      alpha: Double = 0.1)(implicit pc: PanelCols): DataFrame = {
    val resid = abs(col(yCol) - col(yhatCol))
    val q = cal.groupBy(pc.idCol)
      .agg(count(lit(1)).as("__n"),
        sort_array(collect_list(resid)).as("__r"))
      .withColumn("__level",
        least(lit(1.0), ceil((col("__n") + 1) * lit(1.0 - alpha)) / col("__n")))
      // linear-interpolated quantile at __level over sorted residuals:
      // pos = (n-1)*level; lo = floor(pos); frac = pos - lo
      .withColumn("__pos", (col("__n") - 1) * col("__level"))
      .withColumn("__lo", floor(col("__pos")).cast("int"))
      .withColumn("__frac", col("__pos") - col("__lo"))
      .withColumn("qhat",
        element_at(col("__r"), col("__lo") + 1) * (lit(1.0) - col("__frac")) +
          element_at(col("__r"), least(col("__lo") + 2, size(col("__r")))) * col("__frac"))
      .select(pc.idCol, col("qhat"))
    pred.join(q, Seq(pc.id))
      .withColumn("y_hat_lower", col(yhatCol) - col("qhat"))
      .withColumn("y_hat_upper", col(yhatCol) + col("qhat"))
      .drop("qhat")
  }

  /** EnbPI-style bootstrap ensemble intervals (reference
    * probabilistic/conformal.py:190-416, simplified): B deterministic
    * block-bootstrap resamples of the calibration residuals → pooled
    * residual quantiles widen the point forecast. The B resamples are one
    * DataFrame (residuals × explode(b)) with per-(series, b) hash
    * re-ordering — distributed, not a driver loop over B models. */
  def enbpi(cal: DataFrame, pred: DataFrame, yCol: String, yhatCol: String,
      b: Int = 5, alpha: Double = 0.1)(implicit pc: PanelCols): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val resid = cal.select(pc.idCol, (col(yCol) - col(yhatCol)).as("__r"))
    val boots = resid
      .withColumn("__b", explode(sequence(lit(1), lit(b))))
      .withColumn("__keep", pmod(xxhash64(pc.idCol, col("__b"), col("__r")), lit(4)) =!= 0)
      .filter(col("__keep")) // ~75% subsample per replicate
    val q = boots.groupBy(pc.idCol)
      .agg(
        percentile(col("__r"), lit(alpha / 2)).as("__lo"),
        percentile(col("__r"), lit(1.0 - alpha / 2)).as("__hi"))
    pred.join(q, Seq(pc.id))
      .withColumn("y_hat_lower", col(yhatCol) + col("__lo"))
      .withColumn("y_hat_upper", col(yhatCol) + col("__hi"))
      .drop("__lo", "__hi")
  }
}
