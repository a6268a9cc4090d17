package graft.ops

import graft.core.{Panel, PanelCols}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Baseline + exponential-smoothing forecasts emitting the reference's
  * `[id, ds, y_hat]` shape with `h` future rows per series and timestamps
  * extrapolated at the inferred frequency (reference
  * polars_ts/models/baselines.py, exponential_smoothing.py).
  *
  * naive / seasonal-naive / moving-average are pure Spark SQL (one groupBy
  * + explode(sequence) — no per-series loops, no UDFs). The ETS family
  * folds the kernel over the grouped array form inside a UDF: one row per
  * series in, h rows out — the shuffle is the single groupBy(id).
  */
object ForecastBaselines {

  /** `[id, step, ds]` future scaffold joined with a per-series aggregate. */
  private def withFuture(df: DataFrame, agg: DataFrame, h: Int)(
      implicit pc: PanelCols): DataFrame =
    Panel.futureDates(df, h).join(agg, Seq(pc.id))

  /** Repeat the last observed value h steps (baselines.py:17-65). */
  def naive(df: DataFrame, h: Int)(implicit pc: PanelCols): DataFrame = {
    val lastY = df.groupBy(pc.idCol)
      .agg(max_by(pc.targetCol, struct(pc.orderCols: _*)).as("y_hat"))
    withFuture(df, lastY, h).select(pc.idCol, col("step"), pc.timeCol, col("y_hat"))
  }

  /** Cycle the last `seasonLength` values (baselines.py:68-123). */
  def seasonalNaive(df: DataFrame, h: Int, seasonLength: Int)(
      implicit pc: PanelCols): DataFrame = {
    val tail = df.groupBy(pc.idCol)
      .agg(slice(
        sort_array(collect_list(struct(
          pc.orderCols :+ pc.targetCol.cast("double").as(pc.target): _*))),
        -seasonLength, seasonLength).as("__tail"))
      .select(pc.idCol, col("__tail." + pc.target).as("__season"))
    withFuture(df, tail, h)
      .withColumn("y_hat", element_at(col("__season"),
        ((col("step") - 1) % size(col("__season")) + 1).cast("int")))
      .select(pc.idCol, col("step"), pc.timeCol, col("y_hat"))
  }

  /** Flat mean of the last `window` values (baselines.py:126-178). */
  def movingAverage(df: DataFrame, h: Int, window: Int)(
      implicit pc: PanelCols): DataFrame = {
    val tail = df.groupBy(pc.idCol)
      .agg(slice(
        sort_array(collect_list(struct(
          pc.orderCols :+ pc.targetCol.cast("double").as(pc.target): _*))),
        -window, window).as("__tail"))
      .select(pc.idCol,
        (aggregate(col("__tail." + pc.target), lit(0.0), _ + _) /
          size(col("__tail." + pc.target))).as("y_hat"))
    withFuture(df, tail, h).select(pc.idCol, col("step"), pc.timeCol, col("y_hat"))
  }

  import graft.kernels.{Ets, FftForecast}

  /** Run several named forecast kernels from ONE grouped pass over the
    * panel — a single shuffle produces every model's h-step forecast plus
    * the future-timestamp scaffold (last ts and min-delta frequency come
    * from the already-sorted ts array, not a second window+groupBy scan).
    * Output: `[id, model, step, ds, y_hat]`. */
  def multiForecast(df: DataFrame, h: Int,
      kernels: Seq[(String, Array[Double] => Array[Double])])(
      implicit pc: PanelCols): DataFrame = {
    val fns = kernels.map(_._2)
    val fcUdf = udf((ys: Seq[Double]) => {
      val arr = ys.toArray
      fns.map(f => f(arr))
    })
    val nameArr = array(kernels.map(k => lit(k._1)): _*)
    Panel.grouped(df)
      .withColumn("__us", transform(col("ts"), t => unix_micros(t.cast("timestamp"))))
      .select(pc.idCol,
        fcUdf(col("ys")).as("__fcs"),
        element_at(col("__us"), -1).as("__last_us"),
        // min successive delta: us is time-sorted, so pairwise diffs of the
        // array replicate seriesMeta's lag-window min (zip_with pads the
        // tail with null, which array_min ignores)
        array_min(zip_with(
          slice(col("__us"), lit(2), greatest(size(col("__us")) - 1, lit(0))),
          col("__us"), (a, b) => a - b)).as("__freq"))
      .select(pc.idCol, posexplode(col("__fcs")).as(Seq("__m", "__fc")),
        col("__last_us"), col("__freq"))
      .select(pc.idCol, element_at(nameArr, col("__m") + 1).as("model"),
        col("__fc"), col("__last_us"), col("__freq"),
        explode(sequence(lit(1L), lit(h.toLong))).as("step"))
      .withColumn(pc.time,
        timestamp_micros(col("__last_us") + col("step") * col("__freq"))
          .cast("timestamp_ntz"))
      .select(pc.idCol, col("model"), col("step"), pc.timeCol,
        element_at(col("__fc"), col("step").cast("int")).as("y_hat"))
  }

  private def kernelForecast(df: DataFrame, h: Int,
      fc: Array[Double] => Array[Double])(implicit pc: PanelCols): DataFrame =
    multiForecast(df, h, Seq("" -> fc))
      .select(pc.idCol, col("step"), pc.timeCol, col("y_hat"))

  /** Simple exponential smoothing → flat forecast (src/ets.rs:12-18). */
  def ses(df: DataFrame, h: Int, alpha: Double = 0.3)(
      implicit pc: PanelCols): DataFrame =
    kernelForecast(df, h, ys => Ets.ses(ys, alpha, h))

  /** Holt level+trend linear extrapolation (src/ets.rs:23-35). */
  def holt(df: DataFrame, h: Int, alpha: Double = 0.3, beta: Double = 0.1)(
      implicit pc: PanelCols): DataFrame =
    kernelForecast(df, h, ys => Ets.holt(ys, alpha, beta, h))

  /** Holt-Winters seasonal (src/ets.rs:39-110). */
  def holtWinters(df: DataFrame, h: Int, m: Int, alpha: Double = 0.3,
      beta: Double = 0.1, gamma: Double = 0.1, additive: Boolean = true)(
      implicit pc: PanelCols): DataFrame =
    kernelForecast(df, h, ys => Ets.holtWinters(ys, alpha, beta, gamma, m, additive, h))

  /** Top-k-harmonic FFT extrapolation (baselines.py:181-255). */
  def fft(df: DataFrame, h: Int, nHarmonics: Int = 5)(
      implicit pc: PanelCols): DataFrame =
    kernelForecast(df, h, ys => FftForecast.forecast(ys, h, nHarmonics))
}
