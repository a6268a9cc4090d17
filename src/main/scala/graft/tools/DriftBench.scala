package graft.tools

import graft.core.PanelCols
import graft.ops.{Changepoint, Distances, ForecastBaselines}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isolated re-bench of the three round-6 drift suspects (VERDICT r6 ask
  * #5): ets_panel_1000x1000 (+21%), mann_kendall_panel (+16%),
  * pairwise_dtw_band_500x100 (+17%). Exact Bench bodies, 7 timed runs
  * each in a fresh JVM with no co-resident queries — the KnnBench
  * adjudication methodology. */
object DriftBench {

  private implicit val PC: PanelCols =
    PanelCols("user_id", "ts", "value", tieBreak = Seq("event_id"))

  private def synthPanel(spark: SparkSession, nSeries: Int, len: Int): DataFrame =
    spark.range(nSeries.toLong * len).select(
      (col("id") / len).cast("long").as("user_id"),
      timestamp_micros((col("id") % len) * 3600000000L +
        lit(1704067200000000L)).cast("timestamp_ntz").as("ts"),
      lit(0L).as("event_id"),
      (sin(col("id") % len / lit(6.0)) * 10.0 +
        (col("id") % len) * 0.01 +
        when(col("id") % len >= len / 2, 5.0).otherwise(0.0) +
        pmod(xxhash64(col("id")), lit(1000)) / lit(1000.0)).as("value"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val suite: Seq[(String, () => Unit)] = Seq(
      "ets_panel_1000x1000" -> (() => mat({
        val p = synthPanel(spark, 1000, 1000)
        ForecastBaselines.multiForecast(p, h = 12, Seq(
          "ses" -> (ys => graft.kernels.Ets.ses(ys, 0.3, 12)),
          "hw" -> (ys => graft.kernels.Ets.holtWinters(ys, 0.3, 0.1, 0.1, 12, true, 12))))
      })),
      "mann_kendall_panel" -> (() => mat(
        Changepoint.mannKendall(synthPanel(spark, 1000, 1000)))),
      "pairwise_dtw_band_500x100" -> (() => mat(
        Distances.pairwise(synthPanel(spark, 500, 100), "dtw",
          Map("window" -> 10.0)))))
    // shared warmup, as in Bench
    mat(synthPanel(spark, 10, 100))
    for ((name, run) <- suite) {
      val times = (1 to 7).map { i =>
        val t0 = System.nanoTime()
        run()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"$name run $i: $t%.3f s")
        t
      }
      println(f"$name median: ${times.sorted.apply(times.size / 2)}%.3f s")
    }
    spark.stop()
  }
}
