package graft.tools

import graft.core.IO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway calibration probe for graft.asof.autoSalt.minBytes: prints
  * the analyzed-plan size estimates the routing gate sees for each input
  * shape the bench/gate/scale legs feed the as-of paths. */
object AsofEstProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def est(name: String, l: DataFrame, r: DataFrame): Unit = {
      import org.apache.spark.sql.GraftPlanBridge
      val a = GraftPlanBridge.analyzed(l).stats.sizeInBytes
      val b = GraftPlanBridge.analyzed(r).stats.sizeInBytes
      println(f"EST $name%-28s left=$a%12d right=$b%12d sum=${a + b}%12d")
    }
    def synthPanel(nSeries: Int, len: Int): DataFrame =
      spark.range(nSeries.toLong * len).select(
        (col("id") / len).cast("long").as("user_id"),
        timestamp_micros((col("id") % len) * 3600000000L +
          lit(1704067200000000L)).cast("timestamp_ntz").as("ts"),
        lit(0L).as("event_id"),
        (sin(col("id") % len / lit(6.0)) * 10.0).as("value"))
    def sides(p: DataFrame): (DataFrame, DataFrame) = {
      val hr = (unix_micros(col("ts").cast("timestamp")) / 3600000000L) % 2
      (p.filter(hr === 0).select("user_id", "ts", "value"),
        p.filter(hr === 1).select(col("user_id"), col("ts"),
          col("value").as("rv")))
    }
    // bench main-suite shape (sf0.1 events, filtered halves)
    Seq("0.001", "0.01", "0.1").foreach { sf =>
      val ev = IO.events(spark, s"/root/testdata/sf$sf")
      val l = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
      val r = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
          col("value").as("click_value"))
      est(s"bench_events_sf$sf", l, r)
    }
    // synthesized panels (bench 10x scale legs)
    Seq(1000, 10000).foreach { n =>
      val (l, r) = sides(synthPanel(n, 1000))
      est(s"synth_panel_${n}x1000", l, r)
    }
    // parquet-written panel (DeepScale zipf legs, 1x)
    val dir = java.nio.file.Files.createTempDirectory("graft_est").toString
    synthPanel(1000, 1000).write.mode("overwrite").parquet(s"$dir/p1")
    val p1 = spark.read.parquet(s"$dir/p1")
    val (l1, r1) = sides(p1)
    est("parquet_panel_1000x1000", l1, r1)
    spark.stop()
  }
}
