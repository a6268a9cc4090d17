package graft.tools

import graft.ops.TemporalJoins
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adjudication probe for the r9 bench anomaly: asof_native's 10× leg
  * recorded 6.80× while the composed window form recorded 2.69× on the
  * same panel. Times both forms at 1k and 10k series, several
  * alternating repetitions per cell (so neither form systematically
  * pays the cold-JIT run), and prints per-rep times + medians so the
  * ratio can be attributed to the plan or to measurement noise. */
object AsofScaleProbe {
  private def synthPanel(spark: SparkSession, nSeries: Int, len: Int): DataFrame =
    spark.range(nSeries.toLong * len).select(
      (col("id") / len).cast("long").as("user_id"),
      timestamp_micros((col("id") % len) * 3600000000L +
        lit(1704067200000000L)).cast("timestamp_ntz").as("ts"),
      (sin(col("id") % len / lit(6.0)) * 10.0 +
        pmod(xxhash64(col("id")), lit(1000)) / lit(1000.0)).as("value"))

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def build(nSeries: Int, native: Boolean): DataFrame = {
      val p = synthPanel(spark, nSeries, 1000)
      val hr = (unix_micros(col("ts").cast("timestamp")) / 3600000000L) % 2
      val l = p.filter(hr === 0).select("user_id", "ts", "value")
      val r = p.filter(hr === 1).select(col("user_id"), col("ts"),
        col("value").as("rv"))
      if (native) TemporalJoins.asofJoinNative(l, r, Seq("user_id"), "ts", "ts", Seq("rv"))
      else TemporalJoins.asofJoin(l, r, Seq("user_id"), "ts", "ts", Seq("rv"))
    }
    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup both forms (JIT + codegen, untimed)
    time(build(100, native = false)); time(build(100, native = true))

    val cells = Seq(("composed", false, 1000), ("native", true, 1000),
      ("composed", false, 10000), ("native", true, 10000))
    val results = scala.collection.mutable.Map[(String, Int), Seq[Double]]()
    for (rep <- 1 to reps; (name, nat, n) <- cells) {
      val t = time(build(n, nat))
      results((name, n)) = results.getOrElse((name, n), Seq.empty) :+ t
      println(f"rep $rep $name%-9s n=$n%-6d ${t}%6.2f s")
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    for ((name, _, n) <- cells)
      println(f"MEDIAN $name%-9s n=$n%-6d ${med(results((name, n)))}%6.2f s")
    val cr = med(results(("composed", 10000))) / med(results(("composed", 1000)))
    val nr = med(results(("native", 10000))) / med(results(("native", 1000)))
    println(f"RATIO composed 10x: $cr%.2f   native 10x: $nr%.2f")
    spark.stop()
  }
}
