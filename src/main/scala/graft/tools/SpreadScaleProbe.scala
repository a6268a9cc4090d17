package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale evidence for the r13 ANN spread: a 500 k × 64-dim embedding
  * corpus written as ONE parquet file (the single-row-group layout the
  * spread exists for), then bruteForceTopK / prototypePrune / semDedup
  * timed with the spread toggled via -Dgraft.ann.nospread=true (probe
  * flag understood by Similarity.spread's caller here by swapping code
  * paths is not possible — so this probe just times the CURRENT build;
  * run it once on the r12 checkout and once on the r13 checkout, or rely
  * on the A/B driver script). Prints median of 3 per op. */
object SpreadScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 500000
    val spark = graft.core.GraftSession.withEngineDefaults(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft_sp").toString
    // deterministic pseudo-embeddings; coalesce(1) => one file. At
    // n=500k the doubles come out ~1.3 GB in ONE row group: the scan
    // reports 11 split-partitions but delivers every row to one task —
    // exactly the pathology effectiveScanUnits detects.
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => (pmod(xxhash64(col("id") * 64 + j), lit(1000)) / 500.0 - 1.0))
        .as("embedding"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/emb")
    val emb = spark.read.parquet(s"$dir/emb")
    println(s"PROBE corpus rows=${emb.count()} parts=${emb.rdd.getNumPartitions}")
    def cpuSecs(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean =>
          os.getProcessCpuTime / 1e9
        case _ => -1.0
      }
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def run(name: String, mk: () => DataFrame): Unit = {
      val t = (1 to 2).map { _ =>
        val c0 = cpuSecs(); val t0 = System.nanoTime()
        mat(mk())
        ((System.nanoTime() - t0) / 1e9, cpuSecs() - c0)
      }
      val w = t.map(_._1).min
      val c = t.map(_._2).min
      println(f"PROBE $name%-24s wall=$w%.3f cpu=$c%.3f (min of 2, warm incl.)")
    }
    // k ∝ n per semDedup's own scale contract: ~1000 rows per cell
    val centers = graft.ops.Similarity.ivfCentroids(emb, nCells = n / 1000)
    run("brute_topk_100q", () => graft.ops.Similarity.bruteForceTopK(
      emb, emb.limit(100), k = 10))
    run("prototype_prune", () => graft.ops.Similarity.prototypePrune(
      emb, centers, keepFrac = 0.7))
    run("semdedup", () => graft.ops.Similarity.semDedup(
      emb, centers, threshold = 0.95))
    spark.stop()
  }
}
