package graft.tools

import graft.core.IO
import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated knn_brute micro-bench (VERDICT r5 ask #5): 7 timed runs of the
  * exact bench body, no co-resident queries, to adjudicate the r5
  * 2.09→2.51 s move as real vs contention noise. */
object KnnBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val times = (1 to 7).map { i =>
      val t0 = System.nanoTime()
      val emb = IO.embeddings(spark, sfDir)
      Similarity.bruteForceTopK(emb, emb.limit(100), k = 10)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"run $i: $t%.3f s")
      t
    }
    println(f"median: ${times.sorted.apply(times.size / 2)}%.3f s")
    spark.stop()
  }
}
