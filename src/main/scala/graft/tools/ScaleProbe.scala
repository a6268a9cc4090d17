package graft.tools

import graft.core.IO
import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe for the r9 scale-proof minhash anomaly: stage-level
  * cardinalities and timings on the raw corpus vs the remapped
  * replicate(1) corpus. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = IO.documents(spark, dir)

    // current scale-proof fixture: bijective per-domain character cipher
    // (see Bench.repDocs — the earlier word-suffix remap manufactured
    // 4.7M fake near-dup pairs; this probe found it)
    def repDocs(reps: Int): DataFrame = {
      val lower = "abcdefghijklmnopqrstuvwxyz"
      val upper = lower.toUpperCase
      val digits = "0123456789"
      def rot(s: String, r: Int) = s.drop(r % s.length) + s.take(r % s.length)
      val from = lower + upper + digits
      val ciphered = (1 until reps).foldLeft(
        when(col("__rep") === 0, col("text"))) { (acc, r) =>
        acc.when(col("__rep") === r,
          translate(col("text"), from, rot(lower, r) + rot(upper, r) + rot(digits, r)))
      }
      docs.withColumn("__rep", explode(sequence(lit(0), lit(reps - 1))))
        .withColumn("doc_id", col("doc_id").cast("long") * reps + col("__rep"))
        .withColumn("text", ciphered.otherwise(col("text")))
        .drop("__rep")
    }

    val tmp = java.nio.file.Files.createTempDirectory("probe").toString
    repDocs(1).write.mode("overwrite").parquet(s"$tmp/docs1")
    val docs1 = spark.read.parquet(s"$tmp/docs1")

    def stats(name: String, df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$name: rows=$n%d  chars=${df.agg(sum(length(col("text")))).head.getLong(0)}%d")
      val sigs = df.select(col("doc_id"),
        Dedup.minhashSigFromText(col("text"), 5, 64).as("__sig"))
      sigs.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      println(f"  sig pass: ${(t1 - t0) / 1e9}%.2f s")
      val full = Dedup.minhashLsh(df, threshold = 0.5)
      val np = full.count()
      val t2 = System.nanoTime()
      println(f"  full lsh: ${(t2 - t1) / 1e9}%.2f s, verified pairs=$np%d")
    }
    stats("raw  ", docs)
    stats("docs1", docs1)
    spark.stop()
  }
}
