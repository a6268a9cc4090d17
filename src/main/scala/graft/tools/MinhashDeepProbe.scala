package graft.tools

import graft.ops.Dedup
import graft.core.IO
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage probe for the 100x minhash_lsh decade ratio: times the
  * signature pass, the band-bucket statistics, and the full operator
  * at 1x vs Nx, plus the persisted-signature variant (the
  * minhashSignatures incremental pattern) to separate signature
  * recompute from join cost. */
object MinhashDeepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = IO.documents(spark, sfDir).select("doc_id", "text", "source", "lang")
    val dir = java.nio.file.Files.createTempDirectory("mh_probe").toString
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    try Seq(1, factor).foreach { f =>
      (0 until f).map(DeepScale.replica(docs, _, f)).reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$dir/d$f")
      val d = spark.read.parquet(s"$dir/d$f")
      val tSig = t {
        d.select(col("doc_id"),
          Dedup.minhashSigFromText(col("text"), 5, 64).as("sig"))
          .write.format("noop").mode("overwrite").save()
      }
      // band-bucket volume: candidate pairs BEFORE verification —
      // measured over a MATERIALIZED signature cache so the timed
      // aggregation doesn't re-run (and double-count) the sig pass
      val sigs = d.select(col("doc_id").as("__id"),
        Dedup.minhashSigFromText(col("text"), 5, 64).as("__sig")).cache()
      sigs.count()
      val banded = sigs.select(col("__id"), posexplode(
        array((0 until 16).map(b =>
          Dedup.packedBandKey(col("__sig"), b, 4)): _*))
        .as(Seq("__band", "__bk")))
      var stats: org.apache.spark.sql.Row = null
      val tBand = t {
        stats = banded.groupBy("__band", "__bk")
          .agg(count(lit(1)).as("n")).filter(col("n") > 1)
          .agg(coalesce(count(lit(1)), lit(0L)).as("buckets"),
            coalesce(sum(col("n") * (col("n") - 1) / 2), lit(0L)).as("cp"),
            coalesce(max("n"), lit(0L)).as("mx")).collect()(0)
      }
      sigs.unpersist(blocking = true)
      val tFull = t {
        Dedup.minhashLsh(d, threshold = 0.5)
          .write.format("noop").mode("overwrite").save()
      }
      spark.sqlContext.clearCache()
      // warm-signature variant: materialize the signature cache FIRST,
      // so the triple-use plan can never evict-and-recompute the
      // signature pass mid-action — the production pattern
      // (minhashSignatures persisted state) measured in place
      val warm = d.select(col("doc_id").as("__id"),
        Dedup.minhashSigFromText(col("text"), 5, 64).as("__sig")).cache()
      warm.count()
      val tWarm = t {
        Dedup.minhashLsh(d, threshold = 0.5)
          .write.format("noop").mode("overwrite").save()
      }
      warm.unpersist(blocking = true)
      spark.sqlContext.clearCache()
      println(f"[probe] f=$f%3d sig=$tSig%.1fs bandStats=$tBand%.1fs full=$tFull%.1fs warmFull=$tWarm%.1fs " +
        s"buckets>1=${stats.get(0)} candPairs=${stats.get(1)} maxBucket=${stats.get(2)}")
    } finally {
      spark.stop()
      DeepScale.cleanupScratch(dir)
    }
  }
}
