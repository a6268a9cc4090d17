package graft.tools

import graft.core.IO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway probe: where do the extra cpu-seconds of the ANN spread go?
  * Times (wall, process-cpu) for the prototype-prune shape at several
  * repartition widths, plus the bare exchange and the bare UDF. */
object SpreadProbe {
  private def cpuSecs(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getProcessCpuTime / 1e9
      case _ => -1.0
    }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.withEngineDefaults(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embB = IO.embeddings(spark, "/root/testdata/sf0.1")
      .select("vec_id", "embedding").cache()
    embB.count()
    val centers = graft.ops.Similarity.ivfCentroids(embB)
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def run(name: String, mk: () => DataFrame): Unit = {
      // warm once, then 5 timed
      mat(mk())
      val t = (1 to 5).map { _ =>
        val c0 = cpuSecs(); val t0 = System.nanoTime()
        mat(mk())
        ((System.nanoTime() - t0) / 1e9, cpuSecs() - c0)
      }
      val w = t.map(_._1).sorted.apply(2)
      val c = t.map(_._2).sorted.apply(2)
      println(f"PROBE $name%-28s wall=$w%.3f cpu=$c%.3f (med of 5)")
    }
    val bc = spark.sparkContext.broadcast(centers)
    val assign = udf((v: Array[Double]) => {
      val cs = bc.value
      var best = 0; var bd = Double.MaxValue
      var cI = 0
      while (cI < cs.length) {
        var dd = 0.0; var j = 0
        val cv = cs(cI)
        while (j < cv.length && j < v.length) { val t = v(j) - cv(j); dd += t * t; j += 1 }
        if (dd < bd) { bd = dd; best = cI }
        cI += 1
      }
      best
    })
    def base = embB.select(col("vec_id"),
      col("embedding").cast("array<double>").as("__v"))
    run("udf_1part", () => base.withColumn("c", assign(col("__v"))))
    run("exchange32_only", () => base.repartition(32, col("vec_id")))
    run("udf_after_exchange32", () => base.repartition(32, col("vec_id"))
      .withColumn("c", assign(col("__v"))))
    run("udf_after_exchange8", () => base.repartition(8, col("vec_id"))
      .withColumn("c", assign(col("__v"))))
    run("udf_after_exchange4", () => base.repartition(4, col("vec_id"))
      .withColumn("c", assign(col("__v"))))
    run("full_prune_now", () =>
      graft.ops.Similarity.prototypePrune(embB, centers, keepFrac = 0.7))

    // prune structure, piecewise, with and without the spread exchange
    val assign2 = udf((v: Array[Double]) => {
      val cs = bc.value
      var best = 0; var bd = Double.MaxValue
      var cI = 0
      while (cI < cs.length) {
        var dd = 0.0; var j = 0
        val cv = cs(cI)
        while (j < cv.length && j < v.length) { val t = v(j) - cv(j); dd += t * t; j += 1 }
        if (dd < bd) { bd = dd; best = cI }
        cI += 1
      }
      (best, 1.0 - bd)
    })
    def scoredOf(spreadN: Int): DataFrame = {
      val in = if (spreadN > 0) base.repartition(spreadN, col("vec_id")) else base
      in.withColumn("__p", assign2(col("__v")))
        .select(col("vec_id"), col("__p._1").as("cell"),
          (lit(1.0) - col("__p._2")).as("difficulty"))
    }
    def pruneOf(spreadN: Int): DataFrame = {
      val scored = scoredOf(spreadN)
      val Win = org.apache.spark.sql.expressions.Window
      val p1 = graft.core.Panel.tinyFramePartition(col("__bin"))
      val bins = scored.groupBy(round(col("difficulty"), 4).as("__bin"))
        .agg(count(lit(1)).as("__c"))
      val cum = bins.withColumn("__cum",
        sum("__c").over(Win.partitionBy(p1).orderBy("__bin")
            .rowsBetween(Win.unboundedPreceding, Win.currentRow)) /
          sum("__c").over(Win.partitionBy(p1)))
      val thr = cum.agg(min(when(col("__cum") >= 0.3, col("__bin"))).as("__t"))
      scored.crossJoin(broadcast(thr))
        .withColumn("keep", round(col("difficulty"), 4) >= col("__t"))
        .drop("__t")
    }
    run("bins_only_spread32", () => scoredOf(32)
      .groupBy(round(col("difficulty"), 4).as("__bin")).agg(count(lit(1))))
    run("prune_shape_nospread", () => pruneOf(0))
    run("prune_shape_spread32", () => pruneOf(32))
    run("prune_shape_spread8", () => pruneOf(8))
    spark.stop()
  }
}
