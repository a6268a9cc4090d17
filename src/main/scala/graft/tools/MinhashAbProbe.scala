package graft.tools

import graft.core.IO
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession

/** r12 adjudication probe for the minhash_lsh bench drift (VERDICT r11
  * #3): the leg moved from its 1.9–2.6 s band to 2.18–2.81 s in r11, and
  * the only code change on the path was the plan-time stats probe
  * (ops/Dedup.scala auto-hint). Alternating repetitions (the r6/r7 bench
  * pattern, so no config systematically pays cold JIT) of the sf0.1 leg
  * under four configs: baseline, probe off, cache off, both off. Prints
  * per-rep times and medians; the verdict is read off the medians. */
object MinhashAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 7
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = IO.documents(spark, sfDir)

    def run(): Double = {
      val t0 = System.nanoTime()
      Dedup.minhashLsh(docs, threshold = 0.5)
        .write.format("noop").mode("overwrite").save()
      spark.sqlContext.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    val configs = Seq(
      ("baseline", false, false), ("noprobe", true, false),
      ("nocache", false, true), ("noboth", true, true))
    def set(noProbe: Boolean, noCache: Boolean): Unit = {
      if (noProbe) sys.props("graft.mh.noprobe") = "true"
      else sys.props.remove("graft.mh.noprobe")
      if (noCache) sys.props("graft.mh.nocache") = "true"
      else sys.props.remove("graft.mh.nocache")
    }
    // warmup (JIT + codegen, untimed)
    set(noProbe = false, noCache = false); run()
    val results = scala.collection.mutable.Map[String, Seq[Double]]()
    for (rep <- 1 to reps; (name, np, nc) <- configs) {
      set(np, nc)
      val t = run()
      results(name) = results.getOrElse(name, Seq.empty) :+ t
      println(f"rep $rep $name%-9s ${t}%6.2f s")
    }
    set(noProbe = false, noCache = false)
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    configs.foreach { case (name, _, _) =>
      val xs = results(name)
      println(f"MEDIAN $name%-9s ${med(xs)}%6.2f s  " +
        f"min=${xs.min}%5.2f max=${xs.max}%5.2f")
    }
    spark.stop()
  }
}
