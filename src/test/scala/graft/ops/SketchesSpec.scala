package graft.ops

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch tier: the bounds and merge laws the 100 TB story rests on —
  * CMS one-sided error and additive shard merge, HLL max-merge register
  * union and estimate accuracy, both independent of partitioning. */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus(): DataFrame = {
    import spark.implicits._
    // zipf-ish: token w0 very frequent, long tail of rare tokens
    val rows = (0 until 200).map { i =>
      val words = (0 until 40).map { j =>
        val r = (i * 31 + j * 17) % 100
        if (r < 40) "w0" else if (r < 60) "w1" else if (r < 70) "w2"
        else s"rare${(i * 41 + j * 13) % 500}"
      }
      (i.toLong, words.mkString(" "))
    }
    rows.toDF("doc_id", "text")
  }

  test("CMS never undercounts and nails the heavy head") {
    val df = corpus()
    val est = Sketches.cmsTokenEstimates(df, depth = 4, width = 512).collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      val (e, x) = (r.getAs[Long]("est"), r.getAs[Long]("exact"))
      assert(e >= x, s"CMS undercounted ${r.getAs[String]("token")}: $e < $x")
    }
    // heavy hitters at 5%: exactly the planted head tokens, with
    // estimates within the eps*N overshoot budget
    val hh = Sketches.cmsHeavyHitters(df, minFrac = 0.05).collect()
      .map(r => r.getAs[String]("token")).toSet
    assert(hh.contains("w0") && hh.contains("w1"))
    assert(!hh.exists(_.startsWith("rare")))
  }

  test("CMS shard sketches sum to the full-corpus sketch (cmsMerge)") {
    val df = corpus()
    val full = Sketches.cmsSketch(df).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getAs[Long]("cnt")).toMap
    val merged = Sketches.cmsMerge(
        Sketches.cmsSketch(df.filter(col("doc_id") < 100)),
        Sketches.cmsSketch(df.filter(col("doc_id") >= 100)))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getAs[Long]("cnt")).toMap
    assert(merged == full)
  }

  test("HLL registers max-merge: union sketch == register-wise max") {
    val df = corpus().withColumn("source",
      when(col("doc_id") < 100, "a").otherwise("b"))
    val toks = df.select(col("source"),
      explode(split(lower(col("text")), "[^a-z0-9]+")).as("token"))
      .filter(col("token") =!= "")
    val perSource = Sketches.hllRegisters(toks, "source", col("token"))
    val union = Sketches.hllRegisters(
      toks.withColumn("source", lit("all")), "source", col("token"))
      .collect().map(r => r.getLong(1) -> r.getAs[Int]("max_rank")).toMap
    val maxMerged = perSource.groupBy("register")
      .agg(max("max_rank").as("mr")).collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("mr")).toMap
    assert(maxMerged == union)
  }

  test("hllMerge: persisted state + new batch == full-stream registers") {
    val df = corpus().withColumn("source", lit("all"))
    val toks = (d: org.apache.spark.sql.DataFrame) => d.select(col("source"),
      explode(split(lower(col("text")), "[^a-z0-9]+")).as("token"))
      .filter(col("token") =!= "")
    val full = Sketches.hllRegisters(toks(df), "source", col("token"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        r.getAs[Int]("max_rank")).toMap
    val merged = Sketches.hllMerge(
        Sketches.hllRegisters(toks(df.filter(col("doc_id") < 100)),
          "source", col("token")),
        Sketches.hllRegisters(toks(df.filter(col("doc_id") >= 100)),
          "source", col("token")))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        r.getAs[Int]("max_rank")).toMap
    assert(merged == full)
    // merged estimate == full estimate (what the consumer reads)
    val estA = Sketches.hllEstimate(Sketches.hllMerge(
      Sketches.hllRegisters(toks(df.filter(col("doc_id") < 100)),
        "source", col("token")),
      Sketches.hllRegisters(toks(df.filter(col("doc_id") >= 100)),
        "source", col("token"))), "source").collect()
    val estB = Sketches.hllEstimate(
      Sketches.hllRegisters(toks(df), "source", col("token")), "source")
      .collect()
    assert(estA.map(_.toString).sameElements(estB.map(_.toString)))
  }

  test("HLL estimate lands near the exact distinct count") {
    val rows = Sketches.hllDistinctTokens(
      corpus().withColumn("source", lit("all"))).collect()
    assert(rows.length == 1)
    val r = rows.head
    val (est, exact) = (r.getAs[Double]("est"), r.getAs[Long]("exact"))
    assert(exact > 300, s"fixture should have a wide vocabulary, got $exact")
    // b=8 → standard error ~1.04/sqrt(256) ≈ 6.5%; allow 3 sigma
    assert(math.abs(est - exact) / exact < 0.2, s"est $est vs exact $exact")
  }

  test("sketches are invariant under repartitioning") {
    val df = corpus()
    val a = Sketches.cmsTokenEstimates(df).orderBy("token").collect().toSeq
    val b = Sketches.cmsTokenEstimates(df.repartition(13)).orderBy("token")
      .collect().toSeq
    assert(a == b)
    val ha = Sketches.hllDistinctTokens(df.withColumn("source", lit("s")))
      .collect().toSeq
    val hb = Sketches.hllDistinctTokens(
      df.repartition(7).withColumn("source", lit("s"))).collect().toSeq
    assert(ha == hb)
  }
}
