package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: key correctness against a scalar reference
  * implementation, and the property the operator exists for — after
  * zorderBy, EVERY clustered dimension has tight per-partition min/max
  * ranges (the file-skipping statistic), unlike a single-column sort
  * where only the leading column prunes. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Scalar Morton reference. */
  private def morton(vals: Seq[Long], bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, b) =>
      vals.zipWithIndex.foldLeft(acc) { case (a, (v, i)) =>
        a | (((v >> b) & 1L) << (b * vals.size + i))
      }
    }

  test("zorderKey matches the scalar Morton reference") {
    import spark.implicits._
    val rows = for (x <- 0L until 33L; y <- 0L until 33L) yield (x, y)
    val out = rows.toDF("x", "y")
      .withColumn("z", Layout.zorderKey(Seq(col("x"), col("y")), bits = 8))
      .collect()
    out.foreach { r =>
      val expect = morton(Seq(r.getLong(0), r.getLong(1)), 8)
      assert(r.getLong(2) == expect, s"(${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("zorderKey guards: bit budget must fit a long") {
    intercept[IllegalArgumentException] {
      Layout.zorderKey(Seq(col("a"), col("b"), col("c"), col("d")), bits = 16)
    }
  }

  test("zorderBy: every dimension gets tight per-partition ranges") {
    import spark.implicits._
    // 128x128 uniform grid, 16 output files
    val n = 128L
    val grid = spark.range(n * n).select(
      (col("id") / n).cast("long").as("x"), (col("id") % n).as("y"))
    def spread(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val s = df.withColumn("__pid", spark_partition_id())
        .groupBy("__pid")
        .agg((max("x") - min("x")).as("rx"), (max("y") - min("y")).as("ry"))
        .agg(avg("rx").as("ax"), avg("ry").as("ay")).collect().head
      (s.getDouble(0), s.getDouble(1))
    }
    val (zx, zy) = spread(Layout.zorderBy(grid, Seq("x", "y"), numFiles = 16, bits = 8))
    // single-column sort: x prunes perfectly, y not at all
    val (sx, sy) = spread(grid.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    // z-order: BOTH dims at/below half the global range (127). A perfect
    // 16-tile z-layout gives 31 per axis; repartitionByRange's sampled
    // bounds straddle tile edges, so the practical envelope is ~40-55.
    assert(zx <= 64 && zy <= 64, s"z-order ranges too wide: x=$zx y=$zy")
    assert(sy > 100, s"baseline y-range should be ~global, got $sy")
    assert(zx + zy < (sx + sy + 127) * 0.6,
      s"z-order ($zx,$zy) should beat single-column sort ($sx,$sy≈127)")
  }

  test("writeBucketed: co-bucketed join and agg run with ZERO exchanges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bkt").toString
    val store = (1 to 2000).map(i => (i.toLong % 97, i.toLong, s"sig$i"))
      .toDF("fp", "doc_id", "sig")
    val batch = (1 to 100).map(i => (i.toLong % 97, i.toLong + 10000))
      .toDF("fp", "new_id")
    Layout.writeBucketed(store, "bkt_store", Seq("fp"), nBuckets = 8,
      path = Some(s"$dir/store"))
    Layout.writeBucketed(batch, "bkt_batch", Seq("fp"), nBuckets = 8,
      path = Some(s"$dir/batch"))
    val oldThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join exercises the bucketed SMJ path
      // (a BroadcastExchange is not a shuffle, but it also isn't the
      // co-located plan this layout exists to produce)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_store")
        .join(spark.table("bkt_batch"), "fp")
      joined.collect()
      val jPlan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!jPlan.contains("Exchange"),
        s"co-bucketed equi-join must not shuffle:\n$jPlan")
      // aggregation on the bucket key: no exchange either
      val agg = spark.table("bkt_store").groupBy("fp")
        .agg(count(lit(1)).as("n"))
      agg.collect()
      val aPlan = agg.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!aPlan.contains("Exchange"),
        s"bucket-key aggregation must not shuffle:\n$aPlan")
      // values are the plain join's
      val expect = store.join(batch, "fp").count()
      assert(joined.count() === expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
      spark.sql("DROP TABLE IF EXISTS bkt_store")
      spark.sql("DROP TABLE IF EXISTS bkt_batch")
    }
  }

  test("zorderRank: linear-bin rank is deterministic and bounded") {
    import spark.implicits._
    val df = Seq(0.0, 1.0, 2.5, 9.9, 10.0).toDF("v")
    val out = Layout.zorderRank(df, "v", buckets = 4).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(out(0.0) == 0L && out(10.0) == 3L)
    assert(out.values.forall(b => b >= 0 && b < 4))
    // degenerate constant column → all rank 0
    val const = Seq(5.0, 5.0).toDF("v")
    assert(Layout.zorderRank(const, "v", 4).collect().forall(_.getLong(1) == 0L))
  }
}
