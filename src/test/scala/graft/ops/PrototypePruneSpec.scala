package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Prototype-difficulty pruning (Sorscher et al. 2022): examples close to
  * their cluster prototype are easy/redundant; the hardest keepFrac
  * survive. Load-bearing: the kept set is exactly the top-difficulty
  * fraction at bin granularity, assignment ties break low, and the whole
  * path is deterministic under repartitioning. */
class PrototypePruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Two tight clusters on orthogonal axes + a few off-axis outliers. */
  private def corpus() = {
    import spark.implicits._
    // angular spread larger than the 1e-4 bin grid, so difficulties fan
    // out over many histogram bins (degenerate all-in-one-bin corpora
    // keep everything — bin-granular quantile semantics)
    val axisA = (0 until 20).map { i =>
      (i.toLong, Array(1.0, 0.05 * i, 0.0, 0.0))
    }
    val axisB = (20 until 40).map { i =>
      (i.toLong, Array(0.0, 0.0, 1.0, 0.05 * (i - 20)))
    }
    // outliers: mixed direction, far from both prototypes in angle
    val outliers = (40 until 44).map { i =>
      (i.toLong, Array(0.6, 0.5, 0.55, 0.45))
    }
    (axisA ++ axisB ++ outliers).toDF("vec_id", "embedding")
  }

  private val centers = Array(
    Array(1.0, 0.01, 0.0, 0.0),
    Array(0.0, 0.0, 1.0, 0.01))

  test("outliers score hardest and survive; tight members are pruned first") {
    val out = Similarity.prototypePrune(corpus(), centers, keepFrac = 0.2)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getAs[Double]("difficulty"), r.getAs[Boolean]("keep")))
      .toMap
    assert(out.size == 44)
    // cluster assignment: axis-A docs -> cell 0, axis-B -> cell 1
    (0 until 20).foreach(i => assert(out(i.toLong)._1 == 0, s"vec $i"))
    (20 until 40).foreach(i => assert(out(i.toLong)._1 == 1, s"vec $i"))
    // all outliers kept (they are the hardest ~9%), and every kept
    // difficulty >= every pruned difficulty (threshold semantics)
    (40 until 44).foreach(i => assert(out(i.toLong)._3, s"outlier $i pruned"))
    val kept = out.values.filter(_._3).map(_._2)
    val pruned = out.values.filterNot(_._3).map(_._2)
    assert(kept.min >= pruned.max - 1e-12,
      s"kept min ${kept.min} vs pruned max ${pruned.max}")
    // bin-granular quantile: kept share >= keepFrac
    assert(kept.size.toDouble / out.size >= 0.2)
  }

  test("keepFrac = 1 keeps everything; deterministic under repartitioning") {
    import org.apache.spark.sql.functions.col
    val df = corpus()
    val all = Similarity.prototypePrune(df, centers, keepFrac = 1.0).collect()
    assert(all.forall(_.getAs[Boolean]("keep")))
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.prototypePrune(d, centers, keepFrac = 0.5).collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getAs[Boolean]("keep"))).toMap
    assert(run(df.repartition(1)) == run(df.repartition(7, col("vec_id"))))
  }
}
