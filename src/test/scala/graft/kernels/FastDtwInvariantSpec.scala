package graft.kernels

import graft.TestSpark
import graft.core.{IO, Panel, PanelCols}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Numeric invariants for the FastDTW approximation on the real test
  * panel (VERDICT r6 ask #4 — the one elastic kernel that is neither
  * oracled nor invariant-checked elsewhere: its multiresolution
  * recursion is not SQL-replayable, but Salzberg & Chan's published
  * guarantee shape is checkable against exact DTW):
  *   1. admissible window ⇒ fastDtw ≥ dtw − ε for every radius;
  *   2. approximation error shrinks (in the mean) as radius grows;
  *   3. radius ≥ series length ⇒ exact equality.
  */
class FastDtwInvariantSpec extends AnyFunSuite {

  private lazy val series: Seq[Array[Double]] = {
    implicit val pc: PanelCols =
      PanelCols("user_id", "ts", "value", tieBreak = Seq("event_id"))
    Panel.grouped(IO.events(TestSpark.spark, "/root/testdata/sf0.001")
        .filter(col("user_id") < 10))
      .select(col("user_id"), col("ys")).collect().toSeq
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
  }

  private lazy val pairs = for {
    i <- series.indices; j <- i + 1 until series.length
  } yield (series(i), series(j))

  test("fastDtw never undercuts exact dtw, at any radius") {
    for ((a, b) <- pairs; r <- Seq(1, 2, 4, 8)) {
      val exact = Elastic.dtw(a, b)
      val approx = Elastic.fastDtw(a, b, r)
      assert(approx >= exact - 1e-9,
        s"fastDtw(r=$r)=$approx < dtw=$exact")
    }
  }

  test("mean approximation error shrinks as the radius grows") {
    val meanErr = Seq(1, 2, 4, 8).map { r =>
      r -> pairs.map { case (a, b) =>
        Elastic.fastDtw(a, b, r) - Elastic.dtw(a, b)
      }.sum / pairs.length
    }
    for (Seq((r0, e0), (r1, e1)) <- meanErr.sliding(2))
      assert(e1 <= e0 + 1e-12, s"mean error grew from r=$r0 ($e0) to r=$r1 ($e1)")
    // and the widest tested radius is a close approximation outright
    val exactMean = pairs.map { case (a, b) => Elastic.dtw(a, b) }.sum / pairs.length
    assert(meanErr.last._2 <= 0.05 * exactMean + 1e-9,
      s"radius-8 mean error ${meanErr.last._2} above 5% of mean dtw $exactMean")
  }

  test("radius >= series length collapses to exact dtw") {
    for ((a, b) <- pairs.take(10)) {
      val r = math.max(a.length, b.length)
      assert(Elastic.fastDtw(a, b, r) == Elastic.dtw(a, b))
    }
  }
}
