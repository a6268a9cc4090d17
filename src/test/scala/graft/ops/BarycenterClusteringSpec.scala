package graft.ops

import graft.TestSpark
import graft.core.PanelCols
import graft.kernels.{Barycenter, Elastic}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's KASBA/DBA recovery cases
  * (src/kasba/tests.rs, tests/clustering/): well-separated synthetic
  * groups must come back as distinct clusters; barycenters must sit
  * between members. */
class BarycenterClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit val pc: PanelCols = PanelCols()

  // three well-separated shapes: flat-low, flat-high, ramp
  private def shapePanel(perGroup: Int = 5, len: Int = 24) = {
    import spark.implicits._
    val rng = new scala.util.Random(4L)
    val rows = for {
      (base, g) <- Seq(0.0, 50.0, 100.0).zipWithIndex
      s <- 0 until perGroup
      i <- 0 until len
    } yield {
      val v = base + (if (g == 2) i.toDouble else 0.0) + rng.nextGaussian() * 0.3
      (s"g${g}_$s", i, v)
    }
    rows.toDF("unique_id", "__h", "y")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L))
      .drop("__h")
  }

  private def purity(labels: Map[String, Int]): Boolean = {
    val groups = labels.groupBy(_._1.split("_")(0)).view.mapValues(_.values.toSet)
    groups.values.forall(_.size == 1) &&
      groups.values.toSeq.combinations(2).forall { case Seq(a, b) => (a & b).isEmpty }
  }

  test("kmeansDba recovers three separated groups") {
    val labels = Clustering.kmeansDba(shapePanel(), k = 3, maxIter = 5)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(labels.size == 15)
    assert(purity(labels), s"labels $labels")
  }

  test("kasba recovers three separated groups") {
    val labels = Clustering.kasbaCluster(shapePanel(), k = 3, maxIter = 5)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(labels.size == 15)
    assert(purity(labels), s"labels $labels")
  }

  test("hdbscan finds dense groups and flags scattered noise") {
    // two tight groups of 6 + 3 far-flung noise points
    val n = 15
    val m = Array.fill(n, n)(0.0)
    def d(i: Int, j: Int, v: Double): Unit = { m(i)(j) = v; m(j)(i) = v }
    for (i <- 0 until 6; j <- i + 1 until 6) d(i, j, 1.0)
    for (i <- 6 until 12; j <- i + 1 until 12) d(i, j, 1.0)
    for (i <- 0 until 6; j <- 6 until 12) d(i, j, 50.0)
    for (i <- 12 until n; j <- 0 until n if j != i) d(i, j, 100.0 + i + j)
    val labels = graft.kernels.Cluster.hdbscan(m, minClusterSize = 4,
      minSamplesOpt = Some(3))
    assert(labels.slice(0, 6).distinct.length == 1, labels.mkString(","))
    assert(labels.slice(6, 12).distinct.length == 1, labels.mkString(","))
    assert(labels(0) != labels(6) && labels(0) >= 0 && labels(6) >= 0,
      labels.mkString(","))
    assert(labels.slice(12, 15).forall(_ == -1), labels.mkString(","))
  }

  test("clarans recovers separated blobs") {
    val n = 12
    val m = Array.fill(n, n)(0.0)
    def d(i: Int, j: Int, v: Double): Unit = { m(i)(j) = v; m(j)(i) = v }
    for (i <- 0 until 6; j <- i + 1 until 6) d(i, j, 1.0)
    for (i <- 6 until 12; j <- i + 1 until 12) d(i, j, 1.0)
    for (i <- 0 until 6; j <- 6 until 12) d(i, j, 40.0)
    val labels = graft.kernels.Cluster.clarans(m, k = 2, maxNeighbor = 20)
    assert(labels.slice(0, 6).distinct.length == 1)
    assert(labels.slice(6, 12).distinct.length == 1)
    assert(labels(0) != labels(6))
  }

  test("shapelet clustering separates shapes; classifiers label held-out series") {
    // shape-distinct groups (a z-normalizing classifier can't use level):
    // sine, ramp, square wave
    import spark.implicits._
    val rng2 = new scala.util.Random(7L)
    val rows = for {
      (g, shape) <- Seq(
        "g0" -> ((i: Int) => math.sin(i / 3.0) * 10.0),
        "g1" -> ((i: Int) => i.toDouble),
        "g2" -> ((i: Int) => if (i % 8 < 4) 10.0 else -10.0))
      s <- 0 until 5
      i <- 0 until 24
    } yield (s"${g}_$s", i, shape(i) + rng2.nextGaussian() * 0.3)
    val df = rows.toDF("unique_id", "__h", "y")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L))
      .drop("__h")
    val labels = Clustering.shapeletCluster(df, k = 3)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(labels.size == 15)
    val lab = labels.keys.map(id => (id, id.split("_")(0))).toSeq.toDF("unique_id", "label")
    val predK = Classification.kshapeClassify(df, lab, df)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(predK.forall { case (id, p) => p == id.split("_")(0) },
      s"kshape mispredictions: ${predK.filter { case (id, p) => p != id.split("_")(0) }}")
    val predR = Classification.rocketClassify(df, lab, df, nKernels = 30)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val accR = predR.count { case (id, p) => p == id.split("_")(0) }.toDouble / predR.size
    assert(accR >= 0.8, s"rocket accuracy $accR")
  }

  test("dba barycenter of shifted copies stays near the shared shape") {
    val base = Array.tabulate(30)(i => math.sin(i / 4.0) * 10.0)
    val members = Array(
      base.map(_ + 1.0), base.map(_ - 1.0), base.clone())
    val bc = Barycenter.dba(members, base.map(_ + 0.5))
    val err = bc.zip(base).map { case (a, b) => math.abs(a - b) }.max
    assert(err < 1.5, s"max err $err")
  }

  test("kasbaAverage reduces the summed MSM cost") {
    val rng = new scala.util.Random(2L)
    val base = Array.tabulate(20)(i => i.toDouble)
    val members = IndexedSeq.tabulate(6)(_ =>
      base.map(_ + rng.nextGaussian() * 2.0))
    val init = members(0)
    val cost0 = members.map(m => Elastic.msm(m, init, 1.0)).sum
    val bc = Barycenter.kasbaAverage(members, init, cost0, rng = new scala.util.Random(3L))
    val cost1 = members.map(m => Elastic.msm(m, bc, 1.0)).sum
    assert(cost1 <= cost0 + 1e-9, s"$cost1 vs $cost0")
  }

  test("msm path endpoints and monotonicity") {
    val a = Array(1.0, 2.0, 3.0, 4.0)
    val b = Array(1.0, 3.0, 4.0)
    val path = Barycenter.minReturnPath(
      Barycenter.msmCostMatrix(a, b, 1.0), a.length, b.length)
    assert(path.head == (3, 2) && path.last == (0, 0))
    assert(path.sliding(2).forall { case Array((i1, j1), (i2, j2)) =>
      i2 <= i1 && j2 <= j1 && (i1 - i2) + (j1 - j2) >= 1 })
  }
}
