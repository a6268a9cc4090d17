package graft.ops

import graft.TestSpark
import graft.core.PanelCols
import graft.kernels.{DetRng, MatrixProfile}
import org.apache.spark.SparkException
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed long-series matrix-profile path and the short-series
  * emission contract:
  *   - blocked ≡ monolithic EXACTLY (unrounded values and argmin — the
  *     per-diagonal QT seeding makes block distances bit-identical and
  *     the min(struct) merge is order-independent);
  *   - windows with no admissible neighbor (series shorter than
  *     m − 1 + 2·excl) are dropped, matching the pair-join oracle;
  *   - the monolithic maxLen valve fails loud;
  *   - AB-join op matches the kernel per id;
  *   - complexity() drops too-short series instead of throwing;
  *   - mmrRerank survives NaN relevance scores.
  */
class MatrixProfileOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit val pc: PanelCols = PanelCols()

  private def series(id: String, n: Int, seed: Long): Seq[(String, Int, Double)] = {
    val s = DetRng.seedConst(seed)
    (0 until n).map(i => (id, i, DetRng.uniform(s, i.toLong) * 4 - 2))
  }

  private def panel(rows: Seq[(String, Int, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("unique_id", "__h", "y")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L))
      .drop("__h")
  }

  private def collectMp(df: DataFrame): Map[(String, Int), (Double, Int)] =
    df.select(col("unique_id"), col("idx"), col("mp"), col("mp_idx"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getDouble(2), r.getInt(3)))
      .toMap

  test("matrixProfileBlocked equals matrixProfile bit-exactly") {
    val p = panel(series("a", 80, 1L) ++ series("b", 41, 2L) ++
      series("c", 120, 3L))
    for (m <- Seq(4, 8); blocks <- Seq(1, 3, 16)) {
      val mono = collectMp(Advanced.matrixProfile(p, m))
      val blk = collectMp(Advanced.matrixProfileBlocked(p, m, blocks))
      assert(blk.keySet === mono.keySet, s"m=$m blocks=$blocks windows")
      mono.foreach { case (k, (d, j)) =>
        assert(blk(k)._1 === d, s"m=$m blocks=$blocks $k value (bit-exact)")
        assert(blk(k)._2 === j, s"m=$m blocks=$blocks $k neighbor")
      }
    }
  }

  test("short series: no-neighbor windows dropped, both paths agree") {
    // m=8, excl=4: len 12..14 leaves interior windows with every
    // |i−j| < excl — those must NOT surface (the oracle's pair join has
    // no row for them, and a discord ranking must never crown +Inf)
    for (len <- 12 to 15) {
      val p = panel(series("s", len, 40L + len))
      val monoM = collectMp(Advanced.matrixProfile(p, m = 8))
      val blkM = collectMp(Advanced.matrixProfileBlocked(p, m = 8, numBlocks = 3))
      assert(monoM === blkM, s"len=$len")
      // every emitted window must have a real neighbor
      monoM.values.foreach { case (d, j) => assert(j >= 0 && !d.isInfinite) }
      val nw = len - 8 + 1
      val expected = (0 until nw).count(i =>
        (0 until nw).exists(j => math.abs(i - j) >= 4))
      assert(monoM.size === expected, s"len=$len emitted")
      // discords never rank a dropped window
      val dk = Advanced.discords(p, m = 8, k = 3).collect()
      assert(dk.forall(r => !r.getAs[Double]("mp").isInfinite))
    }
    // below m + excl: no admissible pair at all -> empty
    assert(Advanced.matrixProfile(panel(series("t", 11, 9L)), m = 8).count() === 0)
  }

  test("monolithic maxLen valve fails loud; blocked path accepts") {
    val p = panel(series("long", 300, 5L))
    val ex = intercept[SparkException] {
      Advanced.matrixProfile(p, m = 8, maxLen = 200).collect()
    }
    assert(ex.getMessage.contains("matrixProfileBlocked") ||
      Option(ex.getCause).exists(_.getMessage.contains("matrixProfileBlocked")))
    assert(Advanced.matrixProfileBlocked(p, m = 8, numBlocks = 4).count() === 293)
  }

  test("mpAbJoin matches the kernel per id; inner-join id semantics") {
    val q = panel(series("a", 50, 11L) ++ series("b", 35, 12L) ++
      series("only_q", 30, 13L))
    val r = panel(series("a", 40, 14L) ++ series("b", 60, 15L) ++
      series("only_r", 30, 16L))
    val m = 6
    val out = Advanced.mpAbJoin(q, r, m)
    val got = collectMp(out)
    assert(!got.keys.exists(_._1 == "only_q"), "id missing from ref must drop")
    for (id <- Seq("a", "b")) {
      val aArr = series(id, if (id == "a") 50 else 35, if (id == "a") 11L else 12L)
        .map(_._3).toArray
      val bArr = series(id, if (id == "a") 40 else 60, if (id == "a") 14L else 15L)
        .map(_._3).toArray
      val (mp, mpi) = MatrixProfile.abJoin(aArr, bArr, m)
      mp.indices.foreach { i =>
        assert(got((id, i))._1 === mp(i), s"$id i=$i")
        assert(got((id, i))._2 === mpi(i), s"$id i=$i idx")
      }
    }
  }

  test("complexity drops too-short series instead of throwing") {
    val p = panel(series("ok", 30, 21L) ++ series("tiny", 3, 22L))
    val out = Diagnostics.complexity(p, m = 3, sampM = 2, sampR = 16.0)
    val ids = out.select("unique_id").collect().map(_.getString(0)).toSet
    assert(ids === Set("ok"))
  }

  test("mmrRerank survives all-NaN and mixed-NaN relevance") {
    import spark.implicits._
    val cands = Seq(
      (1L, 10L, Double.NaN, Seq(1.0, 0.0)),
      (1L, 11L, Double.NaN, Seq(0.0, 1.0)),
      (2L, 20L, 0.9, Seq(1.0, 0.0)),
      (2L, 21L, Double.NaN, Seq(0.0, 1.0)))
      .toDF("query_id", "cand_id", "rel", "embedding")
    val out = Similarity.mmrRerank(cands, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // query 1: every score NaN -> zero picks, no crash; query 2: the
    // finite candidate picked first, then the NaN one never qualifies
    assert(!out.exists(_._1 == 1L))
    assert(out.contains((2L, 20L)))
    assert(!out.contains((2L, 21L)))
  }
}
