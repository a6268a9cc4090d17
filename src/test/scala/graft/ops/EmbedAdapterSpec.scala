package graft.ops

import graft.TestSpark
import graft.core.PanelCols
import graft.kernels.DetRng
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Foundation-embedding adapters (reference adapters/embeddings.py):
  * output shape, value bounds, determinism under repartitioning, and a
  * draw-for-draw hand replay of both surrogate projections. */
class EmbedAdapterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit val pc: PanelCols =
    PanelCols("user_id", "ts", "value", tieBreak = Seq("event_id"))

  private def panel(rows: Seq[(Long, Long, Double, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "ts", "value", "event_id")
  }

  private def sine(nUsers: Int, n: Int): DataFrame =
    panel(for {
      u <- 0L until nUsers.toLong
      i <- 0L until n.toLong
    } yield (u, i, 10.0 + (u + 1) * math.sin(i / 3.0), i))

  test("chronosEmbed: one row per series, wide emb_*, values in [-1,1]") {
    val out = Foundation.chronosEmbed(sine(5, 40), dim = 6).collect()
    assert(out.length == 5)
    assert(out.head.schema.fieldNames.count(_.startsWith("emb_")) == 6)
    out.foreach(r => (0 until 6).foreach { j =>
      val v = r.getAs[Double](s"emb_$j")
      assert(v >= -1.0 && v <= 1.0, s"emb_$j out of range: $v")
    })
  }

  test("chronosEmbed: single-token series replays the DetRng table row") {
    val cfg = Foundation.ChronosCfg()
    val dim = 4
    val seed = 7L
    val out = Foundation.chronosEmbed(
      panel(Seq((1L, 0L, 3.0, 0L))), dim = dim, seed = seed).collect()
    assert(out.length == 1)
    // scale = mean|y| = 3.0 (round-6 exact), z = 1.0
    val tok = cfg.token(1.0)
    val sc = DetRng.seedConst(seed)
    (0 until dim).foreach { j =>
      val want = BigDecimal(2.0 * DetRng.uniform(sc, tok.toLong * dim + j)
        - 1.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out.head.getAs[Double](s"emb_$j") == want,
        s"emb_$j: got ${out.head.getAs[Double](s"emb_$j")}, want $want")
    }
  }

  test("chronosEmbed: deterministic, partition-invariant, seed-sensitive") {
    val df = sine(4, 30)
    val a = Foundation.chronosEmbed(df, dim = 5).orderBy("user_id").collect()
    val b = Foundation.chronosEmbed(df.repartition(7), dim = 5)
      .orderBy("user_id").collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    val c = Foundation.chronosEmbed(df, dim = 5, seed = 99L)
      .orderBy("user_id").collect()
    assert(!a.map(_.toString).sameElements(c.map(_.toString)))
  }

  test("momentEmbed: constant series embeds to exactly zero") {
    val out = Foundation.momentEmbed(
      panel((0L until 9L).map(i => (1L, i, 5.0, i))),
      dim = 3, patchLen = 4).collect()
    assert(out.length == 1)
    (0 until 3).foreach(j =>
      assert(out.head.getAs[Double](s"emb_$j") == 0.0))
  }

  test("momentEmbed: hand replay of normalize/patchify/project/softsign") {
    val vs = Array(1.0, 2.0, 3.0, 4.0, 5.0)
    val (dim, p, seed) = (3, 2, 11L)
    val out = Foundation.momentEmbed(
      panel(vs.zipWithIndex.map { case (v, i) => (1L, i.toLong, v, i.toLong) }),
      dim = dim, patchLen = p, seed = seed).collect()
    assert(out.length == 1)
    val sc = DetRng.seedConst(seed)
    val mu = 3.0
    val sd = BigDecimal(math.sqrt(vs.map(v => (v - mu) * (v - mu)).sum / 4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val z = vs.map(v => (v - mu) / sd)
    def w(k: Int, j: Int) = 2.0 * DetRng.uniform(sc, k.toLong * dim + j) - 1.0
    (0 until dim).foreach { j =>
      val sums = z.indices.groupBy(_ / p).values.toSeq
        .map(ks => ks.map(i => z(i) * w(i % p, j)).sum)
      val want = sums.map(s => s / (1.0 + math.abs(s))).sum / sums.length
      val got = out.head.getAs[Double](s"emb_$j")
      // the engine sums patch terms in partition order; allow the ulp
      // slack the repo's round-6 contract accepts
      assert(math.abs(got - want) < 2e-6, s"emb_$j: $got vs $want")
    }
  }

  test("null target values degrade per-series, never crash or spread") {
    import spark.implicits._
    // series 1 has a null value mixed in; series 2 is ALL null
    val df = Seq(
      (1L, 0L, Some(2.0), 0L), (1L, 1L, None, 1L), (1L, 2L, Some(4.0), 2L),
      (2L, 0L, Option.empty[Double], 0L), (2L, 1L, Option.empty[Double], 1L))
      .toDF("user_id", "ts", "value", "event_id")
    val ce = Foundation.chronosEmbed(df, dim = 3).orderBy("user_id").collect()
    assert(ce.length == 2, "every series keeps its output row")
    // mixed series: null rows drop out of the avg, embedding is finite
    (0 until 3).foreach(j =>
      assert(java.lang.Double.isFinite(ce(0).getAs[Double](s"emb_$j"))))
    // all-null series: no tokens -> null embedding, not a crash
    (0 until 3).foreach(j => assert(ce(1).isNullAt(ce(1).fieldIndex(s"emb_$j"))))
    val me = Foundation.momentEmbed(df, dim = 2, patchLen = 2)
      .orderBy("user_id").collect()
    assert(me.length == 2)
    (0 until 2).foreach(j =>
      assert(java.lang.Double.isFinite(me(0).getAs[Double](s"emb_$j"))))
  }

  test("momentEmbed: partial trailing patch pools like zero-padding") {
    // 5 points at patchLen 4 -> patches (4 real) + (1 real); the short
    // patch must contribute its real-element sum, not be dropped
    val a = Foundation.momentEmbed(
      panel((0L until 5L).map(i => (1L, i, i + 1.0, i))),
      dim = 2, patchLen = 4).collect().head
    val b = Foundation.momentEmbed(
      panel((0L until 4L).map(i => (1L, i, i + 1.0, i))),
      dim = 2, patchLen = 4).collect().head
    // with the 5th point the pool averages TWO patches -> must differ
    assert((0 until 2).exists(j =>
      a.getAs[Double](s"emb_$j") != b.getAs[Double](s"emb_$j")))
  }
}
