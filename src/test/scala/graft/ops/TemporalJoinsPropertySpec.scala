package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Randomized equivalence against brute-force scalar references: the
  * window-carry as-of join (all four directions × strict/inclusive ×
  * tolerance) and the bucketed interval joins must agree with the O(n²)
  * definition on arbitrary data — duplicate timestamps on the LEFT,
  * empty keys, interval edge cases included. Deterministic seeds. */
class TemporalJoinsPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private case class R(k: Long, t: Long, v: Double)

  /** Random panel; timestamps on a coarse grid so collisions happen. */
  private def gen(rng: Random, n: Int, keys: Int, grid: Int): Seq[R] =
    (0 until n).map(_ => R(rng.nextInt(keys).toLong,
      rng.nextInt(grid).toLong * 10, rng.nextInt(1000).toDouble))

  /** Brute-force as-of: best right row per left row by the definition. */
  private def bruteAsof(ls: Seq[R], rs: Seq[R], direction: String,
      tol: Option[Long], exact: Boolean): Map[(Long, Long, Double), Option[Long]] =
    ls.map { l =>
      val sameKey = rs.filter(_.k == l.k)
      def ok(rt: Long, cmpBack: Boolean): Boolean =
        if (cmpBack) (if (exact) rt <= l.t else rt < l.t)
        else (if (exact) rt >= l.t else rt > l.t)
      val back = sameKey.filter(r => ok(r.t, cmpBack = true))
        .sortBy(_.t).lastOption.map(_.t)
      val fwd = sameKey.filter(r => ok(r.t, cmpBack = false))
        .sortBy(_.t).headOption.map(_.t)
      val m = direction match {
        case "backward" => back
        case "forward" => fwd
        case "nearest" => (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (l.t - b <= f - l.t) Some(b) else Some(f)
          case (b, f) => b.orElse(f)
        }
      }
      val gated = m.filter(rt => tol.forall(tv => math.abs(l.t - rt) <= tv))
      (l.k, l.t, l.v) -> gated
    }.toMap

  test("asofJoin == brute force over directions × strict × tolerance") {
    import spark.implicits._
    val rng = new Random(20260814L)
    for (trial <- 0 until 3; direction <- Seq("backward", "forward", "nearest");
         exact <- Seq(true, false); tol <- Seq(None, Some(40L))) {
      // dedup right (k, t) — duplicate right timestamps are documented as
      // ambiguous; left duplicates stay (they must all match identically)
      val ls = gen(rng, 60, 4, 25)
      val rs = gen(rng, 60, 4, 25).groupBy(r => (r.k, r.t))
        .map(_._2.head).toSeq
      val l = ls.map(r => (r.k, r.t, r.v)).toDF("k", "t", "v")
      val r = rs.map(x => (x.k, x.t, x.v)).toDF("k", "t", "rv")
      val out = TemporalJoins.asofJoin(l, r, Seq("k"), "t", "t", Seq("rv"),
          direction = direction, toleranceUs = tol.map(_ * 1L),
          allowExactMatches = exact)
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)) ->
          Option(x.get(3)).map(_.asInstanceOf[Long]))
      val expect = bruteAsof(ls, rs, direction, tol, exact)
      assert(out.length == ls.length, s"row count trial=$trial $direction")
      out.foreach { case (key, got) =>
        assert(got == expect(key),
          s"trial=$trial dir=$direction exact=$exact tol=$tol key=$key: " +
            s"got $got expect ${expect(key)}")
      }
    }
  }

  test("sessionize == brute force on random colliding data") {
    import spark.implicits._
    val rng = new Random(99L)
    for (trial <- 0 until 3; gap <- Seq(15L, 100L)) {
      val rows = gen(rng, 80, 5, 30).zipWithIndex
        .map { case (r, i) => (r.k, r.t, i.toLong) } // tie = unique index
      val out = TemporalJoins.sessionize(rows.toDF("k", "tu", "tie"),
          Seq("k"), "tu", gapUs = gap, tieBreak = Seq("tie"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
          r.getAs[Long]("session_id")).toMap
      // brute force: sort per key by (t, tie), split on diff > gap
      rows.groupBy(_._1).foreach { case (_, ks) =>
        val sorted = ks.sortBy(r => (r._2, r._3))
        var sid = 0L; var prev = Long.MinValue
        sorted.foreach { r =>
          if (prev == Long.MinValue || r._2 - prev > gap) sid += 1
          prev = r._2
          assert(out(r) == sid, s"trial=$trial gap=$gap row=$r")
        }
      }
    }
  }

  test("rollingByTime / groupByDynamic == brute force on random data") {
    import spark.implicits._
    import graft.core.PanelCols
    implicit val pc: PanelCols = PanelCols("k", "tu", "v")
    val rng = new Random(4242L)
    for (trial <- 0 until 3) {
      // distinct (k, tu) so RANGE peers don't enter (peer semantics are
      // pinned separately in DynamicWindowSpec); µs-scale grid
      val rows = gen(rng, 70, 4, 200).map(r => ((r.k, r.t), r.v))
        .groupBy(_._1).map { case ((k, t), vs) => (k, t, vs.head._2) }.toSeq
      val df = rows.toDF("k", "tu", "v")
      val w = 55L
      val roll = Features.rollingByTime(df, w, aggs = Seq("mean", "count"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getDouble(3), r.getLong(4)))).toMap
      rows.foreach { case (k, t, _) =>
        val win = rows.filter(r => r._1 == k && r._2 > t - w && r._2 <= t)
        val exp = (win.map(_._3).sum / win.size, win.size.toLong)
        val got = roll((k, t))
        assert(math.abs(got._1 - exp._1) < 1e-9 && got._2 == exp._2,
          s"trial=$trial roll($k,$t): $got vs $exp")
      }
      // groupByDynamic on a seconds grid (string durations are coarse):
      // every=30s, period=120s over second-scaled timestamps
      val tsDf = rows.map { case (k, t, v) =>
        (k, new java.sql.Timestamp(1704067200000L + t * 1000L), v)
      }.toDF("k", "tu", "v")
      val dyn = Resample.groupByDynamic(tsDf, "30 seconds", "120 seconds")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
          ((r.getDouble(2), r.getLong(3)))).toMap
      val expDyn = rows.flatMap { case (k, t, v) =>
        val tMs = 1704067200000L + t * 1000L
        val kMax = Math.floorDiv(tMs, 30000L)
        val kMin = Math.floorDiv(tMs - 120000L, 30000L) + 1
        (kMin to kMax).map(kk => (k, kk * 30000L) -> v)
      }.groupBy(_._1).map { case (key, vs) =>
        key -> ((vs.map(_._2).sum / vs.size, vs.size.toLong)) }
      assert(dyn.keySet == expDyn.keySet, s"trial=$trial window-key sets differ")
      expDyn.foreach { case (key, (m, n)) =>
        val (gm, gn) = dyn(key)
        assert(math.abs(gm - m) < 1e-9 && gn == n, s"trial=$trial dyn$key")
      }
    }
  }

  test("rangeJoin/overlapJoin == brute force across bucket widths") {
    import spark.implicits._
    val rng = new Random(7L)
    for (trial <- 0 until 3; bucket <- Seq(7L, 50L, 1000L)) {
      val pts = gen(rng, 50, 3, 40).zipWithIndex
        .map { case (r, i) => (r.k, i.toLong, r.t) }
      val ivs = (0 until 30).map { i =>
        val s = rng.nextInt(40).toLong * 10
        (rng.nextInt(3).toLong, 1000L + i, s, s + rng.nextInt(8).toLong * 10)
      }
      val l = pts.toDF("k", "pid", "t")
      val r = ivs.toDF("k", "iid", "s", "e")
      val got = TemporalJoins.rangeJoin(l, r, Seq("k"), "t", "s", "e", bucket)
        .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val expect = (for ((k, pid, t) <- pts; (ik, iid, s, e) <- ivs
        if k == ik && t >= s && t < e) yield (pid, iid)).toSet
      assert(got == expect, s"rangeJoin trial=$trial bucket=$bucket")

      val ivs2 = (0 until 30).map { i =>
        val s = rng.nextInt(40).toLong * 10
        (rng.nextInt(3).toLong, 2000L + i, s, s + rng.nextInt(8).toLong * 10)
      }
      val r2 = ivs2.toDF("k", "jid", "s2", "e2")
      val gotO = TemporalJoins.overlapJoin(r, r2, Seq("k"),
          "s", "e", "s2", "e2", bucket)
        .select("iid", "jid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val expectO = (for ((k, iid, s, e) <- ivs; (k2, jid, s2, e2) <- ivs2
        if k == k2 && s < e2 && s2 < e) yield (iid, jid)).toSet
      assert(gotO == expectO, s"overlapJoin trial=$trial bucket=$bucket " +
        s"missing=${expectO.diff(gotO).take(3)} extra=${gotO.diff(expectO).take(3)}")
    }
  }
}
