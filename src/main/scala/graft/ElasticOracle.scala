package graft

/** DuckDB oracle SQL for the pairwise elastic-distance family.
  *
  * Each kernel in [[graft.kernels.Elastic]] is a two-row dynamic program;
  * DuckDB 1.0 can replay the exact same recurrence as a nested
  * `list_reduce` fold: the outer fold carries the previous DP row (a
  * `DOUBLE[]`), the inner fold builds the current row cell by cell with
  * `list_append`, so every addition / min / max happens in the same order
  * as the Scala kernel — bit-exact for the |·|/min/max kernels, and
  * within one ulp for wdtw (libm vs JVM `exp`), which the shared
  * `round(x + 1e-9, 6)` tie-nudge absorbs.
  *
  * DuckDB 1.0 has no 3-arg `list_reduce`, so the fold seed travels as the
  * first element via `list_prepend`; element and accumulator types must
  * match, hence indices are wrapped as single-element `DOUBLE[]`.
  *
  * The driver's oracle runs at sf0.01 (150 series ≈ 11k pairs); the full
  * panel costs ~40 s per metric in DuckDB, so the oracle-checked queries
  * subset to 60 series (1.8k pairs, ~6 s) — the Spark side applies the
  * identical filter. fastdtw stays rows-only: its multiresolution
  * path-projection recursion (hash-set window) is not SQL-expressible.
  */
object ElasticOracle {

  private val EP = graft.kernels.ElasticParams

  /** Series subset shared by the Spark queries and the oracle SQL. */
  val SeriesFilter = "user_id < 60"

  private val W = "ORDER BY ts, event_id"

  // index shorthands inside the lambdas: xi/xj carry the 1-based i/j
  private val I = "(xi[1])::INT"
  private val J = "(xj[1])::INT"
  private val AI = s"va[$I]"
  private val BJ = s"vb[$J]"

  /** Standard sentinel-bordered DP: row 0 = [0, inf…], col 0 = inf.
    * `cell` computes D[i][j] given prev (row i-1, sentinel at index 1),
    * acc (row i built so far, sentinel at index 1) and va/vb/xi/xj. */
  private def sentinelDp(cell: String, initRow: String, innerInit: String,
      finalIdx: String, va: String = "va", vb: String = "vb",
      n: String = "n", m: String = "m"): String =
    s"""list_reduce(
       |  list_prepend($initRow,
       |    list_transform(generate_series(1, $n), ii -> [ii::DOUBLE])),
       |  (prev, xi) -> list_reduce(
       |    list_prepend($innerInit, list_transform(generate_series(1, $m), jj -> [jj::DOUBLE])),
       |    (acc, xj) -> list_append(acc, $cell)
       |  )
       |)$finalIdx""".stripMargin

  private val minOfThree =
    s"least(prev[($J)+1], least(acc[$J], prev[$J]))"

  private val infRow =
    "list_concat([0.0::DOUBLE], list_transform(vb, x -> 1e300::DOUBLE))"

  /** D[i][j] = |a_i - b_j| + min(D[i-1][j], D[i][j-1], D[i-1][j-1]). */
  private def dtwExpr(costExpr: String, va: String = "va", vb: String = "vb",
      n: String = "n", m: String = "m"): String =
    sentinelDp(
      cell = s"$costExpr + least(prev[($J)+1], least(acc[$J], prev[$J]))"
        .replace("va[", va + "[").replace("vb[", vb + "["),
      initRow = infRow.replace("vb", vb),
      innerInit = "[1e300::DOUBLE]",
      finalIdx = s"[$m+1]", n = n, m = m)

  private val dtwSql = dtwExpr(s"abs($AI - $BJ)")

  /** The plain-DTW fold over columns va/vb/n/m — reused by the
    * cross-panel kNN-classify oracle. */
  def dtwFoldExpr: String = dtwSql

  /** The MSM (c = 1) fold over columns va/vb/n/m — reused by the pinned
    * KASBA assignment-replay oracle. */
  def msmFoldExpr: String = msmSql

  /** The SBD fold over columns va/vb/n/m (unequal lengths allowed) —
    * reused by the pinned CLARA/CLARANS medoid-assignment replays. */
  def sbdFoldExpr: String = sbdSql

  /** ddtw: DTW over Keogh-Pazzani derivatives (endpoints dropped). */
  private val derivCte =
    """pd AS (SELECT id_1, id_2,
      |  list_transform(generate_series(2, n-1), i ->
      |    ((va[i::INT] - va[i::INT - 1]) + (va[i::INT + 1] - va[i::INT - 1])/2.0)/2.0) AS da,
      |  list_transform(generate_series(2, m-1), i ->
      |    ((vb[i::INT] - vb[i::INT - 1]) + (vb[i::INT + 1] - vb[i::INT - 1])/2.0)/2.0) AS db
      |  FROM p)""".stripMargin

  private val ddtwSql = dtwExpr(
    s"abs(da[$I] - db[$J])", va = "da", vb = "db", n = "len(da)", m = "len(db)")

  /** wdtw: sigmoid weight on |i-j| (g = 0.05), squared cost; `half`
    * comes from the pair CTE. Scala min order prev[j-1], prev[j],
    * curr[j-1] — same value, min is exact. */
  private val wdtwSql = sentinelDp(
    cell = s"(1.0::DOUBLE/(1.0::DOUBLE + exp(-${EP.WdtwG}::DOUBLE * (abs((xi[1]) - (xj[1])) - half)))) " +
      s"* ($AI - $BJ) * ($AI - $BJ) + least(prev[$J], least(prev[($J)+1], acc[$J]))",
    initRow = infRow, innerInit = "[1e300::DOUBLE]", finalIdx = "[m+1]")

  /** erp (g = 0): col 0 accumulates |a_k| down the rows via prev[1]. */
  private val erpSql = sentinelDp(
    cell = s"least(prev[$J] + abs($AI - $BJ), " +
      s"least(prev[($J)+1] + abs($AI), acc[$J] + abs($BJ)))",
    initRow =
      """list_reduce(list_prepend([0.0::DOUBLE], list_transform(vb, w -> [w])),
        |      (acc, x) -> list_append(acc, acc[len(acc)] + abs(x[1])))""".stripMargin,
    innerInit = s"[prev[1] + abs($AI)]",
    finalIdx = "[m+1]")

  /** lcss (ε = 1): integer counts as doubles; final 1 - L/min(n,m). */
  private val lcssSql = "1.0::DOUBLE - (" + sentinelDp(
    cell = s"CASE WHEN abs($AI - $BJ) <= ${EP.LcssEpsilon}::DOUBLE THEN prev[$J] + 1.0::DOUBLE " +
      s"ELSE greatest(prev[($J)+1], acc[$J]) END",
    initRow = "list_concat([0.0::DOUBLE], list_transform(vb, x -> 0.0::DOUBLE))",
    innerInit = "[0.0::DOUBLE]",
    finalIdx = "[m+1]") + ") / least(n, m)::DOUBLE"

  /** edr (ε = 0.1): sentinel row 0..m, col 0 = i; final / max(n,m). */
  private val edrSql = "(" + sentinelDp(
    cell = s"least(prev[$J] + (CASE WHEN abs($AI - $BJ) <= ${EP.EdrEpsilon}::DOUBLE THEN 0.0::DOUBLE ELSE 1.0::DOUBLE END), " +
      s"least(prev[($J)+1] + 1.0::DOUBLE, acc[$J] + 1.0::DOUBLE))",
    initRow = "list_transform(generate_series(0, m), v -> v::DOUBLE)",
    innerInit = "[(xi[1])::DOUBLE]",
    finalIdx = "[m+1]") + ") / greatest(n, m)::DOUBLE"

  /** MSM split/merge cost (c = 1). */
  private def msmCost(x: String, y: String, z: String): String =
    s"CASE WHEN ($y <= $x AND $x <= $z) OR ($y >= $x AND $x >= $z) THEN ${EP.MsmC}::DOUBLE " +
      s"ELSE ${EP.MsmC}::DOUBLE + least(abs(($x) - ($y)), abs(($x) - ($z))) END"

  /** msm: 0-based n×m grid, first row/col built by their own folds. */
  private val msmSql =
    s"""list_reduce(
       |  list_prepend(
       |    list_reduce(
       |      list_prepend([abs(va[1] - vb[1])], list_transform(generate_series(2, m), jj -> [jj::DOUBLE])),
       |      (acc, x) -> list_append(acc, acc[len(acc)] + ${msmCost("vb[(x[1])::INT]", "va[1]", "vb[((x[1])::INT)-1]")})),
       |    list_transform(generate_series(2, n), ii -> [ii::DOUBLE])),
       |  (prev, xi) -> list_reduce(
       |    list_prepend([prev[1] + ${msmCost(s"va[$I]", s"va[($I)-1]", "vb[1]")}],
       |      list_transform(generate_series(2, m), jj -> [jj::DOUBLE])),
       |    (acc, xj) -> list_append(acc, least(
       |      prev[($J)-1] + abs($AI - $BJ),
       |      least(
       |        prev[$J] + ${msmCost(s"va[$I]", s"va[($I)-1]", s"vb[$J]")},
       |        acc[($J)-1] + ${msmCost(s"vb[$J]", s"va[$I]", s"vb[($J)-1]")}))))
       |)[m]""".stripMargin

  /** twe (ν = 0.001, λ = 1): previous-sample terms folded in; the
    * boundary rows replay the Scala accumulation order exactly. */
  private val twePrevA = s"(CASE WHEN $I > 1 THEN va[($I)-1] ELSE 0.0::DOUBLE END)"
  private val twePrevB = s"(CASE WHEN $J > 1 THEN vb[($J)-1] ELSE 0.0::DOUBLE END)"
  private val tweSql =
    s"""list_reduce(
       |  list_prepend(
       |    list_reduce(
       |      list_prepend([0.0::DOUBLE], list_transform(generate_series(1, m), jj -> [jj::DOUBLE])),
       |      (acc, x) -> list_append(acc, acc[len(acc)] +
       |        abs(vb[(x[1])::INT] - (CASE WHEN (x[1])::INT > 1 THEN vb[((x[1])::INT)-1] ELSE 0.0::DOUBLE END)) + ${EP.TweNu}::DOUBLE + ${EP.TweLambda}::DOUBLE)),
       |    list_transform(generate_series(1, n), ii -> [ii::DOUBLE])),
       |  (prev, xi) -> list_reduce(
       |    list_prepend([prev[1] + abs($AI - $twePrevA) + ${EP.TweNu}::DOUBLE + ${EP.TweLambda}::DOUBLE],
       |      list_transform(generate_series(1, m), jj -> [jj::DOUBLE])),
       |    (acc, xj) -> list_append(acc, least(
       |      prev[$J] + abs($AI - $BJ) + abs($twePrevA - $twePrevB) +
       |        least(${EP.TweNu}::DOUBLE * abs((xi[1]) - (xj[1])), ${2 * EP.TweNu}::DOUBLE),
       |      least(
       |        prev[($J)+1] + abs($AI - $twePrevA) + ${EP.TweNu}::DOUBLE + ${EP.TweLambda}::DOUBLE,
       |        acc[$J] + abs($BJ - $twePrevB) + ${EP.TweNu}::DOUBLE + ${EP.TweLambda}::DOUBLE))))
       |)[m+1]""".stripMargin

  /** frechet: max-of-path-min formulation, 0-based grid. */
  private val frechetSql =
    s"""list_reduce(
       |  list_prepend(
       |    list_reduce(
       |      list_prepend([abs(va[1] - vb[1])], list_transform(generate_series(2, m), jj -> [jj::DOUBLE])),
       |      (acc, x) -> list_append(acc, greatest(acc[len(acc)], abs(va[1] - vb[(x[1])::INT])))),
       |    list_transform(generate_series(2, n), ii -> [ii::DOUBLE])),
       |  (prev, xi) -> list_reduce(
       |    list_prepend([greatest(prev[1], abs($AI - vb[1]))],
       |      list_transform(generate_series(2, m), jj -> [jj::DOUBLE])),
       |    (acc, xj) -> list_append(acc, greatest(
       |      least(prev[($J)-1], least(prev[$J], acc[($J)-1])),
       |      abs($AI - $BJ))))
       |)[m]""".stripMargin

  /** sbd: 1 - max NCC over all n+m-1 shifts; norms and the per-shift
    * dot products fold left-to-right like the Scala loops. */
  private val sbdNormA = "list_reduce(list_transform(va, v -> v*v), (x, y) -> x + y)"
  private val sbdNormB = "list_reduce(list_transform(vb, v -> v*v), (x, y) -> x + y)"
  private val sbdSql =
    s"""CASE WHEN sqrt($sbdNormA) * sqrt($sbdNormB) = 0.0
       |  THEN 1.0::DOUBLE
       |  ELSE 1.0::DOUBLE - list_max(
       |    list_transform(generate_series(0, n + m - 2), k ->
       |      list_reduce(
       |        list_prepend(0.0::DOUBLE,
       |          list_transform(generate_series(greatest(1, (k::INT - m + 1) + 1), least(n, m + (k::INT - m + 1))),
       |            ii -> va[ii::INT] * vb[(ii - (k::INT - m + 1))::INT])),
       |        (x, y) -> x + y)
       |    )) / (sqrt($sbdNormA) * sqrt($sbdNormB))
       |END""".stripMargin

  /** dtw_multi over channels (value, value2 = 0.5·value + 1): manhattan
    * point cost accumulated channel-by-channel like Elastic.manhattan. */
  private val dtwMultiSql = dtwExpr(
    s"abs($AI - $BJ) + abs((${EP.Multi2Scale}*$AI + ${EP.Multi2Shift}) - (${EP.Multi2Scale}*$BJ + ${EP.Multi2Shift}))")

  /** Itakura-parallelogram DTW (Elastic.dtwItakura, src/dtw.rs:58-86):
    * the standard sentinel DP with cells outside the per-row band
    * [lower, upper] pinned to the Inf sentinel. */
  private val itakuraSql = {
    val sl = s"${EP.ItakuraMaxSlope}::DOUBLE"
    val fi = "((xi[1]))"
    val fj = "((xj[1]))"
    val lower = s"greatest($fi / $sl, m - (n - $fi) * $sl)"
    val upper = s"least($fi * $sl, m - (n - $fi) / $sl)"
    sentinelDp(
      cell = s"CASE WHEN $fj < $lower OR $fj > $upper THEN 1e300::DOUBLE " +
        s"ELSE abs($AI - $BJ) + $minOfThree END",
      initRow = infRow,
      innerInit = "[1e300::DOUBLE]",
      finalIdx = "[m+1]")
  }

  /** Sakoe-Chiba-band DTW (Elastic.dtwSakoeChiba, src/dtw.rs:32-55): the
    * standard sentinel DP with cells outside |i−j| ≤ w pinned to Inf,
    * w = max(window, |n−m|). */
  private val sakoeSql = {
    val w = s"greatest(${EP.SakoeWindow}::DOUBLE, abs(n - m)::DOUBLE)"
    val fi = "((xi[1]))"
    val fj = "((xj[1]))"
    sentinelDp(
      cell = s"CASE WHEN $fj < $fi - $w OR $fj > $fi + $w THEN 1e300::DOUBLE " +
        s"ELSE abs($AI - $BJ) + $minOfThree END",
      initRow = infRow,
      innerInit = "[1e300::DOUBLE]",
      finalIdx = "[m+1]")
  }

  // ── msm_multi (Elastic.msmMulti, src/msm_multi.rs:20-59): dependent
  // cost over the 2-channel expansion (value, 0.5·value + 1). Points are
  // affine images of the scalar series, but every channel-2 arithmetic
  // step is replayed literally — (0.5x+1)−(0.5y+1) does NOT cancel in
  // float. ─────────────────────────────────────────────────────────────
  private case class Pt(c1: String, c2: String)
  private def pt(v: String) = Pt(s"($v)", s"(${EP.Multi2Scale}*($v) + ${EP.Multi2Shift})")
  /** sqDist channel-accumulation order: (d1² ) + (d2²). */
  private def sq(p: Pt, q: Pt) =
    s"((${p.c1} - ${q.c1})*(${p.c1} - ${q.c1}) + (${p.c2} - ${q.c2})*(${p.c2} - ${q.c2}))"
  private def midPt(y: Pt, z: Pt) =
    Pt(s"((${y.c1} + ${z.c1})/2.0)", s"((${y.c2} + ${z.c2})/2.0)")
  private def man(p: Pt, q: Pt) =
    s"(abs(${p.c1} - ${q.c1}) + abs(${p.c2} - ${q.c2}))"
  private def costDep(x: Pt, y: Pt, z: Pt) =
    s"(CASE WHEN ${sq(midPt(y, z), x)} <= ${sq(y, z)}/2.0 THEN ${EP.MsmC}::DOUBLE " +
      s"ELSE ${EP.MsmC}::DOUBLE + least(${sq(y, x)}, ${sq(z, x)}) END)"

  private val msmMultiSql = {
    val aI = pt(s"va[$I]"); val aIm1 = pt(s"va[($I)-1]")
    val bJ = pt(s"vb[$J]"); val bJm1 = pt(s"vb[($J)-1]")
    val a1 = pt("va[1]"); val b1 = pt("vb[1]")
    val bX = pt("vb[(x[1])::INT]"); val bXm1 = pt("vb[((x[1])::INT)-1]")
    s"""list_reduce(
       |  list_prepend(
       |    list_reduce(
       |      list_prepend([${man(a1, b1)}], list_transform(generate_series(2, m), jj -> [jj::DOUBLE])),
       |      (acc, x) -> list_append(acc, acc[len(acc)] + ${costDep(bX, bXm1, a1)})),
       |    list_transform(generate_series(2, n), ii -> [ii::DOUBLE])),
       |  (prev, xi) -> list_reduce(
       |    list_prepend([prev[1] + ${costDep(aI, aIm1, b1)}],
       |      list_transform(generate_series(2, m), jj -> [jj::DOUBLE])),
       |    (acc, xj) -> list_append(acc, least(
       |      prev[($J)-1] + ${man(aI, bJ)},
       |      least(
       |        prev[$J] + ${costDep(aI, aIm1, bJ)},
       |        acc[($J)-1] + ${costDep(bJ, aI, bJm1)}))))
       |)[m]""".stripMargin
  }

  private val exprs: Map[String, (String, Boolean)] = Map(
    "dtw" -> (dtwSql, false),
    "ddtw" -> (ddtwSql, true),
    "wdtw" -> (wdtwSql, false),
    "msm" -> (msmSql, false),
    "erp" -> (erpSql, false),
    "lcss" -> (lcssSql, false),
    "twe" -> (tweSql, false),
    "sbd" -> (sbdSql, false),
    "frechet" -> (frechetSql, false),
    "edr" -> (edrSql, false),
    "dtw_multi" -> (dtwMultiSql, false),
    "itakura" -> (itakuraSql, false),
    "sakoe" -> (sakoeSql, false),
    "msm_multi" -> (msmMultiSql, false))

  /** ts_pairwise_fastdtw_sub oracle (VERDICT r8 ask #3): the final-level
    * constrained DP replayed with the sakoe/itakura banded machinery,
    * per-pair bands pinned from [[graft.kernels.Elastic.fastDtwBand]]
    * (the multiresolution projection is a deterministic data
    * intermediate; the banded DP over its output IS the fastDtw value).
    * Cells outside [lo(i), hi(i)] pin to the 1e300 sentinel exactly like
    * the sakoe band. With no pin (unit-test context) the replay falls
    * back to the full grid — i.e. exact DTW — which only matches where
    * fastDtw finds the exact path; Verify always computes pins first. */
  def fastdtwSubSql(
      pins: Option[Seq[(Long, Long, Array[Int], Array[Int])]]): String = {
    val bandCell =
      s"CASE WHEN (xj[1]) < lo[($I)] OR (xj[1]) > hi[($I)] THEN 1e300::DOUBLE " +
        s"ELSE abs($AI - $BJ) + $minOfThree END"
    val dp = sentinelDp(bandCell, infRow, "[1e300::DOUBLE]", "[m+1]")
    val values = pins match {
      case Some(ps) => ps.map { case (u1, u2, lo, hi) =>
        s"($u1, $u2, ${lo.mkString("[", ",", "]")}, ${hi.mkString("[", ",", "]")})"
      }.mkString(",\n    ")
      case None => "(NULL, NULL, NULL, NULL)"
    }
    val joinW = pins match {
      case Some(_) =>
        "JOIN w ON w.wid1 = a.user_id AND w.wid2 = b.user_id"
      case None => "" // full-grid fallback: lo/hi synthesized below
    }
    val loHiSel = pins match {
      case Some(_) => "w.lo AS lo, w.hi AS hi"
      case None =>
        "list_transform(a.vs, x -> 1) AS lo, " +
          "list_transform(a.vs, x -> len(b.vs)::INT) AS hi"
    }
    val wCte = pins match {
      case Some(_) =>
        s"w AS (SELECT * FROM (VALUES\n    $values) AS t(wid1, wid2, lo, hi)),\n"
      case None => ""
    }
    s"""WITH s AS (
       |  SELECT user_id, list(value $W) AS vs
       |  FROM events WHERE user_id < ${OraclePins.FastDtwSubsetUsers}
       |  GROUP BY user_id),
       |$wCte
       |p AS (SELECT a.user_id AS id_1, b.user_id AS id_2,
       |  a.vs AS va, b.vs AS vb,
       |  len(a.vs)::INT AS n, len(b.vs)::INT AS m, $loHiSel
       |  FROM s a JOIN s b ON a.user_id < b.user_id $joinW)
       |SELECT id_1, id_2, round(($dp) + 1e-9, 6) AS dtw FROM p""".stripMargin
  }

  /** Full oracle query for one metric: `[id_1, id_2, round(d+1e-9, 6)]`.
    * `outCol` overrides the output column name (the Itakura query's
    * Spark column is `dtw` — the dispatcher names by base metric). */
  def sql(metric: String, outCol: String = null): String = {
    val (expr, needsDeriv) = exprs(metric)
    val from = if (needsDeriv) "pd" else "p"
    val deriv = if (needsDeriv) ",\n" + derivCte else ""
    val out = if (outCol == null) metric else outCol
    s"""WITH s AS (
       |  SELECT user_id, list(value $W) AS vs
       |  FROM events WHERE $SeriesFilter GROUP BY user_id),
       |p AS (SELECT a.user_id AS id_1, b.user_id AS id_2, a.vs AS va, b.vs AS vb,
       |  len(a.vs)::INT AS n, len(b.vs)::INT AS m,
       |  greatest(len(a.vs), len(b.vs))/2.0 AS half
       |  FROM s a JOIN s b ON a.user_id < b.user_id)$deriv
       |SELECT id_1, id_2, round(($expr) + 1e-9, 6) AS $out FROM $from""".stripMargin
  }
}
