package graft

/** DuckDB replay of the auto-ARIMA ORDER SEARCH (VERDICT r7 ask #6).
  *
  * The full-panel ts_auto_arima_orders stays rows-only (replaying six
  * Nelder-Mead CSS fits per series measured >8 min in DuckDB — the r5
  * collapse). The subset twin ts_auto_arima_orders_sub (5 series,
  * maxP = maxQ = 1) splits the work the pinned-fit way: the four
  * candidate ARMA fits per series run in Scala and their coefficients
  * are pinned; DuckDB then replays the ENTIRE selection logic —
  * KPSS-statistic d-selection (bit-exact folds), differencing,
  * per-candidate eligibility, the CSS residual recursion from the pinned
  * coefficients, the AICc formula, and the grid argmin — so the
  * order-selection machinery (not just a forecast recursion) is
  * oracle-checked.
  */
object AutoArimaOracle {

  private def dlit(v: Double): String = "%.17e".format(v)

  /** Per-series pinned candidates: (user_id, [(p, q, φ₁, θ₁, c)] in grid
    * order for the candidates whose fit succeeded). */
  type CandPins = Seq[(Long, Seq[(Int, Int, Double, Double, Double)])]

  /** KPSS level-stationarity statistic of a DOUBLE[] expression `v` —
    * the exact fold orders of Arima.kpss (mean, demeaned prefix sums,
    * Bartlett long-run variance with ⌊4(n/100)^0.25⌋ lags). */
  private def kpssSql(v: String): String = {
    val n = s"len($v)"
    val sumV = s"list_reduce(list_prepend(0.0::DOUBLE, $v), (ka, kb) -> ka + kb)"
    val prefix =
      s"""(list_reduce(list_prepend([0.0::DOUBLE], list_transform(ee, ev -> [ev])),
         |  (ca, cx) -> list_append(ca, ca[len(ca)] + cx[1])))[2:]""".stripMargin
    val lrvInit =
      "list_reduce(list_prepend(0.0::DOUBLE, list_transform(ee, ev -> ev * ev)), (ka, kb) -> ka + kb)" +
        s" / $n"
    val gFold =
      s"""list_reduce(list_prepend(0.0::DOUBLE,
         |  list_transform(generate_series((lx[1])::INT + 1, $n), tt ->
         |    ee[tt::INT] * ee[(tt::INT - (lx[1])::INT)])), (ka, kb) -> ka + kb)""".stripMargin
    val lrvFold =
      s"""list_reduce(list_prepend([$lrvInit],
         |  list_transform(generate_series(1, lg[1]::INT), ll -> [ll::DOUBLE])),
         |  (la, lx) -> [la[1] + ((2.0 * (1.0 - (lx[1]) / (lg[1] + 1.0))) * ($gFold)) / $n])""".stripMargin
    val ssSq =
      "list_reduce(list_prepend(0.0::DOUBLE, list_transform(ss, sv -> sv * sv)), (ka, kb) -> ka + kb)"
    s"""(CASE WHEN $n < 8 THEN 0.0::DOUBLE ELSE
       |  list_transform([list_transform($v, vv -> vv - ($sumV) / $n)], ee ->
       |    list_transform([$prefix], ss ->
       |      list_transform([[greatest(1, (4.0 * pow($n / 100.0, 0.25))::INT)::DOUBLE]], lg ->
       |        list_transform([$lrvFold], lr ->
       |          CASE WHEN lr[1] <= 0.0 THEN 0.0::DOUBLE
       |            ELSE ($ssSq) / (($n::DOUBLE * $n) * lr[1]) END
       |        )[1])[1])[1])[1]
       |END)""".stripMargin
  }

  def ordersSql(pins: CandPins, seriesFilter: String = "user_id < 5"): String = {
    val candRows = pins.flatMap { case (u, cands) =>
      cands.zipWithIndex.map { case ((p, q, phi, theta, c), seq) =>
        s"($u::BIGINT, $seq::INT, $p::INT, $q::INT, ${dlit(phi)}, ${dlit(theta)}, ${dlit(c)})"
      }
    }.mkString(",\n  ")
    val diff1 =
      "list_transform(generate_series(1, len(vs) - 1), di -> vs[(di + 1)::INT] - vs[di::INT])"
    val diff2 =
      """list_transform(generate_series(1, len(vs) - 2), di ->
        |    (vs[(di + 2)::INT] - vs[(di + 1)::INT]) - (vs[(di + 1)::INT] - vs[di::INT]))""".stripMargin
    // CSS residual recursion from the pinned coefficients: e(t≤m) = 0,
    // e(t) = y(t) − ((c + φ·y(t−1)) + θ·e(t−1)); the p/q guards keep the
    // out-of-range list index inside an unevaluated CASE branch.
    val eFold =
      s"""list_reduce(list_prepend([]::DOUBLE[],
         |  list_transform(generate_series(1, len(cur)), t2 -> [t2::DOUBLE])),
         |  (ea, x2) -> list_append(ea,
         |    CASE WHEN (x2[1])::INT <= mm THEN 0.0::DOUBLE
         |    ELSE cur[(x2[1])::INT] - ((cc
         |      + (CASE WHEN p >= 1 THEN phi * cur[((x2[1])::INT - 1)] ELSE 0.0::DOUBLE END))
         |      + (CASE WHEN q >= 1 THEN theta * ea[((x2[1])::INT - 1)] ELSE 0.0::DOUBLE END))
         |    END))""".stripMargin
    val cssExpr =
      s"""list_transform([$eFold], el ->
         |  list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(generate_series(mm + 1, len(cur)), t3 ->
         |      el[t3::INT] * el[t3::INT])), (ka, kb) -> ka + kb))[1]""".stripMargin
    s"""WITH s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs
       |  FROM events WHERE $seriesFilter GROUP BY user_id),
       |dsel AS (SELECT user_id, vs,
       |  CASE WHEN NOT (${kpssSql("vs")} > 0.463 AND len(vs) > 10) THEN 0
       |       WHEN NOT (${kpssSql(diff1)} > 0.463 AND len(vs) - 1 > 10) THEN 1
       |       ELSE 2 END AS d
       |  FROM s),
       |curd AS (SELECT user_id, d,
       |  CASE WHEN d = 0 THEN vs WHEN d = 1 THEN $diff1 ELSE $diff2 END AS cur
       |  FROM dsel),
       |cand AS (SELECT * FROM (VALUES
       |  $candRows
       |) AS __c(user_id, seq, p, q, phi, theta, cc)),
       |el AS (SELECT c.user_id, c.seq, c.p, c.q, cu.d, cu.cur,
       |    greatest(c.p, c.q) AS mm, c.phi, c.theta, c.cc
       |  FROM cand c JOIN curd cu USING (user_id)
       |  WHERE len(cu.cur) > greatest(c.p, c.q) + c.p + c.q + 4),
       |cs AS (SELECT user_id, seq, p, q, d,
       |    (len(cur) - mm)::DOUBLE AS neff, (p + q + 2)::DOUBLE AS kk,
       |    $cssExpr AS css
       |  FROM el),
       |ai AS (SELECT user_id, seq, p, q, d,
       |  CASE WHEN neff - kk - 1 > 0
       |    THEN (neff * ln(greatest(css / neff, 1e-300)) + 2.0 * kk)
       |      + ((2.0 * kk) * (kk + 1.0)) / (neff - kk - 1.0)
       |    ELSE 'infinity'::DOUBLE END AS aicc
       |  FROM cs),
       |best AS (SELECT user_id, p, d, q,
       |  row_number() OVER (PARTITION BY user_id ORDER BY aicc, seq) AS rk FROM ai)
       |SELECT user_id, p, d, q FROM best WHERE rk = 1""".stripMargin
  }

  /** Per-series pinned candidates at arbitrary order: (user_id,
    * [(p, q, φ[1..maxOrd] zero-padded, θ[1..maxOrd] zero-padded, c)]). */
  type CandPinsN = Seq[(Long, Seq[(Int, Int, Array[Double], Array[Double], Double)])]

  /** ts_auto_arima_orders (full panel, maxP = maxQ = 3, r12): the
    * [[ordersSql]] replay generalized to third-order candidates. The
    * CSS recursion keeps Scala's accumulation order — c, then φᵢ terms
    * ascending, then θⱼ terms ascending — with absent orders guarded to
    * a +0.0 add, which is IEEE-identity for every quantity that reaches
    * the squared-residual sum (sign-of-zero flips cannot survive e²).
    * 16 candidates × 150 series of pinned fits; d-selection, AICc and
    * the stable grid argmin all replay in SQL, same as the _sub twin. */
  def ordersFullSql(pins: CandPinsN, maxOrd: Int = 3,
      seriesFilter: String = "TRUE"): String = {
    val coefCols = (1 to maxOrd).map(i => s"phi$i") ++
      (1 to maxOrd).map(j => s"theta$j")
    val candRows = pins.flatMap { case (u, cands) =>
      cands.zipWithIndex.map { case ((p, q, phi, theta, c), seq) =>
        val cs = (0 until maxOrd).map(i => dlit(phi.lift(i).getOrElse(0.0))) ++
          (0 until maxOrd).map(j => dlit(theta.lift(j).getOrElse(0.0)))
        s"($u::BIGINT, $seq::INT, $p::INT, $q::INT, ${cs.mkString(", ")}, ${dlit(c)})"
      }
    }.mkString(",\n  ")
    val diff1 =
      "list_transform(generate_series(1, len(vs) - 1), di -> vs[(di + 1)::INT] - vs[di::INT])"
    val diff2 =
      """list_transform(generate_series(1, len(vs) - 2), di ->
        |    (vs[(di + 2)::INT] - vs[(di + 1)::INT]) - (vs[(di + 1)::INT] - vs[di::INT]))""".stripMargin
    val phiTerms = (1 to maxOrd).map(i =>
      s"(CASE WHEN p >= $i THEN phi$i * cur[((x2[1])::INT - $i)] ELSE 0.0::DOUBLE END)")
    val thetaTerms = (1 to maxOrd).map(j =>
      s"(CASE WHEN q >= $j THEN theta$j * ea[((x2[1])::INT - $j)] ELSE 0.0::DOUBLE END)")
    val pred = (phiTerms ++ thetaTerms).foldLeft("cc")((a, t) => s"($a\n      + $t)")
    val eFold =
      s"""list_reduce(list_prepend([]::DOUBLE[],
         |  list_transform(generate_series(1, len(cur)), t2 -> [t2::DOUBLE])),
         |  (ea, x2) -> list_append(ea,
         |    CASE WHEN (x2[1])::INT <= mm THEN 0.0::DOUBLE
         |    ELSE cur[(x2[1])::INT] - $pred
         |    END))""".stripMargin
    val cssExpr =
      s"""list_transform([$eFold], el ->
         |  list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(generate_series(mm + 1, len(cur)), t3 ->
         |      el[t3::INT] * el[t3::INT])), (ka, kb) -> ka + kb))[1]""".stripMargin
    s"""WITH s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs
       |  FROM events WHERE $seriesFilter GROUP BY user_id),
       |dsel AS (SELECT user_id, vs,
       |  CASE WHEN NOT (${kpssSql("vs")} > 0.463 AND len(vs) > 10) THEN 0
       |       WHEN NOT (${kpssSql(diff1)} > 0.463 AND len(vs) - 1 > 10) THEN 1
       |       ELSE 2 END AS d
       |  FROM s),
       |curd AS (SELECT user_id, d,
       |  CASE WHEN d = 0 THEN vs WHEN d = 1 THEN $diff1 ELSE $diff2 END AS cur
       |  FROM dsel),
       |cand AS (SELECT * FROM (VALUES
       |  $candRows
       |) AS __c(user_id, seq, p, q, ${coefCols.mkString(", ")}, cc)),
       |el AS (SELECT c.user_id, c.seq, c.p, c.q, cu.d, cu.cur,
       |    greatest(c.p, c.q) AS mm, ${coefCols.map(c => s"c.$c").mkString(", ")}, c.cc
       |  FROM cand c JOIN curd cu USING (user_id)
       |  WHERE len(cu.cur) > greatest(c.p, c.q) + c.p + c.q + 4),
       |cs AS (SELECT user_id, seq, p, q, d,
       |    (len(cur) - mm)::DOUBLE AS neff, (p + q + 2)::DOUBLE AS kk,
       |    $cssExpr AS css
       |  FROM el),
       |ai AS (SELECT user_id, seq, p, q, d,
       |  CASE WHEN neff - kk - 1 > 0
       |    THEN (neff * ln(greatest(css / neff, 1e-300)) + 2.0 * kk)
       |      + ((2.0 * kk) * (kk + 1.0)) / (neff - kk - 1.0)
       |    ELSE 'infinity'::DOUBLE END AS aicc
       |  FROM cs),
       |best AS (SELECT user_id, p, d, q,
       |  row_number() OVER (PARTITION BY user_id ORDER BY aicc, seq) AS rk FROM ai)
       |SELECT user_id, p, d, q FROM best WHERE rk = 1""".stripMargin
  }
}
