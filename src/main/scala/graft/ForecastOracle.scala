package graft

/** DuckDB oracle SQL for optimizer-bearing forecast kernels.
  *
  * These kernels (Arima.thetaForecast & friends) run small deterministic
  * driver-side optimizations per series. Where the optimizer uses only
  * IEEE-exact arithmetic (+,−,×,÷,sqrt,abs,comparisons) in a fixed
  * iteration order, DuckDB can replay it bit-for-bit with `list_reduce`
  * folds whose accumulator carries the optimizer state, so the forecast
  * is oracle-checkable despite being "iterative".
  *
  * Theta (Assimakopoulos-Nikolopoulos via [[graft.kernels.Arima.thetaForecast]]):
  * OLS trend line (sequential-fold sums, matching Scala's accumulation
  * order) → θ=2 line → SES α by 40 golden-section iterations (the fold
  * accumulator is [lo, hi, c, d, f(c), f(d)]; each step re-evaluates the
  * one-step-SSE inner fold at the single new probe) → level fold →
  * 0.5·(level + line extrapolation).
  */
object ForecastOracle {

  // ── query parameters shared with the Spark query definitions ──────────
  // (SparkEntry reads these same vals, so the two engines cannot drift)
  /** Series subset for the CSS/NLL Nelder-Mead oracles (arma, auto-ETS,
    * garch): their full-panel DuckDB replays cost 2-4 min each, so the
    * hash-checked queries pin 30 series and `_e2e` variants run the full
    * panel rows-only — the kmedoids/dbscan subset discipline. */
  val NmSubsetUsers = 30L
  val DbscanEps = 0.3
  val DbscanMinPts = 3
  val EnbpiB = 10
  val EnbpiSeed = 42L
  /** ts_enbpi_oob subset: small enough that the per-(row, bootstrap) FNV
    * replay stays <10 s in DuckDB, big enough to exercise the machinery. */
  val EnbpiOobUsers = 5L

  /** Literal VALUES CTE for runtime-pinned parameters (see [[OraclePins]]). */
  private def pinsCte(name: String, cols: Seq[String], rows: Seq[Seq[String]]): String =
    s"""$name AS (SELECT * FROM (VALUES
       |  ${rows.map(_.mkString("(", ", ", ")")).mkString(",\n  ")}
       |) AS __t(${cols.mkString(", ")}))""".stripMargin

  private val W = "PARTITION BY user_id ORDER BY ts, event_id"
  private val Phi = "((sqrt(5.0)-1.0)/2.0)"

  /** One-step SES SSE at smoothing weight `alpha` over list `lst`:
    * fold acc = [level, sse] replaying the Scala loop order. */
  private def sesSse(alpha: String, lst: String): String =
    s"""list_reduce(
       |  list_prepend([$lst[1], 0.0::DOUBLE], list_transform($lst[2:], w -> [w, 0.0::DOUBLE])),
       |  (a2, y2) -> [($alpha)*y2[1] + (1.0::DOUBLE - ($alpha))*a2[1],
       |               a2[2] + (y2[1]-a2[1])*(y2[1]-a2[1])])[2]""".stripMargin

  private val newC = s"acc[4] - $Phi*(acc[4]-acc[1])"
  private val newD = s"acc[3] + $Phi*(acc[2]-acc[3])"
  private val c0 = s"0.99::DOUBLE - $Phi*(0.99::DOUBLE - 0.01::DOUBLE)"
  private val d0 = s"0.01::DOUBLE + $Phi*(0.99::DOUBLE - 0.01::DOUBLE)"

  val thetaSql: String =
    s"""WITH o AS (SELECT user_id, value, epoch_us(ts) AS us,
       |  row_number() OVER ($W) AS rn FROM events),
       |v AS (SELECT user_id, list(value ORDER BY rn) AS vs, count(*)::INT AS n
       |  FROM o GROUP BY user_id),
       |ols AS (SELECT user_id, vs, n, (n-1)/2.0 AS tm,
       |  list_reduce(vs, (x, y) -> x + y) / n AS ym FROM v),
       |ab AS (SELECT user_id, vs, n, ym, tm,
       |  CASE WHEN den > 0 THEN num/den ELSE 0.0::DOUBLE END AS b
       |  FROM (SELECT *,
       |    list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(generate_series(1, n), i -> ((i-1) - tm)*(vs[i::INT] - ym))),
       |      (x, y) -> x + y) AS num,
       |    list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(generate_series(1, n), i -> ((i-1) - tm)*((i-1) - tm))),
       |      (x, y) -> x + y) AS den
       |  FROM ols)),
       |ab2 AS (SELECT user_id, vs, n, b, ym - b*tm AS a FROM ab),
       |th AS (SELECT user_id, n, a, b,
       |  list_transform(generate_series(1, n), i -> 2.0*vs[i::INT] - (a + b*(i-1))) AS t2
       |  FROM ab2),
       |gs AS (SELECT user_id, n, a, b, t2,
       |  list_reduce(
       |    list_prepend(
       |      [0.01::DOUBLE, 0.99::DOUBLE, $c0, $d0,
       |       ${sesSse(c0, "t2")},
       |       ${sesSse(d0, "t2")}],
       |      list_transform(generate_series(1, 40), i -> [i::DOUBLE])),
       |    (acc, x) -> CASE WHEN acc[5] < acc[6]
       |      THEN [acc[1], acc[4], $newC, acc[3], ${sesSse(newC, "t2")}, acc[5]]
       |      ELSE [acc[3], acc[2], acc[4], $newD, acc[6], ${sesSse(newD, "t2")}]
       |    END) AS g
       |  FROM th),
       |lvl AS (SELECT user_id, n, a, b,
       |  list_reduce(
       |    list_prepend([t2[1]], list_transform(t2[2:], w -> [w])),
       |    (acc, y) -> [((g[1]+g[2])/2.0)*y[1] + (1.0::DOUBLE - (g[1]+g[2])/2.0)*acc[1]])[1] AS level
       |  FROM gs),
       |lastt AS (SELECT user_id, max(us) AS us FROM o GROUP BY user_id),
       |d AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, us, lag(us) OVER (PARTITION BY user_id ORDER BY us) AS lus FROM o)
       |  WHERE lus IS NOT NULL GROUP BY user_id)
       |SELECT t.user_id, s.step, make_timestamp(l.us + s.step * d.freq) AS ts,
       |  round(0.5*(t.level + t.a + t.b*(t.n + s.step - 1)) + 1e-9, 6) AS y_hat
       |FROM lvl t JOIN lastt l USING (user_id) JOIN d USING (user_id)
       |CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS step) s""".stripMargin

  // ── changepoint: exact optimal partitioning (unpruned PELT) ─────────
  //
  // DuckDB 1.0 lambda-engine constraints discovered the hard way (each
  // alternative formulation corrupted across rows):
  //  * a nested list_reduce inside a fold whose accumulator GROWS is
  //    evaluated wrongly when many rows fold in lockstep;
  //  * dynamic list indexes that DIVERGE across rows (chain-following)
  //    read other rows' data — only iteration-uniform indexes are safe;
  //  * recursive CTEs carrying growing LIST columns corrupt past ~50
  //    elements per row at 150 rows.
  // Safe shapes used here: one flat fold whose step is pure
  // list_transform + list_min/list_position (no inner fold), and a
  // purely relational recursive CTE over scalar columns for the
  // backtrack chain.

  private def segSql(s: String, t: String): String =
    s"(ss[($t)+1] - ss[($s)+1]) - (($t)-($s))*" +
      s"(((cs[($t)+1] - cs[($s)+1])/(($t)-($s))))*(((cs[($t)+1] - cs[($s)+1])/(($t)-($s))))"

  private val peltCand =
    s"""list_transform(generate_series(0, (x[1])::INT - 2), s ->
       |  acc[2*(s::INT) + 1] + (${segSql("s::INT", "(x[1])::INT")}) + pen)""".stripMargin

  val peltSql: String =
    s"""WITH RECURSIVE v AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs,
       |  list(epoch_us(ts) ORDER BY ts, event_id) AS tss, count(*)::INT AS n
       |  FROM events GROUP BY user_id),
       |pre AS (SELECT user_id, n, 2.0*ln(n) AS pen,
       |  list_reduce(list_prepend([0.0::DOUBLE], list_transform(vs, w -> [w])),
       |    (a, x) -> list_append(a, a[len(a)] + x[1])) AS cs,
       |  list_reduce(list_prepend([0.0::DOUBLE], list_transform(vs, w -> [w])),
       |    (a, x) -> list_append(a, a[len(a)] + x[1]*x[1])) AS ss
       |  FROM v),
       |dp AS (SELECT user_id, n, list_reduce(
       |    list_prepend(
       |      [-pen, 0.0::DOUBLE, 'infinity'::DOUBLE, 0.0::DOUBLE],
       |      list_transform(generate_series(2, n), t -> [t::DOUBLE])),
       |    (acc, x) -> list_concat(acc,
       |      [list_min($peltCand), (list_position($peltCand, list_min($peltCand)) - 1)::DOUBLE])
       |  ) AS flat
       |FROM pre),
       |lastt AS (SELECT user_id,
       |  unnest(generate_series(0, n)) AS t,
       |  unnest(list_transform(generate_series(1, n + 1), p -> flat[2*p::INT]))::INT AS last_t
       |  FROM dp),
       |tsr AS (SELECT user_id, unnest(generate_series(1, n)) AS pos, unnest(tss) AS us FROM v),
       |dims AS (SELECT user_id, n FROM dp),
       |chain AS (
       |  SELECT user_id, n AS idx FROM dims
       |  UNION ALL
       |  SELECT c.user_id, l.last_t
       |  FROM chain c JOIN lastt l ON l.user_id = c.user_id AND l.t = c.idx
       |  WHERE c.idx > 0
       |)
       |SELECT c.user_id, c.idx::BIGINT AS changepoint_idx, make_timestamp(t.us) AS ts
       |FROM chain c
       |JOIN dims d ON c.user_id = d.user_id
       |JOIN tsr t ON t.user_id = c.user_id AND t.pos = c.idx + 1
       |WHERE c.idx > 0 AND c.idx <> d.n""".stripMargin

  // ── truncated path signature, depth 2 over the (t, x) path ──────────
  val pathSignatureSql: String =
    s"""WITH v AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs, count(*)::INT AS n
       |  FROM events GROUP BY user_id),
       |inc AS (SELECT user_id, n, greatest(n-1, 0)::INT AS m,
       |  1.0::DOUBLE/greatest(n-1, 1) AS dt,
       |  list_transform(generate_series(1, greatest(n-1, 0)), i -> vs[i::INT + 1] - vs[i::INT]) AS dx
       |  FROM v),
       |cum AS (SELECT user_id, m, dt, dx,
       |  list_reduce(list_prepend([0.0::DOUBLE], list_transform(generate_series(1, m), i -> [i::DOUBLE])),
       |    (a, x) -> list_append(a, a[len(a)] + dt)) AS ct,
       |  list_reduce(list_prepend([0.0::DOUBLE], list_transform(dx, w -> [w])),
       |    (a, x) -> list_append(a, a[len(a)] + x[1])) AS cx
       |  FROM inc)
       |SELECT user_id,
       |  round(ct[m+1] + 1e-9, 6) AS sig_0,
       |  round(cx[m+1] + 1e-9, 6) AS sig_1,
       |  round(list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(generate_series(2, m), t -> ct[(t)::INT] * dt)), (x, y) -> x + y) + 1e-9, 6) AS sig_2,
       |  round(list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(generate_series(2, m), t -> ct[(t)::INT] * dx[(t)::INT])), (x, y) -> x + y) + 1e-9, 6) AS sig_3,
       |  round(list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(generate_series(2, m), t -> cx[(t)::INT] * dt)), (x, y) -> x + y) + 1e-9, 6) AS sig_4,
       |  round(list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(generate_series(2, m), t -> cx[(t)::INT] * dx[(t)::INT])), (x, y) -> x + y) + 1e-9, 6) AS sig_5
       |FROM cum""".stripMargin

  // ── STFT spectrogram summary (nperseg=32, hann, log1p, one-sided) ───
  // Per (freq, frame) cell one constant-size [re, im] fold replays the
  // Scala DFT accumulation order; the flat k-major list then reproduces
  // `flatten.sum` addition order for the mean. The fold is written twice
  // ([1] and [2]) because SQL has no let-binding — identical
  // deterministic evaluation, just 2× work at sf0.01 scale.
  private val specFold =
    s"""list_reduce(list_prepend([0.0::DOUBLE, 0.0::DOUBLE],
       |          list_transform(generate_series(0, 31), i -> [i::DOUBLE])),
       |          (a, xi) -> [
       |            a[1] + ext[(f*16 + xi[1])::INT + 1]*win[(xi[1])::INT + 1]*cos(-2.0*pi()*k*(xi[1])/32),
       |            a[2] + ext[(f*16 + xi[1])::INT + 1]*win[(xi[1])::INT + 1]*sin(-2.0*pi()*k*(xi[1])/32)])""".stripMargin

  val spectrogramSql: String =
    s"""WITH v AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs, count(*)::INT AS n
       |  FROM events GROUP BY user_id),
       |e AS (SELECT user_id, n,
       |  list_concat(list_concat(list_transform(generate_series(1, 16), i -> 0.0::DOUBLE), vs),
       |              list_transform(generate_series(1, 16), i -> 0.0::DOUBLE)) AS ext,
       |  list_transform(generate_series(0, 31), i -> 0.5 - 0.5*cos(2.0*pi()*i/32)) AS win,
       |  n//16 + 1 AS nframes
       |  FROM v),
       |m AS (SELECT user_id, n, nframes,
       |  flatten(list_transform(generate_series(0, 16), k ->
       |    list_transform(generate_series(0, nframes - 1), f ->
       |      ln(1.0::DOUBLE + sqrt(
       |        ($specFold)[1]
       |        **2 +
       |        ($specFold)[2]
       |        **2))
       |    ))) AS flat
       |  FROM e)
       |SELECT user_id, 17 AS n_freq, nframes AS n_frames,
       |  round(list_reduce(flat, (x, y) -> x + y) / len(flat) + 1e-9, 6) AS mean_mag,
       |  round(list_max(flat) + 1e-9, 6) AS max_mag
       |FROM m""".stripMargin

  // ── Morlet CWT scalogram summary (8 log-spaced scales) ──────────────
  private val scalFold =
    s"""list_reduce(list_prepend([0.0::DOUBLE, 0.0::DOUBLE],
       |          list_transform(generate_series(0, ms[si::INT]), j -> [j::DOUBLE])),
       |          (a, xj) -> [
       |            a[1] + CASE WHEN t0 + (xj[1])::INT - hs[si::INT] >= 0 AND t0 + (xj[1])::INT - hs[si::INT] < n THEN vs[(t0 + (xj[1])::INT - hs[si::INT])::INT + 1] * wre[si::INT][(xj[1])::INT + 1] ELSE 0.0::DOUBLE END,
       |            a[2] - CASE WHEN t0 + (xj[1])::INT - hs[si::INT] >= 0 AND t0 + (xj[1])::INT - hs[si::INT] < n THEN vs[(t0 + (xj[1])::INT - hs[si::INT])::INT + 1] * wim[si::INT][(xj[1])::INT + 1] ELSE 0.0::DOUBLE END])""".stripMargin

  val scalogramSql: String =
    s"""WITH v AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs, count(*)::INT AS n
       |  FROM events GROUP BY user_id),
       |sc AS (SELECT user_id, vs, n,
       |  list_transform(generate_series(0, 7), i ->
       |    exp(0.0::DOUBLE + (ln(greatest(n/4.0, 2.0)) - 0.0::DOUBLE) * i / 7)) AS scales
       |  FROM v),
       |w AS (SELECT user_id, vs, n, scales,
       |  list_transform(scales, s -> greatest(least((10*ceil(s))::INT, n), 1)) AS ms
       |  FROM sc),
       |wv AS (SELECT user_id, vs, n, scales, ms,
       |  list_transform(generate_series(1, 8), si ->
       |    list_transform(generate_series(0, ms[si::INT]), j ->
       |      pow(pi(), -0.25) * cos(5.0*(j - ms[si::INT]//2)/scales[si::INT])
       |        * exp(-0.5*((j - ms[si::INT]//2)/scales[si::INT])*((j - ms[si::INT]//2)/scales[si::INT])))) AS wre,
       |  list_transform(generate_series(1, 8), si ->
       |    list_transform(generate_series(0, ms[si::INT]), j ->
       |      pow(pi(), -0.25) * sin(5.0*(j - ms[si::INT]//2)/scales[si::INT])
       |        * exp(-0.5*((j - ms[si::INT]//2)/scales[si::INT])*((j - ms[si::INT]//2)/scales[si::INT])))) AS wim,
       |  list_transform(generate_series(1, 8), si -> (ms[si::INT] + 1)//2) AS hs
       |  FROM w),
       |m AS (SELECT user_id, n,
       |  flatten(list_transform(generate_series(1, 8), si ->
       |    list_transform(generate_series(0, n - 1), t0 ->
       |      sqrt(
       |        ($scalFold)[1]**2 +
       |        ($scalFold)[2]**2)
       |    ))) AS flat
       |  FROM wv)
       |SELECT user_id, 8 AS n_scales,
       |  round(list_reduce(flat, (x, y) -> x + y) / len(flat) + 1e-9, 6) AS mean_mag,
       |  round(list_max(flat) + 1e-9, 6) AS max_mag
       |FROM m""".stripMargin

  // ── RQA + GASF trace + MTF mean over the z-normed / raw series ──────
  // recurrence_rate and determinism are exact integer ratios; the GASF
  // trace and MTF mean replay the Scala accumulation orders (row-major
  // folds), with bins via the monotone-threshold count equivalence of
  // the reference's while-loop binning. NOTE: lambda bodies inside CASE
  // branches must stay single-line (DuckDB 1.0 parser quirk).
  private def rqaRec(i: String, j: String): String =
    s"(CASE WHEN abs(z[$i] - z[$j]) <= 0.2::DOUBLE THEN 1 ELSE 0 END)"

  val rqaSql: String = {
    val rec = rqaRec("i::INT", "j::INT")
    val recD1 = rqaRec("i::INT - 1", "j::INT - 1")
    val recD2 = rqaRec("i::INT + 1", "j::INT + 1")
    val binExpr = (1 to 7).map(b =>
      s"(CASE WHEN w > srt[(floor($b.0/8.0*(n-1)))::INT + 1] THEN 1 ELSE 0 END)")
      .mkString(" +\n    ")
    s"""WITH v AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs, count(*)::INT AS n
       |  FROM events GROUP BY user_id),
       |zz AS (SELECT user_id, vs, n,
       |  list_reduce(vs, (x, y) -> x + y) / n AS mu
       |  FROM v),
       |z2 AS (SELECT user_id, vs, n,
       |  sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(vs, w -> (w - mu)*(w - mu))),
       |    (x, y) -> x + y) / n) AS sd, mu
       |  FROM zz),
       |z3 AS (SELECT user_id, vs, n,
       |  CASE WHEN sd = 0.0 THEN list_transform(vs, w -> 0.0::DOUBLE)
       |       ELSE list_transform(vs, w -> (w - mu)/sd) END AS z
       |  FROM z2),
       |cnt AS (SELECT user_id, vs, n, z,
       |  list_sum(flatten(list_transform(generate_series(1, n), i ->
       |    list_transform(generate_series(1, n), j ->
       |      CASE WHEN i <> j AND $rec = 1 THEN 1 ELSE 0 END))))::BIGINT AS recur,
       |  list_sum(flatten(list_transform(generate_series(1, n), i ->
       |    list_transform(generate_series(1, n), j ->
       |      CASE WHEN i <> j AND $rec = 1
       |        AND ((i > 1 AND j > 1 AND $recD1 = 1)
       |          OR (i < n AND j < n AND $recD2 = 1))
       |      THEN 1 ELSE 0 END))))::BIGINT AS diag
       |  FROM z3),
       |tr AS (SELECT user_id, vs, n, recur, diag,
       |  list_min(vs) AS mn, list_max(vs) AS mx FROM cnt),
       |tr2 AS (SELECT user_id, vs, n, recur, diag,
       |  list_reduce(list_prepend(0.0::DOUBLE,
       |    CASE WHEN mx = mn THEN list_transform(vs, w -> cos(acos(0.0::DOUBLE) + acos(0.0::DOUBLE)))
       |    ELSE list_transform(vs, w -> cos(acos(greatest(-1.0::DOUBLE, least(1.0::DOUBLE, 2.0*(w - mn)/(mx - mn) - 1.0))) + acos(greatest(-1.0::DOUBLE, least(1.0::DOUBLE, 2.0*(w - mn)/(mx - mn) - 1.0))))) END),
       |    (x, y) -> x + y) / n AS trace,
       |  mn, mx
       |  FROM tr),
       |b1 AS (SELECT user_id, vs, n, recur, diag, trace,
       |  list_sort(vs) AS srt FROM tr2),
       |b2 AS (SELECT user_id, vs, n, recur, diag, trace,
       |  list_transform(vs, w ->
       |    $binExpr) AS bins
       |  FROM b1),
       |wcnt AS (SELECT user_id, n, recur, diag, trace, bins,
       |  list_reduce(
       |    list_prepend(list_transform(generate_series(1, 64), k -> 0.0::DOUBLE),
       |      list_transform(generate_series(1, n - 1), t -> [t::DOUBLE])),
       |    (acc, x) -> list_transform(generate_series(1, 64), k ->
       |      acc[k::INT] + CASE WHEN k = bins[(x[1])::INT] * 8 + bins[(x[1])::INT + 1] + 1 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)) AS wflat
       |  FROM b2),
       |wnorm AS (SELECT user_id, n, recur, diag, trace, bins,
       |  list_transform(generate_series(1, 64), k ->
       |    CASE WHEN rs[((k - 1) // 8)::INT + 1] > 0 THEN wflat[k::INT] / rs[((k - 1) // 8)::INT + 1] ELSE wflat[k::INT] END) AS wn
       |  FROM (SELECT *,
       |    list_transform(generate_series(0, 7), r ->
       |      wflat[(r*8)::INT + 1] + wflat[(r*8)::INT + 2] + wflat[(r*8)::INT + 3] + wflat[(r*8)::INT + 4] +
       |      wflat[(r*8)::INT + 5] + wflat[(r*8)::INT + 6] + wflat[(r*8)::INT + 7] + wflat[(r*8)::INT + 8]) AS rs
       |    FROM wcnt) q),
       |mtf AS (SELECT user_id, n, recur, diag, trace,
       |  list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, n), i ->
       |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, n), j ->
       |      wn[(bins[i::INT] * 8 + bins[j::INT] + 1)::INT])),
       |      (x, y) -> x + y))),
       |    (x, y) -> x + y) / (n::DOUBLE * n) AS mtf_mean
       |  FROM wnorm)
       |SELECT user_id, recur::DOUBLE / (n::BIGINT*n - n) AS recurrence_rate,
       |  CASE WHEN recur = 0 THEN 0.0 ELSE diag::DOUBLE / recur END AS determinism,
       |  round(trace + 1e-9, 6) AS gasf_trace_mean,
       |  round(mtf_mean + 1e-9, 6) AS mtf_mean
       |FROM mtf""".stripMargin
  }

  // ── shared Cramer machinery (mirrors SparkEntry.detSql) ─────────────
  private[graft] def det(m: Array[Array[String]]): String =
    if (m.length == 1) m(0)(0)
    else (0 until m.length).map { j =>
      val minor = Array.tabulate(m.length - 1, m.length - 1)(
        (r, c) => m(r + 1)(if (c < j) c else c + 1))
      val sign = if (j % 2 == 0) "" else "-"
      s"$sign ${m(0)(j)} * (${det(minor)})"
    }.mkString(" + ").replace("+ -", "- ")

  private[graft] def cramer(m: Array[Array[String]], b: Array[String]): Array[String] = {
    val d = det(m)
    Array.tabulate(b.length) { c =>
      val rep = Array.tabulate(m.length, m.length)((r, cc) => if (cc == c) b(r) else m(r)(cc))
      s"((${det(rep)}) / ($d))"
    }
  }

  // ── ARIMA(2,1,0): diff → AR(2)+c normal equations (Cramer 3×3, vs the
  // Spark side's partial-pivot LU — agreement within round-6 + nudge as
  // established for the ridge oracles) → recursion fold → integrate ────
  val arimaSql: String = {
    val m = Array(
      Array("sxx11", "sxx12", "sx1"),
      Array("sxx12", "sxx22", "sx2"),
      Array("sx1", "sx2", "cnt"))
    val b = Array("sxy1", "sxy2", "sy")
    val c = cramer(m, b)
    s"""WITH v AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs, count(*)::INT AS n
       |  FROM events GROUP BY user_id),
       |dv AS (SELECT user_id, n - 1 AS nd, vs[n] AS lastv,
       |  list_transform(generate_series(1, n - 1), i -> vs[i::INT + 1] - vs[i::INT]) AS d1
       |  FROM v),
       |r AS (SELECT user_id, nd, lastv, d1,
       |  unnest(generate_series(3, nd)) AS t FROM dv),
       |g AS (SELECT user_id, any_value(nd) AS nd, any_value(lastv) AS lastv, any_value(d1) AS d1,
       |  sum(d1[t::INT - 1] * d1[t::INT - 1]) AS sxx11,
       |  sum(d1[t::INT - 1] * d1[t::INT - 2]) AS sxx12,
       |  sum(d1[t::INT - 2] * d1[t::INT - 2]) AS sxx22,
       |  sum(d1[t::INT - 1]) AS sx1,
       |  sum(d1[t::INT - 2]) AS sx2,
       |  count(*)::DOUBLE AS cnt,
       |  sum(d1[t::INT - 1] * d1[t::INT]) AS sxy1,
       |  sum(d1[t::INT - 2] * d1[t::INT]) AS sxy2,
       |  sum(d1[t::INT]) AS sy
       |  FROM r GROUP BY user_id),
       |co AS (SELECT user_id, nd, lastv, d1, ${c(0)} AS phi1, ${c(1)} AS phi2, ${c(2)} AS c0 FROM g),
       |fc AS (SELECT user_id, lastv,
       |  (list_reduce(
       |    list_prepend([d1[nd - 1], d1[nd]],
       |      list_transform(generate_series(1, 5), s -> [s::DOUBLE, 0.0::DOUBLE])),
       |    (acc, x) -> list_append(acc, c0 + phi1*acc[len(acc)] + phi2*acc[len(acc) - 1])
       |  ))[3:] AS dfc
       |  FROM co),
       |ic AS (SELECT user_id,
       |  list_reduce(list_prepend([lastv], list_transform(dfc, w -> [w])),
       |    (a, x) -> list_append(a, a[len(a)] + x[1]))[2:] AS ifc
       |  FROM fc)
       |SELECT user_id, unnest(generate_series(1, 5))::INT AS step,
       |  round(unnest(ifc) + 1e-9, 6) AS y_hat
       |FROM ic""".stripMargin
  }

  // ── Granger causality (p = 2): restricted 3×3 / full 5×5 Cramer OLS;
  // F survival via the closed form I_x(a, 1) = x^a (the Scala Lentz
  // continued fraction agrees to ~1e-12, inside the nudge) ─────────────
  val grangerSql: String = {
    val mr = Array(
      Array("ry11", "ry12", "ry1o"),
      Array("ry12", "ry22", "ry2o"),
      Array("ry1o", "ry2o", "cnt"))
    val br = Array("ry1y", "ry2y", "ryy1")
    val mf = Array(
      Array("ry11", "ry12", "m13", "m14", "ry1o"),
      Array("ry12", "ry22", "m23", "m24", "ry2o"),
      Array("m13", "m23", "m33", "m34", "m3o"),
      Array("m14", "m24", "m34", "m44", "m4o"),
      Array("ry1o", "ry2o", "m3o", "m4o", "cnt"))
    val bf = Array("ry1y", "ry2y", "b3", "b4", "ryy1")
    val cr = cramer(mr, br)
    val cf = cramer(mf, bf)
    s"""WITH wide AS (
       |  SELECT date_trunc('day', ts) AS d,
       |    coalesce(avg(value) FILTER (event_type = (SELECT min(event_type) FROM events WHERE event_type > (SELECT min(event_type) FROM events))), 0.0) AS eff,
       |    coalesce(avg(value) FILTER (event_type = (SELECT min(event_type) FROM events)), 0.0) AS cau
       |  FROM events GROUP BY 1),
       |o AS (SELECT eff, cau, row_number() OVER (ORDER BY d) AS rn FROM wide),
       |r AS (SELECT a.eff AS y, y1.eff AS y1, y2.eff AS y2, y1.cau AS x1, y2.cau AS x2
       |  FROM o a JOIN o y1 ON y1.rn = a.rn - 1 JOIN o y2 ON y2.rn = a.rn - 2),
       |g AS (SELECT
       |  sum(y1*y1) AS ry11, sum(y1*y2) AS ry12, sum(y2*y2) AS ry22,
       |  sum(y1) AS ry1o, sum(y2) AS ry2o, count(*)::DOUBLE AS cnt,
       |  sum(y1*x1) AS m13, sum(y1*x2) AS m14, sum(y2*x1) AS m23, sum(y2*x2) AS m24,
       |  sum(x1*x1) AS m33, sum(x1*x2) AS m34, sum(x2*x2) AS m44,
       |  sum(x1) AS m3o, sum(x2) AS m4o,
       |  sum(y1*y) AS ry1y, sum(y2*y) AS ry2y, sum(x1*y) AS b3, sum(x2*y) AS b4,
       |  sum(y) AS ryy1
       |  FROM r),
       |br AS (SELECT ${cr(0)} AS br1, ${cr(1)} AS br2, ${cr(2)} AS br3 FROM g),
       |bf AS (SELECT ${cf(0)} AS bf1, ${cf(1)} AS bf2, ${cf(2)} AS bf3, ${cf(3)} AS bf4, ${cf(4)} AS bf5 FROM g),
       |srs AS (SELECT
       |  (SELECT sum((y - (br1*y1 + br2*y2 + br3))*(y - (br1*y1 + br2*y2 + br3))) FROM r, br) AS ssr_r,
       |  (SELECT sum((y - (bf1*y1 + bf2*y2 + bf3*x1 + bf4*x2 + bf5))*(y - (bf1*y1 + bf2*y2 + bf3*x1 + bf4*x2 + bf5))) FROM r, bf) AS ssr_f,
       |  (SELECT count(*)::INT FROM r) AS nr),
       |ff AS (SELECT ((ssr_r - ssr_f)/2.0) / (ssr_f/(nr - 5)) AS f, nr FROM srs)
       |SELECT round(f + 1e-9, 6) AS f_stat,
       |  round((CASE WHEN f <= 0 THEN 1.0 ELSE pow((nr - 5)/((nr - 5) + 2.0*f), (nr - 5)/2.0) END) + 1e-9, 6) AS p_value
       |FROM ff""".stripMargin
  }

  // ── DBSCAN over SBD (60-series subset, eps 0.3, minPts 3): core =
  // neighbor count (self included), clusters = connected components of
  // the core graph (recursive closure on scalar columns), cluster ids =
  // dense rank of each component's first string-sorted core index
  // (replays the Scala scan-order numbering), border points take the
  // lowest-numbered adjacent cluster, else noise -1 ─────────────────────
  val dbscanSql: String = {
    val sbdExpr =
      """CASE WHEN sqrt(list_reduce(list_transform(va, v -> v*v), (x, y) -> x + y)) *
        |          sqrt(list_reduce(list_transform(vb, v -> v*v), (x, y) -> x + y)) = 0.0
        |  THEN 1.0::DOUBLE
        |  ELSE 1.0::DOUBLE - list_max(
        |    list_transform(generate_series(0, n + m - 2), k ->
        |      list_reduce(
        |        list_prepend(0.0::DOUBLE,
        |          list_transform(generate_series(greatest(1, (k::INT - m + 1) + 1), least(n, m + (k::INT - m + 1))),
        |            ii -> va[ii::INT] * vb[(ii - (k::INT - m + 1))::INT])),
        |        (x, y) -> x + y)
        |    )) / (sqrt(list_reduce(list_transform(va, v -> v*v), (x, y) -> x + y)) *
        |          sqrt(list_reduce(list_transform(vb, v -> v*v), (x, y) -> x + y)))
        |END""".stripMargin
    s"""WITH RECURSIVE s AS (
       |  SELECT user_id, list(value ORDER BY ts, event_id) AS vs
       |  FROM events WHERE ${ElasticOracle.SeriesFilter} GROUP BY user_id),
       |si AS (SELECT user_id, row_number() OVER (ORDER BY user_id::VARCHAR) - 1 AS sidx FROM s),
       |p AS (SELECT a.user_id AS u1, b.user_id AS u2, a.vs AS va, b.vs AS vb,
       |  len(a.vs)::INT AS n, len(b.vs)::INT AS m
       |  FROM s a JOIN s b ON a.user_id < b.user_id),
       |dh AS (SELECT u1, u2, ($sbdExpr) AS d FROM p),
       |sym AS (
       |  SELECT u1 AS ua, u2 AS ub, d FROM dh
       |  UNION ALL SELECT u2, u1, d FROM dh
       |  UNION ALL SELECT user_id, user_id, 0.0::DOUBLE FROM s),
       |core AS (SELECT ua AS u, count(*) >= $DbscanMinPts AS is_core
       |  FROM sym WHERE d <= $DbscanEps GROUP BY ua),
       |coreids AS (SELECT c.u, s2.sidx FROM core c JOIN si s2 ON s2.user_id = c.u WHERE c.is_core),
       |edges AS (SELECT y.ua, y.ub FROM sym y
       |  JOIN coreids c1 ON c1.u = y.ua JOIN coreids c2 ON c2.u = y.ub
       |  WHERE y.d <= $DbscanEps),
       |reach AS (
       |  SELECT u AS src, u AS dst FROM coreids
       |  UNION
       |  SELECT r.src, e.ub FROM reach r JOIN edges e ON e.ua = r.dst
       |),
       |comp AS (SELECT r.src AS u, min(s2.sidx) AS rep
       |  FROM reach r JOIN si s2 ON s2.user_id = r.dst GROUP BY r.src),
       |clus AS (SELECT u, (dense_rank() OVER (ORDER BY rep) - 1)::INT AS cluster FROM comp),
       |border AS (
       |  SELECT y.ua AS u, min(cl.cluster) AS cluster
       |  FROM sym y
       |  JOIN coreids c2 ON c2.u = y.ub
       |  JOIN clus cl ON cl.u = y.ub
       |  LEFT JOIN coreids c1 ON c1.u = y.ua
       |  WHERE y.d <= $DbscanEps AND c1.u IS NULL AND y.ua <> y.ub
       |  GROUP BY y.ua)
       |SELECT s.user_id, coalesce(cl.cluster, b.cluster, -1) AS cluster
       |FROM s
       |LEFT JOIN clus cl ON cl.u = s.user_id
       |LEFT JOIN border b ON b.u = s.user_id""".stripMargin
  }

  /** ts_dbscan_e2e (r12): full-panel DBSCAN replay. The subset oracle's
    * transitive-closure recursive CTE materializes O(ncore²) (src, dst)
    * pairs — measured 15 s at 60 series and super-linear in the core
    * count — so the full-panel form computes the same core components
    * with BOUNDED min-label propagation: `rounds` chained CTEs, each one
    * hooking (min label over eps-neighbors incl. self) plus pointer
    * jumping (label of the node my label points at, Shiloach-Vishkin
    * style), each round one O(edges) join. Jumping doubles the effective
    * propagation distance per round, so `rounds` = 24 covers any
    * component shape at n ≤ 150 with a wide margin (2²⁴ ≫ n); a
    * non-converged label could only surface as a gate hash MISMATCH,
    * never a silent pass. Border/noise assignment and the
    * discovery-order cluster numbering (dense_rank over each component's
    * min core index) are unchanged from the subset oracle. */
  def dbscanE2eSql(eps: Double, minPts: Int, rounds: Int = 24,
      filter: String = "TRUE"): String = {
    val sbdExpr =
      """CASE WHEN sqrt(list_reduce(list_transform(va, v -> v*v), (x, y) -> x + y)) *
        |          sqrt(list_reduce(list_transform(vb, v -> v*v), (x, y) -> x + y)) = 0.0
        |  THEN 1.0::DOUBLE
        |  ELSE 1.0::DOUBLE - list_max(
        |    list_transform(generate_series(0, n + m - 2), k ->
        |      list_reduce(
        |        list_prepend(0.0::DOUBLE,
        |          list_transform(generate_series(greatest(1, (k::INT - m + 1) + 1), least(n, m + (k::INT - m + 1))),
        |            ii -> va[ii::INT] * vb[(ii - (k::INT - m + 1))::INT])),
        |        (x, y) -> x + y)
        |    )) / (sqrt(list_reduce(list_transform(va, v -> v*v), (x, y) -> x + y)) *
        |          sqrt(list_reduce(list_transform(vb, v -> v*v), (x, y) -> x + y)))
        |END""".stripMargin
    val prop = (1 to rounds).map { i =>
      val prev = s"l${i - 1}"
      s"""h$i AS (SELECT e.ua AS u, min(l.lbl) AS lbl
         |  FROM edges e JOIN $prev l ON l.u = e.ub GROUP BY e.ua),
         |j$i AS (SELECT l1.u, l2.lbl
         |  FROM $prev l1 JOIN coreids c2 ON c2.sidx = l1.lbl
         |  JOIN $prev l2 ON l2.u = c2.u),
         |l$i AS MATERIALIZED (SELECT h.u, least(h.lbl, j.lbl) AS lbl
         |  FROM h$i h JOIN j$i j USING (u))""".stripMargin
    }.mkString(",\n")
    s"""WITH s AS (
       |  SELECT user_id, list(value ORDER BY ts, event_id) AS vs
       |  FROM events WHERE $filter GROUP BY user_id),
       |si AS (SELECT user_id, row_number() OVER (ORDER BY user_id::VARCHAR) - 1 AS sidx FROM s),
       |p AS (SELECT a.user_id AS u1, b.user_id AS u2, a.vs AS va, b.vs AS vb,
       |  len(a.vs)::INT AS n, len(b.vs)::INT AS m
       |  FROM s a JOIN s b ON a.user_id < b.user_id),
       |dh AS MATERIALIZED (SELECT u1, u2, ($sbdExpr) AS d FROM p),
       |sym AS MATERIALIZED (
       |  SELECT u1 AS ua, u2 AS ub, d FROM dh
       |  UNION ALL SELECT u2, u1, d FROM dh
       |  UNION ALL SELECT user_id, user_id, 0.0::DOUBLE FROM s),
       |core AS (SELECT ua AS u, count(*) >= $minPts AS is_core
       |  FROM sym WHERE d <= $eps GROUP BY ua),
       |coreids AS MATERIALIZED (SELECT c.u, s2.sidx FROM core c JOIN si s2 ON s2.user_id = c.u WHERE c.is_core),
       |edges AS MATERIALIZED (SELECT y.ua, y.ub FROM sym y
       |  JOIN coreids c1 ON c1.u = y.ua JOIN coreids c2 ON c2.u = y.ub
       |  WHERE y.d <= $eps),
       |l0 AS (SELECT u, sidx AS lbl FROM coreids),
       |$prop,
       |comp AS (SELECT u, lbl AS rep FROM l$rounds),
       |clus AS (SELECT u, (dense_rank() OVER (ORDER BY rep) - 1)::INT AS cluster FROM comp),
       |border AS (
       |  SELECT y.ua AS u, min(cl.cluster) AS cluster
       |  FROM sym y
       |  JOIN coreids c2 ON c2.u = y.ub
       |  JOIN clus cl ON cl.u = y.ub
       |  LEFT JOIN coreids c1 ON c1.u = y.ua
       |  WHERE y.d <= $eps AND c1.u IS NULL AND y.ua <> y.ub
       |  GROUP BY y.ua)
       |SELECT s.user_id, coalesce(cl.cluster, b.cluster, -1) AS cluster
       |FROM s
       |LEFT JOIN clus cl ON cl.u = s.user_id
       |LEFT JOIN border b ON b.u = s.user_id""".stripMargin
  }

  /** Shared CTE prefix: symmetric SBD distance table over the 60-series
    * subset (diag included) plus string-sort scan indexes and the
    * deterministic mod-3 labels used by the cluster-metric oracles. */
  private val sbdSymPrefix: String = {
    val sbdExpr =
      """CASE WHEN sqrt(list_reduce(list_transform(va, v -> v*v), (x, y) -> x + y)) *
        |          sqrt(list_reduce(list_transform(vb, v -> v*v), (x, y) -> x + y)) = 0.0
        |  THEN 1.0::DOUBLE
        |  ELSE 1.0::DOUBLE - list_max(
        |    list_transform(generate_series(0, n + m - 2), k ->
        |      list_reduce(
        |        list_prepend(0.0::DOUBLE,
        |          list_transform(generate_series(greatest(1, (k::INT - m + 1) + 1), least(n, m + (k::INT - m + 1))),
        |            ii -> va[ii::INT] * vb[(ii - (k::INT - m + 1))::INT])),
        |        (x, y) -> x + y)
        |    )) / (sqrt(list_reduce(list_transform(va, v -> v*v), (x, y) -> x + y)) *
        |          sqrt(list_reduce(list_transform(vb, v -> v*v), (x, y) -> x + y)))
        |END""".stripMargin
    s"""s AS (
       |  SELECT user_id, list(value ORDER BY ts, event_id) AS vs
       |  FROM events WHERE ${ElasticOracle.SeriesFilter} GROUP BY user_id),
       |si AS (SELECT user_id, row_number() OVER (ORDER BY user_id::VARCHAR) - 1 AS sidx FROM s),
       |p AS (SELECT a.user_id AS u1, b.user_id AS u2, a.vs AS va, b.vs AS vb,
       |  len(a.vs)::INT AS n, len(b.vs)::INT AS m
       |  FROM s a JOIN s b ON a.user_id < b.user_id),
       |dh AS (SELECT u1, u2, ($sbdExpr) AS d FROM p),
       |sym AS (
       |  SELECT u1 AS ua, u2 AS ub, d FROM dh
       |  UNION ALL SELECT u2, u1, d FROM dh
       |  UNION ALL SELECT user_id, user_id, 0.0::DOUBLE FROM s),
       |lab AS (SELECT user_id, (user_id % 3)::INT AS cluster FROM s)""".stripMargin
  }

  /** Silhouette per sample: a/b means folded in string-sort scan order. */
  val silhouetteSamplesSql: String =
    s"""WITH $sbdSymPrefix,
       |pairs AS (SELECT y.ua, y.ub, y.d, la.cluster AS ca, lb.cluster AS cb, sb.sidx AS sj
       |  FROM sym y JOIN lab la ON la.user_id = y.ua JOIN lab lb ON lb.user_id = y.ub
       |  JOIN si sb ON sb.user_id = y.ub
       |  WHERE y.ua <> y.ub),
       |aa AS (SELECT ua, list_reduce(list_prepend(0.0::DOUBLE, list(d ORDER BY sj)), (x, y) -> x + y)
       |    / count(*) AS ai
       |  FROM pairs WHERE ca = cb GROUP BY ua),
       |bb AS (SELECT ua, min(mb) AS bi FROM (
       |  SELECT ua, cb, list_reduce(list_prepend(0.0::DOUBLE, list(d ORDER BY sj)), (x, y) -> x + y)
       |      / count(*) AS mb
       |  FROM pairs WHERE ca <> cb GROUP BY ua, cb) q GROUP BY ua)
       |SELECT s.user_id, (s.user_id % 3)::INT AS cluster,
       |  round((CASE WHEN greatest(ai, bi) > 0 THEN (bi - ai)/greatest(ai, bi) ELSE 0.0::DOUBLE END) + 1e-9, 6) AS silhouette
       |FROM s JOIN aa ON aa.ua = s.user_id JOIN bb ON bb.ua = s.user_id""".stripMargin

  /** Medoid Calinski-Harabasz over the same labeling. */
  val calinskiSql: String =
    s"""WITH $sbdSymPrefix,
       |insum AS (SELECT y.ua AS i, la.cluster AS c, sum(y.d) AS sd
       |  FROM sym y JOIN lab la ON la.user_id = y.ua JOIN lab lb ON lb.user_id = y.ub
       |  WHERE lb.cluster = la.cluster GROUP BY y.ua, la.cluster),
       |med AS (SELECT c, i AS medoid FROM (
       |  SELECT c, i, row_number() OVER (PARTITION BY c ORDER BY sd, (SELECT sidx FROM si WHERE si.user_id = i)) AS rk
       |  FROM insum) q WHERE rk = 1),
       |gsum AS (SELECT y.ua AS i, sum(y.d) AS sd FROM sym y GROUP BY y.ua),
       |gmed AS (SELECT i AS gmedoid FROM (
       |  SELECT i, row_number() OVER (ORDER BY sd, (SELECT sidx FROM si WHERE si.user_id = i)) AS rk
       |  FROM gsum) q WHERE rk = 1),
       |wk AS (SELECT sum(y.d * y.d) AS wk FROM sym y
       |  JOIN lab la ON la.user_id = y.ua JOIN med m ON m.c = la.cluster AND m.medoid = y.ub),
       |bk AS (SELECT sum(cnt * dd * dd) AS bk FROM (
       |  SELECT m.c, (SELECT count(*) FROM lab WHERE lab.cluster = m.c) AS cnt,
       |    (SELECT y.d FROM sym y JOIN gmed g ON g.gmedoid = y.ub WHERE y.ua = m.medoid) AS dd
       |  FROM med m) q),
       |dims AS (SELECT count(*)::INT AS n FROM s)
       |SELECT round((CASE WHEN wk.wk = 0 THEN 0.0::DOUBLE
       |  ELSE (bk.bk / (3 - 1)) / (wk.wk / (dims.n - 3)) END) + 1e-9, 6) AS calinski_harabasz
       |FROM wk, bk, dims""".stripMargin

  /** Mean silhouette + medoid Davies-Bouldin metric CTEs + final select,
    * over CTEs `sym`, `si`, `lab` supplied by the caller's prefix (the
    * mod-3 subset prefix, or the r12 PAM-replay chain). */
  private val evalMetricSql: String =
    s"""pairs AS (SELECT y.ua, y.ub, y.d, la.cluster AS ca, lb.cluster AS cb, sb.sidx AS sj
       |  FROM sym y JOIN lab la ON la.user_id = y.ua JOIN lab lb ON lb.user_id = y.ub
       |  JOIN si sb ON sb.user_id = y.ub
       |  WHERE y.ua <> y.ub),
       |aa AS (SELECT ua, list_reduce(list_prepend(0.0::DOUBLE, list(d ORDER BY sj)), (x, y) -> x + y)
       |    / count(*) AS ai FROM pairs WHERE ca = cb GROUP BY ua),
       |bb AS (SELECT ua, min(mb) AS bi FROM (
       |  SELECT ua, cb, list_reduce(list_prepend(0.0::DOUBLE, list(d ORDER BY sj)), (x, y) -> x + y)
       |      / count(*) AS mb
       |  FROM pairs WHERE ca <> cb GROUP BY ua, cb) q GROUP BY ua),
       |sil AS (SELECT avg((bi - ai) / greatest(ai, bi)) AS silhouette FROM aa JOIN bb USING (ua)),
       |insum AS (SELECT y.ua AS i, la.cluster AS c, sum(y.d) AS sd
       |  FROM sym y JOIN lab la ON la.user_id = y.ua JOIN lab lb ON lb.user_id = y.ub
       |  WHERE lb.cluster = la.cluster GROUP BY y.ua, la.cluster),
       |med AS (SELECT c, i AS medoid FROM (
       |  SELECT c, i, row_number() OVER (PARTITION BY c ORDER BY sd, (SELECT sidx FROM si WHERE si.user_id = i)) AS rk
       |  FROM insum) q WHERE rk = 1),
       |scat AS (SELECT m.c, sum(y.d) / count(*) AS sc
       |  FROM sym y JOIN lab la ON la.user_id = y.ua
       |  JOIN med m ON m.c = la.cluster AND m.medoid = y.ub
       |  GROUP BY m.c),
       |seps AS (SELECT ma.c AS c1, mb.c AS c2, y.d AS sep
       |  FROM med ma JOIN med mb ON ma.c <> mb.c
       |  JOIN sym y ON y.ua = ma.medoid AND y.ub = mb.medoid),
       |worst AS (SELECT s1.c1, max(CASE WHEN s1.sep > 0 THEN (sa.sc + sb.sc) / s1.sep ELSE 0.0::DOUBLE END) AS w
       |  FROM seps s1 JOIN scat sa ON sa.c = s1.c1 JOIN scat sb ON sb.c = s1.c2
       |  GROUP BY s1.c1),
       |db AS (SELECT sum(w) / 3.0 AS davies_bouldin FROM worst)
       |SELECT round(sil.silhouette + 1e-9, 6) AS silhouette,
       |  round(db.davies_bouldin + 1e-9, 6) AS davies_bouldin
       |FROM sil, db""".stripMargin

  /** Mean silhouette + medoid Davies-Bouldin, one row (mod-3 labels,
    * 60-series subset). */
  val clusterEvalSql: String = s"WITH $sbdSymPrefix,\n$evalMetricSql"

  /** Shortest-exact double literal for DuckDB: E-notation parses directly
    * as DOUBLE (approximate numeric literal), avoiding the DECIMAL
    * round-trip a plain decimal literal would take. */
  private def dlit(v: Double): String = {
    val s = "%.17e".format(v)
    s
  }

  // ── kNN classify over cross-panel DTW (test users < 5 vs train ≥ 5):
  // the DTW nested fold feeds the same rank/vote pipeline the embedding
  // kNN oracle uses (first-min neighbor tie-break, votes-then-label) ───
  val knnClassifyDtwSql: String =
    s"""WITH s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs
       |  FROM events GROUP BY user_id),
       |p AS (SELECT a.user_id AS qid, b.user_id AS tid, a.vs AS va, b.vs AS vb,
       |  len(a.vs)::INT AS n, len(b.vs)::INT AS m
       |  FROM s a JOIN s b ON a.user_id < 5 AND b.user_id >= 5),
       |d AS (SELECT qid, tid, (${ElasticOracle.dtwFoldExpr}) AS dist FROM p),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY dist, tid) AS rk FROM d),
       |v AS (SELECT qid, (tid % 3)::INT AS label, count(*) AS votes
       |  FROM rk WHERE rk <= 5 GROUP BY qid, (tid % 3)::INT),
       |w AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label ASC) AS wr FROM v)
       |SELECT qid AS query_id, label AS predicted_label, votes FROM w WHERE wr = 1""".stripMargin

  // ── inventory plan: naive forecast → promo lift → base-stock policy ─
  val inventoryPlanSql: String =
    s"""WITH o AS (SELECT user_id, value, event_id,
       |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       |  count(*) OVER (PARTITION BY user_id) AS n
       |  FROM events),
       |lastv AS (SELECT user_id, value AS y_hat FROM o WHERE rn = n),
       |lift AS (SELECT user_id,
       |  CASE WHEN pm IS NULL OR bm IS NULL OR bm <= 0.0 THEN 0.0::DOUBLE ELSE pm/bm - 1.0 END AS promo_lift
       |  FROM (SELECT user_id,
       |    avg(CASE WHEN event_id % 11 = 0 THEN value END) AS pm,
       |    avg(CASE WHEN event_id % 11 <> 0 THEN value END) AS bm
       |    FROM events GROUP BY user_id) q),
       |fc AS (SELECT l.user_id, s.step,
       |  l.y_hat * (1.0 + li.promo_lift * (CASE WHEN s.step <= 2 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)) AS yh
       |  FROM lastv l JOIN lift li USING (user_id)
       |  CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS step) s),
       |stats AS (SELECT user_id,
       |  sum(CASE WHEN step <= 3 THEN yh END) AS lead_demand,
       |  coalesce(stddev_pop(yh), 0.0) AS std
       |  FROM fc GROUP BY user_id),
       |oh AS (SELECT user_id, avg(value) * 2 AS on_hand FROM events GROUP BY user_id)
       |SELECT st.user_id,
       |  round((st.lead_demand + 1.65 * st.std * sqrt(3.0)) + 1e-9, 6) AS order_up_to,
       |  round((1.65 * st.std * sqrt(3.0)) + 1e-9, 6) AS safety_stock,
       |  round(greatest((st.lead_demand + 1.65 * st.std * sqrt(3.0)) - oh.on_hand, 0.0) + 1e-9, 6) AS order_qty,
       |  CASE WHEN oh.on_hand < st.lead_demand THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS stockout_risk
       |FROM stats st JOIN oh USING (user_id)""".stripMargin

  // ── portfolio weights: rolling risk (stddev_pop), EWMA return fold,
  // per-timestamp min-shift normalization ─────────────────────────────
  val portfolioWeightsSql: String =
    s"""WITH rets AS (SELECT date_trunc('day', ts) AS ts, event_type AS asset,
       |  avg(value) AS ret FROM events GROUP BY 1, 2),
       |sc AS (SELECT ts, asset, ret,
       |  count(ret) OVER w AS cnt,
       |  stddev_pop(ret) OVER w AS risk,
       |  list(ret) OVER w AS window_rets
       |  FROM rets WINDOW w AS (PARTITION BY asset ORDER BY ts ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
       |er AS (SELECT ts, asset, risk,
       |  list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(generate_series(1, len(window_rets)), i ->
       |      pow(0.94, (len(window_rets) - i)::DOUBLE) * window_rets[i::INT])),
       |    (x, y) -> x + y)
       |  / list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(generate_series(1, len(window_rets)), i ->
       |      pow(0.94, (len(window_rets) - i)::DOUBLE))),
       |    (x, y) -> x + y) AS expected_return
       |  FROM sc WHERE cnt = 5),
       |scored AS (SELECT *, expected_return / (greatest(risk, 1e-10) * 1.0) AS score FROM er),
       |sh AS (SELECT *, score - min(score) OVER (PARTITION BY ts) + 1e-10 AS shifted FROM scored)
       |SELECT ts, asset, round(risk + 1e-9, 6) AS risk,
       |  round(expected_return + 1e-9, 6) AS expected_return,
       |  round(shifted / sum(shifted) OVER (PARTITION BY ts) + 1e-9, 6) AS weight
       |FROM sh""".stripMargin

  // ── scalar UKF (local level, f = h = identity): the per-step sigma
  // point / predict / update arithmetic is bound once per intermediate
  // in a layered-subquery recursive CTE (scalar columns only — the safe
  // shape for chain recursions) ────────────────────────────────────────
  val ukfSql: String = {
    val alpha = 1e-3; val beta = 2.0; val kappa = 0.0
    val lam = alpha * alpha * (1 + kappa) - 1
    val c = 1 + lam
    val w1 = dlit(1.0 / (2.0 * c))
    val wm0 = dlit(lam / c)
    val wc0 = dlit(lam / c + (1.0 - alpha * alpha + beta))
    val cL = dlit(c)
    s"""WITH RECURSIVE v AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs,
       |  list(epoch_us(ts) ORDER BY ts, event_id) AS tss, count(*)::INT AS n
       |  FROM events GROUP BY user_id),
       |obs AS (SELECT user_id, unnest(generate_series(1, n)) AS t, unnest(vs) AS yt FROM v),
       |tsr AS (SELECT user_id, unnest(generate_series(1, n)) AS t, unnest(tss) AS us FROM v),
       |st AS (
       |  SELECT o.user_id, 0 AS t, (SELECT vs[1] FROM v WHERE v.user_id = o.user_id) AS x,
       |    1.0::DOUBLE AS p, 0.0::DOUBLE AS xo, 0.0::DOUBLE AS po
       |  FROM (SELECT DISTINCT user_id FROM v) o
       |  UNION ALL
       |  SELECT user_id, t, xn, pn, xn, pn FROM (
       |    SELECT user_id, t, yt, pp, k,
       |      xp + k*(yt - yp) AS xn,
       |      (pp - (k*k)*s) + 1e-10 AS pn
       |    FROM (
       |      SELECT *, pxy/s AS k FROM (
       |        SELECT *,
       |          1.0::DOUBLE + ($wc0*(xp-yp)*(xp-yp)) + ($w1*((xp+l2)-yp)*((xp+l2)-yp)) + ($w1*((xp-l2)-yp)*((xp-l2)-yp)) AS s,
       |          0.0::DOUBLE + ((xp-xp)*($wc0*(xp-yp))) + (((xp+l2)-xp)*($w1*((xp+l2)-yp))) + (((xp-l2)-xp)*($w1*((xp-l2)-yp))) AS pxy
       |        FROM (
       |          SELECT *, 0.0::DOUBLE + $wm0*xp + $w1*(xp+l2) + $w1*(xp-l2) AS yp
       |          FROM (
       |            SELECT *, sqrt(CASE WHEN pp*$cL < 1e-10 THEN pp*$cL + (1e-10 - pp*$cL) ELSE pp*$cL END) AS l2
       |            FROM (
       |              SELECT *,
       |                0.001::DOUBLE + ((x-xp)*(x-xp)*$wc0) + (((x+l1)-xp)*((x+l1)-xp)*$w1) + (((x-l1)-xp)*((x-l1)-xp)*$w1) AS pp
       |              FROM (
       |                SELECT *, 0.0::DOUBLE + x*$wm0 + (x+l1)*$w1 + (x-l1)*$w1 AS xp
       |                FROM (
       |                  SELECT c.user_id, c.t + 1 AS t, c.x, c.p, o.yt,
       |                    sqrt(CASE WHEN c.p*$cL < 1e-10 THEN c.p*$cL + (1e-10 - c.p*$cL) ELSE c.p*$cL END) AS l1
       |                  FROM st c JOIN obs o ON o.user_id = c.user_id AND o.t = c.t + 1
       |                ) q1
       |              ) q2
       |            ) q3
       |          ) q4
       |        ) q5
       |      ) q6
       |    ) q7
       |  ) q8
       |)
       |SELECT s2.user_id, make_timestamp(t2.us) AS ts,
       |  round(s2.xo + 1e-9, 6) AS filtered,
       |  round(s2.po + 1e-9, 6) AS filtered_var
       |FROM st s2 JOIN tsr t2 ON t2.user_id = s2.user_id AND t2.t = s2.t
       |WHERE s2.t >= 1""".stripMargin
  }

  /** Unsigned FNV-1a 64 of a VARCHAR expression as HUGEINT (the signed
    * variant lives in SparkEntry.fnvSql; here the unsigned value feeds
    * the uniform-in-[0,1) construction (h >>> 11)/2^53). */
  private def fnvUSql(expr: String): String =
    s"""(SELECT list_reduce(
       |  list_prepend(14695981039346656037::HUGEINT,
       |    list_transform(list_filter(split($expr, ''), ch -> ch <> ''),
       |      ch -> unicode(ch)::HUGEINT)),
       |  (acc, ch) -> (xor(acc, ch) * 1099511628211::HUGEINT)
       |    % 18446744073709551616::HUGEINT))""".stripMargin.replace("\n", "")

  /** Poisson(1) multiplicity via inverse CDF of the FNV uniform — the
    * thresholds are the exact doubles Conformal.poissonCdf computes. */
  private def poissonKSql(uExpr: String): String = {
    val cases = graft.ops.Conformal.poissonCdf.zipWithIndex.map { case (c, k) =>
      s"WHEN $uExpr < ${dlit(c)} THEN $k"
    }.mkString(" ")
    s"(CASE $cases ELSE 20 END)"
  }

  // ── EnbPI (lags=3, B=10, coverage 0.9, h=5): deterministic Poisson
  // bootstrap weights from the FNV row key (bit-identical membership in
  // both engines), 10 weighted Gram systems solved by Cramer, OOB
  // residual means over exactly the zero-weight models, per-series
  // interpolated residual quantile, and the 5-step ensemble-mean
  // recursion as a growing flat fold ───────────────────────────────────
  /** EnbPI oracle: pinned bootstrap coefficients + OOB quantiles when
    * [[OraclePins]] is set (the full-panel FNV weight replay costs >2 min
    * in DuckDB); the bootstrap machinery itself stays gate-verified by
    * ts_enbpi_oob at [[EnbpiOobUsers]] scale. */
  def enbpiSql: String = OraclePins.enbpi.map((enbpiSqlPinned _).tupled).getOrElse(enbpiSqlFull)

  /** Pinned variant: B ridge coefficient vectors and per-series OOB qhat
    * fitted in Scala; SQL replays the tail recursion, future timestamps
    * and interval arithmetic. */
  private def enbpiSqlPinned(coefs: Array[Array[Double]],
      qpins: Seq[(Long, Double)]): String = {
    val b = EnbpiB
    val coefCols = (0 until b).flatMap { bi =>
      (0 until 4).map(k => s"${dlit(coefs(bi)(k))}::DOUBLE AS cf${k}_$bi")
    }
    val foldPredBi = (0 until b).map { bi =>
      s"(0.0::DOUBLE + acc[len(acc)]*cf0_$bi + acc[len(acc) - 1]*cf1_$bi + acc[len(acc) - 2]*cf2_$bi + 1.0*cf3_$bi)"
    }.mkString(" + ")
    val qRows = qpins.map { case (u, q) => Seq(s"$u::BIGINT", s"${dlit(q)}::DOUBLE") }
    s"""WITH ${pinsCte("q", Seq("user_id", "qhat"), qRows)},
       |co AS (SELECT ${coefCols.mkString(",\n  ")}),
       |tails AS (SELECT user_id, list(value ORDER BY ts, event_id)[-3:] AS tl
       |  FROM events GROUP BY user_id),
       |fc AS (SELECT t.user_id,
       |  (list_reduce(
       |    list_prepend(t.tl, list_transform(generate_series(1, 5), s -> [s::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE])),
       |    (acc, x) -> list_append(acc, ($foldPredBi) / 10.0)
       |  ))[4:] AS fcs
       |  FROM tails t, co),
       |lastt AS (SELECT user_id, max(epoch_us(ts)) AS us FROM events GROUP BY user_id),
       |d AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, epoch_us(ts) AS us, lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS lus FROM events)
       |  WHERE lus IS NOT NULL GROUP BY user_id)
       |SELECT f.user_id, s.step, make_timestamp(l.us + s.step * d.freq) AS ts,
       |  round(f.fcs[s.step::INT] + 1e-9, 6) AS y_hat,
       |  round(f.fcs[s.step::INT] - coalesce(q.qhat, 0.0) + 1e-9, 6) AS y_hat_lower,
       |  round(f.fcs[s.step::INT] + coalesce(q.qhat, 0.0) + 1e-9, 6) AS y_hat_upper
       |FROM fc f
       |JOIN lastt l USING (user_id) JOIN d USING (user_id)
       |LEFT JOIN q USING (user_id)
       |CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS step) s""".stripMargin
  }

  /** The full FNV-Poisson bootstrap + Gram/Cramer + OOB machinery, from
    * `o` (optionally row-filtered) through the per-series quantile `q`. */
  private def enbpiBootstrapCtes(where: String): String = {
    val b = EnbpiB
    val names = Array(
      Array("g0", "g1", "g2", "g3"),
      Array("g1", "g4", "g5", "g6"),
      Array("g2", "g5", "g7", "g8"),
      Array("g3", "g6", "g8", "g9"))
    // upper-triangle order used by the Spark aggregate: (0,0)(0,1)(0,2)(0,3)(1,1)...
    val triNames = Array("g0", "g1", "g2", "g3", "g4", "g5", "g6", "g7", "g8", "g9")
    val tri = for (i <- 0 until 4; j <- i until 4) yield (i, j)
    val xs = Array("x0", "x1", "x2", "1.0")
    val weightCols = (0 until b).map { bi =>
      s"${poissonKSql(s"((${fnvUSql(s"'$bi:' || ks")} // 2048)::DOUBLE / 9007199254740992.0)")}::DOUBLE AS w$bi"
    }
    val gramCols = (0 until b).flatMap { bi =>
      tri.zipWithIndex.map { case ((i, j), t) =>
        s"sum(w$bi * ${xs(i)} * ${xs(j)}) AS ${triNames(t)}_$bi"
      } ++ (0 until 4).map(i => s"sum(w$bi * ${xs(i)} * yy) AS bb${i}_$bi")
    }
    val coefCols = (0 until b).flatMap { bi =>
      val m = Array.tabulate(4, 4) { (i, j) =>
        val base = s"${names(i)(j)}_$bi"
        if (i == j && i < 3) s"($base + 1.0e-3)" else base
      }
      val rhs = Array.tabulate(4)(i => s"bb${i}_$bi")
      cramer(m, rhs).zipWithIndex.map { case (c, k) => s"$c AS cf${k}_$bi" }
    }
    val predBi = (0 until b).map { bi =>
      s"(0.0::DOUBLE + x0*cf0_$bi + x1*cf1_$bi + x2*cf2_$bi + 1.0*cf3_$bi)"
    }
    val oobSum = (0 until b).map(bi =>
      s"(CASE WHEN w$bi = 0 THEN ${predBi(bi)} ELSE 0.0::DOUBLE END)").mkString(" + ")
    val oobN = (0 until b).map(bi => s"(CASE WHEN w$bi = 0 THEN 1 ELSE 0 END)").mkString(" + ")
    s"""o AS (SELECT user_id, value AS yy, epoch_us(ts) AS us,
       |  lag(value, 1) OVER ($W) AS x0,
       |  lag(value, 2) OVER ($W) AS x1,
       |  lag(value, 3) OVER ($W) AS x2
       |  FROM events$where),
       |r0 AS (SELECT *, user_id::VARCHAR || ':' || us::VARCHAR || ':$EnbpiSeed' AS ks
       |  FROM o WHERE x0 IS NOT NULL AND x1 IS NOT NULL AND x2 IS NOT NULL),
       |rw AS (SELECT *,
       |${weightCols.mkString(",\n")}
       |FROM r0),
       |g AS (SELECT
       |${gramCols.mkString(",\n")}
       |FROM rw),
       |co AS (SELECT
       |${coefCols.mkString(",\n")}
       |FROM g),
       |ob AS (SELECT rw.user_id, abs(rw.yy - ($oobSum) / ($oobN)) AS resid
       |  FROM rw, co WHERE ($oobN) > 0),
       |q AS (SELECT user_id, n,
       |  rl[lo + 1] * (1.0 - frac) + rl[least(lo + 2, n)] * frac AS qhat
       |  FROM (SELECT user_id, n, rl, pos, floor(pos)::INT AS lo, pos - floor(pos)::INT AS frac
       |    FROM (SELECT user_id, count(*)::INT AS n, list_sort(list(resid)) AS rl,
       |      (count(*) - 1) * least(1.0, ceil((count(*) + 1) * 0.9) / count(*)) AS pos
       |      FROM ob GROUP BY user_id) q1) q2)""".stripMargin
  }

  /** Per-series OOB conformal quantile on the [[EnbpiOobUsers]] subset —
    * the in-gate verification of the full bootstrap machinery (the pinned
    * ts_enbpi oracle skips it at full-panel scale for gate-cost reasons). */
  val enbpiOobSql: String =
    s"""WITH ${enbpiBootstrapCtes(s" WHERE user_id < $EnbpiOobUsers")}
       |SELECT user_id, round(qhat + 1e-9, 6) AS qhat FROM q""".stripMargin

  private[graft] val enbpiSqlFull: String = {
    val b = EnbpiB
    val foldPredBi = (0 until b).map { bi =>
      s"(0.0::DOUBLE + acc[len(acc)]*cf0_$bi + acc[len(acc) - 1]*cf1_$bi + acc[len(acc) - 2]*cf2_$bi + 1.0*cf3_$bi)"
    }.mkString(" + ")
    s"""WITH ${enbpiBootstrapCtes("")},
       |tails AS (SELECT user_id, list(value ORDER BY ts, event_id)[-3:] AS tl
       |  FROM events GROUP BY user_id),
       |fc AS (SELECT t.user_id,
       |  (list_reduce(
       |    list_prepend(t.tl, list_transform(generate_series(1, 5), s -> [s::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE])),
       |    (acc, x) -> list_append(acc, ($foldPredBi) / 10.0)
       |  ))[4:] AS fcs
       |  FROM tails t, co),
       |lastt AS (SELECT user_id, max(epoch_us(ts)) AS us FROM events GROUP BY user_id),
       |d AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, epoch_us(ts) AS us, lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS lus FROM events)
       |  WHERE lus IS NOT NULL GROUP BY user_id)
       |SELECT f.user_id, s.step, make_timestamp(l.us + s.step * d.freq) AS ts,
       |  round(f.fcs[s.step::INT] + 1e-9, 6) AS y_hat,
       |  round(f.fcs[s.step::INT] - coalesce(q.qhat, 0.0) + 1e-9, 6) AS y_hat_lower,
       |  round(f.fcs[s.step::INT] + coalesce(q.qhat, 0.0) + 1e-9, 6) AS y_hat_upper
       |FROM fc f
       |JOIN lastt l USING (user_id) JOIN d USING (user_id)
       |LEFT JOIN q USING (user_id)
       |CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS step) s""".stripMargin
  }

  // ── Box-Cox pipeline forecast (λ=0.5, lags 1-2, encode_id): global
  // pooled ridge on the transformed scale (Cramer 4×4 vs LU within the
  // nudge), per-series recursion fold, inverse transform per step ──────
  val pipelineBoxcoxSql: String = {
    val m = Array(
      Array("s00", "s01", "s02", "s03"),
      Array("s01", "s11", "s12", "s13"),
      Array("s02", "s12", "s22", "s23"),
      Array("s03", "s13", "s23", "s33"))
    val mr = Array.tabulate(4, 4) { (i, j) =>
      if (i == j && i < 3) s"(${m(i)(j)} + 1.0e-3)" else m(i)(j)
    }
    val rhs = Array("b0", "b1", "b2", "b3")
    val c = cramer(mr, rhs)
    s"""WITH e AS (SELECT user_id, ts, event_id, abs(value) + 1.0 AS v FROM events),
       |b AS (SELECT user_id, ts, event_id, epoch_us(ts) AS us,
       |  (pow(v, 0.5) - 1.0)/0.5 AS y FROM e),
       |im AS (SELECT user_id, avg(y) AS idmean, count(*)::INT AS n FROM b GROUP BY user_id),
       |o AS (SELECT user_id, y,
       |  lag(y, 1) OVER ($W) AS x0,
       |  lag(y, 2) OVER ($W) AS x1
       |  FROM b),
       |r AS (SELECT o.*, im.idmean FROM o JOIN im USING (user_id)
       |  WHERE x0 IS NOT NULL AND x1 IS NOT NULL),
       |g AS (SELECT
       |  sum(x0*x0) AS s00, sum(x0*x1) AS s01, sum(x0*idmean) AS s02, sum(x0) AS s03,
       |  sum(x1*x1) AS s11, sum(x1*idmean) AS s12, sum(x1) AS s13,
       |  sum(idmean*idmean) AS s22, sum(idmean) AS s23,
       |  count(*)::DOUBLE AS s33,
       |  sum(x0*y) AS b0, sum(x1*y) AS b1, sum(idmean*y) AS b2, sum(y) AS b3
       |  FROM r),
       |co AS (SELECT ${c(0)} AS c0, ${c(1)} AS c1, ${c(2)} AS c2, ${c(3)} AS c3 FROM g),
       |tails AS (SELECT user_id, list(y ORDER BY ts, event_id)[-2:] AS tl FROM b GROUP BY user_id),
       |fc AS (SELECT t.user_id,
       |  (list_reduce(
       |    list_prepend(t.tl, list_transform(generate_series(1, 5), s -> [s::DOUBLE, 0.0::DOUBLE])),
       |    (acc, x) -> list_append(acc,
       |      0.0::DOUBLE + acc[len(acc)]*c0 + acc[len(acc) - 1]*c1 + im.idmean*c2 + 1.0*c3)
       |  ))[3:] AS preds
       |  FROM tails t JOIN im USING (user_id) CROSS JOIN co),
       |lastt AS (SELECT user_id, max(us) AS us FROM b GROUP BY user_id),
       |d AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, us, lag(us) OVER (PARTITION BY user_id ORDER BY us) AS lus FROM b)
       |  WHERE lus IS NOT NULL GROUP BY user_id)
       |SELECT f.user_id, s.step, make_timestamp(l.us + s.step * d.freq) AS ts,
       |  round(pow(f.preds[s.step::INT]*0.5 + 1.0, 1.0/0.5) + 1e-9, 6) AS y_hat
       |FROM fc f JOIN lastt l USING (user_id) JOIN d USING (user_id)
       |CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS step) s""".stripMargin
  }

  // ── ROCKET (20 seeded kernels): the bank is a pure function of
  // seed 42, so the generator inlines the exact weights/bias/dilation/
  // padding as literals and replays the dilated-convolution ppv/max in
  // the Scala accumulation order ───────────────────────────────────────
  val rocketSql: String = {
    val bank = graft.kernels.Rocket.randomKernels(20, 64, 42L)
    val cols = bank.zipWithIndex.flatMap { case (k, ki) =>
      val len = k.weights.length
      val span = (len - 1) * k.dilation
      // conv value at 1-based window w (i = w - 1 - padding):
      val terms = (0 until len).map { j =>
        val off = j * k.dilation
        s"(CASE WHEN (w - 1 - ${k.padding}) + $off >= 0 AND (w - 1 - ${k.padding}) + $off < n " +
          s"THEN ${dlit(k.weights(j))}::DOUBLE * vs[(w - 1 - ${k.padding}) + $off + 1] ELSE 0.0::DOUBLE END)"
      }.mkString(" + ")
      val cnt = s"(n - 1 + ${k.padding} - $span) - (-${k.padding}) + 1"
      val conv = s"list_transform(generate_series(1, $cnt), w -> ${dlit(k.bias)}::DOUBLE + $terms)"
      Seq(
        s"CASE WHEN $cnt <= 0 THEN 0.0::DOUBLE ELSE " +
          s"list_sum(list_transform($conv, v -> CASE WHEN v > 0 THEN 1 ELSE 0 END))::DOUBLE / ($cnt) END AS rocket_${2 * ki}",
        s"CASE WHEN $cnt <= 0 THEN 0.0::DOUBLE ELSE list_max($conv) END AS rocket_${2 * ki + 1}")
    }
    s"""WITH v AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs, count(*)::INT AS n
       |  FROM events GROUP BY user_id)
       |SELECT user_id,
       |${cols.mkString(",\n")}
       |FROM v""".stripMargin
  }

  /** ts_rocket_classify replay with the one-vs-rest ridge fit pinned
    * (minLen, classes, coefs): the same conv/PPV/max feature exprs as
    * [[rocketSql]] but on series truncated to minLen (n is a constant,
    * so the padding windows are static), then per-class linear scores
    * with argmax replicating the kernel's strict-> first-wins scan. */
  def rocketClassifySql(minLen: Int, classes: Array[String],
      coefs: Array[Array[Double]]): String = {
    val bank = graft.kernels.Rocket.randomKernels(20, minLen, 42L)
    val n = minLen
    val featExprs: Seq[String] = bank.flatMap { k =>
      val len = k.weights.length
      val span = (len - 1) * k.dilation
      val terms = (0 until len).map { j =>
        val off = j * k.dilation
        s"(CASE WHEN (w - 1 - ${k.padding}) + $off >= 0 AND (w - 1 - ${k.padding}) + $off < $n " +
          s"THEN ${dlit(k.weights(j))}::DOUBLE * vs[(w - 1 - ${k.padding}) + $off + 1] ELSE 0.0::DOUBLE END)"
      }.mkString(" + ")
      val cnt = n - 1 + k.padding - span + k.padding + 1
      val conv = s"list_transform(generate_series(1, $cnt), w -> ${dlit(k.bias)}::DOUBLE + $terms)"
      if (cnt <= 0) Seq("0.0::DOUBLE", "0.0::DOUBLE")
      else Seq(
        s"list_sum(list_transform($conv, v -> CASE WHEN v > 0 THEN 1 ELSE 0 END))::DOUBLE / ($cnt)",
        s"list_max($conv)")
    }.toSeq
    val featCols = featExprs.zipWithIndex.map { case (e, i) => s"$e AS f$i" }
    val d = featExprs.length // + intercept handled inline
    val scoreCols = coefs.zipWithIndex.map { case (cf, c) =>
      ((0 until d).map(i => s"${dlit(cf(i))}::DOUBLE * f$i") :+ s"${dlit(cf(d))}::DOUBLE")
        .mkString(" + ") + s" AS s$c"
    }
    // strict-> scan: earliest class wins ties
    val argmax = "CASE " + classes.indices.map { c =>
      val cond = classes.indices.filter(_ != c).map { o =>
        if (o < c) s"s$c > s$o" else s"s$c >= s$o"
      }.mkString(" AND ")
      s"WHEN $cond THEN '${classes(c)}'"
    }.mkString(" ") + " END"
    s"""WITH v AS (SELECT user_id,
       |    (list(value ORDER BY ts, event_id))[1:$n] AS vs
       |  FROM events WHERE user_id < 30 GROUP BY user_id),
       |f AS (SELECT user_id,
       |${featCols.mkString(",\n")}
       |FROM v),
       |sc AS (SELECT user_id,
       |${scoreCols.mkString(",\n")}
       |FROM f)
       |SELECT user_id, $argmax AS predicted_label FROM sc""".stripMargin
  }

  // ── MiniRocket: fixed C(9,3)=84 bank, dilation cycled {1,2,4,8},
  // bias = median of each pattern's own convolution, PPV features ──────
  val miniRocketSql: String = {
    val combos = (for {
      a <- 0 until 9; b <- a + 1 until 9; c <- b + 1 until 9
    } yield (a, b, c)).toArray
    val dilations = Array(1, 2, 4, 8)
    val convDefs = combos.zipWithIndex.map { case ((a, b, c), ci) =>
      val d = dilations(ci % dilations.length)
      val terms = (0 until 9).map { j =>
        val wj = if (j == a || j == b || j == c) "2.0::DOUBLE" else "(-1.0::DOUBLE)"
        s"$wj * vs[i::INT + ${j * d}]"
      }.mkString(" + ")
      s"CASE WHEN n > ${8 * d} THEN list_transform(generate_series(1, n - ${8 * d}), i -> 0.0::DOUBLE + $terms) ELSE []::DOUBLE[] END AS conv_$ci"
    }
    val featDefs = combos.indices.map { ci =>
      s"CASE WHEN len(conv_$ci) = 0 THEN 0.0::DOUBLE ELSE " +
        s"list_sum(list_transform(conv_$ci, v -> CASE WHEN v > list_sort(conv_$ci)[len(conv_$ci)//2 + 1] THEN 1 ELSE 0 END))::DOUBLE / len(conv_$ci) END AS minirocket_$ci"
    }
    s"""WITH v AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs, count(*)::INT AS n
       |  FROM events GROUP BY user_id),
       |cv AS (SELECT user_id,
       |${convDefs.mkString(",\n")}
       |FROM v)
       |SELECT user_id,
       |${featDefs.mkString(",\n")}
       |FROM cv""".stripMargin
  }
  // ── BOCPD (hazard 200, NIG conjugate, Student-t predictive): the
  // run-length posterior recursion as a recursive CTE with growing
  // mu/beta/run-prob list columns (kappa/alpha are exact closed forms
  // of the index); the Lanczos log-gamma difference depends only on
  // the run length, so it is precomputed once as a constant list ──────
  val bocpdSql: String =
"""WITH RECURSIVE lgc AS (SELECT list_transform(generate_series(1, 200), i -> (0.5*ln(2.0*pi()) + (((2.0*(1.0::DOUBLE + 0.5*(i - 1))+1.0)/2.0) - 1.0 + 0.5)*ln(((2.0*(1.0::DOUBLE + 0.5*(i - 1))+1.0)/2.0) - 1.0 + 7.5) - (((2.0*(1.0::DOUBLE + 0.5*(i - 1))+1.0)/2.0) - 1.0 + 7.5) + ln(0.9999999999998099::DOUBLE + (676.5203681218851::DOUBLE / (((2.0*(1.0::DOUBLE + 0.5*(i - 1))+1.0)/2.0) - 1.0 + 1)) + (-1259.1392167224028::DOUBLE / (((2.0*(1.0::DOUBLE + 0.5*(i - 1))+1.0)/2.0) - 1.0 + 2)) + (771.3234287776531::DOUBLE / (((2.0*(1.0::DOUBLE + 0.5*(i - 1))+1.0)/2.0) - 1.0 + 3)) + (-176.6150291621406::DOUBLE / (((2.0*(1.0::DOUBLE + 0.5*(i - 1))+1.0)/2.0) - 1.0 + 4)) + (12.507343278686905::DOUBLE / (((2.0*(1.0::DOUBLE + 0.5*(i - 1))+1.0)/2.0) - 1.0 + 5)) + (-0.13857109526572012::DOUBLE / (((2.0*(1.0::DOUBLE + 0.5*(i - 1))+1.0)/2.0) - 1.0 + 6)) + (9.984369578019572e-06::DOUBLE / (((2.0*(1.0::DOUBLE + 0.5*(i - 1))+1.0)/2.0) - 1.0 + 7)) + (1.5056327351493116e-07::DOUBLE / (((2.0*(1.0::DOUBLE + 0.5*(i - 1))+1.0)/2.0) - 1.0 + 8)))) - (0.5*ln(2.0*pi()) + (((2.0*(1.0::DOUBLE + 0.5*(i - 1)))/2.0) - 1.0 + 0.5)*ln(((2.0*(1.0::DOUBLE + 0.5*(i - 1)))/2.0) - 1.0 + 7.5) - (((2.0*(1.0::DOUBLE + 0.5*(i - 1)))/2.0) - 1.0 + 7.5) + ln(0.9999999999998099::DOUBLE + (676.5203681218851::DOUBLE / (((2.0*(1.0::DOUBLE + 0.5*(i - 1)))/2.0) - 1.0 + 1)) + (-1259.1392167224028::DOUBLE / (((2.0*(1.0::DOUBLE + 0.5*(i - 1)))/2.0) - 1.0 + 2)) + (771.3234287776531::DOUBLE / (((2.0*(1.0::DOUBLE + 0.5*(i - 1)))/2.0) - 1.0 + 3)) + (-176.6150291621406::DOUBLE / (((2.0*(1.0::DOUBLE + 0.5*(i - 1)))/2.0) - 1.0 + 4)) + (12.507343278686905::DOUBLE / (((2.0*(1.0::DOUBLE + 0.5*(i - 1)))/2.0) - 1.0 + 5)) + (-0.13857109526572012::DOUBLE / (((2.0*(1.0::DOUBLE + 0.5*(i - 1)))/2.0) - 1.0 + 6)) + (9.984369578019572e-06::DOUBLE / (((2.0*(1.0::DOUBLE + 0.5*(i - 1)))/2.0) - 1.0 + 7)) + (1.5056327351493116e-07::DOUBLE / (((2.0*(1.0::DOUBLE + 0.5*(i - 1)))/2.0) - 1.0 + 8))))) AS lgl),
v AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs,
  list(epoch_us(ts) ORDER BY ts, event_id) AS tss,
  count(*)::INT AS n FROM events GROUP BY user_id),
obs AS (SELECT user_id, unnest(generate_series(1, n)) AS t, unnest(vs) AS yt FROM v),
tsr AS (SELECT user_id, unnest(generate_series(1, n)) AS t, unnest(tss) AS us FROM v),
st AS (
  SELECT user_id, 0 AS t,
    [0.0::DOUBLE] AS mu, [1.0::DOUBLE] AS be,
    [1.0::DOUBLE] AS rp, 0 AS rl, 0.0::DOUBLE AS cp,
    (SELECT n FROM v WHERE v.user_id = d.user_id) AS n
  FROM (SELECT DISTINCT user_id FROM v) d
  UNION ALL
  SELECT user_id, t, mu2, be2,
    nr2 AS rp,
    (list_position(nr2, list_max(nr2)) - 1)::INT AS rl,
    nr2[1] AS cp, n
  FROM (
    SELECT user_id, t, yt, n, mu, be,
      CASE WHEN tot > 0 THEN list_transform(nr, w -> w / tot) ELSE nr END AS nr2,
      list_prepend(0.0::DOUBLE, list_transform(generate_series(1, t), i -> ((i::DOUBLE)*mu[i::INT]+yt)/((i::DOUBLE)+1.0))) AS mu2,
      list_prepend(1.0::DOUBLE, list_transform(generate_series(1, t), i -> be[i::INT]+(i::DOUBLE)*(yt-mu[i::INT])*(yt-mu[i::INT])/(2.0*((i::DOUBLE)+1.0)))) AS be2
    FROM (
      SELECT *, list_reduce(nr, (x, y) -> x + y) AS tot
      FROM (
        SELECT *,
          list_prepend(
            list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, t), i -> (rp[i::INT]*pl[i::INT])*(0.005::DOUBLE))), (x, y) -> x + y),
            list_transform(generate_series(1, t), i -> (rp[i::INT]*pl[i::INT])*(1.0::DOUBLE - 0.005::DOUBLE))) AS nr
        FROM (
        SELECT *, list_transform(generate_series(1, t), i -> exp(lgl[i::INT] - 0.5*ln(pi()*(2.0*(1.0::DOUBLE + 0.5*(i - 1)))*(be[i::INT]*((i::DOUBLE)+1.0)/((1.0::DOUBLE + 0.5*(i - 1))*(i::DOUBLE)))) - (2.0*(1.0::DOUBLE + 0.5*(i - 1))+1.0)/2.0*ln(1.0 + (((yt-mu[i::INT])*(yt-mu[i::INT])/(be[i::INT]*((i::DOUBLE)+1.0)/((1.0::DOUBLE + 0.5*(i - 1))*(i::DOUBLE)))))/(2.0*(1.0::DOUBLE + 0.5*(i - 1)))))) AS pl
        FROM (
          SELECT c.user_id, c.t + 1 AS t, o.yt, c.n, c.mu, c.be, c.rp, lgc.lgl
          FROM st c JOIN obs o ON o.user_id = c.user_id AND o.t = c.t + 1, lgc
        ) q1a ) q1
      ) q2
    ) q3
  ) q4
)
SELECT s2.user_id, make_timestamp(t2.us) AS ts, s2.rl AS run_length,
  round(s2.cp + 1e-9, 6) AS changepoint_prob
FROM st s2 JOIN tsr t2 ON t2.user_id = s2.user_id AND t2.t = s2.t
WHERE s2.t >= 1"""
  // ── PAM k-medoids (k=3, SBD, 60-series subset, first-3 init): the
  // greedy swap chain replays as a SINGLE-ROW recursive CTE state
  // machine — one micro-step per (slot, candidate) — with the flattened
  // distance matrix carried in the state so trial costs are folds in
  // the exact Scala accumulation order (a ds-table formulation made
  // DuckDB re-inline the SBD CTE every step: 295s -> 1s) ──────────────
  /** Greedy PAM swap-chain replay (k = 3) over the SBD matrix: recursive
    * CTE whose accumulator is the flat matrix + 3 medoid slots; one
    * (c, cand) swap evaluation per step, exactly Cluster.pam's loop
    * order. `init` = the three starting medoid SIDX values (first-3 for
    * the subset query; the pinned seeded-shuffle indexes for the r12
    * full-panel twin). */
  private def pamChainSql(filter: String, init: Seq[Int]): String = {
    require(init.length == 3, "pamChainSql: k = 3 replay")
    val Seq(i1, i2, i3) = init
s"""
WITH RECURSIVE s AS (
  SELECT user_id, list(value ORDER BY ts, event_id) AS vs
  FROM events WHERE $filter GROUP BY user_id),
si AS (SELECT user_id, (row_number() OVER (ORDER BY user_id::VARCHAR) - 1)::INT AS sidx FROM s),
p AS (SELECT a.user_id AS u1, b.user_id AS u2, a.vs AS va, b.vs AS vb,
  len(a.vs)::INT AS n, len(b.vs)::INT AS m
  FROM s a JOIN s b ON a.user_id < b.user_id),
dh AS (SELECT u1, u2, (
CASE WHEN sqrt(list_reduce(list_transform(va, v -> v*v), (x, y) -> x + y)) *
          sqrt(list_reduce(list_transform(vb, v -> v*v), (x, y) -> x + y)) = 0.0
  THEN 1.0::DOUBLE
  ELSE 1.0::DOUBLE - list_max(
    list_transform(generate_series(0, n + m - 2), k ->
      list_reduce(
        list_prepend(0.0::DOUBLE,
          list_transform(generate_series(greatest(1, (k::INT - m + 1) + 1), least(n, m + (k::INT - m + 1))),
            ii -> va[ii::INT] * vb[(ii - (k::INT - m + 1))::INT])),
        (x, y) -> x + y)
    )) / (sqrt(list_reduce(list_transform(va, v -> v*v), (x, y) -> x + y)) *
          sqrt(list_reduce(list_transform(vb, v -> v*v), (x, y) -> x + y)))
END) AS d FROM p),
sym AS (
  SELECT u1 AS ua, u2 AS ub, d FROM dh
  UNION ALL SELECT u2, u1, d FROM dh
  UNION ALL SELECT user_id, user_id, 0.0::DOUBLE FROM s),
dmat AS (SELECT list(y.d ORDER BY sa.sidx, sb.sidx) AS dl, (SELECT count(*)::INT FROM s) AS nv
  FROM sym y JOIN si sa ON sa.user_id = y.ua JOIN si sb ON sb.user_id = y.ub),
st AS (
  SELECT 0 AS stepno, $i1 AS m1, $i2 AS m2, $i3 AS m3,
    list_reduce(list_prepend(0.0::DOUBLE,
      list_transform(generate_series(0, nv - 1), i ->
        least(dl[(i*nv + ($i1))::INT + 1], dl[(i*nv + ($i2))::INT + 1], dl[(i*nv + ($i3))::INT + 1]))),
      (x, y) -> x + y) AS cost,
    0 AS c, 0 AS cand, false AS improved, 0 AS iter, false AS done, dl, nv
  FROM dmat
  UNION ALL
  SELECT stepno + 1,
    CASE WHEN accept AND c = 0 THEN cand ELSE m1 END,
    CASE WHEN accept AND c = 1 THEN cand ELSE m2 END,
    CASE WHEN accept AND c = 2 THEN cand ELSE m3 END,
    CASE WHEN accept THEN tc ELSE cost END,
    CASE WHEN last_cand AND c = 2 THEN 0 WHEN last_cand THEN c + 1 ELSE c END,
    CASE WHEN last_cand THEN 0 ELSE cand + 1 END,
    CASE WHEN last_cand AND c = 2 THEN false ELSE (improved OR accept) END,
    CASE WHEN last_cand AND c = 2 THEN iter + 1 ELSE iter END,
    (last_cand AND c = 2 AND NOT (improved OR accept)) OR
      (last_cand AND c = 2 AND iter + 1 >= 100),
    dl, nv
  FROM (
    SELECT *, (tc IS NOT NULL AND tc + 1e-12 < cost) AS accept, (cand = nv - 1) AS last_cand
    FROM (
      SELECT st.*,
        CASE WHEN cand = m1 OR cand = m2 OR cand = m3 THEN NULL
          ELSE list_reduce(list_prepend(0.0::DOUBLE,
      list_transform(generate_series(0, nv - 1), i ->
        least(dl[(i*nv + (CASE WHEN st.c = 0 THEN st.cand ELSE st.m1 END))::INT + 1], dl[(i*nv + (CASE WHEN st.c = 1 THEN st.cand ELSE st.m2 END))::INT + 1], dl[(i*nv + (CASE WHEN st.c = 2 THEN st.cand ELSE st.m3 END))::INT + 1]))),
      (x, y) -> x + y)
        END AS tc
      FROM st WHERE NOT done
    ) q1
  ) q2
),
fin AS (SELECT * FROM st WHERE done ORDER BY stepno LIMIT 1)"""
  }

  /** First-strict-min assignment of each point to its nearest final
    * medoid (Cluster.pam's assignAll tie order). */
  private val pamAssignCase: String =
    """CASE
      |    WHEN f.dl[(si.sidx*f.nv + f.m1)::INT + 1] <= f.dl[(si.sidx*f.nv + f.m2)::INT + 1]
      |     AND f.dl[(si.sidx*f.nv + f.m1)::INT + 1] <= f.dl[(si.sidx*f.nv + f.m3)::INT + 1] THEN 0
      |    WHEN f.dl[(si.sidx*f.nv + f.m2)::INT + 1] <= f.dl[(si.sidx*f.nv + f.m3)::INT + 1] THEN 1
      |    ELSE 2 END""".stripMargin

  def kmedoidsReplaySql(filter: String, init: Seq[Int]): String =
    pamChainSql(filter, init) +
      s"""
         |SELECT si.user_id,
         |  $pamAssignCase AS cluster
         |FROM si CROSS JOIN fin f ORDER BY si.user_id
         |""".stripMargin

  val kmedoidsSql: String =
    kmedoidsReplaySql(ElasticOracle.SeriesFilter, Seq(0, 1, 2))

  /** ts_kmedoids_e2e (r12): full panel at the production seeded-shuffle
    * init — the three pinned start indexes come from
    * Cluster.pamDefaultInit over the same string-sorted id order
    * (OraclePins.kmedoidsE2eInit); the entire swap chain replays. */
  def kmedoidsE2eSql(init: Seq[Int]): String =
    kmedoidsReplaySql("TRUE", init)

  /** ts_cluster_eval_e2e (r12): the PAM replay above feeding the SAME
    * silhouette/Davies-Bouldin metric folds the mod-3 ts_cluster_eval
    * oracle replays — labels come from the swap chain instead of mod 3. */
  def clusterEvalPamSql(init: Seq[Int]): String =
    pamChainSql("TRUE", init) +
      s""",
         |lab AS (SELECT si.user_id, $pamAssignCase AS cluster
         |  FROM si CROSS JOIN fin f),
         |$evalMetricSql""".stripMargin

  // ── damped-trend Holt (Arima.dampedHoltForecast): the full Nelder-Mead
  // on (logit α, logit β) replays as a 3-phase fold per iteration —
  // phase 0 stable-sorts the simplex and appends the reflection + its
  // SSE, phase 1 appends the secondary candidate (expansion /
  // contraction / dummy), phase 2 assembles the next simplex (including
  // the shrink case). Convergence (spread ≤ tol) freezes the accumulator
  // at length 9, which later phases detect by len() and pass through —
  // mirroring the Scala loop's early exit. ─────────────────────────────
  val dampedHoltSql: String = {
    // one-step SSE of damped Holt (φ=0.9) at logit params (pa, pb):
    // fold state [level, trend, sse] over y(1)..y(n−1)
    def sse(pa: String, pb: String): String = {
      val A = s"(1.0::DOUBLE/(1.0::DOUBLE + exp(-($pa))))"
      val B = s"(1.0::DOUBLE/(1.0::DOUBLE + exp(-($pb))))"
      val newL = s"$A*yy[1] + (1.0::DOUBLE - $A)*(a[1] + 0.9*a[2])"
      s"""list_reduce(list_prepend([vs[1], vs[2] - vs[1], 0.0::DOUBLE], list_transform(vs[2:], w -> [w, 0.0::DOUBLE, 0.0::DOUBLE])), (a, yy) -> [$newL, $B*(($newL) - a[1]) + ((1.0::DOUBLE - $B)*0.9)*a[2], a[3] + (yy[1] - (a[1] + 0.9*a[2]))*(yy[1] - (a[1] + 0.9*a[2]))])[3]"""
    }
    // stable sort selectors over the stored triple (argmin-first /
    // argmax-last with index tie-breaks, matching Scala's stable sortBy)
    val i1 = "(CASE WHEN acc[3] <= acc[6] AND acc[3] <= acc[9] THEN 1 WHEN acc[6] <= acc[3] AND acc[6] <= acc[9] THEN 2 ELSE 3 END)"
    val i3 = "(CASE WHEN acc[9] >= acc[3] AND acc[9] >= acc[6] THEN 3 WHEN acc[6] >= acc[3] THEN 2 ELSE 1 END)"
    def sel(i: String, comp: Int) =
      s"(CASE ($i) WHEN 1 THEN acc[$comp] WHEN 2 THEN acc[${3 + comp}] ELSE acc[${6 + comp}] END)"
    val i2 = s"(6 - $i1 - $i3)"
    // CONSTANT-LENGTH 15-slot accumulator — [simplex 1..9 | refl 10..12 |
    // cand 13..15] — written in place by position-CASE, never grown or
    // truncated: a fold whose accumulator LENGTH or top-level branch
    // shape diverges across rows corrupts in DuckDB 1.0 when 150 series
    // fold in lockstep (pars came back all-zero); the PELT/elastic safe
    // shape is one uniform list_transform per step.
    // phase-0 sorted components + reflection (centroid of best 2)
    def cA(comp: Int) = s"(${sel(i1, comp)}/2.0 + ${sel(i2, comp)}/2.0)"
    def reflA(comp: Int) = s"(${cA(comp)} + (${cA(comp)} - ${sel(i3, comp)}))"
    val p0 = Seq(
      sel(i1, 1), sel(i1, 2), sel(i1, 3), sel(i2, 1), sel(i2, 2), sel(i2, 3),
      sel(i3, 1), sel(i3, 2), sel(i3, 3),
      reflA(1), reflA(2), sse(reflA(1), reflA(2)),
      "acc[13]", "acc[14]", "acc[15]")
    // phase-1 secondary candidate from the SORTED slots (x1=1..3,
    // x2=4..6, x3=7..9, refl=10..12): expansion if fr<f1, dummy if
    // fr<f2, else contraction
    def cS(comp: Int) = s"(acc[$comp]/2.0 + acc[${3 + comp}]/2.0)"
    def expA(comp: Int) = s"(${cS(comp)} + 2.0*(${cS(comp)} - acc[${6 + comp}]))"
    def conA(comp: Int) = s"(${cS(comp)} + 0.5*(acc[${6 + comp}] - ${cS(comp)}))"
    def cand(comp: Int) =
      s"(CASE WHEN acc[12] < acc[3] THEN ${expA(comp)} WHEN acc[12] < acc[6] THEN 0.0::DOUBLE ELSE ${conA(comp)} END)"
    val p1 = (1 to 12).map(k => s"acc[$k]") ++ Seq(
      cand(1), cand(2),
      s"CASE WHEN acc[12] < acc[3] THEN ${sse(expA(1), expA(2))} WHEN acc[12] < acc[6] THEN 1e308::DOUBLE ELSE ${sse(conA(1), conA(2))} END")
    // phase-2 assembly: worst replaced by exp/refl/con, or shrink
    val shrink = "(NOT acc[12] < acc[3] AND NOT acc[12] < acc[6] AND NOT acc[15] < acc[9])"
    def shr(base: Int, comp: Int) = s"(acc[$comp] + 0.5*(acc[${base + comp}] - acc[$comp]))"
    def w3(comp: Int) =
      s"(CASE WHEN acc[12] < acc[3] THEN (CASE WHEN acc[15] < acc[12] THEN acc[${12 + comp}] ELSE acc[${9 + comp}] END) WHEN acc[12] < acc[6] THEN acc[${9 + comp}] WHEN acc[15] < acc[9] THEN acc[${12 + comp}] ELSE 0.0::DOUBLE END)"
    val p2 = Seq(
      "acc[1]", "acc[2]", "acc[3]",
      s"CASE WHEN $shrink THEN ${shr(3, 1)} ELSE acc[4] END",
      s"CASE WHEN $shrink THEN ${shr(3, 2)} ELSE acc[5] END",
      s"CASE WHEN $shrink THEN ${sse(shr(3, 1), shr(3, 2))} ELSE acc[6] END",
      s"CASE WHEN $shrink THEN ${shr(6, 1)} ELSE ${w3(1)} END",
      s"CASE WHEN $shrink THEN ${shr(6, 2)} ELSE ${w3(2)} END",
      s"CASE WHEN $shrink THEN ${sse(shr(6, 1), shr(6, 2))} ELSE ${w3(3)} END") ++
      (10 to 15).map(k => s"acc[$k]")
    val frozen = "greatest(acc[3], greatest(acc[6], acc[9])) - least(acc[3], least(acc[6], acc[9])) <= 1e-9"
    // one uniform list constructor per step; every element carries the
    // frozen pass-through and the 3-way phase choice as scalar CASEs
    val step = "[" + (1 to 15).map { k =>
      s"CASE WHEN $frozen THEN acc[$k] WHEN (x[1])::INT % 3 = 0 THEN ${p0(k - 1)} WHEN (x[1])::INT % 3 = 1 THEN ${p1(k - 1)} ELSE ${p2(k - 1)} END"
    }.mkString(", ") + "]"
    // best stored point, first-min tie-break (Scala minBy)
    val bestA = "(CASE WHEN nm[3] <= nm[6] AND nm[3] <= nm[9] THEN nm[1] WHEN nm[6] <= nm[9] THEN nm[4] ELSE nm[7] END)"
    val bestB = "(CASE WHEN nm[3] <= nm[6] AND nm[3] <= nm[9] THEN nm[2] WHEN nm[6] <= nm[9] THEN nm[5] ELSE nm[8] END)"
    val af = "(1.0::DOUBLE/(1.0::DOUBLE + exp(-(pa))))"
    val bf = "(1.0::DOUBLE/(1.0::DOUBLE + exp(-(pb))))"
    val ltL = s"$af*yy[1] + (1.0::DOUBLE - $af)*(a[1] + 0.9*a[2])"
    // all 7 forecasts computed per-user BEFORE any join, as plain scalar
    // arithmetic (left-assoc adds mirror Scala's damp += pow(phi, j)) —
    // and `fstab`'s GROUP BY forces materialization: re-evaluating the
    // lt fold across the joined 1050-row fan-out hits the DuckDB 1.0
    // lockstep corruption (st picks up another row's values; the PELT
    // comment documents the class) and can even segfault.
    val dampList = (1 to 7).map(k =>
      "st[1] + (" + (1 to k).map(j => s"pow(0.9, $j.0)").mkString(" + ")
        + ") * st[2]").mkString(", ")
    s"""WITH o AS (SELECT user_id, value, epoch_us(ts) AS us,
       |  row_number() OVER ($W) AS rn FROM events),
       |v AS (SELECT user_id, list(value ORDER BY rn) AS vs, count(*)::INT AS n
       |  FROM o GROUP BY user_id),
       |sim0 AS (SELECT user_id, vs, n,
       |  [0.0::DOUBLE, -2.0::DOUBLE, ${sse("0.0::DOUBLE", "-2.0::DOUBLE")},
       |   0.5::DOUBLE, -2.0::DOUBLE, ${sse("0.5::DOUBLE", "-2.0::DOUBLE")},
       |   0.0::DOUBLE, -1.5::DOUBLE, ${sse("0.0::DOUBLE", "-1.5::DOUBLE")},
       |   0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE,
       |   0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE] AS s0
       |  FROM v),
       |nmr AS (SELECT user_id, vs, n, list_reduce(
       |    list_prepend(s0, list_transform(generate_series(0, 449), s -> [s::DOUBLE])),
       |    (acc, x) -> $step) AS nm
       |  FROM sim0),
       |pars AS (SELECT user_id, vs, n, $bestA AS pa, $bestB AS pb FROM nmr),
       |lt AS (SELECT user_id, n,
       |  list_reduce(list_prepend([vs[1], vs[2] - vs[1]], list_transform(vs[2:], w -> [w, 0.0::DOUBLE])),
       |    (a, yy) -> [$ltL, $bf*(($ltL) - a[1]) + ((1.0::DOUBLE - $bf)*0.9)*a[2]]) AS st
       |  FROM pars),
       |fcl AS (SELECT user_id, [$dampList] AS fc FROM lt),
       |fstab AS (SELECT user_id, any_value(fc) AS fc FROM fcl GROUP BY user_id),
       |lastt AS (SELECT user_id, max(us) AS us FROM o GROUP BY user_id),
       |d AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, us, lag(us) OVER (PARTITION BY user_id ORDER BY us) AS lus FROM o)
       |  WHERE lus IS NOT NULL GROUP BY user_id)
       |SELECT f.user_id, s.step::BIGINT AS step,
       |  make_timestamp(l.us + s.step * d.freq) AS ts,
       |  round(f.fc[(s.step)::INT] + 1e-9, 6) AS y_hat
       |FROM fstab f JOIN lastt l USING (user_id) JOIN d USING (user_id)
       |CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS step) s""".stripMargin
  }

  // ── ARMA(1,1)+c (Arima.fitArma p=1,q=1 → forecastArma, d=0): the
  // Hannan-Rissanen init replays as Cramer solves (long-AR(4) 5×5, then
  // the 3×3 lag/residual OLS), and the CSS Nelder-Mead (d=3, 300 iters)
  // as the same uniform-shape 3-phase fold the damped-Holt oracle
  // established, generalized to a 4-point simplex (24 slots). ──────────
  /** ARMA(1,1) oracle: pinned fitted-parameter replay when [[OraclePins]]
    * is populated (the gate path), full HR-init + NM replay otherwise. */
  def armaSql: String = OraclePins.arma
    .map(armaSqlPinned(_, s"WHERE user_id < $NmSubsetUsers"))
    .getOrElse(armaSqlFull)

  /** ts_arma_fc_e2e: the full-panel twin, oracled from full-panel pins
    * (r12; was rows-only — the NM fit runs in Scala at Verify time for
    * all 150 series, DuckDB replays only the residual fold + forecast
    * recursion, which is O(n) per series). */
  def armaE2eSql(pins: Seq[(Long, Double, Double, Double)]): String =
    armaSqlPinned(pins, "")

  /** ts_auto_arima replay with pinned per-series model selections
    * (Arima.autoFit → forecastArma → integrate): d-fold differencing,
    * the CSS error recursion from t = m+1 with zero-padded (φ, θ),
    * the 7-step forecast recursion (future innovations zero), and the
    * d-fold cumulative re-integration — each a list fold. The KPSS/AICc
    * SEARCH is not replayed (measured >8 min in DuckDB); it is pinned,
    * like the NM searches. */
  def autoArimaSqlPinned(
      pins: Seq[(Long, Int, Int, Double, Double, Double, Double, Double)],
      h: Int = 7): String = {
    val rows = pins.map { case (u, d, m, p1, p2, t1, t2, cc) =>
      Seq(s"$u::BIGINT", s"$d::INT", s"$m::INT", s"${dlit(p1)}::DOUBLE",
        s"${dlit(p2)}::DOUBLE", s"${dlit(t1)}::DOUBLE", s"${dlit(t2)}::DOUBLE",
        s"${dlit(cc)}::DOUBLE")
    }
    // CSS error fold over the differenced series s[1..ns], state
    // [e_{t-1}, e_{t-2}]; zero-padded lag reads guarded against index 0
    val yl1 = "(CASE WHEN x[1] >= 2 THEN s[(x[1])::INT - 1] ELSE 0.0::DOUBLE END)"
    val yl2 = "(CASE WHEN x[1] >= 3 THEN s[(x[1])::INT - 2] ELSE 0.0::DOUBLE END)"
    val eT = s"(CASE WHEN (x[1])::INT <= m THEN 0.0::DOUBLE ELSE " +
      s"s[(x[1])::INT] - (cc + p1*$yl1 + p2*$yl2 + t1*acc[1] + t2*acc[2]) END)"
    // forecast fold state [y_{-1}, y_{-2}, e_{-1}, e_{-2}, fc...]
    val pred = "(cc + p1*acc[1] + p2*acc[2] + t1*acc[3] + t2*acc[4])"
    val fcStep = s"list_concat([$pred, acc[1], 0.0::DOUBLE, acc[3]], " +
      s"list_concat(acc[5:], [$pred]))"
    // cumulative re-integration: out_i = start + Σ_{j<=i} fc_j
    def cumsum(fcExpr: String, start: String) =
      s"list_reduce(list_prepend([$start], list_transform($fcExpr, v -> [v::DOUBLE])), " +
        s"(a, x) -> list_concat(a, [a[len(a)] + x[1]]))[2:]"
    s"""WITH ${pinsCte("pins",
          Seq("user_id", "d", "m", "p1", "p2", "t1", "t2", "cc"), rows)},
       |o AS (SELECT user_id, value, epoch_us(ts) AS us,
       |  row_number() OVER ($W) AS rn FROM events),
       |v AS (SELECT user_id, list(value ORDER BY rn) AS vs, count(*)::INT AS n
       |  FROM o GROUP BY user_id),
       |dd AS (SELECT *, list_transform(generate_series(2, n), i -> vs[i] - vs[i-1]) AS d1
       |  FROM v JOIN pins USING (user_id)),
       |sv AS (SELECT *, (CASE WHEN d = 0 THEN vs WHEN d = 1 THEN d1
       |    ELSE list_transform(generate_series(2, n - 1), i -> d1[i] - d1[i-1]) END) AS s,
       |  (n - d)::INT AS ns FROM dd),
       |ef AS (SELECT *, list_reduce(
       |    list_prepend([0.0::DOUBLE, 0.0::DOUBLE],
       |      list_transform(generate_series(1, ns), t -> [t::DOUBLE])),
       |    (acc, x) -> [$eT, acc[1]]) AS eb FROM sv),
       |ff AS (SELECT *, list_reduce(
       |    list_prepend([s[ns], CASE WHEN ns >= 2 THEN s[ns - 1] ELSE 0.0::DOUBLE END,
       |        eb[1], eb[2]],
       |      list_transform(generate_series(1, $h), t -> [t::DOUBLE])),
       |    (acc, x) -> $fcStep)[5:] AS fc0 FROM ef),
       |i2 AS (SELECT *, (CASE WHEN d = 2 THEN ${cumsum("fc0", "d1[n - 1]")}
       |    ELSE fc0 END) AS fc1 FROM ff),
       |i1 AS (SELECT user_id, (CASE WHEN d >= 1 THEN ${cumsum("fc1", "vs[n]")}
       |    ELSE fc1 END) AS fc FROM i2),
       |lastt AS (SELECT user_id, max(us) AS us FROM o GROUP BY user_id),
       |fq AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, us, lag(us) OVER (PARTITION BY user_id ORDER BY us) AS lus FROM o)
       |  WHERE lus IS NOT NULL GROUP BY user_id)
       |SELECT f.user_id, s.step::BIGINT AS step,
       |  make_timestamp(l.us + s.step * q.freq) AS ts,
       |  round(f.fc[(s.step)::INT] + 1e-9, 6) AS y_hat
       |FROM i1 f JOIN lastt l USING (user_id) JOIN fq q USING (user_id)
       |CROSS JOIN (SELECT unnest(generate_series(1, $h)) AS step) s""".stripMargin
  }

  /** ts_scum_fc replay: elementwise mean of the four SCUM legs
    * (Arima.scumForecast — auto-ARIMA, auto-ETS, CES, Theta), each leg
    * replayed per series with its fits pinned (ARIMA orders+coefs, ETS
    * choice+smoothing, CES (a0,a1)); the Theta leg replays in full (OLS
    * trend + 40-iteration golden-section SES) exactly as thetaSql. The
    * mean folds left like Array.sum: (((ar + ets) + ces) + theta) / 4. */
  def scumSqlPinned(ar: Seq[(Long, Int, Int, Double, Double, Double, Double, Double)],
      ets: Seq[(Long, graft.kernels.Arima.AutoEtsFit)],
      cesP: Seq[(Long, Double, Double)], h: Int = 5): String = {
    val rows = ar.indices.map { i =>
      val (u, d, m, p1, p2, t1, t2, cc) = ar(i)
      val (u2, f) = ets(i)
      val (u3, a0, a1) = cesP(i)
      require(u == u2 && u == u3, s"pin user mismatch: $u/$u2/$u3")
      Seq(s"$u::BIGINT", s"$d::INT", s"$m::INT", s"${dlit(p1)}::DOUBLE",
        s"${dlit(p2)}::DOUBLE", s"${dlit(t1)}::DOUBLE", s"${dlit(t2)}::DOUBLE",
        s"${dlit(cc)}::DOUBLE", s"${f.choice}::INT", s"${dlit(f.holtAlpha)}::DOUBLE",
        s"${dlit(f.holtBeta)}::DOUBLE", s"${dlit(f.sesAlpha)}::DOUBLE",
        s"${dlit(f.hwAlpha)}::DOUBLE", s"${dlit(f.hwBeta)}::DOUBLE",
        s"${dlit(f.hwGamma)}::DOUBLE", s"${dlit(a0)}::DOUBLE", s"${dlit(a1)}::DOUBLE")
    }
    // ── ARIMA leg (same folds as autoArimaSqlPinned) ──
    val yl1 = "(CASE WHEN x[1] >= 2 THEN s[(x[1])::INT - 1] ELSE 0.0::DOUBLE END)"
    val yl2 = "(CASE WHEN x[1] >= 3 THEN s[(x[1])::INT - 2] ELSE 0.0::DOUBLE END)"
    val eT = s"(CASE WHEN (x[1])::INT <= m THEN 0.0::DOUBLE ELSE " +
      s"s[(x[1])::INT] - (cc + p1*$yl1 + p2*$yl2 + t1*acc[1] + t2*acc[2]) END)"
    val pred = "(cc + p1*acc[1] + p2*acc[2] + t1*acc[3] + t2*acc[4])"
    val fcStep = s"list_concat([$pred, acc[1], 0.0::DOUBLE, acc[3]], " +
      s"list_concat(acc[5:], [$pred]))"
    def cumsum(fcExpr: String, start: String) =
      s"list_reduce(list_prepend([$start], list_transform($fcExpr, v -> [v::DOUBLE])), " +
        s"(a, x) -> list_concat(a, [a[len(a)] + x[1]]))[2:]"
    // ── ETS leg (same folds as autoEtsSqlPinned, h-parameterized) ──
    val hwFoldP: String = {
      val sea = "a[((yy[2])::INT) + 3]"
      val newL = s"(wa*(yy[1] - $sea) + (1.0::DOUBLE - wa)*(a[1] + a[2]))"
      val seaSlots = (0 until 24).map(j =>
        s"CASE WHEN (yy[2])::INT = $j THEN wg*(yy[1] - $newL) + (1.0::DOUBLE - wg)*a[${j + 3}] ELSE a[${j + 3}] END").mkString(", ")
      s"""list_reduce(list_prepend(list_concat([avg1, (avg2 - avg1)/24.0], list_transform(generate_series(1, 24), i -> vs[i::INT] - avg1)), list_transform(generate_series(25, n), ti -> [vs[ti::INT], ((ti - 1) % 24)::DOUBLE])), (a, yy) -> [$newL, wb*($newL - a[1]) + (1.0::DOUBLE - wb)*a[2], $seaSlots])"""
    }
    val etsFcCases = (1 to h).map { s =>
      s"""CASE WHEN ch = 0 THEN sesl
         | WHEN ch = 1 THEN hl + $s.0*ht
         | ELSE hw[1] + $s.0*hw[2] + hw[((n - 1 + $s) % 24) + 3] END""".stripMargin
    }.mkString(",\n  ")
    // ── CES leg ──
    val cesE = "(yy[1] - acc[1])"
    val cesStep = s"[acc[1] - (1.0::DOUBLE - ca1)*acc[2] + (ca0 - ca1)*$cesE, " +
      s"acc[1] + (1.0::DOUBLE - ca0)*acc[2] + (ca0 + ca1)*$cesE]"
    val cesFcStep = "list_concat([acc[1] - (1.0::DOUBLE - ca1)*acc[2], " +
      "acc[1] + (1.0::DOUBLE - ca0)*acc[2]], list_concat(acc[3:], [acc[1]]))"
    val pinCols = Seq("user_id", "d", "m", "p1", "p2", "t1", "t2", "cc",
      "ch", "ha", "hb", "salpha", "wa", "wb", "wg", "ca0", "ca1")
    s"""WITH ${pinsCte("pins", pinCols, rows)},
       |o AS (SELECT user_id, value, epoch_us(ts) AS us,
       |  row_number() OVER ($W) AS rn FROM events),
       |v AS (SELECT user_id, list(value ORDER BY rn) AS vs, count(*)::INT AS n
       |  FROM o GROUP BY user_id),
       |adf AS (SELECT *, list_transform(generate_series(2, n), i -> vs[i] - vs[i-1]) AS d1
       |  FROM v JOIN pins USING (user_id)),
       |asv AS (SELECT *, (CASE WHEN d = 0 THEN vs WHEN d = 1 THEN d1
       |    ELSE list_transform(generate_series(2, n - 1), i -> d1[i] - d1[i-1]) END) AS s,
       |  (n - d)::INT AS ns FROM adf),
       |aef AS (SELECT *, list_reduce(
       |    list_prepend([0.0::DOUBLE, 0.0::DOUBLE],
       |      list_transform(generate_series(1, ns), t -> [t::DOUBLE])),
       |    (acc, x) -> [$eT, acc[1]]) AS eb FROM asv),
       |aff AS (SELECT *, list_reduce(
       |    list_prepend([s[ns], CASE WHEN ns >= 2 THEN s[ns - 1] ELSE 0.0::DOUBLE END,
       |        eb[1], eb[2]],
       |      list_transform(generate_series(1, $h), t -> [t::DOUBLE])),
       |    (acc, x) -> $fcStep)[5:] AS fc0 FROM aef),
       |ai2 AS (SELECT *, (CASE WHEN d = 2 THEN ${cumsum("fc0", "d1[n - 1]")}
       |    ELSE fc0 END) AS fc1 FROM aff),
       |arleg AS (SELECT user_id, (CASE WHEN d >= 1 THEN ${cumsum("fc1", "vs[n]")}
       |    ELSE fc1 END) AS fc FROM ai2),
       |eav AS (SELECT user_id, vs, n, ch, ha, hb, salpha, wa, wb, wg,
       |  list_reduce(vs[1:24], (aa, bb) -> aa + bb)/24.0 AS avg1,
       |  list_reduce(vs[25:48], (aa, bb) -> aa + bb)/24.0 AS avg2
       |  FROM v JOIN pins USING (user_id)),
       |efits AS (SELECT user_id, n, ch,
       |  list_reduce(list_prepend([vs[1]], list_transform(vs[2:], w -> [w])),
       |    (a, y2) -> [salpha*y2[1] + (1.0::DOUBLE - salpha)*a[1]])[1] AS sesl,
       |  list_reduce(list_prepend([vs[1], vs[2] - vs[1]], list_transform(vs[2:], w -> [w, 0.0::DOUBLE])),
       |    (a, yy) -> [ha*yy[1] + (1.0::DOUBLE - ha)*(a[1] + a[2]), hb*((ha*yy[1] + (1.0::DOUBLE - ha)*(a[1] + a[2])) - a[1]) + (1.0::DOUBLE - hb)*a[2]]) AS hstate,
       |  CASE WHEN n >= 51 THEN $hwFoldP ELSE NULL END AS hw
       |  FROM eav),
       |etsleg AS (SELECT user_id, [
       |  $etsFcCases] AS fc
       |  FROM (SELECT user_id, n, ch, sesl, hstate[1] AS hl, hstate[2] AS ht, hw FROM efits)),
       |cst AS (SELECT user_id, ca0, ca1, list_reduce(
       |    list_prepend([vs[1], vs[2] - vs[1]], list_transform(vs[2:], w -> [w])),
       |    (acc, yy) -> $cesStep) AS lc FROM v JOIN pins USING (user_id)),
       |cesleg AS (SELECT user_id, list_reduce(
       |    list_prepend([lc[1], lc[2]],
       |      list_transform(generate_series(1, $h), t -> [t::DOUBLE])),
       |    (acc, x) -> $cesFcStep)[3:] AS fc FROM cst),
       |tols AS (SELECT user_id, vs, n, (n-1)/2.0 AS tm,
       |  list_reduce(vs, (x, y) -> x + y) / n AS ym FROM v),
       |tab AS (SELECT user_id, vs, n, ym, tm,
       |  CASE WHEN den > 0 THEN num/den ELSE 0.0::DOUBLE END AS b
       |  FROM (SELECT *,
       |    list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(generate_series(1, n), i -> ((i-1) - tm)*(vs[i::INT] - ym))),
       |      (x, y) -> x + y) AS num,
       |    list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(generate_series(1, n), i -> ((i-1) - tm)*((i-1) - tm))),
       |      (x, y) -> x + y) AS den
       |  FROM tols)),
       |tab2 AS (SELECT user_id, vs, n, b, ym - b*tm AS a FROM tab),
       |tth AS (SELECT user_id, n, a, b,
       |  list_transform(generate_series(1, n), i -> 2.0*vs[i::INT] - (a + b*(i-1))) AS t2
       |  FROM tab2),
       |tgs AS (SELECT user_id, n, a, b, t2,
       |  list_reduce(
       |    list_prepend(
       |      [0.01::DOUBLE, 0.99::DOUBLE, $c0, $d0,
       |       ${sesSse(c0, "t2")},
       |       ${sesSse(d0, "t2")}],
       |      list_transform(generate_series(1, 40), i -> [i::DOUBLE])),
       |    (acc, x) -> CASE WHEN acc[5] < acc[6]
       |      THEN [acc[1], acc[4], $newC, acc[3], ${sesSse(newC, "t2")}, acc[5]]
       |      ELSE [acc[3], acc[2], acc[4], $newD, acc[6], ${sesSse(newD, "t2")}]
       |    END) AS g
       |  FROM tth),
       |thleg AS (SELECT user_id, n, a, b,
       |  list_reduce(
       |    list_prepend([t2[1]], list_transform(t2[2:], w -> [w])),
       |    (acc, y) -> [((g[1]+g[2])/2.0)*y[1] + (1.0::DOUBLE - (g[1]+g[2])/2.0)*acc[1]])[1] AS level
       |  FROM tgs),
       |lastt AS (SELECT user_id, max(us) AS us FROM o GROUP BY user_id),
       |sfq AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, us, lag(us) OVER (PARTITION BY user_id ORDER BY us) AS lus FROM o)
       |  WHERE lus IS NOT NULL GROUP BY user_id)
       |SELECT ar.user_id, s.step::BIGINT AS step,
       |  make_timestamp(l.us + s.step * q.freq) AS ts,
       |  round((((ar.fc[(s.step)::INT] + et.fc[(s.step)::INT])
       |    + ce.fc[(s.step)::INT])
       |    + 0.5*(th.level + th.a + th.b*(th.n + s.step - 1)))/4.0 + 1e-9, 6) AS y_hat
       |FROM arleg ar JOIN etsleg et USING (user_id)
       |JOIN cesleg ce USING (user_id) JOIN thleg th USING (user_id)
       |JOIN lastt l USING (user_id) JOIN sfq q USING (user_id)
       |CROSS JOIN (SELECT unnest(generate_series(1, $h)) AS step) s""".stripMargin
  }

  /** ts_scientist replay with the backtest winner pinned: the agent's
    * curate stage (forward-fill + |z|>4 clip) replays exactly, then the
    * pinned winner's forecast recursion. Only the winner NAME is pinned —
    * the candidate generation and backtest selection stay Scala-side.
    * Returns None for a theta winner (its replay lives in thetaSql's
    * shape but over cleaned data; not composed here — query falls back
    * to rows-only in that case). */
  def scientistSqlPinned(winner: String, h: Int = 7): Option[String] = {
    val holtL = "0.3 * x[1] + (1.0::DOUBLE - 0.3) * (acc[1] + acc[2])"
    val fcCte: Option[String] = winner match {
      case "naive" => Some(
        s"""fc AS (SELECT user_id, list(value ORDER BY rn) AS vs FROM o GROUP BY user_id),
           |fcv AS (SELECT user_id, list_transform(generate_series(1, $h), s -> vs[len(vs)]) AS f FROM fc)""".stripMargin)
      case "moving_average" => Some(
        s"""tl AS (SELECT o.user_id, list(o.value ORDER BY o.rn) AS vs
           |  FROM o JOIN nn USING (user_id) WHERE o.rn > nn.n - 12 GROUP BY o.user_id),
           |fcv AS (SELECT user_id, list_transform(generate_series(1, $h),
           |  s -> list_reduce(vs, (acc, v) -> acc + v) / len(vs)) AS f FROM tl)""".stripMargin)
      case "seasonal_naive" => Some(
        s"""tl AS (SELECT o.user_id, list(o.value ORDER BY o.rn) AS vs, count(*) AS m
           |  FROM o JOIN nn USING (user_id) WHERE o.rn > nn.n - 24 GROUP BY o.user_id),
           |fcv AS (SELECT user_id, list_transform(generate_series(1, $h),
           |  s -> vs[((s - 1) % m)::INT + 1]) AS f FROM tl)""".stripMargin)
      case "ses" => Some(
        s"""lv AS (SELECT user_id,
           |  list_reduce(list(value ORDER BY rn), (acc, v) -> 0.3 * v + (1.0 - 0.3) * acc) AS level
           |  FROM o GROUP BY user_id),
           |fcv AS (SELECT user_id, list_transform(generate_series(1, $h), s -> level) AS f FROM lv)""".stripMargin)
      case "holt" => Some(
        s"""vv AS (SELECT user_id, list(value ORDER BY rn) AS vs FROM o GROUP BY user_id),
           |st AS (SELECT user_id, list_reduce(
           |  list_prepend([vs[1], vs[2] - vs[1]], list_transform(vs[2:], w -> [w, 0.0::DOUBLE])),
           |  (acc, x) -> [$holtL,
           |    0.1 * (($holtL) - acc[1]) + (1.0::DOUBLE - 0.1) * acc[2]]) AS st FROM vv),
           |fcv AS (SELECT user_id, list_transform(generate_series(1, $h),
           |  s -> st[1] + s * st[2]) AS f FROM st)""".stripMargin)
      case _ => None
    }
    fcCte.map { cte =>
      s"""WITH o0 AS (SELECT user_id, value, epoch_us(ts) AS us,
         |  row_number() OVER ($W) AS rn FROM events),
         |ff AS (SELECT user_id, us, rn, coalesce(value,
         |    last_value(value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY rn
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS v1 FROM o0),
         |stats AS (SELECT user_id, avg(v1) AS mu, stddev_samp(v1) AS sd
         |  FROM ff GROUP BY user_id),
         |o AS (SELECT f.user_id, f.us, f.rn,
         |  CASE WHEN f.v1 IS NOT NULL AND (f.v1 < mu - 4.0*sd OR f.v1 > mu + 4.0*sd)
         |    THEN least(greatest(f.v1, mu - 4.0*sd), mu + 4.0*sd) ELSE f.v1 END AS value
         |  FROM ff f JOIN stats USING (user_id)),
         |nn AS (SELECT user_id, count(*) AS n FROM o GROUP BY user_id),
         |$cte,
         |lastt AS (SELECT user_id, max(us) AS us FROM o GROUP BY user_id),
         |sfq AS (SELECT user_id, min(us - lus) AS freq FROM
         |  (SELECT user_id, us, lag(us) OVER (PARTITION BY user_id ORDER BY us) AS lus FROM o)
         |  WHERE lus IS NOT NULL GROUP BY user_id)
         |SELECT f.user_id, s.step::BIGINT AS step,
         |  make_timestamp(l.us + s.step * q.freq) AS ts,
         |  round(f.f[(s.step)::INT] + 1e-9, 6) AS y_hat,
         |  '$winner' AS best_model
         |FROM fcv f JOIN lastt l USING (user_id) JOIN sfq q USING (user_id)
         |CROSS JOIN (SELECT unnest(generate_series(1, $h)) AS step) s""".stripMargin
    }
  }

  /** ts_quantile_fc replay with pinned pooled IRLS coefficients
    * (Probabilistic.fitQuantileRidge / quantileForecast): the IRLS search
    * is not SQL-replayable (documented at the query), but the fitted
    * pinball-ridge coefficients are 12 doubles — pin them and replay the
    * 5-step recursion where the median coefficient vector drives the lag
    * buffer and every level predicts from the same recursive path. */
  def quantileFcSql(pins: Seq[(Double, Array[Double])], h: Int = 5): String = {
    val cfs = pins.map(_._2)
    val medIdx = pins.map(_._1).zipWithIndex.minBy { case (q, _) => math.abs(q - 0.5) }._2
    // buf newest-last in acc[1..3]: x = (lag1, lag2, lag3, 1) = (acc[3], acc[2], acc[1], 1)
    def pred(cf: Array[Double]) =
      s"(${dlit(cf(0))}*acc[3] + ${dlit(cf(1))}*acc[2] + ${dlit(cf(2))}*acc[1] + ${dlit(cf(3))})"
    val step = s"list_concat([acc[2], acc[3], ${pred(cfs(medIdx))}], " +
      s"list_concat(acc[4:], [${cfs.map(pred).mkString(", ")}]))"
    val qCols = pins.zipWithIndex.map { case ((q, _), i) =>
      val name = s"q_$q".replace(".", "_").replace("q_0_", "q_") + "0"
      s"round(f.fc[(3 + (s.step - 1) * ${pins.length} + ${i + 1})::INT] + 1e-9, 6) AS $name"
    }.mkString(",\n  ")
    s"""WITH o AS (SELECT user_id, value, epoch_us(ts) AS us,
       |  row_number() OVER ($W) AS rn FROM events),
       |v AS (SELECT user_id, list(value ORDER BY rn) AS vs, count(*)::INT AS n
       |  FROM o GROUP BY user_id),
       |f AS (SELECT user_id, list_reduce(
       |    list_prepend(vs[n-2:n],
       |      list_transform(generate_series(1, $h), s -> [s::DOUBLE])),
       |    (acc, x) -> $step) AS fc
       |  FROM v WHERE n >= 3),
       |lastt AS (SELECT user_id, max(us) AS us FROM o GROUP BY user_id),
       |d AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, us, lag(us) OVER (PARTITION BY user_id ORDER BY us) AS lus FROM o)
       |  WHERE lus IS NOT NULL GROUP BY user_id)
       |SELECT f.user_id, s.step::BIGINT AS step,
       |  make_timestamp(l.us + s.step * d.freq) AS ts,
       |  $qCols
       |FROM f JOIN lastt l USING (user_id) JOIN d USING (user_id)
       |CROSS JOIN (SELECT unnest(generate_series(1, $h)) AS step) s""".stripMargin
  }

  /** Pinned variant: (φ, θ, c) fitted in Scala; SQL replays the residual
    * recursion (e_n) and the 7-step forecast recursion only. */
  private def armaSqlPinned(pins: Seq[(Long, Double, Double, Double)],
                            filter: String): String = {
    val fcExprs = {
      var cur = "((cc + pp*vs[n]) + tt*elast)"
      (1 to 7).map { s =>
        if (s > 1) cur = s"(cc + pp*$cur)"
        cur
      }
    }
    val rows = pins.map { case (u, pp, tt, cc) =>
      Seq(s"$u::BIGINT", s"${dlit(pp)}::DOUBLE", s"${dlit(tt)}::DOUBLE", s"${dlit(cc)}::DOUBLE")
    }
    s"""WITH ${pinsCte("pins", Seq("user_id", "pp", "tt", "cc"), rows)},
       |o AS (SELECT user_id, value, epoch_us(ts) AS us,
       |  row_number() OVER ($W) AS rn FROM events $filter),
       |v AS (SELECT user_id, list(value ORDER BY rn) AS vs, count(*)::INT AS n
       |  FROM o GROUP BY user_id),
       |best AS (SELECT user_id, vs, n, pp, tt, cc FROM v JOIN pins USING (user_id)),
       |el AS (SELECT user_id, vs, n, pp, tt, cc,
       |  list_reduce(list_prepend([0.0::DOUBLE],
       |    list_transform(generate_series(2, n), t -> [t::DOUBLE])),
       |    (a, x) -> [vs[(x[1])::INT] - (((cc) + (pp)*vs[(x[1])::INT - 1]) + (tt)*a[1])])[1] AS elast
       |  FROM best),
       |fcl AS (SELECT user_id, [${fcExprs.mkString(",\n  ")}] AS fc FROM el),
       |fstab AS (SELECT user_id, any_value(fc) AS fc FROM fcl GROUP BY user_id),
       |lastt AS (SELECT user_id, max(us) AS us FROM o GROUP BY user_id),
       |d AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, us, lag(us) OVER (PARTITION BY user_id ORDER BY us) AS lus FROM o)
       |  WHERE lus IS NOT NULL GROUP BY user_id)
       |SELECT f.user_id, s.step::BIGINT AS step,
       |  make_timestamp(l.us + s.step * d.freq) AS ts,
       |  round(f.fc[(s.step)::INT] + 1e-9, 6) AS y_hat
       |FROM fstab f JOIN lastt l USING (user_id) JOIN d USING (user_id)
       |CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS step) s""".stripMargin
  }

  private[graft] val armaSqlFull: String = {
    val d = 3; val k1 = d + 1; val L = (d + 3) * k1 // 24 slots
    // conditional-SS objective at (phi, theta, c): fold [e_prev, s]
    def css(pp: String, tt: String, cc: String): String = {
      val e = s"(vs[(x[1])::INT] - ((($cc) + ($pp)*vs[(x[1])::INT - 1]) + ($tt)*a[1]))"
      s"""(CASE WHEN abs($pp) > 4.0 OR abs($tt) > 4.0 THEN 1e100::DOUBLE ELSE list_reduce(list_prepend([0.0::DOUBLE, 0.0::DOUBLE], list_transform(generate_series(2, n), t -> [t::DOUBLE, 0.0::DOUBLE])), (a, x) -> [$e, a[2] + $e*$e])[2] END)"""
    }
    def coord(p: Int, c: Int) = s"acc[${p * k1 + c}]"
    def fOf(p: Int) = s"acc[${(p + 1) * k1}]"
    val R = (d + 1) * k1; val C = (d + 2) * k1
    def reflC(c: Int) = s"acc[${R + c}]"
    val fr = s"acc[${R + k1}]"
    def candC(c: Int) = s"acc[${C + c}]"
    val fcand = s"acc[${C + k1}]"
    // stable rank (count of points strictly ahead by (f, index))
    def rank(p: Int) = "(" + (0 to d).filter(_ != p).map { q =>
      if (q < p) s"(CASE WHEN ${fOf(q)} <= ${fOf(p)} THEN 1 ELSE 0 END)"
      else s"(CASE WHEN ${fOf(q)} < ${fOf(p)} THEN 1 ELSE 0 END)"
    }.mkString(" + ") + ")"
    def sel(s: Int, c: Int) = "(CASE " + (0 to d).map { p =>
      val v = if (c <= d) coord(p, c) else fOf(p)
      s"WHEN ${rank(p)} = $s THEN $v"
    }.mkString(" ") + " ELSE 0.0::DOUBLE END)"
    // phase 0: sorted simplex + reflection (centroid of best d, seq adds)
    def cA(c: Int) = "(" + (0 until d).map(s => s"${sel(s, c)}/$d.0").mkString(" + ") + ")"
    def reflA(c: Int) = s"(${cA(c)} + (${cA(c)} - ${sel(d, c)}))"
    val p0 = (0 to d).flatMap(s => (1 to d).map(c => sel(s, c)) :+ sel(s, d + 1)) ++
      (1 to d).map(reflA) :+ sse3(css, reflA) :++ (1 to k1).map(c => s"acc[${C + c}]")
    // phase 1: candidate written from SORTED slots
    def cS(c: Int) = "(" + (0 until d).map(p => s"${coord(p, c)}/$d.0").mkString(" + ") + ")"
    def expA(c: Int) = s"(${cS(c)} + 2.0*(${cS(c)} - ${coord(d, c)}))"
    def conA(c: Int) = s"(${cS(c)} + 0.5*(${coord(d, c)} - ${cS(c)}))"
    def cand(c: Int) =
      s"(CASE WHEN $fr < ${fOf(0)} THEN ${expA(c)} WHEN $fr < ${fOf(d - 1)} THEN 0.0::DOUBLE ELSE ${conA(c)} END)"
    val p1 = (1 to R + k1).map(k => s"acc[$k]") ++ (1 to d).map(cand) :+
      s"CASE WHEN $fr < ${fOf(0)} THEN ${sse3(css, expA)} WHEN $fr < ${fOf(d - 1)} THEN 1e308::DOUBLE ELSE ${sse3(css, conA)} END"
    // phase 2: assembly (worst ← exp/refl/con, or shrink all but best)
    val shrink = s"(NOT $fr < ${fOf(0)} AND NOT $fr < ${fOf(d - 1)} AND NOT $fcand < ${fOf(d)})"
    def shr(p: Int, c: Int) = s"(${coord(0, c)} + 0.5*(${coord(p, c)} - ${coord(0, c)}))"
    def w3(c: Int) =
      s"(CASE WHEN $fr < ${fOf(0)} THEN (CASE WHEN $fcand < $fr THEN ${candC(c)} ELSE ${reflC(c)} END) WHEN $fr < ${fOf(d - 1)} THEN ${reflC(c)} WHEN $fcand < ${fOf(d)} THEN ${candC(c)} ELSE 0.0::DOUBLE END)"
    def w3f =
      s"(CASE WHEN $fr < ${fOf(0)} THEN (CASE WHEN $fcand < $fr THEN $fcand ELSE $fr END) WHEN $fr < ${fOf(d - 1)} THEN $fr WHEN $fcand < ${fOf(d)} THEN $fcand ELSE 0.0::DOUBLE END)"
    val p2 = ((1 to k1).map(k => s"acc[$k]") ++
      (1 until d).flatMap(p =>
        (1 to d).map(c => s"CASE WHEN $shrink THEN ${shr(p, c)} ELSE ${coord(p, c)} END") :+
          s"CASE WHEN $shrink THEN ${sse3(css, (c: Int) => shr(p, c))} ELSE ${fOf(p)} END") ++
      (1 to d).map(c => s"CASE WHEN $shrink THEN ${shr(d, c)} ELSE ${w3(c)} END") :+
      s"CASE WHEN $shrink THEN ${sse3(css, (c: Int) => shr(d, c))} ELSE $w3f END") ++
      (1 to 2 * k1).map(k => s"acc[${R + k}]")
    val fVals = (0 to d).map(fOf)
    val frozen = "greatest(" + fVals.mkString(", ") + ") - least(" + fVals.mkString(", ") + ") <= 1e-9"
    require(p0.length == L && p1.length == L && p2.length == L,
      s"phase lengths ${p0.length}/${p1.length}/${p2.length} != $L")
    val step = "[" + (1 to L).map { k =>
      s"CASE WHEN $frozen THEN acc[$k] WHEN (x[1])::INT % 3 = 0 THEN ${p0(k - 1)} WHEN (x[1])::INT % 3 = 1 THEN ${p1(k - 1)} ELSE ${p2(k - 1)} END"
    }.mkString(", ") + "]"
    // ── Hannan-Rissanen init, BIT-EXACT: the NM path amplifies any init
    // difference (a Cramer-vs-LU 1e-12 gap became 2e-6 in the forecast),
    // so the normal-equation sums fold sequentially in the Scala loop
    // order and the solves replay ArimaLite.solve's partial-pivot LU
    // exactly. ARMA is pure +/−/×/÷ arithmetic — full bit-parity holds.
    def foldSum(term: String) =
      s"""list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(5, n), ti -> ($term))), (aa, bb) -> aa + bb)"""
    def lag(src: String, a: Int) = s"$src[(ti - $a)::INT]"
    // stage-1: X = [y_{t-1..t-4}, 1], 5×6 augmented row-major
    def s1Term(a: Int, b: Int): String =
      if (a < 4 && b < 4) s"${lag("vs", a + 1)} * ${lag("vs", b + 1)}"
      else if (a < 4 && b == 4) lag("vs", a + 1)
      else if (a == 4 && b < 4) lag("vs", b + 1)
      else if (a < 4 && b == 5) s"${lag("vs", a + 1)} * vs[ti::INT]"
      else if (a == 4 && b == 5) "vs[ti::INT]"
      else "1.0::DOUBLE"
    val m1Flat = (for (a <- 0 to 4; b <- 0 to 5) yield foldSum(s1Term(a, b)))
      .mkString(",\n    ")
    // e0 residuals of the long AR ((((c+φ1y)+φ2y)+φ3y)+φ4y order)
    val e0Pred = "(((((arc4) + (arc0)*vs[ti::INT - 1]) + (arc1)*vs[ti::INT - 2]) + (arc2)*vs[ti::INT - 3]) + (arc3)*vs[ti::INT - 4])"
    // stage-2: X = [y_{t-1}, e0_{t-1}, 1], 3×4 augmented
    def s2Term(a: Int, b: Int): String = {
      def xc(i: Int) = i match {
        case 0 => lag("vs", 1); case 1 => lag("e0", 1); case _ => null
      }
      if (a < 2 && b < 2) s"${xc(a)} * ${xc(b)}"
      else if (a < 2 && b == 2) xc(a)
      else if (a == 2 && b < 2) xc(b)
      else if (a < 2 && b == 3) s"${xc(a)} * vs[ti::INT]"
      else if (a == 2 && b == 3) "vs[ti::INT]"
      else "1.0::DOUBLE"
    }
    val m2Flat = (for (a <- 0 to 2; b <- 0 to 3) yield foldSum(s2Term(a, b)))
      .mkString(",\n    ")
    // recursion: f1 = (c + φ·y_n) + θ·e_last; f_{s>1} = c + φ·f_{s-1}
    val fcExprs = {
      var cur = "((cc + pp*vs[n]) + tt*elast)"
      (1 to 7).map { s =>
        if (s > 1) cur = s"(cc + pp*$cur)"
        cur
      }
    }
    val lu1Steps = (0 until 5).map(k =>
      s"lu1$k AS (SELECT user_id, vs, n, ${luStepExpr("m", 5, k)} AS m FROM ${if (k == 0) "g1" else s"lu1${k - 1}"})")
      .mkString(",\n")
    val xs1 = luBackSub("m", 5)
    val lu2Steps = (0 until 3).map(k =>
      s"lu2$k AS (SELECT user_id, vs, n, ${luStepExpr("m", 3, k)} AS m FROM ${if (k == 0) "g2" else s"lu2${k - 1}"})")
      .mkString(",\n")
    val xs2 = luBackSub("m", 3)
    s"""WITH o AS (SELECT user_id, value, epoch_us(ts) AS us,
       |  row_number() OVER ($W) AS rn FROM events WHERE user_id < $NmSubsetUsers),
       |v AS (SELECT user_id, list(value ORDER BY rn) AS vs, count(*)::INT AS n
       |  FROM o GROUP BY user_id),
       |g1 AS (SELECT user_id, vs, n, [
       |    $m1Flat] AS m FROM v),
       |$lu1Steps,
       |arc AS (SELECT user_id, vs, n, ${xs1(0)} AS arc0, ${xs1(1)} AS arc1,
       |  ${xs1(2)} AS arc2, ${xs1(3)} AS arc3, ${xs1(4)} AS arc4 FROM lu14),
       |e0t AS (SELECT user_id, vs, n,
       |  list_transform(generate_series(1, n), ti ->
       |    CASE WHEN ti >= 5 THEN vs[ti::INT] - $e0Pred ELSE 0.0::DOUBLE END) AS e0
       |  FROM arc),
       |g2 AS (SELECT user_id, vs, n, [
       |    $m2Flat] AS m FROM e0t),
       |$lu2Steps,
       |x0 AS (SELECT user_id, vs, n, ${xs2(0)} AS ph0, ${xs2(1)} AS th0, ${xs2(2)} AS cc0 FROM lu22),
       |sim0 AS (SELECT user_id, vs, n, [
       |  ph0, th0, cc0, ${css("ph0", "th0", "cc0")},
       |  ph0 + 0.05, th0, cc0, ${css("ph0 + 0.05", "th0", "cc0")},
       |  ph0, th0 + 0.05, cc0, ${css("ph0", "th0 + 0.05", "cc0")},
       |  ph0, th0, cc0 + 0.05, ${css("ph0", "th0", "cc0 + 0.05")},
       |  0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE,
       |  0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE] AS s0
       |  FROM x0),
       |nmr AS (SELECT user_id, vs, n, list_reduce(
       |    list_prepend(s0, list_transform(generate_series(0, ${3 * 300 - 1}), s -> [s::DOUBLE])),
       |    (acc, x) -> $step) AS nm
       |  FROM sim0),
       |best AS (SELECT user_id, vs, n, ${bestSel(d, 1)} AS pp, ${bestSel(d, 2)} AS tt,
       |  ${bestSel(d, 3)} AS cc FROM nmr),
       |el AS (SELECT user_id, vs, n, pp, tt, cc,
       |  list_reduce(list_prepend([0.0::DOUBLE],
       |    list_transform(generate_series(2, n), t -> [t::DOUBLE])),
       |    (a, x) -> [vs[(x[1])::INT] - (((cc) + (pp)*vs[(x[1])::INT - 1]) + (tt)*a[1])])[1] AS elast
       |  FROM best),
       |fcl AS (SELECT user_id, [${fcExprs.mkString(",\n  ")}] AS fc FROM el),
       |fstab AS (SELECT user_id, any_value(fc) AS fc FROM fcl GROUP BY user_id),
       |lastt AS (SELECT user_id, max(us) AS us FROM o GROUP BY user_id),
       |d AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, us, lag(us) OVER (PARTITION BY user_id ORDER BY us) AS lus FROM o)
       |  WHERE lus IS NOT NULL GROUP BY user_id)
       |SELECT f.user_id, s.step::BIGINT AS step,
       |  make_timestamp(l.us + s.step * d.freq) AS ts,
       |  round(f.fc[(s.step)::INT] + 1e-9, 6) AS y_hat
       |FROM fstab f JOIN lastt l USING (user_id) JOIN d USING (user_id)
       |CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS step) s""".stripMargin
  }

  /** css objective applied to 3 coordinate expressions built by `cf`. */
  private def sse3(css: (String, String, String) => String, cf: Int => String): String =
    css(cf(1), cf(2), cf(3))

  /** Generic uniform-shape Nelder-Mead step expression (the machinery
    * armaSql/dampedHoltSql established): (d+3)(d+1) constant slots —
    * simplex points, reflection, candidate — advanced by a 3-phase
    * position-CASE list constructor; convergence freezes by value.
    * `sseOf` builds the objective SQL from d coordinate expressions. */
  private[graft] def nmStepExpr(d: Int, sseOf: Seq[String] => String): String = {
    val k1 = d + 1; val L = (d + 3) * k1
    def coord(p: Int, c: Int) = s"acc[${p * k1 + c}]"
    def fOf(p: Int) = s"acc[${(p + 1) * k1}]"
    val R = (d + 1) * k1; val C = (d + 2) * k1
    def reflC(c: Int) = s"acc[${R + c}]"
    val fr = s"acc[${R + k1}]"
    def candC(c: Int) = s"acc[${C + c}]"
    val fcand = s"acc[${C + k1}]"
    def rank(p: Int) = "(" + (0 to d).filter(_ != p).map { q =>
      if (q < p) s"(CASE WHEN ${fOf(q)} <= ${fOf(p)} THEN 1 ELSE 0 END)"
      else s"(CASE WHEN ${fOf(q)} < ${fOf(p)} THEN 1 ELSE 0 END)"
    }.mkString(" + ") + ")"
    def sel(s: Int, c: Int) = "(CASE " + (0 to d).map { p =>
      val v = if (c <= d) coord(p, c) else fOf(p)
      s"WHEN ${rank(p)} = $s THEN $v"
    }.mkString(" ") + " ELSE 0.0::DOUBLE END)"
    def cA(c: Int) = "(" + (0 until d).map(s => s"${sel(s, c)}/$d.0").mkString(" + ") + ")"
    def reflA(c: Int) = s"(${cA(c)} + (${cA(c)} - ${sel(d, c)}))"
    val p0 = (0 to d).flatMap(s => (1 to d).map(c => sel(s, c)) :+ sel(s, d + 1)) ++
      (1 to d).map(reflA) :+ sseOf((1 to d).map(reflA)) :++ (1 to k1).map(c => s"acc[${C + c}]")
    def cS(c: Int) = "(" + (0 until d).map(p => s"${coord(p, c)}/$d.0").mkString(" + ") + ")"
    def expA(c: Int) = s"(${cS(c)} + 2.0*(${cS(c)} - ${coord(d, c)}))"
    def conA(c: Int) = s"(${cS(c)} + 0.5*(${coord(d, c)} - ${cS(c)}))"
    def cand(c: Int) =
      s"(CASE WHEN $fr < ${fOf(0)} THEN ${expA(c)} WHEN $fr < ${fOf(d - 1)} THEN 0.0::DOUBLE ELSE ${conA(c)} END)"
    val p1 = (1 to R + k1).map(k => s"acc[$k]") ++ (1 to d).map(cand) :+
      s"CASE WHEN $fr < ${fOf(0)} THEN ${sseOf((1 to d).map(expA))} WHEN $fr < ${fOf(d - 1)} THEN 1e308::DOUBLE ELSE ${sseOf((1 to d).map(conA))} END"
    val shrink = s"(NOT $fr < ${fOf(0)} AND NOT $fr < ${fOf(d - 1)} AND NOT $fcand < ${fOf(d)})"
    def shr(p: Int, c: Int) = s"(${coord(0, c)} + 0.5*(${coord(p, c)} - ${coord(0, c)}))"
    def w3(c: Int) =
      s"(CASE WHEN $fr < ${fOf(0)} THEN (CASE WHEN $fcand < $fr THEN ${candC(c)} ELSE ${reflC(c)} END) WHEN $fr < ${fOf(d - 1)} THEN ${reflC(c)} WHEN $fcand < ${fOf(d)} THEN ${candC(c)} ELSE 0.0::DOUBLE END)"
    def w3f =
      s"(CASE WHEN $fr < ${fOf(0)} THEN (CASE WHEN $fcand < $fr THEN $fcand ELSE $fr END) WHEN $fr < ${fOf(d - 1)} THEN $fr WHEN $fcand < ${fOf(d)} THEN $fcand ELSE 0.0::DOUBLE END)"
    val p2 = ((1 to k1).map(k => s"acc[$k]") ++
      (1 until d).flatMap(p =>
        (1 to d).map(c => s"CASE WHEN $shrink THEN ${shr(p, c)} ELSE ${coord(p, c)} END") :+
          s"CASE WHEN $shrink THEN ${sseOf((1 to d).map(c => shr(p, c)))} ELSE ${fOf(p)} END") ++
      (1 to d).map(c => s"CASE WHEN $shrink THEN ${shr(d, c)} ELSE ${w3(c)} END") :+
      s"CASE WHEN $shrink THEN ${sseOf((1 to d).map(c => shr(d, c)))} ELSE $w3f END") ++
      (1 to 2 * k1).map(k => s"acc[${R + k}]")
    val fVals = (0 to d).map(fOf)
    val frozen = "greatest(" + fVals.mkString(", ") + ") - least(" + fVals.mkString(", ") + ") <= 1e-9"
    require(p0.length == L && p1.length == L && p2.length == L,
      s"phase lengths ${p0.length}/${p1.length}/${p2.length} != $L")
    "[" + (1 to L).map { k =>
      s"CASE WHEN $frozen THEN acc[$k] WHEN (x[1])::INT % 3 = 0 THEN ${p0(k - 1)} WHEN (x[1])::INT % 3 = 1 THEN ${p1(k - 1)} ELSE ${p2(k - 1)} END"
    }.mkString(", ") + "]"
  }

  /** Init-simplex list literal for [[nmStepExpr]]: x0 plus per-axis
    * step offsets, each with its objective, padded with refl/cand zeros. */
  private[graft] def nmInitList(d: Int, x0: Seq[String], step: Double,
      sseOf: Seq[String] => String): String = {
    val pts = x0 +: (0 until d).map(i =>
      x0.zipWithIndex.map { case (v, j) => if (j == i) s"$v + $step" else v })
    (pts.flatMap(p => p :+ sseOf(p)) ++ Seq.fill(2 * (d + 1))("0.0::DOUBLE"))
      .mkString(",\n  ")
  }

  /** One partial-pivot Gaussian-elimination step (ArimaLite.solve col k)
    * over the flat n×(n+1) augmented list in column `col`: first-argmax
    * pivot (strict > update ⇒ first max wins), row swap, elimination of
    * columns k..n for rows > k, |pivot| ≤ 1e-12 skips elimination. */
  private[graft] def luStepExpr(col: String, n: Int, k: Int): String = {
    val w = n + 1
    def m(r: String, c: String) = s"$col[(($r))*$w + (($c)) + 1]"
    val piv = "(CASE " + (k until n).map { r =>
      val conds = (k until n).filter(_ != r)
        .map(q => s"abs(${m(r.toString, k.toString)}) >= abs(${m(q.toString, k.toString)})")
      val cond = if (conds.isEmpty) "TRUE" else conds.mkString(" AND ")
      s"WHEN $cond THEN $r"
    }.mkString(" ") + s" ELSE ${n - 1} END)"
    val src = s"(CASE WHEN (t // $w) = $k THEN $piv WHEN (t // $w) = $piv THEN $k ELSE (t // $w)::INT END)"
    val base = m(src, s"t % $w")
    val dd = m(piv, k.toString)
    val baseRK = m(src, k.toString)
    val baseKC = m(piv, s"t % $w")
    s"""list_transform(generate_series(0, ${n * w - 1}), t ->
       |    CASE WHEN (t // $w) <= $k THEN $base
       |         WHEN (t % $w) < $k THEN $base
       |         WHEN abs($dd) > 1e-12 THEN $base - (($baseRK)/($dd)) * ($baseKC)
       |         ELSE $base END)""".stripMargin
  }

  /** Paired-CTE partial-pivot elimination for larger systems: per column
    * k emits a pivot-select CTE (`{p}p$k`) and an elimination CTE
    * (`{p}e$k`) so the O(n²)-text pivot expression appears once per step
    * instead of once per matrix element (at n=12 the inline form would
    * be tens of MB of SQL). Input CTE `src` must expose the flat
    * n×(n+1) list as column `m`; extra columns in `carry` pass through. */
  private[graft] def luChainCtes(p: String, n: Int, src: String, carry: String): String = {
    val w = n + 1
    def m(r: String, c: String) = s"m[(($r))*$w + (($c)) + 1]"
    (0 until n).map { k =>
      val piv = "(CASE " + (k until n).map { r =>
        val conds = (k until n).filter(_ != r)
          .map(q => s"abs(${m(r.toString, k.toString)}) >= abs(${m(q.toString, k.toString)})")
        val cond = if (conds.isEmpty) "TRUE" else conds.mkString(" AND ")
        s"WHEN $cond THEN $r"
      }.mkString(" ") + s" ELSE ${n - 1} END)"
      val srcCte = if (k == 0) src else s"${p}e${k - 1}"
      val sr = s"(CASE WHEN (t // $w) = $k THEN pv WHEN (t // $w) = pv THEN $k ELSE (t // $w)::INT END)"
      val base = m(sr, s"t % $w")
      val dd = m("pv", k.toString)
      val baseRK = m(sr, k.toString)
      val baseKC = m("pv", s"t % $w")
      s"""${p}p$k AS (SELECT $carry, m, $piv AS pv FROM $srcCte),
         |${p}e$k AS (SELECT $carry, list_transform(generate_series(0, ${n * w - 1}), t ->
         |    CASE WHEN (t // $w) <= $k THEN $base
         |         WHEN (t % $w) < $k THEN $base
         |         WHEN abs($dd) > 1e-12 THEN $base - (($baseRK)/($dd)) * ($baseKC)
         |         ELSE $base END) AS m FROM ${p}p$k)""".stripMargin
    }.mkString(",\n")
  }

  /** Linear back-substitution CTE chain over `{luPrefix}e{n-1}`: emits
    * CTEs `{p}b{n-1}..{p}b0`, each adding solved coefficient `xc$r`. */
  private[graft] def backSubChain(p: String, n: Int, luLast: String, carry: String): String = {
    val w = n + 1
    def m(r: Int, c: Int) = s"m[${r * w + c + 1}]"
    (n - 1 to 0 by -1).map { r =>
      val src = if (r == n - 1) luLast else s"${p}b${r + 1}"
      var s = m(r, n)
      for (c <- r + 1 until n) s = s"($s - ${m(r, c)}*xc$c)"
      val e = s"(CASE WHEN abs(${m(r, r)}) > 1e-12 THEN ($s) / ${m(r, r)} ELSE 0.0::DOUBLE END)"
      val keep = if (r == n - 1) s"$carry, m" else s"$carry, m, ${(r + 1 until n).map(c => s"xc$c").mkString(", ")}"
      s"""${p}b$r AS (SELECT $keep, $e AS xc$r FROM $src)""".stripMargin
    }.mkString(",\n")
  }

  /** Back-substitution expressions x(0..n−1) over the eliminated flat
    * list in `col`, replaying ArimaLite.solve's ascending-c subtraction
    * order and zero-pivot guard. */
  private[graft] def luBackSub(col: String, n: Int): Seq[String] = {
    val w = n + 1
    def m(r: Int, c: Int) = s"$col[${r * w + c + 1}]"
    val xs = new Array[String](n)
    for (r <- n - 1 to 0 by -1) {
      var s = m(r, n)
      for (c <- r + 1 until n) s = s"($s - ${m(r, c)}*${xs(c)})"
      xs(r) = s"(CASE WHEN abs(${m(r, r)}) > 1e-12 THEN ($s) / ${m(r, r)} ELSE 0.0::DOUBLE END)"
    }
    xs.toSeq
  }

  /** Stable-argmin coordinate extractor over the 4-point simplex stored
    * in column `nm` (first-min tie-break, matching Scala minBy). */
  private[graft] def bestSel(d: Int, c: Int): String = {
    val k1 = d + 1
    def f(p: Int) = s"nm[${(p + 1) * k1}]"
    def x(p: Int) = s"nm[${p * k1 + c}]"
    "(CASE " + (0 until d).map { p =>
      val conds = ((p + 1) to d).map(q => s"${f(p)} <= ${f(q)}").mkString(" AND ")
      s"WHEN $conds THEN ${x(p)}"
    }.mkString(" ") + s" ELSE ${x(d)} END)"
  }

  // ── auto-ETS (Arima.autoEtsForecast, m=24): SES α by the theta
  // golden-section fold; Holt by a d=2 Nelder-Mead; additive HW by a
  // d=3 Nelder-Mead over a 27-slot [l, t, sea₁..₂₄, sse] state; AICc
  // (first-min) selects. Series shorter than 2m+3 skip the HW leg via
  // n-guards (min sf0.01 length is 49 < 51, so the guard is live). ─────
  /** auto-ETS oracle: pinned smoothing weights + model choice when
    * [[OraclePins]] is set, full golden-section + 2×NM replay otherwise. */
  def autoEtsSql: String = OraclePins.autoEts
    .map(autoEtsSqlPinned(_, s"WHERE user_id < $NmSubsetUsers"))
    .getOrElse(autoEtsSqlFull)

  /** ts_auto_ets_fc_e2e: full-panel twin from the `autoEtsFull` pins the
    * SCUM oracle already computes (r12; was rows-only). */
  def autoEtsE2eSql(pins: Seq[(Long, graft.kernels.Arima.AutoEtsFit)]): String =
    autoEtsSqlPinned(pins, "")

  /** Pinned variant: SES α, Holt (α, β), HW (α, β, γ) and the AICc choice
    * fitted in Scala; SQL replays only the winner-relevant smoothing state
    * recursions (each one O(n) fold) and the 7-step forecast. */
  private def autoEtsSqlPinned(pins: Seq[(Long, graft.kernels.Arima.AutoEtsFit)],
                               filter: String): String = {
    // 26-slot HW state fold [l, t, sea1..24] (legacy 27th SSE slot dropped
    // — selection is pinned, the SSE is no longer needed)
    val hwFoldP: String = {
      val sea = "a[((yy[2])::INT) + 3]"
      val newL = s"(wa*(yy[1] - $sea) + (1.0::DOUBLE - wa)*(a[1] + a[2]))"
      val seaSlots = (0 until 24).map(j =>
        s"CASE WHEN (yy[2])::INT = $j THEN wg*(yy[1] - $newL) + (1.0::DOUBLE - wg)*a[${j + 3}] ELSE a[${j + 3}] END").mkString(", ")
      s"""list_reduce(list_prepend(list_concat([avg1, (avg2 - avg1)/24.0], list_transform(generate_series(1, 24), i -> vs[i::INT] - avg1)), list_transform(generate_series(25, n), ti -> [vs[ti::INT], ((ti - 1) % 24)::DOUBLE])), (a, yy) -> [$newL, wb*($newL - a[1]) + (1.0::DOUBLE - wb)*a[2], $seaSlots])"""
    }
    val fcCases = (1 to 7).map { s =>
      s"""CASE WHEN ch = 0 THEN sesl
         | WHEN ch = 1 THEN hl + $s.0*ht
         | ELSE hw[1] + $s.0*hw[2] + hw[((n - 1 + $s) % 24) + 3] END""".stripMargin
    }.mkString(",\n  ")
    val rows = pins.map { case (u, f) =>
      Seq(s"$u::BIGINT", s"${f.choice}::INT", s"${dlit(f.sesAlpha)}::DOUBLE",
        s"${dlit(f.holtAlpha)}::DOUBLE", s"${dlit(f.holtBeta)}::DOUBLE",
        s"${dlit(f.hwAlpha)}::DOUBLE", s"${dlit(f.hwBeta)}::DOUBLE",
        s"${dlit(f.hwGamma)}::DOUBLE")
    }
    s"""WITH ${pinsCte("pins", Seq("user_id", "ch", "salpha", "ha", "hb", "wa", "wb", "wg"), rows)},
       |o AS (SELECT user_id, value, epoch_us(ts) AS us,
       |  row_number() OVER ($W) AS rn FROM events $filter),
       |v AS (SELECT user_id, list(value ORDER BY rn) AS vs, count(*)::INT AS n
       |  FROM o GROUP BY user_id),
       |av AS (SELECT user_id, vs, n,
       |  list_reduce(vs[1:24], (aa, bb) -> aa + bb)/24.0 AS avg1,
       |  list_reduce(vs[25:48], (aa, bb) -> aa + bb)/24.0 AS avg2 FROM v),
       |j AS (SELECT user_id, vs, n, avg1, avg2, ch, salpha, ha, hb, wa, wb, wg
       |  FROM av JOIN pins USING (user_id)),
       |fits AS (SELECT user_id, n, ch,
       |  list_reduce(list_prepend([vs[1]], list_transform(vs[2:], w -> [w])),
       |    (a, y2) -> [salpha*y2[1] + (1.0::DOUBLE - salpha)*a[1]])[1] AS sesl,
       |  list_reduce(list_prepend([vs[1], vs[2] - vs[1]], list_transform(vs[2:], w -> [w, 0.0::DOUBLE])),
       |    (a, yy) -> [ha*yy[1] + (1.0::DOUBLE - ha)*(a[1] + a[2]), hb*((ha*yy[1] + (1.0::DOUBLE - ha)*(a[1] + a[2])) - a[1]) + (1.0::DOUBLE - hb)*a[2]]) AS hstate,
       |  CASE WHEN n >= 51 THEN $hwFoldP ELSE NULL END AS hw
       |  FROM j),
       |fcl AS (SELECT user_id, [
       |  $fcCases] AS fc
       |  FROM (SELECT user_id, n, ch, sesl, hstate[1] AS hl, hstate[2] AS ht, hw FROM fits)),
       |fstab AS (SELECT user_id, any_value(fc) AS fc FROM fcl GROUP BY user_id),
       |lastt AS (SELECT user_id, max(us) AS us FROM o GROUP BY user_id),
       |d AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, us, lag(us) OVER (PARTITION BY user_id ORDER BY us) AS lus FROM o)
       |  WHERE lus IS NOT NULL GROUP BY user_id)
       |SELECT f.user_id, s.step::BIGINT AS step,
       |  make_timestamp(l.us + s.step * d.freq) AS ts,
       |  round(f.fc[(s.step)::INT] + 1e-9, 6) AS y_hat
       |FROM fstab f JOIN lastt l USING (user_id) JOIN d USING (user_id)
       |CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS step) s""".stripMargin
  }

  private[graft] val autoEtsSqlFull: String = {
    def logit(p: String) = s"(1.0::DOUBLE/(1.0::DOUBLE + exp(-($p))))"
    // Holt one-step SSE (no damping): fold [l, t, sse] over y(1)..y(n−1)
    def holtSse(cs: Seq[String]): String = {
      val A = logit(cs(0)); val B = logit(cs(1))
      val newL = s"$A*yy[1] + (1.0::DOUBLE - $A)*(a[1] + a[2])"
      s"""list_reduce(list_prepend([vs[1], vs[2] - vs[1], 0.0::DOUBLE], list_transform(vs[2:], w -> [w, 0.0::DOUBLE, 0.0::DOUBLE])), (a, yy) -> [$newL, $B*(($newL) - a[1]) + (1.0::DOUBLE - $B)*a[2], a[3] + (yy[1] - (a[1] + a[2]))*(yy[1] - (a[1] + a[2]))])[3]"""
    }
    // HW state fold: 27 slots [l, t, sea1..24, sse]; elements [y(t), t%24]
    def hwFold(cs: Seq[String]): String = {
      val A = logit(cs(0)); val B = logit(cs(1)); val G = logit(cs(2))
      val sea = "a[((yy[2])::INT) + 3]"
      val newL = s"($A*(yy[1] - $sea) + (1.0::DOUBLE - $A)*(a[1] + a[2]))"
      val seaSlots = (0 until 24).map(j =>
        s"CASE WHEN (yy[2])::INT = $j THEN $G*(yy[1] - $newL) + (1.0::DOUBLE - $G)*a[${j + 3}] ELSE a[${j + 3}] END").mkString(", ")
      val e = s"(yy[1] - ((a[1] + a[2]) + $sea))"
      s"""list_reduce(list_prepend(list_concat([avg1, (avg2 - avg1)/24.0], list_concat(list_transform(generate_series(1, 24), i -> vs[i::INT] - avg1), [0.0::DOUBLE])), list_transform(generate_series(25, n), ti -> [vs[ti::INT], ((ti - 1) % 24)::DOUBLE])), (a, yy) -> [$newL, $B*($newL - a[1]) + (1.0::DOUBLE - $B)*a[2], $seaSlots, a[27] + $e*$e])"""
    }
    def hwSse(cs: Seq[String]) = s"(${hwFold(cs)})[27]"
    // AICc: nEff·ln(max(sse/nEff, 1e-300)) + 2k + small-sample term
    def aicc(sse: String, k: Int) =
      s"(CASE WHEN (n - 1) - $k - 1 > 0 THEN (n - 1)*ln(greatest(($sse)/(n - 1), 1e-300)) + ${2.0 * k} + ${2.0 * k * (k + 1)}/((n - 1) - $k - 1.0) ELSE 1e308::DOUBLE END)"
    val holtStep = nmStepExpr(2, holtSse)
    val hwStep = nmStepExpr(3, hwSse)
    val holtInit = nmInitList(2, Seq("0.0::DOUBLE", "-2.0::DOUBLE"), 0.5, holtSse)
    val hwInit = nmInitList(3, Seq("0.0::DOUBLE", "-2.0::DOUBLE", "-2.0::DOUBLE"), 0.5, hwSse)
    // stable-argmin extraction of the best NM point (bestSel over nm col)
    val gsAlpha = "((g[1] + g[2])/2.0)"
    val fcCases = (1 to 7).map { s =>
      s"""CASE WHEN ch = 0 THEN sesl
         | WHEN ch = 1 THEN hl + $s.0*ht
         | ELSE hw[1] + $s.0*hw[2] + hw[((n - 1 + $s) % 24) + 3] END""".stripMargin
    }.mkString(",\n  ")
    s"""WITH o AS (SELECT user_id, value, epoch_us(ts) AS us,
       |  row_number() OVER ($W) AS rn FROM events WHERE user_id < $NmSubsetUsers),
       |v AS (SELECT user_id, list(value ORDER BY rn) AS vs, count(*)::INT AS n
       |  FROM o GROUP BY user_id),
       |av AS (SELECT user_id, vs, n,
       |  list_reduce(vs[1:24], (aa, bb) -> aa + bb)/24.0 AS avg1,
       |  list_reduce(vs[25:48], (aa, bb) -> aa + bb)/24.0 AS avg2 FROM v),
       |gs AS (SELECT user_id, vs, n, avg1, avg2,
       |  list_reduce(
       |    list_prepend(
       |      [0.01::DOUBLE, 0.99::DOUBLE, $c0, $d0,
       |       ${sesSse(c0, "vs")},
       |       ${sesSse(d0, "vs")}],
       |      list_transform(generate_series(1, 40), i -> [i::DOUBLE])),
       |    (acc, x) -> CASE WHEN acc[5] < acc[6]
       |      THEN [acc[1], acc[4], $newC, acc[3], ${sesSse(newC, "vs")}, acc[5]]
       |      ELSE [acc[3], acc[2], acc[4], $newD, acc[6], ${sesSse(newD, "vs")}]
       |    END) AS g
       |  FROM av),
       |sescand AS (SELECT user_id, vs, n, avg1, avg2,
       |  ${sesSse(gsAlpha, "vs")} AS ses_sse,
       |  list_reduce(
       |    list_prepend([vs[1]], list_transform(vs[2:], w -> [w])),
       |    (a, y2) -> [($gsAlpha)*y2[1] + (1.0::DOUBLE - $gsAlpha)*a[1]])[1] AS sesl
       |  FROM gs),
       |nmh AS (SELECT user_id, vs, n, avg1, avg2, ses_sse, sesl, list_reduce(
       |    list_prepend([$holtInit], list_transform(generate_series(0, ${3 * 150 - 1}), s -> [s::DOUBLE])),
       |    (acc, x) -> $holtStep) AS nm
       |  FROM sescand),
       |hpars AS (SELECT user_id, vs, n, avg1, avg2, ses_sse, sesl,
       |  ${bestSel(2, 1)} AS hpa, ${bestSel(2, 2)} AS hpb FROM nmh),
       |nmw AS (SELECT user_id, vs, n, avg1, avg2, ses_sse, sesl, hpa, hpb, list_reduce(
       |    list_prepend([$hwInit], list_transform(generate_series(0, ${3 * 200 - 1}), s -> [s::DOUBLE])),
       |    (acc, x) -> $hwStep) AS nm
       |  FROM hpars),
       |wpars AS (SELECT user_id, vs, n, avg1, avg2, ses_sse, sesl, hpa, hpb,
       |  ${bestSel(3, 1)} AS wpa, ${bestSel(3, 2)} AS wpb, ${bestSel(3, 3)} AS wpg FROM nmw),
       |cands AS (SELECT user_id, vs, n, avg1, avg2, ses_sse, sesl, hpa, hpb, wpa, wpb, wpg,
       |  ${holtSse(Seq("hpa", "hpb"))} AS holt_sse,
       |  CASE WHEN n >= 51 THEN ${hwSse(Seq("wpa", "wpb", "wpg"))} ELSE 1e308::DOUBLE END AS hw_sse
       |  FROM wpars),
       |pick AS (SELECT user_id, vs, n, avg1, avg2, sesl, hpa, hpb, wpa, wpb, wpg,
       |  CASE WHEN ${aicc("ses_sse", 2)} <= ${aicc("holt_sse", 4)}
       |         AND ${aicc("ses_sse", 2)} <= (CASE WHEN n >= 51 THEN ${aicc("hw_sse", 29)} ELSE 1e308 END) THEN 0
       |       WHEN ${aicc("holt_sse", 4)} <= (CASE WHEN n >= 51 THEN ${aicc("hw_sse", 29)} ELSE 1e308 END) THEN 1
       |       ELSE 2 END AS ch
       |  FROM cands),
       |fits AS (SELECT user_id, n, ch, sesl,
       |  list_reduce(list_prepend([vs[1], vs[2] - vs[1]], list_transform(vs[2:], w -> [w, 0.0::DOUBLE])),
       |    (a, yy) -> [${logit("hpa")}*yy[1] + (1.0::DOUBLE - ${logit("hpa")})*(a[1] + a[2]), ${logit("hpb")}*((${logit("hpa")}*yy[1] + (1.0::DOUBLE - ${logit("hpa")})*(a[1] + a[2])) - a[1]) + (1.0::DOUBLE - ${logit("hpb")})*a[2]]) AS hstate,
       |  CASE WHEN n >= 51 THEN ${hwFold(Seq("wpa", "wpb", "wpg"))} ELSE NULL END AS hw
       |  FROM pick),
       |fcl AS (SELECT user_id, [
       |  $fcCases] AS fc
       |  FROM (SELECT user_id, n, ch, sesl, hstate[1] AS hl, hstate[2] AS ht, hw FROM fits)),
       |fstab AS (SELECT user_id, any_value(fc) AS fc FROM fcl GROUP BY user_id),
       |lastt AS (SELECT user_id, max(us) AS us FROM o GROUP BY user_id),
       |d AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, us, lag(us) OVER (PARTITION BY user_id ORDER BY us) AS lus FROM o)
       |  WHERE lus IS NOT NULL GROUP BY user_id)
       |SELECT f.user_id, s.step::BIGINT AS step,
       |  make_timestamp(l.us + s.step * d.freq) AS ts,
       |  round(f.fc[(s.step)::INT] + 1e-9, 6) AS y_hat
       |FROM fstab f JOIN lastt l USING (user_id) JOIN d USING (user_id)
       |CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS step) s""".stripMargin
  }

  // ── GARCH(1,1) (Garch.fitForecast over first-difference returns):
  // d=3 Nelder-Mead on the Gaussian NLL via the shared uniform fold.
  // The Scala mid-loop σ²≤0 bail is unreachable once the ω>0, α,β≥0,
  // α+β<1 guard passes (σ² ≥ ω > 0 inductively), so the fold needs no
  // early exit. ────────────────────────────────────────────────────────
  /** GARCH(1,1) oracle: pinned MLE params when [[OraclePins]] is set. */
  def garchSql: String = OraclePins.garch
    .map(garchSqlPinned(_, s"WHERE user_id < $NmSubsetUsers"))
    .getOrElse(garchSqlFull)

  /** ts_garch_e2e: full-panel twin from full-panel pins (r12; was
    * rows-only). */
  def garchE2eSql(pins: Seq[(Long, Double, Double, Double)]): String =
    garchSqlPinned(pins, "")

  /** Pinned variant: (ω, α, β) fitted in Scala; SQL replays the returns
    * construction, in-sample σ² refold and the 5-step forecast only. */
  private def garchSqlPinned(pins: Seq[(Long, Double, Double, Double)],
                             filter: String): String = {
    val sExprs = {
      var cur = "(om + al*rl[nr]*rl[nr] + be*sig2)"
      (1 to 5).map { s =>
        if (s > 1) cur = s"(om + (al + be)*$cur)"
        cur
      }
    }
    val sigList = sExprs.map(e => s"sqrt(greatest($e, 0.0))").mkString(",\n  ")
    val rows = pins.map { case (u, om, al, be) =>
      Seq(s"$u::BIGINT", s"${dlit(om)}::DOUBLE", s"${dlit(al)}::DOUBLE", s"${dlit(be)}::DOUBLE")
    }
    s"""WITH ${pinsCte("pins", Seq("user_id", "om", "al", "be"), rows)},
       |o AS (SELECT user_id, value, epoch_us(ts) AS us,
       |  row_number() OVER ($W) AS rn FROM events $filter),
       |v AS (SELECT user_id, list(value ORDER BY rn) AS vs, count(*)::INT AS n
       |  FROM o GROUP BY user_id),
       |r AS (SELECT user_id, n - 1 AS nr,
       |  list_transform(generate_series(1, n - 1), i -> vs[i::INT + 1] - vs[i::INT]) AS rl
       |  FROM v),
       |vu AS (SELECT user_id, nr, rl,
       |  list_reduce(list_prepend(0.0::DOUBLE, list_transform(rl, x -> x*x)), (aa, bb) -> aa + bb) / nr AS varu
       |  FROM r),
       |best AS (SELECT user_id, nr, rl, varu, om, al, be FROM vu JOIN pins USING (user_id)),
       |sfin AS (SELECT user_id, nr, rl, om, al, be,
       |  list_reduce(list_prepend([varu], list_transform(generate_series(2, nr), t -> [t::DOUBLE])),
       |    (a, x) -> [om + al*rl[(x[1])::INT - 1]*rl[(x[1])::INT - 1] + be*a[1]])[1] AS sig2
       |  FROM best),
       |fcl AS (SELECT user_id, om, al, be, [
       |  $sigList] AS fc FROM sfin),
       |fstab AS (SELECT user_id, any_value(om) AS om, any_value(al) AS al,
       |  any_value(be) AS be, any_value(fc) AS fc FROM fcl GROUP BY user_id)
       |SELECT f.user_id, round(f.om + 1e-9, 6) AS omega, round(f.al + 1e-9, 6) AS alpha,
       |  round(f.be + 1e-9, 6) AS beta, s.step::INT AS step,
       |  round(f.fc[(s.step)::INT] + 1e-9, 6) AS sigma
       |FROM fstab f
       |CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS step) s""".stripMargin
  }

  private[graft] val garchSqlFull: String = {
    def nllOf(cs: Seq[String]): String = {
      val om = cs(0); val al = cs(1); val be = cs(2)
      val S = s"(CASE WHEN (yy[2])::INT > 1 THEN ($om) + ($al)*rl[(yy[2])::INT - 1]*rl[(yy[2])::INT - 1] + ($be)*a[1] ELSE a[1] END)"
      s"""(CASE WHEN ($om) <= 0.0 OR ($al) < 0.0 OR ($be) < 0.0 OR ($al) + ($be) >= 1.0 THEN 1e12::DOUBLE ELSE list_reduce(list_prepend([varu, 0.0::DOUBLE], list_transform(generate_series(1, nr), t -> [rl[t::INT], t::DOUBLE])), (a, yy) -> [$S, a[2] + 0.5*((ln(2.0*pi()) + ln($S)) + rl[(yy[2])::INT]*rl[(yy[2])::INT]/($S))])[2] END)"""
    }
    val step = nmStepExpr(3, nllOf)
    val init = nmInitList(3, Seq("0.1*varu", "0.1::DOUBLE", "0.8::DOUBLE"), 0.05, nllOf)
    // h=5 variance recursion as scalar chain (σ from the full refold)
    val sExprs = {
      var cur = "(om + al*rl[nr]*rl[nr] + be*sig2)"
      (1 to 5).map { s =>
        if (s > 1) cur = s"(om + (al + be)*$cur)"
        cur
      }
    }
    val sigList = sExprs.map(e => s"sqrt(greatest($e, 0.0))").mkString(",\n  ")
    s"""WITH o AS (SELECT user_id, value, epoch_us(ts) AS us,
       |  row_number() OVER ($W) AS rn FROM events WHERE user_id < $NmSubsetUsers),
       |v AS (SELECT user_id, list(value ORDER BY rn) AS vs, count(*)::INT AS n
       |  FROM o GROUP BY user_id),
       |r AS (SELECT user_id, n - 1 AS nr,
       |  list_transform(generate_series(1, n - 1), i -> vs[i::INT + 1] - vs[i::INT]) AS rl
       |  FROM v),
       |vu AS (SELECT user_id, nr, rl,
       |  list_reduce(list_prepend(0.0::DOUBLE, list_transform(rl, x -> x*x)), (aa, bb) -> aa + bb) / nr AS varu
       |  FROM r),
       |nmr AS (SELECT user_id, nr, rl, varu, list_reduce(
       |    list_prepend([$init], list_transform(generate_series(0, ${3 * 400 - 1}), s -> [s::DOUBLE])),
       |    (acc, x) -> $step) AS nm
       |  FROM vu),
       |best AS (SELECT user_id, nr, rl, varu,
       |  ${bestSel(3, 1)} AS om, ${bestSel(3, 2)} AS al, ${bestSel(3, 3)} AS be FROM nmr),
       |sfin AS (SELECT user_id, nr, rl, om, al, be,
       |  list_reduce(list_prepend([varu], list_transform(generate_series(2, nr), t -> [t::DOUBLE])),
       |    (a, x) -> [om + al*rl[(x[1])::INT - 1]*rl[(x[1])::INT - 1] + be*a[1]])[1] AS sig2
       |  FROM best),
       |fcl AS (SELECT user_id, om, al, be, [
       |  $sigList] AS fc FROM sfin),
       |fstab AS (SELECT user_id, any_value(om) AS om, any_value(al) AS al,
       |  any_value(be) AS be, any_value(fc) AS fc FROM fcl GROUP BY user_id)
       |SELECT f.user_id, round(f.om + 1e-9, 6) AS omega, round(f.al + 1e-9, 6) AS alpha,
       |  round(f.be + 1e-9, 6) AS beta, s.step::INT AS step,
       |  round(f.fc[(s.step)::INT] + 1e-9, 6) AS sigma
       |FROM fstab f
       |CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS step) s""".stripMargin
  }

  // ── GP posterior (fixed hyperparameters, Matérn32(1,12) + Periodic
  // (0.5,1,24), noise 0.1): K augmented with [y_n, k*₁..k*₅] and solved
  // by one dynamic-size Gauss-Jordan fold per series; mean/variance then
  // fold over the solution columns. Spark solves by Cholesky — same PD
  // system, agreement within the round-6 nudge. ────────────────────────
  val gpSql: String = {
    def ker(a: String, b: String) =
      s"""(1.0::DOUBLE * (1.0::DOUBLE + sqrt(3.0::DOUBLE) * abs(($a) - ($b)) / 12.0) * exp(-sqrt(3.0::DOUBLE) * abs(($a) - ($b)) / 12.0) + 0.5::DOUBLE * exp(-2.0::DOUBLE * sin(pi() * (($a) - ($b)) / 24.0) * sin(pi() * (($a) - ($b)) / 24.0) / 1.0))"""
    val z = "%.17g".format(math.sqrt(2.0) * graft.kernels.Bayesian.inverseErf(0.9))
    val w = "(n + 6)"
    s"""WITH o AS (SELECT user_id, value, epoch_us(ts) AS us,
       |  row_number() OVER ($W) AS rn FROM events),
       |v AS (SELECT user_id, list(value ORDER BY rn) AS vs, count(*)::INT AS n
       |  FROM o GROUP BY user_id),
       |m1 AS (SELECT user_id, vs, n, list_reduce(vs, (a, b) -> a + b) / n AS mu FROM v),
       |m2 AS (SELECT user_id, vs, n, mu,
       |  CASE WHEN sqrt(list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(vs, x -> (x - mu) * (x - mu))), (a, b) -> a + b) / n) < 1e-10
       |    THEN 1.0::DOUBLE
       |    ELSE sqrt(list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(vs, x -> (x - mu) * (x - mu))), (a, b) -> a + b) / n)
       |  END AS sd FROM m1),
       |m3 AS (SELECT user_id, n, mu, sd,
       |  list_transform(vs, x -> (x - mu) / sd) AS yn FROM m2),
       |aug AS (SELECT user_id, n, mu, sd, yn,
       |  flatten(list_transform(generate_series(0, n - 1), i ->
       |    list_transform(generate_series(0, n + 5), j ->
       |      CASE WHEN j < n THEN ${ker("i", "j")}
       |          + (CASE WHEN i = j THEN 0.1::DOUBLE + 1e-10 ELSE 0.0::DOUBLE END)
       |        WHEN j = n THEN yn[(i)::INT + 1]
       |        ELSE ${ker("i", "n + (j - n - 1)")}
       |      END))) AS a
       |  FROM m3),
       |sol AS (SELECT user_id, n, mu, sd, list_reduce(
       |    list_prepend(a, list_transform(generate_series(0, n - 1), k -> [k::DOUBLE])),
       |    (acc, x) -> list_transform(generate_series(0, n * $w - 1), t ->
       |      CASE WHEN (t // $w) = (x[1])::INT
       |        THEN acc[(t)::INT + 1] / acc[((x[1])::INT * $w + (x[1])::INT)::INT + 1]
       |        ELSE acc[(t)::INT + 1]
       |          - acc[((t // $w) * $w + (x[1])::INT)::INT + 1]
       |          * acc[((x[1])::INT * $w + (t % $w))::INT + 1]
       |          / acc[((x[1])::INT * $w + (x[1])::INT)::INT + 1]
       |      END)) AS sl
       |  FROM aug),
       |fcv AS (SELECT user_id, n, mu, sd, s.step,
       |  list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(generate_series(0, n - 1), i ->
       |      ${ker("i", "n + (s.step - 1)")} * sl[((i) * $w + n)::INT + 1])), (a, b) -> a + b) AS pm,
       |  list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(generate_series(0, n - 1), i ->
       |      ${ker("i", "n + (s.step - 1)")} * sl[((i) * $w + n + s.step)::INT + 1])), (a, b) -> a + b) AS quad
       |  FROM sol CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS step) s),
       |res AS (SELECT user_id, step,
       |  pm * sd + mu AS yh,
       |  sqrt(greatest(1.5::DOUBLE + 0.1::DOUBLE - quad, 1e-12) * sd * sd) AS psd
       |  FROM fcv),
       |lastt AS (SELECT user_id, max(us) AS us FROM o GROUP BY user_id),
       |d AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, us, lag(us) OVER (PARTITION BY user_id ORDER BY us) AS lus FROM o)
       |  WHERE lus IS NOT NULL GROUP BY user_id)
       |SELECT r.user_id, r.step::BIGINT AS step,
       |  make_timestamp(l.us + r.step * d.freq) AS ts,
       |  round(r.yh + 1e-9, 6) AS y_hat,
       |  round(r.yh - $z * r.psd + 1e-9, 6) AS y_hat_lower,
       |  round(r.yh + $z * r.psd + 1e-9, 6) AS y_hat_upper
       |FROM res r JOIN lastt l USING (user_id) JOIN d USING (user_id)""".stripMargin
  }

  // ── agglomerative (average linkage, cut at k=3) over the 60-series
  // SBD subset: the merge chain replays as a 2-phase fold on a flat
  // [d (n²) | active (n) | size (n) | parent (n)] state — phase 0
  // appends the lexicographic-min (d, lo, hi) active pair (matching the
  // Scala nearest-cache tie-breaks, which reduce to exactly that order),
  // phase 1 applies the Lance-Williams average update, deactivates hi,
  // and truncates. Labels = dense rank of each point's parent-chain root
  // (roots are min member indexes, matching the Scala numbering). ──────
  val agglomerativeSql: String = {
    val n = 60
    val n2 = n * n
    val len = n2 + 3 * n
    // flat offsets (0-based): active n²+i, size n²+n+i, parent n²+2n+i
    val A = s"(acc[$len + 2])::INT"  // appended best-pair lo
    val B = s"(acc[$len + 3])::INT"  // appended best-pair hi
    // the non-A endpoint of the pair row/col under update
    val oth = s"(CASE WHEN (t // $n) = $A THEN (t % $n)::INT ELSE (t // $n)::INT END)"
    val bestTriple =
      s"""list_min(list_transform(generate_series(0, ${n2 - 1}), pi ->
         |      CASE WHEN (pi // $n) < (pi % $n)
         |        AND acc[($n2 + pi // $n)::INT + 1] = 1.0 AND acc[($n2 + pi % $n)::INT + 1] = 1.0
         |        THEN [acc[(pi)::INT + 1], (pi // $n)::DOUBLE, (pi % $n)::DOUBLE]
         |        ELSE [1e308::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE] END))""".stripMargin
    s"""WITH RECURSIVE $sbdSymPrefix,
       |dmat AS (SELECT list(y.d ORDER BY sa.sidx, sb.sidx) AS dl
       |  FROM sym y JOIN si sa ON sa.user_id = y.ua JOIN si sb ON sb.user_id = y.ub),
       |init AS (SELECT list_concat(list_concat(list_concat(dl,
       |    list_transform(generate_series(1, $n), i -> 1.0::DOUBLE)),
       |    list_transform(generate_series(1, $n), i -> 1.0::DOUBLE)),
       |    list_transform(generate_series(1, $n), i -> (i - 1)::DOUBLE)) AS st
       |  FROM dmat),
       |fin AS (SELECT list_reduce(
       |    list_prepend(st, list_transform(generate_series(0, ${2 * (n - 3) - 1}), s -> [s::DOUBLE])),
       |    (acc, x) -> CASE (x[1])::INT % 2
       |      WHEN 0 THEN list_concat(acc, $bestTriple)
       |      ELSE list_transform(generate_series(0, ${len - 1}), t ->
       |        CASE
       |          WHEN t < $n2 AND (t // $n) < (t % $n)
       |            AND ((t // $n) = $A OR (t % $n) = $A)
       |            AND ($oth) <> $B
       |            AND acc[($n2 + ($oth))::INT + 1] = 1.0
       |          THEN (acc[(least($A, $oth) * $n + greatest($A, $oth))::INT + 1] * acc[($n2 + $n + $A)::INT + 1]
       |            + acc[(least($B, $oth) * $n + greatest($B, $oth))::INT + 1] * acc[($n2 + $n + $B)::INT + 1])
       |            / (acc[($n2 + $n + $A)::INT + 1] + acc[($n2 + $n + $B)::INT + 1])
       |          WHEN t = $n2 + $B THEN 0.0::DOUBLE
       |          WHEN t = $n2 + $n + $A THEN acc[(t)::INT + 1] + acc[($n2 + $n + $B)::INT + 1]
       |          WHEN t = $n2 + 2 * $n + $B THEN ($A)::DOUBLE
       |          ELSE acc[(t)::INT + 1]
       |        END)
       |    END) AS st
       |  FROM init),
       |par AS (SELECT i::INT AS i, st[($n2 + 2 * $n + i)::INT + 1]::INT AS p
       |  FROM (SELECT unnest(generate_series(0, ${n - 1})) AS i), fin),
       |chain AS (
       |  SELECT i AS orig, i AS cur FROM par
       |  UNION ALL
       |  SELECT c.orig, p.p FROM chain c JOIN par p ON p.i = c.cur WHERE p.p <> c.cur
       |),
       |roots AS (SELECT orig, min(cur) AS root FROM chain GROUP BY orig),
       |lab2 AS (SELECT orig, (dense_rank() OVER (ORDER BY root) - 1)::INT AS cluster FROM roots)
       |SELECT si.user_id, l.cluster
       |FROM si JOIN lab2 l ON l.orig = si.sidx""".stripMargin
  }

  // ── full feature pipeline (Pipeline.fitPipeline lags 1-3, rolling 12,
  // calendar hour/day_of_week, fourier (24,2), encode_id): pooled 12×12
  // ridge Gram + the paired-CTE LU replay, then per-series recursion
  // with feature rebuild (rolling window over the forecast path,
  // calendar/fourier of future timestamps). Fit and forecast use
  // DIFFERENT float orders for the fourier angle — both replayed. ──────
  val pipelineSql: String = {
    val p = 12
    def fitFour(kk: Int) =
      s"((2.0*pi()*$kk.0)/24.0) * ((ti - 1)::DOUBLE)"
    val fitX: Seq[String] = Seq(
      "vs[(ti - 1)::INT]",
      "vs[(ti - 2)::INT]",
      "vs[(ti - 3)::INT]",
      "(list_reduce(list_prepend(0.0::DOUBLE, vs[greatest(1, (ti - 12)::INT):(ti - 1)::INT]), (aa, bb) -> aa + bb) / least(12, ti - 1))",
      "hour(make_timestamp(uss[ti::INT]))::DOUBLE",
      "isodow(make_timestamp(uss[ti::INT]))::DOUBLE",
      s"sin(${fitFour(1)})", s"cos(${fitFour(1)})",
      s"sin(${fitFour(2)})", s"cos(${fitFour(2)})",
      "idm",
      "1.0::DOUBLE")
    val gramSums = ((for (i <- 0 until p; j <- i until p) yield
      s"sum(x$i * x$j) AS s$i$j") ++
      (0 until p).map(i => s"sum(x$i * y) AS bb$i")).mkString(",\n  ")
    def sRef(i: Int, j: Int) = {
      val base = if (i <= j) s"s$i$j" else s"s$j$i"
      if (i == j && i < p - 1) s"($base + 0.001)" else base
    }
    val flat = (for (i <- 0 until p; j <- 0 to p) yield
      if (j < p) sRef(i, j) else s"bb$i").mkString(", ")
    // forecast recursion: path most-recent-first over l1..l12 then m1..m5
    var path = (1 to 12).map(k => s"l$k").toList
    val medSteps = (1 to 5).map { s =>
      val roll = "(" + path.take(12).reverse.mkString(" + ") + ") / 12.0"
      def fcFour(kk: Int) = s"(((2.0*pi())*$kk.0)*((n + $s - 1)::DOUBLE))/24.0"
      val xs = Seq(path(0), path(1), path(2), s"($roll)",
        s"hour(make_timestamp(lastus + $s*freq))::DOUBLE",
        s"isodow(make_timestamp(lastus + $s*freq))::DOUBLE",
        s"sin(${fcFour(1)})", s"cos(${fcFour(1)})",
        s"sin(${fcFour(2)})", s"cos(${fcFour(2)})",
        "idm", "1.0::DOUBLE")
      val pred = xs.zipWithIndex
        .foldLeft("0.0::DOUBLE") { case (acc, (x, i)) => s"($acc + ($x)*xc$i)" }
      path = s"m$s" :: path
      val src = if (s == 1) "base" else s"mp${s - 1}"
      s"mp$s AS (SELECT q.*, $pred AS m$s FROM $src q)"
    }.mkString(",\n")
    val tailsCols = (1 to 12).map(k =>
      s"max(CASE WHEN rrn = $k THEN value END) AS l$k").mkString(",\n  ")
    s"""WITH o AS (SELECT user_id, value, epoch_us(ts) AS us,
       |  row_number() OVER ($W) AS rn FROM events),
       |v AS (SELECT user_id, list(value ORDER BY rn) AS vs,
       |  list(us ORDER BY rn) AS uss, count(*)::INT AS n FROM o GROUP BY user_id),
       |idm0 AS (SELECT user_id, avg(value) AS idm FROM events GROUP BY user_id),
       |rr AS (SELECT v.user_id, vs, uss, n, idm, unnest(generate_series(4, n)) AS ti
       |  FROM v JOIN idm0 USING (user_id)),
       |f AS (SELECT user_id, ${fitX.zipWithIndex.map { case (e, i) => s"$e AS x$i" }.mkString(",\n  ")},
       |  vs[ti::INT] AS y FROM rr),
       |g AS (SELECT
       |  $gramSums
       |  FROM f),
       |m0 AS (SELECT 1 AS du, [$flat] AS m FROM g),
       |${luChainCtes("lu", p, "m0", "1 AS du")},
       |${backSubChain("lu", p, s"lue${p - 1}", "1 AS du")},
       |tails AS (SELECT user_id,
       |  $tailsCols
       |  FROM (SELECT user_id, value, row_number() OVER
       |    (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rrn FROM events)
       |  WHERE rrn <= 12 GROUP BY user_id),
       |meta AS (SELECT user_id, max(us) AS lastus, count(*)::INT AS n FROM o GROUP BY user_id),
       |d AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, us, lag(us) OVER (PARTITION BY user_id ORDER BY us) AS lus FROM o)
       |  WHERE lus IS NOT NULL GROUP BY user_id),
       |base AS (SELECT t.user_id, t.l1, t.l2, t.l3, t.l4, t.l5, t.l6, t.l7, t.l8,
       |  t.l9, t.l10, t.l11, t.l12, m.lastus, m.n, dd.freq, i.idm,
       |  ${(0 until p).map(i => s"c.xc$i").mkString(", ")}
       |  FROM tails t JOIN meta m USING (user_id) JOIN d dd USING (user_id)
       |  JOIN idm0 i USING (user_id) CROSS JOIN lub0 c),
       |$medSteps
       |SELECT f.user_id, s.step::BIGINT AS step,
       |  make_timestamp(f.lastus + s.step * f.freq) AS ts,
       |  round((CASE s.step WHEN 1 THEN f.m1 WHEN 2 THEN f.m2 WHEN 3 THEN f.m3
       |    WHEN 4 THEN f.m4 ELSE f.m5 END) + 1e-9, 6) AS y_hat
       |FROM mp5 f
       |CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS step) s""".stripMargin
  }

  // ── Bayesian VAR(2) (Bayesian.bvarForecast, ridge λ=0.1): same GJ
  // solve as varSql with λ on the diagonal, plus per-equation residual
  // scale and √(s+1)-widened z intervals (z baked from the Winitzki
  // inverseErf the Spark side uses). ───────────────────────────────────
  val bvarSql: String = bvarSqlGen(_ => "0.1", (_, _) => "")

  /** Minnesota-prior BVAR replay (ts_bvar_minnesota_fc): the pinned
    * V₀⁻¹ diagonal replaces λ, and the random-walk prior mean adds
    * v0inv(k−1) to the XᵀY entry of equation k's own first lag
    * (V₀⁻¹·B₀ᵀ has that single non-zero per column). */
  def bvarMinnesotaSql(v0inv: Array[Double]): String =
    bvarSqlGen(i => dlit(v0inv(i)),
      (i, k) => if (i == k - 1) s" + ${dlit(v0inv(i))}" else "")

  private def bvarSqlGen(diagAdd: Int => String,
      rhsAdd: (Int, Int) => String): String = {
    val xs = Seq("l11", "l12", "l13", "l21", "l22", "l23")
    val gSums = (for (i <- 0 to 6; j <- i to 6) yield {
      val e =
        if (i < 6 && j < 6) s"sum(${xs(i)} * ${xs(j)})"
        else if (i < 6) s"sum(${xs(i)})"
        else "count(*)::DOUBLE"
      s"$e AS s$i$j"
    }).mkString(",\n  ")
    val bSums = (for (i <- 0 to 6; k <- 1 to 3) yield {
      val e = if (i < 6) s"sum(${xs(i)} * y$k)" else s"sum(y$k)"
      s"$e AS b$i$k"
    }).mkString(",\n  ")
    def sRef(i: Int, j: Int) =
      (if (i <= j) s"s$i$j" else s"s$j$i") +
        (if (i == j) s" + ${diagAdd(i)}" else "")
    val xList = (for (i <- 0 to 6; j <- 0 to 6) yield sRef(i, j)).mkString(", ")
    val bList =
      (for (i <- 0 to 6; k <- 1 to 3) yield s"b$i$k${rhsAdd(i, k)}").mkString(", ")
    val betaCols = (for (i <- 0 to 6; k <- 1 to 3) yield
      s"max(val) FILTER (i = $i AND k = $k) AS c$i$k").mkString(",\n  ")
    def pr(k: Int) =
      (0 to 5).map(i => s"acc[${i + 1}] * bc.c$i$k").mkString(" + ") + s" + bc.c6$k"
    def prRow(k: Int) =
      (0 to 5).map(i => s"${xs(i)} * bc.c$i$k").mkString(" + ") + s" + bc.c6$k"
    val z = "%.17g".format(math.sqrt(2.0) * graft.kernels.Bayesian.inverseErf(0.9))
    val et = (r: Int) => s"(SELECT event_type FROM ets WHERE rk = $r)"
    s"""WITH ets AS (SELECT event_type, row_number() OVER (ORDER BY event_type) AS rk
       |  FROM (SELECT DISTINCT event_type FROM events)),
       |wide AS (SELECT date_trunc('day', ts) AS d,
       |  coalesce(avg(value) FILTER (event_type = ${et(1)}), 0.0) AS v1,
       |  coalesce(avg(value) FILTER (event_type = ${et(2)}), 0.0) AS v2,
       |  coalesce(avg(value) FILTER (event_type = ${et(3)}), 0.0) AS v3
       |  FROM events GROUP BY 1),
       |o AS (SELECT v1, v2, v3, row_number() OVER (ORDER BY d) AS rn FROM wide),
       |r AS (SELECT a.v1 AS y1, a.v2 AS y2, a.v3 AS y3,
       |  b.v1 AS l11, b.v2 AS l12, b.v3 AS l13,
       |  c.v1 AS l21, c.v2 AS l22, c.v3 AS l23
       |  FROM o a JOIN o b ON b.rn = a.rn - 1 JOIN o c ON c.rn = a.rn - 2),
       |g AS (SELECT
       |  $gSums,
       |  $bSums,
       |  count(*)::INT AS nrows
       |  FROM r),
       |xmat AS (SELECT (t.k // 7)::INT AS i, (t.k % 7)::INT AS j,
       |    [$xList][t.k::INT + 1] AS val
       |  FROM (SELECT unnest(generate_series(0, 48)) AS k) t, g),
       |${ReconcileOracle.gjInvCtes("xinv", "xmat", 7)},
       |bvec AS (SELECT (t.k // 3)::INT AS j, (t.k % 3 + 1)::INT AS k,
       |    [$bList][t.k::INT + 1] AS val
       |  FROM (SELECT unnest(generate_series(0, 20)) AS k) t, g),
       |betas AS (SELECT x.i, bv.k, sum(x.val * bv.val) AS val
       |  FROM xinv x JOIN bvec bv ON bv.j = x.j GROUP BY x.i, bv.k),
       |bc AS (SELECT
       |  $betaCols
       |  FROM betas),
       |sdr AS (SELECT
       |  sqrt(sum((y1 - (${prRow(1)}))*(y1 - (${prRow(1)})))/greatest(g.nrows - 7, 1)) AS sd1,
       |  sqrt(sum((y2 - (${prRow(2)}))*(y2 - (${prRow(2)})))/greatest(g.nrows - 7, 1)) AS sd2,
       |  sqrt(sum((y3 - (${prRow(3)}))*(y3 - (${prRow(3)})))/greatest(g.nrows - 7, 1)) AS sd3
       |  FROM r, bc, g GROUP BY g.nrows),
       |hist AS (SELECT
       |  [p1.v1, p1.v2, p1.v3, p2.v1, p2.v2, p2.v3] AS h
       |  FROM (SELECT * FROM o WHERE rn = (SELECT max(rn) FROM o)) p1,
       |       (SELECT * FROM o WHERE rn = (SELECT max(rn) - 1 FROM o)) p2),
       |fc AS (SELECT list_reduce(
       |    list_prepend(h, list_transform(generate_series(1, 5), s -> [s::DOUBLE])),
       |    (acc, x) -> list_concat(
       |      [${pr(1)}, ${pr(2)}, ${pr(3)}, acc[1], acc[2], acc[3]],
       |      list_concat(acc[7:], [${pr(1)}, ${pr(2)}, ${pr(3)}]))) AS f
       |  FROM hist, bc)
       |SELECT s.step::INT AS step,
       |  (SELECT event_type FROM ets WHERE rk = s.k) AS variable,
       |  round(f[(6 + (s.step - 1) * 3 + s.k)::INT] + 1e-9, 6) AS y_hat,
       |  round(f[(6 + (s.step - 1) * 3 + s.k)::INT]
       |    - $z * (CASE s.k WHEN 1 THEN sd.sd1 WHEN 2 THEN sd.sd2 ELSE sd.sd3 END) * sqrt(s.step::DOUBLE) + 1e-9, 6) AS y_hat_lower,
       |  round(f[(6 + (s.step - 1) * 3 + s.k)::INT]
       |    + $z * (CASE s.k WHEN 1 THEN sd.sd1 WHEN 2 THEN sd.sd2 ELSE sd.sd3 END) * sqrt(s.step::DOUBLE) + 1e-9, 6) AS y_hat_upper
       |FROM fc, sdr sd,
       |  (SELECT a.step, b.k FROM (SELECT unnest(generate_series(1, 5)) AS step) a,
       |    (SELECT unnest(generate_series(1, 3)) AS k) b) s""".stripMargin
  }

  // ── synthetic control (Causal.solveScWeights + syntheticControl):
  // 1000 projected-gradient iterations replayed as a 3-phase fold —
  // phase 0 takes the gradient step (each element computes its own
  // gradient coordinate), phase 1 appends the Duchi simplex-projection
  // threshold θ ONCE to the accumulator (SQL has no let-binding, so a θ
  // inlined into a per-element lambda would re-evaluate per element),
  // phase 2 applies max(v − θ, 0). Donor order is user-id order; the
  // Spark side's collect order differs only in ~1e-15 float reordering,
  // which the contractive iteration keeps below the round-6 nudge. ─────
  val syntheticControlSql: String = {
    // R(ii): residual y − D·w at pre-time ii (acc = current w)
    def R(ii: String) =
      s"""(yl[($ii)::INT + 1] - list_reduce(list_prepend(0.0::DOUBLE,
         |            list_transform(generate_series(0, nd - 1), jj -> dl[(($ii) * nd + jj)::INT + 1] * acc[(jj)::INT + 1])), (a, b) -> a + b))""".stripMargin
    val G =
      s"""(-2.0 * list_reduce(list_prepend(0.0::DOUBLE,
         |            list_transform(generate_series(0, np - 1), ii -> dl[((ii) * nd + (j))::INT + 1] * ${R("ii")})), (a, b) -> a + b))""".stripMargin
    val rho =
      """list_max(list_transform(generate_series(1, nd), i -> CASE WHEN list_reverse_sort(acc)[i::INT] - (list_reduce(list_reverse_sort(acc)[1:i::INT], (a, b) -> a + b) - 1.0)/i > 0 THEN i ELSE 0 END))"""
    val theta =
      s"""((list_reduce(list_reverse_sort(acc)[1:($rho)::INT], (a, b) -> a + b) - 1.0) / ($rho))"""
    s"""WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, avg(value) AS y
       |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
       |fullg AS (SELECT d FROM daily GROUP BY d
       |  HAVING count(DISTINCT user_id) = (SELECT count(DISTINCT user_id) FROM daily)),
       |ev AS (SELECT daily.* FROM daily JOIN fullg USING (d)),
       |cut AS (SELECT ((floor(quantile_cont(epoch_us(d), 0.8) / 1000.0))::BIGINT * 1000) AS ius FROM ev),
       |grid AS (SELECT d, (row_number() OVER (ORDER BY d) - 1)::INT AS ti
       |  FROM (SELECT DISTINCT d FROM ev)),
       |dims AS (SELECT (SELECT count(*) FROM grid)::INT AS nt,
       |  (SELECT count(DISTINCT user_id)::INT - 1 FROM ev) AS nd,
       |  (SELECT count(*) FROM grid g, cut c WHERE epoch_us(g.d) < c.ius)::INT AS np),
       |y0 AS (SELECT list(e.y ORDER BY g.ti) AS yl FROM ev e JOIN grid g USING (d)
       |  WHERE e.user_id = 0),
       |dm AS (SELECT list(e.y ORDER BY g.ti, e.user_id) AS dl
       |  FROM ev e JOIN grid g USING (d) WHERE e.user_id <> 0),
       |pars AS (SELECT 1.0 / greatest(2.0 * list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(generate_series(1, np * nd), t -> dl[t::INT] * dl[t::INT])), (a, b) -> a + b), 1e-12) AS step,
       |  nt, nd, np, yl, dl FROM dm, dims, y0),
       |wfin AS (SELECT nt, nd, np, dl, yl, list_reduce(
       |    list_prepend(list_transform(generate_series(1, nd), j -> 1.0::DOUBLE / nd),
       |      list_transform(generate_series(0, 2999), s -> [s::DOUBLE])),
       |    (acc, x) -> CASE (x[1])::INT % 3
       |      WHEN 0 THEN list_transform(generate_series(0, nd - 1), j -> acc[(j)::INT + 1] - step * $G)
       |      WHEN 1 THEN list_append(acc, $theta)
       |      ELSE list_transform(generate_series(0, nd - 1), j -> greatest(acc[(j)::INT + 1] - acc[nd + 1], 0.0))
       |    END) AS wl
       |  FROM pars),
       |cf AS (SELECT g.d, g.ti,
       |    w.yl[g.ti + 1] AS observed,
       |    list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(generate_series(0, w.nd - 1), j -> w.wl[(j)::INT + 1] * w.dl[(g.ti * w.nd + j)::INT + 1])), (a, b) -> a + b) AS cfv
       |  FROM grid g CROSS JOIN wfin w)
       |SELECT make_timestamp(epoch_us(c.d)) AS ts,
       |  round(c.observed + 1e-9, 6) AS observed,
       |  round(c.cfv + 1e-9, 6) AS counterfactual,
       |  round(c.observed - c.cfv + 1e-9, 6) AS effect,
       |  CASE WHEN epoch_us(c.d) < cut.ius THEN 'pre' ELSE 'post' END AS period
       |FROM cf c, cut""".stripMargin
  }

  // ── VAR(2) on the 3 first event-type daily means: XᵀX solved by the
  // shared Gauss-Jordan fold (ReconcileOracle.gjInvCtes), recursion as a
  // growing single-row fold. Mirrors VarModels.fit/forecast. ───────────
  val varSql: String = {
    // X columns 0..6 = [y1_{t-1}, y2_{t-1}, y3_{t-1}, y1_{t-2}, y2_{t-2}, y3_{t-2}, 1]
    val xs = Seq("l11", "l12", "l13", "l21", "l22", "l23")
    def prod(a: String, b: String) = s"sum($a * $b)"
    val gSums = (for (i <- 0 to 6; j <- i to 6) yield {
      val e =
        if (i < 6 && j < 6) prod(xs(i), xs(j))
        else if (i < 6) s"sum(${xs(i)})"
        else "count(*)::DOUBLE"
      s"$e AS s$i$j"
    }).mkString(",\n  ")
    val bSums = (for (i <- 0 to 6; k <- 1 to 3) yield {
      val e = if (i < 6) prod(xs(i), s"y$k") else s"sum(y$k)"
      s"$e AS b$i$k"
    }).mkString(",\n  ")
    def sRef(i: Int, j: Int) = if (i <= j) s"s$i$j" else s"s$j$i"
    val xList = (for (i <- 0 to 6; j <- 0 to 6) yield sRef(i, j)).mkString(", ")
    val bList = (for (i <- 0 to 6; k <- 1 to 3) yield s"b$i$k").mkString(", ")
    val betaCols = (for (i <- 0 to 6; k <- 1 to 3) yield
      s"max(val) FILTER (i = $i AND k = $k) AS c$i$k").mkString(",\n  ")
    def pr(k: Int) =
      (0 to 5).map(i => s"acc[${i + 1}] * bc.c$i$k").mkString(" + ") + s" + bc.c6$k"
    val et = (r: Int) => s"(SELECT event_type FROM ets WHERE rk = $r)"
    s"""WITH ets AS (SELECT event_type, row_number() OVER (ORDER BY event_type) AS rk
       |  FROM (SELECT DISTINCT event_type FROM events)),
       |wide AS (SELECT date_trunc('day', ts) AS d,
       |  coalesce(avg(value) FILTER (event_type = ${et(1)}), 0.0) AS v1,
       |  coalesce(avg(value) FILTER (event_type = ${et(2)}), 0.0) AS v2,
       |  coalesce(avg(value) FILTER (event_type = ${et(3)}), 0.0) AS v3
       |  FROM events GROUP BY 1),
       |o AS (SELECT v1, v2, v3, row_number() OVER (ORDER BY d) AS rn FROM wide),
       |r AS (SELECT a.v1 AS y1, a.v2 AS y2, a.v3 AS y3,
       |  b.v1 AS l11, b.v2 AS l12, b.v3 AS l13,
       |  c.v1 AS l21, c.v2 AS l22, c.v3 AS l23
       |  FROM o a JOIN o b ON b.rn = a.rn - 1 JOIN o c ON c.rn = a.rn - 2),
       |g AS (SELECT
       |  $gSums,
       |  $bSums
       |  FROM r),
       |xmat AS (SELECT (t.k // 7)::INT AS i, (t.k % 7)::INT AS j,
       |    [$xList][t.k::INT + 1] AS val
       |  FROM (SELECT unnest(generate_series(0, 48)) AS k) t, g),
       |${ReconcileOracle.gjInvCtes("xinv", "xmat", 7)},
       |bvec AS (SELECT (t.k // 3)::INT AS j, (t.k % 3 + 1)::INT AS k,
       |    [$bList][t.k::INT + 1] AS val
       |  FROM (SELECT unnest(generate_series(0, 20)) AS k) t, g),
       |betas AS (SELECT x.i, bv.k, sum(x.val * bv.val) AS val
       |  FROM xinv x JOIN bvec bv ON bv.j = x.j GROUP BY x.i, bv.k),
       |bc AS (SELECT
       |  $betaCols
       |  FROM betas),
       |hist AS (SELECT
       |  [p1.v1, p1.v2, p1.v3, p2.v1, p2.v2, p2.v3] AS h
       |  FROM (SELECT * FROM o WHERE rn = (SELECT max(rn) FROM o)) p1,
       |       (SELECT * FROM o WHERE rn = (SELECT max(rn) - 1 FROM o)) p2),
       |fc AS (SELECT list_reduce(
       |    list_prepend(h, list_transform(generate_series(1, 5), s -> [s::DOUBLE])),
       |    (acc, x) -> list_concat(
       |      [${pr(1)}, ${pr(2)}, ${pr(3)}, acc[1], acc[2], acc[3]],
       |      list_concat(acc[7:], [${pr(1)}, ${pr(2)}, ${pr(3)}]))) AS f
       |  FROM hist, bc)
       |SELECT s.step::BIGINT AS step,
       |  round(f[(6 + (s.step - 1) * 3 + 1)::INT] + 1e-9, 6) AS var_1,
       |  round(f[(6 + (s.step - 1) * 3 + 2)::INT] + 1e-9, 6) AS var_2,
       |  round(f[(6 + (s.step - 1) * 3 + 3)::INT] + 1e-9, 6) AS var_3
       |FROM fc, (SELECT unnest(generate_series(1, 5)) AS step) s""".stripMargin
  }
}
