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
}
