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
}
