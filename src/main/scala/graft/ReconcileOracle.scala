package graft

/** DuckDB oracle SQL for the covariance / projection reconciliation tier
  * (reference polars_ts/reconciliation.py:41-590).
  *
  * MinT-OLS is oracled at the full hierarchy via the Woodbury identity:
  * the summing structure S = [A; I] gives SᵀS = I + U·Uᵀ where
  * U = [1, 1_g0, 1_g1, 1_g2] has only 4 columns (total + 3 groups), so
  *
  *   (SᵀS)⁻¹ = I − U (I₄ + UᵀU)⁻¹ Uᵀ
  *
  * and the whole m×m projection reduces to group sums plus a 4×4 Cramer
  * inverse — exact rational linear algebra DuckDB replays independently
  * of the Spark side's breeze `inv`.
  *
  * PERMBU / MinT-CV need the inverse of a dense empirical covariance (no
  * low-rank structure), so those oracles replay Gauss-Jordan elimination
  * as single-row `list_reduce` folds over a flat augmented matrix. The
  * oracled queries pin a [[CovSubsetUsers]]-bottom hierarchy to keep the
  * fold size (34² flat list × 34 pivot steps) tractable; `_e2e` variants
  * run the full panel rows-only.
  */
object ReconcileOracle {

  /** Bottom-node count for the oracled covariance-reconciliation queries
    * (SparkEntry reads this too, so query and oracle cannot drift). */
  val CovSubsetUsers = 30L

  private val W = "PARTITION BY user_id ORDER BY ts, event_id"

  /** Naive-forecast CTE prefix shared with the ts_reconcile_bu oracle:
    * per-user last value carried over a 7-step future grid. */
  private def naiveFcCtes(userFilter: String = "TRUE"): String =
    s"""o AS (SELECT user_id, value, epoch_us(ts) AS us,
       |  row_number() OVER ($W) AS rn,
       |  count(*) OVER (PARTITION BY user_id) AS n
       |  FROM events WHERE $userFilter),
       |lastv AS (SELECT user_id, us, value FROM o WHERE rn = n),
       |d AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, us, lag(us) OVER (PARTITION BY user_id ORDER BY us) AS lus FROM o)
       |  WHERE lus IS NOT NULL GROUP BY user_id),
       |fc AS (SELECT l.user_id, make_timestamp(l.us + s.step * d.freq) AS ts,
       |  l.value AS y_hat FROM lastv l JOIN d USING (user_id)
       |  CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS step) s),
       |tsgrid AS (SELECT DISTINCT ts FROM fc),
       |users AS (SELECT DISTINCT user_id FROM o)""".stripMargin

  /** OLS MinTrace at the full total→g{0,1,2}→user hierarchy. */
  val mintSql: String = {
    // C = I₄ + UᵀU over columns (total, g0, g1, g2); counts are data-derived
    val c = Array(
      Array("(n + 1.0)", "n0", "n1", "n2"),
      Array("n0", "(n0 + 1.0)", "0.0", "0.0"),
      Array("n1", "0.0", "(n1 + 1.0)", "0.0"),
      Array("n2", "0.0", "0.0", "(n2 + 1.0)"))
    val b = Array("zt", "z0", "z1", "z2")
    val v = ForecastOracle.cramer(c, b)
    s"""WITH ${naiveFcCtes()},
       |cnt AS (SELECT count(*)::DOUBLE AS n,
       |  sum(CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END)::DOUBLE AS n0,
       |  sum(CASE WHEN user_id % 3 = 1 THEN 1 ELSE 0 END)::DOUBLE AS n1,
       |  sum(CASE WHEN user_id % 3 = 2 THEN 1 ELSE 0 END)::DOUBLE AS n2 FROM users),
       |up AS (SELECT ts, sum(y_hat) AS ytot,
       |  coalesce(sum(y_hat) FILTER (user_id % 3 = 0), 0.0) AS yg0,
       |  coalesce(sum(y_hat) FILTER (user_id % 3 = 1), 0.0) AS yg1,
       |  coalesce(sum(y_hat) FILTER (user_id % 3 = 2), 0.0) AS yg2
       |  FROM fc GROUP BY ts),
       |z AS (SELECT u.user_id, g.ts,
       |  coalesce(f.y_hat, 0.0) +
       |  (CASE u.user_id % 3 WHEN 0 THEN up.yg0 WHEN 1 THEN up.yg1 ELSE up.yg2 END) +
       |  up.ytot AS zb
       |  FROM users u CROSS JOIN tsgrid g
       |  JOIN up ON up.ts = g.ts
       |  LEFT JOIN fc f ON f.user_id = u.user_id AND f.ts = g.ts),
       |zs AS (SELECT ts, sum(zb) AS zt,
       |  coalesce(sum(zb) FILTER (user_id % 3 = 0), 0.0) AS z0,
       |  coalesce(sum(zb) FILTER (user_id % 3 = 1), 0.0) AS z1,
       |  coalesce(sum(zb) FILTER (user_id % 3 = 2), 0.0) AS z2
       |  FROM z GROUP BY ts),
       |v AS (SELECT ts, ${v(0)} AS vt, ${v(1)} AS v0, ${v(2)} AS v1, ${v(3)} AS v2
       |  FROM zs, cnt),
       |ub AS (SELECT z.user_id, z.ts,
       |  z.zb - v.vt - (CASE z.user_id % 3 WHEN 0 THEN v.v0 WHEN 1 THEN v.v1 ELSE v.v2 END) AS u
       |  FROM z JOIN v ON v.ts = z.ts)
       |SELECT user_id::VARCHAR AS unique_id, ts, round(u + 1e-9, 6) AS y_hat FROM ub
       |UNION ALL
       |SELECT 'g' || (user_id % 3)::VARCHAR, ts, round(sum(u) + 1e-9, 6) FROM ub
       |  GROUP BY user_id % 3, ts
       |UNION ALL
       |SELECT 'total', ts, round(sum(u) + 1e-9, 6) FROM ub GROUP BY ts""".stripMargin
  }

  private val NB = CovSubsetUsers.toInt // bottoms
  private val NN = NB + 4               // nodes: total=0, g0..g2=1..3, bottom u=4+u

  /** Gauss-Jordan inversion of the n×n matrix in CTE `src(i, j, val)`
    * (all n² entries present) as a single-row flat-list fold; emits CTEs
    * `{p}_flat/{p}_aug/{p}_gj/{p}` where `{p}(i, j, val)` is the inverse.
    * No pivoting — the inputs here are PD (shrunk covariances and their
    * SᵀW⁻¹S Grams), where leading minors are bounded away from zero.
    * Safe-shape notes (DuckDB 1.0 lambda engine): single row, fixed-size
    * accumulator, step = one pure list_transform — the shapes the PELT
    * oracle established as reliable. */
  private[graft] def gjInvCtes(p: String, src: String, n: Int): String = {
    val w = 2 * n
    def idx(e: String) = s"($e)::INT + 1"
    val piv = idx(s"(x[1])::INT * $w + (x[1])::INT")
    s"""${p}_flat AS (SELECT list(val ORDER BY i, j) AS m FROM $src),
       |${p}_aug AS (SELECT flatten(list_transform(generate_series(0, ${n - 1}), i ->
       |    list_transform(generate_series(0, ${w - 1}), j ->
       |      CASE WHEN j < $n THEN m[(i * $n + j)::INT + 1]
       |           WHEN j = i + $n THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END))) AS a
       |  FROM ${p}_flat),
       |${p}_gj AS (SELECT list_reduce(
       |    list_prepend(a, list_transform(generate_series(0, ${n - 1}), k -> [k::DOUBLE])),
       |    (acc, x) -> list_transform(generate_series(0, ${n * w - 1}), t ->
       |      CASE WHEN (t // $w) = (x[1])::INT
       |        THEN acc[${idx("t")}] / acc[$piv]
       |        ELSE acc[${idx("t")}]
       |          - acc[${idx(s"(t // $w) * $w + (x[1])::INT")}]
       |          * acc[${idx(s"(x[1])::INT * $w + (t % $w)")}]
       |          / acc[$piv]
       |      END)) AS a
       |  FROM ${p}_aug),
       |$p AS (SELECT gi.i::INT AS i, gj.j::INT AS j,
       |    g.a[(gi.i * $w + $n + gj.j)::INT + 1] AS val
       |  FROM (SELECT unnest(generate_series(0, ${n - 1})) AS i) gi
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${n - 1})) AS j) gj
       |  CROSS JOIN ${p}_gj g)""".stripMargin
  }

  /** Shared pipeline: given CTE `wmat(i, j, val)` = the shrunk covariance
    * over the $NN-node subset hierarchy, invert it, form B = SᵀW⁻¹S over
    * bottom ancestor sets, invert B, and apply
    * ŷ_rec = S·B⁻¹·Sᵀ·W⁻¹·ŷ per timestamp as join-matmuls. */
  private def covProjectionSql(wmatCtes: String): String =
    s"""WITH ${naiveFcCtes(s"user_id < $NB")},
       |$wmatCtes,
       |${gjInvCtes("winv", "wmat", NN)},
       |anc AS (SELECT u AS bottom, unnest([0, 1 + u % 3, 4 + u]) AS node
       |  FROM (SELECT unnest(generate_series(0, ${NB - 1})) AS u)),
       |bmat AS (SELECT a.bottom::INT AS i, b.bottom::INT AS j, sum(w.val) AS val
       |  FROM anc a CROSS JOIN anc b
       |  JOIN winv w ON w.i = a.node AND w.j = b.node
       |  GROUP BY a.bottom, b.bottom),
       |${gjInvCtes("binv", "bmat", NB)},
       |nodevals AS (
       |  SELECT ts, 0 AS node, sum(y_hat) AS y FROM fc GROUP BY ts
       |  UNION ALL
       |  SELECT ts, (1 + user_id % 3)::INT, sum(y_hat) FROM fc GROUP BY ts, user_id % 3
       |  UNION ALL
       |  SELECT ts, (4 + user_id)::INT, y_hat FROM fc),
       |yhat AS (SELECT g.ts, nid.node::INT AS node, coalesce(v.y, 0.0) AS y
       |  FROM tsgrid g
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${NN - 1})) AS node) nid
       |  LEFT JOIN nodevals v ON v.ts = g.ts AND v.node = nid.node),
       |w1 AS (SELECT y.ts, w.i, sum(w.val * y.y) AS v
       |  FROM winv w JOIN yhat y ON y.node = w.j GROUP BY y.ts, w.i),
       |w2 AS (SELECT w1.ts, a.bottom, sum(w1.v) AS v
       |  FROM anc a JOIN w1 ON w1.i = a.node GROUP BY w1.ts, a.bottom),
       |w3 AS (SELECT w2.ts, b.i AS bottom, sum(b.val * w2.v) AS v
       |  FROM binv b JOIN w2 ON w2.bottom = b.j GROUP BY w2.ts, b.i)
       |SELECT bottom::VARCHAR AS unique_id, ts, round(v + 1e-9, 6) AS y_hat FROM w3
       |UNION ALL
       |SELECT 'g' || (bottom % 3)::VARCHAR, ts, round(sum(v) + 1e-9, 6) FROM w3
       |  GROUP BY bottom % 3, ts
       |UNION ALL
       |SELECT 'total', ts, round(sum(v) + 1e-9, 6) FROM w3 GROUP BY ts""".stripMargin

  /** Daily node history over the subset hierarchy (bottoms = per-user
    * daily sums; groups/total aggregate them). */
  private val nodeHistCtes: String =
    s"""daily AS (SELECT user_id, date_trunc('day', ts) AS dts, sum(value) AS y
       |  FROM events WHERE user_id < $NB GROUP BY 1, 2),
       |nodehist AS (
       |  SELECT (4 + user_id)::INT AS node, dts, y FROM daily
       |  UNION ALL
       |  SELECT (1 + user_id % 3)::INT, dts, sum(y) FROM daily GROUP BY user_id % 3, dts
       |  UNION ALL
       |  SELECT 0, dts, sum(y) FROM daily GROUP BY dts)""".stripMargin

  private val grid: String =
    s"""grid AS (SELECT gi.i::INT AS i, gj.j::INT AS j
       |  FROM (SELECT unnest(generate_series(0, ${NN - 1})) AS i) gi
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${NN - 1})) AS j) gj)""".stripMargin

  /** PERMBU: W = persistence-residual covariance of daily node history,
    * shrunk halfway to its diagonal (Reconciliation.permbu). */
  val permbuSql: String = covProjectionSql(
    s"""$nodeHistCtes,
       |resid AS (SELECT node, dts,
       |    y - lag(y) OVER (PARTITION BY node ORDER BY dts) AS r
       |  FROM nodehist QUALIFY r IS NOT NULL),
       |nt AS (SELECT count(DISTINCT dts)::DOUBLE AS nt FROM resid),
       |wraw AS (SELECT a.node AS i, b.node AS j, sum(a.r * b.r) AS s
       |  FROM resid a JOIN resid b USING (dts) GROUP BY a.node, b.node),
       |$grid,
       |wmat AS (SELECT g.i, g.j,
       |    (coalesce(w.s, 0.0) / greatest(nt.nt, 1.0))
       |      * (CASE WHEN g.i = g.j THEN 1.0 ELSE 0.5 END) AS val
       |  FROM grid g LEFT JOIN wraw w ON w.i = g.i AND w.j = g.j, nt)""".stripMargin)

  /** MinT-CV: W = mean of per-fold covariances of daily node history
    * around train-split means (Reconciliation.minTraceCv, nFolds = 3),
    * expanded exactly as the Spark side does:
    * cov_f = (G_f − m·T_fᵀ − T_f·mᵀ + L_f·m·mᵀ)/L_f with
    * m = (S − T_f)/(nT − L_f). */
  val mintCvSql: String = covProjectionSql(
    s"""$nodeHistCtes,
       |days AS (SELECT dts, (dense_rank() OVER (ORDER BY dts) - 1)::INT AS r
       |  FROM (SELECT DISTINCT dts FROM nodehist)),
       |pars AS (SELECT nt, least(3, nt) AS folds,
       |    greatest(1, nt // least(3, nt)) AS fsize
       |  FROM (SELECT count(*)::INT AS nt FROM days)),
       |yd AS (SELECT n.node, d.r,
       |    least(d.r // p.fsize, p.folds - 1)::INT AS fold, n.y
       |  FROM nodehist n JOIN days d USING (dts), pars p),
       |gf AS (SELECT a.fold, a.node AS i, b.node AS j, sum(a.y * b.y) AS g
       |  FROM yd a JOIN yd b ON a.r = b.r AND a.fold = b.fold
       |  GROUP BY a.fold, a.node, b.node),
       |tf AS (SELECT fold, node AS i, sum(y) AS t FROM yd GROUP BY fold, node),
       |lf AS (SELECT fold, count(DISTINCT r)::DOUBLE AS l FROM yd GROUP BY fold),
       |si AS (SELECT node AS i, sum(y) AS s FROM yd GROUP BY node),
       |means AS (SELECT l.fold, s.i,
       |    (s.s - coalesce(t.t, 0.0)) / (p.nt - l.l) AS m
       |  FROM lf l CROSS JOIN si s
       |  LEFT JOIN tf t ON t.fold = l.fold AND t.i = s.i, pars p
       |  WHERE (p.nt - l.l) > 0),
       |$grid,
       |cov AS (SELECT g.i, g.j, l.fold,
       |    (coalesce(gg.g, 0.0) - mi.m * coalesce(tj.t, 0.0)
       |      - mj.m * coalesce(ti.t, 0.0) + l.l * mi.m * mj.m) / l.l AS c
       |  FROM grid g CROSS JOIN lf l
       |  JOIN means mi ON mi.fold = l.fold AND mi.i = g.i
       |  JOIN means mj ON mj.fold = l.fold AND mj.i = g.j
       |  LEFT JOIN gf gg ON gg.fold = l.fold AND gg.i = g.i AND gg.j = g.j
       |  LEFT JOIN tf ti ON ti.fold = l.fold AND ti.i = g.i
       |  LEFT JOIN tf tj ON tj.fold = l.fold AND tj.i = g.j
       |  WHERE l.l > 0),
       |wmat AS (SELECT g.i, g.j,
       |    (coalesce(c.w, 0.0) / p.folds)
       |      * (CASE WHEN g.i = g.j THEN 1.0 ELSE 0.5 END) AS val
       |  FROM grid g
       |  LEFT JOIN (SELECT i, j, sum(c) AS w FROM cov GROUP BY i, j) c
       |    ON c.i = g.i AND c.j = g.j, pars p)""".stripMargin)
}
