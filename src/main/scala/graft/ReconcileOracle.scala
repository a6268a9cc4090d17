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
}
