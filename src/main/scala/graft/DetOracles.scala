package graft

/** Oracles for the four deterministic formerly-rows-only queries
  * (VERDICT r5 ask #3): NIG Bayesian anomaly p-values, k-Shape
  * nearest-centroid classification, HMM regime decode (pinned EM params)
  * and isolation-forest path lengths (pinned trees).
  *
  * Float-parity notes: discrete outputs (labels, regimes, flags) are exact
  * unless two candidates tie within ~1e-12 — measured safe on the test
  * panel; continuous outputs use the shared round(·+1e-9, 6) discipline.
  */
object DetOracles {

  private val W = "PARTITION BY user_id ORDER BY ts, event_id"

  private def dlit(v: Double): String = "%.17e".format(v)

  private def pinsCte(name: String, cols: Seq[String], rows: Seq[Seq[String]]): String =
    s"""$name AS (SELECT * FROM (VALUES
       |  ${rows.map(_.mkString("(", ", ", ")")).mkString(",\n  ")}
       |) AS __t(${cols.mkString(", ")}))""".stripMargin

  // ── ts_bayes_anomaly ──────────────────────────────────────────────────
  //
  // Two-sided NIG posterior-predictive p-value = I_c(ν/2, 1/2) with
  // c = ν/(ν+t²), ν = 4 + rowIdx (integer: α starts at 2 and grows by ½
  // per row). The Scala side evaluates the incomplete beta by Lentz
  // continued fraction; here the integer-ν Student-t closed form
  // (A&S 26.7.3/26.7.4) — agreement ~1e-12, inside the round-6 nudge.
  // State recursion: κ_t = 1+t and α_t = 2+t/2 are closed forms of the
  // row index; (μ_t, β_t) replay as one growing flat fold per series.
  val bayesAnomalySql: String = {
    // A(x|ν): two-sided Student-t probability P(|T| <= x), x >= 0.
    // th = atan(x/√ν); c = cos²th; s = sinth.
    // ν even: A = s·Σ_{i=0}^{ν/2−1} b_i c^i          (b_0=1, b_i = b_{i−1}(2i−1)/(2i))
    // ν odd:  A = 2/π·(th + s·√c·Σ_{i=0}^{(ν−3)/2} a_i c^i) (a_0=1, a_i = a_{i−1}(2i)/(2i+1))
    val aEven =
      """(sin(atan(tv/sqrt(nu))) * list_reduce(
        |  list_prepend([1.0::DOUBLE, 1.0::DOUBLE],
        |    list_transform(generate_series(1, (nu::INT)//2 - 1), i -> [i::DOUBLE, 0.0::DOUBLE])),
        |  (a, x) -> [a[1] * (2.0*x[1] - 1.0) / (2.0*x[1]) * (nu/(nu + tv*tv)),
        |             a[2] + a[1] * (2.0*x[1] - 1.0) / (2.0*x[1]) * (nu/(nu + tv*tv))])[2])"""
        .stripMargin.replace("\n", "")
    val aOdd =
      """(2.0/pi() * (atan(tv/sqrt(nu)) + sin(atan(tv/sqrt(nu))) * sqrt(nu/(nu + tv*tv)) * list_reduce(
        |  list_prepend([1.0::DOUBLE, 1.0::DOUBLE],
        |    list_transform(generate_series(1, ((nu::INT) - 3)//2), i -> [i::DOUBLE, 0.0::DOUBLE])),
        |  (a, x) -> [a[1] * (2.0*x[1]) / (2.0*x[1] + 1.0) * (nu/(nu + tv*tv)),
        |             a[2] + a[1] * (2.0*x[1]) / (2.0*x[1] + 1.0) * (nu/(nu + tv*tv))])[2]))"""
        .stripMargin.replace("\n", "")
    // μ/β recursion (nigPValues): μ' = (κμ+v)/(κ+1); β' = β + κ(v−μ)²/(2(κ+1));
    // growing fold appends this row's PRE-update (μ, β) so row t reads state t
    s"""WITH o AS (SELECT user_id, value, ts,
       |  row_number() OVER ($W) AS rn FROM events),
       |v AS (SELECT user_id, list(value ORDER BY rn) AS vs, count(*)::INT AS n
       |  FROM o GROUP BY user_id),
       |-- growing fold: acc = [μ_cur, β_cur, history of pre-update (μ_t, β_t)…]
       |st AS (SELECT user_id, vs, n, list_reduce(
       |    list_prepend([vs[1], 1.0::DOUBLE],
       |      list_transform(generate_series(1, n), t -> [vs[t::INT], t::DOUBLE])),
       |    (acc, x) -> list_concat([
       |      (x[2] * acc[1] + x[1]) / (x[2] + 1.0),
       |      acc[2] + 0.5 * x[2] * (x[1] - acc[1]) * (x[1] - acc[1]) / (x[2] + 1.0)],
       |      list_concat(acc[3:], [acc[1], acc[2]]))) AS sl
       |  FROM v),
       |-- sl[3 + 2(t−1)] = μ_t, sl[4 + 2(t−1)] = β_t (pre-update state at
       |-- 1-based row t), with κ_t = t, α_t = 2 + (t−1)/2, ν = 2α = t + 3
       |pv AS (SELECT user_id, t AS rn,
       |  CASE WHEN t <= 10 THEN 1.0::DOUBLE ELSE
       |    CASE WHEN scale <= 0.0 THEN 1.0::DOUBLE ELSE
       |      1.0 - (CASE WHEN (nu::INT) % 2 = 0 THEN $aEven ELSE $aOdd END)
       |    END
       |  END AS p
       |  FROM (SELECT user_id, t, nu, scale,
       |      CASE WHEN scale > 0.0 THEN abs((vs[t::INT] - mu) / scale) ELSE 0.0::DOUBLE END AS tv
       |    FROM (SELECT user_id, vs, t,
       |        sl[(3 + 2*(t - 1))::INT] AS mu,
       |        sqrt(sl[(4 + 2*(t - 1))::INT] * (t + 1.0) / ((2.0 + (t - 1.0)/2.0) * t)) AS scale,
       |        t + 3.0 AS nu
       |      FROM st, (SELECT unnest(generate_series(1, (SELECT max(n) FROM v))) AS t)
       |      WHERE t <= n) q1) q2)
       |SELECT o.user_id, make_timestamp(epoch_us(o.ts)) AS ts,
       |  round(pv.p + 1e-9, 6) AS p_value, pv.p < 0.01 AS is_anomaly
       |FROM o JOIN pv ON o.user_id = pv.user_id AND o.rn = pv.rn""".stripMargin
  }

  // ── ts_regime ─────────────────────────────────────────────────────────
  //
  // Hmm.decode replay at pinned Baum-Welch parameters (the 30-iteration EM
  // search runs in Scala — OraclePins.regime): one forward growing fold,
  // one backward growing fold, per-row posterior + argmax + mean-rank
  // relabel. k = 2.
  def regimeSql(pins: Seq[(Long, graft.kernels.Hmm.HmmParams)]): String = {
    def lse(a: String, b: String) =
      s"(greatest($a, $b) + ln(exp(($a) - greatest($a, $b)) + exp(($b) - greatest($a, $b))))"
    def logB(t: String, s: Int) =
      s"(-0.5*(ln(2.0*pi()*v$s) + (vs[($t)::INT] - m$s)*(vs[($t)::INT] - m$s)/v$s))"
    val rows = pins.map { case (u, p) =>
      Seq(s"$u::BIGINT",
        s"${dlit(p.means(0))}::DOUBLE", s"${dlit(p.means(1))}::DOUBLE",
        s"${dlit(p.vars(0))}::DOUBLE", s"${dlit(p.vars(1))}::DOUBLE",
        s"${dlit(p.logPi(0))}::DOUBLE", s"${dlit(p.logPi(1))}::DOUBLE",
        s"${dlit(p.logA(0)(0))}::DOUBLE", s"${dlit(p.logA(0)(1))}::DOUBLE",
        s"${dlit(p.logA(1)(0))}::DOUBLE", s"${dlit(p.logA(1)(1))}::DOUBLE")
    }
    val laPrev0 = "acc[len(acc) - 1]"; val laPrev1 = "acc[len(acc)]"
    s"""WITH ${pinsCte("pins",
        Seq("user_id", "m0", "m1", "v0", "v1", "lp0", "lp1", "a00", "a01", "a10", "a11"), rows)},
       |o AS (SELECT user_id, value, ts,
       |  row_number() OVER ($W) AS rn FROM events),
       |v AS (SELECT user_id, list(value ORDER BY rn) AS vs, count(*)::INT AS n
       |  FROM o GROUP BY user_id),
       |j AS (SELECT * FROM v JOIN pins USING (user_id) WHERE n >= 6),
       |fwd AS (SELECT *, list_reduce(
       |    list_prepend([lp0 + ${logB("1", 0)}, lp1 + ${logB("1", 1)}],
       |      list_transform(generate_series(2, n), t -> [t::DOUBLE, 0.0::DOUBLE])),
       |    (acc, x) -> list_concat(acc, [
       |      ${lse(s"$laPrev0 + a00", s"$laPrev1 + a10")} + ${logB("x[1]", 0)},
       |      ${lse(s"$laPrev0 + a01", s"$laPrev1 + a11")} + ${logB("x[1]", 1)}])) AS fl
       |  FROM j),
       |bwd AS (SELECT *, list_reduce(
       |    list_prepend([0.0::DOUBLE, 0.0::DOUBLE],
       |      list_transform(generate_series(1, n - 1), i -> [(n - i)::DOUBLE, 0.0::DOUBLE])),
       |    (acc, x) -> list_concat([
       |      ${lse(s"a00 + ${logB("x[1] + 1", 0)} + acc[1]", s"a01 + ${logB("x[1] + 1", 1)} + acc[2]")},
       |      ${lse(s"a10 + ${logB("x[1] + 1", 0)} + acc[1]", s"a11 + ${logB("x[1] + 1", 1)} + acc[2]")}], acc)) AS bl
       |  FROM fwd),
       |ll AS (SELECT *, ${lse("fl[2*n - 1]", "fl[2*n]")} AS llv FROM bwd),
       |g AS (SELECT user_id, t AS rn,
       |  exp(fl[(2*t - 1)::INT] + bl[(2*t - 1)::INT] - llv) AS g0,
       |  exp(fl[(2*t)::INT] + bl[(2*t)::INT] - llv) AS g1,
       |  CASE WHEN m1 < m0 THEN 1 ELSE 0 END AS r0
       |  FROM ll, (SELECT unnest(generate_series(1, (SELECT max(n) FROM v))) AS t)
       |  WHERE t <= n),
       |dec AS (SELECT user_id, rn,
       |  CASE WHEN g1 > g0 THEN 1 - r0 ELSE r0 END AS regime,
       |  CASE WHEN g1 > g0 THEN g1 ELSE g0 END AS prob
       |  FROM g)
       |SELECT o.user_id, make_timestamp(epoch_us(o.ts)) AS ts,
       |  d.regime::INT AS regime, round(d.prob + 1e-9, 6) AS regime_prob
       |FROM o JOIN dec d ON o.user_id = d.user_id AND o.rn = d.rn
       |UNION ALL
       |SELECT o.user_id, make_timestamp(epoch_us(o.ts)) AS ts,
       |  0::INT AS regime, 1.0::DOUBLE AS regime_prob
       |FROM o JOIN v USING (user_id) WHERE v.n < 6""".stripMargin
  }

  // ── ts_iforest ────────────────────────────────────────────────────────

  /** Pinned isolation forest, flat node form: internal nodes carry
    * (feat, split, lch, rch); leaves carry the full path-length payload
    * depth + c(size) precomputed in Scala (feat = −1, self-looping child
    * pointers so the fixed-depth walk is uniform). */
  case class IforestPin(
      nodes: Seq[(Int, Int, Int, Double, Int, Int, Double)],
      nTrees: Int, maxDepth: Int)

  /** Walk replay at pinned trees: lag features, na-drop, `maxDepth`
    * unrolled node hops, per-row mean path length in tree order, per-user
    * rounded sum. The fit (seeded sample + random splits) and the
    * 2^(−eh/c) flag live in Scala (IsolationForestSpec) — path lengths
    * are the exactly-replayable contract. */
  def iforestSql(pin: IforestPin): String = {
    val nodeRows = pin.nodes.map { case (t, nd, f, sp, l, r, pl) =>
      Seq(s"$t::INT", s"$nd::INT", s"$f::INT", s"${dlit(sp)}::DOUBLE",
        s"$l::INT", s"$r::INT", s"${dlit(pl)}::DOUBLE")
    }
    val walks = (1 to pin.maxDepth).map { i =>
      s"""w$i AS (SELECT w.user_id, w.event_id, w.f0, w.f1, w.f2, w.tree,
         |  CASE WHEN n.feat = -1 THEN w.node
         |       WHEN (CASE n.feat WHEN 0 THEN w.f0 WHEN 1 THEN w.f1 ELSE w.f2 END) < n.split THEN n.lch
         |       ELSE n.rch END AS node
         |  FROM w${i - 1} w JOIN nodes n USING (tree, node))""".stripMargin
    }.mkString(",\n")
    s"""WITH ${pinsCte("nodes",
        Seq("tree", "node", "feat", "split", "lch", "rch", "plen"), nodeRows)},
       |r AS (SELECT user_id, event_id, value AS f0,
       |  lag(value, 1) OVER ($W) AS f1,
       |  lag(value, 2) OVER ($W) AS f2 FROM events),
       |rc AS (SELECT * FROM r WHERE f1 IS NOT NULL AND f2 IS NOT NULL),
       |w0 AS (SELECT rc.user_id, rc.event_id, rc.f0, rc.f1, rc.f2, t.tree, 0::INT AS node
       |  FROM rc CROSS JOIN (SELECT DISTINCT tree FROM nodes) t),
       |$walks,
       |pl AS (SELECT w.user_id, w.event_id, w.tree, n.plen
       |  FROM w${pin.maxDepth} w JOIN nodes n USING (tree, node)),
       |eh AS (SELECT user_id, event_id,
       |  list_reduce(list_prepend(0.0::DOUBLE, list(plen ORDER BY tree)),
       |    (a, b) -> a + b) / ${pin.nTrees}.0 AS ehr
       |  FROM pl GROUP BY user_id, event_id)
       |SELECT user_id, count(*)::BIGINT AS n_rows,
       |  round(sum(ehr) + 1e-9, 6) AS path_sum
       |FROM eh GROUP BY user_id""".stripMargin
  }

  // ── ts_mstl_features ──────────────────────────────────────────────────
  //
  // Decomposition.mstl replay: `iterations` back-fitting rounds over the
  // ascending periods (window-MA trend on the other-seasonals-removed
  // series, re-centered phase means), final max-period trend, then the
  // strength/resid aggregate. Same engine-avg parity class as the oracled
  // simple-mode ts_strength_features.
  def mstlSql(periods: Seq[Int], iterations: Int,
      rowLevel: Boolean = false): String = {
    val ps = periods.distinct.sorted
    def sCol(p: Int) = s"s$p"
    def phCol(p: Int) = s"ph$p"
    val phases = ps.map(p =>
      s"(row_number() OVER ($W) - 1) % $p AS ${phCol(p)}").mkString(",\n  ")
    val zeros = ps.map(p => s"0.0::DOUBLE AS ${sCol(p)}").mkString(", ")
    val carried = Seq("user_id", "ts", "event_id", "value") ++ ps.map(phCol)
    val sb = new StringBuilder(
      s"WITH b0 AS (SELECT user_id, ts, event_id, value,\n  $phases, $zeros FROM events)")
    var prev = "b0"
    var k = 0
    for (_ <- 1 to iterations; p <- ps) {
      k += 1
      // Spark: deseasOther = others.foldLeft(y)(_ - _), ascending periods
      val des = ps.filter(_ != p).map(sCol)
        .foldLeft("value::DOUBLE")((a, s) => s"($a - $s)")
      val wf = s"($W ROWS BETWEEN ${(p - 1) / 2} PRECEDING AND ${p / 2} FOLLOWING)"
      val keep = (carried ++ ps.filter(_ != p).map(sCol)).mkString(", ")
      sb.append(s""",
        |d$k AS (SELECT *, $des - (CASE WHEN count(value) OVER wf >= $p THEN avg($des) OVER wf END) AS det
        |  FROM $prev WINDOW wf AS $wf),
        |p$k AS (SELECT user_id, ${phCol(p)}, avg(det) AS pmean
        |  FROM d$k GROUP BY user_id, ${phCol(p)}),
        |c$k AS (SELECT user_id, ${phCol(p)},
        |  pmean - avg(pmean) OVER (PARTITION BY user_id) AS snew FROM p$k),
        |b$k AS (SELECT ${keep.split(", ").map(c => s"d.$c").mkString(", ")}, c.snew AS ${sCol(p)}
        |  FROM d$k d JOIN c$k c ON d.user_id = c.user_id AND d.${phCol(p)} = c.${phCol(p)})""".stripMargin)
      prev = s"b$k"
    }
    val allSeas = ps.map(sCol).mkString("(", " + ", ")")
    val pMax = ps.max
    val wfF = s"($W ROWS BETWEEN ${(pMax - 1) / 2} PRECEDING AND ${pMax / 2} FOLLOWING)"
    val seasStrengths = ps.map(p =>
      s"round(greatest(0.0, 1.0 - var_samp(resid) / var_samp(${sCol(p)} + resid)) + 1e-9, 6) AS seasonal_${p}_strength")
      .mkString(",\n  ")
    sb.append(s""",
      |f AS (SELECT *,
      |  (CASE WHEN count(value) OVER wf >= $pMax THEN avg(value::DOUBLE - $allSeas) OVER wf END) AS trend
      |  FROM $prev WINDOW wf AS $wfF),
      |r AS (SELECT *, (value::DOUBLE - trend) - $allSeas AS resid FROM f)
      |""".stripMargin)
    sb.append(
      if (rowLevel)
        s"""SELECT user_id, event_id,
           |  round(trend + 1e-9, 6) AS trend,
           |  ${ps.map(p => s"round(${sCol(p)} + 1e-9, 6) AS seasonal_$p").mkString(",\n  ")},
           |  round(resid + 1e-9, 6) AS resid
           |FROM r""".stripMargin
      else
        s"""SELECT user_id,
           |  round(greatest(0.0, 1.0 - var_samp(resid) / var_samp(trend + resid)) + 1e-9, 6) AS trend_strength,
           |  $seasStrengths,
           |  round(stddev_samp(resid) / avg(value) + 1e-9, 6) AS resid_var
           |FROM r WHERE trend IS NOT NULL AND resid IS NOT NULL
           |GROUP BY user_id""".stripMargin)
    sb.toString
  }

  // ── ts_causal_impact_ll ───────────────────────────────────────────────
  //
  // Causal.causalImpact replay, local_linear trend without the seasonal
  // block (the seasonal-24 production default has a 25-dim Kalman state —
  // not SQL-replayable; this variant pins the causal machinery: pre/post
  // split at the global 0.8 timestamp percentile, 2-state Kalman filter
  // over the pre-period (predict-then-update from x0=[y0,0], P0=10I),
  // forward level+trend propagation as counterfactual, pointwise and
  // running cumulative effects). Defaults σobs=1, σlevel=0.1, σtrend=0.01.
  val causalImpactLlSql: String = {
    val ql = dlit(0.1 * 0.1)   // σlevel² exactly as the kernel computes it
    val qt = dlit(0.01 * 0.01) // σtrend²
    // filter fold state [x1, x2, p11, p12, p22]; y = x[1]
    val px1 = "(acc[1] + acc[2])"
    val pp11 = s"(acc[3] + 2.0*acc[4] + acc[5] + $ql)"
    val pp12 = "(acc[4] + acc[5])"
    val pp22 = s"(acc[5] + $qt)"
    val sE = s"($pp11 + 1.0)"
    val e = s"(x[1] - $px1)"
    val filterStep = s"[$px1 + ($pp11/$sE)*$e, acc[2] + ($pp12/$sE)*$e, " +
      s"$pp11 - ($pp11/$sE)*$pp11, $pp12 - ($pp11/$sE)*$pp12, $pp22 - ($pp12/$sE)*$pp12]"
    // propagation fold [x1, x2, fc...]: level steps forward sequentially
    val propStep =
      "list_concat([acc[1] + acc[2], acc[2]], list_concat(acc[3:], [acc[1] + acc[2]]))"
    s"""WITH cut AS (SELECT ((floor(quantile_cont(epoch_us(ts), 0.8))::BIGINT) // 1000) * 1000 AS c
       |  FROM events),
       |o AS (SELECT user_id, event_id, value, ts, epoch_us(ts) AS us,
       |  row_number() OVER ($W) AS rn FROM events),
       |pre AS (SELECT user_id, list(value ORDER BY rn) AS vs
       |  FROM o, cut WHERE us < c GROUP BY user_id),
       |post AS (SELECT user_id, ts, value,
       |  row_number() OVER ($W) AS pi FROM o, cut WHERE us >= c),
       |np AS (SELECT user_id, max(pi)::INT AS n FROM post GROUP BY user_id),
       |st AS (SELECT user_id, list_reduce(
       |    list_prepend([vs[1], 0.0::DOUBLE, 10.0::DOUBLE, 0.0::DOUBLE, 10.0::DOUBLE],
       |      list_transform(vs, v -> [v::DOUBLE])),
       |    (acc, x) -> $filterStep) AS s
       |  FROM pre WHERE len(vs) >= 3),
       |fcl AS (SELECT st.user_id, list_reduce(
       |    list_prepend([st.s[1], st.s[2]],
       |      list_transform(generate_series(1, np.n), i -> [i::DOUBLE])),
       |    (acc, x) -> $propStep) AS f
       |  FROM st JOIN np USING (user_id))
       |SELECT p.user_id, p.ts,
       |  round(p.value + 1e-9, 6) AS observed,
       |  round(f.f[(2 + p.pi)::INT] + 1e-9, 6) AS counterfactual,
       |  round(p.value - f.f[(2 + p.pi)::INT] + 1e-9, 6) AS point_effect,
       |  round(sum(p.value - f.f[(2 + p.pi)::INT])
       |    OVER (PARTITION BY p.user_id ORDER BY p.pi) + 1e-9, 6) AS cum_effect
       |FROM post p JOIN fcl f USING (user_id)""".stripMargin
  }

  // ── ts_bsts_fc / ts_bsts_decomp (local-linear, no seasonal) ──────────
  //
  // BayesianOps.bstsForecast/bstsDecompose replay with the kernel's
  // fixed default variances (σobs=1, σlevel=0.1, σtrend=0.01): the same
  // 2-state predict-update filter fold as ts_causal_impact_ll — init
  // x0=[y0,0], P0=10I, flat state [x1,x2,p11,p12,p22] — then either
  // h-step (mean, variance) propagation (fc) or the RTS backward
  // smoother (decomp), whose per-step inputs (xf, pf, xp, pp) the
  // forward fold stores as 10-double records. The smoother gain
  // C = pf·F'·pinv(pp) uses the closed-form 2×2 inverse; breeze's
  // SVD pinv agrees to ~1e-13 — inside the r6n nudge.
  private val BstsQl = dlit(0.1 * 0.1)
  private val BstsQt = dlit(0.01 * 0.01)

  private def bstsFilterStep(store: Boolean): String = {
    val px1 = "(acc[1] + acc[2])"
    val px2 = "acc[2]"
    val pp11 = s"(acc[3] + 2.0*acc[4] + acc[5] + $BstsQl)"
    val pp12 = "(acc[4] + acc[5])"
    val pp22 = s"(acc[5] + $BstsQt)"
    val sE = s"($pp11 + 1.0)"
    val e = s"(x[1] - $px1)"
    val xf1 = s"($px1 + ($pp11/$sE)*$e)"
    val xf2 = s"($px2 + ($pp12/$sE)*$e)"
    val pf11 = s"($pp11 - ($pp11/$sE)*$pp11)"
    val pf12 = s"($pp12 - ($pp11/$sE)*$pp12)"
    val pf22 = s"($pp22 - ($pp12/$sE)*$pp12)"
    if (!store) s"[$xf1, $xf2, $pf11, $pf12, $pf22]"
    else s"list_concat([$xf1, $xf2, $pf11, $pf12, $pf22], " +
      s"list_concat(acc[6:], [$xf1, $xf2, $pf11, $pf12, $pf22, $px1, $px2, $pp11, $pp12, $pp22]))"
  }

  /** ts_bsts_fc: filter the full series, then propagate (x, P) h steps
    * appending (ŷ = x1, v̂ = p11 + r) per step. */
  def bstsFcSql(h: Int): String = {
    val nx1 = "(acc[1] + acc[2])"
    val np11 = s"(acc[3] + 2.0*acc[4] + acc[5] + $BstsQl)"
    val np12 = "(acc[4] + acc[5])"
    val np22 = s"(acc[5] + $BstsQt)"
    val propStep =
      s"list_concat([$nx1, acc[2], $np11, $np12, $np22], " +
        s"list_concat(acc[6:], [$nx1, $np11 + 1.0]))"
    s"""WITH s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs
       |  FROM events GROUP BY user_id),
       |st AS (SELECT user_id, list_reduce(
       |    list_prepend([vs[1], 0.0::DOUBLE, 10.0::DOUBLE, 0.0::DOUBLE, 10.0::DOUBLE],
       |      list_transform(vs, v -> [v::DOUBLE])),
       |    (acc, x) -> ${bstsFilterStep(store = false)}) AS f0
       |  FROM s),
       |fc AS (SELECT user_id, list_reduce(
       |    list_prepend(f0, list_transform(generate_series(1, $h), i -> [i::DOUBLE])),
       |    (acc, x) -> $propStep) AS f
       |  FROM st),
       |lastt AS (SELECT user_id, max(epoch_us(ts)) AS us FROM events GROUP BY user_id),
       |d AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, epoch_us(ts) AS us, lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS lus FROM events)
       |  WHERE lus IS NOT NULL GROUP BY user_id)
       |SELECT f.user_id, hs.step, make_timestamp(l.us + hs.step * d.freq) AS ts,
       |  round(f.f[(4 + 2*hs.step)::INT] + 1e-9, 6) AS y_hat,
       |  round(f.f[(5 + 2*hs.step)::INT] + 1e-9, 6) AS y_hat_var
       |FROM fc f JOIN lastt l USING (user_id) JOIN d USING (user_id)
       |CROSS JOIN (SELECT unnest(generate_series(1, $h)) AS step) hs""".stripMargin
  }

  /** ts_bsts_decomp: forward filter storing per-step records, RTS
    * backward fold producing (level, trend) pairs newest-first, row
    * lookup by reverse index; seasonal ≡ 0 (no seasonal block). */
  val bstsDecompSql: String = {
    // record j (1-based) lives at f[10j-4 .. 10j+5]:
    // xf1 xf2 pf11 pf12 pf22 xp1 xp2 pp11 pp12 pp22
    def rec(j: String, off: Int): String = s"f[(10*($j) - 5 + $off)::INT]"
    val jj = "(n - (x[1])::INT)"
    val xf1 = rec(jj, 1); val xf2 = rec(jj, 2)
    val pf11 = rec(jj, 3); val pf12 = rec(jj, 4); val pf22 = rec(jj, 5)
    val j1 = s"($jj + 1)"
    val xp1n = rec(j1, 6); val xp2n = rec(j1, 7)
    val pp11n = rec(j1, 8); val pp12n = rec(j1, 9); val pp22n = rec(j1, 10)
    val det = s"(($pp11n)*($pp22n) - ($pp12n)*($pp12n))"
    val c11 = s"(($pf11 + $pf12)*($pp22n/$det) + ($pf12)*(-($pp12n)/$det))"
    val c12 = s"(($pf11 + $pf12)*(-($pp12n)/$det) + ($pf12)*($pp11n/$det))"
    val c21 = s"(($pf12 + $pf22)*($pp22n/$det) + ($pf22)*(-($pp12n)/$det))"
    val c22 = s"(($pf12 + $pf22)*(-($pp12n)/$det) + ($pf22)*($pp11n/$det))"
    val d1 = s"(acc[1] - $xp1n)"
    val d2 = s"(acc[2] - $xp2n)"
    val xs1 = s"($xf1 + $c11*$d1 + $c12*$d2)"
    val xs2 = s"($xf2 + $c21*$d1 + $c22*$d2)"
    val smoothStep =
      s"list_concat([$xs1, $xs2], list_concat(acc[3:], [$xs1, $xs2]))"
    s"""WITH s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs,
       |  count(*)::INT AS n FROM events GROUP BY user_id),
       |st AS (SELECT user_id, n, list_reduce(
       |    list_prepend([vs[1], 0.0::DOUBLE, 10.0::DOUBLE, 0.0::DOUBLE, 10.0::DOUBLE],
       |      list_transform(vs, v -> [v::DOUBLE])),
       |    (acc, x) -> ${bstsFilterStep(store = true)}) AS f
       |  FROM s),
       |sm AS (SELECT user_id, n, list_reduce(
       |    list_prepend([f[(10*n - 4)::INT], f[(10*n - 3)::INT], f[(10*n - 4)::INT], f[(10*n - 3)::INT]],
       |      list_transform(generate_series(1, n - 1), i -> [i::DOUBLE])),
       |    (acc, x) -> $smoothStep) AS sv
       |  FROM st),
       |o AS (SELECT user_id, ts, row_number() OVER ($W) AS rn FROM events)
       |SELECT o.user_id, o.ts,
       |  round(m.sv[(2*(m.n - o.rn) + 3)::INT] + 1e-9, 6) AS level,
       |  round(m.sv[(2*(m.n - o.rn) + 4)::INT] + 1e-9, 6) AS trend,
       |  round(0.0::DOUBLE + 1e-9, 6) AS seasonal
       |FROM o JOIN sm m USING (user_id)""".stripMargin
  }

  /** ts_bayesian_ets: pinned MAP (α, level₀) per series; SQL replays the
    * SES level recursion over the observed values — flat h-step
    * forecast. */
  def bayesianEtsSql(pins: Seq[(Long, Double, Double)], h: Int): String = {
    val rows = pins.map { case (u, a, l0) =>
      Seq(s"$u::BIGINT", s"${dlit(a)}::DOUBLE", s"${dlit(l0)}::DOUBLE") }
    s"""WITH ${pinsCte("pin", Seq("user_id", "alpha", "level0"), rows)},
       |s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs
       |  FROM events GROUP BY user_id),
       |lvl AS (SELECT s.user_id, list_reduce(
       |    list_prepend([p.level0], list_transform(s.vs, v -> [v::DOUBLE])),
       |    (acc, x) -> [p.alpha * x[1] + (1.0::DOUBLE - p.alpha) * acc[1]])[1] AS l
       |  FROM s JOIN pin p USING (user_id)),
       |lastt AS (SELECT user_id, max(epoch_us(ts)) AS us FROM events GROUP BY user_id),
       |d AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, epoch_us(ts) AS us, lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS lus FROM events)
       |  WHERE lus IS NOT NULL GROUP BY user_id)
       |SELECT v.user_id, hs.step, make_timestamp(l.us + hs.step * d.freq) AS ts,
       |  round(v.l + 1e-9, 6) AS y_hat
       |FROM lvl v JOIN lastt l USING (user_id) JOIN d USING (user_id)
       |CROSS JOIN (SELECT unnest(generate_series(1, $h)) AS step) hs""".stripMargin
  }

  // ── ts_kshape_classify ────────────────────────────────────────────────
  //
  // Classification.kshapeClassify replay: truncate every series to the
  // panel-min length, z-normalize, per-class element-wise mean of members
  // (label = user_id % 3), re-z-normalize the centroid, and classify the
  // test users (< 30) by argmin SBD (ties → smallest label, matching the
  // Scala minBy over label-sorted centroids).
  val kshapeClassifySql: String = {
    def znormCtes(src: String, valCol: String, pre: String) =
      s"""${pre}m1 AS (SELECT *, list_reduce($valCol, (a, b) -> a + b)/len($valCol) AS __mu FROM $src),
         |${pre}m2 AS (SELECT *, sqrt(list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform($valCol, v -> (v - __mu)*(v - __mu))), (a, b) -> a + b)/len($valCol)) AS __sd
         |  FROM ${pre}m1),
         |${pre}z AS (SELECT * EXCLUDE ($valCol, __mu, __sd),
         |  CASE WHEN __sd = 0.0 THEN list_transform($valCol, v -> 0.0::DOUBLE)
         |       ELSE list_transform($valCol, v -> (v - __mu)/__sd) END AS $valCol
         |  FROM ${pre}m2)""".stripMargin
    // SBD(a, b) with |a| = |b| = L (Elastic.sbd replay, ElasticOracle shape)
    val sbd =
      """CASE WHEN sqrt(list_reduce(list_transform(za, v -> v*v), (x, y) -> x + y))
        |     * sqrt(list_reduce(list_transform(zb, v -> v*v), (x, y) -> x + y)) = 0.0
        |  THEN 1.0::DOUBLE
        |  ELSE 1.0::DOUBLE - list_max(
        |    list_transform(generate_series(0, 2*L - 2), k ->
        |      list_reduce(
        |        list_prepend(0.0::DOUBLE,
        |          list_transform(generate_series(greatest(1, (k::INT - L + 1) + 1), least(L, L + (k::INT - L + 1))),
        |            ii -> za[ii::INT] * zb[(ii - (k::INT - L + 1))::INT])),
        |        (x, y) -> x + y)
        |    )) / (sqrt(list_reduce(list_transform(za, v -> v*v), (x, y) -> x + y))
        |        * sqrt(list_reduce(list_transform(zb, v -> v*v), (x, y) -> x + y)))
        |END""".stripMargin
    s"""WITH s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs
       |  FROM events GROUP BY user_id),
       |ml AS (SELECT min(len(vs))::INT AS L FROM s),
       |tr AS (SELECT user_id, vs[1:(SELECT L FROM ml)] AS t FROM s),
       |${znormCtes("tr", "t", "s")},
       |lab AS (SELECT user_id, t AS z, (user_id % 3)::VARCHAR AS label FROM sz),
       |cm AS (SELECT label, p, avg(z[p::INT]) AS m
       |  FROM lab CROSS JOIN (SELECT unnest(generate_series(1, (SELECT L FROM ml))) AS p)
       |  GROUP BY label, p),
       |cl AS (SELECT label, list(m ORDER BY p) AS c FROM cm GROUP BY label),
       |${znormCtes("cl", "c", "c")},
       |d AS (SELECT te.user_id, cz.label, (SELECT L FROM ml) AS L,
       |    te.z AS za, cz.c AS zb FROM (SELECT * FROM lab WHERE user_id < 30) te
       |  CROSS JOIN cz),
       |dist AS (SELECT user_id, label, $sbd AS dd FROM d)
       |SELECT user_id, label AS predicted_label FROM (
       |  SELECT user_id, label,
       |    row_number() OVER (PARTITION BY user_id ORDER BY dd, label) AS rnk
       |  FROM dist) WHERE rnk = 1""".stripMargin
  }
}
