package graft

import graft.kernels.DetRng

/** DuckDB replay oracles for the counter-based stochastic kernels
  * (VERDICT r7 ask #4): EnKF, particle filter, MH-MCMC.
  *
  * [[graft.kernels.DetRng]] makes every draw a pure function of a
  * structured counter, and its Irwin-Hall(12) gaussians involve only IEEE
  * arithmetic — so DuckDB reproduces the draws BIT-EXACTLY: the splitmix64
  * finalizer's two wrapping 64-bit multiplies are HUGEINT products mod 2⁶⁴
  * (constants split into 32-bit halves so no product exceeds 2¹²⁸ — the
  * same trick as ForecastOracle.fnvUSql), and each pipeline stage binds
  * its value once via a single-element-list lambda, keeping the generated
  * SQL linear in size.
  *
  * The filters then replay as recursive CTEs carrying the ensemble /
  * particle list per step (the ukfSql shape, with LIST columns).
  */
object StochOracle {

  private def dlit(v: Double): String = "%.17e".format(v)
  private def us(l: Long): String = java.lang.Long.toUnsignedString(l)

  private val Mod32 = "4294967296::HUGEINT"
  private val Mod64 = "18446744073709551616::HUGEINT"
  private val C1 = 0xbf58476d1ce4e5b9L
  private val C2 = 0x94d049bb133111ebL

  /** `(z * c) mod 2⁶⁴` for a bound HUGEINT variable `z` < 2⁶⁴ and a
    * 64-bit constant `c` split into 32-bit halves. */
  private def mulwrap(z: String, c: Long): String = {
    val cl = us(c & 0xFFFFFFFFL)
    val ch = us(c >>> 32)
    s"(($z * $cl::HUGEINT + (($z * $ch::HUGEINT) % $Mod32) * $Mod32) % $Mod64)"
  }

  /** Bit-exact SQL replay of DetRng.mix → uniform in [0,1) over the
    * BIGINT counter expression `cExpr`. */
  def uniformRawExpr(cExpr: String, seedC: Long): String =
    s"""list_transform([xor(($cExpr)::HUGEINT, ${us(seedC)}::HUGEINT)], __ra ->
       |  list_transform([xor(__ra, __ra >> 30)], __rb ->
       |    list_transform([${mulwrap("__rb", C1)}], __rc ->
       |      list_transform([xor(__rc, __rc >> 27)], __rd ->
       |        list_transform([${mulwrap("__rd", C2)}], __re ->
       |          ((xor(__re, __re >> 31) >> 11))::DOUBLE / 9007199254740992.0
       |        )[1])[1])[1])[1])[1]""".stripMargin

  /** DetRng.uniform (sub-slot 12). */
  def uniformExpr(cExpr: String, seedC: Long): String =
    uniformRawExpr(s"(($cExpr) * 16::BIGINT + 12)", seedC)

  /** Bit-exact splitmix64 finalizer (DetRng.mix / plans.Mix64) over an
    * UNSIGNED HUGEINT expression in [0, 2⁶⁴); result the same range. */
  def mixSql(hExpr: String): String =
    s"""list_transform([($hExpr)::HUGEINT], __ma ->
       |  list_transform([xor(__ma, __ma >> 30)], __mb ->
       |    list_transform([${mulwrap("__mb", C1)}], __mc ->
       |      list_transform([xor(__mc, __mc >> 27)], __md ->
       |        list_transform([${mulwrap("__md", C2)}], __me ->
       |          xor(__me, __me >> 31)
       |        )[1])[1])[1])[1])[1]""".stripMargin

  /** DetRng.gauss: Irwin-Hall(12) — 12 uniforms summed in sub-slot order
    * by a left fold, minus 6. */
  def gaussExpr(cExpr: String, seedC: Long): String =
    s"""(list_reduce(list_prepend(0.0::DOUBLE,
       |  list_transform(generate_series(0, 11), __gj ->
       |    ${uniformRawExpr(s"(($cExpr) * 16::BIGINT + __gj)", seedC)})),
       |  (__ga, __gb) -> __ga + __gb) - 6.0)""".stripMargin

  private def ctr(stream: Int, tExpr: String, iExpr: String): String =
    s"(($stream::BIGINT * 1048576::BIGINT + ($tExpr)) * 4096::BIGINT + ($iExpr))"

  /** ts_enkf replay: the full scalar local-level EnKF recursion of
    * Bayesian.enkfLocalLevelDet as a recursive CTE carrying the ensemble
    * list — propagate (stream 1), Kalman-style update with perturbed
    * observations (stream 2), ensemble mean per step. Every operation is
    * IEEE arithmetic in the kernel's order, so `filtered` matches
    * bit-for-bit before the shared 6-dp rounding. */
  def enkfSql(q: Double, r: Double, nEnsemble: Int, seed: Long,
      seriesFilter: String = "TRUE"): String = {
    val sc = DetRng.seedConst(seed)
    val lp = dlit(math.sqrt(1.0 + 1e-10))
    val lq = dlit(math.sqrt(q + 1e-10))
    val sr = dlit(math.sqrt(r))
    val e = nEnsemble
    val em1 = dlit(e - 1.0)
    def g(stream: Int, tExpr: String, iExpr: String) =
      gaussExpr(ctr(stream, tExpr, iExpr), sc)
    s"""WITH RECURSIVE v AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs,
       |  list(epoch_us(ts) ORDER BY ts, event_id) AS tss, count(*)::INT AS n
       |  FROM events WHERE $seriesFilter GROUP BY user_id),
       |st AS (
       |  SELECT user_id, 0 AS t, 0.0::DOUBLE AS filt,
       |    list_transform(generate_series(0, ${e - 1}), ii ->
       |      vs[1] + $lp * ${g(0, "0", "ii")}) AS ens
       |  FROM v -- base: seeded init ensemble (stream 0)
       |  UNION ALL
       |  SELECT user_id, t, filt, ens3 AS ens FROM (
       |    SELECT user_id, t, ens3,
       |      list_reduce(list_prepend(0.0::DOUBLE, ens3), (sa, sb) -> sa + sb) / ${e}.0 AS filt
       |    FROM (
       |      SELECT user_id, t, list_transform(generate_series(0, ${e - 1}), ii ->
       |        ens2[ii + 1] + kk * (yt + $sr * ${g(2, "t - 1", "ii")} - ens2[ii + 1])) AS ens3
       |      FROM (
       |        SELECT user_id, t, yt, ens2, pyx[2] / pyx[1] AS kk
       |        FROM (
       |          SELECT user_id, t, yt, ens2,
       |            list_reduce(list_prepend([${dlit(r)}, 0.0::DOUBLE],
       |              list_transform(ens2, ee -> [ee - hm])),
       |              (pa, pe) -> [pa[1] + pe[1] * pe[1] / $em1, pa[2] + pe[1] * (pe[1] / $em1)]) AS pyx
       |          FROM (
       |            SELECT user_id, t, yt, ens2,
       |              list_reduce(list_prepend(0.0::DOUBLE, ens2), (sa, sb) -> sa + sb) / ${e}.0 AS hm
       |            FROM (
       |              SELECT c.user_id, c.t + 1 AS t, vv.vs[(c.t + 1)::INT] AS yt,
       |                list_transform(generate_series(0, ${e - 1}), ii ->
       |                  c.ens[ii + 1] + $lq * ${g(1, "c.t", "ii")}) AS ens2
       |              FROM st c JOIN v vv ON vv.user_id = c.user_id
       |              WHERE c.t < vv.n
       |            ) q1
       |          ) q2
       |        ) q3
       |      ) q4
       |    ) q5
       |  ) q6
       |)
       |SELECT s2.user_id, make_timestamp(vv.tss[s2.t]) AS ts,
       |  round(s2.filt, 6) AS filtered
       |FROM st s2 JOIN v vv ON vv.user_id = s2.user_id
       |WHERE s2.t >= 1""".stripMargin
  }

  /** ts_particle replay: the local-level bootstrap particle filter of
    * Bayesian.particleFilterLocalLevelDet as a recursive CTE carrying the
    * particle list — propagate (stream 1, skipped at the first step like
    * the kernel), weight/normalize (logNorm inlined as the kernel's exact
    * JVM double, so only exp's last ulp differs — absorbed by r6),
    * weighted mean + ESS, and the systematic resample (stream 2) as a
    * per-position cums count (provably equal to the kernel's two-pointer
    * scan for ascending positions). */
  def particleSql(nParticles: Int, sigmaLevel: Double, sigmaObs: Double,
      resampleThreshold: Double, seed: Long,
      seriesFilter: String = "TRUE"): String = {
    val sc = DetRng.seedConst(seed)
    val np = nParticles
    val logNorm = dlit(-0.5 * math.log(2 * math.Pi * sigmaObs * sigmaObs))
    val so = dlit(sigmaObs)
    val sl = dlit(sigmaLevel)
    val thresh = dlit(resampleThreshold * np)
    def g(stream: Int, tExpr: String, iExpr: String) =
      gaussExpr(ctr(stream, tExpr, iExpr), sc)
    def u(stream: Int, tExpr: String, iExpr: String) =
      uniformExpr(ctr(stream, tExpr, iExpr), sc)
    s"""WITH RECURSIVE v AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs,
       |  list(epoch_us(ts) ORDER BY ts, event_id) AS tss, count(*)::INT AS n
       |  FROM events WHERE $seriesFilter GROUP BY user_id),
       |st AS (
       |  SELECT user_id, 0 AS t, 0.0::DOUBLE AS filt, 0.0::DOUBLE AS ess,
       |    list_transform(generate_series(0, ${np - 1}), ii ->
       |      vs[1] + ${g(0, "0", "ii")}) AS parts
       |  FROM v
       |  UNION ALL
       |  SELECT user_id, t, filt, essv AS ess,
       |    CASE WHEN essv < $thresh THEN
       |      list_transform(
       |        list_transform(generate_series(0, ${np - 1}), ii ->
       |          (ii + ${u(2, "t - 1", "ii")}) / ${np}.0),
       |        pos -> p2[least(len(list_filter(cums, cv -> cv < pos)), ${np - 1}) + 1])
       |    ELSE p2 END AS parts
       |  FROM (
       |    SELECT user_id, t, p2, wt, filt, essv,
       |      (list_reduce(list_prepend([0.0::DOUBLE],
       |        list_transform(wt, ww -> [ww])),
       |        (ca, cw) -> list_append(ca, ca[len(ca)] + cw[1])))[2:] AS cums
       |    FROM (
       |      SELECT user_id, t, p2, wt,
       |        list_reduce(list_prepend(0.0::DOUBLE,
       |          list_transform(generate_series(1, $np), ii ->
       |            p2[ii::INT] * wt[ii::INT])), (sa, sb) -> sa + sb) AS filt,
       |        1.0 / list_reduce(list_prepend(0.0::DOUBLE,
       |          list_transform(wt, ww -> ww * ww)), (sa, sb) -> sa + sb) AS essv
       |      FROM (
       |        SELECT user_id, t, p2,
       |          CASE WHEN wsum > 0 THEN list_transform(w, ww -> ww / wsum)
       |            ELSE list_transform(w, ww -> 1.0 / ${np}.0) END AS wt
       |        FROM (
       |          SELECT user_id, t, p2, w,
       |            list_reduce(list_prepend(0.0::DOUBLE, w), (sa, sb) -> sa + sb) AS wsum
       |          FROM (
       |            SELECT user_id, t, p2,
       |              list_transform(lw, lv -> exp(lv - mw)) AS w
       |            FROM (
       |              SELECT user_id, t, p2, lw, list_max(lw) AS mw
       |              FROM (
       |                SELECT user_id, t, p2,
       |                  list_transform(p2, pp ->
       |                    $logNorm - (0.5 * ((yt - pp) / $so)) * ((yt - pp) / $so)) AS lw
       |                FROM (
       |                  SELECT c.user_id, c.t + 1 AS t, vv.vs[(c.t + 1)::INT] AS yt,
       |                    CASE WHEN c.t > 0 THEN
       |                      list_transform(generate_series(0, ${np - 1}), ii ->
       |                        c.parts[ii + 1] + $sl * ${g(1, "c.t", "ii")})
       |                    ELSE c.parts END AS p2
       |                  FROM st c JOIN v vv ON vv.user_id = c.user_id
       |                  WHERE c.t < vv.n
       |                ) q1
       |              ) q2
       |            ) q3
       |          ) q4
       |        ) q5
       |      ) q6
       |    ) q7
       |  ) q8
       |)
       |SELECT s2.user_id, make_timestamp(vv.tss[s2.t]) AS ts,
       |  round(s2.filt, 6) AS filtered, round(s2.ess, 6) AS ess
       |FROM st s2 JOIN v vv ON vv.user_id = s2.user_id
       |WHERE s2.t >= 1""".stripMargin
  }

  /** ts_mcmc_fc replay: the FULL Metropolis-Hastings AR(p) chain of
    * Bayesian.mhSampleDet — proposals (stream 0), the AR log-posterior
    * re-evaluated per iteration over the raw series, the log-uniform
    * accept test (stream 1), post-burn-in sample collection — then the
    * posterior-predictive paths of arForecastPathsDet (stream 2, seed+1)
    * and the per-step sorted-quantile summary. Only the chain INIT x0
    * (mean/sd + OLS AR fit) is pinned; ln/pow enter lone accept
    * comparisons (boundary-robust), every kept number is IEEE arithmetic
    * in kernel order. */
  def mcmcSql(x0Pins: Seq[(Long, Array[Double])], h: Int, p: Int,
      nSamples: Int, burnIn: Int, coverage: Double, seed: Long): String = {
    require(p == 2, "mcmcSql replays the p = 2 query instance")
    val sc = DetRng.seedConst(seed)
    val sc2 = DetRng.seedConst(seed + 1)
    val total = nSamples + burnIn
    val lo = (1 - coverage) / 2
    val loIdx = math.max(0, math.round(lo * (nSamples - 1)).toInt) + 1
    val hiIdx = math.min(nSamples - 1, math.round((1 - lo) * (nSamples - 1)).toInt) + 1
    val twoPi = dlit(2 * math.Pi)
    val xRows = x0Pins.map { case (u, x) =>
      s"($u::BIGINT, [${x.map(dlit).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n  ")
    // arLogpost(sig, mu, f1, f2) over the series list `vs` (length n)
    def lpExpr(sig: String, mu: String, f1: String, f2: String): String =
      s"""(CASE WHEN $sig <= 0 THEN '-infinity'::DOUBLE ELSE
         |  list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(generate_series(3, len(vs)), tt ->
         |      (-0.5 * ln(($twoPi * $sig) * $sig))
         |      - (0.5 * ((vs[tt::INT] - (($mu + $f1 * (vs[tt::INT - 1] - $mu)) + $f2 * (vs[tt::INT - 2] - $mu))) * (1.0 / $sig)))
         |        * ((vs[tt::INT] - (($mu + $f1 * (vs[tt::INT - 1] - $mu)) + $f2 * (vs[tt::INT - 2] - $mu))) * (1.0 / $sig)))),
         |    (la, lb) -> la + lb)
         |  + ((-0.5 * pow($sig / 10.0, 2) - 0.5 * pow($mu / 100.0, 2))
         |     + (-0.5 * $f1 * $f1) + (-0.5 * $f2 * $f2))
         |END)""".stripMargin
    val it = "(x[1])::INT"
    val propG = gaussExpr(ctr(0, it, "jj - 1"), sc)
    val acceptU = uniformExpr(ctr(1, it, "0"), sc)
    val pathG = gaussExpr(ctr(2, "si", "(x[1])::INT - 1"), sc2)
    s"""WITH s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs,
       |  count(*)::INT AS n FROM events GROUP BY user_id),
       |x0 AS (SELECT * FROM (VALUES
       |  $xRows
       |) AS __x(user_id, xi)),
       |prep AS (SELECT s.user_id, s.vs, s.n, x0.xi,
       |  list_transform(x0.xi, xv -> greatest(abs(xv) * 0.02, 1e-4)) AS scl
       |  FROM s JOIN x0 ON x0.user_id = s.user_id),
       |chain AS (SELECT user_id, vs, n, list_reduce(
       |  list_prepend(list_concat(xi, [${lpExpr("xi[1]", "xi[2]", "xi[3]", "xi[4]")}]),
       |    list_transform(generate_series(0, ${total - 1}), it2 -> [it2::DOUBLE])),
       |  (acc, x) ->
       |    list_transform([list_transform(generate_series(1, 4), jj ->
       |        acc[jj::INT] + scl[jj::INT] * $propG)], pr ->
       |      list_transform([[${lpExpr("pr[1]", "pr[2]", "pr[3]", "pr[4]")}]], lpp ->
       |        list_transform([CASE WHEN ln($acceptU) < lpp[1] - acc[5]
       |            THEN list_concat([pr[1], pr[2], pr[3], pr[4]], [lpp[1]])
       |            ELSE acc[1:5] END], nh ->
       |          list_concat(nh, list_concat(acc[6:],
       |            CASE WHEN $it >= $burnIn THEN nh[1:4] ELSE []::DOUBLE[] END))
       |        )[1])[1])[1]) AS ch
       |  FROM prep),
       |paths AS (SELECT user_id, list_transform(generate_series(0, ${nSamples - 1}), si ->
       |  (list_reduce(
       |    list_prepend([vs[(n - 1)::INT], vs[n::INT]],
       |      list_transform(generate_series(1, $h), st2 -> [st2::DOUBLE])),
       |    (hh, x) -> list_append(hh,
       |      ((ch[(7 + si * 4)::INT]
       |        + ch[(8 + si * 4)::INT] * (hh[len(hh)] - ch[(7 + si * 4)::INT]))
       |        + ch[(9 + si * 4)::INT] * (hh[len(hh) - 1] - ch[(7 + si * 4)::INT]))
       |      + abs(ch[(6 + si * 4)::INT]) * $pathG)
       |  ))[3:]) AS pth
       |  FROM chain),
       |stepv AS (SELECT user_id, unnest(generate_series(1, $h)) AS step, pth FROM paths),
       |qs AS (SELECT user_id, step,
       |  list_sort(list_transform(pth, pp -> pp[step::INT])) AS colv
       |  FROM stepv),
       |agg AS (SELECT user_id, step,
       |  list_reduce(list_prepend(0.0::DOUBLE, colv), (sa, sb) -> sa + sb) / ${nSamples}.0 AS m,
       |  colv[$loIdx] AS lov, colv[$hiIdx] AS hiv FROM qs),
       |lastt AS (SELECT user_id, max(epoch_us(ts)) AS us FROM events GROUP BY user_id),
       |d AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, epoch_us(ts) AS us, lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS lus FROM events)
       |  WHERE lus IS NOT NULL GROUP BY user_id)
       |SELECT a.user_id, a.step::INT AS step, make_timestamp(l.us + a.step * d.freq) AS ts,
       |  round(a.m, 6) AS y_hat, round(a.lov, 6) AS y_hat_lower,
       |  round(a.hiv, 6) AS y_hat_upper
       |FROM agg a JOIN lastt l ON l.user_id = a.user_id
       |JOIN d ON d.user_id = a.user_id""".stripMargin
  }

  /** ts_bayesian_ets_intervals replay: the SES-MAP Metropolis chain of
    * Bayesian.bayesianEtsForecast — proposals/accepts (mhSampleDet
    * streams 0/1) with the SES log-posterior re-evaluated per iteration,
    * post-burn-in samples, per-sample level recursion +
    * posterior-predictive noise (stream 2, seed+1), sorted-quantile
    * intervals, and the MAP plug-in point forecast from the pinned α.
    * Only the NM MAP triple is pinned (the ts_bayesian_ets discipline);
    * exp/ln enter accept tests (boundary-robust) and α/σ transforms whose
    * ulps the r6 rounding absorbs. */
  def bayesianEtsIntervalsSql(pins: Seq[(Long, Array[Double])], h: Int,
      nSamples: Int, coverage: Double, seed: Long): String = {
    val sc = DetRng.seedConst(seed)
    val sc2 = DetRng.seedConst(seed + 1)
    val burnIn = nSamples / 2
    val total = nSamples + burnIn
    val lo = (1 - coverage) / 2
    val loIdx = math.max(0, math.round(lo * (nSamples - 1)).toInt) + 1
    val hiIdx = math.min(nSamples - 1, math.round((1 - lo) * (nSamples - 1)).toInt) + 1
    val twoPi = dlit(2 * math.Pi)
    val xRows = pins.map { case (u, x) =>
      s"($u::BIGINT, [${x.map(dlit).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n  ")
    // sesLogpost(la, l0, ls) over `vs`: [level, ll] fold + weak priors
    def lpExpr(la: String, l0: String, ls: String): String =
      s"""list_transform([[1.0 / (1.0 + exp(-($la))), exp($ls)]], ap ->
         |  CASE WHEN ap[2] <= 0 THEN '-infinity'::DOUBLE ELSE
         |    (list_reduce(list_prepend([$l0, 0.0::DOUBLE],
         |      list_transform(vs, yv -> [yv::DOUBLE])),
         |      (lv, yx) -> [ap[1] * yx[1] + (1.0 - ap[1]) * lv[1],
         |        lv[2] + ((-0.5 * ln(($twoPi * ap[2]) * ap[2]))
         |          - (0.5 * ((yx[1] - lv[1]) / ap[2])) * ((yx[1] - lv[1]) / ap[2]))]))[2]
         |    - 0.5 * pow((($l0) - vs[1]) / 100.0, 2)
         |    - 0.5 * pow(($ls) / 10.0, 2)
         |  END)[1]""".stripMargin
    val it = "(x[1])::INT"
    val propG = gaussExpr(ctr(0, it, "jj - 1"), sc)
    val acceptU = uniformExpr(ctr(1, it, "0"), sc)
    val pathG = gaussExpr(ctr(2, "si", "(st2 - 1)"), sc2)
    s"""WITH s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs,
       |  count(*)::INT AS n FROM events GROUP BY user_id),
       |x0 AS (SELECT * FROM (VALUES
       |  $xRows
       |) AS __x(user_id, xi)),
       |prep AS (SELECT s.user_id, s.vs, s.n, x0.xi,
       |  list_transform(x0.xi[1:3], xv -> greatest(abs(xv) * 0.02, 1e-4)) AS scl
       |  FROM s JOIN x0 ON x0.user_id = s.user_id),
       |chain AS (SELECT user_id, vs, n, xi, list_reduce(
       |  list_prepend(list_concat(xi[1:3], [${lpExpr("xi[1]", "xi[2]", "xi[3]")}]),
       |    list_transform(generate_series(0, ${total - 1}), it2 -> [it2::DOUBLE])),
       |  (acc, x) ->
       |    list_transform([list_transform(generate_series(1, 3), jj ->
       |        acc[jj::INT] + scl[jj::INT] * $propG)], pr ->
       |      list_transform([[${lpExpr("pr[1]", "pr[2]", "pr[3]")}]], lpp ->
       |        list_transform([CASE WHEN ln($acceptU) < lpp[1] - acc[4]
       |            THEN list_concat([pr[1], pr[2], pr[3]], [lpp[1]])
       |            ELSE acc[1:4] END], nh ->
       |          list_concat(nh, list_concat(acc[5:],
       |            CASE WHEN $it >= $burnIn THEN nh[1:3] ELSE []::DOUBLE[] END))
       |        )[1])[1])[1]) AS ch
       |  FROM prep),
       |paths AS (SELECT user_id, vs, xi, ch,
       |  list_transform(generate_series(0, ${nSamples - 1}), si ->
       |    list_transform([[1.0 / (1.0 + exp(-ch[(5 + si * 3)::INT]))]], av ->
       |      list_transform([[av[1],
       |          (list_reduce(list_prepend([ch[(6 + si * 3)::INT]],
       |            list_transform(vs, yv -> [yv::DOUBLE])),
       |            (lv, yx) -> [av[1] * yx[1] + (1.0 - av[1]) * lv[1]]))[1],
       |          exp(ch[(7 + si * 3)::INT])]], pv ->
       |        list_transform(generate_series(1, $h), st2 ->
       |          pv[2] + pv[3] * $pathG)
       |      )[1])[1]) AS pth
       |  FROM chain),
       |yh AS (SELECT user_id, xi,
       |  (list_reduce(list_prepend([xi[2]],
       |    list_transform(vs, yv -> [yv::DOUBLE])),
       |    (lv, yx) -> [xi[4] * yx[1] + (1.0 - xi[4]) * lv[1]]))[1] AS map_level,
       |  pth FROM paths),
       |stepv AS (SELECT user_id, map_level, unnest(generate_series(1, $h)) AS step, pth FROM yh),
       |qs AS (SELECT user_id, map_level, step,
       |  list_sort(list_transform(pth, pp -> pp[step::INT])) AS colv
       |  FROM stepv),
       |agg AS (SELECT user_id, step, map_level,
       |  colv[$loIdx] AS lov, colv[$hiIdx] AS hiv FROM qs),
       |lastt AS (SELECT user_id, max(epoch_us(ts)) AS us FROM events GROUP BY user_id),
       |d AS (SELECT user_id, min(us - lus) AS freq FROM
       |  (SELECT user_id, epoch_us(ts) AS us, lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS lus FROM events)
       |  WHERE lus IS NOT NULL GROUP BY user_id)
       |SELECT a.user_id, a.step::INT AS step, make_timestamp(l.us + a.step * d.freq) AS ts,
       |  round(a.map_level, 6) AS y_hat, round(a.lov, 6) AS y_hat_lower,
       |  round(a.hiv, 6) AS y_hat_upper
       |FROM agg a JOIN lastt l ON l.user_id = a.user_id
       |JOIN d ON d.user_id = a.user_id""".stripMargin
  }

  /** ts_chronos_fc replay (ops.Foundation.chronosSample): Chronos
    * tokenization (ascending-fold mean-|y| scale, clip, uniform bins) →
    * context-fitted bigram/unigram CDF tables → h unrolled
    * autoregressive steps, each picking the first ascending token whose
    * inclusive cumulative fraction reaches the step's DetRng uniform
    * (unigram backoff on an unseen previous token, SAME draw) → bin-
    * center de-quantization → np-style linear-interpolation quantiles
    * over the sample paths (rank/frac literals computed with the
    * kernel's own arithmetic). Output:
    * (user_id, step, ts, y_hat, y_hat_lower, y_hat_upper). */
  def chronosFcSql(h: Int, numSamples: Int, coverage: Double, nBins: Int,
      low: Double, high: Double, seed: Long, subsetUsers: Long): String = {
    val sc = DetRng.seedConst(seed)
    val w = (high - low) / nBins
    val ctes = collection.mutable.ArrayBuffer.empty[String]
    ctes += s"s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs" +
      s" FROM events WHERE user_id < $subsetUsers GROUP BY user_id)"
    ctes += """meta AS (SELECT user_id, max(us) AS last_us, min(us - lus) AS freq FROM
      |  (SELECT user_id, epoch_us(ts) AS us,
      |     lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lus
      |   FROM events) GROUP BY user_id)""".stripMargin
    // mean-|y| scale: ascending list fold (meanAbsScale order)
    ctes += """scm AS (SELECT user_id, vs,
      |  list_reduce(list_prepend(0.0::DOUBLE, list_transform(vs, v -> abs(v))),
      |    (a, b) -> a + b) / len(vs) AS m FROM s)""".stripMargin
    ctes += "scl AS (SELECT user_id, vs, CASE WHEN m > 0.0 AND isfinite(m) " +
      "THEN m ELSE 1.0 END AS scale FROM scm)"
    ctes += s"tk AS (SELECT user_id, scale, list_transform(vs, v -> " +
      s"least(${nBins - 1}, floor((least(${dlit(high)}, greatest(${dlit(low)}, " +
      s"v / scale)) - ${dlit(low)}) / ${dlit(w)}))::INT) AS toks FROM scl)"
    // bigram transition CDF (ascending next-token order, inclusive cumsum)
    ctes += "ix AS (SELECT user_id, toks, " +
      "unnest(generate_series(1, len(toks) - 1)) AS i FROM tk)"
    ctes += "tcnt AS (SELECT user_id, toks[i::INT] AS prev, " +
      "toks[i::INT + 1] AS nxt, count(*)::BIGINT AS c FROM ix GROUP BY 1, 2, 3)"
    ctes += """tcdf AS (SELECT user_id, prev, nxt,
      |  sum(c) OVER (PARTITION BY user_id, prev ORDER BY nxt)::DOUBLE AS cum,
      |  sum(c) OVER (PARTITION BY user_id, prev)::DOUBLE AS tot FROM tcnt)""".stripMargin
    // unigram backoff CDF
    ctes += "ut AS (SELECT user_id, unnest(toks) AS t FROM tk)"
    ctes += "ucnt AS (SELECT user_id, t, count(*)::BIGINT AS c FROM ut GROUP BY 1, 2)"
    ctes += """ucdf AS (SELECT user_id, t AS nxt,
      |  sum(c) OVER (PARTITION BY user_id ORDER BY t)::DOUBLE AS cum,
      |  sum(c) OVER (PARTITION BY user_id)::DOUBLE AS tot FROM ucnt)""".stripMargin
    ctes += s"st0 AS (SELECT tk.user_id, k.samp, toks[len(toks)] AS prev " +
      s"FROM tk CROSS JOIN (SELECT unnest(generate_series(0, ${numSamples - 1})) " +
      s"AS samp) k)"
    for (j <- 1 to h) {
      val u = uniformExpr(ctr(55, j.toString, "s.samp"), sc)
      ctes += s"""st$j AS (SELECT s.user_id, s.samp,
        |  coalesce(
        |    (SELECT min(c.nxt) FROM tcdf c WHERE c.user_id = s.user_id
        |       AND c.prev = s.prev AND c.cum / c.tot >= $u),
        |    (SELECT min(c.nxt) FROM ucdf c WHERE c.user_id = s.user_id
        |       AND c.cum / c.tot >= $u)) AS prev
        |  FROM st${j - 1} s)""".stripMargin
    }
    ctes += (1 to h).map(j =>
      s"SELECT user_id, samp, $j AS step, prev AS tok FROM st$j")
      .mkString("vals AS (", " UNION ALL ", ")")
    ctes += s"vv AS (SELECT v.user_id, v.step, v.samp, " +
      s"(${dlit(low)} + (v.tok + 0.5) * ${dlit(w)}) * t.scale AS val " +
      s"FROM vals v JOIN tk t ON v.user_id = t.user_id)"
    ctes += "rk AS (SELECT user_id, step, val, row_number() OVER " +
      "(PARTITION BY user_id, step ORDER BY val) AS rk FROM vv)"
    // np.quantile linear interpolation with the kernel's own rank/frac
    // arithmetic baked in as literals
    def qsel(q: Double, as: String): String = {
      val r = (numSamples - 1) * q
      val lo = math.floor(r).toInt
      val hi = math.min(lo + 1, numSamples - 1)
      val frac = r - lo
      val a = s"max(CASE WHEN rk = ${lo + 1} THEN val END)"
      val b = s"max(CASE WHEN rk = ${hi + 1} THEN val END)"
      s"$a + ${dlit(frac)} * ($b - $a) AS $as"
    }
    val alpha = (1 - coverage) / 2
    ctes += s"qs AS (SELECT user_id, step, ${qsel(0.5, "med")}, " +
      s"${qsel(alpha, "lov")}, ${qsel(1 - alpha, "hiv")} " +
      "FROM rk GROUP BY user_id, step)"
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT q.user_id, q.step::BIGINT AS step,
       |  make_timestamp(m.last_us + q.step * m.freq) AS ts,
       |  round(q.med + 1e-9, 6) AS y_hat,
       |  round(q.lov + 1e-9, 6) AS y_hat_lower,
       |  round(q.hiv + 1e-9, 6) AS y_hat_upper
       |FROM qs q JOIN meta m ON q.user_id = m.user_id""".stripMargin
  }

  /** ts_chronos_embed replay: the ts_chronos_tokens arithmetic (round-6
    * scale, clamp, floor-bin) feeding a per-token DetRng embedding
    * lookup, mean-pooled per series. Each emb_j is one avg over
    * `2·uniform(tok·dim+j)−1` — the draw chain is
    * [[uniformExpr]], bit-exact to the engine's Mix64 expression. */
  def chronosEmbedSql(dim: Int, seed: Long, nBins: Int, low: Double,
      high: Double): String = {
    val sc = DetRng.seedConst(seed)
    val w = dlit((high - low) / nBins)
    val cols = (0 until dim).map { j =>
      val u = uniformExpr(s"token_id::BIGINT * $dim + $j", sc)
      s"round(avg(2.0 * $u - 1.0), 6) AS emb_$j"
    }.mkString(",\n  ")
    s"""WITH b AS (SELECT user_id, value,
       |    round(avg(abs(value)) OVER (PARTITION BY user_id), 6) AS m
       |  FROM events),
       |t AS (SELECT user_id, value,
       |    CASE WHEN m > 0.0 THEN m ELSE 1.0 END AS scale FROM b),
       |tok AS (SELECT user_id,
       |    CASE WHEN value IS NULL THEN NULL ELSE
       |    least(${nBins - 1}, floor((least(${dlit(high)}, greatest(
       |      ${dlit(low)}, value / scale)) - ${dlit(low)}) / $w))::INT END
       |      AS token_id FROM t)
       |SELECT user_id,
       |  $cols
       |FROM tok GROUP BY user_id""".stripMargin
  }

  /** ts_moment_embed replay: round-6 instance normalization, length-P
    * patchification by position arithmetic, per-patch projection sums
    * through the same DetRng table, softsign, patch-mean pool. The
    * softsign (not tanh) keeps the whole chain arithmetic-only — no
    * libm call whose ulps could differ across engines. */
  def momentEmbedSql(dim: Int, patchLen: Int, seed: Long): String = {
    val sc = DetRng.seedConst(seed)
    val sums = (0 until dim).map { j =>
      val e = uniformExpr(s"k * $dim + $j", sc)
      s"sum(z * (2.0 * $e - 1.0)) AS s_$j"
    }.mkString(",\n  ")
    val pools = (0 until dim).map { j =>
      s"round(avg(s_$j / (1.0 + abs(s_$j))), 6) AS emb_$j"
    }.mkString(",\n  ")
    s"""WITH b AS (SELECT user_id, value,
       |    round(avg(value) OVER (PARTITION BY user_id), 6) AS mu,
       |    round(coalesce(stddev(value) OVER (PARTITION BY user_id),
       |      0.0), 6) AS sd,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) - 1 AS pos
       |  FROM events),
       |z AS (SELECT user_id,
       |    (value - mu) / (CASE WHEN sd > 0.0 THEN sd ELSE 1.0 END) AS z,
       |    pos // $patchLen AS p, (pos % $patchLen)::BIGINT AS k FROM b),
       |ps AS (SELECT user_id, p,
       |  $sums
       |  FROM z GROUP BY user_id, p)
       |SELECT user_id,
       |  $pools
       |FROM ps GROUP BY user_id""".stripMargin
  }
}
