package graft.ops

import graft.core.PanelCols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-engineering operators (reference polars_ts/features): pure
  * Catalyst expressions — window functions and arithmetic, no UDFs, fully
  * codegen'd. Column naming follows the reference's templates so a user of
  * polars-ts sees identical schemas: `{y}_lag_{k}`, `{y}_rolling_{agg}_{w}`,
  * `fourier_sin_{period}_{k}`, `{cat}_encoded`, `{a}_x_{b}`.
  */
object Features {

  /** `{y}_lag_k` per k. Reference features/lags.py:8-42. */
  def lagFeatures(df: DataFrame, lags: Seq[Int])(implicit pc: PanelCols): DataFrame =
    covariateLagFeatures(df, Seq(pc.target), lags)

  /** Lags over arbitrary covariate columns. Reference features/lags.py:45-79. */
  def covariateLagFeatures(df: DataFrame, cols: Seq[String], lags: Seq[Int])(
      implicit pc: PanelCols): DataFrame = {
    require(lags.forall(_ > 0), "All lag values must be positive integers")
    val w = pc.w
    cols.foldLeft(df) { (d, c) =>
      lags.foldLeft(d)((d2, k) => d2.withColumn(s"${c}_lag_$k", lag(col(c), k).over(w)))
    }
  }

  private val supportedRollingAggs =
    Set("mean", "std", "min", "max", "sum", "median", "var")

  /** `{y}_rolling_{agg}_{w}` with `min_samples` null-gating and optional
    * centred window (odd window sizes). Reference features/rolling.py:12-72.
    * All aggs — including median (exact percentile) — run as window
    * aggregates inside whole-stage codegen; no per-group collection. */
  /** Exponentially weighted moving mean/variance — polars
    * `ewm_mean`/`ewm_var`. `adjust = true` (polars default) computes the
    * weighted-moment form `Σ(1−α)^(t−i)·y_i / Σ(1−α)^(t−i)` via a Horner
    * fold of the numerators (no `(1−α)^−i` blow-up, so arbitrarily long
    * series are safe); `adjust = false` is the `m_t = (1−α)m + αy`
    * recursion seeded at `y_0`. Variance is the biased weighted second
    * moment, clamped at 0. One grouped shuffle; the fold is sequential
    * per series — the contract every per-series kernel in this engine
    * shares.
    *
    * Output is the NARROW frame `(id, time, <target>_ewm_mean,
    * <target>_ewm_var)` — unlike the window-based siblings (lag/rolling),
    * the grouped fold does not carry covariate columns; join back on
    * `(id, time)` to attach them. (Appending in place would need the
    * tie-break columns threaded through the grouped explode — not worth
    * a schema break while the oracle pins this shape.) */
  def ewmFeatures(df: DataFrame, alpha: Double, adjust: Boolean = true)(
      implicit pc: PanelCols): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"ewm alpha must be in (0,1], got $alpha")
    val fold = udf((ys: Seq[Double]) => {
      val n = ys.length
      val out = new Array[Array[Double]](n)
      if (adjust) {
        var num = 0.0; var num2 = 0.0; var den = 0.0
        var i = 0
        while (i < n) {
          num = (1 - alpha) * num + ys(i)
          num2 = (1 - alpha) * num2 + ys(i) * ys(i)
          den = (1 - alpha) * den + 1.0
          val m = num / den
          out(i) = Array(m, math.max(num2 / den - m * m, 0.0))
          i += 1
        }
      } else if (n > 0) {
        var m = ys(0); var m2 = ys(0) * ys(0)
        out(0) = Array(m, 0.0)
        var i = 1
        while (i < n) {
          m = (1 - alpha) * m + alpha * ys(i)
          m2 = (1 - alpha) * m2 + alpha * ys(i) * ys(i)
          out(i) = Array(m, math.max(m2 - m * m, 0.0))
          i += 1
        }
      }
      out
    })
    graft.core.Panel.grouped(df)
      .withColumn("__ewm", fold(col("ys")))
      .select(pc.idCol, posexplode(arrays_zip(col("ts"), col("__ewm")))
        .as(Seq("__i", "__z")))
      .select(pc.idCol, col("__z.ts").as(pc.time),
        col("__z.__ewm").getItem(0).as(s"${pc.target}_ewm_mean"),
        col("__z.__ewm").getItem(1).as(s"${pc.target}_ewm_var"))
  }

  /** Duration-based rolling aggregates — polars `rolling_*_by`: each row
    * aggregates over the trailing half-open time window `(t − windowUs, t]`
    * regardless of row density (irregular series included). A RANGE frame
    * over epoch-µs, not a ROWS frame — so the one shuffle + sort is the
    * same as any per-series window, and duplicate timestamps are peers in
    * BOTH engines (deterministic oracle). */
  def rollingByTime(df: DataFrame, windowUs: Long,
      aggs: Seq[String] = Seq("mean", "min", "max", "count"))(
      implicit pc: PanelCols): DataFrame = {
    require(windowUs > 0, "rollingByTime: windowUs must be positive")
    aggs.foreach(a => require(supportedRollingAggs(a) || a == "count",
      s"Unsupported aggregation '$a'"))
    // epoch-µs ordering key: timestamps convert via unix_micros; numeric
    // time columns are taken as µs directly (casting a long through
    // TIMESTAMP would silently reinterpret it as SECONDS)
    val orderKey = df.schema(pc.time).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType |
           org.apache.spark.sql.types.DateType =>
        unix_micros(pc.timeCol.cast("timestamp"))
      case _ => pc.timeCol.cast("long")
    }
    val frame = org.apache.spark.sql.expressions.Window
      .partitionBy(pc.idCol)
      .orderBy(orderKey)
      .rangeBetween(-(windowUs - 1), 0)
    aggs.foldLeft(df) { (d, agg) =>
      val e = agg match {
        case "mean" => avg(pc.targetCol).over(frame)
        case "std" => stddev_samp(pc.targetCol).over(frame)
        case "var" => var_samp(pc.targetCol).over(frame)
        case "min" => min(pc.targetCol).over(frame)
        case "max" => max(pc.targetCol).over(frame)
        case "sum" => sum(pc.targetCol).over(frame)
        case "count" => count(pc.targetCol).over(frame)
        case "median" => percentile(pc.targetCol, lit(0.5)).over(frame)
      }
      d.withColumn(s"${pc.target}_troll_$agg", e)
    }
  }

  def rollingFeatures(df: DataFrame, windows: Seq[Int], aggs: Seq[String] = Seq("mean", "std", "min", "max"),
      center: Boolean = false, minSamples: Int = -1)(implicit pc: PanelCols): DataFrame = {
    aggs.foreach(a => require(supportedRollingAggs(a), s"Unsupported aggregation '$a'"))
    require(windows.forall(_ > 0), "All window sizes must be positive integers")
    val w0 = pc.w
    windows.foldLeft(df) { (d, n) =>
      val frame =
        if (center) w0.rowsBetween(-((n - 1) / 2), n / 2)
        else w0.rowsBetween(-(n - 1), 0)
      val mp = if (minSamples > 0) minSamples else n
      val cnt = count(pc.targetCol).over(frame)
      def gate(e: Column): Column = when(cnt >= mp, e)
      aggs.foldLeft(d) { (d2, agg) =>
        val e = agg match {
          case "mean" => avg(pc.targetCol).over(frame)
          case "std" => stddev_samp(pc.targetCol).over(frame)
          case "var" => var_samp(pc.targetCol).over(frame)
          case "min" => min(pc.targetCol).over(frame)
          case "max" => max(pc.targetCol).over(frame)
          case "sum" => sum(pc.targetCol).over(frame)
          case "median" => percentile(pc.targetCol, lit(0.5)).over(frame)
        }
        d2.withColumn(s"${pc.target}_rolling_${agg}_$n", gate(e))
      }
    }
  }

  /** Monday-first weekday 1..7 matching Polars `dt.weekday()` (Spark's
    * `dayofweek` is Sunday-first — SURVEY §7.5 risk #5). */
  def weekdayMondayFirst(c: Column): Column = ((dayofweek(c) + 5) % 7) + 1

  private def calendarExtractors(t: Column): Map[String, Column] = Map(
    "day_of_week" -> weekdayMondayFirst(t),
    "day_of_month" -> dayofmonth(t),
    "day_of_year" -> dayofyear(t),
    "week" -> weekofyear(t),
    "month" -> month(t),
    "quarter" -> quarter(t),
    "year" -> year(t),
    "hour" -> hour(t),
    "minute" -> minute(t),
    "is_weekend" -> (weekdayMondayFirst(t) >= 6).cast("tinyint"))

  /** Calendar feature columns. Reference features/calendar.py:9-57. */
  def calendarFeatures(df: DataFrame, features: Seq[String] = Seq(
      "day_of_week", "day_of_month", "day_of_year", "week", "month",
      "quarter", "year", "is_weekend"))(implicit pc: PanelCols): DataFrame = {
    val ex = calendarExtractors(pc.timeCol)
    features.foldLeft(df) { (d, f) =>
      require(ex.contains(f), s"Unknown calendar feature '$f'")
      d.withColumn(f, ex(f))
    }
  }

  /** sin/cos(2π·k·t/period) with t = within-series row index.
    * Reference features/fourier.py:10-58. */
  def fourierFeatures(df: DataFrame, period: Double, k: Int)(implicit pc: PanelCols): DataFrame = {
    require(period > 0, "period must be positive")
    require(k > 0, "k must be positive")
    val t = (row_number().over(pc.w) - 1).cast("double")
    val d2 = df.withColumn("__t", t)
    (1 to k).foldLeft(d2) { (d, kk) =>
      val angle = lit(2.0 * math.Pi * kk) * col("__t") / lit(period)
      d.withColumn(s"fourier_sin_${fmtNum(period)}_$kk", sin(angle))
        .withColumn(s"fourier_cos_${fmtNum(period)}_$kk", cos(angle))
    }.drop("__t")
  }

  private def fmtNum(d: Double): String =
    if (d == math.rint(d)) d.toLong.toString else d.toString

  /** Smoothed mean target encoding (n·mean + s·global)/(n + s) as
    * `{cat}_encoded`. Reference features/advanced.py:11-54. The per-category
    * table is tiny — broadcast both joins so the fact table never shuffles. */
  def targetEncode(df: DataFrame, catCol: String, smoothing: Double = 10.0)(
      implicit pc: PanelCols): DataFrame = {
    val globalMean = df.agg(avg(pc.targetCol).as("__gmean"))
    val stats = df.groupBy(col(catCol)).agg(
        avg(pc.targetCol).as("__cat_mean"), count(pc.targetCol).as("__cat_n"))
      .crossJoin(broadcast(globalMean))
      .select(col(catCol),
        ((col("__cat_n") * col("__cat_mean") + lit(smoothing) * col("__gmean")) /
          (col("__cat_n") + lit(smoothing))).as(s"${catCol}_encoded"))
    df.join(broadcast(stats), Seq(catCol), "left")
  }

  /** Pairwise products (`{a}_x_{b}`) or sums (`{a}_plus_{b}`).
    * Reference features/advanced.py:116-144. */
  def interactionFeatures(df: DataFrame, cols: Seq[(String, String)],
      method: String = "multiply"): DataFrame = {
    require(method == "multiply" || method == "add", s"method must be 'multiply' or 'add', got '$method'")
    cols.foldLeft(df) { case (d, (a, b)) =>
      if (method == "multiply") d.withColumn(s"${a}_x_$b", col(a) * col(b))
      else d.withColumn(s"${a}_plus_$b", col(a) + col(b))
    }
  }

  /** Cyclical sin/cos embeddings of calendar components with fixed periods
    * (`{comp}_sin`, `{comp}_cos`). Reference features/advanced.py:147-191. */
  def timeEmbeddings(df: DataFrame, components: Seq[String] = Seq("hour", "day_of_week", "month"))(
      implicit pc: PanelCols): DataFrame = {
    val t = pc.timeCol
    // (value, period) per component; zero-based phase like the reference
    val specs: Map[String, (Column, Double)] = Map(
      "hour" -> (hour(t).cast("double"), 24.0),
      "day_of_week" -> ((weekdayMondayFirst(t) - 1).cast("double"), 7.0),
      "day_of_month" -> ((dayofmonth(t) - 1).cast("double"), 31.0),
      "month" -> ((month(t) - 1).cast("double"), 12.0),
      "minute" -> (minute(t).cast("double"), 60.0),
      "day_of_year" -> ((dayofyear(t) - 1).cast("double"), 366.0))
    components.foldLeft(df) { (d, comp) =>
      require(specs.contains(comp), s"Unknown component '$comp'")
      val (v, period) = specs(comp)
      val angle = lit(2.0 * math.Pi) * v / lit(period)
      d.withColumn(s"${comp}_sin", sin(angle)).withColumn(s"${comp}_cos", cos(angle))
    }
  }

  /** Binary `is_holiday` from a provided holiday-date set (the reference
    * delegates to the `holidays` package — here the dates table is an
    * input; broadcast-joined against the panel).
    * Reference features/advanced.py:57-113. */
  /** Holiday indicator + optional distance features (reference
    * features/advanced.py:47-110: `days_to_holiday` = days to the first
    * holiday ≥ date, `days_since_holiday` = days since the last holiday
    * ≤ date, 365 when none exists on that side). The holiday list is
    * calendar metadata — a literal array in the plan, so both features
    * are pure scan-speed expressions with no join or shuffle. */
  def holidayFeatures(df: DataFrame, holidays: Seq[java.sql.Date],
      distance: Boolean = false)(implicit pc: PanelCols): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // distinct: a date present twice (e.g. two merged calendars) would
    // fan out every panel row on it through the join, silently
    // duplicating rows in all downstream aggregates
    val h = holidays.map(_.toString).distinct
      .toDF("__hdate").withColumn("__is_h", lit(1))
    val base = df.withColumn("__hdate", date_format(pc.timeCol, "yyyy-MM-dd"))
      .join(broadcast(h), Seq("__hdate"), "left")
      .withColumn("is_holiday", coalesce(col("__is_h"), lit(0)).cast("tinyint"))
      .drop("__hdate", "__is_h")
    if (!distance) base
    else {
      val hArr = array(holidays.map(d => lit(d.toString).cast("date")): _*)
      val dcol = to_date(pc.timeCol)
      base
        .withColumn("days_to_holiday", coalesce(
          array_min(transform(filter(hArr, hd => hd >= dcol),
            hd => datediff(hd, dcol))), lit(365)).cast("int"))
        .withColumn("days_since_holiday", coalesce(
          array_min(transform(filter(hArr, hd => hd <= dcol),
            hd => datediff(dcol, hd))), lit(365)).cast("int"))
    }
  }
}
