package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Temporal joins & sessionization — the time-series data-processing
  * primitives a reference (Polars) user gets from the host engine
  * (`DataFrame.join_asof`, interval filters, gap-based grouping) and a
  * Spark user needs re-expressed shuffle-consciously.
  *
  * Scale design, per operator:
  *
  *  - '''asofJoin''': never a non-equi join. Both sides are tagged and
  *    unioned, hash-partitioned on the `by` keys (ONE exchange), sorted
  *    within partitions, and the match is a `last(_, ignoreNulls)` running
  *    carry inside a codegen'd WindowExec. `nearest` adds a second sort
  *    (descending) over the same exchange, not a second shuffle. A
  *    broadcast-range join would need the right side small; this form
  *    scales to both sides huge, skew-bounded by the hottest `by` key.
  *  - '''rangeJoin''': intervals explode into fixed-width time buckets and
  *    the join becomes an equi-join on (by, bucket) + exact residual
  *    filter — the classic bucketed range join. Each (left, right) pair
  *    meets in exactly one bucket (the left row's), so no post-dedup. An
  *    `assert_true` valve (inside the explode's dependency chain, so
  *    column pruning can't drop it) fails loudly if an interval spans
  *    more than `maxBucketsPerInterval` buckets instead of silently
  *    exploding.
  *  - '''sessionize''': lag + running-sum over one window (one exchange);
  *    the Structured Streaming twin uses Spark's native
  *    `session_window` + watermark (see StreamingOps).
  *
  * The reference gets as-of joins from Polars itself
  * (polars `DataFrame.join_asof`; used in time-series feature pipelines
  * alongside polars_ts); this file is the Spark-first equivalent.
  */
object TemporalJoins {

  /** The `_right`-suffix collision rename all the two-sided joins
    * share: right columns (except the `by` keys) colliding with a left
    * name are renamed `c_right`. Returns the renamed frame and the
    * old-name → emitted-name mapping. ONE definition so the bucketed
    * and native forms cannot drift. */
  private def renameCollisions(left: DataFrame, right: DataFrame,
      by: Seq[String]): (DataFrame, String => String) = {
    // collision detection must follow the session's resolution rules:
    // left `Val` vs right `val` IS ambiguous under the default
    // case-insensitive resolution, so it must get the `_right` rename
    val eq = nameEq(left.sparkSession)
    val renames = right.columns.filter(c =>
      !by.exists(eq(_, c)) && left.columns.exists(eq(_, c)))
      .map(c => c -> (c + "_right"))
    val rRenamed = renames.foldLeft(right) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to)
    }
    (rRenamed, c => renames.find(_._1 == c).map(_._2).getOrElse(c))
  }

  /** Epoch-µs view of a time column (timestamp, date, or numeric). NTZ
    * and DATE cast through LTZ under the session's UTC zone,
    * value-preserving. */
  private def micros(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType | TimestampNTZType |
           org.apache.spark.sql.types.DateType =>
        unix_micros(col(c).cast("timestamp"))
      case _ => col(c).cast("long")
    }

  /** As-of join: for each left row, the latest right row at-or-before
    * (`backward`), the earliest at-or-after (`forward`), or the closest in
    * either direction (`nearest`, ties → backward) within the same `by`
    * keys; optionally only if within `toleranceUs` (else the carried
    * columns are null, like polars `join_asof(tolerance=)`).
    *
    * Output = all left columns + `matchedTime` (the matched right
    * timestamp, null when unmatched) + `rightCols` (suffixed `_right` on
    * name collision with a left column).
    *
    * Duplicate right timestamps within a `by` group make the match
    * ambiguous (any engine picks one arbitrarily) — pre-aggregate the
    * right side per (by, time) if that matters, as the gate queries do.
    *
    * `by` must be non-empty: a global as-of would funnel everything
    * through one window partition. Pre-bucket the time axis and carry
    * boundary rows if a keyless as-of is ever needed at scale.
    *
    * Null times: right rows with a null time are ignored; left rows with
    * a null time are kept, unmatched (polars drops them — keeping the
    * row with null carries is the lossless superset).
    */
  def asofJoin(left: DataFrame, right: DataFrame, by: Seq[String],
               leftTime: String, rightTime: String, rightCols: Seq[String],
               direction: String = "backward",
               toleranceUs: Option[Long] = None,
               matchedTime: String = "asof_ts",
               allowExactMatches: Boolean = true): DataFrame = {
    require(by.nonEmpty,
      "asofJoin: empty `by` would single-partition the window; supply keys")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"asofJoin: unknown direction '$direction'")
    require(rightCols.nonEmpty, "asofJoin: no right columns to carry")
    toleranceUs.foreach(t => require(t >= 0, "asofJoin: negative tolerance"))

    // hot-key handling is the default here too (r13): the union+window
    // carry funnels a hot `by` key into ONE window partition exactly like
    // the native merge does — above the size floor, route through the
    // detect-and-slice path (spec-pinned row-equal to this form; row
    // ORDER differs, as documented on asofJoinSalted)
    if (autoSaltEligible(left, right))
      return asofJoinSalted(left, right, by, leftTime, rightTime, rightCols,
        direction, toleranceUs, matchedTime, allowExactMatches)

    val eq = nameEq(left.sparkSession)
    val outNames = rightCols.map(c =>
      if (left.columns.exists(eq(_, c))) c + "_right" else c)

    // Right payload rides inside ONE struct so the ignoreNulls carry skips
    // left rows (whose payload is null) but never a right row whose value
    // columns happen to be null — polars semantics, not "last non-null".
    val payload = struct(
      (col(rightTime).as("__rt") +: micros(right, rightTime).as("__rtu") +:
        rightCols.map(col)): _*)
    val rTagged = right.select(
      (by.map(col) :+ micros(right, rightTime).as("__tu") :+
        payload.as("__p") :+ lit(0).as("__tag")): _*)
      .filter(col("__tu").isNotNull)
    val lTagged = left
      .withColumn("__tu", micros(left, leftTime))
      .withColumn("__tag", lit(1))
    val uni = lTagged.unionByName(rTagged, allowMissingColumns = true)

    // Equal timestamps: with allowExactMatches the right row (tag 0)
    // sorts first in BOTH orders, so matches are inclusive (>= / <=)
    // like the oracle's ASOF JOIN; with allowExactMatches=false (pandas
    // merge_asof's strict mode) the left row sorts first, so an
    // equal-ts right row is not yet visible — strictly-before/after.
    val tagOrder =
      if (allowExactMatches) col("__tag").asc else col("__tag").desc
    val part = Window.partitionBy(by.map(col): _*)
    val frame = (w: org.apache.spark.sql.expressions.WindowSpec) =>
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val back = last(when(col("__tag") === 0, col("__p")), ignoreNulls = true)
      .over(frame(part.orderBy(col("__tu").asc, tagOrder)))
    val fwd = last(when(col("__tag") === 0, col("__p")), ignoreNulls = true)
      .over(frame(part.orderBy(col("__tu").desc, tagOrder)))

    val carried = direction match {
      case "backward" => uni.withColumn("__m", back)
      case "forward" => uni.withColumn("__m", fwd)
      case "nearest" =>
        uni.withColumn("__mb", back).withColumn("__mf", fwd)
          .withColumn("__m",
            when(col("__mb").isNull, col("__mf"))
              .when(col("__mf").isNull, col("__mb"))
              .when(col("__tu") - col("__mb.__rtu") <=
                    col("__mf.__rtu") - col("__tu"), col("__mb"))
              .otherwise(col("__mf")))
    }

    // null-time left rows never match (their sort position is
    // direction-dependent, so the carry must not leak into them)
    val withinTol = toleranceUs match {
      case Some(t) =>
        when(col("__tu").isNotNull && col("__m").isNotNull &&
          abs(col("__tu") - col("__m.__rtu")) <= t, col("__m"))
      case None => when(col("__tu").isNotNull, col("__m"))
    }
    val outCols =
      left.columns.toSeq.map(col) ++
        (col("__mok.__rt").as(matchedTime) +:
          rightCols.zip(outNames).map { case (c, o) =>
            col("__mok").getField(c).as(o)
          })
    carried.filter(col("__tag") === 1)
      .withColumn("__mok", withinTol)
      .select(outCols: _*)
  }

  // ── shared plumbing for the whole-operator tier (asofJoinNative /
  // rangeJoinNative): name resolution under the session's
  // case-sensitivity, and merge-key derivation (tightest-common-type
  // cast + float NaN/-0.0 normalization) ──────────────────────────────

  // ── default skew handling (r13, r12 verdict ask #4) ─────────────────
  // Hot-key routing is now the DEFAULT on asofJoin/asofJoinNative, not an
  // opt-in: when the combined plan-time size estimate of the two sides
  // clears `graft.asof.autoSalt.minBytes`, the call routes through
  // [[asofJoinSalted]], whose one stats pass detects keys holding ≥ 5% of
  // all rows and time-slices them (falling through to the plain merge
  // when nothing is hot — the stats pass is then the only cost). Below
  // the floor the plain plan runs untouched: a sub-floor input fits a
  // single task comfortably even when fully skewed, so detection would
  // cost more than the worst case it prevents. The floor compares
  // COMPRESSED plan estimates (parquet file bytes for scans), so 16 MB
  // corresponds to roughly 10⁷ rows of narrow panel data — the scale
  // where a 50%-hot key is several seconds of single-task merge.
  // Calibration probe (r13, see OPTIMIZATION_r13.md): the sf0.1 bench
  // events sides estimate 1.8 MB (plain path kept), the sf0.01 gate
  // 0.2 MB (plain), the 10×-scale 10⁷-row panels 320 MB (detect), a
  // 10⁸-row zipfian parquet panel ~72 MB (detect). Session-conf knobs
  // (no rebuild needed to flip them):
  //   graft.asof.autoSalt          on/off            (default true)
  //   graft.asof.autoSalt.minBytes detection floor   (default 16 MB)
  private val AutoSaltMinBytesDefault: Long = 16L * 1024 * 1024

  private def autoSaltEligible(left: DataFrame, right: DataFrame): Boolean = {
    val spark = left.sparkSession
    // the salted path's stats pass is a batch collect — never route a
    // streaming frame (micro-batch embedders keep the plain plan)
    if (left.isStreaming || right.isStreaming) false
    else if (!spark.conf.get("graft.asof.autoSalt", "true").toBoolean) false
    else try {
      import org.apache.spark.sql.GraftPlanBridge
      val minBytes = BigInt(spark.conf.get("graft.asof.autoSalt.minBytes",
        AutoSaltMinBytesDefault.toString))
      GraftPlanBridge.analyzed(left).stats.sizeInBytes +
        GraftPlanBridge.analyzed(right).stats.sizeInBytes >= minBytes
    } catch { case scala.util.control.NonFatal(_) => false }
  }

  /** Name equality under the session's `spark.sql.caseSensitive` —
    * the comparison every collision/rename decision must use, because
    * column RESOLUTION is case-insensitive by default. */
  private def nameEq(spark: org.apache.spark.sql.SparkSession)
      : (String, String) => Boolean = {
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    if (caseSensitive) (a, b) => a == b else (a, b) => a.equalsIgnoreCase(b)
  }

  /** col()-style name resolution (case-insensitive unless the session
    * says otherwise), returning the ACTUAL column name. */
  private def resolveName(spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, name: String, side: String): String = {
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    df.columns.find(c =>
      if (caseSensitive) c == name else c.equalsIgnoreCase(name))
      .getOrElse(throw new IllegalArgumentException(
        s"temporal native join: no column $name on the $side side"))
  }

  /** Tightest common type per key (the coercion unionByName gives the
    * composed forms), failing loudly on incompatible pairs. */
  private def commonKeyTypes(left: DataFrame, right: DataFrame,
      byL: Seq[String], byR: Seq[String],
      by: Seq[String]): Seq[org.apache.spark.sql.types.DataType] =
    by.indices.map { i =>
      val lt = left.schema(byL(i)).dataType
      val rt = right.schema(byR(i)).dataType
      if (lt == rt) lt
      else org.apache.spark.sql.catalyst.analysis.TypeCoercion
        .findTightestCommonType(lt, rt).getOrElse(
          throw new IllegalArgumentException(
            s"temporal native join: key '${by(i)}' has incompatible " +
              s"types $lt vs $rt"))
    }

  /** A merge-key column: cast to the common type, float keys
    * NaN/-0.0-normalized (NormalizeFloatingNumbers cannot see custom
    * nodes). */
  private def mergeKeyCol(name: String,
      t: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val cast = col(name).cast(t)
    t match {
      case DoubleType | FloatType => GraftColumnBridge.column(
        NormalizeNaNAndZero(GraftColumnBridge.expression(cast)))
      case _ => cast
    }
  }

  /** True when the merge key must be a DERIVED column on the left side
    * (cast or normalization changes it); otherwise the node keys on the
    * original left attribute so outputPartitioning stays expressed on a
    * surviving output column and chained steps reuse the exchange. */
  private def leftKeyDerived(left: DataFrame, byL: Seq[String],
      keyTypes: Seq[org.apache.spark.sql.types.DataType]): Seq[Boolean] = {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    byL.indices.map(i =>
      keyTypes(i) != left.schema(byL(i)).dataType ||
        keyTypes(i) == DoubleType || keyTypes(i) == FloatType)
  }

  /** [[asofJoin]] on the whole-operator Catalyst tier: builds a
    * [[graft.plans.AsofJoin]] logical node planned by
    * [[graft.plans.GraftStrategy]] into the sort-merge
    * [[graft.plans.AsofJoinExec]]. Identical semantics and output
    * schema to the composed form (spec-pinned equality on every
    * direction × tolerance × exact-match combination), different plan:
    * two per-side exchanges + sorts and a single O(|L|+|R|) merge pass
    * instead of one union exchange + WindowExec over both sides — the
    * left side's partitioning/ordering survive to downstream operators,
    * and deterministic left-side filters written above the join are
    * pushed below it by [[graft.plans.PushFilterThroughAsofJoin]].
    *
    * Registers the strategy/rule on the live session (idempotent), so
    * it works with or without `spark.sql.extensions=
    * graft.plans.GraftExtensions`.
    *
    * The merge runs on derived key columns: each `by` key is cast to
    * the tightest common type of the two sides (the coercion
    * `unionByName` gives the composed form) and float/double keys are
    * NaN/-0.0-normalized (what NormalizeFloatingNumbers does for a
    * window partition key — the custom node is invisible to that
    * rule), so mixed-width or floating keys match identically on both
    * plan shapes instead of silently missing across partitions. */
  def asofJoinNative(left: DataFrame, right: DataFrame, by: Seq[String],
                     leftTime: String, rightTime: String,
                     rightCols: Seq[String],
                     direction: String = "backward",
                     toleranceUs: Option[Long] = None,
                     matchedTime: String = "asof_ts",
                     allowExactMatches: Boolean = true): DataFrame =
    // hot-key handling is the default, not an opt-in (r13): above the
    // size floor, detect-and-slice via asofJoinSalted (pure fall-through
    // to the plain merge when no key is hot); below it, the plain plan
    if (autoSaltEligible(left, right))
      asofJoinSalted(left, right, by, leftTime, rightTime, rightCols,
        direction, toleranceUs, matchedTime, allowExactMatches)
    else
      asofJoinNativePlain(left, right, by, leftTime, rightTime, rightCols,
        direction, toleranceUs, matchedTime, allowExactMatches)

  /** The plain (no skew detection) whole-operator merge —
    * [[asofJoinSalted]]'s building block and [[asofJoinNative]]'s
    * below-floor path. */
  private def asofJoinNativePlain(
                     left: DataFrame, right: DataFrame, by: Seq[String],
                     leftTime: String, rightTime: String,
                     rightCols: Seq[String],
                     direction: String = "backward",
                     toleranceUs: Option[Long] = None,
                     matchedTime: String = "asof_ts",
                     allowExactMatches: Boolean = true): DataFrame = {
    import org.apache.spark.sql.GraftPlanBridge
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    require(by.nonEmpty,
      "asofJoinNative: empty `by` would single-partition the merge; supply keys")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"asofJoinNative: unknown direction '$direction'")
    require(rightCols.nonEmpty, "asofJoinNative: no right columns to carry")
    toleranceUs.foreach(t =>
      require(t >= 0, "asofJoinNative: negative tolerance"))

    val spark = left.sparkSession
    graft.plans.GraftPlanning.ensure(spark)

    val byL = by.map(resolveName(spark, left, _, "left"))
    val byR = by.map(resolveName(spark, right, _, "right"))
    val lTimeN = resolveName(spark, left, leftTime, "left")
    val rTimeN = resolveName(spark, right, rightTime, "right")
    val rColsN = rightCols.map(resolveName(spark, right, _, "right"))

    val keyNames = by.indices.map(i => s"__gk$i")
    val reserved = "__ltu" +: "__rt" +: "__rtu" +: keyNames
    require(!(left.columns ++ rColsN).exists(reserved.contains),
      s"asofJoinNative: column names ${reserved.mkString(", ")} are reserved")
    val eq = nameEq(spark)
    // a matchedTime that resolves against an existing left column (or a
    // duplicated rightCols entry) would otherwise surface later as an
    // opaque ambiguous-reference AnalysisException from the final select
    require(!left.columns.exists(eq(_, matchedTime)),
      s"asofJoinNative: matchedTime '$matchedTime' collides with a left " +
        "column; pass a different matchedTime")
    require(rColsN.distinct.size == rColsN.size,
      s"asofJoinNative: duplicate rightCols entries: ${
        rColsN.diff(rColsN.distinct).distinct.mkString(", ")}")

    val outNames = rColsN.map(c =>
      if (left.columns.exists(eq(_, c)) || eq(c, matchedTime)) c + "_right"
      else c)

    val keyTypes = commonKeyTypes(left, right, byL, byR, by)
    val lDerived = leftKeyDerived(left, byL, keyTypes)

    val lPrep = by.indices.foldLeft(
      left.withColumn("__ltu", micros(left, lTimeN))) { (d, i) =>
      if (lDerived(i))
        d.withColumn(keyNames(i), mergeKeyCol(byL(i), keyTypes(i)))
      else d
    }
    val rPrep = right.select(
      (by.indices.map(i =>
        mergeKeyCol(byR(i), keyTypes(i)).as(keyNames(i))) :+
        col(rTimeN).as("__rt") :+
        micros(right, rTimeN).as("__rtu")) ++
        rColsN.distinct.map(col): _*)
    val lChild = GraftPlanBridge.analyzed(lPrep)
    // fresh exprIds on the right side so a self-join never aliases the
    // same attribute into both children of the node
    val rChild0 = GraftPlanBridge.analyzed(rPrep)
    val rChild = Project(rChild0.output.map(a => Alias(a, a.name)()), rChild0)

    def attr(out: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
             name: String) =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"asofJoinNative: no column $name"))
    val rOut = rChild.output
    val carryExprs = attr(rOut, "__rt") +: rColsN.map(attr(rOut, _))
    val carryAttrs =
      AttributeReference(matchedTime, attr(rOut, "__rt").dataType,
        nullable = true)() +:
        rColsN.zip(outNames).map { case (c, o) =>
          AttributeReference(o, attr(rOut, c).dataType, nullable = true)()
        }

    val lKeyAttrs = by.indices.map(i =>
      attr(lChild.output, if (lDerived(i)) keyNames(i) else byL(i)))
    val node = graft.plans.AsofJoin(
      lChild, rChild,
      lKeyAttrs, keyNames.map(attr(rOut, _)),
      attr(lChild.output, "__ltu"), attr(rOut, "__rtu"),
      carryExprs, carryAttrs, direction, toleranceUs, allowExactMatches)
    GraftPlanBridge.ofRows(spark, node)
      .select((left.columns.toSeq :+ matchedTime).map(col) ++
        outNames.map(col): _*)
  }

  /** Skew-resistant [[asofJoinNative]] for zipfian `by` keys, where one
    * key holds a large share of BOTH sides and the sort-merge exec's
    * hash clustering necessarily lands it in one task (AQE's
    * OptimizeSkewedJoin only rewrites SortMergeJoinExec, never a custom
    * node — the r11 scale probe measured the 50%-hot-key leg at 35× for
    * a 100× scale-up vs 13× uniform). Since r13 this is the DEFAULT
    * routing target of [[asofJoin]]/[[asofJoinNative]] above the
    * `graft.asof.autoSalt.minBytes` plan-estimate floor — calling it
    * directly only bypasses the floor and pins the salt parameters.
    *
    * Shape: one map-side-combined stats pass over the key projections of
    * both sides finds keys whose combined row share exceeds
    * `hotKeyShare` (capped at `maxHotKeys`, null keys included). Cold
    * keys run the plain native merge unchanged. Each hot key's time
    * range `[min, max]` (from the same stats pass) is cut into
    * `saltBuckets` equal-width slices and the merge re-keyed on
    * `(by, slice)` — the hot key becomes `saltBuckets` independent
    * tasks. Correctness across slice boundaries is restored by
    * replicating boundary rows, NOT whole sides:
    *
    *  - backward/nearest: the rows of the last TWO distinct timestamps
    *    per (key, slice) are replicated into every LATER slice. The
    *    global at-or-before match of any probe is the last right row of
    *    some earlier slice (nothing sits between it and the probe), and
    *    strict mode's fallback is either the same slice's second-last
    *    distinct timestamp or the last of an earlier one — both in the
    *    replicated set. ≤ 2·saltBuckets tiny rows per (key, slice).
    *  - forward/nearest: symmetric — the first two distinct timestamps
    *    per (key, slice) replicate into every EARLIER slice (a probe's
    *    at-or-after match in a later slice is that slice's head; equal
    *    timestamps can never split across slices, so strictness never
    *    reaches deeper than the second distinct timestamp).
    *
    * Equal-width slicing (not sampled quantiles) keeps the pre-pass one
    * aggregation: for event-like data time is near-uniform, and a
    * time-skewed key degrades toward the unsalted single task — never
    * below it. Tolerance/exact-match/direction semantics are inherited
    * bit-for-bit from the per-slice native merges (the candidate set
    * per probe is provably identical to the global one). Output rows
    * equal [[asofJoinNative]]'s on every input; output ORDER and
    * partitioning do not (hot ∪ cold union) — re-sort downstream if
    * order matters. With duplicate right (key, ts) rows the carried
    * value is engine-arbitrary in both forms, same as [[asofJoin]].
    *
    * Reference surface: polars `join_asof` has no skew problem
    * single-node; this is the distributed-engine counterpart knob. */
  def asofJoinSalted(left: DataFrame, right: DataFrame, by: Seq[String],
                     leftTime: String, rightTime: String,
                     rightCols: Seq[String],
                     direction: String = "backward",
                     toleranceUs: Option[Long] = None,
                     matchedTime: String = "asof_ts",
                     allowExactMatches: Boolean = true,
                     saltBuckets: Int = 32,
                     hotKeyShare: Double = 0.05,
                     maxHotKeys: Int = 64): DataFrame = {
    require(saltBuckets >= 2, "asofJoinSalted: saltBuckets must be >= 2")
    require(hotKeyShare > 0 && hotKeyShare <= 1,
      "asofJoinSalted: hotKeyShare must be in (0, 1]")
    require(maxHotKeys >= 1, "asofJoinSalted: maxHotKeys must be >= 1")
    require(by.nonEmpty, "asofJoinSalted: empty `by`; supply keys")
    val spark = left.sparkSession
    val byL = by.map(resolveName(spark, left, _, "left"))
    val byR = by.map(resolveName(spark, right, _, "right"))
    val lTimeN = resolveName(spark, left, leftTime, "left")
    val rTimeN = resolveName(spark, right, rightTime, "right")
    val keyTypes = commonKeyTypes(left, right, byL, byR, by)
    val B = saltBuckets.toLong
    val helperNames = Seq("__gslice", "__gstu", "__gsdr", "__gscnt",
      "__gsmn", "__gsmx", "__gsw") ++ by.indices.map(i => s"__gsk$i")
    require(!(left.columns ++ right.columns).exists(helperNames.contains),
      s"asofJoinSalted: column names ${helperNames.mkString(", ")} are reserved")

    // ── stats pass: per-key combined count + time bounds, ONE shuffle
    // (map-side combined; the aggregate is tiny — one row per key)
    val lk = left.select(byL.indices.map(i =>
      mergeKeyCol(byL(i), keyTypes(i)).as(s"__gsk$i")) :+
      micros(left, lTimeN).as("__gstu"): _*)
    val rk = right.select(byR.indices.map(i =>
      mergeKeyCol(byR(i), keyTypes(i)).as(s"__gsk$i")) :+
      micros(right, rTimeN).as("__gstu"): _*)
    val stats = lk.unionByName(rk)
      .groupBy(by.indices.map(i => col(s"__gsk$i")): _*)
      .agg(count(lit(1)).as("__gscnt"), min("__gstu").as("__gsmn"),
        max("__gstu").as("__gsmx"))
      .persist()
    val total = stats.agg(sum("__gscnt")).collect()(0).getLong(0)
    val bounds = stats
      .filter(col("__gscnt") >= lit(hotKeyShare * total) &&
        col("__gsmn").isNotNull)
      .orderBy(col("__gscnt").desc)
      .limit(maxHotKeys)
      .withColumn("__gsw",
        greatest(lit(1L),
          ceil((col("__gsmx") - col("__gsmn") + 1L) / lit(B.toDouble))
            .cast("long")))
      .cache()
    val nHot = bounds.count()
    stats.unpersist()
    if (nHot == 0) {
      bounds.unpersist()
      return asofJoinNativePlain(left, right, by, leftTime, rightTime,
        rightCols, direction, toleranceUs, matchedTime, allowExactMatches)
    }

    // hot/cold split by broadcast (inner / anti) against the ≤ maxHotKeys
    // bounds rows — null-safe so a hot NULL key is split out too
    def hotCond(df: DataFrame, names: Seq[String]): Column =
      by.indices.map(i =>
        mergeKeyCol(names(i), keyTypes(i)) <=> col(s"__gsk$i"))
        .reduce(_ && _)
    val bcast = broadcast(bounds)
    val leftHot = left.join(bcast, hotCond(left, byL), "inner")
    val leftCold = left.join(bcast, hotCond(left, byL), "left_anti")
    val rightHot = right.join(bcast, hotCond(right, byR), "inner")
    val rightCold = right.join(bcast, hotCond(right, byR), "left_anti")

    val boundCols = Seq("__gscnt", "__gsmn", "__gsmx", "__gsw") ++
      by.indices.map(i => s"__gsk$i")
    def sliceOf(tu: Column): Column =
      least(lit(B - 1L), greatest(lit(0L),
        floor((tu - col("__gsmn")) / col("__gsw").cast("double"))
          .cast("long")))
    val leftHotS = leftHot
      .withColumn("__gslice", sliceOf(micros(left, lTimeN)))
      .drop(boundCols: _*)

    // right hot side: own slice + boundary-carry replication
    val rHotBase = rightHot
      .withColumn("__gstu", micros(right, rTimeN))
      .filter(col("__gstu").isNotNull) // null-time right rows never match
      .withColumn("__gslice", sliceOf(col("__gstu")))
    val rPart = (byR.map(col) :+ col("__gslice"))
    var rHotRep = rHotBase
    if (direction != "forward") {
      val wDesc = Window.partitionBy(rPart: _*).orderBy(col("__gstu").desc)
      val lastTwo = rHotBase
        .withColumn("__gsdr", dense_rank().over(wDesc))
        .filter(col("__gsdr") <= 2).drop("__gsdr")
        // sequence(a,b) with a>b counts DOWN in Spark — guard empty
        .withColumn("__gslice",
          explode(when(col("__gslice") < lit(B - 1L),
            sequence(col("__gslice") + 1L, lit(B - 1L)))
            .otherwise(array().cast("array<long>"))))
      rHotRep = rHotRep.unionByName(lastTwo)
    }
    if (direction != "backward") {
      val wAsc = Window.partitionBy(rPart: _*).orderBy(col("__gstu").asc)
      val firstTwo = rHotBase
        .withColumn("__gsdr", dense_rank().over(wAsc))
        .filter(col("__gsdr") <= 2).drop("__gsdr")
        .withColumn("__gslice",
          explode(when(col("__gslice") > lit(0L),
            sequence(lit(0L), col("__gslice") - 1L))
            .otherwise(array().cast("array<long>"))))
      rHotRep = rHotRep.unionByName(firstTwo)
    }
    val rightHotS = rHotRep.drop("__gstu").drop(boundCols: _*)

    val cold = asofJoinNativePlain(leftCold, rightCold, by, leftTime,
      rightTime, rightCols, direction, toleranceUs, matchedTime,
      allowExactMatches)
    val hot = asofJoinNativePlain(leftHotS, rightHotS, by :+ "__gslice",
      leftTime, rightTime, rightCols, direction, toleranceUs,
      matchedTime, allowExactMatches)
      .drop("__gslice")
    cold.unionByName(hot.select(cold.columns.map(col): _*))
  }

  /** Feature-store point-in-time join: as-of join a spine (entity, time)
    * against several feature tables in sequence — the leakage-free
    * training-snapshot assembly (each feature value is the latest
    * at-or-before the spine row's time, never a future one). One
    * backward [[asofJoin]] per feature table: each is one hash exchange
    * on the same `by` keys, so the spine's partitioning is reused
    * between steps. The i-th table's matched timestamp lands in
    * `asof_ts_i`.
    *
    * `native = true` runs each step on the whole-operator tier
    * ([[asofJoinNative]]) instead of the window carry — the chained
    * steps then genuinely reuse one exchange: AsofJoinExec reports
    * `outputPartitioning = left`, so step i+1's left side is already
    * clustered on `by` and EnsureRequirements inserts no new shuffle
    * (the union+window form re-shuffles the union every step). */
  def pointInTimeJoin(spine: DataFrame, by: Seq[String], spineTime: String,
      features: Seq[(DataFrame, String, Seq[String], Option[Long])],
      native: Boolean = false): DataFrame =
    features.zipWithIndex.foldLeft(spine) {
      case (acc, ((ft, timeCol, cols, tol), i)) =>
        if (native)
          asofJoinNative(acc, ft, by, spineTime, timeCol, cols,
            toleranceUs = tol, matchedTime = s"asof_ts_$i")
        else
          asofJoin(acc, ft, by, spineTime, timeCol, cols,
            toleranceUs = tol, matchedTime = s"asof_ts_$i")
    }

  /** Interval (range) join: left rows whose `leftTime` falls in the right
    * side's `[startCol, endCol)` (or `[..]` with `inclusiveEnd`) under
    * equal `by` keys. Returns left columns + right columns (right names
    * colliding with left ones suffixed `_right`; `by` keys emitted once).
    *
    * Bucketed: `bucketUs` is the time-bucket width — size it near the
    * typical interval length so each interval explodes into a handful of
    * buckets. Intervals spanning more than `maxBucketsPerInterval`
    * buckets raise an error (fail-loud valve) rather than exploding.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, by: Seq[String],
                leftTime: String, startCol: String, endCol: String,
                bucketUs: Long, inclusiveEnd: Boolean = false,
                maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketUs > 0, "rangeJoin: bucketUs must be positive")
    // floor-div through double: exact for |µs| < 2^53 (≈ year 2255)
    def bucketOf(c: Column): Column =
      floor(c / lit(bucketUs.toDouble)).cast("long")

    val (rRenamed, rName) = renameCollisions(left, right, by)

    val sTu = micros(rRenamed, rName(startCol))
    val eTu = micros(rRenamed, rName(endCol))
    val rBuck = rRenamed
      .withColumn("__stu", sTu).withColumn("__etu", eTu)
      // null-bound intervals are ignored, matching asofJoin's null-time
      // contract — without this filter the assert_true valve fires on a
      // null __nb and one dirty row aborts the whole job
      .filter(col("__stu").isNotNull && col("__etu").isNotNull)
      .withColumn("__sb", bucketOf(col("__stu")))
      .withColumn("__eb", bucketOf(col("__etu")))
      .withColumn("__nb", col("__eb") - col("__sb") + lit(1L))
      // assert_true rides inside __b's dependency chain so column pruning
      // can't eliminate the fail-loud valve (a free-standing guard column
      // would be pruned as dead code)
      .withColumn("__ebChecked",
        when(assert_true(col("__nb") <= maxBucketsPerInterval,
          concat(lit("rangeJoin: interval spans "), col("__nb"),
            lit(s" buckets > maxBucketsPerInterval=$maxBucketsPerInterval; " +
              "widen bucketUs or split the interval"))).isNull, col("__eb")))
      .withColumn("__b", explode(sequence(col("__sb"), col("__ebChecked"))))
    val lBuck = left
      .withColumn("__ltu", micros(left, leftTime))
      .withColumn("__b", bucketOf(col("__ltu")))

    val endCond =
      if (inclusiveEnd) col("__ltu") <= col("__etu")
      else col("__ltu") < col("__etu")
    val joined = lBuck.join(rBuck,
      by :+ "__b", "inner")
      .filter(col("__ltu") >= col("__stu") && endCond)
    val rightOut = rRenamed.columns.toSeq.filterNot(by.contains)
    joined.select((left.columns.toSeq ++ rightOut).map(col): _*)
  }

  /** [[rangeJoin]] on the whole-operator Catalyst tier: a
    * [[graft.plans.IntervalJoin]] node planned into the sort-merge
    * sweep [[graft.plans.IntervalJoinExec]]. Same output schema and
    * semantics as the bucketed form (spec-pinned equality), but NO
    * interval explosion: both sides shuffle once at their natural row
    * counts (left sorted by (keys, time), right by (keys, start)) and
    * a per-partition sweep keeps the currently-overlapping intervals —
    * state bounded by true concurrent overlap, not interval length.
    * Consequently there is no `bucketUs` to tune and no
    * `maxBucketsPerInterval` valve to hit: a 30-day interval costs the
    * same one shuffled row as a 30-second one. */
  def rangeJoinNative(left: DataFrame, right: DataFrame, by: Seq[String],
                      leftTime: String, startCol: String, endCol: String,
                      inclusiveEnd: Boolean = false): DataFrame = {
    import org.apache.spark.sql.GraftPlanBridge
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    require(by.nonEmpty,
      "rangeJoinNative: empty `by` would single-partition the merge; supply keys")

    val spark = left.sparkSession
    graft.plans.GraftPlanning.ensure(spark)

    val byL = by.map(resolveName(spark, left, _, "left"))
    val byR = by.map(resolveName(spark, right, _, "right"))
    val lTimeN = resolveName(spark, left, leftTime, "left")
    val sColN = resolveName(spark, right, startCol, "right")
    val eColN = resolveName(spark, right, endCol, "right")
    // payload = every right column except the by keys (emitted once,
    // from the left side) — the composed rangeJoin's output contract
    val payloadN = right.columns.toSeq.filterNot(byR.contains)
    require(payloadN.nonEmpty, "rangeJoinNative: no right columns to carry")

    val keyNames = by.indices.map(i => s"__gk$i")
    val reserved = "__ltu" +: "__rsu" +: "__reu" +: keyNames
    require(!(left.columns.toSeq ++ payloadN).exists(reserved.contains),
      s"rangeJoinNative: column names ${reserved.mkString(", ")} are reserved")

    val outNames = payloadN.map(c =>
      if (left.columns.contains(c)) c + "_right" else c)

    val keyTypes = commonKeyTypes(left, right, byL, byR, by)
    val lDerived = leftKeyDerived(left, byL, keyTypes)

    val lPrep = by.indices.foldLeft(
      left.withColumn("__ltu", micros(left, lTimeN))) { (d, i) =>
      if (lDerived(i))
        d.withColumn(keyNames(i), mergeKeyCol(byL(i), keyTypes(i)))
      else d
    }
    val rPrep = right.select(
      (by.indices.map(i =>
        mergeKeyCol(byR(i), keyTypes(i)).as(keyNames(i))) :+
        micros(right, sColN).as("__rsu") :+
        micros(right, eColN).as("__reu")) ++
        payloadN.map(col): _*)
    val lChild = GraftPlanBridge.analyzed(lPrep)
    val rChild0 = GraftPlanBridge.analyzed(rPrep)
    val rChild = Project(rChild0.output.map(a => Alias(a, a.name)()), rChild0)

    def attr(out: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
             name: String) =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"rangeJoinNative: no column $name"))
    val rOut = rChild.output
    val payloadExprs = payloadN.map(attr(rOut, _))
    val payloadAttrs = payloadN.zip(outNames).map { case (c, o) =>
      AttributeReference(o, attr(rOut, c).dataType, nullable = true)()
    }
    val lKeyAttrs = by.indices.map(i =>
      attr(lChild.output, if (lDerived(i)) keyNames(i) else byL(i)))

    val node = graft.plans.IntervalJoin(
      lChild, rChild,
      lKeyAttrs, keyNames.map(attr(rOut, _)),
      attr(lChild.output, "__ltu"),
      attr(rOut, "__rsu"), attr(rOut, "__reu"),
      payloadExprs, payloadAttrs, inclusiveEnd)
    GraftPlanBridge.ofRows(spark, node)
      .select(left.columns.toSeq.map(col) ++ outNames.map(col): _*)
  }

  /** Interval-overlap join: pairs whose half-open intervals
    * `[leftStart, leftEnd)` and `[rightStart, rightEnd)` overlap under
    * equal `by` keys (`lS < rE && rS < lE`). Same bucketed design as
    * [[rangeJoin]], but BOTH sides explode into covered buckets — a pair
    * then meets once per shared bucket, so the join keeps only the first
    * shared one (`bucket == max(startBucket_l, startBucket_r)`), the
    * standard dedup-free overlap-join residual. Right columns colliding
    * with left names are suffixed `_right`; `by` keys emitted once. */
  def overlapJoin(left: DataFrame, right: DataFrame, by: Seq[String],
                  leftStart: String, leftEnd: String,
                  rightStart: String, rightEnd: String,
                  bucketUs: Long,
                  maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketUs > 0, "overlapJoin: bucketUs must be positive")
    def bucketOf(c: Column): Column =
      floor(c / lit(bucketUs.toDouble)).cast("long")
    def explodeBuckets(df: DataFrame, sTu: Column, eTu: Column,
                       pfx: String): DataFrame =
      df.withColumn(s"${pfx}stu", sTu).withColumn(s"${pfx}etu", eTu)
        // null-bound intervals ignored (asofJoin's null-time contract);
        // a null would otherwise abort the job via the assert_true valve
        .filter(col(s"${pfx}stu").isNotNull && col(s"${pfx}etu").isNotNull)
        .withColumn(s"${pfx}sb", bucketOf(col(s"${pfx}stu")))
        .withColumn(s"${pfx}eb", bucketOf(col(s"${pfx}etu")))
        .withColumn(s"${pfx}nb", col(s"${pfx}eb") - col(s"${pfx}sb") + lit(1L))
        .withColumn(s"${pfx}ebChecked",
          when(assert_true(col(s"${pfx}nb") <= maxBucketsPerInterval,
            concat(lit("overlapJoin: interval spans "), col(s"${pfx}nb"),
              lit(s" buckets > maxBucketsPerInterval=$maxBucketsPerInterval")))
            .isNull, col(s"${pfx}eb")))
        .withColumn("__b", explode(sequence(col(s"${pfx}sb"), col(s"${pfx}ebChecked"))))

    val (rRenamed, rName) = renameCollisions(left, right, by)

    val lExp = explodeBuckets(left,
      micros(left, leftStart), micros(left, leftEnd), "__l")
    val rExp = explodeBuckets(rRenamed,
      micros(rRenamed, rName(rightStart)), micros(rRenamed, rName(rightEnd)), "__r")
    val joined = lExp.join(rExp, by :+ "__b", "inner")
      .filter(col("__lstu") < col("__retu") && col("__rstu") < col("__letu") &&
        col("__b") === greatest(col("__lsb"), col("__rsb")))
    val rightOut = rRenamed.columns.toSeq.filterNot(by.contains)
    joined.select((left.columns.toSeq ++ rightOut).map(col): _*)
  }

  /** [[overlapJoin]] on the whole-operator tier, by COMPOSITION over
    * [[rangeJoinNative]] (no third physical operator needed): two
    * intervals overlap iff the left one STARTS inside the right one
    * (`ls ∈ [rs, re)`, leg 1) or the right one starts STRICTLY inside
    * the left one (`rs ∈ (ls, le)`, leg 2) — a disjoint, exactly-once
    * decomposition, so the union needs no dedup. Each leg is one
    * IntervalJoinExec sweep; a final residual filter
    * (`ls < re && rs < le`, the composed form's own condition) pins
    * exactness on degenerate empty intervals. Both sides shuffle at
    * natural row counts — the composed form explodes BOTH sides into
    * buckets. Output schema identical to [[overlapJoin]]. */
  def overlapJoinNative(left: DataFrame, right: DataFrame, by: Seq[String],
                        leftStart: String, leftEnd: String,
                        rightStart: String, rightEnd: String): DataFrame = {
    val spark = left.sparkSession
    // resolve every user-supplied name up front (case semantics as the
    // native legs), so the collision rename below never misclassifies a
    // differently-cased by key as a payload collision
    val byR = by.map(resolveName(spark, right, _, "right"))
    val lsN = resolveName(spark, left, leftStart, "left")
    val leN = resolveName(spark, left, leftEnd, "left")
    val rsN = resolveName(spark, right, rightStart, "right")
    val reN = resolveName(spark, right, rightEnd, "right")
    // pre-rename right's colliding non-by columns to their FINAL output
    // names so both legs emit identical schemas
    val (rRenamed, rName) = renameCollisions(left, right, byR)
    val rsOut = rName(rsN)
    val reOut = rName(reN)
    val outCols =
      left.columns.toSeq ++ rRenamed.columns.toSeq.filterNot(byR.contains)

    val leg1 = rangeJoinNative(left, rRenamed, by, lsN, rsOut, reOut)
      .select(outCols.map(col): _*)
    // leg 2's strictness and the final residual compare MICROS (what the
    // sweep and the composed form compare) — raw column comparison would
    // break mixed numeric-vs-timestamp bounds across sides
    val leg2raw = rangeJoinNative(rRenamed, left, by, rsOut, lsN, leN)
    val leg2 = leg2raw
      .filter(micros(leg2raw, rsOut) > micros(leg2raw, lsN))
      .select(outCols.map(col): _*)
    val uni = leg1.unionByName(leg2)
    uni.filter(micros(uni, lsN) < micros(uni, reOut) &&
      micros(uni, rsOut) < micros(uni, leN))
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous row (per `by` keys, ordered by `timeCol` then `tieBreak`)
    * exceeds `gapUs` strictly. Adds `session_id` (1-based per key).
    * One exchange + one sort; session summaries are a groupBy on top.
    * Null-time rows sort first and each opens its own session (a null
    * gap can't be compared) — filter them upstream if that matters. */
  def sessionize(df: DataFrame, by: Seq[String], timeCol: String,
                 gapUs: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    require(by.nonEmpty, "sessionize: empty `by` would single-partition")
    require(gapUs > 0, "sessionize: gapUs must be positive")
    val order = col("__tu").asc +: tieBreak.map(col(_).asc)
    val w = Window.partitionBy(by.map(col): _*).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__tu", micros(df, timeCol))
      .withColumn("__new",
        when(lag(col("__tu"), 1).over(w).isNull ||
          col("__tu") - lag(col("__tu"), 1).over(w) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(run))
      .drop("__tu", "__new")
  }
}
