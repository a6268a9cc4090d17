package graft.ops

import graft.core.PanelCols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Invertible target transforms (reference polars_ts/transforms/).
  *
  * Inversion state lives in sibling columns exactly like the reference:
  * `{y}_original` (log), `{y}_boxcox_lambda` (boxcox), and
  * `{y}_diff_initial` (differencing prefixes — here (ts, value) pairs so
  * the dropped head rows can be restored exactly, a strict superset of the
  * reference's value-only prefixes, differencing.py:46-102). Everything is
  * window expressions — exact `undifference` reconstructs each pass with a
  * per-(id, phase) running sum anchored at the stored prefix. No UDFs.
  */
object Transforms {

  /** log1p in place, keeping `{y}_original` (transforms/log.py:8-39). */
  def logTransform(df: DataFrame)(implicit pc: PanelCols): DataFrame =
    df.withColumn(s"${pc.target}_original", pc.targetCol)
      .withColumn(pc.target, log1p(pc.targetCol))

  /** expm1 inverse (transforms/log.py:42-66). */
  def inverseLogTransform(df: DataFrame)(implicit pc: PanelCols): DataFrame =
    df.withColumn(pc.target, expm1(pc.targetCol))
      .drop(s"${pc.target}_original")

  /** Box-Cox: λ=0 → ln y, else (y^λ − 1)/λ; stores `{y}_boxcox_lambda`
    * (transforms/boxcox.py:8-55). Caller guarantees y > 0. */
  def boxcoxTransform(df: DataFrame, lambda: Double)(implicit pc: PanelCols): DataFrame = {
    val y = pc.targetCol
    val t = if (lambda == 0.0) log(y) else (pow(y, lit(lambda)) - 1.0) / lit(lambda)
    df.withColumn(s"${pc.target}_boxcox_lambda", lit(lambda))
      .withColumn(pc.target, t)
  }

  /** Inverse Box-Cox (transforms/boxcox.py:58-100). */
  def inverseBoxcoxTransform(df: DataFrame, lambda: Double)(implicit pc: PanelCols): DataFrame = {
    val y = pc.targetCol
    val inv = if (lambda == 0.0) exp(y) else pow(y * lit(lambda) + 1.0, lit(1.0 / lambda))
    df.withColumn(pc.target, inv).drop(s"${pc.target}_boxcox_lambda")
  }

  /** Order-`d`, period-`m` differencing with stored prefixes for exact
    * inversion. Head rows that become null are dropped (reference
    * behavior); `{y}_diff_initial` is a d×m pass-major array of
    * (ts, value) structs. */
  def difference(df: DataFrame, d: Int = 1, m: Int = 1)(implicit pc: PanelCols): DataFrame = {
    require(d >= 1 && m >= 1, "order and period must be >= 1")
    val y = pc.targetCol
    var cur = df.withColumn("__idx", row_number().over(pc.w) - 1)
    // pass p consumes the series valid for __idx >= (p-1)*m; its first m
    // valid values are that pass's inversion prefix.
    val prefixes = (1 to d).map { p =>
      val sorted = sort_array(collect_list(struct(
        col("__idx"), pc.timeCol.as("__t"), y.cast("double").as("__v"))))
      val prefix = cur
        .filter(col("__idx").between((p - 1) * m, p * m - 1))
        .groupBy(pc.idCol)
        .agg(transform(sorted, s => struct(
          s.getField("__t").as("__t"), s.getField("__v").as("__v")))
          .as(s"__prefix_$p"))
      cur = cur.withColumn(pc.target, y - lag(y, m).over(pc.w))
      prefix
    }
    val joined = prefixes.foldLeft(cur)((acc, p) => acc.join(p, Seq(pc.id)))
    joined
      .withColumn(s"${pc.target}_diff_initial",
        array((1 to d).map(p => col(s"__prefix_$p")): _*))
      .drop((1 to d).map(p => s"__prefix_$p"): _*)
      .filter(col("__idx") >= d * m)
      .drop("__idx")
  }

  /** Exact inverse of [[difference]]: restores the FULL original series
    * (including the dropped head rows) as `[id, ts, y]`.
    *
    * Invariant: before restoring pass p the frame holds y_p for every
    * valid index ≥ p·m. Each pass computes
    * y_{p-1}[i] = prefix_p[i mod m] + Σ_{j ≡ i (mod m), j ≤ i} y_p[j]
    * with one per-(id, phase) running window sum, then unions the pass's
    * prefix rows back in, re-establishing the invariant for p-1. */
  def undifference(df: DataFrame, d: Int = 1, m: Int = 1)(implicit pc: PanelCols): DataFrame = {
    val initCol = s"${pc.target}_diff_initial"
    var cur = df
      .withColumn("__idx", row_number().over(pc.w) - 1 + d * m)
      .select(pc.idCol, col("__idx"), pc.timeCol,
        pc.targetCol.cast("double").as("__y"), col(initCol).as("__init"))
    val perId = df.select(pc.idCol, col(initCol).as("__init"))
      .dropDuplicates(pc.id)
    (d to 1 by -1).foreach { p =>
      val phase = pmod(col("__idx"), lit(m))
      val anchor = element_at(element_at(col("__init"), p), (phase + 1).cast("int"))
      val restored = cur
        .withColumn("__run", sum(col("__y")).over(
          Window.partitionBy(pc.idCol, pmod(col("__idx"), lit(m)))
            .orderBy(col("__idx"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("__y", anchor.getField("__v") + col("__run"))
        .drop("__run")
      val prefixRows = perId
        .select(pc.idCol, col("__init"),
          posexplode(element_at(col("__init"), p)).as(Seq("__pos", "__s")))
        .select(pc.idCol,
          (lit((p - 1) * m) + col("__pos")).as("__idx"),
          col("__s").getField("__t").as(pc.time),
          col("__s").getField("__v").as("__y"),
          col("__init"))
      cur = restored.unionByName(prefixRows)
    }
    cur.select(pc.idCol, col(pc.time), col("__y").as(pc.target))
  }
}
