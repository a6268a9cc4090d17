package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side data-layout optimization: Z-order (Morton) clustering so a
  * 100 TB table's parquet files carry tight min/max ranges on EVERY
  * clustered dimension — the data-skipping layout Delta/Iceberg's
  * OPTIMIZE ZORDER provides, as a plain operator.
  *
  * Why it matters at scale: a table sorted by one column skips files
  * only for predicates on that column; range-partitioning by the
  * interleaved-bit key gives every clustered column locality
  * simultaneously, so `WHERE a = … AND b BETWEEN …` prunes files on
  * both. The key is a pure codegen-able bit fold — no UDF, no shuffle
  * beyond the single range exchange the rewrite needs anyway.
  *
  * Columns are taken as non-negative integer surrogates (ids, day
  * numbers, bucket ranks). Skewed/continuous dimensions should be
  * rank-bucketed first ([[zorderRank]]) — interleaving raw skewed values
  * wastes high bits on empty space.
  */
object Layout {

  /** Morton key: interleave the low `bits` bits of each column
    * round-robin (column i contributes bit j to output bit `j*k + i`).
    * `bits * cols.size` must fit a signed long. Negative inputs are
    * masked like any other value (two's-complement low bits) — rank
    * first if sign matters. */
  def zorderKey(cols: Seq[Column], bits: Int = 16): Column = {
    val k = cols.size
    require(k >= 1, "zorderKey: no columns")
    require(bits >= 1 && bits * k <= 63,
      s"zorderKey: bits*cols = ${bits * k} must be in [1, 63]")
    val key = (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, i)) =>
        a.bitwiseOR(shiftleft(
          shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * k + i))
      }
    }
    key
  }

  /** Equi-depth rank surrogate for a skewed/continuous dimension:
    * `buckets`-quantile index via a fixed-grid histogram contract —
    * here ntile over a range-partitioned sort would shuffle, so this
    * uses the cheap percent_rank-free form: global min/max + linear
    * binning (one tiny agg + broadcast). Heavy-tailed dimensions should
    * be log-transformed first. */
  def zorderRank(df: DataFrame, c: String, buckets: Int = 1 << 16): DataFrame = {
    require(buckets >= 2, "zorderRank: buckets must be >= 2")
    val mm = df.agg(min(col(c)).cast("double").as("__zlo"),
      max(col(c)).cast("double").as("__zhi"))
    df.crossJoin(broadcast(mm))
      .withColumn(s"${c}_zrank",
        when(col("__zhi") === col("__zlo"), lit(0L)).otherwise(
          least(lit(buckets - 1L),
            floor((col(c).cast("double") - col("__zlo")) /
              ((col("__zhi") - col("__zlo")) / buckets)).cast("long"))))
      .drop("__zlo", "__zhi")
  }

  /** Cluster `df` into `numFiles` range partitions of the Morton key and
    * sort within each — the physical rewrite before a parquet write.
    * One range exchange (with Spark's sampling-based bounds), one sort:
    * the same cost as any global sort rewrite, but every clustered
    * column gets file-level locality. */
  def zorderBy(df: DataFrame, cols: Seq[String], numFiles: Int,
               bits: Int = 16): DataFrame = {
    require(numFiles >= 1, "zorderBy: numFiles must be >= 1")
    df.withColumn("__zkey", zorderKey(cols.map(col), bits))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }

  /** Bucketed persistence — the OTHER layout lever beside [[zorderBy]]:
    * Z-order buys file-skipping on range predicates; BUCKETING buys
    * exchange-free equi-joins and aggregations on the bucket keys.
    * Writes `df` as a Spark bucketed table (`bucketBy` + optional
    * in-bucket `sortBy`), so every downstream join/groupBy on `keys`
    * between co-bucketed tables runs with ZERO shuffles (spec-pinned).
    *
    * The 100 TB use: persist the incremental-dedup tier's signature /
    * fingerprint STORES bucketed by their join key — each ingest batch
    * then shuffles only ITSELF (one small exchange to the store's
    * bucketing), never the accumulated corpus state; re-bucketing a
    * 100 TB store per batch is exactly the cost this removes.
    *
    * `path` makes it an external table (data at the given location);
    * without it the session's warehouse dir is used. Bucket pruning and
    * shuffle-free reads need `spark.sql.sources.bucketing.enabled`
    * (default true). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      nBuckets: Int, sortCols: Seq[String] = Nil,
      path: Option[String] = None, mode: String = "overwrite"): Unit = {
    require(keys.nonEmpty, "writeBucketed: no bucket keys")
    require(nBuckets >= 1, "writeBucketed: nBuckets must be >= 1")
    var w = df.write.mode(mode)
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
    val sorts = if (sortCols.nonEmpty) sortCols else keys
    w = w.sortBy(sorts.head, sorts.tail: _*)
    path.foreach(p => w = w.option("path", p))
    w.format("parquet").saveAsTable(table)
  }
}
