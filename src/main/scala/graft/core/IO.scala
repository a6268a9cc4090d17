package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Testdata table loaders (TESTDATA.md layout: one parquet per table). */
object IO {

  /** Read one table from a scale-factor directory.
    *
    * The `events` table is written with parquet TIMESTAMP(NANOS), which
    * Spark 4 refuses to read unless `spark.sql.legacy.parquet.nanosAsLong`
    * is set — and then surfaces as a raw nanosecond Long. We truncate
    * nanos → microseconds, which is bit-identical to how DuckDB (the
    * correctness oracle) reads the same file, so timestamps stay
    * hash-comparable end to end.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == LongType && f.name == "ts")
        // nanos long → µs → NTZ timestamp (truncation == DuckDB's read)
        d.withColumn(f.name,
          timestamp_micros(expr(s"${f.name} div 1000")).cast("timestamp_ntz"))
      else if (f.dataType == org.apache.spark.sql.types.TimestampType)
        // session TZ is UTC, so LTZ→NTZ is value-preserving; NTZ parquet
        // output (isAdjustedToUTC=false) is what DuckDB emits, keeping
        // timestamps hash-comparable in the driver's oracle diff.
        d.withColumn(f.name, col(f.name).cast("timestamp_ntz"))
      else d
    }
  }

  def events(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "events")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
