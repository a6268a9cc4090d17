package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Every SparkEntry query runs on sf0.001 and returns rows — the same
  * smoke the driver performs, so failures surface here first. */
class QueriesSmokeSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  for ((name, fn) <- SparkEntry.queries) {
    test(s"query $name returns rows on sf0.001") {
      val df = fn(TestSpark.spark, dir)
      val n = df.count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }
}
