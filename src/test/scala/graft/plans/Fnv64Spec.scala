package graft.plans

import graft.TestSpark
import graft.ops.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen FNV-64 expression must be bit-identical to the
  * Scala kernel (and therefore to the ScalaUDF it replaces and to the
  * DuckDB oracle's per-codepoint fold), including the null→offset-basis
  * quirk every oracle replay depends on. */
class Fnv64Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("native expression matches the Scala kernel on varied inputs") {
    import spark.implicits._
    val fixtures = Seq("", "a", "hello world", "Café du monde",
      "tab\tnew\nline", "  padded  ", "1234567890", "ümlaut Straße",
      "あいう", "x" * 500)
    val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val rows = df.select(col("id"), Fnv64(col("t")).as("h"), col("t")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == TextOps.fnv64(r.getString(2)),
        s"mismatch on '${r.getString(2).take(20)}'")
    }
  }

  test("null input hashes to the offset basis, output is non-nullable") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "t")
    val out = df.select(col("id"), Fnv64(col("t")).as("h"))
    assert(!out.schema("h").nullable)
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == Fnv64.NullHash)
    assert(m(2L) == TextOps.fnv64("x"))
  }

  test("whole-stage codegen survives and the corpus agrees with the UDF") {
    val docs = graft.core.IO.documents(spark, "/root/testdata/sf0.001")
    val both = docs.select(col("doc_id"),
      Fnv64(col("text")).as("native"),
      TextOps.fnvHash(col("text")).as("viaOp"))
    assert(both.filter(col("native") =!= col("viaOp")).count() == 0)
    both.collect() // force execution through codegen
    val plan = both.queryExecution.executedPlan.toString()
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"),
      s"expected a codegen span in:\n${plan.take(500)}")
  }
}
