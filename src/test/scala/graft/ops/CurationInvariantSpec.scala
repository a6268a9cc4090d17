package graft.ops

import graft.TestSpark
import graft.core.IO
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point invariants of the curation stages on the real sf0.001
  * corpus: a pipeline stage applied to its own output must be a no-op,
  * or double-processing in a multi-stage 100 TB run silently corrupts
  * the corpus. */
class CurationInvariantSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def docs = IO.documents(spark, "/root/testdata/sf0.001")

  test("normalizeText is idempotent on the corpus and on dirty fixtures") {
    import spark.implicits._
    val dirty = docs.withColumn("text",
      concat(lit("Café  x​ \r\n\t"), col("text")))
    val once = TextOps.normalizeText(dirty).select(
      col("doc_id"), col("norm_text").as("text"))
    val twice = TextOps.normalizeText(once)
      .select(col("doc_id"), col("norm_text"))
    val diff = once.join(twice, Seq("doc_id"))
      .filter(col("text") =!= col("norm_text")).count()
    assert(diff == 0, s"$diff docs changed on the second pass")
  }

  test("lineDedup reaches a fixed point in one pass") {
    val lined = graft.SparkEntry.linedDocs(docs)
    val once = Dedup.lineDedup(lined)
      .select(col("doc_id"), col("clean_text").as("text"))
    val twice = Dedup.lineDedup(once)
    val removedAgain = twice.agg(sum("n_removed")).collect()(0).getLong(0)
    assert(removedAgain == 0,
      s"second pass removed $removedAgain lines — df can only shrink")
  }

  test("exact dedup canonical set is stable under re-dedup") {
    val canon = Dedup.canonical(docs)
    val kept = docs.join(
      canon.filter(col("is_canonical")).select("doc_id"), Seq("doc_id"))
    val again = Dedup.canonical(kept)
    assert(again.filter(!col("is_canonical")).count() == 0,
      "canonical survivors must all be canonical on re-run")
  }
}
