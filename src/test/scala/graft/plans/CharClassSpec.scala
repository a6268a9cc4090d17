package graft.plans

import graft.TestSpark
import graft.ops.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[CharClassCounts]] must equal the regex formulation it replaced —
  * `length(x) − length(regexp_replace(x, cls, ""))` per class — on
  * ASCII, multi-byte unicode (where non-ASCII must match NOTHING),
  * empties, and nulls; and qualityMetrics built on it keeps its values
  * on adversarial fixtures. */
class CharClassSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val fixtures = Seq(
    "Hello, World! 123",
    "ALL CAPS AND !!! ???",
    "tabs\tand\nnewlines\randvt\fff",
    "unicode: ümlaut Ωmega 😀 emoji — em-dash « guillemets » ¡inverted!",
    "digits ٣٤٥ arabic-indic must not count, nor ² superscript",
    "punct soup `~!@#$%^&*()_+-=[]{}|;':\",./<>?\\",
    "", "   ", "mixed: A1b2.C3")

  test("counts == the regex formulation on every fixture (and null)") {
    import spark.implicits._
    val df = (fixtures.map(Option(_)) :+ (None: Option[String])).toDF("t")
    def regexCount(cls: String) =
      length(col("t")) - length(regexp_replace(col("t"), cls, ""))
    val cc = CharClassCounts(col("t"))
    val rows = df.select(
      element_at(cc, 1) <=> regexCount("[\\p{Punct}]"),
      element_at(cc, 2) <=> regexCount("[0-9]"),
      element_at(cc, 3) <=> regexCount("[A-Z]"),
      element_at(cc, 4) <=> regexCount("\\s"),
      isnull(cc) <=> isnull(col("t"))).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      (0 until 5).foreach(j => assert(r.getBoolean(j),
        s"fixture $i class $j")) }
  }

  test("qualityMetrics values on the fixtures") {
    import spark.implicits._
    val out = TextOps.qualityMetrics(fixtures.filter(_.nonEmpty).toDF("text"))
      .collect()
      .map(r => (r.getAs[String]("text"), (r.getAs[Double]("punct_ratio"),
        r.getAs[Double]("upper_ratio"), r.getAs[Double]("quality_score"))))
      .toMap
    // spot values computed by hand from the regex semantics
    val (p1, u1, _) = out("Hello, World! 123")
    assert(math.abs(p1 - 2.0 / 17) < 1e-12)
    assert(math.abs(u1 - 2.0 / 17) < 1e-12)
    val (pSoup, _, qSoup) =
      out("punct soup `~!@#$%^&*()_+-=[]{}|;':\",./<>?\\")
    assert(pSoup > 0.3 && qSoup <= 0.2) // symbol-soup + short-doc penalties
  }
}
