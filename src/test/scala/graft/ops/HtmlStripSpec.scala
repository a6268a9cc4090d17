package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the HTML → plain-text entry stage: boilerplate
  * blocks removed wholesale, block structure becomes lines, the
  * high-frequency entities decode in the single-pass order, and
  * malformed markup stays visible instead of swallowing the document. */
class HtmlStripSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def strip(s: String): String = {
    import spark.implicits._
    TextOps.htmlStrip(Seq(s).toDF("text")).collect()(0).getString(0)
  }

  test("script and style blocks vanish with their content") {
    val got = strip("<p>keep</p><script>var a = 1 < 2 && b;</script>" +
      "<style>.x { width: 50%; }</style><p>also keep</p>")
    assert(got == "keep\nalso keep")
  }

  test("script matching is case-insensitive and attribute-tolerant") {
    assert(strip("<SCRIPT type=\"text/javascript\">nope()</SCRIPT>ok") == "ok")
    assert(strip("a<!-- hidden\nmultiline -->b") == "a b")
  }

  test("block closers become newlines; inline tags become spaces") {
    val got = strip("<h1>Title</h1><div><p>one <b>bold</b> two</p>" +
      "<ul><li>item</li></ul></div>tail<br/>end")
    assert(got == "Title\none bold two\nitem\ntail\nend")
  }

  test("entities decode after tag strip, &amp; last (no double decode)") {
    assert(strip("Tom &amp; Jerry &lt;3 &quot;cats&quot; &#39;dogs&#39;") ==
      "Tom & Jerry <3 \"cats\" 'dogs'")
    // &amp;lt; is the TEXT "&lt;", never a second-pass "<"
    assert(strip("escaped: &amp;lt;tag&amp;gt;") == "escaped: &lt;tag&gt;")
    assert(strip("a&nbsp;&nbsp;b") == "a b")
  }

  test("whitespace collapses and ends trim") {
    assert(strip("  <p>a   b</p>\n\n  <p>c</p>  ") == "a b\nc")
  }

  test("plain text without markup passes through; unclosed tag stays") {
    assert(strip("just words, no markup") == "just words, no markup")
    // fail-visible contract: no '>' means no tag match
    assert(strip("broken <tag without close") == "broken <tag without close")
  }

  test("fixture corpus: every doc keeps its head words, loses all markup") {
    import spark.implicits._
    val docs = Seq((0L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven eight"),
      (60L, "w1 w2 w3 w4 w5")) // 60 hits %3, %4 and %5 injections at once
      .toDF("doc_id", "text")
    val out = TextOps.htmlStrip(graft.SparkEntry.htmlDocs(docs))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (_, t) =>
      assert(!t.contains("<script") && !t.contains("pagegen") &&
        !t.contains("{ width") && !t.contains("</"), s"markup leaked: $t")
      assert(t.contains("Tom & Jerry <3 \"cats\" 'dogs' forever"))
    }
    assert(out(0L).startsWith("alpha beta gamma delta\nepsilon zeta"))
    assert(out(60L).startsWith("w1 w2 w3 w4\nw5"))
  }
}
