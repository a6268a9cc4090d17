package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The lookahead-free gpt2 pre-tokenizer: contractions split, spaces
  * attach to the following token, digit/letter/punct runs separate,
  * and the stream reconstructs the input exactly (total cover). */
class PreTokenizeSpec extends AnyFunSuite {

  private def toks(s: String): Seq[String] = {
    import TestSpark.spark.implicits._
    TextOps.preTokenize(Seq(s).toDF("text"))
      .collect()(0).getSeq[String](1)
  }

  test("gpt2 shapes: contractions, space-prefixed runs, punct runs") {
    assert(toks("I'll say don't, twice!") ==
      Seq("I", "'ll", " say", " don", "'t", ",", " twice", "!"))
    assert(toks("abc123 x-9") == Seq("abc", "123", " x", "-", "9"))
    assert(toks("Café über") == Seq("Café", " über")) // unicode letters
  }

  test("whitespace runs and empties; concatenation reconstructs input") {
    assert(toks("") == Seq.empty)
    // lookahead-free deviation: a multi-space run is consumed whole
    // (gpt2's lookahead would leave one space to prefix "b")
    assert(toks("a  b") == Seq("a", "  ", "b"))
    assert(toks("a b") == Seq("a", " b")) // single spaces still attach
    val s = "It's 2024 — naïve tests,\n\ttabs & 7 more!"
    assert(toks(s).mkString == s) // total cover, order preserved
  }
}
