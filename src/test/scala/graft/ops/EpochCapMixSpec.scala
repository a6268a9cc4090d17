package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Epoch-capped allocation contract: the cap binds exactly where
  * desired > maxEpochs·T, epochs never exceed the cap, and the
  * shortfall equals the sum of what the caps refused. */
class EpochCapMixSpec extends AnyFunSuite {

  test("cap binds for the upweighted small domain; shortfall adds up") {
    import TestSpark.spark.implicits._
    // big: 10000 tokens, small: 100 tokens — alpha 0.5 upweights small
    val docs = Seq(("big", ("x " * 10000).trim), ("small", ("y " * 100).trim))
      .toDF("source", "text")
    val plan = Sampling.epochCapMixPlan(docs, "source",
        budgetTokens = 5000, maxEpochs = 2.0, alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    val sqrtSum = math.sqrt(10000.0) + math.sqrt(100.0) // 110
    val (bigT, bigP, bigAlloc, bigEp, shortfall) = plan("big")
    val (smallT, _, smallAlloc, smallEp, _) = plan("small")
    assert(bigT == 10000 && smallT == 100)
    assert(math.abs(bigP - 100.0 / sqrtSum) < 1e-12)
    // small desired = (10/110)*5000 ≈ 454.5 > 200 = 2 epochs -> capped
    assert(smallAlloc == 200 && math.abs(smallEp - 2.0) < 1e-12)
    // big desired = (100/110)*5000 ≈ 4545.5 < 20000 -> uncapped
    assert(bigAlloc == 4545 && bigEp < 0.5)
    assert(math.abs(shortfall - (10.0 / 110 * 5000 - 200.0)) < 1e-6)
  }

  test("zero-risk config: no domain caps, shortfall ~ 0") {
    import TestSpark.spark.implicits._
    val docs = Seq(("a", "w " * 50), ("b", "w " * 50)).toDF("source", "text")
    val plan = Sampling.epochCapMixPlan(docs, "source",
      budgetTokens = 50, maxEpochs = 5.0).collect()
    assert(plan.forall(_.getDouble(5) < 1e-9)) // shortfall column
    assert(plan.forall(r => r.getDouble(4) <= 5.0))
    intercept[IllegalArgumentException](
      Sampling.epochCapMixPlan(docs, "source", 0, 2.0))
  }
}
