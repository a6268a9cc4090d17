package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Scale canary for duplicateGroups' fail-loud path (VERDICT r7 ask #9):
  * a duplicate CHAIN of diameter 25 — the worst shape for min-label
  * propagation, where the minimum travels one hop per round. The canary
  * pins the operating envelope: below-diameter maxIter must abort
  * loudly (never silently emit non-converged groups), and a raised
  * maxIter must converge to the single transitive component. */
class DedupCanarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def chainPairs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
  }

  test("diameter-25 chain with small maxIter fails loudly, not silently") {
    val ex = intercept[IllegalArgumentException] {
      Dedup.duplicateGroups(chainPairs(25), maxIter = 5).collect()
    }
    assert(ex.getMessage.contains("not converged"))
    assert(ex.getMessage.contains("maxIter"))
  }

  test("same chain converges once maxIter covers the diameter") {
    val groups = Dedup.duplicateGroups(chainPairs(25), maxIter = 30).collect()
    assert(groups.length == 26)
    assert(groups.forall(_.getLong(1) == 0L), "all chain members join group 0")
  }
}
