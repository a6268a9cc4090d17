package graft.ops

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew canary for the line/span dedup hash joins (VERDICT r8 ask #7):
  * one boilerplate line present in 50% of documents is the worst key
  * shape for the `__h` join back — a single hash value carrying half the
  * corpus's line rows.
  *
  * Operating envelope pinned here: the frequency table is filtered to
  * boilerplate BEFORE the join, so the build side is tiny (distinct
  * boilerplate lines, not corpus lines) and AQE converts the join to a
  * BROADCAST hash join — the probe side never shuffles on `__h` at all,
  * so the hot key cannot concentrate into one task. The canary asserts
  * (a) correctness under 50% skew and (b) that no shuffled join on `__h`
  * survives in the final adaptive plan. If a corpus ever produced a
  * boilerplate table past the broadcast threshold, AQE's skew-join
  * splitting is the documented fallback (spark.sql.adaptive.skewJoin,
  * on by default) — no manual salting needed for a join whose build
  * side is a filtered aggregate. */
class DedupSkewCanarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val nDocs = 2000
  private val boiler = "subscribe to our newsletter today"

  private def skewedDocs: DataFrame = {
    import spark.implicits._
    (0 until nDocs).map { i =>
      val unique = s"unique line number $i with words w${i}a w${i}b"
      val text =
        if (i % 2 == 0) s"$boiler\n$unique" else unique
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  /** The final (adaptive) physical plan, after execution. */
  private def finalPlan(df: DataFrame): String = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan.toString
  }

  test("lineDedup: 50%-skewed boilerplate removed correctly, join broadcast") {
    val out = Dedup.lineDedup(skewedDocs, minDocs = 2)
    val plan = finalPlan(out)
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size == nDocs)
    (0 until nDocs).foreach { i =>
      val r = rows(i.toLong)
      if (i % 2 == 0) {
        assert(r.getAs[Long]("n_removed") == 1L,
          s"doc $i must lose exactly the boilerplate line")
        assert(!r.getAs[String]("clean_text").contains(boiler))
      } else assert(r.getAs[Long]("n_removed") == 0L)
    }
    assert(plan.contains("BroadcastHashJoin"),
      "the boilerplate join-back must broadcast its filtered build side")
    assert(!plan.contains("SortMergeJoin"),
      s"no shuffled join may survive on the skewed __h key:\n$plan")
  }

  test("spanDedup: hot shared tail across 50% of docs, join broadcast") {
    import spark.implicits._
    // shared 10-word tail on half the docs -> every 5-gram window of the
    // tail is one hot __h key carrying nDocs/2 rows
    val tail10 = "the quick brown fox jumps over the lazy dog today"
    val docs = (0 until nDocs).map { i =>
      val unique = (0 until 12).map(j => s"w${i}x$j").mkString(" ")
      (i.toLong, if (i % 2 == 0) s"$unique $tail10" else unique)
    }.toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, n = 5, minRun = 4)
    val plan = finalPlan(out)
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    (0 until nDocs).foreach { i =>
      val r = rows(i.toLong)
      if (i % 2 == 0)
        assert(r.getAs[Long]("n_removed_words") == 10L,
          s"doc $i must lose the full shared 10-word tail")
      else assert(r.getAs[Long]("n_removed_words") == 0L)
    }
    assert(plan.contains("BroadcastHashJoin"),
      "the dup-window join-back must broadcast its filtered build side")
    assert(!plan.contains("SortMergeJoin"),
      s"no shuffled join may survive on the skewed __h key:\n$plan")
  }
}
