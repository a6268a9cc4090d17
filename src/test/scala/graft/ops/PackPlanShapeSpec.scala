package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contract of the r10 slice-based [[Packing.executePack]]:
  * ONE exchange total. Token ids are hashed inside the array before the
  * shard window's hash(shard) exchange, the per-sequence split is narrow
  * (Generate + slice arithmetic), and the (shard, seq) aggregation
  * REUSES the window's partitioning — hash(shard) clusters every
  * (shard, seq) group, so EnsureRequirements inserts no second shuffle
  * (partial + final ObjectHashAggregate back-to-back). The r9 plan
  * shuffled one row PER TOKEN through two exchanges. */
class PackPlanShapeSpec extends AnyFunSuite {

  test("executePack: one exchange, agg reuses the window's shard partitioning") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = (1 to 500).map(i =>
      (i.toLong, (1 to 50).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing.executePack(docs, seqLen = 16, nShards = 4)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, s"expected exactly 1 exchange:\n$plan")
    // the split is narrow: no explode of individual tokens (the Generate
    // emits one row per touched sequence, carrying an array slice)
    assert(!plan.contains("posexplode"), "per-token posexplode resurfaced")
    // both aggregate halves present without an exchange between them
    val aggLines = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.size === 2, s"expected partial+final agg:\n$plan")
  }

  test("executePack values: sequences tile the concatenated shard stream") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = (1 to 40).map(i =>
      (i.toLong, (1 to (i % 7) + 1).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val seqLen = 5
    val out = Packing.executePack(docs, seqLen = seqLen, nShards = 3).collect()
    val plan = Packing.packPlan(
      docs.select(col("doc_id"), col("text")), seqLen, nShards = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("start_tok"))).toSeq
    // per shard: total tokens == sum of per-sequence n_tokens, every
    // sequence except the shard's last is exactly seqLen
    val perShardTokens = plan.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    out.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rows) =>
      assert(rows.map(_.getAs[Long]("n_tokens")).sum === perShardTokens(shard))
      val byIdx = rows.sortBy(_.getAs[Long]("seq_index"))
      byIdx.init.foreach(r => assert(r.getAs[Long]("n_tokens") === seqLen))
      // seq indices are contiguous from 0
      assert(byIdx.map(_.getAs[Long]("seq_index")).toSeq ===
        (0L until byIdx.size))
      // token_id_arr length matches n_tokens and the CSV column agrees
      byIdx.foreach { r =>
        val arr = r.getAs[scala.collection.Seq[Int]]("token_id_arr")
        assert(arr.size === r.getAs[Long]("n_tokens"))
        assert(r.getAs[String]("token_ids") === arr.mkString(","))
      }
    }
  }
}
