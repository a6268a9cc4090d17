package graft.ops

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence contract of the incremental dedup path: against a
  * persisted signature table, `minhashLshIncremental(new, sigs(old))`
  * must equal the full `minhashLsh(old ∪ new)` restricted to pairs
  * touching the new slice — including under the skew cap, where the
  * combined bucket size decides for both forms. */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic corpus with planted near-dup structure across the
    * old/new boundary: doc i and i+1000 share a long prefix. */
  private def corpus(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).flatMap { i =>
      val bodyWords = (0 until 30).map(w => s"w${(i * 7 + w * 13) % 50}")
      val body = s"shared stable prefix text for group ${i % 20} " + bodyWords.mkString(" ")
      Seq((i.toLong, body), (i.toLong + 1000, body + " tail variation " + i))
    }.toDF("doc_id", "text")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("incremental == full restricted to pairs touching the new slice") {
    val all = corpus(60)
    val old = all.filter(col("doc_id") < 1000)
    val fresh = all.filter(col("doc_id") >= 1000)
    val full = Dedup.minhashLsh(all, threshold = 0.5)
      .filter(col("id_a") >= 1000 || col("id_b") >= 1000)
    val inc = Dedup.minhashLshIncremental(fresh,
      Dedup.minhashSignatures(old), threshold = 0.5)
    val (f, i) = (pairSet(full), pairSet(inc))
    assert(f.nonEmpty, "fixture must plant cross-boundary near-dups")
    assert(f == i, s"full-minus-old=${f.diff(i)} inc-extra=${i.diff(f)}")
  }

  test("exactIncremental == full exact restricted to the new slice") {
    val all = corpus(40)
    val old = all.filter(col("doc_id") < 1000)
    val fresh = all.filter(col("doc_id") >= 1000)
      // plant exact dups of old docs: strip the tail from every 3rd
      .withColumn("text", when(col("doc_id") % 3 === 0,
        regexp_replace(col("text"), " tail variation \\d+$", ""))
        .otherwise(col("text")))
    val full = Dedup.exact(old.unionByName(fresh))
      .filter(col("doc_id") >= 1000)
      .select("doc_id", "is_duplicate").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val inc = Dedup.exactIncremental(fresh, Dedup.exactFingerprints(old))
      .select("doc_id", "is_duplicate").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(full.values.count(identity) > 0, "fixture must plant exact dups")
    assert(inc == full, s"diff=${inc.toSet.diff(full.toSet)}")
  }

  test("simhashIncremental == full simhashPairs restricted to the new slice") {
    val all = corpus(40)
    val old = all.filter(col("doc_id") < 1000)
    val fresh = all.filter(col("doc_id") >= 1000)
    val full = Dedup.simhashPairs(all, maxHamming = 7)
      .filter(col("id_a") >= 1000 || col("id_b") >= 1000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val inc = Dedup.simhashIncremental(fresh,
        Dedup.simhash(old).select("doc_id", "simhash"), maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full.nonEmpty, "fixture must produce cross-slice simhash pairs")
    assert(inc == full, s"full-minus-inc=${full.diff(inc)} inc-extra=${inc.diff(full)}")
  }

  test("duplicateGroupsIncremental: assignments + remaps == full re-run") {
    import spark.implicits._
    val all = corpus(60)
    val old = all.filter(col("doc_id") < 1000)
    val fresh = all.filter(col("doc_id") >= 1000)
    val fullGroups = Dedup.duplicateGroups(Dedup.minhashLsh(all, threshold = 0.5))
    val oldProp = Dedup.duplicateGroups(Dedup.minhashLsh(old, threshold = 0.5))
    val oldGroups = old.select(col("doc_id"))
      .join(oldProp, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("group_id"), col("doc_id")).as("group_id"))
    val newPairs = Dedup.minhashLshIncremental(fresh,
      Dedup.minhashSignatures(old), threshold = 0.5)
    val (assign, remaps) = Dedup.duplicateGroupsIncremental(newPairs, oldGroups)

    val fullMap = fullGroups.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val assignMap = assign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every new doc in pairs gets exactly the full-run label
    assert(assignMap.nonEmpty && assignMap.keys.forall(_ >= 1000))
    assignMap.foreach { case (id, g) =>
      assert(fullMap(id) == g, s"new doc $id: incremental $g vs full ${fullMap(id)}")
    }
    assert(assignMap.keySet == fullMap.keySet.filter(_ >= 1000),
      "assignment coverage must match the full run's new-slice rows")
    // remapped old groups: applying remaps to the stored table must
    // reproduce the full-run labels for every old doc the full run labels
    val remapMap = remaps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val updatedOld = oldGroups.collect().map { r =>
      val (id, g) = (r.getLong(0), r.getLong(1))
      id -> remapMap.getOrElse(g, g)
    }.toMap
    fullMap.filter(_._1 < 1000).foreach { case (id, g) =>
      assert(updatedOld(id) == g, s"old doc $id: updated ${updatedOld(id)} vs full $g")
    }
  }

  test("semDedupIncremental == full semDedup restricted to the new slice") {
    import spark.implicits._
    // deterministic 8-dim vectors; every 4th new vector copies an old one
    def vec(i: Long, copyOf: Option[Long]): Array[Double] = {
      val s = copyOf.getOrElse(i)
      Array.tabulate(8)(d => math.sin(s * 13.0 + d * 7.0))
    }
    val old = (0L until 40L).map(i => (i, vec(i, None))).toDF("vec_id", "embedding")
    val fresh = (0L until 20L).map { j =>
      val id = 1000L + j
      (id, vec(id, if (j % 4 == 0) Some(j) else None))
    }.toDF("vec_id", "embedding")
    val centers = Similarity.ivfCentroids(old, nCells = 4)
    val full = Similarity.semDedup(old.unionByName(fresh), centers, threshold = 0.95)
      .filter(col("vec_id") >= 1000).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    val inc = Similarity.semDedupIncremental(fresh,
        Similarity.semDedupState(old, centers), centers, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    assert(full.exists(_._3), "fixture must plant semantic dups")
    assert(inc == full, s"diff=${inc.diff(full)} / ${full.diff(inc)}")
  }

  test("skew cap applies to combined buckets in both forms") {
    import spark.implicits._
    // 30 identical docs split across the boundary → one flooded bucket
    val flood = (0 until 30).map(i =>
      (if (i < 15) i.toLong else i.toLong + 1000,
        "identical flooded document body repeated words alpha beta gamma"))
      .toDF("doc_id", "text")
    val old = flood.filter(col("doc_id") < 1000)
    val fresh = flood.filter(col("doc_id") >= 1000)
    val full = Dedup.minhashLsh(flood, threshold = 0.5, maxBucketSize = Some(10))
      .filter(col("id_a") >= 1000 || col("id_b") >= 1000)
    val inc = Dedup.minhashLshIncremental(fresh, Dedup.minhashSignatures(old),
      threshold = 0.5, maxBucketSize = Some(10))
    assert(pairSet(full) == pairSet(inc))
    assert(inc.count() == 0, "combined bucket of 30 > cap 10 must drop everywhere")
  }
}
