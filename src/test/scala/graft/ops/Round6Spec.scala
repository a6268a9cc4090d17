package graft.ops

import graft.TestSpark
import graft.core.PanelCols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 additions: MSTL multi-seasonal decomposition fixtures and the
  * spill/valve canaries (VERDICT r5 asks #6 and #8) — bench-shaped inputs
  * at 10× spec scale with `spark.sql.shuffle.partitions` forced low, so a
  * scale valve that silently stopped engaging fails here before a real
  * 100× run finds out. */
class Round6Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit val pc: PanelCols = PanelCols()

  /** Panel with a per-series level offset (i·step) so elastic distances
    * between far-apart series are genuinely large — unlike Bench's
    * synthPanel, where every series is noise-identical and nothing is
    * LB-prunable. */
  private def offsetPanel(nSeries: Int, len: Int, step: Double): DataFrame =
    spark.range(nSeries.toLong * len).select(
      (col("id") / len).cast("long").as("unique_id"),
      timestamp_micros((col("id") % len) * 3600000000L).as("ds"),
      (sin(col("id") % len / lit(6.0)) * 2.0 +
        (col("id") / len).cast("double") * step +
        pmod(xxhash64(col("id")), lit(1000)) / lit(1000.0)).as("y"))

  test("mstl recovers trend + both seasonalities on a noise-free panel") {
    import spark.implicits._
    val n = 240
    val rows = for (id <- Seq("a", "b"); t <- 0 until n) yield {
      val s4 = 2.0 * math.sin(2 * math.Pi * t / 4.0)
      val s6 = 3.0 * math.cos(2 * math.Pi * t / 6.0)
      (id, t, 0.05 * t + s4 + s6 + (if (id == "a") 0.0 else 1.0))
    }
    val df = rows.toDF("unique_id", "__h", "y")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L)).drop("__h")

    val dec = Decomposition.mstl(df, Seq(4, 6))
    // interior rows (full MA windows): components reconstruct y exactly up
    // to the classical extractor's bias on a pure additive signal
    val maxResid = dec.filter(col("resid").isNotNull)
      .agg(max(abs(col("resid")))).head.getDouble(0)
    assert(maxResid < 0.15, s"max |resid| = $maxResid")

    val feats = Decomposition.mstlStrengthFeatures(df, Seq(4, 6)).collect()
    assert(feats.length == 2)
    for (r <- feats) {
      assert(r.getAs[Double]("trend_strength") > 0.9)
      assert(r.getAs[Double]("seasonal_4_strength") > 0.9)
      assert(r.getAs[Double]("seasonal_6_strength") > 0.9)
    }
  }

  test("mstl with a single period degenerates to one seasonal component") {
    import spark.implicits._
    val df = (0 until 120).map(t =>
        ("s", t, 5.0 * math.sin(2 * math.Pi * t / 12.0) + 0.1 * t))
      .toDF("unique_id", "__h", "y")
      .withColumn("ds", timestamp_micros(col("__h") * 3600000000L)).drop("__h")
    val dec = Decomposition.mstl(df, Seq(12))
    assert(dec.columns.contains("seasonal_12") && dec.columns.contains("trend"))
    val maxResid = dec.filter(col("resid").isNotNull)
      .agg(max(abs(col("resid")))).head.getDouble(0)
    assert(maxResid < 0.1, s"max |resid| = $maxResid")
  }

  test("minnesota prior: lag decay, cross-tightening max, diffuse intercept") {
    import graft.kernels.Bayesian
    // 3-variable panel with distinct scales so the σ²ᵢ/σ²ⱼ cross ratios bite
    val data = Array.tabulate(60, 3)((t, j) =>
      (j + 1.0) * math.sin(0.3 * t + j) + 0.02 * t)
    val v0 = Bayesian.minnesotaV0Inv(data, p = 2)
    assert(v0.length == 7)
    assert(v0(6) == 1e-6, "intercept must be diffuse")
    // own-lag floor: lag1 1/(λ1)² = 25, lag2 1/(λ1/2)² = 100; the
    // cross-precision max can only raise these
    for (c <- 0 until 3) assert(v0(c) >= 25.0 - 1e-9, s"lag1 col $c = ${v0(c)}")
    for (c <- 3 until 6) assert(v0(c) >= 100.0 - 1e-9, s"lag2 col $c = ${v0(c)}")
    val (fcM, loM, hiM) = Bayesian.bvarForecast(data, 2, 3, prior = "minnesota")
    val (fcR, _, _) = Bayesian.bvarForecast(data, 2, 3)
    val m = fcM.flatMap(_.toSeq)
    val lo = loM.flatMap(_.toSeq)
    val hi = hiM.flatMap(_.toSeq)
    val r = fcR.flatMap(_.toSeq)
    assert(m.forall(v => !v.isNaN && !v.isInfinite))
    assert(m.indices.forall(i => lo(i) <= m(i) && m(i) <= hi(i)))
    assert(m.zip(r).exists { case (a, b) => math.abs(a - b) > 1e-9 },
      "minnesota posterior should differ from the ridge posterior")
  }

  test("scale canary: banded pairwise DTW 2000x200, 2 shuffle partitions") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      // offset step 0.5 and maxDist 150: per-point noise alone contributes
      // ~0.33·200 ≈ 66 and each offset step ~0.5·200 = 100, so only
      // near-offset series survive — the LB_Keogh envelope bound collapses
      // the 2M-pair fan-in before the O(n·w) DP runs, exactly the valve
      // the bench path relies on
      val out = Distances.pairwise(offsetPanel(2000, 200, 0.5), "dtw",
        Map("window" -> 10.0), maxDist = Some(150.0), topK = 5)
      val n = out.count()
      assert(n > 0, "LB-pruned banded DTW returned no pairs")
      // every surviving pair must be a near neighbour in offset space
      val farPairs = out.filter(abs(col("id_1") - col("id_2")) > 100).count()
      assert(farPairs == 0, s"$farPairs far pairs leaked past maxDist=150")
      // topK valve: no left series keeps more than 5 partners
      val overK = out.groupBy("id_1").count().filter(col("count") > 5).count()
      assert(overK == 0, "topK=5 valve not enforced")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("stable sampling: membership independent of corpus composition") {
    import spark.implicits._
    val full = (0L until 1000L).toDF("doc_id")
    val half = (0L until 500L).toDF("doc_id")
    val sFull = Sampling.stableSample(full, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    val sHalf = Sampling.stableSample(half, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    // removing docs 500-999 must not change 0-499's membership
    assert(sHalf == sFull.filter(_ < 500L))
    assert(sFull.size > 200 && sFull.size < 400, s"rate off: ${sFull.size}/1000")

    val split = Sampling.stableSplit(full, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(split.values.sum == 1000)
    assert(split("train") > 700 && split("train") < 900)

    val grouped = full.withColumn("g", pmod(col("doc_id"), lit(3)))
    val quota = Sampling.stratifiedQuota(grouped, "g", "doc_id", quota = 50)
    val sizes = quota.groupBy("g").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ == 50), sizes.toSeq.toString)
    // determinism: same rows survive on re-run
    val again = Sampling.stratifiedQuota(grouped, "g", "doc_id", quota = 50)
    assert(quota.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("duplicateGroups: chains merge to min-id components") {
    import spark.implicits._
    // components: {1,2,3,4} via chain 1-2, 2-3, 3-4; {10,11}; isolated
    // nodes never enter the pair list so never appear in the output
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val groups = Dedup.duplicateGroups(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("scale canary: minhash LSH on 5x documents, 2 shuffle partitions") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val docs = graft.core.IO.documents(spark, "/root/testdata/sf0.001")
        .select("doc_id", "text")
      val n = docs.count()
      // 5 salted copies with distinct ids: every source doc becomes a
      // 5-clique of exact near-dups the band join must recover
      val x5 = docs.crossJoin(
          spark.range(5).select(col("id").as("__salt")))
        .select((col("doc_id") * 5 + col("__salt")).as("doc_id"), col("text"))
      val pairs = Dedup.minhashLsh(x5, threshold = 0.9)
      val got = pairs.count()
      // 5-clique per doc = 10 intra-clique pairs minimum
      assert(got >= n * 10,
        s"expected >= ${n * 10} intra-clique pairs, got $got")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("repetitionMetrics: dup-line and top n-gram fractions on a fixture") {
    import spark.implicits._
    // 4 non-empty lines, "dup line" appears twice → dup_line_frac = 1/4;
    // line chars: 7+7+5+4 = 23, distinct 7+5+4 = 16 → char frac = 7/23
    val text = "dup line\ndup line\nalpha\n\nbeta"
      .replace("dup line", "dupline") // keep words distinct from grams below
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextOps.repetitionMetrics(df).head()
    assert(math.abs(r.getAs[Double]("dup_line_frac") - 0.25) < 1e-9)
    assert(math.abs(r.getAs[Double]("dup_line_char_frac") - 7.0 / 23.0) < 1e-9)
    // words: dupline dupline alpha beta → best 2-gram "dupline dupline":
    // count 1 · chars 14 / total chars 23
    val g2 = TextOps.repetitionMetrics(Seq((1L, "a b a b a c"))
      .toDF("doc_id", "text")).head().getAs[Double]("top2gram_char_frac")
    // grams: "a b"×2, "b a"×2, "a c"×1 → best = 2·2 over 6 word chars
    assert(math.abs(g2 - 4.0 / 6.0) < 1e-9)
  }

  test("piiMetrics detects and redacts emails, IPv4s, phones") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.user@ex-site.org then 192.168.0.1 and 555-123-4567 end"),
      (2L, "nothing here")).toDF("doc_id", "text")
    val out = TextOps.piiMetrics(df).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_emails") == 1)
    assert(out(0).getAs[Long]("n_ipv4") == 1)
    assert(out(0).getAs[Long]("n_phones") == 1)
    assert(out(0).getAs[Boolean]("pii_flag"))
    assert(out(0).getAs[String]("redacted_text") ==
      "mail [EMAIL] then [IP] and [PHONE] end")
    assert(!out(1).getAs[Boolean]("pii_flag"))
    assert(out(1).getAs[String]("redacted_text") == "nothing here")
  }

  test("lineFilters: C4 line stats and clean_text rebuild") {
    import spark.implicits._
    val text = "A good long sentence here.\n- bullet\nshort\nit trails off...\n{x}\n"
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextOps.lineFilters(df).head()
    assert(r.getAs[Long]("n_lines") == 5)
    // terminal: sentence + ellipsis line → 2/5
    assert(math.abs(r.getAs[Double]("terminal_punct_frac") - 0.4) < 1e-9)
    assert(math.abs(r.getAs[Double]("bullet_frac") - 0.2) < 1e-9)
    assert(math.abs(r.getAs[Double]("ellipsis_frac") - 0.2) < 1e-9)
    assert(r.getAs[Boolean]("has_brace"))
    // kept: >=3 words AND terminal punctuation
    assert(r.getAs[String]("clean_text") ==
      "A good long sentence here.\nit trails off...")
  }

  test("canonical maps every duplicate to the min id of its group") {
    import spark.implicits._
    val df = Seq(
      (10L, "same text"), (3L, "Same   TEXT"), (7L, "other")).toDF("doc_id", "text")
    val out = Dedup.canonical(df).orderBy("doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("canonical_id"),
      r.getAs[Boolean]("is_canonical"))).toSeq ==
      Seq((3L, 3L, true), (7L, 7L, true), (10L, 3L, false)))
  }

  test("semDedup marks later cluster members above the cosine threshold") {
    import spark.implicits._
    // two orthogonal directions; ids 1,2 near-parallel (cos≈1), id 3
    // antiparallel to 1 (cos=-1, same cell as nothing), id 4 orthogonal
    val df = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0)),
      (2L, Array(0.999, 0.01, 0.0, 0.0)),
      (3L, Array(0.0, 1.0, 0.0, 0.0)),
      (4L, Array(0.0, 0.995, 0.02, 0.0))).toDF("vec_id", "embedding")
    val centers = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val out = Similarity.semDedup(df, centers, threshold = 0.9)
      .orderBy("vec_id").collect()
    assert(out.map(r => (r.getLong(0), r.getBoolean(2))).toSeq ==
      Seq((1L, false), (2L, true), (3L, false), (4L, true)))
    // dup marks carry the max cosine to an earlier member
    assert(out(1).getDouble(3) > 0.99)
  }

  test("pcaFit recovers a planted principal direction; projection centers") {
    import spark.implicits._
    // rank-1 data along (0.6, 0.8) plus a constant mean shift
    val ts = Seq(-2.0, -1.0, 0.0, 1.0, 2.0)
    val df = ts.zipWithIndex.map { case (t, i) =>
      (i.toLong, Array(1.0 + 0.6 * t, 5.0 + 0.8 * t))
    }.toDF("vec_id", "embedding")
    val m = Embeddings.pcaFit(df, k = 2)
    assert(math.abs(m.components(0)(0) - 0.6) < 1e-9)
    assert(math.abs(m.components(0)(1) - 0.8) < 1e-9)
    assert(math.abs(m.explained(0) - 1.0) < 1e-9)
    val proj = Embeddings.pcaProject(df, m).orderBy("vec_id")
      .select("pc1").collect().map(_.getDouble(0))
    ts.indices.foreach(i => assert(math.abs(proj(i) - ts(i)) < 1e-9))
  }

  test("unigramLogProb scores docs by mean token log-prob with OOV floor") {
    import spark.implicits._
    val df = Seq((1L, "the cat"), (2L, "the the dog"))
      .toDF("doc_id", "text")
    // counts: the=3, cat=1, dog=1; total=5; vocab top-2 = the, cat
    val out = TextOps.unigramLogProb(df, vocabSize = 2)
      .orderBy("doc_id").collect()
    val (lnThe, lnCat, oov) =
      (math.log(3 / 5.0), math.log(1 / 5.0), math.log(0.5 / 5.0))
    assert(out(0).getLong(1) == 2L)
    assert(math.abs(out(0).getDouble(2) - (lnThe + lnCat) / 2) < 1e-12)
    assert(out(1).getLong(1) == 3L)
    assert(math.abs(out(1).getDouble(2) - (2 * lnThe + oov) / 3) < 1e-12)
  }

  test("temperatureMixPlan flattens skewed sources; sample honors quotas") {
    import spark.implicits._
    // 90/10 skew: alpha=0.5 → weights 3:1 → p = 0.75/0.25 (vs 0.9/0.1)
    val rows = (1L to 90L).map(i => (i, "big")) ++ (91L to 100L).map(i => (i, "small"))
    val df = rows.toDF("doc_id", "source")
    val plan = Sampling.temperatureMixPlan(df, "source", budget = 40, alpha = 0.5)
      .orderBy("source").collect()
    assert(plan.map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq ==
      Seq(("big", 90L, 30L), ("small", 10L, 10L)))
    assert(math.abs(plan(0).getDouble(2) - 0.75) < 1e-12)
    // quota for 'small' capped at n (0.25*40 = 10 = n); sample realizes plan
    val sampled = Sampling.temperatureSample(df, "source", "doc_id",
      budget = 40, alpha = 0.5)
    assert(sampled.groupBy("source").count().orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("big", 30L), ("small", 10L)))
    // stability: membership is identical across runs/partitionings
    val again = Sampling.temperatureSample(df.repartition(7), "source",
      "doc_id", budget = 40, alpha = 0.5)
    assert(sampled.select("doc_id").except(again.select("doc_id")).count() == 0)
  }

  test("dupNgramCoverage measures cross-doc window duplication") {
    import spark.implicits._
    val shared = "one two three four five six"
    val df = Seq(
      (1L, shared),                        // 2 windows, both shared with doc 2
      (2L, shared + " seven"),             // 3 windows, first 2 shared
      (3L, "alpha beta gamma delta epsilon zeta")) // unique
      .toDF("doc_id", "text")
    val out = Dedup.dupNgramCoverage(df, n = 5, threshold = 0.5)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 2L), (2L, 3L, 2L), (3L, 2L, 0L)))
    assert(out(0).getBoolean(4) && out(1).getBoolean(4) && !out(2).getBoolean(4))
  }

  test("packPlan: per-shard running offsets and sequence spans") {
    import spark.implicits._
    // one shard → pure concat-and-split semantics are hand-checkable
    val df = Seq(
      (1L, Seq.fill(100)("w").mkString(" ")),  // toks 0..99   → seq 0
      (2L, Seq.fill(60)("w").mkString(" ")),   // toks 100..159 → seqs 0-1
      (3L, Seq.fill(100)("w").mkString(" ")))  // toks 160..259 → seqs 1-2
      .toDF("doc_id", "text")
    val out = Packing.packPlan(df, seqLen = 128, nShards = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_tok"),
        r.getAs[Long]("end_tok"), r.getAs[Long]("first_seq"),
        r.getAs[Long]("last_seq")))
    assert(out.toSeq == Seq(
      (1L, 0L, 100L, 0L, 0L),
      (2L, 100L, 160L, 0L, 1L),
      (3L, 160L, 260L, 1L, 2L)))
  }

  test("scalarQuantize codes endpoints/midpoints; constant dims code to 0") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.0, 7.0)), (2L, Array(2.55, 7.0)), (3L, Array(1.0, 7.0)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.scalarQuantize(df).orderBy("vec_id").collect()
    val codes = out.map(_.getSeq[Int](1).toSeq)
    // dim1: min 0, max 2.55 → scale 0.01; dim2 constant → code 0
    assert(codes(0) == Seq(0, 0))
    assert(codes(1) == Seq(255, 0))
    assert(codes(2) == Seq(100, 0))
    // reconstruction error bounded by (scale/2)^2 per dim
    out.foreach(r => assert(r.getDouble(2) <= 0.005 * 0.005 / 2 + 1e-12))
  }

  test("pqEncode deterministic under repartition; ADC top-k carries signal") {
    val emb = graft.core.IO.embeddings(spark, "/root/testdata/sf0.001")
    val cb = Embeddings.pqFit(emb)
    assert(cb.length == 8 && cb.forall(_.length == 16))
    def codesOf(df: org.apache.spark.sql.DataFrame) =
      Embeddings.pqEncode(df, cb).orderBy("vec_id").collect()
        .map(_.getSeq[Int](1).toSeq).toSeq
    val c1 = codesOf(emb)
    assert(c1 == codesOf(emb.repartition(5)))
    assert(c1.flatten.forall(c => c >= 0 && c < 16))
    // ADC contract: the score IS the exact distance between the query and
    // the neighbor's PQ reconstruction (cb[s][code_s] per subspace).
    // (The testdata embeddings are isotropic noise — same-label and
    // cross-label mean distances agree to 4 decimals — so top-k RECALL is
    // not a meaningful property there; retrieval is asserted on planted
    // structure below.)
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .toMap
    val codeMap = Embeddings.pqEncode(emb, cb).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    val q = emb.filter(col("vec_id") < 10)
    Embeddings.pqAdcTopK(emb, q, k = 3, cb).collect().foreach { r =>
      val (qv, codes) = (vecs(r.getLong(0)), codeMap(r.getLong(1)))
      val expect = (0 until 8).map { s =>
        val c = cb(s)(codes(s))
        (0 until 8).map(t => math.pow(qv(s * 8 + t) - c(t), 2)).sum
      }.sum
      assert(math.abs(r.getAs[Double]("adc") - expect) < 1e-9)
    }
    // planted structure: 4 well-separated prototypes + small deterministic
    // jitter → ADC top-1 must come from the query's own prototype group
    import spark.implicits._
    val protos = Array.tabulate(4, 64)((p, i) => if (i % 4 == p) 5.0 else 0.0)
    val planted = (0 until 40).map { i =>
      val p = i % 4
      (i.toLong, Array.tabulate(64)(d =>
        protos(p)(d) + 0.01 * (((i * 64 + d) % 17) - 8)))
    }.toDF("vec_id", "embedding")
    val pcb = Embeddings.pqFit(planted, sampleSize = 40)
    val top1 = Embeddings.pqAdcTopK(planted, planted.filter(col("vec_id") < 8),
        k = 1, pcb).collect()
    top1.foreach(r =>
      assert(r.getLong(0) % 4 == r.getLong(1) % 4,
        s"query ${r.getLong(0)} matched ${r.getLong(1)}"))
  }

  test("chunkPlan emits overlapping windows covering every token") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.fill(100)("w").mkString(" ")), // 64@0, 64@48 → chunks 0,1
      (2L, Seq.fill(64)("w").mkString(" ")),  // exactly one window
      (3L, "short doc"))                      // sub-window doc still emits
      .toDF("doc_id", "text")
    val out = Packing.chunkPlan(df).orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("end_tok")))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 64L), (1L, 1L, 48L, 100L),
      (2L, 0L, 0L, 64L),
      (3L, 0L, 0L, 2L)))
  }

  test("canary: decontamination at 5x docs with forced-low partitions") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val docs = graft.core.IO.documents(spark, "/root/testdata/sf0.001")
        .select("doc_id", "text")
      val x5 = docs.crossJoin(
          spark.range(5).select(col("id").as("__salt")))
        .select((col("doc_id") * 5 + col("__salt")).as("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 10 === 0)
      val out = Decontam.ngramOverlap(x5, bench, n = 5)
      // every salted copy of a bench doc must be flagged (identical text)
      val benchIds = bench.count() * 5
      assert(out.filter(col("contaminated")).count() >= benchIds)
      assert(out.count() == docs.count() * 5)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("ngramOverlap counts distinct shared n-grams against a bench set") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps"),   // shares both 3-grams of bench doc
      (2L, "the quick brown dog sits"),    // shares "the quick brown" only
      (3L, "completely different words here")).toDF("doc_id", "text")
    val bench = Seq((9L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val out = Decontam.ngramOverlap(train, bench, n = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_overlap")).toSeq == Seq(3L, 1L, 0L))
    assert(out.map(_.getAs[Boolean]("contaminated")).toSeq ==
      Seq(true, true, false))
  }

  test("ngramOverlapBloom is bit-identical to the exact overlap gate") {
    val docs = graft.core.IO.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val exact = Decontam.ngramOverlap(docs, bench, n = 5)
      .orderBy("doc_id").collect().toSeq
    val bloomed = Decontam.ngramOverlapBloom(docs, bench, n = 5)
      .orderBy("doc_id").collect().toSeq
    assert(exact == bloomed)
    // and at an aggressive fpp the exact verify still kills every FP
    val sloppy = Decontam.ngramOverlapBloom(docs, bench, n = 5, fpp = 0.4)
      .orderBy("doc_id").collect().toSeq
    assert(exact == sloppy)
  }

  test("topicAssign: nearest centroid wins, low-index tie-break, exact dist") {
    import spark.implicits._
    val centers = Array(Array(0.0, 0.0), Array(10.0, 0.0))
    val df = Seq(
      (1L, Array(1.0, 0.0)),   // dist 1 vs 9 → topic 0
      (2L, Array(9.0, 2.0)),   // topic 1, dist sqrt(1+4)
      (3L, Array(5.0, 0.0)))   // exact tie → first index (topic 0)
      .toDF("vec_id", "embedding")
    val out = Similarity.topicAssign(df, centers).orderBy("vec_id").collect()
    assert(out.map(_.getAs[Int]("topic")).toSeq == Seq(0, 1, 0))
    assert(math.abs(out(0).getAs[Double]("centroid_dist") - 1.0) < 1e-12)
    assert(math.abs(out(1).getAs[Double]("centroid_dist") - math.sqrt(5.0)) < 1e-12)
    assert(math.abs(out(2).getAs[Double]("centroid_dist") - 5.0) < 1e-12)
  }

  test("topicBalancedSample caps each topic and is partition-stable") {
    val emb = graft.core.IO.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val centers = Similarity.ivfCentroids(emb)
    val sampled = Similarity.topicBalancedSample(emb, centers, quota = 5)
    val perTopic = sampled.groupBy("topic").count().collect()
    assert(perTopic.forall(_.getLong(1) <= 5L))
    // stable: same survivors regardless of input partitioning
    val again = Similarity.topicBalancedSample(
      emb.repartition(7), centers, quota = 5)
    assert(sampled.select("vec_id").except(again.select("vec_id")).count() == 0)
    assert(again.select("vec_id").except(sampled.select("vec_id")).count() == 0)
  }
}
