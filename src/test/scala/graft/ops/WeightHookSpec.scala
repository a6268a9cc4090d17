package graft.ops

import graft.TestSpark
import graft.core.PanelCols
import graft.kernels.DetRng
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The no-egress weight-loading hook (VERDICT r9 ask #7): chronos /
  * moment / vision embedders accept locally-loaded tensors in place of
  * the DetRng surrogate.
  *
  * The equivalence tests exploit that the surrogate IS a table: writing
  * the counter-function entries into an explicit (row, vec) table and
  * feeding it through the hook must reproduce the surrogate path
  * bit-for-bit — proving the hook changes WHERE weights come from, not
  * what the operator computes. A random tensor fixture then exercises
  * the real-weights path end to end (deterministic, different values). */
class WeightHookSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private implicit val pc: PanelCols =
    PanelCols("unique_id", "ds", "y")

  private lazy val panel: DataFrame = {
    import spark.implicits._
    (for (id <- 0 until 6; t <- 0 until 40) yield
      (s"s$id", t, 10.0 + 3.0 * math.sin(t / 4.0 + id) + id))
      .toDF("unique_id", "ds", "y")
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** The chronos surrogate's token-embedding table, materialized:
    * entry (tok, j) = uniform(seedC, tok·dim + j)·2 − 1. */
  private def chronosSurrogateTable(maxTok: Int, dim: Int,
      seed: Long): DataFrame = {
    import spark.implicits._
    val seedC = DetRng.seedConst(seed)
    (0 to maxTok).map { tok =>
      (tok.toLong, (0 until dim).map(j =>
        DetRng.uniform(seedC, tok.toLong * dim + j) * 2 - 1).toArray)
    }.toDF("row", "vec")
  }

  test("chronosEmbed: surrogate-valued table through the hook == surrogate path") {
    val dim = 6
    val cfg = Foundation.ChronosCfg(nBins = 64)
    val table = chronosSurrogateTable(cfg.nBins, dim, seed = 7L)
    val surrogate = Foundation.chronosEmbed(panel, dim = dim, cfg = cfg)
    val hooked = Foundation.chronosEmbed(panel, dim = dim, cfg = cfg,
      weights = Some(table))
    assert(canon(hooked) === canon(surrogate))
  }

  test("momentEmbed: surrogate-valued table through the hook == surrogate path") {
    import spark.implicits._
    val dim = 4; val patchLen = 8; val seed = 11L
    val seedC = DetRng.seedConst(seed)
    val table = (0 until patchLen).map { k =>
      (k.toLong, (0 until dim).map(j =>
        DetRng.uniform(seedC, k.toLong * dim + j) * 2 - 1).toArray)
    }.toDF("row", "vec")
    val surrogate = Foundation.momentEmbed(panel, dim = dim,
      patchLen = patchLen, seed = seed)
    val hooked = Foundation.momentEmbed(panel, dim = dim,
      patchLen = patchLen, seed = seed, weights = Some(table))
    assert(canon(hooked) === canon(surrogate))
  }

  test("chronosEmbed: random tensor file exercised end to end") {
    import spark.implicits._
    val dim = 6
    val cfg = Foundation.ChronosCfg(nBins = 64)
    val rng = new scala.util.Random(123)
    val dir = java.nio.file.Files.createTempDirectory("wh").toString
    (0 to cfg.nBins).map(tok => ("tok_emb", tok.toLong,
        Array.fill(dim)(rng.nextGaussian())))
      .toDF("name", "row", "vec")
      .write.mode("overwrite").parquet(s"$dir/tensors")
    val table = Foundation.loadTensorTable(spark, s"$dir/tensors", "tok_emb")
    val a = Foundation.chronosEmbed(panel, dim = dim, cfg = cfg,
      weights = Some(table))
    val b = Foundation.chronosEmbed(panel, dim = dim, cfg = cfg,
      weights = Some(table))
    assert(a.count() === 6)
    assert(canon(a) === canon(b)) // deterministic given the file
    val surrogate = Foundation.chronosEmbed(panel, dim = dim, cfg = cfg)
    assert(canon(a) !== canon(surrogate)) // real weights actually used
  }

  test("chronosEmbed: partial / empty weight tables fail loudly") {
    val dim = 6
    val cfg = Foundation.ChronosCfg(nBins = 64)
    import spark.implicits._
    // partial table (the realistic truncated-export case): panel tokens
    // land well past row 4, so the per-row assert valve must fire
    val partial = (0L to 4L).map(r => (r, Array.fill(dim)(0.5))).toDF("row", "vec")
    val e = intercept[Exception] {
      Foundation.chronosEmbed(panel, dim = dim, cfg = cfg,
        weights = Some(partial)).collect()
    }
    assert(e.getMessage.contains("weight table") ||
      e.getCause != null && e.getCause.getMessage.contains("weight table"))
    // fully empty table: empty-relation propagation would constant-fold
    // the valve into silent all-null embeddings — caught driver-side
    val empty = Seq.empty[(Long, Array[Double])].toDF("row", "vec")
    val e2 = intercept[IllegalArgumentException] {
      Foundation.chronosEmbed(panel, dim = dim, cfg = cfg,
        weights = Some(empty))
    }
    assert(e2.getMessage.contains("empty weight table"))
  }

  test("visionEmbeddings: loadWeights roundtrip of the surrogate == default") {
    import spark.implicits._
    val (conv, lin) = VisionEmbed.weights(VisionEmbed.DefaultFilters,
      VisionEmbed.DefaultEmbDim, seed = 42L)
    val dir = java.nio.file.Files.createTempDirectory("wh").toString
    val rows =
      conv.zipWithIndex.map { case (f, fi) =>
        ("conv", fi.toLong, f.flatten) } ++
      lin.zipWithIndex.map { case (l, j) => ("lin", j.toLong, l) }
    rows.toSeq.toDF("name", "row", "vec")
      .write.mode("overwrite").parquet(s"$dir/vw")
    val loaded = VisionEmbed.loadWeights(spark, s"$dir/vw")
    val default = VisionEmbed.visionEmbeddings(panel)
    val hooked = VisionEmbed.visionEmbeddings(panel,
      weightsOverride = Some(loaded))
    assert(canon(hooked) === canon(default))
  }

  test("visionEmbeddings: random tensor file gives real (different) output") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val nf = VisionEmbed.DefaultFilters; val ed = VisionEmbed.DefaultEmbDim
    val dir = java.nio.file.Files.createTempDirectory("wh").toString
    val rows =
      (0 until nf).map(f => ("conv", f.toLong,
        Array.fill(9)(rng.nextGaussian() / 3.0))) ++
      (0 until ed).map(j => ("lin", j.toLong,
        Array.fill(nf * 4)(rng.nextGaussian() / 4.0)))
    rows.toDF("name", "row", "vec").write.mode("overwrite").parquet(s"$dir/vw")
    val loaded = VisionEmbed.loadWeights(spark, s"$dir/vw")
    val out = VisionEmbed.visionEmbeddings(panel,
      weightsOverride = Some(loaded))
    assert(out.count() === 6)
    assert(canon(out) !== canon(VisionEmbed.visionEmbeddings(panel)))
    // truncated tensor fails loudly
    rows.take(nf - 1 + ed).toDF("name", "row", "vec")
      .write.mode("overwrite").parquet(s"$dir/vw_bad")
    intercept[IllegalArgumentException] {
      VisionEmbed.loadWeights(spark, s"$dir/vw_bad")
    }
  }
}
