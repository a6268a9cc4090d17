package graft.plans

import org.apache.spark.sql.{GraftRegistryBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's native Catalyst expressions.
  *
  * The expression tier ([[Fnv64]], [[CosineSim]], [[StableUniformExpr]],
  * [[MinhashSigExpr]]) is what keeps the hot key/similarity/sampling
  * paths inside whole-stage codegen; this registers the same expressions
  * as SQL functions so a `spark.sql(...)` user gets them too — the
  * idiomatic Spark extension route (`spark.sql.extensions=
  * graft.plans.GraftExtensions` at session build, or
  * [[GraftFunctions.register]] on a live session; both share one
  * description list, so the two paths cannot drift).
  *
  * Registered functions:
  *   - `graft_fnv64(text)` → bigint — deterministic FNV-1a 64 fingerprint
  *     (null → offset basis, never null out; the engine's dedup/shard/
  *     sampling key contract).
  *   - `graft_stable_uniform(text)` → double — fingerprint-seeded U[0,1)
  *     (stable sampling draw; null propagates).
  *   - `graft_cosine_sim(a, b)` → double — cosine over two array<double>
  *     columns, in-place ArrayData walk.
  *   - `graft_minhash_sig(text, n, k, seed)` → array<bigint> — k-minhash
  *     signature over n-char shingles; n/k/seed must be foldable ints.
  *   - `graft_simhash(text)` → bigint — 64-bit SimHash over normalized
  *     whitespace tokens (null → empty-text sign pattern, never null).
  *   - `graft_kn_bigrams(text, buckets)` → array<bigint> — adjacent
  *     word-bucket bigram pairs packed as bv·buckets+bw (buckets a
  *     foldable int).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach(ext.injectFunction)
    // whole-operator tier: the AsofJoin logical node's planner strategy
    // and its left-filter pushdown rule (live-session path:
    // GraftPlanning.ensure)
    ext.injectPlannerStrategy(_ => GraftStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughAsofJoin)
    ext.injectOptimizerRule(_ => PruneAsofJoinColumns)
  }
}

object GraftFunctions {

  /** Registers every graft SQL function into a LIVE session's registry
    * (the path for sessions already built without the extensions conf).
    * Idempotent: re-registration overwrites with identical builders. */
  def register(spark: SparkSession): Unit = {
    val reg = GraftRegistryBridge.functionRegistry(spark)
    descriptions.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
  }

  private def requireArity(name: String, args: Seq[Expression], n: Int): Unit =
    require(args.size == n,
      s"$name expects $n argument(s), got ${args.size}")

  /** Foldable-int extraction for builder parameters (SQL literals parse
    * as int; a foldable expression like `2+3` is honored too). */
  private def intArg(name: String, pos: Int, e: Expression): Int = {
    require(e.foldable,
      s"$name argument $pos must be a foldable integer, got ${e.sql}")
    e.eval() match {
      case i: Int => i
      case l: Long =>
        require(l.isValidInt, s"$name argument $pos out of int range: $l")
        l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$name argument $pos must be an integer literal, got $other")
    }
  }

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getCanonicalName, null, name, usage, "")

  /** The single source of truth both registration paths share. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] =
    Seq(
      (FunctionIdentifier("graft_fnv64"),
        info(classOf[Fnv64], "graft_fnv64",
          "graft_fnv64(text) - deterministic FNV-1a 64-bit fingerprint " +
            "(null hashes to the offset basis; never returns null)."),
        (args: Seq[Expression]) => {
          requireArity("graft_fnv64", args, 1)
          Fnv64(args.head)
        }),
      (FunctionIdentifier("graft_stable_uniform"),
        info(classOf[StableUniformExpr], "graft_stable_uniform",
          "graft_stable_uniform(text) - fingerprint-seeded uniform " +
            "draw in [0,1) for stable sampling."),
        (args: Seq[Expression]) => {
          requireArity("graft_stable_uniform", args, 1)
          StableUniformExpr(args.head)
        }),
      (FunctionIdentifier("graft_cosine_sim"),
        info(classOf[CosineSim], "graft_cosine_sim",
          "graft_cosine_sim(a, b) - cosine similarity over two " +
            "array<double> columns."),
        (args: Seq[Expression]) => {
          requireArity("graft_cosine_sim", args, 2)
          CosineSim(args.head, args(1))
        }),
      (FunctionIdentifier("graft_minhash_sig"),
        info(classOf[MinhashSigExpr], "graft_minhash_sig",
          "graft_minhash_sig(text, n, k, seed) - k-minhash signature " +
            "over n-char shingles (n, k, seed: foldable ints)."),
        (args: Seq[Expression]) => {
          requireArity("graft_minhash_sig", args, 4)
          MinhashSigExpr(args.head,
            intArg("graft_minhash_sig", 2, args(1)),
            intArg("graft_minhash_sig", 3, args(2)),
            intArg("graft_minhash_sig", 4, args(3)))
        }),
      (FunctionIdentifier("graft_simhash"),
        info(classOf[SimhashExpr], "graft_simhash",
          "graft_simhash(text) - 64-bit SimHash (sign-sum of per-token " +
            "FNV bits over normalized whitespace tokens; never null)."),
        (args: Seq[Expression]) => {
          requireArity("graft_simhash", args, 1)
          SimhashExpr(args.head)
        }),
      (FunctionIdentifier("graft_char_class_counts"),
        info(classOf[CharClassCounts], "graft_char_class_counts",
          "graft_char_class_counts(text) - one-pass array<bigint> of " +
            "[punct, digit, upper, space] ASCII-class counts."),
        (args: Seq[Expression]) => {
          requireArity("graft_char_class_counts", args, 1)
          CharClassCounts(args.head)
        }),
      (FunctionIdentifier("graft_kn_bigrams"),
        info(classOf[KnBigramsExpr], "graft_kn_bigrams",
          "graft_kn_bigrams(text, buckets) - adjacent word-bucket bigram " +
            "pairs, each packed as bv*buckets+bw (buckets: foldable int)."),
        (args: Seq[Expression]) => {
          requireArity("graft_kn_bigrams", args, 2)
          KnBigramsExpr(args.head, intArg("graft_kn_bigrams", 2, args(1)))
        }))
}
