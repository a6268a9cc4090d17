package graft.ops

import graft.plans.{Fnv64, Mix64}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-state sketch tier for corpus-scale OLAP: Count-Min frequency
  * estimation (Cormode & Muthukrishnan 2005, J. Algorithms 55) and
  * HyperLogLog distinct counting (Flajolet et al. 2007, AofA).
  *
  * Why these two, and why here: at 100 TB an exact token-frequency table
  * or per-group `count(DISTINCT)` shuffles data-sized state; both
  * sketches shuffle FIXED-size state (depth×width counters /
  * 2^b registers per group) with map-side combine, and both merge by an
  * ASSOCIATIVE, COMMUTATIVE operation (counter addition / register max)
  * — so the result is independent of partitioning and execution order,
  * which is what makes them exactly DuckDB-replayable: no pins, no
  * tolerance, the same arithmetic on both engines.
  *
  * Engine contracts kept deliberately integer-only: the CMS row hashes
  * are salted [[Fnv64]] (native codegen) mod width; the HLL register
  * rank avoids floating log2 entirely — `rho = maxRank − bitlen(low
  * bits)` with `bitlen` computed as `length(bin(w))`, an exact
  * string-of-bits length both engines implement identically. The only
  * floats are the final estimates, rounded on output. */
object Sketches {

  /** Shared sketch tokenizer: lowercase alphanumeric words. `keep`
    * carries extra columns (e.g. a group key) so every sketch path —
    * CMS and HLL alike — splits on ONE regex definition. */
  def tokens(df: DataFrame, textCol: String,
      keep: Seq[Column] = Nil): DataFrame =
    df.select(keep :+
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("token"): _*)
      .filter(col("token") =!= "")

  private def cmsSlot(row: Int, tok: Column, width: Int): Column =
    pmod(Fnv64(concat(lit(s"cms$row:"), tok)), lit(width))

  /** Count-Min sketch as a (row, slot, cnt) frame: depth salted hash
    * rows × width counters. Additive merge: sketches of corpus shards
    * (or of a stream's batches) sum slot-wise. State ≤ depth·width rows
    * regardless of corpus size; the aggregation map-side-combines to
    * that bound before the only shuffle. */
  def cmsSketch(df: DataFrame, depth: Int = 4, width: Int = 512,
      textCol: String = "text"): DataFrame = {
    require(depth >= 1 && width >= 2)
    val t = tokens(df, textCol)
    val rows = array((0 until depth).map(i =>
      struct(lit(i).as("row"), cmsSlot(i, col("token"), width).as("slot"))): _*)
    t.select(explode(rows).as("rs"))
      .groupBy(col("rs.row").as("row"), col("rs.slot").as("slot"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge CMS sketches (shards, ingest batches, or persisted state +
    * a new batch): counters add slot-wise. Associative and commutative,
    * so `cmsMerge(cmsSketch(shard1), cmsSketch(shard2)) ==
    * cmsSketch(full)` exactly — the incremental-ingest pattern: persist
    * the ≤ depth·width-row sketch, merge each arriving batch's sketch,
    * never re-scan old text. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row", "slot").agg(sum("cnt").as("cnt"))

  /** Merge HLL register tables: register-wise max. Same incremental
    * contract as [[cmsMerge]] — union-of-streams distinct estimates
    * from persisted ≤ groups·2^b-row state. */
  def hllMerge(a: DataFrame, b: DataFrame,
      groupCol: String = "source"): DataFrame =
    a.unionByName(b).groupBy(groupCol, "register")
      .agg(max("max_rank").as("max_rank"))

  /** Point-query every distinct token against the sketch and join the
    * exact count for audit: est = min over rows of the hashed counter —
    * the CMS guarantee is est ≥ exact (never undercounts) with
    * overshoot ≤ εN w.h.p. The probe join is |vocab|·depth rows against
    * the ≤ depth·width sketch — broadcast-sized by construction.
    *
    * Note (r13, advisor): constructing this DataFrame triggers a Spark
    * job eagerly — the vocab count table is `localCheckpoint()`ed so one
    * tokenize pass serves the sketch, the probes and the totals — and
    * checkpointed blocks are not recomputable on executor loss (rebuild
    * the frame if that happens). Same contract as [[TextOps
    * .knPerplexity]]'s count table. */
  def cmsTokenEstimates(df: DataFrame, depth: Int = 4, width: Int = 512,
      textCol: String = "text"): DataFrame = {
    // same domain contract cmsSketch enforced before the r12 one-pass
    // rewrite bypassed it: depth 0 must throw, not yield an empty frame,
    // and width 1 must throw, not degenerate every estimate to N
    require(depth >= 1 && width >= 2,
      s"cmsTokenEstimates: depth >= 1 and width >= 2 required, " +
        s"got depth=$depth width=$width")
    // r12: the sketch is DERIVED from the exact count table instead of a
    // second corpus tokenize (cmsSketch(df) re-scanned + re-hashed every
    // token INSTANCE; counter addition is associative, so grouping the
    // per-token exact counts by (row, slot) yields the identical sketch
    // while hashing each DISTINCT token once). One tokenize pass total:
    // the vocab-sized aggregate is localCheckpoint()ed (the knPerplexity
    // count-table pattern — ReuseExchange does NOT dedupe the broadcast
    // build side's subtree under AQE, measured 3× CPU without it) so the
    // sketch derivation, the probe side, and heavy-hitters' total all
    // replay from the materialized ≤|vocab|-row table. Values are
    // bit-identical, so every CMS oracle row is unchanged.
    val exact = tokens(df, textCol).groupBy("token")
      .agg(count(lit(1)).as("exact"))
      .localCheckpoint()
    val probes = exact.select(col("token"), col("exact"),
      posexplode(array((0 until depth).map(i =>
        cmsSlot(i, col("token"), width)): _*)).as(Seq("row", "slot")))
    val sk = probes.groupBy("row", "slot").agg(sum("exact").as("cnt"))
    probes.join(broadcast(sk), Seq("row", "slot"))
      .groupBy("token", "exact")
      .agg(min("cnt").as("est"))
      .select(col("token"), col("est"), col("exact"))
  }

  /** Heavy hitters via the sketch: tokens whose ESTIMATED frequency is
    * at least `minFrac` of the total token count. One-sided error by
    * the CMS bound: no true heavy hitter is ever missed. */
  def cmsHeavyHitters(df: DataFrame, minFrac: Double, depth: Int = 4,
      width: Int = 512, textCol: String = "text"): DataFrame = {
    require(minFrac > 0 && minFrac <= 1)
    val est = cmsTokenEstimates(df, depth, width, textCol)
    // N = Σ exact over the audit table the estimate query already
    // aggregates — same exchange subtree, so Spark's ReuseExchange
    // serves both from one tokenize pass instead of a third corpus scan
    val total = est.agg(sum("exact").as("__n"))
    est.crossJoin(broadcast(total))
      .filter(col("est") >= col("__n") * minFrac)
      .drop("__n")
  }

  /** Register index / rank for one 64-bit hash under 2^b registers:
    * register = top b bits (unsigned); rank ρ = leading zeros of the
    * remaining 64−b bits + 1 (= 64−b+1 when they are all zero). The
    * bitlen identity keeps it integer-exact: ρ = (64−b) − bitlen(w) + 1. */
  private def hllRegRank(h: Column, b: Int): (Column, Column) = {
    val tail = 64 - b
    val reg = shiftrightunsigned(h, tail)
    val w = h.bitwiseAND(lit((1L << tail) - 1L))
    val rho = when(w === 0L, lit(tail + 1))
      .otherwise(lit(tail + 1) - length(bin(w)))
    (reg, rho)
  }

  /** Per-group HLL register table (group, register, max_rank): the
    * sketch state — 2^b longs per group at most, max-merge. */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: Column,
      b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16)
    // Mix64 finalizer: raw FNV-1a high bits are weakly avalanched on
    // short keys — registers cut from the top byte would collapse
    val (reg, rho) = hllRegRank(Mix64(Fnv64(valueCol.cast("string"))), b)
    df.select(col(groupCol), reg.as("register"), rho.as("rho"))
      .groupBy(groupCol, "register")
      .agg(max("rho").as("max_rank"))
  }

  /** HLL estimate per group from a register table: α_m·m²/Z raw
    * estimate with the standard small-range linear-counting correction
    * (Flajolet et al. 2007 Fig. 3). `zero_registers` = V (registers
    * never hit). */
  def hllEstimate(registers: DataFrame, groupCol: String, b: Int = 8): DataFrame = {
    val m = 1 << b
    val alpha =
      if (m >= 128) 0.7213 / (1.0 + 1.079 / m)
      else if (m == 64) 0.709
      else if (m == 32) 0.697
      else 0.673
    registers.groupBy(groupCol)
      .agg(count(lit(1)).as("__present"),
        sum(pow(lit(0.5), col("max_rank"))).as("__zsum"))
      .withColumn("zero_registers", lit(m) - col("__present"))
      .withColumn("__z", col("__zsum") + col("zero_registers"))
      .withColumn("__raw", lit(alpha * m.toDouble * m) / col("__z"))
      .withColumn("est",
        when(col("__raw") <= 2.5 * m && col("zero_registers") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zero_registers")))
          .otherwise(col("__raw")))
      .select(col(groupCol), col("zero_registers"),
        round(col("est") + 1e-9, 6).as("est"))
  }

  /** Sketch-only per-group distinct estimate — the production (and
    * scale-proof) path: one token scan into 2^b registers per group,
    * NO exact count(DISTINCT) audit, so the only shuffled state is the
    * fixed register table. */
  def hllDistinctSketch(df: DataFrame, groupCol: String = "source",
      textCol: String = "text", b: Int = 8): DataFrame =
    hllEstimate(
      hllRegisters(tokens(df, textCol, Seq(col(groupCol))), groupCol,
        col("token"), b),
      groupCol, b)

  /** Per-source distinct-token estimate vs exact, one query: the HLL
    * audit shape the gate hash-checks (the exact side is the audit —
    * use [[hllDistinctSketch]] where only the sketch should run). */
  def hllDistinctTokens(df: DataFrame, groupCol: String = "source",
      textCol: String = "text", b: Int = 8): DataFrame = {
    val toks = tokens(df, textCol, Seq(col(groupCol)))
    val regs = hllRegisters(toks, groupCol, col("token"), b)
    val est = hllEstimate(regs, groupCol, b)
    val exact = toks.groupBy(groupCol)
      .agg(countDistinct("token").as("exact"))
    est.join(exact, Seq(groupCol))
      .withColumn("rel_err",
        round(abs(col("est") - col("exact")) / col("exact") + 1e-9, 6))
      .select(col(groupCol), col("zero_registers"), col("est"),
        col("exact"), col("rel_err"))
  }
}
