package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing plan for LM training prep — the concat-and-split
  * layout (documents concatenated, the token stream cut into fixed
  * `seqLen` training sequences): for every document, which training
  * sequences its tokens land in.
  *
  * Scale design: a single global token order would serialize the plan
  * through one cumulative-sum partition, so the corpus is sharded by a
  * stable document hash (`nShards` ∝ corpus size — exactly how real
  * pipelines pack per output shard/file) and each shard packs
  * independently: one shuffle on the shard key, a per-shard running sum,
  * all arithmetic replayable. Zero text moves — the plan carries only
  * (id, shard, counts). Membership is deterministic under any input
  * partitioning: shard = FNV(id) mod nShards, order within shard = id.
  */
object Packing {

  /** RAG-style chunk plan: fixed `chunkTokens` windows advancing by
    * `stride` (< chunkTokens → overlapping context) over each document's
    * token count — (doc_id, chunk_id, start_tok, end_tok), the slicing
    * manifest a retrieval indexer consumes. Pure per-row arithmetic plus
    * a bounded sequence explode; NO shuffle — at 100 TB this is a single
    * narrow scan. A document shorter than one window still emits chunk 0
    * so every doc appears in the manifest. */
  def chunkPlan(df: DataFrame, chunkTokens: Int = 64, stride: Int = 48,
      textCol: String = "text", idCol: String = "doc_id",
      tokens: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(chunkTokens > 0 && stride > 0)
    // stride > chunkTokens would leave token gaps AND emit a final chunk
    // whose start_tok lies past n_tokens (start > end, negative length) —
    // an invalid manifest row; overlap chunking means stride <= chunk
    require(stride <= chunkTokens,
      s"chunkPlan: stride $stride must be <= chunkTokens $chunkTokens")
    val n = tokens.getOrElse(TextOps.tokenCount(col(textCol))).cast("long")
    df.select(col(idCol), n.as("n_tokens"))
      .withColumn("chunk_id", explode(sequence(lit(0L),
        greatest(lit(0L),
          ceil((col("n_tokens") - chunkTokens).cast("double") / stride)
            .cast("long")))))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("end_tok",
        least(col("start_tok") + chunkTokens, col("n_tokens")))
  }

  /** Materialize the pack: the step after [[packPlan]] that actually
    * emits fixed-length training sequences. Each document's ordered
    * tokens take global shard offsets `start_tok + i`; token t lands in
    * sequence `offset / seqLen` at position `offset % seqLen`; token
    * ids are FNV(token) mod `vocab` (swap in BPE ids by passing the
    * encoded array as `tokensCol`). Output one row per (shard,
    * seq_index): `n_tokens`, the position-ordered ids as BOTH
    * `token_id_arr` (`array<int>` — the tensor shape a trainer's data
    * loader reads straight into a batch) and `token_ids` (the same ids
    * as a CSV string, kept for the cross-engine hash oracle); the final
    * sequence of a shard is emitted unpadded.
    *
    * Scale: NEVER one row per token. Token ids are computed inside the
    * array (`transform`, codegen'd FNV) before anything moves, so both
    * shuffles carry int arrays: (1) the per-shard offset window moves one
    * array row per document; (2) each document is then split by pure
    * slice arithmetic at the sequence boundaries it crosses and one row
    * per (doc × touched sequence) — ≈ |docs| + tokens/seqLen rows, each
    * carrying its id SLICE — shuffles to (shard, seq). A 1000-token doc
    * crossing two sequences ships 2 array rows, not 1000 scalar rows
    * (~10²–10³× less shuffle rows than the naive posexplode plan).
    * Assembly is `flatten(sort_array(...))` on the in-sequence start
    * position, which is unique per contributing doc by construction. */
  def executePack(df: DataFrame, seqLen: Int, nShards: Int = 32,
      vocab: Int = 32768, textCol: String = "text",
      idCol: String = "doc_id",
      tokensCol: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(vocab > 0 && seqLen > 0 && nShards > 0)
    val toksArr = tokensCol.getOrElse(
      filter(split(trim(col(textCol)), "\\s+"), t => t =!= ""))
    // same ROWS-frame discipline as packPlan (see comment there)
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val L = seqLen.toLong
    df.select(col(idCol),
        // hash to ids BEFORE the shuffle: int arrays move, never text
        transform(toksArr,
          t => pmod(TextOps.fnvHash(t), lit(vocab.toLong)).cast("int"))
          .as("__ids"))
      .withColumn("shard",
        pmod(TextOps.fnvHash(col(idCol)), lit(nShards.toLong)))
      .withColumn("__n", size(col("__ids")).cast("long"))
      // zero-token docs occupy no positions and contribute 0 to every
      // offset — drop them before the window (sequence(start > stop)
      // would otherwise generate a DESCENDING seq range)
      .filter(col("__n") > 0)
      .withColumn("end_tok", sum("__n").over(w))
      .withColumn("start_tok", col("end_tok") - col("__n"))
      // every training sequence this doc's token span [start, end) touches
      .withColumn("seq_index",
        explode(sequence(floor(col("start_tok") / L),
          floor((col("end_tok") - 1) / L))))
      // token indices of this doc landing in seq q:
      //   i ∈ [max(0, q·L − start), min(n, (q+1)·L − start))
      .withColumn("__lo",
        greatest(lit(0L), col("seq_index") * L - col("start_tok")))
      .withColumn("__hi",
        least(col("__n"), (col("seq_index") + 1) * L - col("start_tok")))
      .withColumn("__seq_pos",
        col("start_tok") + col("__lo") - col("seq_index") * L)
      .withColumn("__slice", slice(col("__ids"),
        (col("__lo") + 1).cast("int"), (col("__hi") - col("__lo")).cast("int")))
      .groupBy(col("shard"), col("seq_index"))
      .agg(sum(size(col("__slice")).cast("long")).as("n_tokens"),
        flatten(transform(
          sort_array(collect_list(struct(col("__seq_pos"), col("__slice")))),
          s => s.getField("__slice"))).as("token_id_arr"))
      .withColumn("token_ids",
        array_join(transform(col("token_id_arr"), t => t.cast("string")), ","))
  }

  def packPlan(df: DataFrame, seqLen: Int, nShards: Int = 32,
      textCol: String = "text", idCol: String = "doc_id",
      tokens: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(seqLen > 0 && nShards > 0)
    // ROWS frame, not the default RANGE: two rows sharing an id would be
    // RANGE peers and BOTH get the combined end_tok — overlapping
    // start_toks that let executePack write two tokens into the same
    // (shard, seq, pos) slot. With ROWS a duplicated id is at worst
    // locally wrong, never a silent cross-doc corruption.
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol),
        pmod(TextOps.fnvHash(col(idCol)), lit(nShards.toLong)).as("shard"),
        tokens.getOrElse(TextOps.tokenCount(col(textCol)))
          .cast("long").as("n_tokens"))
      .withColumn("end_tok", sum("n_tokens").over(w))
      .withColumn("start_tok", col("end_tok") - col("n_tokens"))
      // first/last training sequence touched by this doc's tokens
      // (floor over true division — identical for the oracle's DOUBLE
      // division; a zero-token doc yields last_seq = first_seq - 1)
      .withColumn("first_seq", floor(col("start_tok") / seqLen))
      .withColumn("last_seq", floor((col("end_tok") - 1) / seqLen))
  }
}
