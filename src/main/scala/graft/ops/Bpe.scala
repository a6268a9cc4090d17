package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Corpus-trained byte-pair-encoding tokenizer (Sennrich, Haddow & Birch
  * 2016, "Neural Machine Translation of Rare Words with Subword Units",
  * ACL — the merge-learning loop of §3.2) so pack/chunk token budgets can
  * use learned subword counts instead of the whitespace/regex proxies in
  * [[TextOps.tokenCount]].
  *
  * Scale shape: the merge table is learned ONCE on a bounded,
  * deterministic driver sample (the `ivfCentroids`/`pqFit` sampling
  * discipline — 3× hash-ordered oversample, then limit), broadcast to
  * executors, and applied as a pure per-row function — the corpus itself
  * streams through one parquet scan at full width, so the op costs the
  * same as any other column expression at 100 TB.
  *
  * Determinism contract (what makes the oracle possible): the fit is a
  * pure function of the sampled texts — pair counts break ties
  * lexicographically, and both learning and encoding apply each ranked
  * merge with the SAME greedy left-to-right fold. Because a merge with
  * rank k can only produce symbols consumed by merges of rank > k, a
  * single in-rank-order pass reproduces the classic lowest-rank-present
  * encode loop. The DuckDB oracle replays that fold verbatim per DISTINCT
  * word (`list_reduce` over one recursion step per rank), then joins
  * counts back to the doc × word exploded view.
  */
object Bpe {

  /** Ranked merge table, lowest rank first. */
  type Merges = Seq[(String, String)]

  /** Apply one merge greedily left-to-right (non-overlapping): append each
    * symbol, collapsing whenever the running tail is exactly (l, r). The
    * fold formulation is what the SQL oracle's `list_reduce` replays. */
  private[ops] def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      val s = syms(i)
      if (out.nonEmpty && out.last == l && s == r) out(out.length - 1) = l + r
      else out += s
      i += 1
    }
    out.toArray
  }

  /** Encode one word: chars → one greedy pass per merge, in rank order. */
  def encodeWord(word: String, merges: Merges): Array[String] = {
    var syms = word.map(_.toString).toArray
    merges.foreach { case (l, r) =>
      if (syms.length > 1) syms = applyMerge(syms, l, r)
    }
    syms
  }

  private def splitWords(text: String): Array[String] =
    if (text == null) Array.empty
    else TextOps.WsRe.split(text.trim).filter(_.nonEmpty)

  /** Learn a merge table on a bounded stable sample of the corpus.
    * Deterministic: hash-ordered oversample → limit (unbiased on sorted /
    * sharded corpora, unlike a bare limit), lexicographic tie-break on
    * equal pair counts, and learning stops early once no adjacent pair
    * occurs at least `minCount` times. */
  def bpeFit(df: DataFrame, numMerges: Int = 40, sampleSize: Int = 300,
      minCount: Long = 2L, seed: Long = 42L, textCol: String = "text",
      idCol: String = "doc_id"): Merges = {
    require(numMerges >= 0 && sampleSize > 0)
    val total = df.count()
    val frac = if (total == 0) 1.0 else math.min(1.0, 3.0 * sampleSize / total)
    val texts = df
      .select(col(idCol).as("__sid"), col(textCol).as("__st"))
      .sample(withReplacement = false, frac, seed)
      .orderBy(xxhash64(col("__sid").cast("string"), lit(seed)))
      .limit(sampleSize)
      .collect().map(r => Option(r.getString(1)).getOrElse(""))

    val wordFreq = mutable.HashMap.empty[String, Long]
    texts.foreach(splitWords(_).foreach(w =>
      wordFreq.update(w, wordFreq.getOrElse(w, 0L) + 1L)))
    // sorted for a deterministic iteration order (HashMap order is not)
    var words: Array[(Array[String], Long)] = wordFreq.toArray.sortBy(_._1)
      .map { case (w, c) => (w.map(_.toString).toArray, c) }

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < numMerges) {
      val pairCount = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCount.update(p, pairCount.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCount.isEmpty) continue = false
      else {
        val (best, cnt) = pairCount.minBy { case ((l, r), c) => (-c, l, r) }
        if (cnt < minCount) continue = false
        else {
          merges += best
          words = words.map { case (syms, c) =>
            (applyMerge(syms, best._1, best._2), c)
          }
        }
      }
    }
    merges.toSeq
  }

  /** Subword token count for one document under a merge table. */
  def countTokens(text: String, merges: Merges): Long =
    splitWords(text).map(w => encodeWord(w, merges).length.toLong).sum

  /** Per-doc token counts: `[doc_id, n_words, n_bpe_tokens]`. The merge
    * table rides a broadcast variable; the corpus streams once. */
  def tokenCounts(df: DataFrame, merges: Merges, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(merges.toArray)
    val nWords = udf((t: String) => splitWords(t).length.toLong)
    val nBpe = udf((t: String) => countTokens(t, bc.value.toSeq))
    df.select(col(idCol), nWords(col(textCol)).as("n_words"),
      nBpe(col(textCol)).as("n_bpe_tokens"))
  }

  /** Column-level count, for wiring learned budgets into
    * [[Packing.packPlan]] / [[Packing.chunkPlan]]. */
  def tokenCountUdf(merges: Merges): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val m = merges.toArray
    udf((t: String) => countTokens(t, m.toSeq))
  }

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB oracle: replay the ranked-merge fold per DISTINCT word (one
    * recursion step per rank), join counts back to the doc × word view.
    * Docs with no words (empty/whitespace text) keep a 0-count row. */
  def tokensSql(merges: Merges): String = {
    // rank rows; a 0-merge table still needs one row for the VALUES
    // clause, so guard with a dummy rank the recursion never reaches
    val rows =
      if (merges.isEmpty) "(-1, '', '', '')"
      else merges.zipWithIndex.map { case ((l, r), i) =>
        s"($i, ${q(l)}, ${q(r)}, ${q(l + r)})"
      }.mkString(",\n    ")
    val n = merges.length
    s"""WITH RECURSIVE merges(rk, l, r, m) AS (VALUES
       |    $rows),
       |docw AS (SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
       |    FROM documents) WHERE w <> ''),
       |words(w) AS (SELECT DISTINCT w FROM docw),
       |enc(w, syms, rk) AS (
       |  SELECT w, list_transform(range(1, length(w)+1),
       |    i -> substr(w, CAST(i AS INT), 1)), 0 FROM words
       |  UNION ALL
       |  SELECT e.w,
       |    list_reduce(
       |      list_prepend(CAST([] AS VARCHAR[]), list_transform(e.syms, s -> [s])),
       |      (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = mg.l AND x[1] = mg.r
       |                       THEN list_append(acc[1:len(acc)-1], mg.m)
       |                       ELSE list_append(acc, x[1]) END),
       |    e.rk + 1
       |  FROM enc e JOIN merges mg ON mg.rk = e.rk),
       |toks AS (SELECT w, len(syms) AS nt FROM enc WHERE rk = $n),
       |per_doc AS (SELECT d.doc_id, count(*) AS n_words, sum(t.nt) AS n_bpe
       |  FROM docw d JOIN toks t USING (w) GROUP BY d.doc_id)
       |SELECT doc.doc_id,
       |  COALESCE(p.n_words, 0)::BIGINT AS n_words,
       |  COALESCE(p.n_bpe, 0)::BIGINT AS n_bpe_tokens
       |FROM documents doc LEFT JOIN per_doc p USING (doc_id)""".stripMargin
  }
}
