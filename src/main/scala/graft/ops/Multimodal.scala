package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payloads + typed metadata, with
  * decode/feature steps as per-row kernels.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC FAKE (clearly marked below): it derives a fixed-length
  * feature vector from the raw bytes. Everything around it — schema,
  * batching, partition-parallel execution, null-safety, the
  * decode→feature→filter pipeline shape — is real Spark and tested; a
  * production deployment swaps `fakeDecode` for a real codec inside the
  * same mapPartitions-style UDF boundary.
  */
object Multimodal {

  /** STUB: deterministic stand-in for a real image/audio decoder. Returns
    * `dim` pseudo-features from a rolling byte hash — stable across runs
    * and engines, so tests and oracles hold. */
  private[ops] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    if (bytes == null || bytes.isEmpty) return out
    var h = 1469598103934665603L // FNV offset
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i)
      h *= 1099511628211L
      out(i % dim) += (h % 1000L).toDouble / 1000.0
      i += 1
    }
    out
  }

  /** Attach typed metadata columns for a binary payload column. SHA-256
    * (not SHA-1) as the content fingerprint — stronger, and reproducible
    * by the oracle engine. */
  def withMediaMetadata(df: DataFrame, binCol: String): DataFrame =
    df.withColumn(s"${binCol}_size_bytes", length(col(binCol)).cast("long"))
      .withColumn(s"${binCol}_sha256", sha2(col(binCol), 256))
      .withColumn(s"${binCol}_is_empty",
        col(binCol).isNull || length(col(binCol)) === 0)

  /** Decode + feature-extract: binary → fixed-dim double vector. The UDF
    * runs partition-parallel over the scan; swap [[fakeDecode]] for a real
    * codec to productionize. */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int = 16,
      outCol: String = "media_features"): DataFrame = {
    val u = udf((b: Array[Byte]) => fakeDecode(b, dim))
    df.withColumn(outCol, u(col(binCol)))
  }

  /** Frame-sampling plan for a "video" payload: emits (frame_index,
    * byte_offset) rows for every `stride`-th frame — the shuffle-free
    * explode a real frame extractor would follow. */
  def sampleFrames(df: DataFrame, binCol: String, frameSize: Int,
      stride: Int): DataFrame = {
    require(frameSize > 0 && stride > 0)
    df.withColumn("__nframes",
        (length(col(binCol)) / frameSize).cast("int"))
      .withColumn("frame_index",
        explode(sequence(lit(0), greatest(col("__nframes") - 1, lit(0)), lit(stride))))
      .withColumn("byte_offset", col("frame_index").cast("long") * frameSize)
      .drop("__nframes")
  }
}
