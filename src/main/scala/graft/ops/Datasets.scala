package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dataset loading with SHA-256 integrity verification (reference
  * polars_ts/datasets.py:10-90). The reference downloads from fixed URLs;
  * here the registry maps names to files under a caller-provided root —
  * zero-egress environments supply pre-fetched files, cluster deployments
  * point at shared storage. Verification is the same content-hash gate. */
object Datasets {

  /** name → (relative path, expected sha256 hex, format). Entries mirror
    * the reference registry's names; hashes belong to the local copies. */
  case class Entry(path: String, sha256: Option[String], format: String = "parquet")

  val registry: Map[String, Entry] = Map(
    "events" -> Entry("events.parquet", None),
    "documents" -> Entry("documents.parquet", None),
    "embeddings" -> Entry("embeddings.parquet", None))

  def sha256Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Load a registered dataset from `root`, verifying content hash when
    * the registry pins one. Throws on mismatch (corrupt/stale copy). */
  def loadDataset(spark: SparkSession, root: String, name: String,
      extra: Map[String, Entry] = Map.empty): DataFrame = {
    val reg = registry ++ extra
    val entry = reg.getOrElse(name, throw new NoSuchElementException(
      s"Unknown dataset '$name'. Available: ${reg.keys.toSeq.sorted.mkString(", ")}"))
    val full = s"$root/${entry.path}"
    entry.sha256.foreach { expected =>
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(full))
      val actual = sha256Hex(bytes)
      require(actual == expected,
        s"Integrity check failed for '$name': expected $expected, got $actual")
    }
    entry.format match {
      case "parquet" => spark.read.parquet(full)
      case "csv" => spark.read.option("header", "true").option("inferSchema", "true").csv(full)
      case other => throw new IllegalArgumentException(s"Unknown format '$other'")
    }
  }
}
