package graft.ops

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Filesystem model/experiment registry (reference
  * polars_ts/registry/registry.py:1-225): runs persisted as
  * `<root>/<experiment>/<run>/` with params + metrics JSON — hand-rolled
  * layout, no external deps. Artifacts (e.g. coefficient arrays) are the
  * caller's parquet/JSON writes into the run directory.
  */
class Registry(root: String) {

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  private def toJson(m: Map[String, Any]): String =
    m.toSeq.sortBy(_._1).map {
      case (k, v: String) => s"${q(k)}: ${q(v)}"
      case (k, v: Double) => s"${q(k)}: $v"
      case (k, v: Int) => s"${q(k)}: $v"
      case (k, v: Long) => s"${q(k)}: $v"
      case (k, v: Boolean) => s"${q(k)}: $v"
      case (k, v) => s"${q(k)}: ${q(String.valueOf(v))}"
    }.mkString("{", ", ", "}")

  def logRun(experiment: String, run: String, params: Map[String, Any],
      metrics: Map[String, Double]): String = {
    val dir = Paths.get(root, experiment, run)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("params.json"), toJson(params))
    Files.writeString(dir.resolve("metrics.json"),
      toJson(metrics.map { case (k, v) => k -> (v: Any) }))
    dir.toString
  }

  def listRuns(experiment: String): Seq[String] = {
    val dir = Paths.get(root, experiment)
    if (!Files.exists(dir)) Seq.empty
    else Files.list(dir).iterator().asScala.filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq.sorted
  }

  def readMetrics(experiment: String, run: String): Map[String, Double] = {
    val p = Paths.get(root, experiment, run, "metrics.json")
    if (!Files.exists(p)) Map.empty
    else {
      // quote-aware flat-object parse: metric names may contain ',' ':'
      // or escaped quotes — a naive split corrupts them
      val s = Files.readString(p)
      val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*(-?[0-9.eE+]+)""".r
      pair.findAllMatchIn(s).map { m =>
        m.group(1).replace("\\\"", "\"").replace("\\\\", "\\") -> m.group(2).toDouble
      }.toMap
    }
  }

  /** Best run by ascending metric (e.g. lowest mae). */
  def bestRun(experiment: String, metric: String): Option[(String, Double)] =
    listRuns(experiment)
      .flatMap(r => readMetrics(experiment, r).get(metric).map(r -> _))
      .sortBy(_._2).headOption
}
