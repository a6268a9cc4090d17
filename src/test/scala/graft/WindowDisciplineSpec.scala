package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine-wide window discipline (r9): no DataFrame window in
  * `src/main` may use an empty partition spec. Genuinely unbounded
  * frames got partitioned rewrites (the bucketed time index in
  * `Validation.timeIndex`); bounded tiny frames must declare intent via
  * `Panel.tinyFramePartition`. A bare `Window.orderBy(...)` or
  * `Window.partitionBy()` funnels the frame through one task at scale
  * and re-introduces the "No Partition Defined" WindowExec warning
  * class this spec exists to keep extinct. */
class WindowDisciplineSpec extends AnyFunSuite {

  private def mainSources: Seq[(String, String)] = {
    val root = java.nio.file.Paths.get("src/main/scala")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map(p => (p.toString, java.nio.file.Files.readString(p)))
      .toSeq
  }

  private def stripCommentsAndStrings(src: String): String = src
    .replaceAll("(?s)/\\*.*?\\*/", " ")
    .replaceAll("//.*", " ")
    .replaceAll("(?s)\"\"\".*?\"\"\"", "\"\"") // oracle SQL blocks
    .replaceAll("\"(\\\\.|[^\"\\\\])*\"", "\"\"")

  test("no empty-partition Window specs anywhere in the engine") {
    val offenders = mainSources.flatMap { case (path, raw) =>
      val src = stripCommentsAndStrings(raw)
      val bad =
        "Window\\s*\\.\\s*orderBy\\s*\\(".r.findAllIn(src).toSeq ++
        "Window\\s*\\.\\s*partitionBy\\s*\\(\\s*\\)".r.findAllIn(src).toSeq ++
        "Win\\s*\\.\\s*orderBy\\s*\\(".r.findAllIn(src).toSeq ++
        "Win\\s*\\.\\s*partitionBy\\s*\\(\\s*\\)".r.findAllIn(src).toSeq
      if (bad.nonEmpty) Some(s"$path: ${bad.size} empty-partition window(s)")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("tinyFramePartition is non-foldable (survives constant folding)") {
    // a foldable partition key is constant-folded OUT of the partition
    // spec, silently reverting to the unpartitioned shape — pin via the
    // optimizer itself: after optimization the projected expression must
    // NOT have collapsed to a literal
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    val df = spark.range(3).toDF("x")
      .select(graft.core.Panel.tinyFramePartition(col("x")).as("p"))
    val opt = df.queryExecution.optimizedPlan
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project]
    val e = opt.projectList.head
    assert(!e.foldable,
      s"tinyFramePartition folded to $e — the optimizer would strip it " +
        "from a window partition spec")
  }
}
