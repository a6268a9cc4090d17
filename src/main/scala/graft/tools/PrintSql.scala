package graft.tools

/** Dev utility: print one generated oracle SQL to stdout (pin-free
  * builders only) for direct DuckDB iteration. */
object PrintSql {
  def main(args: Array[String]): Unit = {
    args.headOption.getOrElse("ts_dbscan_e2e") match {
      case "ts_dbscan_e2e" =>
        println(graft.ForecastOracle.dbscanE2eSql(eps = 0.35, minPts = 3))
      case other => sys.error(s"unknown: $other")
    }
  }
}
