package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class RegistrySpec extends AnyFunSuite {
  test("registry persists runs and finds the best by metric") {
    val root = Files.createTempDirectory("graft_registry").toString
    val reg = new Registry(root)
    reg.logRun("exp1", "run_a", Map("lags" -> 3, "model" -> "ridge"),
      Map("mae" -> 2.5, "rmse" -> 3.1))
    reg.logRun("exp1", "run_b", Map("lags" -> 7, "model" -> "ridge"),
      Map("mae" -> 1.75, "rmse" -> 2.2))
    assert(reg.listRuns("exp1") == Seq("run_a", "run_b"))
    assert(reg.readMetrics("exp1", "run_a")("mae") == 2.5)
    assert(reg.bestRun("exp1", "mae").contains("run_b" -> 1.75))
    assert(reg.listRuns("missing").isEmpty)
  }
}
