package graft.io

import java.nio.file.Files
import java.time.LocalDate

import graft.SparkSpec

/** Dated-run layout: DD-MM-YYYY folders, newest-first discovery by
  * parsed date (not string order), same-day cleanup for idempotent
  * re-runs (pipeline_orchestrator.py:38-69).
  */
class RunPathsSpec extends SparkSpec {

  test("runDir formats the reference layout") {
    val d = LocalDate.of(2026, 2, 1)
    assert(RunPaths.runDir("/out", d) == "/out/01-02-2026")
    assert(RunPaths.viewsDir("/out", d) == "/out/01-02-2026/views")
    assert(RunPaths.reportsDir("/out", d) == "/out/01-02-2026/reportes")
  }

  test("listRuns sorts by parsed date — catches the DD-MM-YYYY trap") {
    val base = Files.createTempDirectory("graft_runs").toString
    // lexicographically "31-01-2026" > "01-02-2026", but Feb 1 is newer
    Seq("31-01-2026", "01-02-2026", "15-01-2026", "not-a-run").foreach { f =>
      Files.createDirectories(java.nio.file.Paths.get(base, f))
    }
    val runs = RunPaths.listRuns(spark, base)
    assert(runs.map(_._1) == Seq(
      LocalDate.of(2026, 2, 1), LocalDate.of(2026, 1, 31),
      LocalDate.of(2026, 1, 15)))
    assert(RunPaths.latestRun(spark, base).get.endsWith("01-02-2026"))
  }

  test("cleanRun deletes only the same-day folder") {
    val base = Files.createTempDirectory("graft_runs2").toString
    val today = LocalDate.of(2026, 3, 3)
    val other = LocalDate.of(2026, 3, 2)
    Files.createDirectories(
      java.nio.file.Paths.get(RunPaths.runDir(base, today), "views"))
    Files.createDirectories(
      java.nio.file.Paths.get(RunPaths.runDir(base, other)))
    assert(RunPaths.cleanRun(spark, base, today))
    assert(!Files.exists(java.nio.file.Paths.get(RunPaths.runDir(base, today))))
    assert(Files.exists(java.nio.file.Paths.get(RunPaths.runDir(base, other))))
    assert(!RunPaths.cleanRun(spark, base, today)) // already gone
  }

  test("empty/missing base yields no runs") {
    assert(RunPaths.listRuns(spark, "/nonexistent/graft/base").isEmpty)
    assert(RunPaths.latestRun(spark, "/nonexistent/graft/base").isEmpty)
  }
}
