package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class MainCliSpec extends AnyFunSuite {

  test("flags, values, and dotlist overrides parse") {
    val Right(o) = Main.parseArgs(Array(
      "--config-dir", "/cfg", "--env", "qa", "--dry-run",
      "filters.start_date=20250301", "filters.country=GT"))
    assert(o.configDir == "/cfg")
    assert(o.env.contains("qa"))
    assert(o.dryRun && !o.showConfig)
    assert(o.dotlist == Seq("filters.start_date=20250301", "filters.country=GT"))
  }

  test("unknown flag and missing value are rejected") {
    assert(Main.parseArgs(Array("--bogus")).isLeft)
    assert(Main.parseArgs(Array("--env")).isLeft)
    // a --flag=value form is not a dotlist override
    assert(Main.parseArgs(Array("--env=qa")).isLeft)
  }

  test("defaults") {
    val Right(o) = Main.parseArgs(Array.empty)
    assert(o == Main.CliOptions())
  }
}
