package graft

import org.scalatest.funsuite.AnyFunSuite

/** Config env parsing (O2, reference config/loadConfig.go). */
class ConfigSpec extends AnyFunSuite {

  test("defaults match the reference's (loadConfig.go:15-25)") {
    val c = Config.load(Map.empty)
    assert(c.csvDir === "./data")
    assert(c.unprocessedDir === "./data/unprocessed")
    assert(c.processedDir === "./data/processed")
    assert(!c.moveProcessedFiles)
    assert(c.syntheticDataRows === 100L)
  }

  test("env overrides and dir resolution under CSV_DIR (loadConfig.go:87-133)") {
    val c = Config.load(Map(
      "CSV_DIR" -> "/data/bank",
      "UNPROCESSED_DIR" -> "incoming",
      "PROCESSED_DIR" -> "archived",
      "MOVE_PROCESSED_FILES" -> "true",
      "LAKE_PATH" -> "/lake",
      "SYNC_LOG_PATH" -> "/sync"))
    assert(c.unprocessedDir === "/data/bank/incoming")
    assert(c.processedDir === "/data/bank/archived")
    assert(c.moveProcessedFiles)
    assert(c.lakePath === "/lake")
  }

  test("SYNTHETIC_DATA_ROWS overrides; garbage falls back to 100") {
    assert(Config.load(Map("SYNTHETIC_DATA_ROWS" -> "50000")).syntheticDataRows === 50000L)
    assert(Config.load(Map("SYNTHETIC_DATA_ROWS" -> "lots")).syntheticDataRows === 100L)
  }

  test("MOVE_PROCESSED_FILES follows strconv.ParseBool incl. garbage→default") {
    for (t <- Seq("1", "t", "T", "TRUE", "true", "True"))
      assert(Config.load(Map("MOVE_PROCESSED_FILES" -> t)).moveProcessedFiles, t)
    for (f <- Seq("0", "f", "FALSE", "false"))
      assert(!Config.load(Map("MOVE_PROCESSED_FILES" -> f)).moveProcessedFiles, f)
    assert(!Config.load(Map("MOVE_PROCESSED_FILES" -> "yes")).moveProcessedFiles)
  }
}
