package graft

/** Environment-driven runtime config (O2, reference
  * config/loadConfig.go:15-34,37-133): same variable names and defaults,
  * with Mongo connection knobs replaced by lake/sync-log paths (the lake is
  * parquet, not Mongo — LAKE_PATH/SYNC_LOG_PATH take MONGO_URI's role as
  * "where the data lives").
  *
  * Directory layout mirrors the reference: `CSV_DIR` is the root,
  * `UNPROCESSED_DIR`/`PROCESSED_DIR` are names resolved under it
  * (loadConfig.go:87-133).
  */
final case class Config(
    csvDir: String,
    unprocessedDirName: String,
    processedDirName: String,
    moveProcessedFiles: Boolean,
    lakePath: String,
    syncLogPath: String,
    syntheticDataDir: String,
    syntheticDataRows: Long) {

  def unprocessedDir: String = s"$csvDir/$unprocessedDirName"
  def processedDir: String = s"$csvDir/$processedDirName"
}

object Config {

  /** Defaults from loadConfig.go:15-25 (Mongo ones re-pointed at the lake). */
  def load(env: Map[String, String] = sys.env): Config = {
    def get(k: String, d: String) = env.get(k).filter(_.nonEmpty).getOrElse(d)
    Config(
      csvDir = get("CSV_DIR", "./data"),
      unprocessedDirName = get("UNPROCESSED_DIR", "unprocessed"),
      processedDirName = get("PROCESSED_DIR", "processed"),
      // strconv.ParseBool semantics incl. fall-back-to-default on garbage
      // (loadConfig.go:50-68)
      moveProcessedFiles = env.get("MOVE_PROCESSED_FILES")
        .flatMap(parseBool).getOrElse(false),
      lakePath = get("LAKE_PATH", "./lake"),
      syncLogPath = get("SYNC_LOG_PATH", "./sync_log"),
      syntheticDataDir = get("SYNTHETIC_DATA_DIR", "tmp/synthetic"),
      syntheticDataRows = env.get("SYNTHETIC_DATA_ROWS")
        .flatMap(s => scala.util.Try(s.toLong).toOption)
        .getOrElse(100L))
  }

  /** Go strconv.ParseBool: 1/t/T/TRUE/true/True and 0/f/F/FALSE/false/False. */
  private[graft] def parseBool(s: String): Option[Boolean] = s match {
    case "1" | "t" | "T" | "TRUE" | "true" | "True"    => Some(true)
    case "0" | "f" | "F" | "FALSE" | "false" | "False" => Some(false)
    case _                                             => None
  }
}
