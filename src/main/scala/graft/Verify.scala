package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional 3rd arg: comma-separated name-prefix filter, for fast
    // single-query iteration against tools/check_oracle.py. The driver
    // always passes exactly two args, so its behavior is unchanged.
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Seq[String]] =
      if (args.length > 2) Some(args(2).split(",").toSeq) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "org.apache.spark.sql.graftnative.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val outAbs = Paths.get(outDir).toAbsolutePath
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name.parquet")
        println(s"[verify] wrote ${outAbs.resolve(s"$name.parquet")}")
      }
      catch { case e: Throwable =>
        val first = Option(e.getMessage).getOrElse(e.getClass.getName)
          .linesIterator.toSeq.headOption.getOrElse(e.getClass.getName)
        failures(name) = s"${e.getClass.getSimpleName}: $first"
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracle = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.exists(k.startsWith)) }
    // Key the map BOTH bare and with the `.parquet` suffix: the driver's
    // CORRECTNESS keys carry the result-file suffix (`q01_….parquet`), so a
    // suffixed lookup into a bare-keyed map would miss every query.
    val json = oracle.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(k -> v, s"$k.parquet" -> v) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // Per-query failure artifact: a driver-side crash must be attributable
    // from committed artifacts alone, not a silently-absent CORRECTNESS row
    // (how the r8 q23 regression hid — VERDICT r8 "What's missing" #1).
    // ALWAYS written, empty `{}` when clean, so its absence is itself a
    // signal that Verify didn't finish.
    val failJson = failures.toSeq
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val failPath = Paths.get(s"$outDir/_failures.json")
    Files.writeString(failPath, failJson)
    println(s"[verify] wrote ${failPath.toAbsolutePath} (${failures.size} failures)")
    if (only.isEmpty && Files.exists(Paths.get("build.sbt"))) {
      Files.writeString(Paths.get("VERIFY_FAILURES.json"), failJson)
    }
    val jsonPath = Paths.get(s"$outDir/oracle_sql.json")
    Files.writeString(jsonPath, json)
    println(s"[verify] wrote ${jsonPath.toAbsolutePath} (${oracle.size} queries, dual-keyed)")
    // One plain-text `<name>.sql` beside each result parquet, so the oracle
    // SQL is discoverable by directory listing alone.
    oracle.foreach { case (k, v) =>
      val p = Paths.get(s"$outDir/$k.sql")
      Files.writeString(p, v)
      println(s"[verify] wrote ${p.toAbsolutePath}")
    }
    // Canonical copy at the repo root (committed; also refreshed whenever
    // Verify runs unfiltered from the repo) so the oracle map is findable
    // without running Verify at all.
    if (only.isEmpty && Files.exists(Paths.get("build.sbt"))) {
      val root = Paths.get("ORACLE_SQL.json")
      Files.writeString(root, json)
      println(s"[verify] wrote ${root.toAbsolutePath}")
    }
    spark.stop()
  }
}
