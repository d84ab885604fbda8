package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    // Untimed warmup: pay one-time session costs (codegen compiler init,
    // parquet footer reads, shuffle service spin-up) outside the per-query
    // timings so the first measured query isn't charged for them.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Execute the FULL physical plan (queryExecution.toRdd), not
    // df.count(): count() lets Catalyst prune every projection and drop
    // provably count-preserving joins, so per-row operators (x31's native
    // metrics) and left-join enrichments (x34's coverage) would be timed
    // as bare scans. toRdd materializes every column of the executed plan,
    // sorts included.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).queryExecution.toRdd.count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // 4-decimal seconds (0.1 ms): keeps the one-line JSON short enough that
    // line-buffered consumers never truncate it mid-stream.
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":${f"$total%.4f"},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Emit twice: once bare (run/outputStrategy := StdoutOutput passes it
    // through unprefixed) and once with a literal "[info] " prefix so a
    // consumer grepping for the old sbt-logger shape still finds a valid
    // line; both parse to the same JSON.
    println(line)
    println(s"[info] $line")
    System.out.flush()
    // Also drop a clean copy on disk so the result can be read whole.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    println(s"[bench] wrote ${java.nio.file.Paths.get(out).toAbsolutePath}")
    spark.stop()
  }
}
