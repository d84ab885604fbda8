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
    // Locale.ROOT: f"" interpolation is locale-sensitive — a comma-decimal
    // locale would emit invalid JSON.
    def fmt(v: Double, dec: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))
    def jsonLine(dec: Int): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v, dec) }
        .mkString("{", ",", "}")
      val total = if (results.nonEmpty) results.values.sum else 0.0
      s"""{"metric":"total","value":${fmt(total, 4)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    // Full-precision copy on disk so the result can always be read whole.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), jsonLine(4) + "\n")
    // Stop Spark BEFORE the stdout emission: its shutdown logging must not
    // land after the JSON line a tail-window consumer reads last.
    spark.stop()
    // The bare compact JSON line goes LAST (2-decimal per-query keeps it
    // ~2.5 KB); only sbt's own ~60-byte success banner can follow it. The
    // "[info] "-prefixed compatibility copy prints FIRST so a byte-bounded
    // tail window holds the whole bare line rather than two adjacent copies
    // each clipped halfway.
    println(s"[info] ${jsonLine(2)}")
    println(s"[bench] wrote ${java.nio.file.Paths.get(out).toAbsolutePath}")
    println(jsonLine(2))
    System.out.flush()
  }
}
