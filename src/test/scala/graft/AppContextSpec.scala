package graft

import scala.collection.mutable

/** O3 run timeout + O4 contextual logger (reference main.go:52-56,
  * appcontext/context.go:12-24).
  */
class AppContextSpec extends SparkSpec {

  test("withTimeout: a fast body completes and returns its value") {
    val r = RunGuard.withTimeout(spark, 60, "fast") {
      spark.range(1000).count()
    }
    assert(r === 1000L)
  }

  test("withTimeout: a long run is cancelled at the deadline") {
    import org.apache.spark.sql.functions.udf
    val slow = udf { (x: Long) => Thread.sleep(200); x }
    val t0 = System.nanoTime()
    val e = intercept[RunGuard.RunTimeoutException] {
      RunGuard.withTimeout(spark, 2, "slow") {
        // 4 partitions x 50 rows x 200ms >> 2s deadline
        spark.range(200).repartition(4)
          .select(slow(org.apache.spark.sql.functions.col("id")).as("id"))
          .agg(org.apache.spark.sql.functions.sum("id")).collect()
      }
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(e.getMessage.contains("slow exceeded 2s"))
    // cancelled near the deadline, not after the ~10s the job would need
    assert(elapsed < 8.0, s"took $elapsed s")
  }

  test("withTimeout: jobs started after the guard exits are unaffected") {
    intercept[RunGuard.RunTimeoutException] {
      RunGuard.withTimeout(spark, 1, "expired") { Thread.sleep(1500); () }
    }
    assert(spark.range(10).count() === 10L)
  }

  test("LogCtx: fields accumulate and render key=value; sink is injectable") {
    val lines = mutable.Buffer[String]()
    val log = LogCtx(sink = lines.append(_)).withField("run", "r1")
    log.info("begin")
    log.withField("file", "a.csv").warn("failed: bad quote")
    assert(lines(0) === "INFO begin run=r1")
    assert(lines(1) === "WARN failed: bad quote run=r1 file=a.csv")
  }

  test("ingestDirectory logs per-file outcomes with file context") {
    val dir = tmpDir("ctx-ingest")
    writeFile(dir, "chase1234.csv",
      "Details,Posting Date,Description,Amount,Type,Balance,Check or Slip #\n" +
        "DEBIT,01/02/2024,COFFEE,-4.50,ACH_DEBIT,100.00,\n")
    writeFile(dir, "unknown.txt", "not a csv")
    val lines = mutable.Buffer[String]()
    val log = LogCtx(sink = lines.append(_))
    graft.lake.Lake.ingestDirectory(
      spark,
      dir.getPath,
      tmpDir("ctx-lake").getPath + "/lake",
      tmpDir("ctx-sync").getPath + "/sync",
      log = log)
    assert(lines.exists(l => l.startsWith("INFO processed rows=1") && l.contains("file=chase1234.csv")), lines)
    assert(lines.exists(l => l.startsWith("WARN failed:") && l.contains("file=unknown.txt")), lines)
    assert(lines.exists(_.startsWith("INFO ingest done total=2 processed=1 failed=1")), lines)
  }
}
