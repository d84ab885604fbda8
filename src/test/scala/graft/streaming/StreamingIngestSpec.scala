package graft.streaming

import graft.SparkSpec
import graft.model.Transaction

/** End-to-end streaming ingest: files stream in, get canonicalized, merged
  * into the lake, archived by the source; a second wave of files is an
  * incremental micro-batch that upserts (not duplicates) the lake.
  */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private val goldenCsv =
    """Details,Posting Date,Description,Amount,Type,Balance,Check or Slip #
      |DEBIT,01/15/2024,COFFEE SHOP,-4.50,ACH_DEBIT,995.50,
      |CREDIT,01/16/2024,PAYROLL,2000.00,ACH_CREDIT,2995.50,
      |DEBIT,01/17/2024
      |BAD,notadate,DROPPED,1.00,X,1.0,""".stripMargin
  // the ragged 2-field row must drop in streaming exactly as in batch

  test("streaming ingest: canonicalize, merge, archive, incremental upsert") {
    val root = tmpDir("stream")
    val in = new java.io.File(root, "in"); in.mkdirs()
    val archive = new java.io.File(root, "archive").getPath
    val lake = new java.io.File(root, "lake").getPath
    val sync = new java.io.File(root, "sync").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath

    // source archives batch N's files when batch N+1 commits (see
    // StreamingIngest doc) — so wave-1 files appear under the archive dir
    // only after wave 2 runs
    def archived: Seq[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(archive)).map(_.getName).filter(_.endsWith(".csv"))
    }

    writeFile(in, "chase1234_jan.csv", goldenCsv)
    val q1 = StreamingIngest.run(spark, in.getPath, archive, lake, sync, ckpt)
    q1.processAllAvailable()
    q1.stop()

    val first = spark.read.parquet(lake).as[Transaction].collect()
    assert(first.length === 2) // invalid-date row dropped
    assert(first.map(_.description).toSet === Set("COFFEE SHOP", "PAYROLL"))
    assert(first.forall(t => t.data_source == "chase" && t.account_id == "1234"))

    // wave 2: overlapping key with changed amount + a brand-new row
    writeFile(in, "chase1234_feb.csv",
      """Details,Posting Date,Description,Amount,Type,Balance,Check or Slip #
        |DEBIT,01/15/2024,COFFEE SHOP,-9.99,ACH_DEBIT,990.01,
        |DEBIT,02/01/2024,NEW ROW,-1.00,ACH_DEBIT,989.01,""".stripMargin)
    val q2 = StreamingIngest.run(spark, in.getPath, archive, lake, sync, ckpt)
    q2.processAllAvailable()
    // wave 2's batch commit triggers (async) archival of wave 1's file
    val deadline = System.currentTimeMillis() + 30000
    while (!archived.contains("chase1234_jan.csv") && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    q2.stop()
    assert(archived.contains("chase1234_jan.csv"))

    val after = spark.read.parquet(lake).as[Transaction].collect()
    assert(after.length === 3)
    val coffee = after.find(_.description == "COFFEE SHOP").get
    assert(coffee.amount === -9.99) // upserted, not duplicated
    assert(after.exists(_.description == "NEW ROW"))

    // sync log has one row per (source, micro-batch)
    val syncRows = spark.read.parquet(sync).collect()
    assert(syncRows.length === 2)
    assert(syncRows.forall(_.getAs[String]("collection_name") == "transactions_chase"))
  }
}
