package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming admission: the foreachBatch/sig-state pipeline must classify
  * byte-identically to the batch verb (`Cli admit --sigs --strict`) run day
  * by day over the same batch sequence — same state currency, same
  * decision rule, pinned through the hash-verified report rows — and the
  * MemoryStream wiring must route every status end-to-end.
  */
class StreamingAdmitSpec extends SparkSpec {
  import spark.implicits._

  private val novel1 = "the estuary gauge recorded eleven spring tides before the survey"
  private val novel2 = "a ledger of replacement lamp wicks issued to the canal keepers"
  private val novel3 = "winter fodder allocations for the upland grazing commons by parish"
  private val novel4 = "an index of misfiled harbor dues receipts recovered from the annex"

  private def b1 = Seq(
    (1L, novel1, "s"), // admitted (first arrival of novel1 by hash order or id)
    (2L, novel1, "s"), // exact intra-batch dup of 1
    (3L, novel2, "s")  // admitted
  ).toDF("doc_id", "text", "source")

  private def b2 = Seq(
    (11L, novel1, "s"),         // exact dup of day-1 state
    (12L, novel2 + " zq", "s"), // near-dup of day-1 state
    (13L, novel3, "s"),         // near PAIR with 14 — strict keeps one
    (14L, novel3 + " zr", "s"),
    (15L, novel4, "s")          // fresh
  ).toDF("doc_id", "text", "source")

  private def reportKey(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
    df.select("status", "n_docs", "checksum").as[(String, Long, Long)].collect().toSet

  test("sequential admit == Cli admit --sigs --strict day by day (report-checksum parity)") {
    val base = tmpDir("stream-admit")
    val statePath = new java.io.File(base, "state").getPath
    val reportPath = new java.io.File(base, "report").getPath

    val a1 = StreamingAdmit.admit(spark, b1, statePath,
      reportPath = Some(reportPath), batchId = 0L)
    // the exact intra-batch rule admits the HASH-ORDER first arrival of
    // novel1 (1 or 2) plus novel2's doc
    val ids1 = a1.select("doc_id").as[Long].collect().toSet
    assert(ids1.size === 2 && ids1.contains(3L) && (ids1 - 3L).subsetOf(Set(1L, 2L)))

    val a2 = StreamingAdmit.admit(spark, b2, statePath,
      reportPath = Some(reportPath), batchId = 1L)
    val ids2 = a2.select("doc_id").as[Long].collect().toSet
    // 11 exact-state dup, 12 near-state dup, 13/14 strict keeps the CC
    // min (13), 15 fresh
    assert(ids2 === Set(13L, 15L))
    // state = admitted docs only, across both days
    val state = spark.read.parquet(statePath).select("doc_id").as[Long].collect().toSet
    assert(state === ids1 ++ ids2)

    // the batch verb, run day by day on the SAME batches with a fresh
    // sidecar, must produce the identical hash-verified reports
    val emptyCorpus = b1.filter(lit(false))
    val corpusPath = new java.io.File(base, "corpus.parquet").getPath
    val b1Path = new java.io.File(base, "b1.parquet").getPath
    val b2Path = new java.io.File(base, "b2.parquet").getPath
    emptyCorpus.write.parquet(corpusPath)
    b1.write.parquet(b1Path)
    b2.write.parquet(b2Path)
    val sigs2 = new java.io.File(base, "sigs2").getPath
    def cli(batchPath: String, out: String): Unit = {
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf)) {
        assert(graft.Cli.run(spark, List(
          "admit", corpusPath, batchPath, out, "--sigs", sigs2, "--strict")) === 0)
      }
    }
    cli(b1Path, new java.io.File(base, "o1").getPath)
    cli(b2Path, new java.io.File(base, "o2").getPath)
    val streamed = spark.read.parquet(reportPath)
    assert(reportKey(streamed.filter(col("batch_id") === 0L)) ===
      reportKey(spark.read.parquet(new java.io.File(base, "o1").getPath + "/report")))
    assert(reportKey(streamed.filter(col("batch_id") === 1L)) ===
      reportKey(spark.read.parquet(new java.io.File(base, "o2").getPath + "/report")))
    // and the sidecars agree doc-for-doc
    val cliState = spark.read.parquet(sigs2).select("doc_id").as[Long].collect().toSet
    assert(cliState === state)
  }

  test("MemoryStream end-to-end: every status routed, state admitted-only") {
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val dir = tmpDir("stream-admit-e2e")
    val statePath = new java.io.File(dir, "state").getPath
    val outPath = new java.io.File(dir, "out").getPath
    val reportPath = new java.io.File(dir, "report").getPath
    val q = StreamingAdmit.stream(
      in.toDF().toDF("doc_id", "text"), statePath, outPath,
      new java.io.File(dir, "ckpt").getPath, reportPath = Some(reportPath))

    in.addData((1L, novel1), (2L, novel2))
    q.processAllAvailable()
    in.addData(
      (3L, novel1),         // exact dup of state
      (4L, novel2 + " zq"), // near dup of state
      (5L, novel3), (6L, novel3 + " zr"), // intra-batch near pair
      (7L, novel4))         // fresh
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(outPath).select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L, 2L, 5L, 7L))
    val state = spark.read.parquet(statePath).select("doc_id").as[Long].collect().toSet
    assert(state === out)
    val rep = spark.read.parquet(reportPath)
      .select("status", "n_docs").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(rep === Map(
      "admitted" -> 4L, "dup_exact_corpus" -> 1L,
      "near_dup_corpus" -> 1L, "near_dup_batch" -> 1L))
  }
}
