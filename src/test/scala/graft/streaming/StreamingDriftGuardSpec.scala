package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming drift guard: exact TV bounds (reference replay = 0, disjoint
  * vocabulary = 1e6 — the same pins as x115), OOV accounting, and the
  * continuous form's per-batch log with the alert flag.
  */
class StreamingDriftGuardSpec extends SparkSpec {
  import spark.implicits._

  private def refDocs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  private def junk(n: Int) = (0 until n)
    .map(i => (100000L + i, s"zzqx$i wwvv$i qqzz$i"))
    .toDF("doc_id", "text")

  test("replaying the reference measures TV=0; a disjoint batch measures 1e6 with full OOV mass") {
    val ref = StreamingDriftGuard.reference(refDocs).localCheckpoint()
    val nRef = ref.agg(sum("r_cnt")).as[Long].head()
    val same = StreamingDriftGuard.batchDrift(refDocs, ref, nRef)
      .select("n_docs", "n_tokens", "n_new_terms", "new_tok", "tv_e6")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(same._1 == refDocs.count())
    assert(same._3 == 0L && same._4 == 0L && same._5 == 0L)
    val drifted = StreamingDriftGuard.batchDrift(junk(10), ref, nRef)
      .select("n_tokens", "n_terms", "n_new_terms", "new_tok", "tv_e6")
      .as[(Long, Long, Long, Long, Long)].head()
    // every term unseen by the reference; TV pinned at exactly 1
    assert(drifted._2 == drifted._3 && drifted._1 == drifted._4)
    assert(drifted._5 == 1000000L)
    // a half-and-half batch sits strictly between the bounds
    val mixed = StreamingDriftGuard.batchDrift(
      refDocs.limit(20).select("doc_id", "text").union(junk(20)), ref, nRef)
      .select("tv_e6").as[Long].head()
    assert(mixed > 0L && mixed < 1000000L)
    // empty batch: a zero row, not nulls
    val empty = StreamingDriftGuard.batchDrift(junk(0), ref, nRef)
      .select("n_docs", "n_tokens", "n_terms", "tv_e6")
      .as[(Long, Long, Long, Long)].head()
    assert(empty == ((0L, 0L, 0L, 0L)))
  }

  test("continuous form: one row per batch, alert fires on the drifted batch only") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("driftGuard")
    val driftPath = new java.io.File(dir, "drift").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath

    val ref = StreamingDriftGuard.reference(refDocs).localCheckpoint()
    val nRef = ref.agg(sum("r_cnt")).as[Long].head()
    val clean = refDocs.limit(30)
      .as[(Long, String)].collect()
    val dirty = junk(30).as[(Long, String)].collect()

    val in = MemoryStream[(Long, String)]
    val q = StreamingDriftGuard.stream(
      in.toDF().toDF("doc_id", "text"), ref, driftPath, ckpt, alertTvE6 = 500000L)
    in.addData(clean.toIndexedSeq)
    q.processAllAvailable()
    in.addData(dirty.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    val log = spark.read.parquet(driftPath)
      .select("batch_id", "n_docs", "tv_e6", "alert")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(log.length == 2)
    assert(log(0)._2 == 30L && log(1)._2 == 30L)
    // batch 0 replays reference docs: low TV, no alert; batch 1 is junk:
    // TV = 1e6 exactly, alert fires
    assert(!log(0)._4 && log(0)._3 < 500000L)
    assert(log(1)._4 && log(1)._3 == 1000000L)
    // per-batch log row == the batch-side audit of the same data
    // (streaming/batch parity, the module family's standard)
    val batchSide = StreamingDriftGuard.batchDrift(
      dirty.toSeq.toDF("doc_id", "text"), ref, nRef)
      .select("tv_e6").as[Long].head()
    assert(batchSide == log(1)._3)
  }
}
