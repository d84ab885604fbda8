package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.xscale.TextAnalysis

/** Streaming quality gate: admission must equal the batch
  * `score_e4 >= thr` filter on the same corpus (streaming/batch parity),
  * and the continuous form must route docs and write per-batch stats.
  */
class StreamingQualityGateSpec extends SparkSpec {
  import spark.implicits._

  private val thr = 5000L

  test("gate admission == batch quality filter on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "text", "n_chars")
    val gate = StreamingQualityGate.score(docs, thr)
    val admitted = gate.filter(col("admitted")).select("doc_id").as[Long].collect().sorted
    val batch = docs
      .join(TextAnalysis.qualityPerDoc(docs).select("doc_id", "score_e4"), "doc_id")
      .filter(col("score_e4") >= thr)
      .select("doc_id").as[Long].collect().sorted
    assert(admitted.nonEmpty && admitted.length < docs.count())
    assert(admitted.toSeq == batch.toSeq)
  }

  test("continuous form: routing, scores on rejects, per-batch stats conserve tokens") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("qualityGate")
    val outPath = new java.io.File(dir, "out").getPath
    val rejPath = new java.io.File(dir, "rej").getPath
    val statsPath = new java.io.File(dir, "stats").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "text", "n_chars").limit(60).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

    val in = MemoryStream[(Long, String, String, Long)]
    val q = StreamingQualityGate.stream(
      in.toDF().toDF("doc_id", "source", "text", "n_chars"),
      outPath, rejPath, statsPath, ckpt, thr)
    val (b1, b2) = docs.splitAt(30)
    in.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    in.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(outPath)
    val rej = spark.read.parquet(rejPath)
    val stats = spark.read.parquet(statsPath)
      .select("batch_id", "n_docs", "n_admitted", "tok_admitted", "tok_rejected")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)

    // every input doc lands in exactly one of out/rej
    assert(out.count() + rej.count() == docs.length)
    // admitted set equals the batch filter over the same docs
    val batchAdmit = {
      val df = docs.toSeq.toDF("doc_id", "source", "text", "n_chars")
      df.join(TextAnalysis.qualityPerDoc(df).select("doc_id", "score_e4"), "doc_id")
        .filter(col("score_e4") >= thr).select("doc_id").as[Long].collect().sorted
    }
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == batchAdmit.toSeq)
    // rejects carry their scores, all below the threshold
    assert(rej.filter(col("score_e4") >= thr).count() == 0)
    // one stats row per batch; doc counts conserve
    assert(stats.length == 2)
    assert(stats.map(_._2).sum == docs.length)
    assert(stats.map(_._3).sum == batchAdmit.length)
    // token conservation per batch: admitted + rejected == batch total
    val totalTok = {
      val df = docs.toSeq.toDF("doc_id", "source", "text", "n_chars")
      TextAnalysis.qualityPerDoc(df).agg(sum("n_tok")).as[Long].head()
    }
    assert(stats.map(s => s._4 + s._5).sum == totalTok)
  }
}
