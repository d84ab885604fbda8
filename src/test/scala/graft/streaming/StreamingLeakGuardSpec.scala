package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.xscale.DataPrep

/** Streaming x86: the guard's quarantine decision over a doc stream must
  * equal the batch repair's per-split accounting on the same corpus, and
  * the continuous form must route docs to out vs quarantine correctly.
  */
class StreamingLeakGuardSpec extends SparkSpec {
  import spark.implicits._

  test("guard decisions == batch x86 quarantine accounting on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("split", DataPrep.splitCol)
    val train = StreamingLeakGuard.trainWindowTable(docs.filter(col("split") === "train"))
    val scored = StreamingLeakGuard.score(
      docs.filter(col("split") =!= "train").select("doc_id", "split", "text"), train)
    val guard = scored.groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("quarantined"), 1L).otherwise(0L)).as("n_quarantined"),
        sum("n_win").as("win_before"),
        sum("n_leaked").as("leak_before"))
      .select("split", "n_docs", "n_quarantined", "win_before", "leak_before")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    val batch = DataPrep.splitRepair(docs, col("split"))
      .select("split", "n_docs", "n_quarantined", "win_before", "leak_before")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(guard.toSeq === batch.toSeq)
  }

  test("continuous form routes clean docs to out and leaked docs to quarantine") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("leakGuard")
    val trainPath = new java.io.File(dir, "train").getPath
    val outPath = new java.io.File(dir, "out").getPath
    val qPath = new java.io.File(dir, "quarantine").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath

    StreamingLeakGuard.trainWindowTable(
      Seq((1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")).toDF("doc_id", "text"))
      .write.parquet(trainPath)

    val in = MemoryStream[(Long, String)]
    val q = StreamingLeakGuard.stream(
      in.toDF().toDF("doc_id", "text"), trainPath, outPath, qPath, ckpt)
    in.addData(
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 extra tail"), // carries a train window
      (4L, "v1 v2 v3 v4 v5 v6 v7 v8 v9 v10"), // clean
      (5L, "too short")) // no windows -> passes
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(outPath).select("doc_id").as[Long].collect().sorted
    val quar = spark.read.parquet(qPath)
      .select("doc_id", "n_leaked").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(4L, 5L))
    assert(quar.map(_._1).toSeq === Seq(3L) && quar.head._2 >= 1L)
  }
}
