package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative

import graft.SparkSpec

/** Streaming near-dup dedup: the foreachBatch/parquet-state pipeline must
  * equal an independently coded driver-side reference (brute-force hamming
  * + union-find) run over the same batch sequence, and the MemoryStream
  * wiring must drop cross-batch near-dups end-to-end.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def fingerprint(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("s1", graftnative.api.simhash60(graftnative.api.tokenHash60(col("text"))))

  test("sequential admit == driver-side brute-force reference over 3 batches") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    val batches = Seq(
      docs.filter(col("doc_id") <= cuts(0)),
      docs.filter(col("doc_id") > cuts(0) && col("doc_id") <= cuts(1)),
      docs.filter(col("doc_id") > cuts(1)))

    val statePath = new java.io.File(tmpDir("sdState"), "state").getPath
    val streamed = batches.flatMap { b =>
      StreamingDedup.admit(spark, b, statePath).select("doc_id").as[Long].collect()
    }.toSet

    // independent reference: brute hamming + union-find on the driver
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    var seen = Vector.empty[(Long, Long)] // (doc_id, s1)
    val expected = Set.newBuilder[Long]
    for (b <- batches) {
      val fp = fingerprint(b).select("doc_id", "s1").as[(Long, Long)].collect().sortBy(_._1)
      val rem = fp.filterNot { case (_, s) => seen.exists(t => ham(t._2, s) <= 8) }
      // union-find over near-dup pairs within the remainder
      val parent = scala.collection.mutable.Map(rem.map(r => r._1 -> r._1): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for {
        i <- rem.indices; j <- (i + 1) until rem.length
        if ham(rem(i)._2, rem(j)._2) <= 8
      } parent(find(rem(j)._1)) = find(rem(i)._1)
      val reps = rem.groupBy(r => find(r._1)).map { case (_, g) => g.minBy(_._1) }.toSeq
      reps.foreach(r => expected += r._1)
      seen = seen ++ reps
    }
    assert(streamed === expected.result())
    assert(streamed.size < ids.length) // something was actually deduped
  }

  test("MemoryStream end-to-end: cross-batch near-dup dropped, fresh doc admitted") {
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val dir = tmpDir("sdStream")
    val statePath = new java.io.File(dir, "state").getPath
    val outPath = new java.io.File(dir, "out").getPath
    val q = StreamingDedup.stream(
      in.toDF().toDF("doc_id", "text"), statePath, outPath,
      new java.io.File(dir, "ckpt").getPath)

    in.addData((1L, "the quick brown fox jumps over the lazy dog"))
    q.processAllAvailable()
    in.addData(
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (3L, "completely different content about spark execution engines"))
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(outPath).select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L, 3L))
    val state = spark.read.parquet(statePath).select("doc_id").as[Long].collect().toSet
    assert(state === Set(1L, 3L))
  }
}
