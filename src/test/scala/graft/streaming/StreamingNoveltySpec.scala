package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.xscale.TextAnalysis

/** Streaming x45: scoring micro-batches against accumulated shingle state
  * must equal the batch operator when doc_ids arrive in order, and clones
  * arriving after their original must score zero novelty.
  */
class StreamingNoveltySpec extends SparkSpec {
  import spark.implicits._

  test("sequential score over ordered batches == batch x45 on the whole corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    val batches = Seq(
      docs.filter(col("doc_id") <= cuts(0)),
      docs.filter(col("doc_id") > cuts(0) && col("doc_id") <= cuts(1)),
      docs.filter(col("doc_id") > cuts(1)))

    val statePath = new java.io.File(tmpDir("snState"), "state").getPath
    val streamed = batches.flatMap { b =>
      StreamingNovelty.score(spark, b, statePath)
        .select("doc_id", "n_shingles", "n_novel", "nov_e6")
        .as[(Long, Long, Long, Long)].collect()
    }.sortBy(_._1)

    // batch x45's min-doc_id rule IS stream order when batches are cut in
    // doc_id order, so the two paths must agree row for row
    val batch = TextAnalysis.shingleNovelty(docs)
      .select("doc_id", "n_shingles", "n_novel", "nov_e6")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(streamed === batch.toSeq)
  }

  test("a clone arriving in a later batch scores zero novelty") {
    val statePath = new java.io.File(tmpDir("snClone"), "state").getPath
    val b1 = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val b2 = Seq(
      (3L, "alpha beta gamma delta epsilon"), // clone of doc 1
      (4L, "lambda mu nu xi omicron")).toDF("doc_id", "text")
    val r1 = StreamingNovelty.score(spark, b1, statePath)
      .select("doc_id", "nov_e6").as[(Long, Long)].collect().toMap
    val r2 = StreamingNovelty.score(spark, b2, statePath)
      .select("doc_id", "nov_e6").as[(Long, Long)].collect().toMap
    assert(r1(1L) === 1000000L && r1(2L) === 1000000L) // empty state: all novel
    assert(r2(3L) === 0L) // every shingle already in state
    assert(r2(4L) === 1000000L)
  }
}
