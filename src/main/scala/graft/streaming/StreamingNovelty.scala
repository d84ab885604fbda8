package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, graftnative}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming shingle novelty: the x45 score for ingest paths where the
  * corpus trickles in — each micro-batch is scored against the set of
  * shingle hashes accumulated from every EARLIER batch, so "novel" means
  * first-seen in stream order (batch x45's min-doc_id rule degenerates to
  * exactly this when doc_ids arrive in order, which the spec pins).
  *
  * State is an explicit parquet table of 8-byte distinct shingle hashes,
  * the same explicit-state shape as [[StreamingDedup]] (novelty needs an
  * arbitrary-key membership test, which the keyed state store's
  * one-key-per-row model can't express). Scale posture (100 TB): the state
  * table grows with DISTINCT corpus shingles; per batch the work is one
  * join keyed on the hash — O(batch shingles), never O(batch × state) —
  * and the state side should be written bucketed by hash so the join
  * co-locates. When exact membership stops being worth the storage,
  * x17's Bloom-filter admit is the lossy swap (false positives
  * under-count novelty, never over-count).
  */
object StreamingNovelty {

  /** Score one (micro-)batch against the shingle state at `statePath`:
    * returns (doc_id, n_shingles, n_novel, nov_e6) for the batch's docs
    * and appends the batch's previously-unseen hashes to the state.
    * Within a batch, a new-to-state shingle in several docs credits the
    * smallest doc_id (the batch x45 rule).
    */
  def score(spark: SparkSession, batch: DataFrame, statePath: String): DataFrame = {
    val sPath = new org.apache.hadoop.fs.Path(statePath)
    val fs = sPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val state =
      if (fs.exists(sPath)) spark.read.parquet(statePath)
      else spark.range(0).select(col("id").as("h"))

    val sh = batch
      .select(col("doc_id"), explode(graftnative.api.shingleHash60(col("text"), 3)).as("h"))
      .localCheckpoint() // feeds three consumers below; one corpus pass
    val seen = state.select(col("h")).distinct().withColumn("_seen", lit(true))
    // batch-local first occurrence decides credit for new-to-state hashes
    val firstInBatch = sh.groupBy("h").agg(min("doc_id").as("first_doc"))
    val scored = sh
      .join(seen, Seq("h"), "left")
      .join(firstInBatch, "h")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(
          when(col("_seen").isNull && col("first_doc") === col("doc_id"), 1L)
            .otherwise(0L)).as("n_novel"))
      .withColumn("nov_e6", expr("(1000000 * n_novel) div n_shingles"))
      // materialize BEFORE the state append: the lazy plan reads the state
      // dir, and appending first would let a recomputation see the new
      // files (same ordering rule as StreamingDedup.admit)
      .localCheckpoint()
    firstInBatch.join(seen, Seq("h"), "left_anti").select("h")
      .write.mode(SaveMode.Append).parquet(statePath)
    scored
  }

  /** Continuous form: score every micro-batch, appending results to
    * `outPath`. Same two-write caveat as [[StreamingDedup.stream]]: crash
    * between the state append and the out append can replay a batch with
    * state already advanced (its docs then score novelty 0); exactly-once
    * across both tables needs a transactional format underneath.
    */
  def stream(
      docs: DataFrame,
      statePath: String,
      outPath: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, _: Long) =>
        score(b.sparkSession, b, statePath)
          .write.mode(SaveMode.Append).parquet(outPath)
        ()
      }
      .start()
}
