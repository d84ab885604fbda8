package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, graftnative}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.xscale.{Dedup, DedupClusters}

/** Streaming NEAR-duplicate dedup: admit documents from a stream, dropping
  * any doc within simhash hamming distance 8 of an already-admitted doc —
  * the streaming twin of the batch x04/x14 pipeline, for ingest paths where
  * training data trickles in instead of arriving as one corpus.
  *
  * Near-dup state can't live in Spark's keyed state store the way exact
  * dedup's can ([[StreamingAnalytics.dedupEvents]]): a doc's duplicates
  * hash to 9 DIFFERENT pigeonhole buckets, and the admit decision is an OR
  * across all of them, which `[flat]MapGroupsWithState` (one key per row)
  * can't express. So state is explicit — a parquet table of admitted
  * (doc_id, s1) fingerprints — and each micro-batch runs the same blocked
  * candidate join the batch path uses ([[Dedup.candidatesFromFingerprints]])
  * via `foreachBatch`.
  *
  * Admit policy (deterministic given the batch sequence): drop batch docs
  * near an admitted fingerprint, then collapse near-dup clusters WITHIN the
  * remainder to their lowest-doc_id representative (same rule as x14).
  *
  * Scale posture (100 TB): per batch this is one blocked equi-join keyed on
  * (blk, bv) — O(candidates), never O(batch × state). The state table only
  * carries 16 bytes/doc; at 10^10 admitted docs (~160 GB) it should be
  * written bucketed by block value so the candidate join co-locates
  * without a state-side shuffle, and fingerprints widened to 120-bit
  * (`wide = true`) to keep the buckets selective.
  */
object StreamingDedup {

  private def withFingerprint(docs: DataFrame): DataFrame =
    docs.withColumn(
      "s1", graftnative.api.simhash60(graftnative.api.tokenHash60(col("text"))))

  /** Admit one (micro-)batch against the fingerprint state at `statePath`:
    * returns the surviving rows (original columns) and appends their
    * fingerprints to the state. Doc ids must be globally unique across the
    * stream (they key the state).
    */
  def admit(spark: SparkSession, batch: DataFrame, statePath: String): DataFrame = {
    val sPath = new org.apache.hadoop.fs.Path(statePath)
    val fs = sPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val state = if (fs.exists(sPath)) Some(spark.read.parquet(statePath)) else None

    val fp = withFingerprint(batch).cache()
    val batchFp = fp.select(col("doc_id"), col("s1"))
    val all = state match {
      case Some(s) => s.withColumn("seen", lit(true))
        .unionByName(batchFp.withColumn("seen", lit(false)))
      case None => batchFp.withColumn("seen", lit(false))
    }
    val pairs = Dedup.candidatesFromFingerprints(all.select("doc_id", "s1"), wide = false)
      .filter(expr("CAST(bit_count(sa1 ^ sb1) AS BIGINT)") <= 8)
      .select(col("da"), col("db"))
      .distinct()
    val flags = all.select(col("doc_id"), col("seen"))
    val flagged = pairs
      .join(flags.select(col("doc_id").as("da"), col("seen").as("seen_a")), "da")
      .join(flags.select(col("doc_id").as("db"), col("seen").as("seen_b")), "db")

    // batch docs near an admitted fingerprint are dropped outright
    val nearSeen = flagged.filter(col("seen_a") =!= col("seen_b"))
      .select(when(col("seen_a"), col("db")).otherwise(col("da")).as("doc_id"))
      .distinct()
    val remaining = fp.join(nearSeen, Seq("doc_id"), "left_anti")
    // near-dup clusters within the remainder collapse to one representative;
    // pairs touching a vs-state-dropped doc must NOT enter the clustering
    // (a dropped doc can't vouch for dropping an otherwise-unique one)
    val remPairs = flagged.filter(!col("seen_a") && !col("seen_b"))
      .join(nearSeen.select(col("doc_id").as("da")), Seq("da"), "left_anti")
      .join(nearSeen.select(col("doc_id").as("db")), Seq("db"), "left_anti")
      .select(col("da").as("a"), col("db").as("b"))
    // eager localCheckpoint: materialize BEFORE the state append below —
    // the lazy plan reads the state dir, and appending to it first would
    // make any recomputation see the new files
    val survivors = DedupClusters.dedupByPairs(remaining, remPairs).localCheckpoint()

    survivors.select("doc_id", "s1")
      .write.mode(SaveMode.Append).parquet(statePath)
    fp.unpersist()
    survivors.drop("s1")
  }

  /** Continuous form: admit every micro-batch of a streaming `docs` source,
    * appending survivors to `outPath`. The state append and the out append
    * are two writes, so a crash between them can replay a batch with state
    * already advanced — admit is id-stable (a doc is never near-dup of its
    * own state copy), but exactly-once across BOTH tables needs a
    * transactional table format underneath, same caveat as the lake swap.
    */
  def stream(
      docs: DataFrame,
      statePath: String,
      outPath: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, _: Long) =>
        admit(b.sparkSession, b, statePath)
          .write.mode(SaveMode.Append).parquet(outPath)
        ()
      }
      .start()
}
