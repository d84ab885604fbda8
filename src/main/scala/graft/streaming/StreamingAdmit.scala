package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.xscale.{Dedup, DedupClusters}

/** Streaming ADMISSION — x74's four-status decision rule (plus the strict
  * intra-batch near-dup refinement) as a continuous ingest path: each
  * micro-batch is classified against the persisted dedup-state sidecar
  * (doc_id, 60-bit exact key, K-minhash sig — [[Dedup.dedupSignatures]]),
  * admitted docs flow to the output, their signatures append to the state,
  * and the per-batch status report (x74's hash-verified row shape) appends
  * to an audit table. The batch twin is `Cli admit --sigs --strict`; the
  * state AND the decision rule are byte-identical (spec-pinned by a
  * cross-surface parity test), so a pipeline can admit continuously during
  * the day and reconcile with the batch verb at night
  * ([[Dedup.compactSignatures]]) without changing currencies.
  *
  * Why foreachBatch + explicit parquet state rather than the keyed state
  * store: the near-dup decision is an OR across 4 LSH band buckets per doc
  * (a doc's near-dups land in DIFFERENT buckets), which
  * `[flat]MapGroupsWithState` (one key per row) can't express — the same
  * argument as [[StreamingDedup]], whose simhash state this generalizes to
  * the full admission rule.
  *
  * Scale posture (100 TB): state carries ~144 bytes/doc and is only ever
  * read two ways — an 8-byte key projection (exact leg) and a banded sig
  * join whose batch side is broadcast (near leg); the corpus TEXT is never
  * touched. Per micro-batch the decision is O(batch + candidates); the
  * state append is admitted-docs-only. Same multi-write caveat as the
  * lake swap: report, state and out appends are separate writes, so a
  * replayed batch can duplicate report rows (detectable by batch_id) —
  * exactly-once across all three needs a transactional table format
  * underneath.
  */
object StreamingAdmit {

  /** Classify one (micro-)batch against the signature state at `statePath`
    * and return the admitted rows (original columns); appends the admitted
    * docs' signatures to the state and, when `reportPath` is set, the
    * per-status (batch_id, status, n_docs, checksum) report rows. Doc ids
    * must be globally unique across the stream (they key the state).
    */
  def admit(
      spark: SparkSession,
      batch: DataFrame,
      statePath: String,
      strict: Boolean = true,
      reportPath: Option[String] = None,
      batchId: Long = 0L,
      checkpointDir: Option[String] = None): DataFrame = {
    val sPath = new org.apache.hadoop.fs.Path(statePath)
    val fs = sPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the two cuts are batch-sized; route through DedupClusters.ckpt so a
    // real cluster can make them storage-backed (the x30/x50 pattern) —
    // the default localCheckpoint recomputes on executor loss, which for
    // the st cut would re-read a state dir the append below has advanced
    val batchSigs = DedupClusters.ckpt(Dedup.dedupSignatures(batch), checkpointDir)
    val stateSigs =
      if (fs.exists(sPath)) spark.read.parquet(statePath)
      else batchSigs.limit(0)
    val st0 = Dedup.incrementalDedupSigs(stateSigs, batchSigs)
    // eager cut BEFORE the state append: the lazy plan reads the state
    // dir, and appending to it first would make recomputation see new files
    val st = DedupClusters.ckpt(
      if (strict) Dedup.admitStrict(st0, batchSigs, checkpointDir = checkpointDir) else st0,
      checkpointDir)
    reportPath.foreach { p =>
      st.groupBy("status")
        .agg(count(lit(1)).as("n_docs"), expr("bit_xor(key)").as("checksum"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "status", "n_docs", "checksum")
        .write.mode(SaveMode.Append).parquet(p)
    }
    val admittedIds = st.filter(col("status") === "admitted").select("doc_id")
    batchSigs.join(admittedIds, "doc_id")
      .write.mode(SaveMode.Append).parquet(statePath)
    batch.join(admittedIds, "doc_id")
  }

  /** Continuous form: admit every micro-batch of a streaming `docs` source,
    * appending admitted rows to `outPath` (and per-batch reports beside the
    * state when `reportPath` is set).
    */
  def stream(
      docs: DataFrame,
      statePath: String,
      outPath: String,
      checkpointDir: String,
      strict: Boolean = true,
      reportPath: Option[String] = None,
      stageCkptDir: Option[String] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        admit(b.sparkSession, b, statePath, strict, reportPath, id, stageCkptDir)
          .write.mode(SaveMode.Append).parquet(outPath)
        ()
      }
      .start()
}
