package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, graftnative}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.xscale.DataPrep

/** Streaming eval-leak GUARD — x86's quarantine rule enforced at ingest
  * time: candidate eval docs arrive as a stream and each micro-batch is
  * checked against a STATIC table of train k-token window hashes; docs
  * carrying any train window are quarantined before they can enter an
  * eval split. Batch x73 measures the leak, batch x86 repairs it after
  * the fact; this is the front door that keeps it from recurring as the
  * eval sets grow.
  *
  * The train side is a frozen parquet table of distinct 8-byte hashes
  * (built once by [[trainWindowTable]] after each train refresh), so the
  * per-batch work is one stream-static join keyed on the hash —
  * O(batch windows), never O(batch x train). Scale posture (100 TB
  * train): the window table is ~distinct train windows x 8 bytes; write
  * it bucketed by hash so the join co-locates, or swap in x17's Bloom
  * admit when exact membership stops being worth the storage (false
  * positives over-quarantine — the safe direction for an eval guard).
  */
object StreamingLeakGuard {

  /** Distinct k-token window hashes of the train split — the static side.
    * Persist once per train refresh; pass the path to [[stream]].
    */
  def trainWindowTable(docs: DataFrame, k: Int = DataPrep.SubstrK): DataFrame =
    docs
      .select(explode(graftnative.api.windowHash60(col("text"), k)).as("h"))
      .distinct()

  /** Score one (micro-)batch of candidate eval docs against the train
    * window set: adds (n_win, n_leaked, quarantined). Docs shorter than
    * k tokens carry no windows, cannot leak, and pass — the x86 rule.
    */
  def score(batch: DataFrame, trainWindows: DataFrame, k: Int = DataPrep.SubstrK): DataFrame = {
    val tr = trainWindows.select(col("h")).distinct().withColumn("_t", lit(1L))
    val perDoc = batch
      .select(col("doc_id"), explode(graftnative.api.windowHash60(col("text"), k)).as("h"))
      .join(tr, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_win"),
        sum(coalesce(col("_t"), lit(0L))).as("n_leaked"))
    batch
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_win", "n_leaked"))
      .withColumn("quarantined", col("n_leaked") > 0)
  }

  /** Continuous form: guard every micro-batch of a streaming `docs`
    * source against the frozen window table at `trainPath`, appending
    * clean docs to `outPath` and quarantined ones (with their leak
    * counts) to `quarantinePath`. The two appends are separate writes —
    * exactly-once across both needs a transactional table format, the
    * same caveat as [[StreamingDedup.stream]].
    */
  def stream(
      docs: DataFrame,
      trainPath: String,
      outPath: String,
      quarantinePath: String,
      checkpointDir: String,
      k: Int = DataPrep.SubstrK): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val scored = score(b, b.sparkSession.read.parquet(trainPath), k).localCheckpoint()
        scored.filter(!col("quarantined")).drop("n_win", "n_leaked", "quarantined")
          .write.mode(SaveMode.Append).parquet(outPath)
        scored.filter(col("quarantined"))
          .write.mode(SaveMode.Append).parquet(quarantinePath)
        ()
      }
      .start()
}
