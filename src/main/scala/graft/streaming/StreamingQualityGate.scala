package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.xscale.TextAnalysis

/** Streaming QUALITY GATE — the x09/x100 filter applied at the front
  * door: docs arrive as a stream, each micro-batch is scored with the
  * same per-doc quality expression the batch operators use
  * ([[TextAnalysis.qualityPerDoc]]'s score_e4), admitted docs flow to the
  * corpus, rejects to a reject store WITH their scores, and a per-batch
  * stats row (admitted/rejected docs + token mass, threshold) is appended
  * to an audit log. The audit log is what makes the gate operable: an
  * operator watches admit-rate drift per batch exactly like x100's curve,
  * and a threshold change is a config push, not a code change.
  *
  * Consistency contract (spec-pinned): the gate admits EXACTLY the docs
  * the batch filter `score_e4 >= minScoreE4` admits — streaming vs batch
  * parity, the same standard as StreamingDedup/StreamingNovelty.
  *
  * Scale posture (100 TB/day ingest): scoring is a pure per-row
  * expression (no shuffle, no state); the only aggregation is the
  * per-batch stats rollup (one row per batch). The gate is stateless
  * across batches, so it scales by partition count alone — backpressure
  * and recovery come free from the source's offset tracking.
  */
object StreamingQualityGate {

  /** Score one micro-batch (needs text + n_chars — the x09 input
    * contract): adds n_tok + score_e4 + admitted. Scoring is attached as
    * per-row columns, NOT a join back on doc_id — a join would both add a
    * shuffle and multiply rows if an at-least-once source replayed a doc
    * into one batch (two copies of doc 7 would join into four output
    * rows, double-writing the corpus and inflating the stats).
    */
  def score(batch: DataFrame, minScoreE4: Long): DataFrame =
    TextAnalysis.qualityScored(batch)
      .withColumn("admitted", col("score_e4") >= minScoreE4)

  /** Continuous form: gate every micro-batch of a streaming `docs`
    * source, appending admitted docs to `outPath`, rejects (with scores)
    * to `rejectPath`, and one stats row per batch to `statsPath`.
    * Separate appends — exactly-once across all three needs a
    * transactional table format, the same caveat as
    * [[StreamingDedup.stream]].
    */
  def stream(
      docs: DataFrame,
      outPath: String,
      rejectPath: String,
      statsPath: String,
      checkpointDir: String,
      minScoreE4: Long): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val scored = score(b, minScoreE4).localCheckpoint()
        scored.filter(col("admitted"))
          .drop("n_tok", "score_e4", "admitted")
          .write.mode(SaveMode.Append).parquet(outPath)
        scored.filter(!col("admitted"))
          .write.mode(SaveMode.Append).parquet(rejectPath)
        // coalesce the sums: an EMPTY micro-batch (empty input file) must
        // log (0, 0, 0, 0), not NULLs that break typed readers of the log
        scored
          .groupBy()
          .agg(
            count(lit(1)).as("n_docs"),
            coalesce(sum(when(col("admitted"), 1L).otherwise(0L)), lit(0L))
              .as("n_admitted"),
            coalesce(sum(when(col("admitted"), col("n_tok")).otherwise(0L)), lit(0L))
              .as("tok_admitted"),
            coalesce(sum(when(!col("admitted"), col("n_tok")).otherwise(0L)), lit(0L))
              .as("tok_rejected"))
          .withColumn("batch_id", lit(batchId))
          .withColumn("min_score_e4", lit(minScoreE4))
          .write.mode(SaveMode.Append).parquet(statsPath)
        ()
      }
      .start()
}
