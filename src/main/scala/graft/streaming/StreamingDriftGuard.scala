package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.xscale.{XHash, XText}

/** Streaming DISTRIBUTION-DRIFT guard — x115's divergence measured at the
  * front door: each micro-batch's unigram distribution is compared (exact
  * total-variation distance, the same no-float fixed point as x115)
  * against a FROZEN reference vocabulary built from the corpus the models
  * were trained/validated on. A batch whose TV jumps is an upstream
  * change — a crawler picked up a new domain, an extractor broke, a
  * source switched language — caught at ingest, before it pollutes the
  * lake. The per-batch row also reports the out-of-vocabulary mass
  * (terms and tokens the reference has never seen), the leading
  * indicator of template/spam injection.
  *
  * Consistency contract (spec-pinned): a batch replaying the reference
  * corpus itself measures TV = 0 exactly, and a batch with a disjoint
  * vocabulary measures TV = 1e6 exactly — the same bounds x115 pins.
  *
  * Scale posture (100 TB/day ingest): the reference is vocabulary-sized
  * (term-hash → count, built ONCE by [[reference]]), so the per-batch
  * cost is one tokenize+hash pass over the batch, a vocabulary-keyed
  * LEFT join, and a one-row rollup. No state across batches — the
  * reference is read-only, so recovery and backpressure come free from
  * the source's offset tracking, and refreshing the reference is a config
  * push (point at a new snapshot), not a code change.
  */
object StreamingDriftGuard {

  /** Frozen reference vocabulary of a batch corpus: (h, r_cnt) term-hash
    * counts. Build once, persist next to the corpus snapshot it came
    * from; pass its token total (`sum(r_cnt)`) to [[stream]] so batches
    * never re-aggregate it.
    */
  def reference(docs: DataFrame): DataFrame =
    docs.select(explode(XText.words(col("text"))).as("w"))
      .select(XHash.h60(col("w")).as("h"))
      .groupBy("h")
      .agg(count(lit(1)).as("r_cnt"))

  /** One-row drift audit of a (micro-)batch against the frozen reference:
    * (n_docs, n_tokens, n_terms, n_new_terms, new_tok, tv_e6). Exact
    * rational TV with absent-term mass folded in closed form, x115-style:
    * TV_e6 = (1e6 · (Σ_{h∈batch}|b_h·N_ref − r_h·n_b| + n_b·(N_ref − Σ_{h∈batch}r_h)))
    *         div (2·n_b·N_ref).
    * Empty batches report a zero row, never nulls (typed log readers).
    */
  def batchDrift(batch: DataFrame, ref: DataFrame, nRef: Long): DataFrame = {
    val b = batch.select(explode(XText.words(col("text"))).as("w"))
      .select(XHash.h60(col("w")).as("h"))
      .groupBy("h")
      .agg(count(lit(1)).as("b_cnt"))
      .localCheckpoint()
    val bTot = b.agg(coalesce(sum("b_cnt"), lit(0L)).as("n_b"))
    val nDocs = batch.agg(count(lit(1)).as("n_docs"))
    b.join(ref, Seq("h"), "left")
      .na.fill(0L, Seq("r_cnt"))
      .crossJoin(broadcast(bTot))
      .groupBy()
      .agg(
        coalesce(first("n_b"), lit(0L)).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        coalesce(sum(when(col("r_cnt") === 0L, 1L).otherwise(0L)), lit(0L))
          .as("n_new_terms"),
        coalesce(sum(when(col("r_cnt") === 0L, col("b_cnt")).otherwise(0L)), lit(0L))
          .as("new_tok"),
        coalesce(sum(abs(col("b_cnt") * lit(nRef) - col("r_cnt") * col("n_b"))), lit(0L))
          .as("sum_present"),
        coalesce(sum("r_cnt"), lit(0L)).as("r_present"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tv_e6",
        when(col("n_tokens") > 0L && lit(nRef) > 0L,
          expr(s"(1000000 * (sum_present + n_tokens * ($nRef - r_present))) " +
            s"div (2 * n_tokens * $nRef)"))
          .otherwise(lit(0L)))
      .select("n_docs", "n_tokens", "n_terms", "n_new_terms", "new_tok", "tv_e6")
  }

  /** Continuous form: audit every micro-batch of a streaming `docs`
    * source against the frozen reference, appending one drift row per
    * batch (with batch_id and the alert flag) to `driftPath`. The
    * reference token total is computed ONCE here, not per batch.
    */
  def stream(
      docs: DataFrame,
      ref: DataFrame,
      driftPath: String,
      checkpointDir: String,
      alertTvE6: Long): StreamingQuery = {
    // Pin the reference ONCE: without this, every micro-batch would
    // re-evaluate ref's lineage (re-scanning the corpus it was built
    // from) — the "built once, vocabulary-sized" contract enforced, not
    // just documented.
    val refPinned = ref.localCheckpoint()
    val nRef = refPinned.agg(coalesce(sum("r_cnt"), lit(0L)).as("t"))
      .collect()(0).getLong(0)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        batchDrift(b, refPinned, nRef)
          .withColumn("batch_id", lit(batchId))
          .withColumn("alert", col("tv_e6") >= alertTvE6)
          .write.mode(SaveMode.Append).parquet(driftPath)
        ()
      }
      .start()
  }
}
