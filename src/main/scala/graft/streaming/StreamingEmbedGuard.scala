package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming EMBEDDING-DRIFT guard — the geometry audits (x118 dim
  * stats, x124 anisotropy) measured at the front door: each micro-batch
  * of vectors is compared against FROZEN per-dimension reference moments
  * built once from the corpus the index/classifiers were tuned on. Two
  * exact-integer signals per batch:
  *
  *  - `l1_shift_e6`: the L1 distance between the batch's mean vector and
  *    the reference's, in e6 units with the common-denominator trick
  *    (Σ_dim |S_b·n_r − S_r·n_b| div (n_b·n_r)) so no float crosses the
  *    log — an encoder swap, a normalization change, or a silent
  *    re-scale shifts the mean long before recall metrics notice;
  *  - `anis_e6`: the batch's own x124 cone-collapse score, so a
  *    geometry regression (embeddings collapsing toward a shared
  *    direction) is caught per batch, not at the next index rebuild.
  *
  * A drifting batch is an upstream model/pipeline change caught at
  * ingest — BEFORE the vectors pollute the ANN index (x13/x68), the
  * semantic dedup (x30), or the label space (x110). Pairs with
  * [[StreamingDriftGuard]], which watches the text side the same way.
  *
  * Consistency contract (spec-pinned): a batch replaying the reference
  * corpus itself measures l1_shift_e6 = 0 exactly; a uniformly shifted
  * copy measures exactly the shift; empty batches log a zero row, never
  * nulls.
  *
  * Scale posture (100 TB/day ingest): the reference is |dims| rows built
  * ONCE ([[reference]]) and checkpoint-pinned; the per-batch cost is one
  * posexplode pass over the batch into |dims| partial sums — map-side
  * combinable, mergeable, no state across batches, so recovery and
  * backpressure come free from the source's offset tracking.
  */
object StreamingEmbedGuard {

  /** Frozen per-dimension reference moments of a vector corpus:
    * (dim, r_s, r_n) — e6-quantized dim sums and the vector count. Build
    * once, persist beside the corpus snapshot it came from.
    */
  def reference(emb: DataFrame): DataFrame =
    emb
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("d0", "x")))
      .select(
        (col("d0") + 1).cast("long").as("dim"),
        floor(col("x") * lit(1e6)).cast("long").as("x_e6"))
      .groupBy("dim")
      .agg(sum("x_e6").as("r_s"), count(lit(1)).as("r_n"))

  /** One-row geometry audit of a (micro-)batch against the frozen
    * reference: (n_vecs, n_dims, min_dim_n, r_dims, l1_shift_e6, anis_e6).
    * Exact integers — decimal(38) on every cross product so corpus-scale
    * counts cannot overflow; an empty batch reports the zero row (with
    * r_dims still the reference's dim count).
    *
    * `r_dims` exists because a DIMENSION-COUNT change is invisible to
    * l1_shift_e6: a dim present in only one side contributes exactly 0 to
    * the cross term |b_s·r_n − r_s·b_n| (one factor is 0), so a truncated
    * 512-dim batch against a 768-dim reference can replay with shift 0.
    * The alert in [[stream]] therefore also fires on n_dims ≠ r_dims.
    * `min_dim_n` closes the remaining blind spot: a RAGGED batch (some
    * vectors truncated, some full-width) keeps n_dims == r_dims — every
    * dim still has SOME value — and can replay with ~0 shift, but the
    * thinnest dim's vector count drops below n_vecs, so
    * min_dim_n ≠ n_vecs is the raggedness alert.
    */
  def batchAudit(batch: DataFrame, ref: DataFrame): DataFrame = {
    val bd = batch
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("d0", "x")))
      .select(
        (col("d0") + 1).cast("long").as("dim"),
        floor(col("x") * lit(1e6)).cast("long").as("x_e6"))
      .groupBy("dim")
      .agg(
        sum("x_e6").as("b_s"),
        sum(expr("cast(x_e6 as decimal(38,0)) * x_e6")).as("b_t"),
        count(lit(1)).as("b_n"))
      .localCheckpoint() // feeds the shift and anisotropy legs in one pass
    val shift = bd.join(ref, Seq("dim"), "full_outer")
      .na.fill(0L, Seq("b_s", "b_n", "r_s", "r_n"))
      .agg(
        coalesce(max("b_n"), lit(0L)).as("n_vecs"),
        coalesce(sum(when(col("b_n") > 0L, 1L).otherwise(0L)), lit(0L)).as("n_dims"),
        // RAGGED batches (a partially dim-truncated encoder swap: some
        // vectors truncated, others full-width) keep n_dims == r_dims and
        // can replay with ~0 shift — the thinnest dim's vector count is
        // the signal: min_dim_n < n_vecs iff some dim is missing from
        // some vector.
        coalesce(min(when(col("b_n") > 0L, col("b_n"))), lit(0L)).as("min_dim_n"),
        coalesce(sum(when(col("r_n") > 0L, 1L).otherwise(0L)), lit(0L)).as("r_dims"),
        coalesce(
          sum(expr("abs(cast(b_s as decimal(38,0)) * r_n - cast(r_s as decimal(38,0)) * b_n)")),
          lit(0L).cast("decimal(38,0)")).as("sum_abs"),
        coalesce(max("r_n"), lit(0L)).as("r_n"))
      .withColumn("l1_shift_e6",
        expr("CASE WHEN n_vecs = 0 OR r_n = 0 THEN 0 ELSE " +
          "cast(sum_abs div (cast(n_vecs as decimal(38,0)) * r_n) as bigint) END"))
    val anis = bd.agg(
        coalesce(sum(expr("cast(b_s as decimal(38,0)) * b_s")), lit(0L)).as("a"),
        coalesce(sum("b_t"), lit(0L)).as("bb"),
        coalesce(max("b_n"), lit(0L)).as("nv"))
      .withColumn("anis_e6",
        expr("CASE WHEN nv = 0 OR bb = 0 THEN 0 ELSE " +
          "(cast(1000000 as decimal(38,0)) * a) div (cast(nv as decimal(38,0)) * bb) END"))
      .select("anis_e6")
    shift.crossJoin(anis)
      .select("n_vecs", "n_dims", "min_dim_n", "r_dims", "l1_shift_e6", "anis_e6")
  }

  /** Continuous form: audit every micro-batch of a streaming vector
    * source against the frozen reference, appending one geometry row per
    * batch (with batch_id and the alert flag) to `auditPath`.
    */
  def stream(
      emb: DataFrame,
      ref: DataFrame,
      auditPath: String,
      checkpointDir: String,
      alertL1E6: Long): StreamingQuery = {
    // Pin the reference ONCE — without this every micro-batch would
    // re-evaluate its lineage (re-scanning the corpus it came from).
    val refPinned = ref.localCheckpoint()
    emb.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        batchAudit(b, refPinned)
          .withColumn("batch_id", lit(batchId))
          // dim-count mismatch (encoder truncation/expansion) contributes
          // 0 to l1_shift by construction — alert on it directly. A RAGGED
          // batch (only SOME vectors truncated) keeps n_dims == r_dims;
          // min_dim_n < n_vecs catches that shape.
          .withColumn("alert",
            col("l1_shift_e6") >= alertL1E6 ||
              (col("n_vecs") > 0L && (col("n_dims") =!= col("r_dims") ||
                col("min_dim_n") =!= col("n_vecs"))))
          .write.mode(SaveMode.Append).parquet(auditPath)
        ()
      }
      .start()
  }
}
