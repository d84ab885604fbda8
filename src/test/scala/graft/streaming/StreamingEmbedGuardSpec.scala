package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming embedding-drift guard: exact shift pins (reference replay =
  * 0; a uniformly shifted copy = exactly the shift), batch anisotropy,
  * empty-batch zero row, and the continuous form's per-batch log with the
  * alert flag + streaming/batch parity.
  */
class StreamingEmbedGuardSpec extends SparkSpec {
  import spark.implicits._

  private def refEmb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding")

  /** Every element shifted by +0.25: the mean moves by exactly 0.25 per
    * dim, so l1_shift_e6 = dims · 250000 exactly (floors land on exact
    * quarters).
    */
  private def shifted = refEmb.select(
    col("vec_id"),
    expr("transform(embedding, x -> CAST(x + 0.25 AS FLOAT))").as("embedding"))

  test("reference replay shifts 0; a +0.25 uniform shift scores dims*250000 exactly") {
    val ref = StreamingEmbedGuard.reference(refEmb).localCheckpoint()
    val dims = refEmb.select(size(col("embedding"))).as[Int].head()
    val same = StreamingEmbedGuard.batchAudit(refEmb, ref)
      .select("n_vecs", "n_dims", "l1_shift_e6", "anis_e6")
      .as[(Long, Long, Long, Long)].head()
    assert(same._1 == refEmb.count() && same._2 == dims)
    assert(same._3 == 0L, s"replay must shift 0: $same")
    assert(same._4 >= 0L && same._4 <= 1000000L)
    // the replay's anisotropy equals the x124 overall row on the same vecs
    val x124 = graft.xscale.Similarity.anisotropy(
      refEmb.withColumn("label", lit(0)))
      .filter(col("label") === -1L).select("anis_e6").as[Long].head()
    assert(same._4 == x124, "batch anisotropy == x124 overall")
    val moved = StreamingEmbedGuard.batchAudit(shifted, ref)
      .select("l1_shift_e6").as[Long].head()
    // floor(x*1e6 + 250000) = floor(x*1e6) + 250000 exactly (integer offset),
    // so each dim's mean moves by exactly 250000 e6-units
    assert(moved == dims * 250000L, s"uniform shift must measure exactly: $moved")
    // empty batch: zero row, not nulls
    val empty = StreamingEmbedGuard.batchAudit(refEmb.limit(0), ref)
      .select("n_vecs", "n_dims", "l1_shift_e6", "anis_e6")
      .as[(Long, Long, Long, Long)].head()
    assert(empty == ((0L, 0L, 0L, 0L)))
  }

  test("a dim-truncated batch replays with shift 0 but n_dims < r_dims exposes it") {
    val ref = StreamingEmbedGuard.reference(refEmb).localCheckpoint()
    val dims = refEmb.select(size(col("embedding"))).as[Int].head()
    // an encoder swap that truncates to half the dims: every surviving dim
    // replays the reference exactly, so l1_shift_e6 = 0 by construction —
    // only the r_dims column reveals the mismatch
    val truncated = refEmb.select(
      col("vec_id"), slice(col("embedding"), 1, dims / 2).as("embedding"))
    val row = StreamingEmbedGuard.batchAudit(truncated, ref)
      .select("n_dims", "r_dims", "l1_shift_e6")
      .as[(Long, Long, Long)].head()
    assert(row._3 == 0L, s"missing dims contribute 0 to shift by construction: $row")
    assert(row._1 == dims / 2 && row._2 == dims, s"dim mismatch must be visible: $row")
  }

  test("a RAGGED batch (only some vectors truncated) alerts via min_dim_n") {
    val ref = StreamingEmbedGuard.reference(refEmb).localCheckpoint()
    val dims = refEmb.select(size(col("embedding"))).as[Int].head()
    // half the vectors truncated to half-width, half full-width: every dim
    // still carries SOME value, so n_dims == r_dims and the uniform-
    // truncation alert is blind — min_dim_n < n_vecs is the only signal
    val ragged = refEmb.select(
      col("vec_id"),
      when(col("vec_id") % 2 === 0, slice(col("embedding"), 1, dims / 2))
        .otherwise(col("embedding")).as("embedding"))
    val row = StreamingEmbedGuard.batchAudit(ragged, ref)
      .select("n_vecs", "n_dims", "min_dim_n", "r_dims")
      .as[(Long, Long, Long, Long)].head()
    assert(row._2 == dims && row._4 == dims, s"raggedness hides from n_dims: $row")
    assert(row._3 < row._1, s"min_dim_n must expose the ragged batch: $row")
    // a full-width replay keeps min_dim_n == n_vecs (no false alert)
    val clean = StreamingEmbedGuard.batchAudit(refEmb, ref)
      .select("n_vecs", "min_dim_n").as[(Long, Long)].head()
    assert(clean._1 == clean._2)
  }

  test("continuous form: one row per batch, alert fires on the shifted batch only") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("embedGuard")
    val auditPath = new java.io.File(dir, "audit").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath

    val ref = StreamingEmbedGuard.reference(refEmb).localCheckpoint()
    val clean = refEmb.as[(Long, Seq[Float])].collect()
    val dirty = shifted.as[(Long, Seq[Float])].collect()

    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingEmbedGuard.stream(
      in.toDF().toDF("vec_id", "embedding"), ref, auditPath, ckpt,
      alertL1E6 = 1000000L)
    in.addData(clean.toIndexedSeq)
    q.processAllAvailable()
    in.addData(dirty.toIndexedSeq)
    q.processAllAvailable()
    // a dim-truncated batch: shift 0 by construction, alert via r_dims
    in.addData(clean.map { case (id, v) => (id, v.take(v.length / 2)) }.toIndexedSeq)
    q.processAllAvailable()
    // a RAGGED batch (only even ids truncated): n_dims == r_dims, alert
    // fires via min_dim_n != n_vecs
    in.addData(clean.map { case (id, v) =>
      (id, if (id % 2 == 0) v.take(v.length / 2) else v)
    }.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    val log = spark.read.parquet(auditPath)
      .select("batch_id", "n_vecs", "l1_shift_e6", "alert")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(log.length == 4)
    assert(log(0)._2 == clean.length && log(1)._2 == dirty.length)
    assert(!log(0)._4 && log(0)._3 == 0L)
    assert(log(1)._4 && log(1)._3 >= 1000000L)
    assert(log(2)._4 && log(2)._3 == 0L, s"dim mismatch must alert despite zero shift: ${log(2)}")
    assert(log(3)._4, s"ragged batch must alert via min_dim_n: ${log(3)}")
    // streaming/batch parity: the logged row == the batch-side audit
    val batchSide = StreamingEmbedGuard.batchAudit(
      dirty.toSeq.toDF("vec_id", "embedding"), ref)
      .select("l1_shift_e6").as[Long].head()
    assert(batchSide == log(1)._3)
  }
}
