package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Transaction

/** Bucketed variant of the lake for shuffle-free merges at scale.
  *
  * The plain parquet lake (`Lake.upsertIntoLake`) must shuffle BOTH sides of
  * the merge anti-join on the composite key. At 100 TB the existing side
  * dominates: re-shuffling the whole lake to absorb a small batch is the
  * bottleneck. Bucketing the lake table by the merge key
  * (`bucketBy(n, details, posting_date, ...)`) records the hash-partitioned
  * layout in the catalog, so Catalyst plans the anti-join with ZERO exchange
  * on the lake side — only the incoming batch (small) shuffles to the bucket
  * count. This is the parquet-native stand-in for what a real deployment
  * would get from Delta/Iceberg MERGE with clustering; the reference's
  * analog is Mongo's key-indexed upsert (storage/mongo_repository.go:44-52),
  * which also avoids scanning the collection.
  *
  * Trade-off: bucketed writes go through the session catalog
  * (`saveAsTable`), and rewriting the table still costs one pass over
  * matched partitions' data — at real scale pair this with `data_source`/
  * date partitioning so only touched partitions rewrite.
  */
object BucketedLake {

  /** Number of buckets. At 100 TB size so one bucket ≈ a few GB:
    * buckets ≈ lake_bytes / 4 GB; 32 keeps local tests aligned with
    * local[32].
    */
  val defaultBuckets = 32

  /** Create/replace the bucketed lake table from a batch. */
  def create(
      spark: SparkSession,
      table: String,
      batch: DataFrame,
      buckets: Int = defaultBuckets): Unit =
    Lake.dedupKeepFirst(batch, Transaction.mergeKey, Transaction.tieBreak)
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, Transaction.mergeKey.head, Transaction.mergeKey.tail: _*)
      .sortBy(Transaction.mergeKey.head, Transaction.mergeKey.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Merge a batch into the bucketed table. The anti-join reads the lake
    * side bucket-aligned (no Exchange on it — see BucketedLakeSpec's plan
    * assertion); the union preserves the bucket layout via the rewrite.
    */
  def upsert(
      spark: SparkSession,
      table: String,
      batch: DataFrame,
      buckets: Int = defaultBuckets): Long = {
    if (!spark.catalog.tableExists(table)) {
      create(spark, table, batch, buckets)
      return spark.table(table).count()
    }
    val merged = Lake.merge(spark.table(table), batch)
    // Self-referential overwrite: stage through a swap table, then replace.
    // (Delta would MERGE in place; with catalog parquet tables the swap is
    // a metadata rename away from atomic.)
    val swap = table + "_swap"
    merged.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, Transaction.mergeKey.head, Transaction.mergeKey.tail: _*)
      .sortBy(Transaction.mergeKey.head, Transaction.mergeKey.tail: _*)
      .format("parquet")
      .saveAsTable(swap)
    val n = spark.table(swap).count()
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"ALTER TABLE $swap RENAME TO $table")
    n
  }

  /** The merge anti-join plan against the bucketed lake, exposed for plan
    * inspection/tests: existing-side Scan must carry `Bucketed: true` and
    * sit under no Exchange.
    */
  def mergePlan(spark: SparkSession, table: String, batch: DataFrame): DataFrame =
    Lake.merge(spark.table(table), batch)
}
