package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL document ingest — the arrival format of most web-scale text
  * corpora (one JSON object per line, usually .jsonl or .jsonl.gz shards).
  * Complements [[CsvIngest]] (the reference's own surface) on the corpus
  * side of the house: schema-enforced read, malformed-line quarantine, and
  * normalization into the `documents` shape the xscale operators consume.
  *
  * Scale posture (100 TB): `spark.read.schema(...).json` is ONE
  * distributed scan over every shard — gzip shards are each a single task
  * (gzip is not splittable; corpora ship thousands of shards so
  * parallelism comes from shard COUNT, the standard layout), zstd/plain
  * shards split by range. Schema enforcement at read time (no inference
  * pass — inference would double-scan the corpus); malformed lines land in
  * a corrupt-record column instead of failing the job, the per-file fault
  * isolation posture of the CSV path at line granularity.
  */
object JsonlIngest {

  /** The documents-table arrival schema. `_corrupt` holds the raw line of
    * any record that failed to parse (PERMISSIVE mode).
    */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("lang", StringType),
    StructField("text", StringType),
    StructField("_corrupt", StringType)))

  /** Raw read: good rows carry nulls in `_corrupt`; malformed lines carry
    * the offending text there and nulls elsewhere.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Ingest result: normalized good documents + quarantined raw lines.
    * A row is GOOD iff it parsed AND carries the required fields
    * (doc_id, text non-null, text non-empty after trim); everything else
    * is quarantined with a reason. Normalization mirrors the canonical
    * documents shape: trimmed text, lowercased lang/source, derived
    * n_chars.
    */
  def ingest(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val raw = read(spark, path)
    // one scan feeds both branches: quarantine reasons are per-row
    // expressions, so the split is two filters over the same frame
    val reasoned = raw.withColumn(
      "_reason",
      when(col("_corrupt").isNotNull, "malformed_json")
        .when(col("doc_id").isNull, "missing_doc_id")
        .when(col("text").isNull || trim(col("text")) === "", "empty_text"))
    val good = reasoned.filter(col("_reason").isNull)
      .select(
        col("doc_id"),
        coalesce(lower(trim(col("source"))), lit("unknown")).as("source"),
        coalesce(lower(trim(col("lang"))), lit("und")).as("lang"),
        trim(col("text")).as("text"))
      // n_chars matches the canonical documents schema; n_tok deliberately
      // does NOT ride along — the schema doesn't carry it, and downstream
      // stages (packing, despan) derive token counts from the text they
      // actually see, so an input-carried count could only go stale
      .withColumn("n_chars", length(col("text")).cast("long"))
    val quarantined = reasoned.filter(col("_reason").isNotNull)
      .select(col("_reason").as("reason"), coalesce(col("_corrupt"),
        to_json(struct(col("doc_id"), col("source"), col("lang"), col("text")))).as("raw"))
    (good, quarantined)
  }

  /** Ingest stats as one JSON-able row: (n_good, n_quarantined, reasons). */
  def stats(good: DataFrame, quarantined: DataFrame): (Long, Long, Map[String, Long]) = {
    val reasons = quarantined.groupBy("reason").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (good.count(), reasons.values.sum, reasons)
  }
}
