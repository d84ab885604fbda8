package graft.model

import org.apache.spark.sql.types._

/** Canonical transaction row.
  *
  * Mirrors the reference's fixed 10-field schema
  * (reference: datalake/model/transaction.go:4-15). Monetary values are
  * doubles to match the reference's float64 — NOT decimal — so oracle
  * results compare byte-for-byte (SURVEY §1.3). `posting_date` is stored
  * as the already-validated `MM/dd/yyyy` STRING, exactly like the
  * reference stores the re-formatted string (datalake/datalake.go:259).
  */
case class Transaction(
    details: String,
    posting_date: String,
    description: String,
    amount: Double,
    balance: Double,
    category: String,
    txn_type: String,
    check_or_slip_num: String,
    data_source: String,
    account_id: String)

object Transaction {

  /** Composite dedup/upsert key (reference: storage/mongo_repository.go:44-50). */
  val mergeKey: Seq[String] =
    Seq("details", "posting_date", "description", "data_source", "account_id")

  /** Deterministic tie-break ordering for keep-one dedup. The reference's
    * unordered BulkWrite makes intra-batch duplicate survival
    * nondeterministic (mongo_repository.go:57); we pin a total order so
    * results are stable and oracle-checkable (SURVEY §7.4 risk 3).
    */
  val tieBreak: Seq[String] =
    Seq("amount", "balance", "category", "txn_type", "check_or_slip_num")

  val schema: StructType = StructType(Seq(
    StructField("details", StringType),
    StructField("posting_date", StringType),
    StructField("description", StringType),
    StructField("amount", DoubleType),
    StructField("balance", DoubleType),
    StructField("category", StringType),
    StructField("txn_type", StringType),
    StructField("check_or_slip_num", StringType),
    StructField("data_source", StringType),
    StructField("account_id", StringType)))
}

/** Audit row appended after each ingest batch
  * (reference: datalake/model/sync_log.go:6-10, storage/mongo_repository.go:63-71).
  */
case class SyncLog(
    collection_name: String,
    sync_timestamp: java.sql.Timestamp,
    records_uploaded: Long)

/** Per-file ingest outcome, the input of the stats aggregation
  * (reference: datalake/stats.go:9-32, datalake/client.go:51).
  */
case class FileOutcome(file: String, outcome: String, reason: String, records: Long)

/** Job-level stats report (reference: datalake/stats.go:35-44). */
case class IngestStats(
    total_files: Long,
    processed_files: Long,
    failed_files: Long,
    failures: Map[String, String])
