package graft.transform

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Golden-row tests mirroring the reference's inline fixtures
  * (csv/csv_test.go:24-95, datalake/datalake_test.go:57-155), exercising the
  * skip-vs-default semantics of SURVEY §2.2 P4-P10.
  */
class CanonicalizeSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.types._

  private val rawSchema = StructType(
    Seq("details", "posting date", "description", "category", "amount", "type",
      "balance", "check or slip #", "_file", "data_source", "account_id")
      .map(StructField(_, StringType)))

  private def raw(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, rawSchema)

  private def mkRow(
      details: String = "DEBIT",
      postingDate: String = "01/01/2024",
      description: String = "WHOLEFDS HAR 102 230 B OAKLAND CA    211023  01/31",
      category: String = "Shopping",
      amount: String = "-75.77",
      typ: String = "DEBIT_CARD",
      balance: String = "11190.76",
      slip: String = ""): Row =
    Row(details, postingDate, description, category, amount, typ, balance, slip,
      "generic_valid.csv", "generic", "1234")

  test("valid row maps field-by-field (csv_test.go golden row 1)") {
    val (valid, rejected) = Canonicalize.split(spark, raw(Seq(mkRow())))
    assert(rejected.count() === 0)
    val r = valid.drop("_file").collect()
    assert(r.length === 1)
    assert(r(0) === Row("DEBIT", "01/01/2024",
      "WHOLEFDS HAR 102 230 B OAKLAND CA    211023  01/31",
      -75.77, 11190.76, "Shopping", "DEBIT_CARD", "", "generic", "1234"))
  }

  test("'Post Date' header synonym is coalesced (datalake.go:184-189)") {
    val schema = StructType(
      Seq("details", "post date", "description", "amount", "_file",
        "data_source", "account_id").map(StructField(_, StringType)))
    val df = spark.createDataFrame(
      Seq(Row("DEBIT", "01/31/2023", "X", "-1.00", "f.csv", "generic", "1234")).asJava,
      schema)
    val (valid, _) = Canonicalize.split(spark, df)
    assert(valid.select("posting_date").collect().map(_.getString(0)).toSeq === Seq("01/31/2023"))
  }

  test("empty posting date drops the row (P5, datalake.go:218-222)") {
    val (valid, rejected) = Canonicalize.split(spark, raw(Seq(mkRow(postingDate = ""))))
    assert(valid.count() === 0)
    assert(rejected.select("reason").collect().map(_.getString(0)).toSeq ===
      Seq("missing posting date"))
  }

  test("unparseable posting date drops the row (P6, datalake.go:224-233)") {
    val bad = Seq(mkRow(postingDate = "not-a-date"), mkRow(postingDate = "02/30/2024"))
    val (valid, rejected) = Canonicalize.split(spark, raw(bad))
    assert(valid.count() === 0)
    assert(rejected.count() === 2)
  }

  test("unparseable amount drops the row (P7, datalake.go:235-240)") {
    val (valid, rejected) = Canonicalize.split(spark, raw(Seq(mkRow(amount = "abc"), mkRow(amount = ""))))
    assert(valid.count() === 0)
    assert(rejected.select("reason").distinct().collect().map(_.getString(0)).toSeq ===
      Seq("invalid amount"))
  }

  test("unparseable balance KEEPS the row with 0.0 — asymmetric with amount (P8, datalake.go:242-255)") {
    val (valid, _) = Canonicalize.split(spark, raw(Seq(mkRow(balance = "notanumber"))))
    val r = valid.select("balance", "amount").collect()
    assert(r.map(x => (x.getDouble(0), x.getDouble(1))).toSeq === Seq((0.0, -75.77)))
  }

  test("absent canonical columns become empty strings (safeGet, csv/csv.go:103-109)") {
    val schema = StructType(
      Seq("posting date", "amount", "_file", "data_source", "account_id")
        .map(StructField(_, StringType)))
    val df = spark.createDataFrame(
      Seq(Row("01/01/2024", "1.5", "f.csv", "generic", "1234")).asJava, schema)
    val (valid, _) = Canonicalize.split(spark, df)
    val r = valid.select("details", "description", "category", "txn_type", "check_or_slip_num")
      .collect()(0)
    assert(r === Row("", "", "", "", ""))
    assert(valid.select("balance").collect()(0).getDouble(0) === 0.0)
  }

  test("date round-trips as the same MM/dd/yyyy string (datalake.go:259)") {
    val (valid, _) = Canonicalize.split(spark, raw(Seq(mkRow(postingDate = "09/05/2024"))))
    assert(valid.select("posting_date").collect()(0).getString(0) === "09/05/2024")
  }

  test("mixed batch splits correctly and keeps _file lineage") {
    val rows = Seq(
      mkRow(),
      mkRow(postingDate = "bad"),
      mkRow(amount = "x"),
      mkRow(balance = "x"))
    val (valid, rejected) = Canonicalize.split(spark, raw(rows))
    assert(valid.count() === 2)
    assert(rejected.count() === 2)
    assert(valid.columns.contains("_file"))
    assert(valid.select("_file").distinct().collect()(0).getString(0) === "generic_valid.csv")
  }
}
