package graft.source

import graft.SparkSpec

/** Synthetic generator ranges/constants (reference synthetic/data.go:16-63)
  * and the CSV sink shape (data.go:108-160).
  */
class SyntheticSpec extends SparkSpec {

  test("generated rows respect the reference's constants and value ranges") {
    val df = Synthetic.transactions(spark, 200).cache()
    assert(df.count() === 200)
    val rows = df.collect()
    for (r <- rows) {
      assert(r.getAs[String]("details") === "SALE")
      assert(r.getAs[String]("txn_type") === "DEBIT")
      assert(r.getAs[String]("category") === "synthetic")
      assert(r.getAs[String]("data_source") === "synthetic")
      val amount = r.getAs[Double]("amount")
      assert(amount >= 0.0 && amount < 1000.0)
      val balance = r.getAs[Double]("balance")
      assert(balance >= 0.0 && balance < 10000.0)
      val acct = r.getAs[String]("account_id")
      assert(acct.length === 4 && acct.forall(_.isDigit)) // %04d, data.go:48
      assert(r.getAs[String]("posting_date").matches("\\d{2}/\\d{2}/\\d{4}"))
    }
    df.unpersist()
  }

  test("deterministic variant is reproducible") {
    val a = Synthetic.transactionsDeterministic(spark, 50).collect().toSeq
    val b = Synthetic.transactionsDeterministic(spark, 50).collect().toSeq
    assert(a === b)
  }

  test("csv sink writes header + %.2f money and round-trips through the ingest parser") {
    val out = new java.io.File(tmpDir("syn"), "synthetic_out").getPath
    Synthetic.writeCsv(Synthetic.transactionsDeterministic(spark, 10), out)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.nonEmpty)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.head.toLowerCase.contains("details"))
    assert(lines.tail.forall(_.split(",", -1).exists(_.matches("-?\\d+\\.\\d{2}"))))
  }

  test("CLI generate-synthetic-data --persist appends N rows to the lake (K5, generate.go:17-42)") {
    val lake = new java.io.File(tmpDir("synP"), "lake").getPath
    assert(graft.Cli.run(spark, List("generate-synthetic-data", "50", lake, "--persist")) === 0)
    val df = spark.read.parquet(lake)
    assert(df.count() === 50)
    assert(df.select("data_source").distinct().collect().map(_.getString(0)).toSeq
      === Seq("synthetic"))
    // InsertMany semantics: a second persist APPENDS (no upsert/dedup)
    assert(graft.Cli.run(spark, List("generate-synthetic-data", "50", lake, "--persist")) === 0)
    assert(spark.read.parquet(lake).count() === 100)
  }

  test("persistToLake into a month-partitioned lake follows the on-disk layout") {
    import spark.implicits._
    val lake = new java.io.File(tmpDir("synM"), "lake").getPath
    val t = graft.model.Transaction(
      "DEBIT", "01/10/2024", "seed", 1.0, 0.0, "", "", "", "chase", "1234")
    graft.lake.Lake.upsertIntoLake(spark, Seq(t).toDF(), lake, monthPartitioned = true)
    Synthetic.persistToLake(Synthetic.transactionsDeterministic(spark, 20), lake)
    // mixed directory depths would make this read throw; layout must match
    val df = spark.read.parquet(lake)
    assert(df.count() === 21)
    assert(df.schema.fieldNames.contains("posting_month"))
    assert(df.filter($"posting_month".isNull).count() === 0)
  }
}
