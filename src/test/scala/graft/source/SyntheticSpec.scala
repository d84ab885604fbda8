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
}
