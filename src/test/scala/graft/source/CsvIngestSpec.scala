package graft.source

import graft.SparkSpec

/** Source tests mirroring the reference's parser + extractor suites
  * (csv/csv_test.go, datalake/datasource/datasource_test.go).
  */
class CsvIngestSpec extends SparkSpec {

  // --- filename → source info (datasource_test.go:17-68) ---

  test("chase filename extracts (chase, 4-digit account), case-insensitive") {
    assert(CsvIngest.extractInfo("Chase1234_Activity_20240101.CSV") ===
      Some(CsvIngest.SourceInfo("chase", "1234")))
    assert(CsvIngest.extractInfo("chase9999.csv") ===
      Some(CsvIngest.SourceInfo("chase", "9999")))
  }

  test("synthetic filenames extract (synthetic, 0000)") {
    for (n <- Seq("synthetic_data.csv", "my_synthetic_file.csv", "SYNTHETIC.csv"))
      assert(CsvIngest.extractInfo(n) === Some(CsvIngest.SourceInfo("synthetic", "0000")), n)
  }

  test("unknown filenames yield None (ErrUnableToExtractInfo)") {
    for (n <- Seq("mystery_bank.csv", "chase123.csv", "data.csv"))
      assert(CsvIngest.extractInfo(n) === None, n)
  }

  // --- directory scan + parse (csv_test.go) ---

  private val goldenCsv =
    """Details,Posting Date,Description,Category,Amount,Type,Balance,Check or Slip #
      |DEBIT,01/01/2024,"WHOLEFDS HAR 102 230 B OAKLAND CA    211023  01/31",Shopping,-75.77,DEBIT_CARD,11190.76,
      |CREDIT,01/02/2024,"ONLINE PAYMENT THANK YOU",Payment,1000.00,PAYMENT,10114.36,""".stripMargin

  test("happy path: 2 rows, lowercased headers, quoted fields preserved (csv_test.go:24-95)") {
    val dir = tmpDir("csv")
    writeFile(dir, "chase1234_jan.csv", goldenCsv)
    val df = CsvIngest.readCsvDir(spark, dir.getPath)
    assert(df.count() === 2)
    assert(df.columns.toSet.contains("posting date"))
    assert(df.columns.forall(c => c == c.toLowerCase))
    val r = df.orderBy("posting date").collect()
    assert(r(0).getAs[String]("description") ===
      "WHOLEFDS HAR 102 230 B OAKLAND CA    211023  01/31")
    assert(r(0).getAs[String]("data_source") === "chase")
    assert(r(0).getAs[String]("account_id") === "1234")
    assert(r(0).getAs[String]("_file") === "chase1234_jan.csv")
  }

  test("reordered columns resolve by name (csv_test.go:97-146)") {
    val dir = tmpDir("csv")
    writeFile(dir, "chase5678.csv",
      """Amount,Description,Posting Date,Details
        |-75.77,"Transaction 1","01/01/2024","DEBIT"""".stripMargin)
    val df = CsvIngest.readCsvDir(spark, dir.getPath)
    val r = df.collect()(0)
    assert(r.getAs[String]("amount") === "-75.77")
    assert(r.getAs[String]("details") === "DEBIT")
  }

  test("ragged row (fewer fields) dropped; extra-field row kept (csv.go:53,82-84)") {
    val dir = tmpDir("csv")
    writeFile(dir, "chase1111.csv",
      """Details,Posting Date,Description,Amount
        |DEBIT,01/01/2024,ok,-1.00
        |DEBIT,01/02/2024
        |CREDIT,01/03/2024,extra,2.00,IGNORED,COLUMNS
        |CREDIT,01/04/2024,"quoted, comma",,SURPLUS""".stripMargin)
    val df = CsvIngest.readCsvDir(spark, dir.getPath)
    // count() must agree with collect() — DROPMALFORMED would return 4 here
    assert(df.count() === 3)
    val rows = df.orderBy("posting date").collect()
    assert(rows.map(_.getAs[String]("details")).toSeq === Seq("DEBIT", "CREDIT", "CREDIT"))
    assert(rows(1).getAs[String]("description") === "extra")
    // empty amount field on a long row survives the ragged filter (the
    // reference keeps any row with >= header fields, csv.go:82-84)
    assert(rows(2).getAs[String]("description") === "quoted, comma")
    assert(rows(2).getAs[String]("amount") === null)
  }

  test("empty file yields 0 rows, no error (csv_test.go:188-204)") {
    val dir = tmpDir("csv")
    writeFile(dir, "chase2222.csv", "")
    assert(CsvIngest.readCsvDir(spark, dir.getPath).count() === 0)
  }

  test("invalid date passes through the parser — validation is downstream (csv_test.go:165-186)") {
    val dir = tmpDir("csv")
    writeFile(dir, "chase3333.csv",
      """Details,Posting Date,Description,Amount
        |DEBIT,invalid-date,x,-1.00""".stripMargin)
    val df = CsvIngest.readCsvDir(spark, dir.getPath)
    assert(df.select("posting date").collect()(0).getString(0) === "invalid-date")
  }

  test("non-csv and unextractable files are reported, not scanned (datalake.go:82-89,321-328)") {
    val dir = tmpDir("csv")
    writeFile(dir, "notes.txt", "hello")
    writeFile(dir, "mystery.csv", "a,b\n1,2")
    writeFile(dir, "chase4444.csv", "Details,Posting Date,Description,Amount\nDEBIT,01/01/2024,x,-1.0")
    val skipped = CsvIngest.skippedFiles(spark, dir.getPath).toMap
    assert(skipped === Map(
      "notes.txt" -> "Not a valid CSV file",
      "mystery.csv" -> "unable to extract source info from filename"))
    assert(CsvIngest.listCsvFiles(spark, dir.getPath).map(_.name) === Seq("chase4444.csv"))
  }

  test("literal '+' in filename survives URI decoding (_file keys must match disk names)") {
    val dir = tmpDir("csv")
    writeFile(dir, "chase1234+feb.csv",
      "Details,Posting Date,Description,Amount\nDEBIT,01/01/2024,plus,-1.0")
    val df = CsvIngest.readCsvDir(spark, dir.getPath)
    assert(df.select("_file").collect()(0).getString(0) === "chase1234+feb.csv")
  }

  test("duplicate lowercased headers: last occurrence wins (csv.go:64-67 colIndex overwrite)") {
    val dir = tmpDir("csv")
    writeFile(dir, "chase6666.csv",
      """Amount,AMOUNT,Details
        |1.11,2.22,DEBIT""".stripMargin)
    val df = CsvIngest.readCsvDir(spark, dir.getPath)
    val r = df.collect()(0)
    // the surviving 'amount' column is the LAST one; the first is suffixed
    assert(r.getAs[String]("amount") === "2.22")
    assert(df.columns.count(_.startsWith("amount")) === 2)
  }

  test("both 'post date' and 'posting date' present: 'post date' wins (priority order, datalake.go:184-189)") {
    val dir = tmpDir("csv")
    writeFile(dir, "chase7777.csv",
      """Details,Post Date,Posting Date,Amount
        |DEBIT,01/05/2024,01/09/2024,-1.00""".stripMargin)
    val raw = CsvIngest.readCsvDir(spark, dir.getPath)
    val (valid, _) = graft.transform.Canonicalize.split(spark, raw)
    assert(valid.select("posting_date").collect()(0).getString(0) === "01/05/2024")
  }

  // --- RFC-4180 quoted embedded newlines + strict-quote file failure ---

  test("quoted field with embedded newline parses as ONE record (Go encoding/csv parity, csv/csv.go:52-80)") {
    val dir = tmpDir("csv")
    writeFile(dir, "chase8888.csv",
      "Details,Posting Date,Description,Amount\n" +
        "DEBIT,01/01/2024,\"MEMO line1\nline2, still memo\",-5.00\n" +
        "CREDIT,01/02/2024,plain,1.00")
    val df = CsvIngest.readCsvDir(spark, dir.getPath)
    assert(df.count() === 2)
    val r = df.orderBy("posting date").collect()
    assert(r(0).getAs[String]("description") === "MEMO line1\nline2, still memo")
    assert(r(1).getAs[String]("description") === "plain")
  }

  test("multiline header field groups and parses (quote-aware header probe)") {
    val dir = tmpDir("csv")
    writeFile(dir, "chase8899.csv",
      "Details,\"Posting\nDate\",Amount\nDEBIT,01/01/2024,-1.00")
    val df = CsvIngest.readCsvDir(spark, dir.getPath)
    assert(df.count() === 1)
    assert(df.columns.contains("posting\ndate"))
  }

  test("bare quote fails the WHOLE file (csv.go:75-79): excluded from parse, reason reported") {
    val dir = tmpDir("csv")
    writeFile(dir, "chase9990.csv",
      "Details,Posting Date,Description,Amount\n" +
        "DEBIT,01/01/2024,ab\"cd,-1.00\n" + // bare quote on line 2
        "DEBIT,01/02/2024,fine,-2.00") // never ingested: whole file fails
    writeFile(dir, "chase9991.csv",
      "Details,Posting Date,Description,Amount\nDEBIT,01/03/2024,good,-3.00")
    val files = CsvIngest.listCsvFiles(spark, dir.getPath)
    val errs = CsvIngest.quoteErrors(spark, files)
    assert(errs === Map(
      "chase9990.csv" -> "parse error on line 2: bare \" in non-quoted field"))
    val df = CsvIngest.readCsvDir(spark, dir.getPath)
    assert(df.select("_file").distinct().collect().map(_.getString(0)).toSeq
      === Seq("chase9991.csv"))
  }

  test("text after a closing quote / unterminated quote fail the file (ErrQuote)") {
    val dir = tmpDir("csv")
    writeFile(dir, "chase9992.csv", "Details,Amount\n\"ab\"x,1.0")
    writeFile(dir, "chase9993.csv", "Details,Amount\n\"never closed,1.0")
    // escaped "" and quoted newlines are NOT errors
    writeFile(dir, "chase9994.csv", "Details,Amount\n\"say \"\"hi\"\"\n bye\",2.0")
    val errs = CsvIngest.quoteErrors(spark, CsvIngest.listCsvFiles(spark, dir.getPath))
    assert(errs === Map(
      "chase9992.csv" -> "parse error on line 2: extraneous or missing \" in quoted-field",
      "chase9993.csv" -> "parse error on line 2: extraneous or missing \" in quoted-field"))
  }

  test("files with different headers union by name (one scan per header group)") {
    val dir = tmpDir("csv")
    writeFile(dir, "chase1234.csv", "Details,Posting Date,Amount\nDEBIT,01/01/2024,-1.0")
    writeFile(dir, "chase5678.csv", "Details,Post Date,Amount,Balance\nCREDIT,01/02/2024,2.0,5.0")
    val df = CsvIngest.readCsvDir(spark, dir.getPath)
    assert(df.count() === 2)
    assert(df.columns.toSet.intersect(Set("posting date", "post date")).size === 2)
  }
}
