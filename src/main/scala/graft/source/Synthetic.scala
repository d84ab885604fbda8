package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic transaction generator (S6, reference synthetic/data.go:40-63):
  * N rows with Details="SALE", today's date, "Synthetic transaction {i}"
  * descriptions, random amount ∈ [0,1000), balance ∈ [0,10000), 4-digit
  * account id, Type="DEBIT", Category/DataSource="synthetic".
  *
  * `spark.range(n)` is an embarrassingly parallel source — no shuffle, scales
  * linearly with executors; the reference builds the rows one-by-one on a
  * single thread (data.go:40-63).
  */
object Synthetic {

  /** Faithful variant: non-deterministic `rand(seed)` like the reference's
    * rand.Float64 (data.go:44-48), and TODAY's date on every row exactly
    * like `time.Now().Format("01/02/2006")` (data.go:51).
    */
  def transactions(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame =
    decorate(
      spark.range(n),
      amount = rand(seed) * 1000.0,
      balance = rand(seed + 1) * 10000.0,
      acct = (rand(seed + 2) * 10000.0).cast("int"),
      postingDate = date_format(current_date(), "MM/dd/yyyy"))

  /** Deterministic variant (oracle-checkable): the random draws are replaced
    * by fixed multiplicative-congruential arithmetic on the row id, so DuckDB
    * can reproduce the exact rows in SQL. Same value ranges as the reference
    * (amount [0,1000), balance [0,10000), account [0000,9999],
    * synthetic/data.go:16-23).
    */
  def transactionsDeterministic(spark: SparkSession, n: Long): DataFrame =
    decorate(
      spark.range(n),
      amount = (col("id") * 9973 % 100000).cast("double") / 100.0,
      balance = (col("id") * 6151 % 1000000).cast("double") / 100.0,
      acct = (col("id") * 7919 % 10000).cast("int"))

  private def decorate(
      ids: org.apache.spark.sql.Dataset[java.lang.Long],
      amount: org.apache.spark.sql.Column,
      balance: org.apache.spark.sql.Column,
      acct: org.apache.spark.sql.Column,
      // deterministic variant spreads dates over a fixed year so the oracle
      // can reproduce them; the faithful variant passes today's date
      postingDate: org.apache.spark.sql.Column = date_format(
        date_add(to_date(lit("2024-01-01")), (col("id") % 365).cast("int")),
        "MM/dd/yyyy")): DataFrame =
    ids.select(
      lit("SALE").as("details"), // data.go:17 detailsValue
      postingDate.as("posting_date"),
      concat(lit("Synthetic transaction "), col("id")).as("description"),
      amount.as("amount"),
      balance.as("balance"),
      lit("synthetic").as("category"), // data.go:20
      lit("DEBIT").as("txn_type"), // data.go:21
      lit("").as("check_or_slip_num"),
      lit("synthetic").as("data_source"),
      lpad(acct.cast("string"), 4, "0").as("account_id")) // %04d, data.go:48

  /** Zipfian synthetic TEXT corpus — the fixture the df-dependent text
    * operators (x88 BM25, x77 heavy hitters, x119 burstiness) need: the
    * driver fixture's 31-word flat vocabulary makes every document-
    * frequency distinction degenerate (every useful df-cap keeps ~76%-df
    * postings), where real corpora are Zipfian — a tiny head carrying
    * most token MASS and a long informative tail. Deterministic and
    * shuffle-free: doc `i`'s token `t` is word
    * `floor((V+1)^u)` with `u = (h60("z:i:t") mod 1e6) / 1e6` — the
    * closed-form inverse CDF of P(word = k) ∝ ln(1 + 1/k) ≈ 1/k, i.e.
    * Zipf s = 1, no rejection loop, no driver RNG state, identical
    * corpus on every engine/run. Doc length 30..229 tokens hash-varied;
    * 4 sources. Columns (doc_id, source, text).
    *
    * Scale posture: `spark.range` is an embarrassingly parallel source;
    * every column is per-row expression work inside codegen — generating
    * an N-doc corpus is one scan-shaped pass, no shuffle, no collect.
    */
  def zipfDocs(spark: SparkSession, n: Long, vocab: Int = 10000): DataFrame = {
    val h = graft.xscale.XHash.h60(_: org.apache.spark.sql.Column)
    val len = (h(concat(lit("zlen:"), col("id"))) % 200 + 30).cast("int")
    val word = (t: org.apache.spark.sql.Column) => {
      val u = (h(concat(lit("z:"), col("id"), lit(":"), t)) % 1000000L)
        .cast("double") / 1000000.0
      concat(lit("w"), floor(pow(lit((vocab + 1).toDouble), u)).cast("long").cast("string"))
    }
    spark.range(n).select(
      col("id").as("doc_id"),
      concat(lit("zipf_"), (col("id") % 4).cast("string")).as("source"),
      concat_ws(" ", transform(sequence(lit(1), len), word)).as("text"))
  }

  /** CSV sink with the reference's header + %.2f money formatting
    * (K4, synthetic/data.go:108-160).
    */
  def writeCsv(df: DataFrame, dir: String): Unit =
    df.select(
        col("details").as("Details"),
        col("posting_date").as("Posting Date"),
        col("description").as("Description"),
        col("category").as("Category"),
        format_string("%.2f", col("amount")).as("Amount"),
        col("txn_type").as("Type"),
        format_string("%.2f", col("balance")).as("Balance"),
        col("check_or_slip_num").as("Check or Slip #"))
      .write
      .option("header", "true")
      .mode("overwrite")
      .csv(dir)

  /** Direct-to-lake persistence (K5, reference
    * GenerateAndPersistSyntheticData → InsertMany, synthetic/data.go:66-105):
    * a plain partitioned APPEND — the reference's InsertMany does not upsert,
    * so neither does this; use [[graft.lake.Lake.upsertIntoLake]] when merge
    * semantics are wanted. Like the upsert path, the lake's ON-DISK layout
    * wins: appending into a month-partitioned lake adds `posting_month`, so
    * leaf files never land at mixed directory depths (which would break
    * every later `spark.read.parquet(lakePath)` with
    * conflicting-directory-structures).
    */
  def persistToLake(df: DataFrame, lakePath: String): Unit = {
    val spark = df.sparkSession
    val hPath = new org.apache.hadoop.fs.Path(lakePath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val monthly = fs.exists(hPath) &&
      spark.read.parquet(lakePath).schema.fieldNames.contains("posting_month")
    val (out, parts) =
      if (monthly)
        (df.withColumn("posting_month", graft.lake.Lake.postingMonth(col("posting_date"))),
          Seq("data_source", "posting_month"))
      else (df, Seq("data_source"))
    out.write
      .mode("append")
      .partitionBy(parts: _*)
      .parquet(lakePath)
  }
}
