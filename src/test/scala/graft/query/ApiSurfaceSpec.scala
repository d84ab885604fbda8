package graft.query

import graft.SparkSpec
import graft.model.Transaction

/** API surface over the lake: echo, add → point-lookup round trip, and the
  * epoch-bounded history search (reference apiClient/apiClient.go).
  */
class ApiSurfaceSpec extends SparkSpec {

  private def tx(date: String, desc: String, amount: Double): Transaction =
    Transaction("DEBIT", date, desc, amount, 0.0, "", "", "42", "chase", "1234")

  test("echo round-trips (Q1)") {
    assert(ApiSurface.echo(spark, "hello") === "hello")
  }

  test("add + getTransactionById round-trip (Q4 → Q2), fast-path inserts included") {
    val lakePath = new java.io.File(tmpDir("api"), "lake").getPath
    val id = ApiSurface.addTransaction(spark, tx("01/05/2024", "coffee", -4.5), lakePath)
    assert(id.length === 32)

    val lake = graft.lake.Lake.readLake(spark, lakePath)
    val hit = ApiSurface.getTransactionById(lake, id, "egress").collect()
    assert(hit.length === 1)
    val r = hit(0)
    assert(r.getAs[String]("transactionType") === "egress") // amount < 0
    assert(r.getAs[String]("transactionSource") === "chase")
    assert(r.getAs[String]("datePosted") === "01/05/2024")
    assert(r.getAs[String]("slipNumber") === "42")
    // wrong type finds nothing
    assert(ApiSurface.getTransactionById(lake, id, "ingress").count() === 0)

    // second insert lands in the delta sidecar (lake exists now) and is
    // immediately visible through readLake
    val id2 = ApiSurface.addTransaction(spark, tx("01/06/2024", "bagel", -2.0), lakePath)
    val lake2 = graft.lake.Lake.readLake(spark, lakePath)
    assert(ApiSurface.getTransactionById(lake2, id2, "egress").count() === 1)
    // updating the same key through the API replaces, never duplicates
    ApiSurface.addTransaction(spark, tx("01/06/2024", "bagel", -3.0), lakePath)
    val lake3 = graft.lake.Lake.readLake(spark, lakePath)
    val again = ApiSurface.getTransactionById(lake3, id2, "egress").collect()
    assert(again.length === 1)
    assert(again(0).getAs[Double]("amount") === -3.0)
  }

  test("historySearch: inclusive epoch bounds, filtered by type (Q3)") {
    val lakePath = new java.io.File(tmpDir("api"), "lake").getPath
    import spark.implicits._
    val batch = Seq(
      tx("01/01/2024", "early egress", -1.0),
      tx("01/10/2024", "in-window egress", -2.0),
      tx("01/10/2024", "in-window ingress", 3.0),
      tx("01/20/2024", "late egress", -4.0)).toDF()
    graft.lake.Lake.upsertIntoLake(spark, batch, lakePath)
    val lake = spark.read.parquet(lakePath)

    def epoch(d: String): Long =
      java.time.LocalDate.parse(d).atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond

    val ids = ApiSurface.historySearch(lake, "egress", epoch("2024-01-05"), epoch("2024-01-15"))
      .collect().map(_.getString(0)).toSet
    val expected = ApiSurface.transactionsView(lake)
      .filter($"description" === "in-window egress")
      .select("id").collect().map(_.getString(0)).toSet
    assert(ids === expected)

    // inclusive lower bound: window starting exactly on 01/10 still matches
    val incl = ApiSurface.historySearch(lake, "egress", epoch("2024-01-10"), epoch("2024-01-10"))
    assert(incl.count() === 1)
  }

  test("monthsBetween enumerates covering yyyy-MM partitions") {
    def epoch(d: String): Long =
      java.time.LocalDate.parse(d).atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    assert(ApiSurface.monthsBetween(epoch("2023-11-15"), epoch("2024-02-03")) ===
      Seq("2023-11", "2023-12", "2024-01", "2024-02"))
    assert(ApiSurface.monthsBetween(epoch("2024-01-01"), epoch("2024-01-31")) === Seq("2024-01"))
  }

  test("historySearchPruned: identical results, scan pruned to the window's months") {
    val lakePath = new java.io.File(tmpDir("apiM"), "lake").getPath
    import spark.implicits._
    val batch = Seq(
      tx("11/20/2023", "nov", -1.0),
      tx("01/10/2024", "jan", -2.0),
      tx("02/05/2024", "feb", -3.0),
      tx("06/01/2024", "jun", -4.0)).toDF()
    graft.lake.Lake.upsertIntoLake(spark, batch, lakePath, monthPartitioned = true)
    // month directories exist under each source partition
    assert(new java.io.File(lakePath, "data_source=chase/posting_month=2024-01").exists())
    val lake = spark.read.parquet(lakePath)

    def epoch(d: String): Long =
      java.time.LocalDate.parse(d).atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val (s, e) = (epoch("2024-01-01"), epoch("2024-02-29"))

    val pruned = ApiSurface.historySearchPruned(lake, "egress", s, e)
    val plain = ApiSurface.historySearch(lake, "egress", s, e)
    assert(pruned.collect().map(_.getString(0)).toSet ===
      plain.collect().map(_.getString(0)).toSet)
    assert(pruned.count() === 2) // jan + feb

    // the month predicate must land in PartitionFilters, not a row filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("posting_month"),
      s"expected posting_month partition pruning:\n$plan")
  }
}
