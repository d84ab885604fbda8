package graft

/** `Cli corpus`: the full prep pipeline (quality filter → exact dedup →
  * split → pack) driven from the command line, output partitioned by split.
  */
class CliCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("corpus command writes a split-partitioned prepared corpus") {
    val out = tmpDir("cli-corpus").getPath + "/corpus"
    val code = Cli.run(
      spark,
      List("corpus", "/root/testdata/sf0.001/documents.parquet", out))
    assert(code === 0)
    val corpus = spark.read.parquet(out)
    val n = corpus.count()
    assert(n > 0)
    // pipeline invariants: split partition values, pack assignment present,
    // no exact duplicates surviving on normalized text
    val splits = corpus.select("split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
    assert(corpus.columns.contains("pack") && corpus.columns.contains("shard"))
    val normDups = xscale.Dedup.dedupExact(corpus).count()
    assert(normDups === n)
    // partition pruning works on the split directory layout
    val plan = corpus.filter($"split" === "train").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(split"), plan)
  }

  test("unknown subcommand still exits 2") {
    assert(Cli.run(spark, List("bogus")) === 2)
  }
}
