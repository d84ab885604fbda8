package graft

/** `Cli report`: the release-audit battery driven from the command line —
  * every audit lands as a parquet beside the others, each the registered
  * oracle-verified query (so the report numbers ARE the Verify-gated ones).
  */
class CliReportSpec extends SparkSpec {

  test("report command writes every audit of the battery with rows") {
    val out = tmpDir("cli-report").getPath + "/report"
    val code = Cli.run(spark, List("report", "/root/testdata/sf0.001", out))
    assert(code === 0)
    val expected = Seq(
      "x38_datasheet", "x97_split_drift", "x100_filter_sweep",
      "x102_oov_rate", "x104_length_quantiles", "x108_ngram_coverage",
      "x109_lexical_profile", "x111_charset_audit", "x115_source_divergence",
      "x117_template_slots", "x119_burstiness", "x120_markup_residue",
      "x123_shard_balance", "x126_dedup_length_bias", "x127_stage_overlap",
      "x129_threshold_sweep", "x130_token_profile",
      "x106_norm_audit", "x118_dim_stats", "x124_anisotropy",
      "x136_lsh_buckets", "x137_lsh_centered", "x138_imi_cells")
    expected.foreach { name =>
      val df = spark.read.parquet(s"$out/$name.parquet")
      assert(df.count() > 0, s"$name is empty")
    }
    // the report rows are exactly the registered query's rows
    val viaRegistry =
      SparkEntry.queries("x104_length_quantiles")(spark, "/root/testdata/sf0.001").count()
    assert(
      spark.read.parquet(s"$out/x104_length_quantiles.parquet").count() == viaRegistry)
  }
}
