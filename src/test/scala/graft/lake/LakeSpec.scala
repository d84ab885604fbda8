package graft.lake

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.model.Transaction

/** Merge-upsert semantics (K1, reference storage/mongo_repository.go:33-61)
  * + the ScalaCheck idempotence property from SURVEY §5 (generators sampled
  * with fixed seeds — scalatestplus isn't on the offline classpath).
  */
class LakeSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
  import spark.implicits._

  private def tx(
      details: String = "DEBIT",
      date: String = "01/01/2024",
      desc: String = "d",
      amount: Double = 1.0,
      balance: Double = 0.0,
      source: String = "chase",
      acct: String = "1234"): Transaction =
    Transaction(details, date, desc, amount, balance, "", "", "", source, acct)

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[Transaction] =
    df.as[Transaction].collect().toSet

  test("matched key: incoming replaces existing ($set upsert, mongo_repository.go:52)") {
    val existing = Seq(tx(amount = 1.0), tx(desc = "other", amount = 5.0)).toDF()
    val incoming = Seq(tx(amount = 9.9)).toDF()
    assert(asSet(Lake.merge(existing, incoming)) ===
      Set(tx(amount = 9.9), tx(desc = "other", amount = 5.0)))
  }

  test("unmatched incoming key inserts") {
    val existing = Seq(tx()).toDF()
    val incoming = Seq(tx(desc = "new")).toDF()
    assert(asSet(Lake.merge(existing, incoming)) === Set(tx(), tx(desc = "new")))
  }

  test("same key, different source/account are distinct rows (key includes both)") {
    val existing = Seq(tx()).toDF()
    val incoming = Seq(tx(acct = "5678", amount = 7.0)).toDF()
    assert(asSet(Lake.merge(existing, incoming)).size === 2)
  }

  test("intra-batch duplicates collapse deterministically to the tie-break minimum") {
    val incoming = Seq(tx(amount = 3.0), tx(amount = 1.0), tx(amount = 2.0)).toDF()
    val merged = Lake.merge(Seq.empty[Transaction].toDF(), incoming)
    assert(asSet(merged) === Set(tx(amount = 1.0)))
  }

  test("merge is idempotent: merge(merge(e,b),b) == merge(e,b) (ScalaCheck)") {
    val genTx: Gen[Transaction] = for {
      details <- Gen.oneOf("DEBIT", "CREDIT")
      date <- Gen.oneOf("01/01/2024", "01/02/2024")
      desc <- Gen.oneOf("a", "b", "c")
      amount <- Gen.chooseNum(-5.0, 5.0)
      source <- Gen.oneOf("chase", "synthetic")
    } yield tx(details, date, desc, amount, 0.0, source)
    val genBatch = Gen.listOfN(8, genTx)

    for (Seq(e, b) <- samples(Gen.zip(genBatch, genBatch).map(t => Seq(t._1, t._2)), 10)) {
      val existing = Lake.merge(Seq.empty[Transaction].toDF(), e.toDF()) // key-unique base
      val once = Lake.merge(existing, b.toDF())
      val twice = Lake.merge(once, b.toDF())
      assert(asSet(once) === asSet(twice), s"e=$e b=$b")
    }
  }

  test("post-merge keys are unique (ScalaCheck)") {
    val genTx = for {
      desc <- Gen.oneOf("a", "b")
      amount <- Gen.chooseNum(0.0, 9.0)
    } yield tx(desc = desc, amount = amount)
    for (Seq(e, b) <- samples(
        Gen.zip(Gen.listOfN(6, genTx), Gen.listOfN(6, genTx)).map(t => Seq(t._1, t._2)), 10)) {
      val merged = Lake.merge(
        Lake.merge(Seq.empty[Transaction].toDF(), e.toDF()), b.toDF())
      val keys = merged.select(Transaction.mergeKey.head, Transaction.mergeKey.tail: _*)
      assert(keys.count() === keys.distinct().count(), s"e=$e b=$b")
    }
  }

  test("upsert writes each merged row ONCE (staging swap, no double-write)") {
    val lake = new java.io.File(tmpDir("lakeW"), "lake").getPath
    Lake.upsertIntoLake(spark, Seq(tx(amount = 1.0)).toDF(), lake)

    val written = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          written.addAndGet(e.taskMetrics.outputMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // merge 2 incoming rows with the 1 existing -> 2 merged rows on disk
      val n = Lake.upsertIntoLake(
        spark, Seq(tx(amount = 9.0), tx(desc = "new", amount = 2.0)).toDF(), lake)
      assert(n === 2L)
      // listener events drain asynchronously; wait for them to arrive
      val deadline = System.currentTimeMillis() + 10000
      while (written.get < n && System.currentTimeMillis() < deadline) Thread.sleep(50)
      Thread.sleep(500) // a double-write would add MORE records after n
      assert(written.get === n, "merged rows must hit disk exactly once")
      assert(!new java.io.File(lake + ".staging").exists())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("insertFast appends one delta file, base untouched; readLake folds latest-wins") {
    val lake = new java.io.File(tmpDir("lakeD"), "lake").getPath
    Lake.upsertIntoLake(spark, Seq(tx(amount = 1.0), tx(desc = "other", amount = 5.0)).toDF(), lake)
    val baseFiles = new java.io.File(lake, "data_source=chase").listFiles().map(_.getName).toSet

    Lake.insertFast(spark, tx(desc = "delta", amount = 2.0), lake)
    assert(new java.io.File(lake, "data_source=chase").listFiles().map(_.getName).toSet
      === baseFiles, "fast insert must not rewrite base partition files")
    val deltaParquet = new java.io.File(lake, "_delta").listFiles().count(_.getName.endsWith(".parquet"))
    assert(deltaParquet === 1)

    // visible through readLake, invisible to a plain base read
    assert(spark.read.parquet(lake).count() === 2L)
    assert(asSet(Lake.readLake(spark, lake)
      .select("details", "posting_date", "description", "amount", "balance",
        "category", "txn_type", "check_or_slip_num", "data_source", "account_id"))
      === Set(tx(amount = 1.0), tx(desc = "other", amount = 5.0), tx(desc = "delta", amount = 2.0)))

    // same key again: higher _seq wins on read, no duplicate
    Lake.insertFast(spark, tx(desc = "delta", amount = 9.0), lake)
    val folded = Lake.readLake(spark, lake)
    assert(folded.count() === 3L)
    assert(folded.filter($"description" === "delta").select("amount").as[Double].collect().toSeq
      === Seq(9.0))
  }

  test("insertFast is O(1) per insert: never reads the sidecar, _seq strictly increases") {
    val lake = new java.io.File(tmpDir("lakeO1"), "lake").getPath
    Lake.upsertIntoLake(spark, Seq(tx(amount = 1.0)).toDF(), lake)
    Lake.insertFast(spark, tx(desc = "dup", amount = 2.0), lake)
    // plant an UNREADABLE .parquet in the sidecar: any insert that scans
    // the sidecar (the old max(_seq) pass did, on every insert) fails on
    // it — the O(1) path must sail through N more inserts untouched
    val garbage = new java.io.File(lake, "_delta/part-garbage.parquet")
    java.nio.file.Files.write(garbage.toPath, "not parquet".getBytes)
    // amount is NOT in the merge key: all six inserts hit the same key
    (1 to 5).foreach(i => Lake.insertFast(spark, tx(desc = "dup", amount = 2.0 + i), lake))
    assert(garbage.delete())
    // later-wins read semantics unchanged: _seq strictly increases in
    // insert order, so the fold keeps the LAST insert per key
    val seqs = spark.read.parquet(lake + "/_delta")
      .orderBy("amount").select("amount", "_seq")
      .as[(Double, Long)].collect()
    assert(seqs.map(_._1).toSeq === (0 to 5).map(i => 2.0 + i))
    assert(seqs.map(_._2).toSeq === seqs.map(_._2).sorted.toSeq &&
      seqs.map(_._2).distinct.length === seqs.length,
      s"_seq must strictly increase in insert order: ${seqs.mkString(",")}")
    val folded = Lake.readLake(spark, lake)
    assert(folded.count() === 2L, "base row + one survivor of the six same-key inserts")
    assert(folded.filter($"description" === "dup").select("amount").as[Double].collect()
      .toSeq === Seq(7.0))
  }

  test("insertFast probes the base-lake layout at most once per lake, not per insert") {
    val lake = new java.io.File(tmpDir("lakeProbe"), "lake").getPath
    // first write primes the layout memo — N subsequent point inserts must
    // trigger ZERO base-lake schema reads (the former code paid a file
    // listing + parquet footer read per insert)
    Lake.upsertIntoLake(spark, Seq(tx(amount = 1.0)).toDF(), lake)
    val before = Lake.layoutProbes.get()
    (1 to 5).foreach(i => Lake.insertFast(spark, tx(desc = "p", amount = 1.0 + i), lake))
    assert(Lake.layoutProbes.get() === before,
      "a primed lake must never re-probe the base layout on point inserts")
    // a FRESH process (memo forgotten) pays exactly one probe for N
    // inserts — and still detects the monthly layout correctly
    Lake.forgetLayout(lake)
    (1 to 3).foreach(i => Lake.insertFast(spark, tx(desc = "q", amount = 10.0 + i), lake))
    assert(Lake.layoutProbes.get() === before + 1,
      "an unprimed lake pays exactly ONE layout probe, amortized over all inserts")
    // monthly lake: same memo, and the delta rows carry posting_month
    val mLake = new java.io.File(tmpDir("lakeProbeM"), "lake").getPath
    Lake.upsertIntoLake(spark, Seq(tx(amount = 1.0)).toDF(), mLake, monthPartitioned = true)
    Lake.forgetLayout(mLake)
    val b2 = Lake.layoutProbes.get()
    (1 to 3).foreach(i => Lake.insertFast(spark, tx(desc = "m", amount = 20.0 + i), mLake))
    assert(Lake.layoutProbes.get() === b2 + 1)
    assert(spark.read.parquet(mLake + "/_delta").columns.contains("posting_month"))
  }

  test("batch upsert folds touched delta (batch wins); untouched-source delta survives") {
    val lake = new java.io.File(tmpDir("lakeDF"), "lake").getPath
    Lake.upsertIntoLake(
      spark, Seq(tx(source = "chase"), tx(source = "synthetic", acct = "0000")).toDF(), lake)
    Lake.insertFast(spark, tx(source = "chase", desc = "dc", amount = 1.0), lake)
    Lake.insertFast(spark, tx(source = "synthetic", acct = "0000", desc = "ds", amount = 1.0), lake)

    // batch touches chase only and updates the same key as the chase delta row
    Lake.upsertIntoLake(spark, Seq(tx(source = "chase", desc = "dc", amount = 7.0)).toDF(), lake)

    val base = spark.read.parquet(lake) // no delta fold
    assert(base.filter($"description" === "dc").select("amount").as[Double].collect().toSeq
      === Seq(7.0), "chase delta must be folded into base with the batch winning")
    assert(base.filter($"description" === "ds").count() === 0L,
      "untouched synthetic delta must stay in the sidecar")
    val view = Lake.readLake(spark, lake)
    assert(view.filter($"description" === "ds").count() === 1L)
    assert(view.count() === 4L)
  }

  test("compact folds pending delta into base and removes the sidecar") {
    val lake = new java.io.File(tmpDir("lakeDC"), "lake").getPath
    Lake.upsertIntoLake(spark, Seq(tx(amount = 1.0)).toDF(), lake)
    Lake.insertFast(spark, tx(desc = "delta", amount = 2.0), lake)
    val n = Lake.compact(spark, lake, parallelism = 4)
    assert(n === 2L)
    assert(!new java.io.File(lake, "_delta").exists())
    assert(asSet(spark.read.parquet(lake)
      .select("details", "posting_date", "description", "amount", "balance",
        "category", "txn_type", "check_or_slip_num", "data_source", "account_id"))
      === Set(tx(amount = 1.0), tx(desc = "delta", amount = 2.0)))
  }

  test("compact(sortBy) clusters each rewritten file by the sort key; rows unchanged") {
    val lake = new java.io.File(tmpDir("lakeZ"), "lake").getPath
    val rnd = new scala.util.Random(7)
    val batch = rnd.shuffle((1 to 28).toList)
      .map(d => tx(date = f"01/$d%02d/2024", desc = s"d$d", amount = d.toDouble))
    Lake.upsertIntoLake(spark, batch.toDF(), lake)

    Lake.compact(spark, lake, parallelism = 4, sortBy = Seq("posting_date"))
    val files = new java.io.File(lake, "data_source=chase").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length === 1) // compaction: one file per partition
    val dates = spark.read.parquet(files.head.getPath)
      .select("posting_date").as[String].collect().toSeq
    assert(dates === dates.sorted, "file must be clustered by posting_date for min/max skipping")
    assert(asSet(spark.read.parquet(lake)
      .select("details", "posting_date", "description", "amount", "balance",
        "category", "txn_type", "check_or_slip_num", "data_source", "account_id"))
      === batch.toSet)
  }

  test("upsertIntoLake only touches partitions present in the batch") {
    val lake = new java.io.File(tmpDir("lake"), "lake").getPath
    Lake.upsertIntoLake(spark, Seq(tx(source = "chase"), tx(source = "synthetic", acct = "0000")).toDF(), lake)
    val syntheticFiles = new java.io.File(lake, "data_source=synthetic").listFiles().map(_.getName).toSet
    // second batch: chase only — synthetic partition files must be untouched
    Lake.upsertIntoLake(spark, Seq(tx(source = "chase", amount = 2.0)).toDF(), lake)
    val after = new java.io.File(lake, "data_source=synthetic").listFiles().map(_.getName).toSet
    assert(after === syntheticFiles)
    val all = asSet(spark.read.parquet(lake)
      .select("details", "posting_date", "description", "amount", "balance",
        "category", "txn_type", "check_or_slip_num", "data_source", "account_id"))
    assert(all === Set(tx(source = "chase", amount = 2.0), tx(source = "synthetic", acct = "0000")))
  }
}
