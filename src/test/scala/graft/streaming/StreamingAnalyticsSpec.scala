package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import StreamingAnalytics._

/** Watermarked windowed aggregation and event-time sessionization over a
  * MemoryStream — late-data drop and watermark-driven session close
  * observed through real micro-batches. Everything is event-time, so the
  * tests are deterministic (no wall-clock sleeps).
  */
class StreamingAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int): Timestamp = new Timestamp(sec * 1000L)

  test("windowedCounts: tumbling event-time windows; watermark drops late rows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = windowedCounts(in.toDF(), "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append()).start()

    // batch 1: two windows' worth of clicks; max ts 25s → watermark 20s
    in.addData(
      Event(1, ts(1), 1, "click", 1.0),
      Event(2, ts(4), 2, "click", 2.0),
      Event(3, ts(25), 3, "click", 4.0))
    q.processAllAvailable()
    // batch 2: a row at 3s is BEHIND the 20s watermark → dropped;
    // a row at 26s lands in the open [20,30) window
    in.addData(Event(4, ts(3), 4, "click", 8.0), Event(5, ts(26), 5, "click", 16.0))
    q.processAllAvailable()
    // advance watermark past 30s so the [20,30) window finalizes
    in.addData(Event(6, ts(40), 6, "view", 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_counts")
      .select("window_start", "event_type", "n", "total_value")
      .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // [0,10) click: events 1,2 only — the late event 4 was dropped
    assert(rows.contains((0L, "click", 2L, 3.0)), rows.toString)
    // [20,30) click: events 3 and 5
    assert(rows.contains((20L, "click", 2L, 20.0)), rows.toString)
  }

  test("dedupEvents: duplicate ids within the watermark horizon dropped once") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamingAnalytics.dedupEvents(in.toDF(), "10 seconds")
      .writeStream.format("memory").queryName("dedup_ev")
      .outputMode(OutputMode.Append()).start()

    in.addData(Event(1, ts(10), 1, "click", 1.0), Event(2, ts(11), 2, "view", 2.0))
    q.processAllAvailable()
    // redelivery of event 1 (same id) in a later batch → dropped
    in.addData(Event(1, ts(10), 1, "click", 1.0), Event(3, ts(12), 3, "click", 3.0))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_ev").select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L))
  }

  test("sessionWindowStats: built-in session_window merges by gap, closes on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = sessionWindowStats(in.toDF(), "5 seconds", "0 seconds")
      .writeStream.format("memory").queryName("sw_stats")
      .outputMode(OutputMode.Append()).start()

    // user 7: events at 10s,12s (one session); user 8: 11s
    in.addData(
      Event(1, ts(10), 7, "click", 1.0),
      Event(2, ts(12), 7, "view", 2.0),
      Event(3, ts(11), 8, "click", 5.0))
    q.processAllAvailable()
    // watermark jumps past every session's end+gap → sessions emit
    in.addData(Event(4, ts(60), 9, "click", 0.0))
    q.processAllAvailable()
    in.addData(Event(5, ts(120), 9, "view", 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sw_stats")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
      .toSet
    assert(rows.contains((7L, 2L, 3.0)), rows.toString)
    assert(rows.contains((8L, 1L, 5.0)), rows.toString)
  }

  test("attribution: stream-stream interval join within the horizon only") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamingAnalytics.attribution(in.toDF(), "0 seconds", "30 seconds")
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()

    in.addData(
      Event(1, ts(10), 1, "click", 0.0),
      Event(2, ts(20), 1, "purchase", 9.99), // 10s after click: attributed
      Event(3, ts(15), 2, "click", 0.0),
      Event(4, ts(90), 2, "purchase", 5.0)) // 75s after click: outside horizon
    q.processAllAvailable()
    // advance both watermarks so results finalize
    in.addData(Event(5, ts(200), 3, "click", 0.0), Event(6, ts(200), 3, "purchase", 1.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attrib")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value"))).toSet
    assert(rows.contains((1L, 9.99)), rows.toString)
    assert(!rows.exists(_._1 == 2L), rows.toString) // outside the horizon
  }

  test("sessionize == batch q23 on the real events fixture (streaming/batch parity)") {
    // The custom-state streaming sessionizer and the batch lag+running-sum
    // sessionizer (q23, 30-min gap) must agree on per-user session counts
    // when the stream is fully flushed — one definition, two engines.
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val fixture = graft.query.Registry.table(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().toSeq

    val in = MemoryStream[Event]
    val q = sessionize(in.toDS(), gapMs = 1800L * 1000L, lateness = "0 seconds")
      .writeStream.format("memory").queryName("sessions_fixture")
      .outputMode(OutputMode.Append()).start()
    in.addData(fixture: _*)
    q.processAllAvailable()
    // flush: watermark far past every session's end + gap, then one more
    // batch so the timeout emissions commit to the sink
    val flushTs = new Timestamp(fixture.map(_.ts.getTime).max + 86400L * 1000L)
    in.addData(Event(-1L, flushTs, 999999L, "flush", 0.0))
    q.processAllAvailable()
    in.addData(Event(-2L, new Timestamp(flushTs.getTime + 1000L), 999999L, "flush", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sessions_fixture").as[Session].collect()
      .filter(_.user_id < 50)
      .groupBy(_.user_id)
      .map { case (u, ss) => (u, ss.size.toLong, ss.map(_.n_events).sum) }
      .toSeq.sortBy(_._1)

    val batch = graft.query.Registry.queries("q23_sessionize")(spark, sf)
      .collect().map(r =>
        (r.getAs[Long]("user_id"), r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events")))
      .toSeq.sortBy(_._1)

    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("sessionize: custom state closes sessions when the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = sessionize(in.toDS(), gapMs = 5000, lateness = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()

    in.addData(
      Event(1, ts(10), 7, "click", 1.0),
      Event(2, ts(12), 7, "view", 2.0),
      Event(3, ts(11), 8, "click", 5.0),
      // user 9: two events 80s apart IN THE SAME BATCH — the first session
      // must close on the gap, not be merged into one 80s session
      Event(7, ts(10), 9, "click", 1.5),
      Event(8, ts(90), 9, "view", 2.5))
    q.processAllAvailable()
    // user 9's first session closed by the IN-BATCH gap split (the key
    // assertion: 10s and 90s did not merge into one 80s session); users
    // 7/8 may also close here because processAllAvailable runs the
    // watermark-advance batch too
    val early = spark.table("sessions").as[Session].collect()
    assert(early.exists(s => s.user_id == 9L && s.n_events == 1L && s.total_value == 1.5),
      early.mkString(";"))
    assert(!early.exists(s => s.user_id == 9L && s.n_events == 2L), early.mkString(";"))
    // watermark → 60s: both sessions pass last_event + 5s → emitted
    in.addData(Event(4, ts(60), 9, "click", 0.0))
    q.processAllAvailable()
    // one more batch so the state-timeout emissions commit to the sink
    in.addData(Event(5, ts(61), 9, "view", 0.0))
    q.processAllAvailable()
    q.stop()

    val byUser = spark.table("sessions").as[Session].collect()
      .map(s => s.user_id -> s).toMap
    assert(byUser.contains(7L) && byUser.contains(8L), byUser.toString)
    val s7 = byUser(7L)
    assert(s7.n_events === 2L)
    assert(s7.started === ts(10) && s7.ended === ts(12))
    assert(s7.total_value === 3.0)
    assert(byUser(8L).n_events === 1L)
  }

  test("native quality + repetition annotators are streaming-safe: stream == batch") {
    import graft.xscale.TextAnalysis
    // the native struct expressions (GopherMetrics, RepetitionMetrics) are
    // stateless per-row, so the SAME library calls must run unchanged on a
    // streaming DataFrame and agree with batch row-for-row
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(100)
    val rows = docs.as[(Long, String)].collect().toSeq

    val in = MemoryStream[(Long, String)]
    val streamDf = in.toDF().toDF("doc_id", "text")
    val annotated = TextAnalysis.repetitionAnnotate(TextAnalysis.gopherAnnotate(streamDf))
      .select("doc_id", "r_keep", "totc", "top2", "cov5")
    val q = annotated.writeStream.format("memory").queryName("ann_stream")
      .outputMode("append").start()
    in.addData(rows: _*)
    q.processAllAvailable()
    q.stop()

    val batch = TextAnalysis.repetitionAnnotate(TextAnalysis.gopherAnnotate(docs))
      .select("doc_id", "r_keep", "totc", "top2", "cov5")
    val stream = spark.table("ann_stream")
    assert(stream.count() == rows.length)
    val diff = stream.exceptAll(batch).union(batch.exceptAll(stream))
    assert(diff.isEmpty, diff.collect().take(3).mkString(";"))
  }

  test("BPE tokenization is streaming-safe: stream == batch with a frozen merge table") {
    import graft.xscale.TextAnalysis
    // the merge table is driver-resident tokenizer state learned offline
    // (x62); applying it (x63) is a stateless per-row expression chain, so
    // the SAME call must tokenize a stream identically to batch — the shape
    // of a production ingest that tokenizes documents as they arrive
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(100)
    val merges = TextAnalysis.bpeTrain(docs).map(m => (m._2, m._3))
    assert(merges.nonEmpty)
    val rows = docs.as[(Long, String)].collect().toSeq

    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis.bpeTokenCounts(in.toDF().toDF("doc_id", "text"), merges)
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append").start()
    in.addData(rows: _*)
    q.processAllAvailable()
    q.stop()

    val batch = TextAnalysis.bpeTokenCounts(docs, merges)
    val stream = spark.table("bpe_stream")
    assert(stream.count() == rows.length)
    val diff = stream.exceptAll(batch).union(batch.exceptAll(stream))
    assert(diff.isEmpty, diff.collect().take(3).mkString(";"))
  }
}
