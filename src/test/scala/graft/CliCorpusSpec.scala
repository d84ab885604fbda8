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

  test("corpus --strict additionally applies the repetition rules") {
    val base = tmpDir("cli-corpus-strict")
    val outA = base.getPath + "/plain"
    val outB = base.getPath + "/strict"
    val docs = "/root/testdata/sf0.001/documents.parquet"
    assert(Cli.run(spark, List("corpus", docs, outA)) === 0)
    assert(Cli.run(spark, List("corpus", docs, outB, "--strict")) === 0)
    val plain = spark.read.parquet(outA)
    val strict = spark.read.parquet(outB)
    assert(strict.count() <= plain.count())
    // every strict survivor passes x31's rules (the filter runs BEFORE
    // dedup, so survivors may differ from filtering plain's output when a
    // dup group's representative changes — only the rule guarantee holds)
    val passing = xscale.TextAnalysis.repetitionFilter(
      spark.read.parquet(docs).select("doc_id", "text"))
      .select("doc_id").as[Long].collect().toSet
    val got = strict.select("doc_id").as[Long].collect().toSet
    assert(got.subsetOf(passing))
    assert(got.nonEmpty)
  }

  test("corpus --despan rewrites docs with shared spans removed, token counts consistent") {
    val base = tmpDir("cli-corpus-despan")
    val outA = base.getPath + "/plain"
    val outB = base.getPath + "/despan"
    val docs = "/root/testdata/sf0.001/documents.parquet"
    assert(Cli.run(spark, List("corpus", docs, outA)) === 0)
    assert(Cli.run(spark, List("corpus", docs, outB, "--despan")) === 0)
    val plain = spark.read.parquet(outA)
    val despan = spark.read.parquet(outB)
    // despan survivors are a subset of plain's (fully-emptied docs drop)
    // and nothing ships empty text
    assert(despan.select("doc_id").as[Long].collect().toSet
      .subsetOf(plain.select("doc_id").as[Long].collect().toSet))
    import org.apache.spark.sql.functions._
    assert(despan.filter(col("text") === "").isEmpty)
    // total text volume can only shrink, and n_tok matches the REWRITTEN
    // text (packing ran on the cleaned corpus)
    val volume = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(sum(length(col("text")))).head().getLong(0)
    assert(volume(despan) <= volume(plain))
    val badTok = despan.filter(
      size(xscale.XText.words(col("text"))).cast("long") =!= col("n_tok"))
    assert(badTok.isEmpty)
    // n_chars likewise describes the REWRITTEN text — a stale pre-removal
    // value would skew every downstream consumer of the column (x09)
    val badChars = despan.filter(length(col("text")).cast("long") =!= col("n_chars"))
    assert(badChars.isEmpty)
  }

  test("corpus --dsir keeps every target-lang doc and a score-closed raw subset") {
    val base = tmpDir("cli-corpus-dsir")
    val outA = base.getPath + "/plain"
    val outB = base.getPath + "/dsir"
    // sf0.01 so the raw side is large enough for a non-trivial threshold
    val docs = "/root/testdata/sf0.01/documents.parquet"
    assert(Cli.run(spark, List("corpus", docs, outA)) === 0)
    assert(Cli.run(spark, List("corpus", docs, outB, "--dsir", "en")) === 0)
    val plain = spark.read.parquet(outA)
    val dsir = spark.read.parquet(outB)
    import org.apache.spark.sql.functions._
    // target-language docs are never dropped by the selection stage
    assert(
      dsir.filter(col("lang") === "en").count() ===
        plain.filter(col("lang") === "en").count())
    // raw docs shrink to a strict, score-downward-closed subset
    val rawKept = dsir.filter(col("lang") =!= "en").select("doc_id").as[Long].collect().toSet
    val rawAll = plain.filter(col("lang") =!= "en").select("doc_id").as[Long].collect().toSet
    assert(rawKept.subsetOf(rawAll) && rawKept.nonEmpty && rawKept.size < rawAll.size)
    val scores = xscale.DataPrep
      .dsirWeights(
        xscale.Dedup.dedupExact(
          xscale.TextAnalysis.qualityFilter(spark.read.parquet(docs))
            .select("doc_id", "source", "lang", "text", "n_chars")),
        col("lang") === "en")
      .select("doc_id", "score_e6").as[(Long, Long)].collect().toMap
    val keptMin = rawKept.map(scores).min
    val dropMax = (rawAll -- rawKept).map(scores).max
    assert(keptMin >= dropMax)
  }

  test("corpus stats never re-run the pipeline: job count stays bounded") {
    // regression guard for the job graph: input+kept counts ride ONE
    // annotated scan, deduped/selected count materialized checkpoints,
    // and all output stats are ONE aggregation over the written corpus.
    // Measured 16 jobs plain / 26 with --despan (the pre-fix stats code
    // ran 21 / 31 — two extra output reads plus two extra input passes);
    // bounds carry small headroom for AQE stage-count variation.
    def jobsFor(group: String, args: List[String]): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try assert(Cli.run(spark, args) === 0)
      finally spark.sparkContext.clearJobGroup()
      // statusTracker is fed by the async listener bus — wait for it to
      // settle rather than sleeping a fixed interval
      var n = -1
      var stable = 0
      while (stable < 3) {
        val now = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
        if (now == n) stable += 1 else { n = now; stable = 0 }
        Thread.sleep(100)
      }
      n
    }
    val base = tmpDir("cli-corpus-jobs")
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val plain = jobsFor("jobs-plain", List("corpus", docs, base.getPath + "/plain"))
    assert(plain <= 18, s"plain corpus ran $plain jobs (expected ~16)")
    val despan = jobsFor("jobs-despan",
      List("corpus", docs, base.getPath + "/despan", "--despan"))
    assert(despan <= 28, s"--despan corpus ran $despan jobs (expected ~26)")
  }

  test("corpus rejects a malformed --dsir flag") {
    assert(Cli.run(spark, List(
      "corpus", "/root/testdata/sf0.001/documents.parquet", "/tmp/x", "--dsir")) === 2)
  }

  test("unknown subcommand still exits 2") {
    assert(Cli.run(spark, List("bogus")) === 2)
  }

  test("corpus --scale runs the measured 100 TB dedup recipe; stage list pinned") {
    import org.apache.spark.sql.functions._
    val base = tmpDir("cli-corpus-scale")
    // fixture: the real sf0.001 docs (they pass the quality rules) plus
    // PLANTED duplicate structure — 20 exact copies (id+20000, byte-
    // identical text) and 50 near copies (id+10000, one appended token),
    // with an embedding side whose copies carry near-identical vectors
    val docs0 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exactCopies = docs0.filter(col("doc_id") < 20)
      .withColumn("doc_id", col("doc_id") + 20000L)
    val nearCopies = docs0.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 10000L)
      .withColumn("text", concat(col("text"), lit(" zq")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val docs = docs0.unionByName(exactCopies).unionByName(nearCopies)
    val emb0 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val embCopies = emb0.filter(col("vec_id") < 50)
      .withColumn("vec_id", col("vec_id") + 10000L)
    val emb = emb0.unionByName(embCopies)
    val docsPath = base.getPath + "/docs.parquet"
    val embPath = base.getPath + "/emb.parquet"
    docs.write.parquet(docsPath)
    emb.write.parquet(embPath)

    def runCapture(args: List[String]): String = {
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf)) { assert(Cli.run(spark, args) === 0) }
      buf.toString("UTF-8").linesIterator.filter(_.startsWith("{")).mkString
    }
    def stages(json: String): Seq[String] = {
      val m = """"stages":\[([^\]]*)\]""".r.findFirstMatchIn(json)
      m.get.group(1).split(",").map(_.replaceAll("\"", "")).toSeq
    }

    val plainJson = runCapture(List("corpus", docsPath, base.getPath + "/plain"))
    assert(stages(plainJson) === Seq("quality", "dedup_exact", "split", "pack"))
    val scaleJson = runCapture(List("corpus", docsPath, base.getPath + "/scale", "--scale"))
    assert(stages(scaleJson) === Seq(
      "quality", "dedup_exact", "neardup_simhash",
      "audit_diameter_capped", "audit_lsh_sampled", "split", "pack"))
    val jointJson = runCapture(List(
      "corpus", docsPath, base.getPath + "/joint", "--scale", "--emb", embPath))
    // the stage name carries the auto-chosen text leg: simhash inside the
    // ~1e5-doc narrow boundary (this fixture), minhash past it
    assert(stages(jointJson) === Seq(
      "quality", "dedup_exact", "neardup_joint_imi_simhash",
      "audit_diameter_capped", "audit_lsh_sampled", "split", "pack"))

    // the preset EARNS its stages: exact copies die in both; the planted
    // near copies survive plain (exact-only) and die under --scale
    val plain = spark.read.parquet(base.getPath + "/plain")
    val scale = spark.read.parquet(base.getPath + "/scale")
    assert(plain.filter(col("doc_id") >= 20000L).isEmpty, "exact copies must die in plain")
    val nearInPlain = plain.filter(col("doc_id") >= 10000L && col("doc_id") < 20000L).count()
    val nearInScale = scale.filter(col("doc_id") >= 10000L && col("doc_id") < 20000L).count()
    assert(nearInPlain > 0, "near copies must SURVIVE exact-only dedup")
    assert(nearInScale < nearInPlain,
      s"--scale must remove near-dups: $nearInScale vs $nearInPlain")
    assert(scale.count() < plain.count())
    // capped audits ship beside the corpus
    val diam = spark.read.parquet(base.getPath + "/scale/_audits/cluster_diameter")
    assert(diam.count() > 0 && diam.columns.contains("n_capped"))
    val fid = spark.read.parquet(base.getPath + "/scale/_audits/lsh_fidelity")
    assert(fid.count() > 0)
    // the joint run agrees with text-only on the planted structure (the
    // embedding copies mirror the text copies) and never keeps MORE
    assert(spark.read.parquet(base.getPath + "/joint").count() <= scale.count())
  }

  test("corpus --pdedup drops perceptual media near-dups, keeps the min-id survivor") {
    import org.apache.spark.sql.functions._
    import xscale.PerceptualDedup
    val base = tmpDir("cli-corpus-pdedup")
    val docs0 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // planted: doc 30001 re-posts doc 1's IMAGE brightened +16 under a
    // text only trivially edited (per-doc suffix: exact text dedup cannot
    // see either signal); doc 30002 re-posts doc 2's AUDIO clip re-gained
    // +10, same trick; doc 30003 posts a fresh clip (must survive);
    // doc 30005 re-posts doc 3's image at 2x RESOLUTION — keep-best must
    // keep the LARGER copy and drop the original (x142's rule). The
    // planted rows derive from REAL quality-passing docs so the quality
    // stage keeps them in play.
    val extraFull = docs0.filter(col("doc_id").isin(11L, 12L, 13L, 15L, 17L))
      .withColumn("doc_id", col("doc_id") + 29990L)
      .withColumn("text", concat(col("text"), lit(" zq"), col("doc_id")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val docs = docs0.unionByName(extraFull)
    // media side: every base doc < 100 posts its own fixture image
    // (mutually far at id*5); the planted trio as described; doc 30007
    // re-posts doc 6's VIDEO as a 2x RE-RENDER (the third modality rides
    // the same stage — and the larger re-render must WIN keep-best).
    // Planted bases 11/12/13/15/17 are the quality-passing picks (14 and
    // 16 fail the quality stage and would vanish before pdedup votes)
    val media = ((0L to 99L).map(i => (i, PerceptualDedup.fixtureBmp(i * 5))) ++
      Seq(
        (30001L, PerceptualDedup.fixtureBmpShift(1L * 5, 16)),
        (30002L, PerceptualDedup.fixtureWavShift(2L * 5, 10)),
        (30003L, PerceptualDedup.fixtureWav(7777L * 5)),
        (30007L, PerceptualDedup.fixtureAvi2x(6L * 5)),
        (30005L, PerceptualDedup.fixtureBmp2x(3L * 5))))
      .toDF("doc_id", "payload")
    // docs 2 and 6 post IMAGES above; their re-posts target a clip and a
    // video, so swap their media rows to the matching modality
    val media2 = media.filter(!col("doc_id").isin(2L, 6L))
      .unionByName(Seq(
        (2L, PerceptualDedup.fixtureWav(2L * 5)),
        (6L, PerceptualDedup.fixtureAvi(6L * 5))).toDF("doc_id", "payload"))
    val docsPath = base.getPath + "/docs.parquet"
    val mediaPath = base.getPath + "/media.parquet"
    docs.write.parquet(docsPath)
    media2.write.parquet(mediaPath)
    def runCapture(args: List[String]): String = {
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf)) { assert(Cli.run(spark, args) === 0) }
      buf.toString("UTF-8").linesIterator.filter(_.startsWith("{")).mkString
    }
    val j = runCapture(List("corpus", docsPath, base.getPath + "/out",
      "--pdedup", mediaPath))
    // stage list carries the provenance, FineWeb order (before despan)
    assert(j.contains(""""stages":["quality","dedup_exact","pdedup","split","pack"]"""), j)
    val out = spark.read.parquet(base.getPath + "/out")
    val ids = out.select("doc_id").as[Long].collect().toSet
    // keep-BEST by payload size: the same-size re-posts lose on the
    // doc_id tiebreak (1 and 2 kept), the fresh-clip doc survives, and
    // the 2x re-post WINS over its smaller original (x142's rule — the
    // min-id cut would have kept doc 3 and discarded the best copy)
    assert(!ids.contains(30001L) && !ids.contains(30002L))
    assert(ids.contains(1L) && ids.contains(2L) && ids.contains(30003L))
    assert(ids.contains(30005L) && !ids.contains(3L),
      "the larger re-post must be the survivor")
    // the video modality rides the same stage: the 2x re-render (larger
    // payload) wins keep-best over the original clip
    assert(ids.contains(30007L) && !ids.contains(6L),
      "the larger video re-render must be the survivor")
    // docs with no media row pass the stage untouched
    assert(out.count() > 90)
  }

  test("corpus --pcontain drops trimmed/cropped/excerpted media re-posts, keeps the sources") {
    import org.apache.spark.sql.functions._
    import xscale.PerceptualDedup
    val base = tmpDir("cli-corpus-pcontain")
    val docs0 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // planted under trivially-edited texts (exact text dedup blind):
    // 30001 re-posts frames 10..64 of doc 11's VIDEO (a trim — band
    // hashes differ by design, --pdedup alone would keep both); 30002
    // re-posts the tile-aligned CROP of doc 12's IMAGE; 30003 re-posts
    // the pause-cut EXCERPT of doc 13's CLIP; 30004 re-posts the
    // SPATIAL CROP of doc 17's tiled video (every frame's tiles
    // (1..5, 1..4) — the vsp space, x154: both temporal signals are
    // blind to it; id 30007 = 17 + 29990); 30005 posts a fresh image
    // (must survive). Sources
    // carry MORE shingles, so keep-most keeps them and drops every
    // re-post.
    val extraFull = docs0.filter(col("doc_id").isin(11L, 12L, 13L, 15L, 17L))
      .withColumn("doc_id", col("doc_id") + 29990L)
      .withColumn("text", concat(col("text"), lit(" zq"), col("doc_id")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val docs = docs0.unionByName(extraFull)
    def cimg(img: Long, off: Int) = {
      val tw = PerceptualDedup.CropTilesX - off
      val th = PerceptualDedup.CropTilesY - off
      val levels = Array.tabulate(tw, th)((i, j) =>
        PerceptualDedup.fixtureTileLvl(img, i + off, j + off))
      PerceptualDedup.makeBmp(tw * PerceptualDedup.TileSize, th * PerceptualDedup.TileSize,
        (x, y) => levels(x / PerceptualDedup.TileSize)(y / PerceptualDedup.TileSize))
    }
    def trim(img: Long, from: Int) = PerceptualDedup.makeAvi(4, 4,
      PerceptualDedup.VideoWindows - from,
      (f, _, _) => PerceptualDedup.fixtureFrameVid(img, f + from))
    val media = ((0L to 99L).filter(i => i != 11L && i != 12L && i != 13L && i != 17L)
      .map(i => (i, PerceptualDedup.fixtureBmp(i * 5))) ++
      Seq(
        (11L, PerceptualDedup.fixtureAvi(11L * 5)),
        (12L, cimg(12L * 5, 0)),
        (13L, PerceptualDedup.fixtureWavUtt(13L * 5)),
        (17L, PerceptualDedup.fixtureAviTiles(17L * 5, 0)),
        (30001L, trim(11L * 5, 10)),
        (30002L, cimg(12L * 5, 1)),
        (30003L, PerceptualDedup.fixtureWavUtt(13L * 5, uttOff = PerceptualDedup.UttDrop)),
        (30007L, PerceptualDedup.fixtureAviTiles(17L * 5, 1)),
        (30005L, cimg(8888L * 5, 0))))
      .toDF("doc_id", "payload")
    val docsPath = base.getPath + "/docs.parquet"
    val mediaPath = base.getPath + "/media.parquet"
    docs.write.parquet(docsPath)
    media.write.parquet(mediaPath)
    def runCapture(args: List[String]): String = {
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf)) { assert(Cli.run(spark, args) === 0) }
      buf.toString("UTF-8").linesIterator.filter(_.startsWith("{")).mkString
    }
    // SHARED media path: the combined one-decode frame serves both the
    // band dedup and the containment dedup
    val j = runCapture(List("corpus", docsPath, base.getPath + "/out",
      "--pdedup", mediaPath, "--pcontain", mediaPath))
    assert(j.contains(
      """"stages":["quality","dedup_exact","pdedup","pcontain","split","pack"]"""), j)
    val out = spark.read.parquet(base.getPath + "/out")
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(30001L) && ids.contains(11L), "video trim dropped, source kept")
    assert(!ids.contains(30002L) && ids.contains(12L), "image crop dropped, source kept")
    assert(!ids.contains(30003L) && ids.contains(13L), "audio excerpt dropped, source kept")
    assert(!ids.contains(30007L) && ids.contains(17L), "spatial crop dropped, source kept")
    assert(ids.contains(30005L), "the fresh image survives")
    // --pcontain on its OWN media path (no --pdedup) takes the
    // standalone decode route and drops the same re-posts
    val j2 = runCapture(List("corpus", docsPath, base.getPath + "/out2",
      "--pcontain", mediaPath))
    assert(j2.contains(""""stages":["quality","dedup_exact","pcontain","split","pack"]"""), j2)
    val ids2 = spark.read.parquet(base.getPath + "/out2")
      .select("doc_id").as[Long].collect().toSet
    assert(!ids2.contains(30001L) && !ids2.contains(30002L) && !ids2.contains(30003L) &&
      !ids2.contains(30007L))
    assert(ids2.contains(11L) && ids2.contains(12L) && ids2.contains(13L) &&
      ids2.contains(17L))
  }

  test("corpus --mquality drops docs with dead media, keeps the rest") {
    import org.apache.spark.sql.functions._
    import xscale.PerceptualDedup
    val base = tmpDir("cli-corpus-mquality")
    val docsPath = "/root/testdata/sf0.001/documents.parquet"
    // quality-passing docs (checked against the plain run below): 1 posts
    // an all-black image, 2 an all-silence clip, 6 an all-black video —
    // all three must drop; 5 posts a healthy image, 7 a healthy clip;
    // 8 posts undecodable bytes (must NOT drop — the gate never drops
    // what it cannot read); everyone else has no media row
    val media = Seq(
      (1L, PerceptualDedup.makeBmp(9, 8, (_, _) => 5)),
      (2L, PerceptualDedup.makeWav8(8000, Array.fill(160)(128))),
      (6L, PerceptualDedup.makeAvi(4, 4, 20, (_, _, _) => 5)),
      (5L, PerceptualDedup.fixtureBmp(5L * 5)),
      (7L, PerceptualDedup.fixtureWav(7L * 5)),
      (8L, "not decodable media".getBytes)
    ).toDF("doc_id", "payload")
    val mediaPath = base.getPath + "/media.parquet"
    media.write.parquet(mediaPath)
    def runCapture(args: List[String]): String = {
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf)) { assert(Cli.run(spark, args) === 0) }
      buf.toString("UTF-8").linesIterator.filter(_.startsWith("{")).mkString
    }
    val jPlain = runCapture(List("corpus", docsPath, base.getPath + "/plain"))
    val plainIds = spark.read.parquet(base.getPath + "/plain")
      .select("doc_id").as[Long].collect().toSet
    // the planted docs must be in play before the gate can show its cut
    assert(Set(1L, 2L, 5L, 6L, 7L, 8L).subsetOf(plainIds), plainIds.toSeq.sorted.take(12))
    val j = runCapture(List("corpus", docsPath, base.getPath + "/out",
      "--mquality", mediaPath))
    assert(j.contains(""""stages":["quality","mquality","dedup_exact","split","pack"]"""), j)
    // the gate's cut is its own stats figure — kept/deduped attribution
    // stays honest (the three planted dead-media docs)
    assert(j.contains(""""mquality_dropped":3"""), j)
    val ids = spark.read.parquet(base.getPath + "/out")
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(1L) && !ids.contains(2L) && !ids.contains(6L),
      "dead media must drop")
    assert(ids.contains(5L) && ids.contains(7L) && ids.contains(8L),
      "healthy and undecodable media must pass")
    assert((plainIds -- ids) === Set(1L, 2L, 6L), "only the dead-media docs drop")
  }
}
