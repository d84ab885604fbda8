package graft.source

import java.util.zip.GZIPOutputStream

import graft.SparkSpec

/** JSONL ingest: schema-enforced read, line-level quarantine, gzip shards,
  * normalization into the documents shape.
  */
class JsonlIngestSpec extends SparkSpec {
  import spark.implicits._

  private def writeGz(dir: java.io.File, name: String, lines: Seq[String]): Unit = {
    val out = new GZIPOutputStream(new java.io.FileOutputStream(new java.io.File(dir, name)))
    out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    out.close()
  }

  test("good lines normalize; malformed, id-less and empty-text lines quarantine with reasons") {
    val dir = tmpDir("jsonl")
    writeFile(dir, "shard0.jsonl", Seq(
      """{"doc_id": 1, "source": " Web ", "lang": "EN", "text": "  alpha beta gamma "}""",
      """{"doc_id": 2, "text": "delta epsilon"}""", // missing source/lang -> defaults
      """{"doc_id": 3, "source": "web", "lang": "en", "text": "   "}""", // empty text
      """{"source": "web", "lang": "en", "text": "no id here"}""", // missing doc_id
      """this is not json at all""",
      """{"doc_id": 6, "truncated": """ // malformed
    ).mkString("\n"))
    val (good, quarantined) = JsonlIngest.ingest(spark, dir.getPath)
    val g = good.orderBy("doc_id")
      .select("doc_id", "source", "lang", "text", "n_chars")
      .as[(Long, String, String, String, Long)].collect().toSeq
    // trimmed text, lowercased source/lang, defaults for absent fields
    assert(g === Seq(
      (1L, "web", "en", "alpha beta gamma", 16L),
      (2L, "unknown", "und", "delta epsilon", 13L)))
    // no n_tok in the output: the canonical documents schema doesn't carry
    // it, and downstream packing derives its own from the text it sees
    assert(!good.columns.contains("n_tok"))
    val (nGood, nBad, reasons) = JsonlIngest.stats(good, quarantined)
    assert(nGood === 2L && nBad === 4L)
    assert(reasons === Map("malformed_json" -> 2L, "missing_doc_id" -> 1L, "empty_text" -> 1L))
    // quarantined malformed lines keep the raw text for forensics
    val raws = quarantined.filter($"reason" === "malformed_json")
      .select("raw").as[String].collect().toSet
    assert(raws.exists(_.contains("not json at all")))
  }

  test("gzip shards read transparently beside plain shards, one distributed scan") {
    val dir = tmpDir("jsonl-gz")
    writeFile(dir, "a.jsonl",
      """{"doc_id": 10, "source": "s1", "lang": "en", "text": "plain shard doc"}""")
    writeGz(dir, "b.jsonl.gz", Seq(
      """{"doc_id": 11, "source": "s2", "lang": "de", "text": "gz shard doc one"}""",
      """{"doc_id": 12, "source": "s2", "lang": "de", "text": "gz shard doc two"}"""))
    val (good, quarantined) = JsonlIngest.ingest(spark, dir.getPath)
    assert(good.count() === 3L && quarantined.isEmpty)
    assert(good.filter($"source" === "s2").count() === 2L)
    // the output is directly consumable by the xscale operators
    val deduped = graft.xscale.Dedup.dedupExact(good)
    assert(deduped.count() === 3L)
  }

  test("an empty directory yields empty frames, not a failure") {
    val dir = tmpDir("jsonl-empty")
    writeFile(dir, "empty.jsonl", "")
    val (good, quarantined) = JsonlIngest.ingest(spark, dir.getPath)
    assert(good.isEmpty && quarantined.isEmpty)
  }
}
