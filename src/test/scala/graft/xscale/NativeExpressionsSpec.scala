package graft.xscale

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative

import graft.SparkSpec

/** The native codegen expressions must be bit-identical to the interpreted
  * higher-order-function formulations they replaced (which are themselves
  * oracle-verified against DuckDB) — checked over generated inputs through
  * the DataFrame layer, so the codegen path is what's exercised.
  */
class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("DotProduct == aggregate(zip_with(_*_)) left-fold, bit-identical") {
    val rows = Seq.fill(50)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1))) :+ ((Seq.empty[Double], Seq.empty[Double]))
    val df = rows.toDF("a", "b")
    val mismatch = df.select(
      graftnative.api.dot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, x) => s + x).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(mismatch.count() === 0)
  }

  test("SimHash60 == nested interpreted aggregate formula") {
    val rows = Seq.fill(30)(Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong() >>> 4))
    val df = rows.toDF("hs")
    val mismatch = df.select(
      graftnative.api.simhash60(col("hs")).as("fast"),
      expr(
        "aggregate(sequence(0, 59), 0L, (acc, k) -> acc + IF(" +
          "aggregate(hs, 0L, (a, h) -> a + IF(shiftright(h, k) % 2 = 1, 1L, -1L)) > 0, " +
          "shiftleft(1L, k), 0L))").as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(mismatch.count() === 0)
  }

  test("ShingleHash60 == transform(shingles(words(text)), h60)") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two",            // shorter than k ⇒ whole text is one shingle
      "a a a a a a",        // repeated shingles ⇒ distinct
      "  leading and trailing  ",
      "tabs\tand\nnewlines between words",
      "single")
    val df = texts.toDF("text")
    val mismatch = df.select(
      graftnative.api.shingleHash60(col("text"), 3).as("fast"),
      transform(XText.shingles(XText.words(col("text")), 3), s => XHash.h60(s)).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(mismatch.collect().toSeq === Seq.empty)
  }

  test("MinHashSig == array_min(transform(hs, permutation_i)) for every i") {
    import Dedup.{As, Bs, K}
    import XHash.P
    val rows = Seq.fill(30)(Seq.fill(1 + rnd.nextInt(50))(rnd.nextLong() >>> 4))
    val df = rows.toDF("hs")
    val slow = (0 until K).map { i =>
      array_min(transform(col("hs"), h => (lit(As(i)) * (h % P) + lit(Bs(i))) % P)).as(s"slow$i")
    }
    val withBoth = df.select(
      (graftnative.api.minhashSig(col("hs"), K).as("sig") +: slow): _*)
    val mismatch = (0 until K)
      .map(i => withBoth.filter(col("sig")(i) =!= col(s"slow$i")).count())
      .sum
    assert(mismatch === 0)
  }

  test("TokenHash60 == transform(words(text), h60), duplicates and order kept") {
    val texts = Seq(
      "the quick brown fox",
      "dup dup dup",
      "  leading space",
      "trailing space ",
      "single",
      "tabs\tand\nnewlines")
    val df = texts.toDF("text")
    val mismatch = df.select(
      graftnative.api.tokenHash60(col("text")).as("fast"),
      transform(XText.words(col("text")), w => XHash.h60(w)).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(mismatch.collect().toSeq === Seq.empty)
  }

  test("CsvFieldCount handles quoting like the reference's csv.Reader") {
    val cases = Seq(
      ("a,b,c", 3L),
      ("a", 1L),
      ("", 1L),
      ("a,\"b,with,commas\",c", 3L),
      ("a,\"escaped \"\" quote, comma\",c", 3L),
      ("a,b,", 3L),
      (",,", 3L),
      ("\"q\",\"\",3", 3L))
    val df = cases.toDF("line", "expected")
    val mismatch = df.filter(
      graftnative.api.csvFieldCount(col("line")) =!= col("expected"))
    assert(mismatch.collect().toSeq === Seq.empty)
  }

  test("ShingleHash60 matches the driver-side XHash.h60 on a known shingle") {
    val df = Seq("alpha beta gamma").toDF("text")
    val hs = df.select(graftnative.api.shingleHash60(col("text"), 3)).collect()(0)
      .getSeq[Long](0)
    assert(hs === Seq(XHash.h60("alpha beta gamma")))
  }

  test("WindowHash60: positional, duplicates kept, empty below k, h60-compatible") {
    val hs = Seq("a b a b a").toDF("text")
      .select(graftnative.api.windowHash60(col("text"), 2)).collect()(0).getSeq[Long](0)
    // windows: "a b","b a","a b","b a" — positions preserved, dups kept
    assert(hs === Seq(
      XHash.h60("a b"), XHash.h60("b a"), XHash.h60("a b"), XHash.h60("b a")))
    val short = Seq("one two").toDF("text")
      .select(graftnative.api.windowHash60(col("text"), 3)).collect()(0).getSeq[Long](0)
    assert(short.isEmpty) // NO whole-text fallback for positional consumers
  }

  test("BigramHash60: (prefix, bigram) hash pairs in document order") {
    val rows = Seq("a b c").toDF("text")
      .select(explode(graftnative.api.bigramHash60(col("text"))).as("z"))
      .selectExpr("z.ph", "z.bh")
      .as[(Long, Long)].collect().toSeq
    assert(rows === Seq(
      (XHash.h60("a"), XHash.h60("a b")),
      (XHash.h60("b"), XHash.h60("b c"))))
    val short = Seq("solo").toDF("text")
      .select(graftnative.api.bigramHash60(col("text"))).collect()(0).getSeq[Any](0)
    assert(short.isEmpty)
  }

  test("CharProfile: codepoints, categories and collision sum match a driver recount") {
    // ascii, non-ascii (incl. a supplementary-plane codepoint and U+FFFD),
    // control chars in and out of the \t\n\r exemption, empty string
    val texts = Seq(
      "aabbc",
      "café � naïve",
      "tab\tok\nbell\u0007del\u007f",
      "😀😀 twice", // U+1F600 twice: 2 codepoints, 4 chars
      "")
    val rows = texts.toDF("text")
      .select(graftnative.api.charProfile(col("text")).as("p"))
      .select("p.n_cp", "p.n_nonascii", "p.n_ctrl", "p.n_repl", "p.coll_num", "p.n_distinct")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    texts.zip(rows).foreach { case (t, (nCp, nNa, nCtrl, nRepl, coll, nDist)) =>
      val cps = t.codePoints().toArray
      val counts = cps.groupBy(identity).map { case (_, v) => v.length.toLong }
      assert(nCp == cps.length.toLong)
      assert(nNa == cps.count(_ > 0x7f).toLong)
      assert(nCtrl == cps.count(c =>
        (c < 0x20 && c != '\t' && c != '\n' && c != '\r') || c == 0x7f).toLong)
      assert(nRepl == cps.count(_ == 0xfffd).toLong)
      assert(coll == counts.map(c => c * (c - 1)).sum)
      assert(nDist == counts.size.toLong)
    }
  }
}
