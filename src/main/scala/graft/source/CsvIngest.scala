package graft.source

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV ingest source: directory scan + per-file parse + filename→source-info
  * extraction, re-expressed as ONE distributed Spark scan instead of the
  * reference's sequential per-file loop (reference: datalake/client.go:33-79,
  * csv/csv.go:40-100).
  *
  * Scale posture: files are grouped by their (lowercased) header signature so
  * each distinct schema is a single `spark.read.csv` over ALL its files — at
  * 100 TB a source's exports share one header, so the number of distributed
  * scans stays O(#sources), never O(#files). Only the 1-line header probe is
  * driver-side.
  */
object CsvIngest {

  /** (dataSource, accountId) derived from a filename
    * (reference: datalake/datasource/generic_extractor.go:17-41).
    */
  final case class SourceInfo(dataSource: String, accountId: String)

  private val ChaseRe = "chase(\\d{4})".r

  /** Driver-side extractor, exact semantics of generic_extractor.go:17-41:
    * lowercase the filename; `chase(\d{4})` ⇒ ("chase", captured digits);
    * contains "synthetic" ⇒ ("synthetic", "0000"); else None (error).
    */
  def extractInfo(filename: String): Option[SourceInfo] = {
    val f = filename.toLowerCase
    ChaseRe.findFirstMatchIn(f) match {
      case Some(m)                          => Some(SourceInfo("chase", m.group(1)))
      case None if f.contains("synthetic")  => Some(SourceInfo("synthetic", "0000"))
      case None                             => None
    }
  }

  /** Column-level variant of [[extractInfo]] over a filename column, used on
    * `input_file_name()` so source attribution happens inside the distributed
    * scan (SURVEY §2.1 S5). Unknown sources yield null data_source and are
    * routed to failure stats, mirroring ErrUnableToExtractInfo.
    */
  def withSourceInfo(df: DataFrame): DataFrame = {
    // input_file_name() returns a URI whose path segments are URL-encoded;
    // decode so filenames with spaces/%xx match the on-disk name used by the
    // per-file accounting and the move-to-processed step. URI paths keep
    // '+' literal but url_decode applies form semantics ('+' → ' '), so
    // protect literal pluses by re-encoding them first.
    val rawSeg = element_at(split(input_file_name(), "/"), -1)
    val fname = lower(url_decode(regexp_replace(rawSeg, "\\+", "%2B")))
    val chaseAcct = regexp_extract(fname, "chase(\\d{4})", 1)
    df.withColumn("_file", fname)
      .withColumn(
        "data_source",
        when(chaseAcct =!= "", lit("chase"))
          .when(fname.contains("synthetic"), lit("synthetic"))
          .otherwise(lit(null).cast(StringType)))
      .withColumn(
        "account_id",
        when(chaseAcct =!= "", chaseAcct)
          .when(fname.contains("synthetic"), lit("0000"))
          .otherwise(lit(null).cast(StringType)))
  }

  /** File-type predicate (reference: datalake/datalake.go:321-328): keep
    * regular files ending `.csv` (case-insensitive suffix match on `.csv`
    * or `.CSV` — the reference checks exactly those two spellings).
    */
  def isCsvFile(f: java.io.File): Boolean =
    f.isFile && (f.getName.endsWith(".csv") || f.getName.endsWith(".CSV"))

  /** Read the first line of a file (header probe), driver-side. Empty or
    * absent header ⇒ None (empty-file tolerance, reference csv/csv.go:57-61).
    */
  private def readHeader(path: java.io.File): Option[Seq[String]] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      val it = src.getLines()
      if (it.hasNext) {
        val line = it.next()
        if (line.trim.isEmpty) None
        else Some(parseCsvLine(line).map(_.trim.toLowerCase)) // header lowercase, csv/csv.go:64-67
      } else None
    } finally src.close()
  }

  /** Minimal RFC-4180 single-line field splitter for the header probe only
    * (data rows are parsed by Spark's CSV reader, never by this).
    */
  private[source] def parseCsvLine(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') { cur += '"'; i += 1 }
        else if (c == '"') inQ = false
        else cur += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.result(); cur.clear()
        case _   => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  /** Scan a directory of bank-export CSVs into one raw DataFrame of
    * all-string columns (lowercased headers) + `_file`, `data_source`,
    * `account_id` lineage columns.
    *
    * Semantics replicated from the reference:
    *  - only `.csv`/`.CSV` regular files (datalake.go:321-328); others are
    *    reported by [[skippedFiles]]
    *  - header lowercased (csv/csv.go:64-67)
    *  - ragged rows (fewer fields than header) DROPPED, rows with EXTRA
    *    fields KEPT with the extras ignored — the reference reads with
    *    `FieldsPerRecord = -1` (csv/csv.go:53) and only skips
    *    `len(record) < len(header)` (csv/csv.go:82-84). Spark's PERMISSIVE
    *    mode marks both kinds of token mismatch in `_corrupt_record`; a
    *    short row is distinguished by its null tail column, and the drop is
    *    an explicit filter in the plan (DROPMALFORMED would also drop the
    *    extra-field rows — and is silently bypassed by `count()`-only plans
    *    where nothing is parsed)
    *  - empty file ⇒ 0 rows, no error (csv/csv.go:57-61)
    *  - schema never inferred: all columns string (csv parser emits
    *    map[string]string, csv/parser.go:6-13)
    */
  def readCsvDir(spark: SparkSession, dir: String): DataFrame = {
    // With CSV column pruning (default on), univocity parses only the
    // indexes a plan needs, so a ragged row is only *detected* when the
    // pruned subset happens to include a missing index — `count()`-shaped
    // plans would keep rows that full scans drop. Ingest correctness
    // (per-file valid/raw accounting) needs one answer, so pin pruning off
    // for this session; ingest projects nearly every column anyway.
    spark.conf.set("spark.sql.csv.parser.columnPruning.enabled", "false")
    val files = listCsvFiles(dir)
    val groups: Map[Seq[String], Seq[java.io.File]] =
      files.flatMap(f => readHeader(f).map(h => (h, f))).groupBy(_._1).map {
        case (h, fs) => (h, fs.map(_._2))
      }
    val parts = groups.toSeq.map { case (header, fs) =>
      val cols = dedupHeader(header)
      val schema = StructType(
        (cols :+ "_corrupt_record").map(StructField(_, StringType)))
      val df = spark.read
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema)
        .csv(fs.map(_.getPath): _*)
        // reference semantics (csv/csv.go:82-84 with FieldsPerRecord=-1):
        // drop only rows SHORTER than the header; keep extra-field rows,
        // extras ignored. A null tail column can't distinguish "missing
        // field" from "empty field" (both parse to null), so the raw
        // corrupt line's fields are counted with a CSV-aware expression.
        // The last disjunct is always false; it exists so aggressive
        // column pruning (e.g. a bare count()) still references a real
        // data column — Spark rejects scans whose only referenced column
        // is the corrupt-record column [QUERY_ONLY_CORRUPT_RECORD_COLUMN],
        // and the optimizer can't eliminate a length() on live data.
        .filter(
          col("_corrupt_record").isNull ||
            org.apache.spark.sql.graftnative.api
              .csvFieldCount(col("_corrupt_record")) >= cols.size.toLong ||
            length(coalesce(col(cols.head), lit(""))) < 0)
        .drop("_corrupt_record")
      withSourceInfo(df)
    }
    if (parts.isEmpty) emptyRaw(spark)
    else parts.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Files in `dir` that the ingest must report as failures ("Not a valid
    * CSV file" / unextractable source), reference datalake.go:82-89.
    */
  def skippedFiles(dir: String): Seq[(String, String)] = {
    val all = Option(new java.io.File(dir).listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    val notCsv = all.filterNot(isCsvFile).map(f => f.getName -> "Not a valid CSV file")
    val noSource = all.filter(isCsvFile).collect {
      case f if extractInfo(f.getName).isEmpty =>
        f.getName -> "unable to extract source info from filename"
    }
    notCsv ++ noSource
  }

  def listCsvFiles(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles())
      .map(_.toSeq)
      .getOrElse(Seq.empty)
      .filter(isCsvFile)
      .filter(f => extractInfo(f.getName).isDefined)
      .sortBy(_.getName)

  /** Duplicate lowercased header names: last occurrence wins in the
    * reference's colIndex map (csv/csv.go:64-67); we suffix earlier
    * duplicates so the Spark schema stays legal.
    */
  private def dedupHeader(h: Seq[String]): Seq[String] = {
    val lastIdx = h.zipWithIndex.groupBy(_._1).map { case (n, xs) => (n, xs.last._2) }
    h.zipWithIndex.map { case (n, i) => if (lastIdx(n) == i) n else s"${n}__dup$i" }
  }

  private def emptyRaw(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("_file", StringType),
      StructField("data_source", StringType),
      StructField("account_id", StringType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
