package graft.xscale

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Battery-scope media-fixture sidecar — the ScaleSmoke sidecar rule
  * (`ScaleSmoke.scala`, `mixed_media.parquet`) applied to the TIMED bench
  * battery: the registered media queries synthesize closed-form BMP/WAV/
  * AVI fixtures per run, and at sf0.1 that synthesis (one md5 per frame
  * or per tile, per-pixel byte fills) dominated several timed medians —
  * x148 spent ~15 s/run mostly on 2.3M per-pixel md5s, burying regression
  * signal on the actual match plan under fixture cost (VERDICT r14
  * "Next round" #2).
  *
  * [[graft.Bench]] sets [[DirProp]] to a FRESH per-battery temp directory;
  * when set, a fixture frame materializes once under its key and every
  * later evaluation reads the parquet back — so a media query's timed
  * median prices the READ + ENGINE (what a real corpus run pays: media
  * comes from storage, not from a generator). The first of the battery's
  * N runs pays the one materialization; the reported per-query MEDIAN
  * (N ≥ 3) excludes it. The directory is fresh per battery, so staleness
  * across code versions is impossible by construction.
  *
  * UNSET everywhere else — Verify (the DuckDB oracle gate must keep
  * pinning the full encode → decode chain), specs, and library callers
  * all build inline.
  */
object FixtureSidecar {

  /** System property naming the battery's fixture directory. */
  val DirProp = "graft.bench.fixtureDir"

  /** Run `build` through the sidecar under `key` (callers append a
    * sanitized sf-dir tag — fixture content derives from the documents
    * table's ids).
    */
  def apply(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    sys.props.get(DirProp) match {
      case Some(dir) =>
        val path = s"$dir/$key.parquet"
        // probe the _SUCCESS marker, not the directory: an interrupted
        // first write leaves partial part-files behind, and a
        // directory-existence probe would silently serve the truncated
        // fixture to every later run (and to every query SHARING the
        // key); Overwrite mode clears the leftovers on the rebuild
        if (!new java.io.File(path, "_SUCCESS").exists()) {
          // write at session width (untimed, first pass only): a single
          // part-file would pin every timed decode that scans this fixture
          // to one or two tasks — a small-input artifact a real corpus
          // (many files) never has. Width follows the session, not a
          // constant.
          val n = math.max(
            spark.sparkContext.defaultParallelism,
            spark.sessionState.conf.numShufflePartitions)
          build.repartition(n).write.mode(SaveMode.Overwrite).parquet(path)
        }
        spark.read.parquet(path)
      case None => build
    }

  /** A filesystem-safe tag for an sf-dir path, for sidecar keys. */
  def dirTag(dir: String): String = dir.replaceAll("[^A-Za-z0-9]", "_")
}
