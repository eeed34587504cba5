package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-level min/max data skipping — an Iceberg/Delta-style zone-map
  * manifest over a plain parquet table, without adopting a table
  * format. Spark's parquet reader already prunes ROW GROUPS inside a
  * file it has opened (PushedFilters); what it cannot avoid at 100 TB
  * is opening the files at all: listing 100k objects, reading 100k
  * footers, scheduling 100k splits to discover that 99k of them
  * cannot match the predicate. The manifest moves that decision to
  * one tiny driver-side filter over (#files) rows, so a selective
  * interval query schedules only the files whose [min, max] range
  * intersects it — the same stats Iceberg keeps per data file in its
  * manifests.
  *
  * The reference's closest surface is its glob-driven `read_files`
  * listing (/root/reference/…/read_files_task.rs:107-114), which
  * always streams every matched file; file skipping is the capability
  * its "only read columns used in the query" TODO family
  * (/root/reference/DEV_NOTES.md:123) points toward, one level up.
  *
  * Correctness: a file whose manifest row has NULL min/max for a
  * column holds no non-null values of it, and an interval predicate
  * matches no null — so the SQL filter `min_c <= hi AND max_c >= lo`
  * (null → dropped) is exactly the may-match test. Manifest rows
  * carry each file's (size, mtime) SIGNATURE, so both the coverage
  * guard and [[update]] detect not just added/removed files but a
  * file REWRITTEN IN PLACE — the silent-row-loss case where stale
  * stats would wrongly prune it. */
object ZoneMaps {

  /** One row per data file: per-column min/max, row count, and the
    * file's (size, mtime-millis) signature — computed in ONE
    * column-pruned distributed pass grouped by `_metadata.file_path`
    * (no driver footer-walking; the build parallelizes like any
    * aggregation). Shared by [[write]] and [[update]] so full builds
    * and incremental reconciles can never desynchronize. */
  private def statsFor(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
      Seq(count(lit(1)).as("n_rows"),
        max(col("__fsize")).as("file_size"),
        max(col("__fmtime")).as("file_mtime"))
    df.select(Seq(col("_metadata.file_path").as("file"),
        col("_metadata.file_size").as("__fsize"),
        unix_millis(col("_metadata.file_modification_time")).as("__fmtime")) ++
        cols.map(col): _*)
      .groupBy("file")
      .agg(aggs.head, aggs.tail: _*)
  }

  private def norm(s: String): String = new Path(s).toString

  /** Driver listing of the table's data files → normalized path →
    * (size, mtime millis). One recursive FS listing, no Spark job —
    * the same cost the stale guard already paid via inputFiles, now
    * yielding the signature too. */
  private def listLive(spark: SparkSession,
                       tableDir: String): Map[String, (Long, Long)] = {
    val p = new Path(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = Map.newBuilder[String, (Long, Long)]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        out += norm(s.getPath.toString) -> ((s.getLen, s.getModificationTime))
    }
    out.result()
  }

  /** Build the manifest from scratch. Overwrites `manifestDir` (a
    * single small parquet). */
  def write(spark: SparkSession, tableDir: String, manifestDir: String,
            cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "zone map needs at least one column")
    statsFor(spark.read.parquet(tableDir), cols)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestDir)
  }

  /** Incrementally reconcile the manifest with the table: stats are
    * recomputed ONLY for files the manifest has never seen or whose
    * (size, mtime) signature changed — one pruned pass over exactly
    * those paths, O(changed data) not O(table) — and rows for files
    * that no longer match anything on disk are dropped
    * (compaction/deletes; an in-place rewrite counts on both sides).
    * Returns (filesRefreshed, rowsDropped). Surviving rows ride a
    * driver-side collect — the manifest is one row per file, the same
    * driver-bounded scale as the listing itself. The column set is
    * frozen by the existing manifest's schema. */
  def update(spark: SparkSession, tableDir: String,
             manifestDir: String): (Int, Int) = {
    // update() reconciles OUT-OF-BAND table changes by contract, so
    // Spark's cached file statuses (lengths, listings) must be
    // dropped first — a file rewritten in place would otherwise be
    // read with its stale cached length. refreshByPath drops cached
    // query data; the status cache needs the bridge.
    spark.catalog.refreshByPath(tableDir)
    org.apache.spark.sql.graftbridge.FileStatusCacheBridge.invalidateAll(spark)
    val existing = spark.read.parquet(manifestDir)
    val cols: Seq[String] = existing.schema.fieldNames.toSeq
      .collect { case n if n.startsWith("min_") => n.stripPrefix("min_") }
    val existingRows = existing.collect()
    val live = listLive(spark, tableDir)
    val survivors = existingRows.filter { r =>
      live.get(norm(r.getAs[String]("file")))
        .contains((r.getAs[Long]("file_size"), r.getAs[Long]("file_mtime")))
    }
    val survivorNames = survivors.map(r => norm(r.getAs[String]("file"))).toSet
    val fresh = live.keys.filterNot(survivorNames.contains).toSeq.sorted
    val newStats =
      if (fresh.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          existing.schema)
      else statsFor(spark.read.parquet(fresh: _*), cols)
        .select(existing.schema.fieldNames.map(col).toIndexedSeq: _*)
    // `existing` is already collected to driver rows, and newStats
    // reads only table files — the manifest dir is not an input of
    // this write, so overwriting it directly is safe
    newStats.unionByName(
        spark.createDataFrame(
          spark.sparkContext.parallelize(survivors.toIndexedSeq, 1), existing.schema))
      .coalesce(1).write.mode("overwrite").parquet(manifestDir)
    (fresh.size, existingRows.length - survivors.length)
  }

  /** Files that MAY contain rows with `c` in [lo, hi], plus the total
    * file count (for observability/specs) — ONE read of the tiny
    * manifest (the may-match test is evaluated in the same pass that
    * lists it).
    *
    * `verifyCoverage` (default true) fails loud on a stale manifest:
    * a file added, removed, or REWRITTEN IN PLACE since the manifest
    * was built (signature compare — name, size, mtime). The guard
    * costs a table LISTING per read; that is the defensive default
    * for ad-hoc use, but a serving path whose writes run [[update]]
    * on a managed cadence (the store convention everywhere else in
    * this engine) should pass `verifyCoverage = false` and keep the
    * read at O(matching files) — otherwise the listing the manifest
    * exists to avoid is re-paid per query. */
  def prunedFiles(spark: SparkSession, tableDir: String, manifestDir: String,
                  c: String, lo: Any, hi: Any,
                  verifyCoverage: Boolean = true): (Seq[String], Int) = {
    val m = spark.read.parquet(manifestDir)
      .select(col("file"),
        (col(s"min_$c") <= lit(hi) && col(s"max_$c") >= lit(lo)).as("keep"),
        col("file_size"), col("file_mtime"))
      .collect()
    if (verifyCoverage) {
      val manifestSig = m.map(r =>
        norm(r.getString(0)) -> ((r.getLong(2), r.getLong(3)))).toMap
      val liveSig = listLive(spark, tableDir)
      require(manifestSig == liveSig,
        s"[STALE_ZONEMAP] manifest at $manifestDir disagrees with the table " +
          s"at $tableDir (${manifestSig.size} vs ${liveSig.size} files; " +
          s"missing=${(liveSig.keySet -- manifestSig.keySet).take(3).mkString(",")} " +
          s"extra=${(manifestSig.keySet -- liveSig.keySet).take(3).mkString(",")} " +
          s"resigned=${manifestSig.collect { case (f, s) if liveSig.get(f).exists(_ != s) => f }
            .take(3).mkString(",")}) — run ZoneMaps.update")
    }
    // null `keep` = null stats = no non-null values in that file: skip
    val kept = m.filter(r => !r.isNullAt(1) && r.getBoolean(1))
      .map(_.getString(0)).toSeq
    (kept, m.length)
  }

  /** Interval read through the manifest: rows of the table with `c`
    * BETWEEN lo AND hi, scanning only may-match files. Equals the
    * full-scan filter by the zone-map invariant; the residual filter
    * still applies (and pushes down) inside the surviving files. The
    * schema comes from the surviving files' own footers — the full
    * table is only consulted (for its schema) when everything was
    * pruned. */
  def readPruned(spark: SparkSession, tableDir: String, manifestDir: String,
                 c: String, lo: Any, hi: Any,
                 verifyCoverage: Boolean = true): DataFrame = {
    val (files, _) =
      prunedFiles(spark, tableDir, manifestDir, c, lo, hi, verifyCoverage)
    val base =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          spark.read.parquet(tableDir).schema)
      else spark.read.parquet(files: _*)
    base.filter(col(c).between(lit(lo), lit(hi)))
  }
}
