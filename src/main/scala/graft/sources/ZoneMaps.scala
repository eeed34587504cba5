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
  * (null → dropped) is exactly the may-match test. A file missing
  * from the manifest entirely is the dangerous case (silently dropped
  * rows), so [[prunedFiles]] refuses to serve from a manifest whose
  * file set differs from the live listing — rebuild after any table
  * write; at scale, maintain the manifest with the same
  * generation-swap cadence as the stores. */
object ZoneMaps {

  /** Build the manifest: one row per data file with per-column
    * min/max + row count, from ONE column-pruned distributed pass
    * grouped by `_metadata.file_path` (no driver footer-walking — the
    * build parallelizes like any aggregation). Overwrites
    * `manifestDir` (a single small parquet). */
  def write(spark: SparkSession, tableDir: String, manifestDir: String,
            cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "zone map needs at least one column")
    val df = spark.read.parquet(tableDir)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    df.select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
      .groupBy("file")
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestDir)
  }

  /** Incrementally reconcile the manifest with the table: compute
    * stats ONLY for files the manifest has never seen (one pruned
    * pass over exactly those paths — O(new data), not O(table)) and
    * drop rows for files that no longer exist (compaction/deletes).
    * Returns (filesAdded, filesRemoved). The surviving existing rows
    * ride through a driver-side collect — the manifest is one row per
    * file, the same driver-bounded scale as the file listing itself.
    * The column set is frozen by the existing manifest's schema. */
  def update(spark: SparkSession, tableDir: String,
             manifestDir: String): (Int, Int) = {
    val existing = spark.read.parquet(manifestDir)
    val cols: Seq[String] = existing.schema.fieldNames.toSeq
      .collect { case n if n.startsWith("min_") => n.stripPrefix("min_") }
    val norm = (s: String) => new Path(s).toString
    val existingRows = existing.collect()
    val known: Map[String, org.apache.spark.sql.Row] =
      existingRows.map(r => norm(r.getAs[String]("file")) -> r).toMap
    val live = spark.read.parquet(tableDir).inputFiles
    val liveSet = live.map(norm).toSet
    val newFiles = live.filter(f => !known.contains(norm(f)))
    val survivors = existingRows.filter(r => liveSet.contains(norm(r.getAs[String]("file"))))
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    val newStats =
      if (newFiles.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          existing.schema)
      else spark.read.parquet(newFiles.toIndexedSeq: _*)
        .select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
        .groupBy("file")
        .agg(aggs.head, aggs.tail: _*)
        .select(existing.schema.fieldNames.map(col).toIndexedSeq: _*)
    val merged = newStats.unionByName(
      spark.createDataFrame(
        spark.sparkContext.parallelize(survivors.toIndexedSeq, 1), existing.schema))
    // the manifest being replaced is also an input — materialize the
    // union before overwriting the directory it reads from
    val rows = merged.collect()
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1), existing.schema)
      .coalesce(1).write.mode("overwrite").parquet(manifestDir)
    (newFiles.length, existingRows.length - survivors.length)
  }

  /** Files that MAY contain rows with `c` in [lo, hi], plus the total
    * file count (for observability/specs) — ONE read of the tiny
    * manifest (the may-match test is evaluated in the same pass that
    * lists it).
    *
    * `verifyCoverage` (default true) fails loud on a stale manifest —
    * a file present in the table but absent from the manifest would
    * otherwise be silently skipped. The guard costs a full table
    * LISTING per read; that is the defensive default for ad-hoc use,
    * but a serving path whose writes rebuild the manifest on a
    * managed cadence (the store convention everywhere else in this
    * engine) should pass `verifyCoverage = false` and keep the read
    * at O(matching files) — otherwise the listing the manifest exists
    * to avoid is re-paid per query. */
  def prunedFiles(spark: SparkSession, tableDir: String, manifestDir: String,
                  c: String, lo: Any, hi: Any,
                  verifyCoverage: Boolean = true): (Seq[String], Int) = {
    val m = spark.read.parquet(manifestDir)
      .select(col("file"),
        (col(s"min_$c") <= lit(hi) && col(s"max_$c") >= lit(lo)).as("keep"))
      .collect()
    if (verifyCoverage) {
      val norm = (s: String) => new Path(s).toString
      val manifestSet = m.map(r => norm(r.getString(0))).toSet
      val liveSet = spark.read.parquet(tableDir).inputFiles.map(norm).toSet
      require(manifestSet == liveSet,
        s"[STALE_ZONEMAP] manifest at $manifestDir covers ${manifestSet.size} " +
          s"files but the table at $tableDir has ${liveSet.size}; " +
          s"missing=${(liveSet -- manifestSet).take(3).mkString(",")} " +
          s"extra=${(manifestSet -- liveSet).take(3).mkString(",")} — rebuild the manifest")
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
