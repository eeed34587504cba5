package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
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
  * column holds no non-null values of it (including a ZERO-ROW file —
  * the manifest keeps a null-stats row for those so coverage stays
  * total), and an interval predicate matches no null — so the SQL
  * filter `min_c <= hi AND max_c >= lo` (null → dropped) is exactly
  * the may-match test. Manifest rows carry each file's (size, mtime)
  * SIGNATURE, so both the coverage guard and [[update]] detect not
  * just added/removed files but a file REWRITTEN IN PLACE — the
  * silent-row-loss case where stale stats would wrongly prune it.
  * The file universe is always what SPARK'S OWN listing sees
  * (`inputFiles` — hidden/_temporary pruned, extension-agnostic), so
  * manifest coverage matches scan visibility exactly. */
object ZoneMaps {

  private val SigCols = Set("file", "n_rows", "file_size", "file_mtime")

  /** One row per data file: per-column min/max, row count, and the
    * file's (size, mtime-millis) signature — computed in ONE
    * column-pruned distributed pass grouped by `_metadata.file_path`.
    * Shared by [[write]] and [[update]] so full builds and
    * incremental reconciles can never desynchronize. NOTE: a
    * zero-row file emits no group here; callers union
    * [[nullStatsRows]] for listed files this pass missed. */
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

  /** Manifest rows for files a stats pass produced no group for
    * (zero-row files): null min/max, n_rows 0, the listing's
    * signature. Null stats are exactly right — no interval can match
    * a file with no rows, so these prune always but keep coverage
    * total (the guard and idempotence depend on that). */
  private def nullStatsRows(spark: SparkSession, schema: StructType,
                            files: Seq[(String, (Long, Long))]): DataFrame = {
    import spark.implicits._
    val base = files.map { case (f, (sz, mt)) => (f, sz, mt) }
      .toDF("file", "file_size", "file_mtime")
    schema.fields.filterNot(f => SigCols.contains(f.name))
      .foldLeft(base.withColumn("n_rows", lit(0L)))((d, f) =>
        d.withColumn(f.name, lit(null).cast(f.dataType)))
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  private def norm(s: String): String = new Path(s).toString

  /** The table's data files AS SPARK SEES THEM (same directory/hidden
    * pruning as any scan), each with its (size, mtime millis)
    * signature: `inputFiles` for the universe, then one listStatus
    * per parent directory for the signatures — driver-side metadata
    * ops, no Spark job over data. */
  private def listLive(spark: SparkSession,
                       tableDir: String): Map[String, (Long, Long)] = {
    val files = spark.read.parquet(tableDir).inputFiles
    val conf = spark.sparkContext.hadoopConfiguration
    files.groupBy(f => new Path(f).getParent).toSeq.flatMap {
      case (parent, inDir) =>
        val fs = parent.getFileSystem(conf)
        val wanted = inDir.map(f => new Path(f).getName).toSet
        fs.listStatus(parent)
          .filter(s => wanted.contains(s.getPath.getName))
          .map(s => norm(s.getPath.toString) -> ((s.getLen, s.getModificationTime)))
    }.toMap
  }

  private def requireSigSchema(schema: StructType, manifestDir: String): Unit =
    require(Seq("file_size", "file_mtime").forall(schema.fieldNames.contains),
      s"[ZONEMAP_SCHEMA] manifest at $manifestDir predates file signatures " +
        "(no file_size/file_mtime columns) — rebuild it with ZoneMaps.write")

  /** Build the manifest from scratch. Overwrites `manifestDir` (a
    * single small parquet). */
  def write(spark: SparkSession, tableDir: String, manifestDir: String,
            cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "zone map needs at least one column")
    val stats = statsFor(spark.read.parquet(tableDir), cols)
    val covered = stats.select("file").collect().map(r => norm(r.getString(0))).toSet
    val empties = listLive(spark, tableDir).filterNot(f => covered.contains(f._1))
    stats.unionByName(nullStatsRows(spark, stats.schema, empties.toSeq))
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestDir)
  }

  /** Incrementally reconcile the manifest with the table: stats are
    * recomputed ONLY for files the manifest has never seen or whose
    * (size, mtime) signature changed — one pruned pass over exactly
    * those paths, O(changed data) not O(table) — and rows for files
    * that no longer match anything on disk are dropped
    * (compaction/deletes; an in-place rewrite counts on both sides).
    * Returns (filesRefreshed, rowsDropped); a no-change table returns
    * (0, 0). Surviving rows ride a driver-side collect — the manifest
    * is one row per file, the same driver-bounded scale as the
    * listing itself. The column set is frozen by the existing
    * manifest's schema. */
  def update(spark: SparkSession, tableDir: String,
             manifestDir: String): (Int, Int) = {
    // update() reconciles OUT-OF-BAND table changes by contract —
    // drop cached query plans/data for the path before re-listing
    spark.catalog.refreshByPath(tableDir)
    val existing = spark.read.parquet(manifestDir)
    requireSigSchema(existing.schema, manifestDir)
    val cols: Seq[String] = existing.schema.fieldNames.toSeq
      .collect { case n if n.startsWith("min_") => n.stripPrefix("min_") }
    val existingRows = existing.collect()
    val live = listLive(spark, tableDir)
    val survivors = existingRows.filter { r =>
      live.get(norm(r.getAs[String]("file")))
        .contains((r.getAs[Long]("file_size"), r.getAs[Long]("file_mtime")))
    }
    val survivorNames = survivors.map(r => norm(r.getAs[String]("file"))).toSet
    val fresh = live.filterNot(f => survivorNames.contains(f._1))
    val newStats =
      if (fresh.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          existing.schema)
      else {
        val stats = statsFor(spark.read.parquet(fresh.keys.toSeq.sorted: _*), cols)
          .select(existing.schema.fieldNames.map(col).toIndexedSeq: _*)
        val covered = stats.select("file").collect().map(r => norm(r.getString(0))).toSet
        stats.unionByName(nullStatsRows(spark, existing.schema,
          fresh.filterNot(f => covered.contains(f._1)).toSeq))
      }
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
    val manifest = spark.read.parquet(manifestDir)
    if (verifyCoverage) requireSigSchema(manifest.schema, manifestDir)
    // the fast path reads only (file, keep), so a pre-signature
    // manifest keeps serving until its next rebuild
    val sigCols =
      if (verifyCoverage) Seq(col("file_size"), col("file_mtime")) else Seq.empty
    val m = manifest
      .select(Seq(col("file"),
        (col(s"min_$c") <= lit(hi) && col(s"max_$c") >= lit(lo)).as("keep")) ++
        sigCols: _*)
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
