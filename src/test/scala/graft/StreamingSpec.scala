package graft

import graft.streaming.{CorpusIngest, EventStream}
import graft.streaming.EventStream.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite with SparkFixture {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("watermarked tumbling window closes after watermark advances") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = EventStream.windowedCounts(in.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(20), 2, "click", 2.0),
        Event(3, ts(40), 1, "view", 3.0))
      q.processAllAvailable()
      // watermark still inside hour 0 — nothing emitted yet
      assert(spark.table("win_counts").count() == 0)
      in.addData(Event(4, ts(180), 3, "click", 4.0)) // advances watermark past hour 0
      q.processAllAvailable()
      val out = spark.table("win_counts")
        .select("event_type", "n_events", "sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(out == Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = EventStream.windowedCounts(in.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("late_drop")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Event(1, ts(10), 1, "click", 1.0))
      q.processAllAvailable()
      in.addData(Event(2, ts(240), 1, "click", 1.0)) // watermark → 3:30
      q.processAllAvailable()
      in.addData(Event(3, ts(15), 1, "click", 100.0)) // late: hour-0 already closed
      q.processAllAvailable()
      val hour0 = spark.table("late_drop")
        .filter("window_start = timestamp'2026-01-01 00:00:00'").collect()
      assert(hour0.length == 1)
      assert(hour0(0).getAs[Long]("n_events") == 1)
    } finally q.stop()
  }

  test("streaming dedup drops repeated keys within the watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = EventStream.dedupStream(in.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(6), 1, "click", 2.0),
        Event(1, ts(7), 1, "click", 1.0), // duplicate id
        Event(2, ts(8), 2, "view", 2.0)) // duplicate id
      q.processAllAvailable()
      assert(spark.table("dedup_stream").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("corpus ingest stream dedups content and gates quality") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog and runs to town " * 4
    val junk = "!!! ??? !!! ,,, ;;; !!!"
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = CorpusIngest.cleanStream(
        in.toDF().toDF("doc_id", "ts", "text"), "30 minutes", minQuality = 0.2)
      .writeStream.format("memory").queryName("corpus_ingest")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, ts(5), good), (2L, ts(6), junk))
      q.processAllAvailable()
      in.addData((3L, ts(10), good)) // duplicate content, later arrival
      q.processAllAvailable()
      val out = spark.table("corpus_ingest")
        .select("doc_id", "quality", "n_tokens").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      // junk gated, duplicate dropped, first arrival kept with stats
      assert(out.map(_._1).toSeq == Seq(1L))
      assert(out.head._2 >= 0.2 && out.head._3 == 52L)
    } finally q.stop()
  }

  test("streaming dedup against a static snapshot drops seen-ever texts") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val snapshot = Seq((100L, "already in the corpus"))
      .toDF("doc_id", "text")
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = CorpusIngest.dedupAgainstSnapshot(
        in.toDF().toDF("doc_id", "ts", "text"), snapshot)
      .writeStream.format("memory").queryName("snap_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, ts(1), "already in the corpus"), (2L, ts(2), "brand new text"))
      q.processAllAvailable()
      val out = spark.table("snap_dedup").select("doc_id").collect().map(_.getLong(0))
      assert(out.toSeq == Seq(2L))
    } finally q.stop()
  }

  test("stream-stream join matches views to later clicks inside the window") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = EventStream.clickViewJoin(in.toDF())
      .writeStream.format("memory").queryName("cv_join")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Event(1, ts(0), 1, "view", 10.0),
        Event(2, ts(10), 1, "click", 1.0), // within 30 min of the view → joins
        Event(3, ts(50), 1, "click", 2.0), // 50 min after the view → outside window
        Event(4, ts(20), 2, "click", 3.0)) // no view for user 2
      q.processAllAvailable()
      in.addData(Event(5, ts(300), 3, "view", 0.0)) // advance watermarks
      q.processAllAvailable()
      val rows = spark.table("cv_join")
        .select("c_user", "c_value", "v_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(rows == Set((1L, 1.0, 10.0)))
    } finally q.stop()
  }

  test("stream-static join enriches events with a broadcast dimension") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[Event]
    val q = EventStream.enrichWithDimension(in.toDF(), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(6), 2, "view", 2.0),
        Event(3, ts(7), 9, "click", 3.0)) // no dimension row → tier null
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select("event_id", "tier").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(rows == Set((1L, Some("gold")), (2L, Some("basic")), (3L, None)))
    } finally q.stop()
  }

  test("file-sink ingest: stream materializes to parquet with checkpoint") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val in = MemoryStream[Event]
    val q = EventStream.dedupStream(in.toDF(), "30 minutes")
      .writeStream.format("parquet")
      .option("path", s"$tmp/data")
      .option("checkpointLocation", s"$tmp/chk")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Event(1, ts(5), 1, "click", 1.0), Event(2, ts(6), 2, "view", 2.0))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$tmp/data")
      assert(out.count() == 2)
      assert(out.columns.contains("event_id"))
    } finally q.stop()
  }

  test("end-to-end ingest: checkpoint restart + forced redelivery stays exactly-once") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ingest_e2e").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val chkDir = s"$tmp/chk"
    val good1 = "the quick brown fox jumps over the lazy dog and runs to town " * 4
    val good2 = "a completely different document about ships and the open sea " * 4
    val good3 = "third unique document text with many plain words in it today " * 4
    val junk = "!!! ??? !!! ,,, ;;; !!!"
    val snapText = "a fine corpus snapshot document that is in the base already " * 4
    val snapshot = Seq((100L, snapText)).toDF("doc_id", "text")
    def writeFile(rows: Seq[(Long, java.sql.Timestamp, String)]): Unit = {
      rows.toDF("doc_id", "ts", "text").coalesce(1)
        .write.mode("append").parquet(inDir)
      Thread.sleep(20) // distinct mod-times keep file->batch order stable
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def startIngest() = CorpusIngest.ingest(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(inDir),
      snapshot, outDir, chkDir, watermark = "30 minutes", minQuality = 0.1)
    def landedIds: Seq[Long] =
      spark.read.parquet(outDir).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

    // run 1: one file — clean doc, junk (quality-gated), in-stream
    // content dup, snapshot dup
    writeFile(Seq((1L, ts(5), good1), (2L, ts(6), junk),
      (3L, ts(7), good1), (4L, ts(8), snapText)))
    val q1 = startIngest()
    q1.awaitTermination(120000); q1.stop()
    assert(landedIds == Seq(1L), s"run1 landed $landedIds")

    // force a redelivery: drop the last commit record, as if the
    // process died between the sink write and the commit-log write
    val commits = new java.io.File(s"$chkDir/commits").listFiles()
      .filterNot(_.getName.startsWith(".")).sortBy(_.getName)
    assert(commits.nonEmpty)
    val crc = new java.io.File(commits.last.getParent, s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists()) crc.delete() // else the local FS rejects the re-commit rename

    // run 2: two more files. good2 advances the watermark far enough
    // to evict good1's in-stream fingerprint, so the good1 re-arrival
    // in the NEXT file can only be caught by the landed-corpus batch
    // dedup — the seen-ever path state cannot cover.
    writeFile(Seq((5L, ts(600), good2)))
    writeFile(Seq((6L, ts(610), good1), (7L, ts(615), good3)))
    val q2 = startIngest()
    q2.awaitTermination(120000); q2.stop()
    // exactly-once by content: the redelivered first batch appended
    // nothing (doc 1 already landed), doc 6's text is a landed dup
    assert(landedIds == Seq(1L, 5L, 7L), s"run2 landed $landedIds")

    // a third restart with no new input changes nothing
    val q3 = startIngest()
    q3.awaitTermination(120000); q3.stop()
    assert(landedIds == Seq(1L, 5L, 7L), s"run3 landed $landedIds")
  }

  test("ingest with embedder maintains the IVF index incrementally per batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ingest_ivf").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"
    val chkDir = s"$tmp/chk"; val idxDir = s"$tmp/ivf"
    // deterministic fake embedder: 8 hash-derived doubles per text —
    // the real system would plug a model here; the Spark-side plumbing
    // (schema, frozen-param assignment, partition append) is what this
    // test exercises
    def embedder(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.select(col("doc_id").as("vec_id"),
        array((0 until 8).map(i =>
          (pmod(xxhash64(col("text"), lit(i)), lit(1000L)).cast("double") / 500.0) - 1.0): _*)
          .as("embedding"))
    val snapshot = Seq(
      (100L, "a fine corpus snapshot document that is in the base already " * 4),
      (101L, "another snapshot document full of plain ordinary words here too " * 4))
      .toDF("doc_id", "text")
    // bootstrap: index trained on and built from the snapshot's embeddings
    graft.pipeline.Embeddings.writeIvfIndex(embedder(snapshot), idxDir,
      nlist = 4, pqM = 4, pqK = 4)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    Seq((1L, ts(5), "the quick brown fox jumps over the lazy dog and runs to town " * 4),
        (2L, ts(6), "a completely different document about ships and the open sea " * 4))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(inDir)
    def runIngest(): Unit = {
      val q = CorpusIngest.ingest(
        spark.readStream.schema(schema).parquet(inDir),
        snapshot, outDir, chkDir, watermark = "30 minutes", minQuality = 0.1,
        embedder = Some(embedder), ivfIndexDir = Some(idxDir),
        compactIndexEvery = 1, maxIndexFilesPerCell = 1,
        outputFilesPerBatch = 1)
      q.awaitTermination(120000); q.stop()
    }
    runIngest()
    val landed = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(landed == Seq(1L, 2L), s"landed $landed")
    // the index now holds snapshot + landed vectors, assigned to cells
    val idx = spark.read.parquet(s"$idxDir/corpus")
    val ids = idx.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 100L, 101L), s"index ids $ids")
    assert(idx.columns.contains("codes") && idx.columns.contains("cell"))
    // and the indexed read path serves the appended vectors
    val res = graft.pipeline.Embeddings.ivfTopKIndexed(spark, idxDir, 3, 2, nprobe = 4)
    assert(res.filter(col("query_id") === 1L).count() == 2)
    // second trigger (batchId 1) hits the compaction cadence: the
    // per-batch appends consolidate into a committed new generation
    // and the read path still serves every vector
    Seq((8L, ts(20), "yet another new document with enough plain words to pass the gate " * 4))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(inDir)
    runIngest()
    val live = graft.pipeline.Embeddings.liveCorpusDir(spark, idxDir)
    assert(live.contains("corpus_v"), s"no compacted generation: $live")
    val ids2 = spark.read.parquet(live).select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids2 == Seq(1L, 2L, 8L, 100L, 101L), s"post-compaction ids $ids2")
    val res2 = graft.pipeline.Embeddings.ivfTopKIndexed(spark, idxDir, 3, 2, nprobe = 4)
    assert(res2.filter(col("query_id") === 1L).count() == 2)
    // outputFilesPerBatch=1 bounds corpus file growth to one data file
    // per trigger (two triggers ran)
    val outFiles = new java.io.File(outDir).listFiles()
      .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(outFiles <= 2, s"output corpus has $outFiles files after 2 triggers")
  }

  test("ingest near-dup gate: band index drops fuzzy dups of landed corpus and within-batch pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ingest_band").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"
    val chkDir = s"$tmp/chk"; val bandDir = s"$tmp/band"
    // 40 distinct words -> 38 shingles; one changed tail word leaves
    // 35 shared of 41 distinct: jaccard ~0.853 — near, not exact
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearBase = (1 to 39).map(i => s"tok$i").mkString(" ") + " changed"
    val novel = (1 to 40).map(i => s"zee$i").mkString(" ")
    val nearNovel = (1 to 39).map(i => s"zee$i").mkString(" ") + " changed"
    val other = (1 to 40).map(i => s"qua$i").mkString(" ")
    val snapshot = Seq((100L, base)).toDF("doc_id", "text")
    graft.pipeline.TextDedup.writeBandIndex(snapshot, bandDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def runIngest(): Unit = {
      val q = CorpusIngest.ingest(
        spark.readStream.schema(schema).parquet(inDir),
        snapshot, outDir, chkDir, watermark = "30 minutes", minQuality = 0.0,
        nearDupIndexDir = Some(bandDir))
      q.awaitTermination(120000); q.stop()
    }
    // batch 1: near-dup of the snapshot drops, novel lands, and of the
    // in-batch near pair (2, 3) only the lower id survives
    Seq((1L, ts(5), nearBase), (2L, ts(6), novel), (3L, ts(7), nearNovel))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(inDir)
    runIngest()
    val landed1 = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(landed1 == Seq(2L), s"landed $landed1")
    // batch 2: the novel text's near-dup is now indexed (band rows
    // appended for survivors in batch 1) -> fuzzy seen-ever drops it
    Seq((4L, ts(10), nearNovel), (5L, ts(11), other))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(inDir)
    runIngest()
    val landed2 = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(landed2 == Seq(2L, 5L), s"landed $landed2")
    // the index itself reports the fuzzy hit it gated on
    val hits = graft.pipeline.TextDedup.nearDupsAgainstBandIndex(
        Seq((9L, nearNovel)).toDF("doc_id", "text"), bandDir)
      .select("dup_of").collect().map(_.getLong(0)).toSeq
    assert(hits == Seq(2L), s"hits $hits")
  }

  test("ingest reconcile cadence heals a damaged index: missing rows appended, orphans tombstoned") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ingest_rec").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"
    val chkDir = s"$tmp/chk"; val idxDir = s"$tmp/ivf"
    def embedder(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.select(col("doc_id").as("vec_id"),
        array((0 until 8).map(i =>
          (pmod(xxhash64(col("text"), lit(i)), lit(1000L)).cast("double") / 500.0) - 1.0): _*)
          .as("embedding"))
    val snapshot = Seq(
      (100L, "a fine corpus snapshot document that is in the base already " * 4),
      (101L, "another snapshot document full of plain ordinary words here too " * 4))
      .toDF("doc_id", "text")
    // DAMAGED bootstrap: the index is missing snapshot doc 101 (a lost
    // index append) and carries vector 999 whose doc never existed (a
    // stranded orphan from the reverse crash order)
    val damaged = embedder(snapshot.filter(col("doc_id") === 100L))
      .unionByName(embedder(Seq((999L, "phantom document never landed anywhere " * 4))
        .toDF("doc_id", "text")))
    graft.pipeline.Embeddings.writeIvfIndex(damaged, idxDir, nlist = 4, pqM = 4, pqK = 4)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    Seq((1L, ts(5), "the quick brown fox jumps over the lazy dog and runs to town " * 4))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(inDir)
    val q = CorpusIngest.ingest(
      spark.readStream.schema(schema).parquet(inDir),
      snapshot, outDir, chkDir, watermark = "30 minutes", minQuality = 0.1,
      embedder = Some(embedder), ivfIndexDir = Some(idxDir),
      reconcileIndexEvery = 1)
    q.awaitTermination(120000); q.stop()
    // the cadence healed both directions: 101 (lost append) and 1
    // (this trigger's batch rode the normal append) present, 999 gone
    val ids = graft.pipeline.Embeddings.ivfIndexIds(spark, idxDir)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 100L, 101L), s"live index ids $ids")
    // and the read path agrees (999 never serves, 101 can)
    val res = graft.pipeline.Embeddings.ivfTopKIndexed(spark, idxDir, 2, 3, nprobe = 4)
      .collect()
    assert(res.nonEmpty && !res.exists(r => r.getLong(1) == 999L))
  }

  test("ingest maintains the text index; reconcile repairs, takedowns never resurrect") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ingest_tidx").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"
    val chkDir = s"$tmp/chk"; val tidxDir = s"$tmp/tidx"
    val snapText = "snapshot doc about spark and window functions here today ok"
    val snapshot = Seq((100L, snapText)).toDF("doc_id", "text")
    graft.pipeline.TextIndex.write(snapshot, tidxDir, buckets = 16)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    Seq((1L, ts(5), "arriving doc mentioning spark twice spark and hash join topics"))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(inDir)
    val q = CorpusIngest.ingest(
      spark.readStream.schema(schema).parquet(inDir),
      snapshot, outDir, chkDir, watermark = "30 minutes",
      textIndexDir = Some(tidxDir), reconcileIndexEvery = 1)
    q.awaitTermination(120000); q.stop()
    // the landed batch is searchable
    val hits = graft.pipeline.TextIndex.search(spark, tidxDir, Seq("spark"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 100L), s"hits $hits")

    // takedown through the full path: corpus tombstone + text index
    CorpusIngest.takedown(spark, outDir, Seq(1L), textIndexDir = Some(tidxDir))
    assert(graft.pipeline.TextIndex.search(spark, tidxDir, Seq("spark"), 10)
      .collect().map(_.getLong(0)).toSet == Set(100L))
    // compaction purges; a reconcile against the corpus of record
    // (which excludes the takedown via landedCorpus semantics) must
    // NOT resurrect the purged id — the ledger keeps refusing it even
    // though the doc text would still match the query
    graft.pipeline.TextIndex.compact(spark, tidxDir, maxFilesPerBucket = 64)
    val record = snapshot.unionByName(
      CorpusIngest.landedCorpus(spark, outDir).select(col("doc_id"), col("text")))
    val (app, orph) = graft.pipeline.TextIndex.reconcile(record, tidxDir)
    assert(app == 0 && orph == 0, s"reconcile after takedown: +$app/-$orph")
    assert(graft.pipeline.TextIndex.search(spark, tidxDir, Seq("spark"), 10)
      .collect().map(_.getLong(0)).toSet == Set(100L))

    // and reconcile DOES repair a genuinely lost append: wipe the
    // index back to snapshot-only, reconcile re-indexes... nothing —
    // doc 1 is corpus-tombstoned; a NEW doc landed outside the index
    // is the repair case
    Seq((2L, "fresh doc with window aggregates and hash partitions inside"))
      .toDF("doc_id", "text").write.mode("append").parquet(outDir)
    val (app2, _) = graft.pipeline.TextIndex.reconcile(
      snapshot.unionByName(
        CorpusIngest.landedCorpus(spark, outDir).select(col("doc_id"), col("text"))),
      tidxDir)
    assert(app2 == 1L, s"expected the stranded doc re-indexed, got $app2")
    assert(graft.pipeline.TextIndex.search(spark, tidxDir, Seq("window"), 10)
      .collect().map(_.getLong(0)).toSet == Set(2L, 100L))
  }

  test("corpus takedown: logical exclusion now, bytes at purge, crash roll-forward") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_takedown").toString
    val outDir = s"$tmp/out"; val bandDir = s"$tmp/band"
    val mk = (id: Long, seed: String) =>
      (id, (1 to 40).map(i => s"$seed$i").mkString(" "))
    // two part files: docs 1-3 and 4-6
    Seq(mk(1, "alpha"), mk(2, "beta"), mk(3, "gamma")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(outDir)
    Seq(mk(4, "delta"), mk(5, "epsil"), mk(6, "zeta")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(outDir)
    graft.pipeline.TextDedup.writeBandIndex(
      spark.read.parquet(outDir), bandDir)
    val filesBefore = new java.io.File(outDir).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet

    CorpusIngest.takedown(spark, outDir, Seq(2L), bandIndexDir = Some(bandDir))
    // logical: landedCorpus excludes 2 immediately; raw bytes remain
    assert(CorpusIngest.landedCorpus(spark, outDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 4L, 5L, 6L))
    assert(spark.read.parquet(outDir).count() == 6)
    // band index stops matching the taken-down doc at once
    val nearBeta = (1 to 39).map(i => s"beta$i").mkString(" ") + " changed"
    assert(graft.pipeline.TextDedup.nearDupsAgainstBandIndex(
      Seq((99L, nearBeta)).toDF("doc_id", "text"), bandDir).count() == 0)

    // purge: only the file holding doc 2 rewrites; survivors intact
    val rewritten = CorpusIngest.purgeCorpusTombstones(spark, outDir)
    assert(rewritten == 1, s"rewrote $rewritten files")
    assert(spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 4L, 5L, 6L))
    val filesAfter = new java.io.File(outDir).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    assert((filesBefore -- filesAfter).size == 1, "exactly one original file replaced")
    // second pass: nothing to do (tombstones ledgered), grace expires
    assert(CorpusIngest.purgeCorpusTombstones(spark, outDir) == 0)
    assert(CorpusIngest.purgeCorpusTombstones(spark, outDir) == 0)

    // crash roll-forward: a committed stage whose moves/deletes never
    // ran (doomed file still live, staged survivors not yet moved)
    val doomed = new java.io.File(outDir).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).head
    val stage = s"$outDir/_purge_stage/pcrash_1"
    Seq(mk(50, "staged")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(stage) // writes parts + _SUCCESS
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$stage/doomed.txt"), doomed + "\n")
    val doomedIds = spark.read.parquet(s"$outDir/$doomed")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    CorpusIngest.purgeCorpusTombstones(spark, outDir)
    val ids = spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!new java.io.File(s"$outDir/$doomed").exists(), "doomed file survived replay")
    assert(ids.contains(50L), "staged survivors were not moved in")
    assert((doomedIds -- Set(50L)).forall(!ids.contains(_)) || doomedIds.isEmpty)
  }

  test("ingest: a takedown re-admits re-arrivals of the same content") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_takedown_ingest").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"
    val text = (1 to 40).map(i => s"word$i").mkString(" ")
    val snapshot = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def runIngest(in: String, chk: String): Unit = {
      val q = CorpusIngest.ingest(
        spark.readStream.schema(schema).parquet(in),
        snapshot, outDir, chk, watermark = "30 minutes")
      q.awaitTermination(120000); q.stop()
    }
    Seq((1L, ts(5), text)).toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("append").parquet(inDir)
    runIngest(inDir, s"$tmp/chk1")
    assert(CorpusIngest.landedCorpus(spark, outDir).count() == 1)

    CorpusIngest.takedown(spark, outDir, Seq(1L))
    // the same content arrives again (a fresh source dir + checkpoint
    // isolates the batch-side seen-ever gate from in-stream watermark
    // state and source replay): with the takedown filed, the
    // landed-dedup probe no longer sees doc 1, so the re-arrival is
    // admitted — the recrawl-of-a-republished-page semantics
    Seq((2L, ts(6), text)).toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("append").parquet(s"$tmp/in2")
    runIngest(s"$tmp/in2", s"$tmp/chk2")
    val landed = CorpusIngest.landedCorpus(spark, outDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(landed == Seq(2L), s"landed $landed")
    // purge removes doc 1's bytes; the re-admitted doc stays
    CorpusIngest.purgeCorpusTombstones(spark, outDir)
    assert(spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("built-in session_window closes a session after the gap + watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = EventStream.sessionWindowCounts(in.toDF(), "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("sess_win")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0),  // same session (5 < 10 gap)
        Event(3, ts(65), 1, "click", 4.0)) // new session
      q.processAllAvailable()
      in.addData(Event(4, ts(300), 2, "view", 0.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("sess_win")
        .filter("user_id = 1").collect()
        .map(r => (r.getLong(3), r.getDouble(4))).toSet
      assert(rows == Set((2L, 3.0), (1L, 4.0)))
    } finally q.stop()
  }

  test("sessionize emits a closed session when a gap exceeds the threshold") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val sessions = EventStream.sessionize(in.toDS(), gapMs = 10 * 60 * 1000L,
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 5 min apart, then a 3rd 1 hour later → first
      // session (2 events) closes when the 3rd arrives.
      in.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0),
        Event(3, ts(65), 1, "click", 4.0))
      q.processAllAvailable()
      val out = spark.table("sessions").as[Session].collect()
      assert(out.length == 1)
      assert(out(0).n_events == 2 && out(0).sum_value == 3.0)
      assert(out(0).start_ts == ts(0) && out(0).end_ts == ts(5))
    } finally q.stop()
  }
}
