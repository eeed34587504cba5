package graft

import graft.sources.ZoneMaps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class ZoneMapsSpec extends AnyFunSuite with SparkFixture {

  private def tmp(): String =
    Files.createTempDirectory("zmap").toFile.getAbsolutePath

  private lazy val li = Engine.table(spark, sfDir, "lineitem")
    .select("l_orderkey", "l_quantity", "l_shipdate").cache()

  test("pruned read equals the full-scan filter and skips files") {
    val root = tmp()
    li.repartitionByRange(8, col("l_shipdate"))
      .write.parquet(s"$root/t")
    ZoneMaps.write(spark, s"$root/t", s"$root/m", Seq("l_shipdate", "l_quantity"))
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-12-31 23:59:59")
    val (files, total) = ZoneMaps.prunedFiles(spark, s"$root/t", s"$root/m",
      "l_shipdate", lo, hi)
    assert(total == 8)
    assert(files.nonEmpty && files.size < total,
      s"range layout must let the manifest skip files (kept ${files.size}/$total)")
    val got = ZoneMaps.readPruned(spark, s"$root/t", s"$root/m",
        "l_shipdate", lo, hi)
      .collect().map(_.toString).sorted
    val want = li.filter(col("l_shipdate").between(lit(lo), lit(hi)))
      .collect().map(_.toString).sorted
    assert(got.length == want.length && got.sameElements(want))
  }

  test("footer-only build equals the data-pass oracle (nulls, zero-row, strings, timestamps)") {
    val root = tmp()
    // wide fixture: timestamp + double + long + string columns, one
    // all-null-quantity file, one zero-row file
    val wide = Engine.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_shipdate", "l_returnflag")
    wide.filter(col("l_orderkey") % 2 === 0).coalesce(1).write.parquet(s"$root/t")
    wide.filter(col("l_orderkey") % 2 === 1)
      .withColumn("l_quantity", lit(null).cast("double")).coalesce(1)
      .write.mode("append").parquet(s"$root/t")
    wide.limit(0).coalesce(1).write.mode("append").parquet(s"$root/t")
    val cols = Seq("l_shipdate", "l_quantity", "l_orderkey", "l_returnflag")
    ZoneMaps.write(spark, s"$root/t", s"$root/m", cols)
    val manifest = spark.read.parquet(s"$root/m")
    def norm(s: String) = new org.apache.hadoop.fs.Path(s).toString
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => norm(r.getAs[String]("file")) ->
        (cols.flatMap(c => Seq(r.getAs[Any](s"min_$c"), r.getAs[Any](s"max_$c"))),
          r.getAs[Long]("n_rows")))
      .toMap
    // oracle: the data pass over the same table (zero-row file emits
    // no group there — checked separately below)
    val oracle = keyed(ZoneMaps.statsFor(spark.read.parquet(s"$root/t"), cols))
    val got = keyed(manifest)
    assert(got.size == oracle.size + 1, "manifest must add the zero-row file")
    oracle.foreach { case (f, (mins, n)) =>
      assert(got.contains(f), s"footer build missed $f")
      assert(got(f)._2 == n, s"n_rows mismatch for $f")
      assert(got(f)._1 == mins,
        s"footer min/max differ from data pass for $f: ${got(f)._1} vs $mins")
    }
    val empty = (got.keySet -- oracle.keySet).head
    assert(got(empty)._2 == 0L && got(empty)._1.forall(_ == null))
    // the fixture's footers must be fully usable — no data-pass fallback
    val live = spark.read.parquet(s"$root/t").inputFiles.toSeq.map(f => f -> ((0L, 0L)))
    val (_, fallback) = ZoneMaps.statsFromFooters(spark, live, cols,
      spark.read.parquet(s"$root/t").schema)
    assert(fallback.isEmpty, s"unexpected footer fallback: $fallback")
  }

  test("a file with only nulls in the zone column is skipped, not lost") {
    val root = tmp()
    // file 1: real quantities; file 2: all-null quantities
    li.filter(col("l_orderkey") % 2 === 0).coalesce(1)
      .write.parquet(s"$root/t")
    li.filter(col("l_orderkey") % 2 === 1)
      .withColumn("l_quantity", lit(null).cast("double")).coalesce(1)
      .write.mode("append").parquet(s"$root/t")
    ZoneMaps.write(spark, s"$root/t", s"$root/m", Seq("l_quantity"))
    val (files, total) = ZoneMaps.prunedFiles(spark, s"$root/t", s"$root/m",
      "l_quantity", 1.0, 100.0)
    assert(total >= 2 && files.size < total,
      "the all-null file must be pruned (no non-null value can match)")
    val got = ZoneMaps.readPruned(spark, s"$root/t", s"$root/m",
      "l_quantity", 1.0, 100.0).count()
    val want = spark.read.parquet(s"$root/t")
      .filter(col("l_quantity").between(1.0, 100.0)).count()
    assert(got == want)
  }

  test("an interval beyond every file yields an empty, correctly-typed result") {
    val root = tmp()
    li.coalesce(1).write.parquet(s"$root/t")
    ZoneMaps.write(spark, s"$root/t", s"$root/m", Seq("l_quantity"))
    val got = ZoneMaps.readPruned(spark, s"$root/t", s"$root/m",
      "l_quantity", 1.0e9, 2.0e9)
    assert(got.count() == 0)
    assert(got.schema == spark.read.parquet(s"$root/t").schema)
  }

  test("a stale manifest fails loud instead of silently dropping rows") {
    val root = tmp()
    li.coalesce(1).write.parquet(s"$root/t")
    ZoneMaps.write(spark, s"$root/t", s"$root/m", Seq("l_quantity"))
    // table grows after the manifest was built
    li.limit(5).coalesce(1).write.mode("append").parquet(s"$root/t")
    val e = intercept[IllegalArgumentException] {
      ZoneMaps.prunedFiles(spark, s"$root/t", s"$root/m", "l_quantity", 1.0, 2.0)
    }
    assert(e.getMessage.contains("STALE_ZONEMAP"))
    // the managed-cadence serving path skips the listing guard by
    // contract (O(matching files) reads) — documented trade: it will
    // not notice the staleness
    val fast = ZoneMaps.prunedFiles(spark, s"$root/t", s"$root/m",
      "l_quantity", 1.0, 2.0, verifyCoverage = false)
    assert(fast._2 >= 1)
  }

  test("update reconciles new and removed files without rescanning the table") {
    val root = tmp()
    li.filter(col("l_orderkey") % 3 === 0).coalesce(1).write.parquet(s"$root/t")
    ZoneMaps.write(spark, s"$root/t", s"$root/m", Seq("l_quantity", "l_shipdate"))
    // append two more files
    li.filter(col("l_orderkey") % 3 === 1).coalesce(1)
      .write.mode("append").parquet(s"$root/t")
    li.filter(col("l_orderkey") % 3 === 2).coalesce(1)
      .write.mode("append").parquet(s"$root/t")
    val (added, removed) = ZoneMaps.update(spark, s"$root/t", s"$root/m")
    assert(added == 2 && removed == 0, s"added=$added removed=$removed")
    // post-update reads pass the coverage guard and equal the filter
    val got = ZoneMaps.readPruned(spark, s"$root/t", s"$root/m",
      "l_quantity", 1.0, 25.0).count()
    val want = spark.read.parquet(s"$root/t")
      .filter(col("l_quantity").between(1.0, 25.0)).count()
    assert(got == want && got > 0)
    // delete a data file → update drops its manifest row
    val victim = new java.io.File(s"$root/t").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).head
    assert(victim.delete())
    val (added2, removed2) = ZoneMaps.update(spark, s"$root/t", s"$root/m")
    assert(added2 == 0 && removed2 == 1, s"added=$added2 removed=$removed2")
    val again = ZoneMaps.readPruned(spark, s"$root/t", s"$root/m",
      "l_quantity", 1.0, 25.0).count()
    val wantAgain = spark.read.parquet(s"$root/t")
      .filter(col("l_quantity").between(1.0, 25.0)).count()
    assert(again == wantAgain)
    // idempotent when nothing changed
    assert(ZoneMaps.update(spark, s"$root/t", s"$root/m") == ((0, 0)))
  }

  test("zero-row files keep coverage total: guard green, update idempotent") {
    val root = tmp()
    li.coalesce(1).write.parquet(s"$root/t")
    li.limit(0).coalesce(1).write.mode("append").parquet(s"$root/t")
    ZoneMaps.write(spark, s"$root/t", s"$root/m", Seq("l_quantity"))
    // the empty file has a null-stats manifest row (total counts it),
    // is never kept by an interval, and the guard stays green
    val (kept, total) = ZoneMaps.prunedFiles(spark, s"$root/t", s"$root/m",
      "l_quantity", 1.0, 100.0)
    assert(total == 2 && kept.size == 1)
    assert(ZoneMaps.update(spark, s"$root/t", s"$root/m") == ((0, 0)),
      "a zero-row file must not make update non-convergent")
    val got = ZoneMaps.readPruned(spark, s"$root/t", s"$root/m",
      "l_quantity", 1.0, 100.0).count()
    val want = spark.read.parquet(s"$root/t")
      .filter(col("l_quantity").between(1.0, 100.0)).count()
    assert(got == want)
  }

  test("a pre-signature manifest fails loud on guarded paths, still serves unguarded") {
    val root = tmp()
    li.coalesce(1).write.parquet(s"$root/t")
    ZoneMaps.write(spark, s"$root/t", s"$root/m", Seq("l_quantity"))
    // simulate a manifest from before file signatures existed
    val old = spark.read.parquet(s"$root/m").drop("file_size", "file_mtime")
    old.collect() // materialize before overwriting the input dir
    val rows = old.collect().toIndexedSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), old.schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$root/m2")
    val e = intercept[IllegalArgumentException] {
      ZoneMaps.prunedFiles(spark, s"$root/t", s"$root/m2", "l_quantity", 1.0, 2.0)
    }
    assert(e.getMessage.contains("ZONEMAP_SCHEMA"))
    val e2 = intercept[IllegalArgumentException] {
      ZoneMaps.update(spark, s"$root/t", s"$root/m2")
    }
    assert(e2.getMessage.contains("ZONEMAP_SCHEMA"))
    // the unguarded serving path never touches the signature columns
    val got = ZoneMaps.readPruned(spark, s"$root/t", s"$root/m2",
      "l_quantity", 1.0, 100.0, verifyCoverage = false).count()
    val want = spark.read.parquet(s"$root/t")
      .filter(col("l_quantity").between(1.0, 100.0)).count()
    assert(got == want)
  }

  test("a file rewritten in place is caught by the guard and refreshed by update") {
    val root = tmp()
    li.filter(col("l_orderkey") % 2 === 0).coalesce(1).write.parquet(s"$root/t")
    li.filter(col("l_orderkey") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(s"$root/t")
    ZoneMaps.write(spark, s"$root/t", s"$root/m", Seq("l_quantity"))
    // rewrite one data file IN PLACE with different content (another
    // file's bytes — different size, so the signature must change)
    val files = new java.io.File(s"$root/t").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(files.length == 2)
    java.nio.file.Files.copy(files(0).toPath, files(1).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop the local-FS checksum sidecar of the rewritten file — an
    // out-of-band writer would not have updated it either
    new java.io.File(s"$root/t", s".${files(1).getName}.crc").delete()
    // name sets are identical — only the signature can catch this
    val e = intercept[IllegalArgumentException] {
      ZoneMaps.prunedFiles(spark, s"$root/t", s"$root/m", "l_quantity", 1.0, 50.0)
    }
    assert(e.getMessage.contains("STALE_ZONEMAP"))
    // update refreshes exactly the rewritten file, then reads are
    // correct again (and guarded reads pass)
    val (refreshed, dropped) = ZoneMaps.update(spark, s"$root/t", s"$root/m")
    assert(refreshed == 1 && dropped == 1, s"refreshed=$refreshed dropped=$dropped")
    val got = ZoneMaps.readPruned(spark, s"$root/t", s"$root/m",
      "l_quantity", 1.0, 50.0).count()
    val want = spark.read.parquet(s"$root/t")
      .filter(col("l_quantity").between(1.0, 50.0)).count()
    assert(got == want)
  }

  test("NaN-poisoned or inverted footer float stats route the file to the data pass") {
    // Legacy parquet writers (pre parquet-mr 1.11) push NaN through
    // Math.min/max into chunk statistics; a NaN bound would null out
    // the prune predicate and silently drop a file holding real
    // in-range values. Spark-written fixtures never emit NaN stats, so
    // this drives footerMinMax directly with footer metadata built the
    // way a legacy file's footer decodes.
    import org.apache.parquet.column.statistics.Statistics
    import org.apache.parquet.hadoop.metadata.{BlockMetaData, ColumnChunkMetaData, ColumnPath, CompressionCodecName}
    import org.apache.parquet.schema.MessageTypeParser
    import org.apache.spark.sql.types.DoubleType
    val msg = MessageTypeParser.parseMessageType("message m { optional double c; }")
    val prim = msg.getType(Array("c"): _*).asPrimitiveType()
    def le(d: Double): Array[Byte] =
      java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(d).array()
    def stats(mn: Double, mx: Double): Statistics[_] =
      Statistics.getBuilderForReading(prim)
        .withMin(le(mn)).withMax(le(mx)).withNumNulls(0L).build()
    def block(st: Statistics[_]): BlockMetaData = {
      val b = new BlockMetaData
      b.setRowCount(10L)
      b.addColumn(ColumnChunkMetaData.get(
        ColumnPath.get("c"), prim, CompressionCodecName.SNAPPY, null,
        java.util.Collections.emptySet[org.apache.parquet.column.Encoding](),
        st, 0L, 0L, 10L, 100L, 100L))
      b
    }
    def mm(st: Statistics[_]): Option[(Any, Any)] =
      ZoneMaps.footerMinMax(msg, Seq(block(st)), "c", DoubleType)
    // healthy stats stay footer-covered
    assert(mm(stats(1.0, 5.0)) == Some((1.0, 5.0)))
    // NaN in either bound → unusable → data-pass fallback (None)
    assert(mm(stats(Double.NaN, 5.0)).isEmpty, "NaN min must not prune")
    assert(mm(stats(1.0, Double.NaN)).isEmpty, "NaN max must not prune")
    assert(mm(stats(Double.NaN, Double.NaN)).isEmpty)
    // inverted bounds (corrupt stats from any writer) → fallback too
    assert(mm(stats(5.0, 1.0)).isEmpty, "inverted bounds must not prune")
    // multi-block: one poisoned block poisons the whole file
    assert(ZoneMaps.footerMinMax(
      msg, Seq(block(stats(1.0, 5.0)), block(stats(Double.NaN, 7.0))),
      "c", DoubleType).isEmpty)
    // a corrupt INVERTED block masked by a healthy wider block must
    // also poison the file — the file-level aggregate (1,10) looks
    // sane while block2's real rows (e.g. 50) lie outside it
    assert(ZoneMaps.footerMinMax(
      msg, Seq(block(stats(1.0, 10.0)), block(stats(7.0, 3.0))),
      "c", DoubleType).isEmpty, "masked inverted block must not prune")
  }
}
