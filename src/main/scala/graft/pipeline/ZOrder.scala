package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * Sorting a table by the bit-interleave of two key columns makes BOTH
  * columns' per-file min/max ranges narrow, so a parquet reader prunes
  * files for predicates on either key — the layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`. (The reference engine has no
  * layout optimizer; this extends its MaterializeFiles sink with a
  * placement policy, same spirit as
  * /root/reference/DEV_NOTES.md:117-122's compaction TODO.)
  *
  * The z-value is plain shift/mask arithmetic on int64 — codegen'd,
  * portable (the DuckDB oracle restates it verbatim), and cheap enough
  * to fuse into the write path.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative
    * int64 columns: bit i of x lands at position 2i, bit i of y at
    * 2i+1. Monotone in neither input but local in both — points close
    * in (x, y) are close in z. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }
  }

  /** The same interleave as ANSI-ish SQL text (DuckDB oracle + any
    * engine with >> and &) — kept next to [[zValue]] so the two can
    * never drift. */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x) >> $i) & 1) * ${1L << (2 * i)}",
          s"((($y) >> $i) & 1) * ${1L << (2 * i + 1)}")
    }.mkString("(", " + ", ")")

  /** N-dimensional Morton interleave: bit i of column k lands at
    * position i·n + k (column 0 owns the least-significant lane, like
    * [[zValue]]'s x). Delta/Iceberg OPTIMIZE ZORDER accepts any column
    * count; this is that general form — n·bits must fit the int64
    * budget. [[zValue]] is the n = 2 special case (same bit layout;
    * pinned by spec). */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "need at least one column")
    require(bits >= 1 && n * bits <= 62, s"n*bits must be <= 62, got ${n * bits}")
    cols.zipWithIndex.foldLeft(lit(0L)) { case (acc, (c, k)) =>
      (0 until bits).foldLeft(acc) { (a, i) =>
        a + shiftright(c, i).bitwiseAND(lit(1L)) * lit(1L << (i * n + k))
      }
    }
  }

  /** Data-skipping effectiveness of a z-order layout vs a single-key
    * sort, measured on the data itself: rows are assigned to
    * fixed-width "files" (buckets) under each layout — bucket = z-cell
    * range for z-order, leading-key range for the linear sort — and
    * each layout reports its bucket count and the mean per-bucket
    * key-span fraction for BOTH keys. A span fraction is the share of
    * the key domain a bucket's [min, max] footer covers = the
    * probability a uniform point predicate on that key fails to prune
    * the bucket, i.e. exactly the file-skipping win a min/max-pruning
    * reader gets. The linear layout shows ~1/buckets on its own key
    * and ~1.0 on the other; z-order shows ~1/√buckets on both — the
    * reason OPTIMIZE ZORDER exists.
    *
    * Everything is value-keyed and deterministic (fixed-width cells
    * from one tiny (min, max) metadata frame, broadcast back — unlike
    * repartitionByRange there is no sampling), so a SQL oracle can
    * restate it bit-for-bit. Span fractions are exact multiples of
    * 2^-bits (dyadic rationals), so their sums and means carry no
    * float-ordering drift. One scan + two narrow (bucket-key) shuffles.
    */
  def skippingStats(df: DataFrame, x: Column, y: Column,
                    bits: Int = 8, buckets: Int = 64): DataFrame = {
    // INTEGER columns only, enforced: the engine truncates per-row
    // (cast long) while [[skippingStatsSql]] rescales the raw column —
    // identical for integral types, but for fractional values Spark's
    // cast truncates toward zero where DuckDB's CAST rounds, so the
    // two restatements would silently diverge. Failing loudly here
    // keeps the adjacent-oracle guarantee honest.
    for (c <- Seq(x, y)) {
      val dt = df.select(c).schema.head.dataType
      require(Seq("byte", "short", "integer", "long").contains(dt.typeName),
        s"skippingStats requires an integral column; got ${dt.typeName} for $c")
    }
    require(bits >= 1 && bits <= 15, "bits must be in [1, 15]")
    require(buckets >= 1 && (buckets & (buckets - 1)) == 0 &&
      buckets <= (1 << bits), "buckets must be a power of two <= 2^bits")
    val cells = 1L << bits
    val bounds = df.agg(
      min(x).cast("long").as("xlo"), max(x).cast("long").as("xhi"),
      min(y).cast("long").as("ylo"), max(y).cast("long").as("yhi"))
    def rescale(v: Column, lo: Column, hi: Column): Column =
      floor((v - lo) * lit(cells.toDouble) / (hi - lo + lit(1.0))).cast("long")
    val r = df.select(x.cast("long").as("xv"), y.cast("long").as("yv"))
      .crossJoin(broadcast(bounds))
      .select(rescale(col("xv"), col("xlo"), col("xhi")).as("rx"),
        rescale(col("yv"), col("ylo"), col("yhi")).as("ry"))
      .withColumn("z", zValue(col("rx"), col("ry"), bits))
    val zw = math.max(1L, (cells * cells) / buckets)
    val xw = math.max(1L, cells / buckets)
    def layoutStats(bk: Column, name: String): DataFrame =
      r.groupBy(bk.as("bk"))
        .agg(min("rx").as("xmin"), max("rx").as("xmax"),
          min("ry").as("ymin"), max("ry").as("ymax"))
        .agg(count(lit(1)).as("n_buckets"),
          avg((col("xmax") - col("xmin") + 1).cast("double") / cells).as("x_span_frac"),
          avg((col("ymax") - col("ymin") + 1).cast("double") / cells).as("y_span_frac"))
        .select(lit(name).as("layout"), col("n_buckets"),
          col("x_span_frac"), col("y_span_frac"))
    layoutStats(expr(s"z div ${zw}L"), "zorder")
      .unionAll(layoutStats(expr(s"rx div ${xw}L"), "linear_x"))
      .orderBy("layout")
  }

  /** The [[skippingStats]] bucket/span computation as ANSI-ish SQL
    * (DuckDB oracle) — kept adjacent so the two can never drift. */
  def skippingStatsSql(table: String, x: String, y: String,
                       bits: Int = 8, buckets: Int = 64): String = {
    val cells = 1L << bits
    val zw = math.max(1L, (cells * cells) / buckets)
    val xw = math.max(1L, cells / buckets)
    s"""WITH b AS (SELECT min($x) AS xlo, max($x) AS xhi,
       |                  min($y) AS ylo, max($y) AS yhi FROM $table),
       |r AS (SELECT
       |  CAST(floor(($x - xlo) * $cells.0 / (xhi - xlo + 1.0)) AS BIGINT) AS rx,
       |  CAST(floor(($y - ylo) * $cells.0 / (yhi - ylo + 1.0)) AS BIGINT) AS ry
       |  FROM $table, b),
       |z AS (SELECT rx, ry, ${zValueSql("rx", "ry", bits)} AS z FROM r),
       |zs AS (SELECT z // $zw AS bk, min(rx) AS xmin, max(rx) AS xmax,
       |              min(ry) AS ymin, max(ry) AS ymax FROM z GROUP BY 1),
       |xs AS (SELECT rx // $xw AS bk, min(rx) AS xmin, max(rx) AS xmax,
       |              min(ry) AS ymin, max(ry) AS ymax FROM z GROUP BY 1)
       |SELECT 'linear_x' AS layout, count(*) AS n_buckets,
       |  avg((xmax - xmin + 1) / $cells.0) AS x_span_frac,
       |  avg((ymax - ymin + 1) / $cells.0) AS y_span_frac FROM xs
       |UNION ALL
       |SELECT 'zorder' AS layout, count(*) AS n_buckets,
       |  avg((xmax - xmin + 1) / $cells.0) AS x_span_frac,
       |  avg((ymax - ymin + 1) / $cells.0) AS y_span_frac FROM zs
       |ORDER BY layout""".stripMargin.replace('\n', ' ')
  }

  /** Cluster `df` for data skipping on (x, y): range-partition by the
    * z-value, sort within partitions, so each output file covers one
    * tight z-interval (⇒ tight x AND y intervals). Write the result
    * with any file sink; min/max footers do the pruning from there.
    * One shuffle plus one tiny (min, max) metadata job, no driver data
    * path — the standard OPTIMIZE shape.
    *
    * Keys are first RESCALED into the bits-wide domain with an affine
    * (min, max) map — [[zValue]] interleaves only the low `bits` bits,
    * so feeding it raw keys >= 2^bits would alias x and x + 2^bits to
    * one z-value and silently destroy the pruning this operator exists
    * for (Delta's OPTIMIZE ZORDER does the same reduction via range
    * ids). The rescale is the identity only when the key span is
    * exactly [0, 2^bits); any other span is stretched/shrunk onto it —
    * compare against raw [[zValue]] output only under that domain.
    * Monotone per key, so the z-locality argument is preserved;
    * precision past 2^53 per key is irrelevant for layout. */
  def clusterByZ(df: DataFrame, x: Column, y: Column, bits: Int,
                 numFiles: Int): DataFrame = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val b = df.agg(
      min(x).cast("long"), max(x).cast("long"),
      min(y).cast("long"), max(y).cast("long")).first()
    if (b.isNullAt(0)) return df // empty input: nothing to lay out
    val cells = (1L << bits).toDouble
    def rescale(c: Column, lo: Long, hi: Long): Column =
      floor((c.cast("double") - lo) * cells / ((hi - lo).toDouble + 1.0))
        .cast("long")
    val z = zValue(rescale(x, b.getLong(0), b.getLong(1)),
      rescale(y, b.getLong(2), b.getLong(3)), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
