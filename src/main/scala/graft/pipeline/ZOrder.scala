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
