package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join.
  *
  * Spark has no native range-join operator: a join whose only
  * condition is `lo <= p AND p <= hi` plans as BroadcastNestedLoop —
  * O(points × intervals) compares and a broadcast of one whole side —
  * the first thing that dies at scale. (The reference engine has no
  * joins at all; its roadmap lists them as a declared gap —
  * /root/reference/README.md:61. This is the canonical "custom
  * operator" beyond that roadmap, built the Spark-first way: compose
  * existing operators into an equi-join plan rather than write a
  * physical operator.)
  *
  * The bucket-expansion plan (the same trick behind Databricks' range
  * join optimization): pick a bucket width W; each interval replicates
  * to the ⌈span/W⌉+1 coarse buckets it overlaps; each point maps to
  * the ONE bucket it lives in; join on the bucket id (plain shuffled
  * equi-join — partial pushdown, AQE, skew splitting all apply), then
  * apply the exact range predicate. Because a point belongs to exactly
  * one bucket, every true (point, interval) pair meets exactly once —
  * no dedup pass.
  *
  * Scale levers: W trades interval replication (span/W extra rows per
  * interval) against bucket fan-in (points per bucket joining every
  * interval overlapping that bucket). Set W ≈ median interval span;
  * skewed point-buckets are ordinary equi-join skew (AQE splits them).
  */
object RangeJoin {

  /** Auto bucket width from the data (one bounded single-row
    * aggregate over the interval side — the small side by
    * construction): W = max(median POSITIVE span, max span / 1024).
    * The median-positive-span term is the sweet spot — a typical
    * interval replicates to ~2 buckets while a bucket's fan-in stays
    * near the local interval density. Zero-width (point) intervals are
    * excluded from the median because a fleet of them would otherwise
    * drive W toward 0 and make `sequence()` explode every long
    * interval into billions of buckets — the only direction in which a
    * bad W is UNSAFE (too-large W merely raises bucket fan-in, which
    * stays a correct equi-join that AQE re-splits). The max-span/1024
    * floor hard-bounds per-interval replication at ~1025 rows even
    * when the span distribution is extremely skewed. Degenerate cases
    * (no intervals, all point intervals) fall back to width 1. */
  def autoWidth(intervals: DataFrame, loCol: String, hiCol: String): Double = {
    val span = col(hiCol).cast("double") - col(loCol).cast("double")
    val row = intervals.select(
      percentile_approx(when(span > 0, span), lit(0.5), lit(10000)).as("p50"),
      max(span).as("mx")).head()
    val p50 = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    val mx = if (row.isNullAt(1)) 0.0 else row.getDouble(1)
    val w = math.max(p50, mx / 1024.0)
    if (w <= 0) 1.0 else w
  }

  /** [[pointInInterval]] with the bucket width derived from the data
    * ([[autoWidth]]) instead of supplied by the caller. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String): DataFrame =
    pointInInterval(points, intervals, pointCol, loCol, hiCol,
      autoWidth(intervals, loCol, hiCol))

  /** [[pointInIntervalByKey]] with a data-derived bucket width. */
  def pointInIntervalByKey(points: DataFrame, intervals: DataFrame,
                           keys: Seq[String], pointCol: String,
                           loCol: String, hiCol: String): DataFrame =
    pointInIntervalByKey(points, intervals, keys, pointCol, loCol, hiCol,
      autoWidth(intervals, loCol, hiCol))

  /** Join `points` to every row of `intervals` whose CLOSED interval
    * [loCol, hiCol] contains pointCol. Column names must be disjoint
    * across the two frames. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val bk = "__graft_range_bk"
    val pb = points.withColumn(bk, floor(col(pointCol) / bucketWidth).cast("long"))
    val ib = intervals.withColumn(bk,
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    pb.join(ib, bk)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(bk)
  }

  /** Convenience: equi-key + range condition — the equi keys ride the
    * same join, so each bucket only meets its key's intervals. */
  def pointInIntervalByKey(points: DataFrame, intervals: DataFrame,
                           keys: Seq[String], pointCol: String,
                           loCol: String, hiCol: String,
                           bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val bk = "__graft_range_bk"
    val pb = points.withColumn(bk, floor(col(pointCol) / bucketWidth).cast("long"))
    val ib = intervals.withColumn(bk,
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    pb.join(ib, keys :+ bk)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(bk)
  }
}
