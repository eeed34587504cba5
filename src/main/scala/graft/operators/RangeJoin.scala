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
