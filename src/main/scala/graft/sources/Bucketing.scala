package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout: pre-shuffle a table ONCE at write time so
  * every later join/aggregation on the bucket key runs with ZERO
  * exchange.
  *
  * This is the storage-layout counterpart of the engine's runtime
  * shuffle discipline: a `groupBy`/`join` on an unbucketed 100 TB fact
  * table shuffles the full table every query, but two tables bucketed
  * on their join key into the same bucket count are co-located by
  * construction — Spark's scan reports `HashPartitioning(key, n)` and
  * the sort-merge join's distribution requirement is already
  * satisfied, so the join (and any aggregation keyed on the same
  * column) plans with no ShuffleExchange at all (PlanSpec pins this).
  * Amortization: one shuffle at ingest time buys every subsequent
  * query; the classic use is the orders⋈lineitem backbone, joined by
  * every report.
  *
  * The reference has no table catalog or layout management at all —
  * every scan is a fresh `read_files` glob
  * (/root/reference/src/handlers/operator_handlers/table_func_tasks/
  * read_files_task.rs:156-289) and every hash join repartitions both
  * sides. Bucketing is part of the engine's 100 TB widening, not a
  * ported surface.
  *
  * Mechanics: `bucketBy` requires the catalog (`saveAsTable`) — the
  * bucket spec lives in table metadata, which a bare
  * `spark.read.parquet` cannot carry. Tables are written EXTERNAL
  * (explicit `path`) so the bytes live where the caller says and
  * survive the session; re-registering the same layout in a new
  * session is one `register` call away (the files are plain parquet
  * in bucket-numbered files).
  */
object Bucketing {

  /** Write `df` as an external bucketed table `name` at `path`,
    * bucketed by `key` into `nBuckets`, each bucket sorted by `key`
    * (plus `sortCols`). The pre-write `repartition(nBuckets, key)`
    * aligns Spark's task partitioning with the bucket hash (both are
    * Murmur3 pmod), so each task writes one bucket file instead of
    * every task writing a sliver of every bucket — nBuckets files
    * total, not nBuckets × tasks. Replaces any previous table of the
    * same name. */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    key: String, nBuckets: Int,
                    sortCols: Seq[String] = Seq.empty): Unit = {
    require(nBuckets >= 1, s"nBuckets $nBuckets must be >= 1")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.repartition(nBuckets, col(key))
      .write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key, sortCols: _*)
      .saveAsTable(name)
  }

  /** The canonical co-located pair: orders and lineitem bucketed on
    * their join key into the same bucket count, ready for
    * exchange-free joins. Returns the two table names. */
  def coLocatedOrdersLineitem(spark: SparkSession, dir: String,
                              basePath: String, nBuckets: Int = 8,
                              suffix: String = ""): (String, String) = {
    val o = s"orders_bkt$suffix"
    val l = s"lineitem_bkt$suffix"
    writeBucketed(graft.Engine.table(spark, dir, "orders"), o,
      s"$basePath/orders", "o_orderkey", nBuckets)
    writeBucketed(graft.Engine.table(spark, dir, "lineitem"), l,
      s"$basePath/lineitem", "l_orderkey", nBuckets)
    (o, l)
  }
}
