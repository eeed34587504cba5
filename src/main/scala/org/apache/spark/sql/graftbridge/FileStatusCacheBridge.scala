package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.FileStatusCache

/** Session file-status-cache invalidation. Spark caches leaf
  * FileStatus (incl. LENGTHS) across path reads in a session-shared
  * cache with no public eviction API — `catalog.refreshByPath` only
  * recaches cached query DATA. An operator that reconciles
  * OUT-OF-BAND table changes (a file rewritten in place keeps its
  * path but changes length/mtime) must drop those statuses or the
  * next scan reads the file with its stale cached length and fails
  * (or truncates). One-hop shim inside the sql package tree, the
  * [[ColumnBridge]] pattern. */
object FileStatusCacheBridge {
  def invalidateAll(spark: SparkSession): Unit =
    FileStatusCache.getOrCreate(spark).invalidateAll()
}
