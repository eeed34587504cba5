package graft.service

import graft.sources.{Connections, ReadFiles, ScriptRunner}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import scala.concurrent.{ExecutionContext, Future}
import scala.util.{Failure, Success, Try}

/** Query lifecycle status — mirror of the reference's
  * `Status { Queued, Running, Complete, Error }`
  * (/root/reference/src/handlers/query_handler/query_handler_state.rs:28-61). */
sealed trait QueryStatus
object QueryStatus {
  case object Queued extends QueryStatus
  case object Running extends QueryStatus
  case object Complete extends QueryStatus
  final case class Error(message: String) extends QueryStatus
}

/** The engine's client-facing service: accepts SQL scripts, executes
  * each statement as its own query, materializes every result to a
  * deterministic parquet directory `<resultsRoot>/<query_uuid>/`, and
  * serves paged reads over those results.
  *
  * This is the part of the reference that is NOT already Spark — its
  * external protocol (RunQuery → query_id → GetQueryStatus →
  * GetQueryData; /root/reference/src/handlers/query_handler/
  * query_handler.rs:418-458, query_data_handler.rs:132-181). Planning,
  * scheduling, exchanges and retries are all Catalyst/Spark here.
  */
final class QueryService(
    spark: SparkSession,
    resultsRoot: String,
    connections: Connections = Connections())(
    implicit ec: ExecutionContext = ExecutionContext.global) {

  private val statuses = new ConcurrentHashMap[String, QueryStatus]()

  def status(queryId: String): Option[QueryStatus] = Option(statuses.get(queryId))

  def resultDir(queryId: String): String = s"$resultsRoot/$queryId"

  /** RunQuery: submit one SQL statement; returns the query id
    * immediately (status Queued → Running → Complete/Error). */
  def runQuery(sql: String): String = {
    val queryId = UUID.randomUUID().toString
    statuses.put(queryId, QueryStatus.Queued)
    Future {
      statuses.put(queryId, QueryStatus.Running)
      Try {
        val df = ReadFiles.sql(spark, sql, connections)
        df.write.mode("overwrite").parquet(resultDir(queryId))
      } match {
        case Success(_) => statuses.put(queryId, QueryStatus.Complete)
        case Failure(e) => statuses.put(queryId, QueryStatus.Error(String.valueOf(e.getMessage)))
      }
    }
    queryId
  }

  /** Multi-statement script → one query id per statement, in order
    * (semantics from the reference's client_tui SQL-file path). */
  def runScript(script: String): Seq[String] =
    ScriptRunner.split(script).map(runQuery)

  def awaitComplete(queryId: String, timeoutMs: Long = 300000): QueryStatus = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var s: QueryStatus = statuses.get(queryId)
    while ((s == QueryStatus.Queued || s == QueryStatus.Running)
        && System.currentTimeMillis() < deadline) {
      Thread.sleep(25)
      s = statuses.get(queryId)
    }
    s
  }

  def reader(queryId: String): ResultReader = new ResultReader(spark, resultDir(queryId))
}

/** Cursor into a materialized result — the reference's
  * `(file_idx, row_group_idx, row_idx)` triple
  * (/root/reference/src/handlers/query_data_handler.rs:239-571). Spark's
  * parquet reader hides row-group boundaries, so the cursor is
  * normalized to (fileIdx, rowIdx-within-file); `rowGroupIdx` from the
  * wire protocol folds into rowIdx via the file footer row counts. */
final case class ResultCursor(fileIdx: Int, rowIdx: Long)

final case class ResultPage(rows: Seq[Row], next: Option[ResultCursor], prev: Option[ResultCursor])

/** Bidirectional paged reads over one query's result directory.
  * Reference semantics (query_data_handler.rs:239-571 + DEV_NOTES.md:59-64):
  * forward reads return `limit` rows starting AT the cursor; backward
  * reads return the `limit` rows ENDING just before the cursor;
  * `allowOverflow=false` fails a read that would cross the data
  * boundary, `true` clamps to what exists. */
final class ResultReader(spark: SparkSession, dir: String) {

  /** part-files sorted by name = write order (Spark task order). */
  lazy val files: Array[String] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
      .map(_.toString).sorted
  }

  lazy val fileRowCounts: Array[Long] = files.map { f =>
    spark.read.parquet(f).count()
  }

  lazy val totalRows: Long = fileRowCounts.sum

  private def toGlobal(c: ResultCursor): Long =
    fileRowCounts.take(c.fileIdx).sum + c.rowIdx

  private def toCursor(global: Long): ResultCursor = {
    var g = global; var i = 0
    while (i < fileRowCounts.length && g >= fileRowCounts(i)) { g -= fileRowCounts(i); i += 1 }
    ResultCursor(i, g)
  }

  /** Deterministic slice [start, start+n) of one parquet file in file
    * order (zipWithIndex pins partition-ordered indexing). */
  private def slice(file: String, start: Long, n: Long): Seq[Row] =
    spark.read.parquet(file).rdd.zipWithIndex()
      .filter { case (_, i) => i >= start && i < start + n }
      .collect().sortBy(_._2).map(_._1).toSeq

  def read(cursor: ResultCursor, limit: Int, forward: Boolean = true,
           allowOverflow: Boolean = true): ResultPage = {
    val at = toGlobal(cursor)
    val (start, n) =
      if (forward) (at, math.min(limit.toLong, totalRows - at))
      else (math.max(0L, at - limit), math.min(limit.toLong, at))
    if (!allowOverflow && n < limit)
      throw new IllegalArgumentException(
        s"page [$start,+$limit) overflows result of $totalRows rows")
    val rows = Seq.newBuilder[Row]
    var remaining = n
    var g = start
    while (remaining > 0) {
      val c = toCursor(g)
      val inFile = math.min(remaining, fileRowCounts(c.fileIdx) - c.rowIdx)
      rows ++= slice(files(c.fileIdx), c.rowIdx, inFile)
      g += inFile; remaining -= inFile
    }
    val next = if (start + n < totalRows) Some(toCursor(start + n)) else None
    val prev = if (start > 0) Some(toCursor(start)) else None
    ResultPage(rows.result(), next, prev)
  }

  def asDataFrame: DataFrame = spark.read.parquet(dir)
}
