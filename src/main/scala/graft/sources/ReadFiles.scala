package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named storage connections — the Spark mapping of the reference's
  * `ConnectionRegistry` (/root/reference/src/config/worker.rs:96-179),
  * where workers configure named fs/S3/Minio endpoints and
  * `read_files(..., connection=>'name')` selects one.
  *
  * Here a connection is a path root (posix dir, `s3a://bucket/prefix`,
  * `hdfs://...`); S3 credentials/endpoints belong in standard
  * `spark.hadoop.fs.s3a.*` conf, which Spark applies per-scheme. The
  * `"default"` connection doubles as the results root, mirroring the
  * reference's use of `default` for materialized results
  * (materialize_files_task.rs:80-81).
  */
final case class Connections(roots: Map[String, String] = Map("default" -> "")) {
  def resolve(connection: Option[String], path: String): String = {
    val root = roots.getOrElse(connection.getOrElse("default"), "")
    if (root.isEmpty || path.startsWith("/") || path.contains("://")) path
    else s"${root.stripSuffix("/")}/$path"
  }
}

/** The reference's `read_files('glob'[, connection=>'name'])` table
  * function (/root/reference/src/handlers/operator_handler/operators/
  * table_func_tasks/read_files_task.rs:64-115,156-289) re-expressed as a
  * SQL rewrite onto Spark's native parquet source.
  *
  * The reference hand-rolls: storage listing + glob match, streaming
  * parquet decode into ≤10k-row batches, record-id assignment and
  * exchange handoff. On Spark all of that is the `FileSourceScanExec`
  * path — Hadoop glob expansion, split planning via
  * `spark.sql.files.maxPartitionBytes`, the vectorized reader, and
  * shuffle — so the only thing to build is the SQL surface itself.
  */
object ReadFiles {
  // read_files('path' [, name=>'value']...) — case-insensitive,
  // whitespace-tolerant; single-quoted args as in the reference
  // grammar (read_files_task.rs:64-115 takes path + connection; we
  // extend with the reference's roadmap formats: format=>'csv'|'json'
  // |'parquet' and header=>'true'|'false' for CSV).
  private val Call =
    """(?is)read_files\s*\(\s*'([^']+)'((?:\s*,\s*\w+\s*=>\s*'[^']*')*)\s*\)""".r
  private val Arg = """(?is)(\w+)\s*=>\s*'([^']*)'""".r

  private def inferFormat(path: String): String = {
    val p = path.toLowerCase.stripSuffix("/")
    if (p.endsWith(".csv") || p.contains(".csv")) "csv"
    else if (p.endsWith(".json") || p.contains(".json")) "json"
    else "parquet"
  }

  /** Rewrite every read_files(...) call in `sql` to a registered temp
    * view over the resolved path(s). Returns the rewritten SQL. */
  def rewrite(spark: SparkSession, sql: String,
              connections: Connections = Connections()): String = {
    var i = 0
    Call.replaceAllIn(sql, m => {
      val args = Arg.findAllMatchIn(m.group(2))
        .map(a => a.group(1).toLowerCase -> a.group(2)).toMap
      val path = connections.resolve(args.get("connection"), m.group(1))
      val fmt = args.getOrElse("format", inferFormat(path))
      val df = fmt match {
        case "csv" => spark.read
          .option("header", args.getOrElse("header", "true"))
          .option("inferSchema", args.getOrElse("inferschema", "true"))
          .csv(path)
        case "json" => spark.read.json(path)
        case _ => spark.read.parquet(path)
      }
      i += 1
      // A stable, collision-free view name per call site.
      val view = s"read_files_${Integer.toHexString(path.hashCode)}_$i"
      df.createOrReplaceTempView(view)
      view
    })
  }

  /** Rewrite + execute one statement. */
  def sql(spark: SparkSession, statement: String,
          connections: Connections = Connections()): DataFrame =
    spark.sql(rewrite(spark, statement, connections))
}

/** SQL-script splitting with the semantics the reference pins in
  * /root/reference/src/planner/test_sqlparser_behavior.rs:7-27
  * (multiple `;`-separated statements, line comments tolerated). */
object ScriptRunner {
  def split(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var inStr = false
    var inLineComment = false
    while (i < script.length) {
      val c = script.charAt(i)
      if (inLineComment) {
        if (c == '\n') { inLineComment = false; cur.append(c) }
      } else if (inStr) {
        cur.append(c)
        if (c == '\'') {
          // '' escape inside string literal
          if (i + 1 < script.length && script.charAt(i + 1) == '\'') {
            cur.append('\''); i += 1
          } else inStr = false
        }
      } else c match {
        case '\'' => inStr = true; cur.append(c)
        case '-' if i + 1 < script.length && script.charAt(i + 1) == '-' =>
          inLineComment = true; i += 1
        case ';' => out += cur.result(); cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
