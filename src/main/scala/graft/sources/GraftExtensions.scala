package graft.sources

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, NamedArgumentExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-native registration of the reference's `read_files` table
  * function — the "TVF injection" path SURVEY §7 reserved for when the
  * SQL-rewrite needed upgrading. With the extension installed,
  * `SELECT ... FROM read_files('glob' [, name=>'value']...)` resolves
  * through the analyzer like any built-in TVF: no pre-pass over the
  * SQL text, string literals are naturally inert, and the produced
  * plan is the ordinary file-source relation (full pushdown/pruning).
  * The regex-rewrite path (ReadFiles.sql) remains for sessions built
  * without extensions.
  *
  * Install via `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.sources.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectTableFunction((
      FunctionIdentifier("read_files"),
      new ExpressionInfo(ReadFilesTVF.getClass.getName, "read_files"),
      (args: Seq[Expression]) => ReadFilesTVF.build(args)))
  }
}

object ReadFilesTVF {
  /** Connection registry for TVF resolution — settable by the hosting
    * service (the reference configures connections per worker;
    * worker.rs:95-179). */
  @volatile var connections: Connections = Connections()

  private def str(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other =>
      throw new IllegalArgumentException(
        s"read_files: $what must be a string literal, got $other")
  }

  def build(args: Seq[Expression]): LogicalPlan = {
    var path: Option[String] = None
    val opts = scala.collection.mutable.Map[String, String]()
    args.foreach {
      case NamedArgumentExpression(key, value) =>
        opts(key.toLowerCase) = str(value, s"argument $key")
      case lit if path.isEmpty => path = Some(str(lit, "path"))
      case extra =>
        throw new IllegalArgumentException(
          s"read_files: unexpected positional argument $extra")
    }
    val p = path.getOrElse(
      throw new IllegalArgumentException("read_files: missing path argument"))
    val spark = SparkSession.active
    connections.applyTo(spark)
    val resolved = connections.resolve(opts.get("connection"), p)
    val fmt = opts.getOrElse("format", ReadFiles.inferFormat(resolved))
    val df = fmt match {
      case "csv" => spark.read
        .option("header", opts.getOrElse("header", "true"))
        .option("inferSchema", opts.getOrElse("inferschema", "true"))
        .csv(resolved)
      case "json" => spark.read.json(resolved)
      case _ => spark.read
        .option("mergeSchema", opts.getOrElse("mergeschema", "false"))
        .parquet(resolved)
    }
    df.queryExecution.analyzed
  }
}
