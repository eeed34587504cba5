package graft.sources

import graft.functions.NativeExpressions
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, NamedArgumentExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
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
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectTableFunction((
      FunctionIdentifier("read_files"),
      new ExpressionInfo(ReadFilesTVF.getClass.getName, "read_files"),
      (args: Seq[Expression]) => ReadFilesTVF.build(args)))

    // The pipeline's native expressions as first-class SQL scalar
    // functions — the reference's extension-registry vision
    // (operator_task_registry.rs:74-94) applied to functions: a SQL
    // user composes the whole dedup/similarity pipeline without
    // touching the Scala API, and the expressions keep their codegen.
    inject(ext, "shingle_hashes") {
      case Seq(t) => NativeExpressions.ShingleHashes(t, 3)
      case Seq(t, k) => NativeExpressions.ShingleHashes(t, intArg(k, "shingle_hashes"))
    }
    inject(ext, "sorted_intersect_size") {
      case Seq(a, b) => NativeExpressions.SortedIntersectSize(a, b)
    }
    inject(ext, "minhash_sig") {
      case Seq(c, p) => NativeExpressions.MinHashSig(c, intArg(p, "minhash_sig"))
    }
    inject(ext, "simhash_bits") {
      case Seq(c) => NativeExpressions.SimHashBits(c)
    }
    inject(ext, "dot_product") {
      case Seq(a, b) => NativeExpressions.DotProduct(a, b)
    }
    inject(ext, "poly_fingerprint") {
      case Seq(t) => NativeExpressions.PolyFingerprint(t)
    }
    // Built directly on catalyst RegExpReplace (a functions-API Column
    // would reach the builder as an unresolvable ColumnNodeExpression).
    inject(ext, "redact_pii") {
      case Seq(t) =>
        graft.pipeline.TextAnalysis.PiiPatterns.foldLeft(t) {
          case (e, (re, token)) =>
            org.apache.spark.sql.catalyst.expressions.RegExpReplace(
              e, Literal(re), Literal(token))
        }
    }
  }
}

object GraftExtensions {
  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer literal argument, got $other")
  }

  private def inject(ext: SparkSessionExtensions, name: String)(
      builder: PartialFunction[Seq[Expression], Expression]): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(NativeExpressions.getClass.getName, name),
      (args: Seq[Expression]) => builder.applyOrElse(args, (a: Seq[Expression]) =>
        throw new IllegalArgumentException(
          s"$name: unexpected argument count ${a.size}"))))
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
      case "orc" => spark.read.orc(resolved)
      case _ => spark.read
        .option("mergeSchema", opts.getOrElse("mergeschema", "false"))
        .parquet(resolved)
    }
    df.queryExecution.analyzed
  }
}
