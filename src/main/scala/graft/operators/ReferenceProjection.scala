package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.graftbridge.ColumnBridge.column

/** The reference's SELECT-list naming semantics
  * (/root/reference/src/handlers/operator_handler/operators/record_utils/
  * record_projection.rs:27-69): `*` expands all columns, `expr AS a`
  * takes the alias, a SINGLE-part identifier keeps its name, and every
  * other unaliased item — computed expressions AND compound
  * identifiers like `t.x` (the reference matches only
  * `Expr::Identifier`) — is named `unnamed_{i}` with a running index
  * over such items.
  *
  * Spark's own naming for unaliased expressions is the prettified
  * expression text; this shim reproduces the reference's contract so a
  * migrating client sees identical result schemas. Qualified wildcards
  * (`t.*`) are NotImplemented in the reference (`:33-38`) but accepted
  * here — Spark resolves them natively (documented superset). */
object ReferenceProjection {

  /** SELECT with reference naming: each item is a SQL select-item
    * string (`*`, `t.*`, `col`, `expr`, `expr AS alias`). */
  def select(df: DataFrame, items: String*): DataFrame = {
    val parser = df.sparkSession.sessionState.sqlParser
    var unnamed = 0
    val cols: Seq[Column] = items.map(_.trim).map { it =>
      if (it == "*" || it.endsWith(".*")) {
        // wildcards aren't parseExpression-parseable; Column handles them
        org.apache.spark.sql.functions.col(it)
      } else parser.parseExpression(it) match {
        case a: UnresolvedAttribute if a.nameParts.length == 1 => column(a)
        case e @ (_: Alias | _: UnresolvedStar) => column(e)
        case other =>
          val c = column(Alias(other, s"unnamed_$unnamed")())
          unnamed += 1
          c
      }
    }
    df.select(cols: _*)
  }
}
