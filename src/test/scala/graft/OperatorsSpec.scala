package graft

import graft.operators.ReferenceProjection
import org.scalatest.funsuite.AnyFunSuite

/** Pins ReferenceProjection to the reference's SELECT-list naming
  * contract (record_projection.rs:27-69 + the alias tests in
  * test_compute_value.rs). */
class OperatorsSpec extends AnyFunSuite with SparkFixture {

  private lazy val nation = Engine.table(spark, sfDir, "nation")

  test("single-part identifiers keep their names") {
    val out = ReferenceProjection.select(nation, "n_nationkey", "n_name")
    assert(out.columns.toSeq == Seq("n_nationkey", "n_name"))
  }

  test("unaliased expressions and compound identifiers become unnamed_{i}") {
    // the reference names ONLY Expr::Identifier; `t.x` falls through
    // to unnamed_{i} like any computed expression
    val out = ReferenceProjection.select(nation.alias("t"),
      "n_nationkey + 1", "t.n_name", "n_regionkey")
    assert(out.columns.toSeq == Seq("unnamed_0", "unnamed_1", "n_regionkey"))
  }

  test("aliases win; * expands all columns; t.* is the documented superset") {
    val aliased = ReferenceProjection.select(nation, "n_nationkey * 2 AS twice")
    assert(aliased.columns.toSeq == Seq("twice"))
    val star = ReferenceProjection.select(nation, "*")
    assert(star.columns.toSeq == nation.columns.toSeq)
    // qualified wildcard: NotImplemented in the reference, native here
    val qual = ReferenceProjection.select(nation.alias("t"), "t.*", "n_name")
    assert(qual.columns.toSeq == nation.columns.toSeq :+ "n_name")
  }

  test("unnamed index counts only unaliased non-identifier items") {
    val out = ReferenceProjection.select(nation,
      "n_nationkey", "n_regionkey + 1", "upper(n_name) AS u", "n_regionkey * 2")
    assert(out.columns.toSeq == Seq("n_nationkey", "unnamed_0", "u", "unnamed_1"))
  }
}
