package graft

import graft.operators.ReferenceProjection
import org.scalatest.funsuite.AnyFunSuite

/** Pins ReferenceProjection to the reference's SELECT-list naming
  * contract (record_projection.rs:27-69 + the alias tests in
  * test_compute_value.rs). */
class OperatorsSpec extends AnyFunSuite with SparkFixture {

  private lazy val nation = Engine.table(spark, sfDir, "nation")

  test("range join equals the naive interval join, including edge cases") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // boundary points, bucket-spanning intervals, overlapping
    // intervals (multi-match), and an unmatched point
    val points = Seq((1L, 0.0), (2L, 9.99), (3L, 10.0), (4L, 25.0),
      (5L, 99.99), (6L, 1000.0)).toDF("pid", "p")
    val ivals = Seq((10L, 0.0, 9.99), (20L, 5.0, 30.0), (30L, 10.0, 10.0),
      (40L, 90.0, 120.0)).toDF("iid", "lo", "hi")
    val got = graft.operators.RangeJoin
      .pointInInterval(points, ivals, "p", "lo", "hi", bucketWidth = 7.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.join(ivals, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty && got == want)
    // keyed variant: same semantics per key partition
    val kp = points.withColumn("k", col("pid") % 2)
    val ki = ivals.withColumn("k", col("iid") % 2)
    val gotK = graft.operators.RangeJoin
      .pointInIntervalByKey(kp, ki, Seq("k"), "p", "lo", "hi", 7.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantK = kp.join(ki.withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotK == wantK)
  }

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
