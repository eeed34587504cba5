package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — an operator Spark's
  * built-in join set lacks (a naive range join explodes to
  * per-key cross products). Composed the scale-safe way per the
  * preference order (compose > custom plan): both sides are tagged
  * and unioned, then ONE hash-partition-by-key + time-sorted window
  * carries the latest right payload forward into each left row
  * (`last(..., ignoreNulls)` over unbounded-preceding). Cost = one
  * shuffle of (key, time, payload) + one sort per partition — the
  * same shape as a sort-merge join, with no candidate blowup for
  * hot keys regardless of how many right rows precede a left row.
  *
  * Right rows sort BEFORE left rows at equal timestamps, so the
  * match is inclusive (time_left >= time_right), matching DuckDB's
  * `ASOF LEFT JOIN ... ON l.t >= r.t` semantics the oracle pins.
  * Caller guarantees payload column names don't collide with left's.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.select(
      Seq(col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftCols.map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      Seq(col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(
        Seq(col("__side")) ++ leftCols.map(col) ++
          payload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }
}
