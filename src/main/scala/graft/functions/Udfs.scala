package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** User-function registration surface — the Spark mapping of the
  * reference's operator-task registry extension point
  * (/root/reference/src/handlers/operator_handler/operator_task_registry.rs:74-94,
  * envisioned for user functions per README.md:5-8).
  *
  * Scalar UDFs register through `spark.udf.register` (black-box to
  * Catalyst: no pushdown through them — prefer native expressions for
  * hot paths; this surface exists for user extensibility, not speed).
  * Aggregations register as typed `Aggregator`s, which DO get
  * map-side partial aggregation: `reduce` runs pre-shuffle per
  * partition and only the buffer crosses the exchange — the same
  * partial/final split Spark's built-in aggregates use, so a custom
  * aggregate scales like SUM does. */
object Udfs {

  /** Order-price tier — the scalar UDF demo. */
  val priceTier: Double => String =
    p => if (p < 50000) "low" else if (p < 150000) "mid" else "high"

  /** Sum-of-squares over longs — the typed Aggregator (UDAF) demo.
    * Exact integer arithmetic so the DuckDB oracle matches bit-for-bit
    * regardless of partial-aggregation order. */
  object SumOfSquares extends Aggregator[Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(acc: Long, x: Long): Long = acc + x * x
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(acc: Long): Long = acc
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Idempotently register every demo function on the session. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("price_tier", priceTier)
    spark.udf.register("ssq", udaf(SumOfSquares))
  }
}
