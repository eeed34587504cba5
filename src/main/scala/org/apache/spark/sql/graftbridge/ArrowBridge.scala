package org.apache.spark.sql.graftbridge

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.types.pojo.Schema
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils

/** Bridge to Spark's `private[sql]` Arrow machinery: schema mapping
  * (ArrowUtils) and the vector writer (execution.arrow.ArrowWriter) —
  * the same code path Spark itself uses for Arrow-based exchanges.
  * Needed by the query server's Arrow-IPC result pages. */
object ArrowBridge {

  def toArrowSchema(schema: StructType, timeZoneId: String): Schema =
    ArrowUtils.toArrowSchema(schema, timeZoneId,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)

  /** Writer that appends catalyst rows into the root's vectors. */
  def writer(root: VectorSchemaRoot): ArrowWriter = ArrowWriter.create(root)

  /** External Row → InternalRow converter for `schema` (handles java8
    * time values — Instant / LocalDate / LocalDateTime — and BigDecimal
    * the same way Spark's own ingestion does). */
  def rowConverter(schema: StructType): Row => InternalRow = {
    val conv = CatalystTypeConverters.createToCatalystConverter(schema)
    (r: Row) => conv(r).asInstanceOf[InternalRow]
  }
}
