package graft.service

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.spark.sql.Row
import org.apache.spark.sql.graftbridge.ArrowBridge
import org.apache.spark.sql.types.StructType

import java.io.ByteArrayOutputStream

/** Result pages as Arrow IPC streams — the reference's actual payload
  * format (record batches in Arrow IPC inside its framed messages,
  * /root/reference/src/handlers/message_handler/messages/exchange.rs:
  * 145-197). The JSON row encoding stays the default; a client that
  * asks for `format:"arrow"` gets the page as one IPC stream it can
  * feed straight to any Arrow library (pyarrow, arrow-rs, arrow-js)
  * with full columnar types — no per-value JSON decode. */
object ArrowPage {

  /** Serialize `rows` (shaped by `schema`) as a one-batch Arrow IPC
    * stream. Pages are small by construction (the protocol's `limit`),
    * so a single batch per page mirrors the reference's
    * one-record-per-message framing. */
  def serialize(schema: StructType, rows: Seq[Row],
                timeZoneId: String = "UTC"): Array[Byte] = {
    val arrowSchema = ArrowBridge.toArrowSchema(schema, timeZoneId)
    val alloc = new RootAllocator(Long.MaxValue)
    try {
      val root = VectorSchemaRoot.create(arrowSchema, alloc)
      try {
        val writer = ArrowBridge.writer(root)
        val toCatalyst = ArrowBridge.rowConverter(schema)
        rows.foreach(r => writer.write(toCatalyst(r)))
        writer.finish()
        val out = new ByteArrayOutputStream()
        val stream = new ArrowStreamWriter(root, null, out)
        try { stream.start(); stream.writeBatch(); stream.end() }
        finally stream.close()
        out.toByteArray
      } finally root.close()
    } finally alloc.close()
  }
}
