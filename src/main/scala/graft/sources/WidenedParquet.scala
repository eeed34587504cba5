package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation._
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.parquet.schema.{MessageType, PrimitiveType}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet ingestion for the physical types Spark's reader refuses.
  *
  * The reference ingests the FULL arrow/parquet primitive surface —
  * UInt8..UInt64 and Float16 included — via its coercion matrix
  * (reference compute_value.rs:350-431, README.md:46-50). Spark 4.1
  * reads the unsigned family natively (widened exactly as SURVEY §1
  * prescribes: u8→short, u16→int, u32→long, u64→decimal(20,0)) but
  * rejects the FLOAT16 logical type outright at schema conversion
  * ([PARQUET_TYPE_ILLEGAL]) — a user pointing read_files at parquet
  * written by pandas/arrow with a half-float column gets an error, not
  * data.
  *
  * This path closes that gap Spark-first: ONE footer read (driver-side,
  * parquet-mr — the jar Spark itself bundles) builds the widened Spark
  * schema, FLOAT16 columns are requested as BinaryType (the vectorized
  * reader happily hands over FLBA(2) payloads), and a codegen'd
  * [[graft.functions.NativeExpressions.HalfToFloatExpr]] widens the
  * bytes to FloatType inside the scan's fused span. Everything else —
  * split planning, pushdown, pruning on the non-f16 columns — is the
  * untouched FileSourceScanExec machinery, so the plan at 100 TB is
  * the plan Spark would have produced had it supported the type.
  */
object WidenedParquet {

  /** The widened Spark field plus whether it needs the f16 decode. */
  private final case class Widened(field: StructField, isF16: Boolean)

  private def widenPrimitive(p: PrimitiveType): Widened = {
    val name = p.getName
    def plain(dt: DataType) = Widened(StructField(name, dt), isF16 = false)
    val ann = p.getLogicalTypeAnnotation
    p.getPrimitiveTypeName match {
      case BOOLEAN => plain(BooleanType)
      case FLOAT => plain(FloatType)
      case DOUBLE => plain(DoubleType)
      case INT32 => ann match {
        case i: IntLogicalTypeAnnotation if !i.isSigned =>
          // unsigned widening: the next signed type that holds the range
          i.getBitWidth match {
            case 8 => plain(ShortType)
            case 16 => plain(IntegerType)
            case _ => plain(LongType)
          }
        case i: IntLogicalTypeAnnotation => i.getBitWidth match {
          case 8 => plain(ByteType)
          case 16 => plain(ShortType)
          case _ => plain(IntegerType)
        }
        case _: DateLogicalTypeAnnotation => plain(DateType)
        case d: DecimalLogicalTypeAnnotation =>
          plain(DecimalType(d.getPrecision, d.getScale))
        case _ => plain(IntegerType)
      }
      case INT64 => ann match {
        case i: IntLogicalTypeAnnotation if !i.isSigned =>
          plain(DecimalType(20, 0)) // u64 range exceeds every signed long
        case t: TimestampLogicalTypeAnnotation
            if t.getUnit != TimeUnit.NANOS => plain(TimestampType)
        case t: TimestampLogicalTypeAnnotation =>
          plain(LongType) // NANOS: raw ticks, as Engine.table reads them
        case d: DecimalLogicalTypeAnnotation =>
          plain(DecimalType(d.getPrecision, d.getScale))
        case _ => plain(LongType)
      }
      case INT96 => plain(TimestampType)
      case BINARY => ann match {
        case _: StringLogicalTypeAnnotation | _: EnumLogicalTypeAnnotation |
             _: JsonLogicalTypeAnnotation => plain(StringType)
        case d: DecimalLogicalTypeAnnotation =>
          plain(DecimalType(d.getPrecision, d.getScale))
        case _ => plain(BinaryType)
      }
      case FIXED_LEN_BYTE_ARRAY => ann match {
        case _: Float16LogicalTypeAnnotation =>
          Widened(StructField(name, BinaryType), isF16 = true)
        case d: DecimalLogicalTypeAnnotation =>
          plain(DecimalType(d.getPrecision, d.getScale))
        case _ => plain(BinaryType)
      }
    }
  }

  private def widen(message: MessageType): Seq[Widened] = {
    import scala.jdk.CollectionConverters._
    message.getFields.asScala.toSeq.map { f =>
      require(f.isPrimitive,
        s"widened ingestion covers flat primitive schemas (the reference's " +
          s"surface); nested field '${f.getName}' needs the standard reader")
      widenPrimitive(f.asPrimitiveType())
    }
  }

  /** Footer schema of the first data file under `path` (file, dir, or
    * glob). One driver-side footer read — the schema-uniform layout the
    * reference assumes; schema-drifted directories belong to the
    * standard reader's mergeSchema path. */
  private def footerSchema(spark: SparkSession, path: String): MessageType = {
    val hc = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(hc)
    def firstFile(st: FileStatus): Option[Path] =
      if (st.isFile) Some(st.getPath)
      else fs.listStatus(st.getPath).sortBy(_.getPath.getName)
        .filterNot(_.getPath.getName.startsWith("_"))
        .iterator.flatMap(firstFile).nextOption()
    val statuses = Option(fs.globStatus(p)).getOrElse(Array.empty)
    val file = statuses.sortBy(_.getPath.getName).iterator.flatMap(firstFile)
      .nextOption()
      .getOrElse(throw new IllegalArgumentException(s"no parquet files at $path"))
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, hc))
    try reader.getFooter.getFileMetaData.getSchema finally reader.close()
  }

  /** Read `path` with the widened schema; FLOAT16 columns arrive as
    * FloatType (decoded in-scan), everything else per the matrix
    * above. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val widened = widen(footerSchema(spark, path))
    val schema = StructType(widened.map(_.field))
    val raw = spark.read.schema(schema).parquet(path)
    raw.select(widened.map { w =>
      if (w.isF16)
        graft.functions.NativeExpressions.half_to_float(col(w.field.name))
          .as(w.field.name)
      else col(w.field.name)
    }: _*)
  }
}
