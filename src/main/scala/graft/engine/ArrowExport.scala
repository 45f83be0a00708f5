package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}

import scala.jdk.CollectionConverters._

/** Zero-copy-shaped Arrow batch EXPORT — the engine twin of OGR's
  * `GetArrowStream` (/root/reference/ogr/ogrsf_frmts/generic/
  * ogrlayerarrow.cpp): hand a layer to an external columnar consumer as
  * Arrow record batches without materializing rows on the driver.
  *
  * Spark shape: each partition serializes its rows into one Arrow IPC
  * STREAM (schema + record batches of `batchRows`), emitted as a
  * `(partitionId, bytes)` row — external consumers (DuckDB, pyarrow,
  * polars, another JVM) read each stream independently, so a 100-TB layer
  * exports as N parallel streams with no driver bottleneck and no shuffle.
  * Types covered: the OGR field-type core (bool, int32/64, float32/64,
  * string, binary, date32, timestamp-µs) — geometry rides as WKB binary,
  * exactly how ogrlayerarrow.cpp encodes it.
  */
object ArrowExport {

  /** Spark → Arrow field mapping (nullable throughout, like OGR's export). */
  private def arrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case BooleanType => ArrowType.Bool.INSTANCE
      case IntegerType => new ArrowType.Int(32, true)
      case LongType => new ArrowType.Int(64, true)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case StringType => ArrowType.Utf8.INSTANCE
      case BinaryType => ArrowType.Binary.INSTANCE
      case DateType => new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)
      case TimestampType => new ArrowType.Timestamp(
        org.apache.arrow.vector.types.TimeUnit.MICROSECOND, "UTC")
      case other => throw new IllegalArgumentException(
        s"ArrowExport: unsupported type $other for field ${f.name}")
    }
    new Field(f.name, FieldType.nullable(t), java.util.Collections.emptyList())
  }

  def arrowSchema(schema: StructType): ArrowSchema =
    new ArrowSchema(schema.fields.map(arrowField).toSeq.asJava)

  /** Export a DataFrame as one Arrow IPC stream per partition:
    * rows → record batches of `batchRows`. Runs entirely in executors. */
  def toIpcStreams(df: DataFrame, batchRows: Int = 4096): Dataset[(Int, Array[Byte])] = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = df.schema
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val alloc = new RootAllocator(Long.MaxValue)
        val root = VectorSchemaRoot.create(arrowSchema(schema), alloc)
        val bos = new java.io.ByteArrayOutputStream()
        val writer = new ArrowStreamWriter(root, null, bos)
        writer.start()
        val buf = rows.grouped(batchRows)
        while (buf.hasNext) {
          val batch = buf.next()
          root.allocateNew()
          var i = 0
          batch.foreach { row =>
            var c = 0
            while (c < schema.length) {
              val v = root.getVector(c)
              if (row.isNullAt(c)) {
                v match {
                  case fv: BaseFixedWidthVector => fv.setNull(i)
                  case vv: BaseVariableWidthVector => vv.setNull(i)
                  case _ => ()
                }
              } else schema(c).dataType match {
                case BooleanType =>
                  v.asInstanceOf[BitVector].setSafe(i, if (row.getBoolean(c)) 1 else 0)
                case IntegerType => v.asInstanceOf[IntVector].setSafe(i, row.getInt(c))
                case LongType => v.asInstanceOf[BigIntVector].setSafe(i, row.getLong(c))
                case FloatType => v.asInstanceOf[Float4Vector].setSafe(i, row.getFloat(c))
                case DoubleType => v.asInstanceOf[Float8Vector].setSafe(i, row.getDouble(c))
                case StringType => v.asInstanceOf[VarCharVector].setSafe(i,
                  row.getString(c).getBytes(java.nio.charset.StandardCharsets.UTF_8))
                case BinaryType => v.asInstanceOf[VarBinaryVector].setSafe(i,
                  row.getAs[Array[Byte]](c))
                case DateType => v.asInstanceOf[DateDayVector].setSafe(i,
                  row.getAs[java.sql.Date](c).toLocalDate.toEpochDay.toInt)
                case TimestampType => v.asInstanceOf[TimeStampMicroTZVector].setSafe(i,
                  row.getAs[java.sql.Timestamp](c).getTime * 1000L +
                    row.getAs[java.sql.Timestamp](c).getNanos / 1000L % 1000L)
                case other => throw new IllegalArgumentException(s"unsupported $other")
              }
              c += 1
            }
            i += 1
          }
          root.setRowCount(i)
          writer.writeBatch()
        }
        writer.end(); writer.close(); root.close(); alloc.close()
        Iterator.single((pid, bos.toByteArray))
      }
    }.toDS()
  }

  /** Read IPC stream bytes back to rows of (partitionId kept by caller) —
    * the verification inverse; external consumers would use their own
    * Arrow reader. Returns the row count and per-column value arrays as
    * Seq[Seq[Any]] in column-major order for the columns requested. */
  def readIpc(bytes: Array[Byte]): (Long, Map[String, Seq[Any]]) = {
    val alloc = new RootAllocator(Long.MaxValue)
    val reader = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), alloc)
    val root = reader.getVectorSchemaRoot
    val names = root.getSchema.getFields.asScala.map(_.getName).toSeq
    val cols = scala.collection.mutable.Map[String, Vector[Any]]()
    names.foreach(n => cols(n) = Vector.empty)
    var total = 0L
    while (reader.loadNextBatch()) {
      val n = root.getRowCount
      total += n
      names.zipWithIndex.foreach { case (name, c) =>
        val v = root.getVector(c)
        val vals = (0 until n).map { i =>
          if (v.isNull(i)) null
          else v match {
            case x: VarCharVector => new String(x.get(i), java.nio.charset.StandardCharsets.UTF_8)
            case x: VarBinaryVector => x.get(i).toSeq
            case x: BigIntVector => x.get(i)
            case x: IntVector => x.get(i)
            case x: Float8Vector => x.get(i)
            case x: Float4Vector => x.get(i)
            case x: BitVector => x.get(i) == 1
            case x: DateDayVector => x.get(i)
            case x: TimeStampMicroTZVector => x.get(i)
            case other => other.getObject(i)
          }
        }
        cols(name) = cols(name) ++ vals
      }
    }
    reader.close(); alloc.close()
    (total, cols.toMap)
  }
}
