package graft.sources.v2

import java.util.{Map => JMap}

import scala.collection.JavaConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Avro

/** DataSource V2 registration of the Avro container-file source/sink:
  * `spark.read.format("graft-avro").load(dir)` /
  * `df.write.format("graft-avro").mode("overwrite").save(dir)` /
  * `CREATE TABLE t USING `graft-avro` LOCATION ...`.
  *
  * Parity target: the reference registers its Avro SerDe as a first-class
  * storage format (io/AvroStorageFormatDescriptor.java), not just a
  * programmatic reader — this provider is the Spark-native equivalent of
  * that registration, layered over the same schema/value mapping as
  * [[graft.sources.Avro]].
  *
  * Scale design beyond the programmatic path:
  *   - one InputPartition per container file (executor-side streaming
  *     decode, no driver funnel);
  *   - REAL projection pushdown: the pruned Spark schema is converted back
  *     to an Avro reader schema and handed to the datum reader, so Avro's
  *     schema-resolution machinery skips decoding the dropped columns —
  *     the scan does less work, not just the plan above it;
  *   - writers emit task-unique file names directly (job-level commit is a
  *     no-op; abort deletes the task's file). Honest caveat: like the
  *     reference's MoveTask-era sinks, a crash between task commits can
  *     leave partial files — a manifest/commit-log layer would close that.
  */
class AvroDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-avro requires a path")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroV2Util.inferSchema(pathOf(options))

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    // a catalog CREATE TABLE (no data access yet) probes getTable without
    // a path — the managed location only exists in the catalog entry;
    // read/write-time invocations always carry path (or location), so the
    // pathless Table is a capability/schema carrier only
    val p = Option(properties.get("path"))
      .orElse(Option(properties.get("location"))).getOrElse("")
    AvroTable(p, schema)
  }
}

object AvroV2Util {
  def inferSchema(dir: String): StructType = {
    val conf = new Configuration()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = fs.globStatus(new Path(root, "*.avro"))
    require(files != null && files.nonEmpty, s"no .avro files under $dir")
    val r = new DataFileReader[GenericRecord](
      new FsInput(files.head.getPath, conf), new GenericDatumReader[GenericRecord]())
    val avro = try r.getSchema finally r.close()
    StructType(avro.getFields.asScala.map { f =>
      StructField(f.name, Avro.toSparkType(f.schema()), nullable = true)
    }.toArray)
  }

  def listFiles(dir: String): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(new Configuration())
    Option(fs.globStatus(new Path(root, "*.avro"))).toSeq.flatten
      .map(_.getPath.toString).sorted
  }

  /** Scale of an Avro field's decimal logical type (through a [null, T]
    * union), or `dflt` when the field carries no decimal logical type. */
  def decimalScaleOf(s: org.apache.avro.Schema, dflt: Int): Int = {
    val u = if (s.getType == org.apache.avro.Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != org.apache.avro.Schema.Type.NULL)
        .getOrElse(s)
    else s
    u.getLogicalType match {
      case d: org.apache.avro.LogicalTypes.Decimal => d.getScale
      case _ => dflt
    }
  }

  /** Decimal bytes → Catalyst Decimal, honoring the WRITER's scale. */
  def toInternalDecimal(v: Any, dec: DecimalType, writerScale: Int): Any =
    v match {
      case null => null
      case b: java.nio.ByteBuffer =>
        val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr)
        val bd = new java.math.BigDecimal(
            new java.math.BigInteger(arr), writerScale)
          .setScale(dec.scale, java.math.RoundingMode.HALF_UP)
        org.apache.spark.sql.types.Decimal(bd, dec.precision, dec.scale)
      case other => other
    }

  /** Avro external value → Catalyst internal value for one field. */
  def toInternal(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: CharSequence, StringType) => UTF8String.fromString(u.toString)
    case (l: java.lang.Long, TimestampType) => l.longValue      // micros
    case (l: java.lang.Long, TimestampNTZType) => l.longValue   // micros
    case (i: java.lang.Integer, DateType) => i.intValue         // epoch days
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (b: java.nio.ByteBuffer, dec: DecimalType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr)
      org.apache.spark.sql.types.Decimal(
        new java.math.BigDecimal(new java.math.BigInteger(arr), dec.scale),
        dec.precision, dec.scale)
    case (xs: java.util.Collection[_], ArrayType(elem, _)) =>
      new GenericArrayData(xs.asScala.map(toInternal(_, elem)).toArray)
    case (other, _) => other
  }

  /** Catalyst internal value → Avro external value for one field. */
  def fromInternal(row: InternalRow, i: Int, dt: DataType): AnyRef = {
    if (row.isNullAt(i)) return null
    dt match {
      case StringType => row.getUTF8String(i).toString
      case LongType => Long.box(row.getLong(i))
      case IntegerType => Int.box(row.getInt(i))
      case DoubleType => Double.box(row.getDouble(i))
      case FloatType => Float.box(row.getFloat(i))
      case BooleanType => Boolean.box(row.getBoolean(i))
      case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
      case DateType => Int.box(row.getInt(i))
      case TimestampType | TimestampNTZType => Long.box(row.getLong(i))
      case dec: DecimalType =>
        java.nio.ByteBuffer.wrap(row.getDecimal(i, dec.precision, dec.scale)
          .toJavaBigDecimal.setScale(dec.scale).unscaledValue.toByteArray)
      case ArrayType(elem, _) =>
        val arr = row.getArray(i)
        val out = new java.util.ArrayList[AnyRef](arr.numElements())
        var j = 0
        while (j < arr.numElements()) {
          out.add(fromArrayElem(arr, j, elem)); j += 1
        }
        out
      case other => throw new IllegalArgumentException(s"graft-avro: unsupported $other")
    }
  }

  private def fromArrayElem(arr: ArrayData, j: Int, dt: DataType): AnyRef = {
    if (arr.isNullAt(j)) return null
    dt match {
      case StringType => arr.getUTF8String(j).toString
      case LongType => Long.box(arr.getLong(j))
      case IntegerType => Int.box(arr.getInt(j))
      case DoubleType => Double.box(arr.getDouble(j))
      case FloatType => Float.box(arr.getFloat(j))
      case BooleanType => Boolean.box(arr.getBoolean(j))
      case DateType => Int.box(arr.getInt(j))                        // epoch days
      case TimestampType | TimestampNTZType => Long.box(arr.getLong(j)) // micros
      case BinaryType => java.nio.ByteBuffer.wrap(arr.getBinary(j))
      case ArrayType(inner, _) =>
        val nested = arr.getArray(j)
        val out = new java.util.ArrayList[AnyRef](nested.numElements())
        var m = 0
        while (m < nested.numElements()) { out.add(fromArrayElem(nested, m, inner)); m += 1 }
        out
      case other => throw new IllegalArgumentException(s"graft-avro: unsupported array elem $other")
    }
  }
}

case class AvroTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite
    with SupportsMetadataColumns {
  override def name(): String = s"graft-avro:$path"
  override def schema(): StructType = tableSchema
  override def metadataColumns(): Array[MetadataColumn] =
    Array(FileMetadataColumn)
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(path, info.schema())
}

class AvroScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = AvroScan(path, required)
}

case class AvroScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro ReadSchema: ${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    AvroV2Util.listFiles(path).map(f => AvroFilePartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    AvroReaderFactory(required.json)
}

case class AvroFilePartition(file: String) extends InputPartition

case class AvroReaderFactory(requiredJson: String) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[AvroFilePartition].file
    val full = DataType.fromJson(requiredJson).asInstanceOf[StructType]
    // _metadata is answered from the partition's file path, never decoded —
    // strip it from the Avro reader schema before schema resolution
    val required = StructType(
      full.fields.filterNot(_.name == FileMetadataColumn.NAME))
    val metaRow = FileMetadataColumn.rowFor(file)
    // Pushdown is real: the pruned reader schema goes into Avro's schema
    // resolution, so dropped columns are skipped during decode.
    val readerSchema = Avro.toAvroSchema(required)
    // writer schema is set from the file header by DataFileReader;
    // the expected (reader) schema is the pruned one
    val reader = new DataFileReader[GenericRecord](
      new FsInput(new Path(file), new Configuration()),
      new GenericDatumReader[GenericRecord](null, readerSchema))
    val fields = full.fields
    // Avro schema resolution ignores LOGICAL types: a decimal field's
    // bytes resolve even when the FILE was written at a different scale
    // than the catalog declares (schema evolution / external files).
    // Interpret unscaled bytes at the WRITER's scale, then rescale — the
    // reference's AvroDeserializer does the same via the writer schema.
    val writerScale: Array[Int] = fields.map { f =>
      f.dataType match {
        case dec: DecimalType =>
          Option(reader.getSchema.getField(f.name))
            .map(fl => AvroV2Util.decimalScaleOf(fl.schema(), dec.scale))
            .getOrElse(dec.scale)
        case _ => -1
      }
    }
    new PartitionReader[InternalRow] {
      override def next(): Boolean = reader.hasNext
      override def get(): InternalRow = {
        val rec = reader.next()
        val vals = new Array[Any](fields.length)
        var i = 0
        while (i < fields.length) {
          vals(i) =
            if (fields(i).name == FileMetadataColumn.NAME) metaRow
            else if (writerScale(i) >= 0)
              AvroV2Util.toInternalDecimal(rec.get(fields(i).name),
                fields(i).dataType.asInstanceOf[DecimalType], writerScale(i))
            else AvroV2Util.toInternal(rec.get(fields(i).name), fields(i).dataType)
          i += 1
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = reader.close()
    }
  }
}

class AvroWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate
    with org.apache.spark.sql.connector.write.SupportsOverwrite
    with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  // avro tables are flat (no partition transforms), so INSERT OVERWRITE —
  // whether planned as static overwrite or, under the session default
  // partitionOverwriteMode=dynamic, as OverwritePartitionsDynamic — is
  // truncate-and-write
  override def overwrite(
      filters: Array[org.apache.spark.sql.sources.Filter]): WriteBuilder = {
    // only a whole-table overwrite is expressible on a flat table; if the
    // planner ever pushes a real row filter, failing loudly beats silently
    // deleting the non-matching rows
    val real = filters.filterNot(_ == org.apache.spark.sql.sources.AlwaysTrue)
    require(real.isEmpty,
      s"graft-avro supports only full-table overwrite, got filters: ${real.mkString(", ")}")
    doTruncate = true; this
  }
  override def overwriteDynamicPartitions(): WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): Write = {
    // fail fast on unsupported types HERE, before BatchWrite truncates the
    // destination — a mid-write schema error must not destroy existing data
    Avro.toAvroSchema(schema): Unit
    new Write {
      override def toBatch: BatchWrite = AvroBatchWrite(path, schema.json, doTruncate)
    }
  }
}

case class AvroBatchWrite(path: String, schemaJson: String, doTruncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    if (doTruncate && fs.exists(p)) fs.delete(p, true): Unit
    fs.mkdirs(p): Unit
    AvroWriterFactory(path, schemaJson)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class AvroWriterFactory(path: String, schemaJson: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val sparkSchema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val avroSchema = Avro.toAvroSchema(sparkSchema)
    // uuid guards against (partitionId, taskId) reuse across separate
    // append jobs — fs.create(overwrite) would silently clobber otherwise
    val uid = java.util.UUID.randomUUID().toString.take(8)
    val file = new Path(path, f"part-$partitionId%05d-$taskId-$uid.avro")
    val fs = file.getFileSystem(new Configuration())
    val writer = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(avroSchema, fs.create(file, true)): Unit
    val types = sparkSchema.fields.map(_.dataType)
    new DataWriter[InternalRow] {
      override def write(row: InternalRow): Unit = {
        val rec = new GenericData.Record(avroSchema)
        var i = 0
        while (i < types.length) {
          rec.put(i, AvroV2Util.fromInternal(row, i, types(i)))
          i += 1
        }
        writer.append(rec): Unit
      }
      override def commit(): WriterCommitMessage = {
        writer.close()
        new WriterCommitMessage {}
      }
      override def abort(): Unit = {
        writer.close()
        fs.delete(file, false): Unit
      }
      override def close(): Unit = ()
    }
  }
}
