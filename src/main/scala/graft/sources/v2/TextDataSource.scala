package graft.sources.v2

import java.util.{Map => JMap}

import scala.collection.JavaConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.Text
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsDynamicOverwrite, SupportsOverwrite, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 for Hive text tables through the REAL LazySimpleSerDe
  * (reference: serde/src/java/.../lazy/LazySimpleSerDe.java) — the path
  * `STORED AS TEXTFILE` takes when the csv datasource cannot express the
  * table: complex column types (array/map/struct/uniontype — the serde's
  * nested `\002`/`\003`/deeper separators) or explicit COLLECTION ITEMS /
  * MAP KEYS delimiters. Byte-interoperable both ways: graft-written lines
  * decode in Hive and vice versa, because the SAME serde class encodes
  * them.
  *
  * Options (the serde's own property names): `field.delim`,
  * `collection.delim`, `mapkey.delim`, `escape.delim`,
  * `serialization.null.format`; plus `compress.codec` (or session
  * `SET hive.exec.compress.output=true` [+ codec conf]) for compressed
  * text OUTPUT, FileSinkOperator-style.
  *
  * Scale design: uncompressed files split into newline-aligned
  * byte-range InputPartitions ([[FileSplits]]); gzip-style codecs are
  * supported via the Hadoop codec factory — such files are inherently
  * unsplittable, exactly as in the reference; LazySimpleSerDe decodes
  * fields LAZILY, so unprojected columns are never materialized.
  * Partitioned tables share the Hive `p=v` layout machinery
  * ([[PartLayout]]); `_metadata.file_path` serves the CoW DML engine.
  */
class TextDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-text"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TextV2Util.inferSchema(
      Option(options.get("path")).getOrElse(
        sys.error("graft-text requires a path to infer a schema")),
      Option(options.get("field.delim")).getOrElse("\u0001"))

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val p = Option(properties.get("path"))
      .orElse(Option(properties.get("location"))).getOrElse("")
    val partCols =
      if (partitioning.nonEmpty) PartLayout.partColNames(partitioning)
      else Option(properties.get("partitions")).toSeq
        .flatMap(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    TextTable(p, schema, partCols, TextV2Util.serdeProps(properties))
  }
}

object TextV2Util {
  /** The serde-relevant option subset, preserved verbatim for the
    * executor-side serde init. */
  def serdeProps(properties: JMap[String, String]): Map[String, String] =
    properties.asScala.toSeq.filter { case (k, _) =>
      Set("field.delim", "collection.delim", "mapkey.delim",
        "escape.delim", "serialization.null.format", "compress.codec")
        .contains(k.toLowerCase)
    }.map { case (k, v) => k.toLowerCase -> v }.toMap

  /** Output-compression decision at write-build time — Hive's
    * FileSinkOperator consults `hive.exec.compress.output` +
    * `mapred(uce)?.output.compression.codec`
    * (reference: ql/src/java/.../exec/FileSinkOperator.java,
    * Utilities.getFileExtension). An explicit `compress.codec` writer
    * option wins; otherwise the session SET values apply, with Hive's
    * own default codec (deflate) when only the boolean is set. */
  def effectiveOutputCodec(props: Map[String, String]): Option[String] = {
    props.get("compress.codec").map(_.trim).filter(_.nonEmpty)
      .filterNot(_.equalsIgnoreCase("none")).orElse {
        val conf = org.apache.spark.sql.internal.SQLConf.get
        val on = Seq("hive.exec.compress.output", "mapred.output.compress",
          "mapreduce.output.fileoutputformat.compress")
          .exists(k => conf.getConfString(k, "false").equalsIgnoreCase("true"))
        if (!on) None
        else Some(Seq("mapred.output.compression.codec",
          "mapreduce.output.fileoutputformat.compress.codec")
          .map(k => conf.getConfString(k, "")).find(_.nonEmpty)
          .getOrElse("deflate"))
      }
  }

  /** Resolve a codec by Hadoop class name or short alias and instantiate
    * it against `conf` (pure-Java codecs only — zlib/gzip/bzip2 need no
    * native libs). */
  def newCodec(name: String, conf: Configuration)
      : org.apache.hadoop.io.compress.CompressionCodec = {
    val cls = name.toLowerCase match {
      case "gzip" | "gz" => "org.apache.hadoop.io.compress.GzipCodec"
      case "deflate" | "zlib" | "default" =>
        "org.apache.hadoop.io.compress.DefaultCodec"
      case "bzip2" | "bz2" => "org.apache.hadoop.io.compress.BZip2Codec"
      case _ => name
    }
    org.apache.hadoop.util.ReflectionUtils.newInstance(
      Class.forName(cls).asSubclass(
        classOf[org.apache.hadoop.io.compress.CompressionCodec]), conf)
  }

  /** Hive type string, recursive over complex types (TypeInfoUtils
    * grammar) — the serde's `columns.types` property. */
  def hiveTypeName(dt: DataType): String = dt match {
    case ArrayType(e, _) => s"array<${hiveTypeName(e)}>"
    case MapType(k, v, _) => s"map<${hiveTypeName(k)},${hiveTypeName(v)}>"
    case st: StructType => "struct<" +
      st.fields.map(f => s"${f.name}:${hiveTypeName(f.dataType)}").mkString(",") + ">"
    case prim => RcV2Util.hiveTypeName(prim)
  }

  /** Instantiate + initialize LazySimpleSerDe for the DATA schema with
    * the table's delimiter/null options. */
  def newSerde(dataSchema: StructType, props: Map[String, String])
      : org.apache.hadoop.hive.serde2.AbstractSerDe = {
    val serde = new org.apache.hadoop.hive.serde2.`lazy`.LazySimpleSerDe()
    val p = new java.util.Properties()
    p.setProperty("columns", dataSchema.fieldNames.mkString(","))
    p.setProperty("columns.types",
      dataSchema.fields.map(f => hiveTypeName(f.dataType)).mkString(":"))
    props.foreach { case (k, v) => p.setProperty(k, v) }
    serde.initialize(new Configuration(), p)
    serde
  }

  /** Standard-Java ObjectInspector tree matching [[toHiveValue]]'s
    * objects, recursive over complex types — the serialize-side OI. */
  def javaOI(dt: DataType)
      : org.apache.hadoop.hive.serde2.objectinspector.ObjectInspector = {
    import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspectorFactory
    import org.apache.hadoop.hive.serde2.objectinspector.primitive.{PrimitiveObjectInspectorFactory => P}
    dt match {
      case ArrayType(e, _) =>
        ObjectInspectorFactory.getStandardListObjectInspector(javaOI(e))
      case MapType(k, v, _) =>
        ObjectInspectorFactory.getStandardMapObjectInspector(javaOI(k), javaOI(v))
      case st: StructType =>
        ObjectInspectorFactory.getStandardStructObjectInspector(
          st.fieldNames.toSeq.asJava,
          st.fields.toSeq.map(f => javaOI(f.dataType)).asJava)
      case StringType => P.javaStringObjectInspector
      case IntegerType => P.javaIntObjectInspector
      case LongType => P.javaLongObjectInspector
      case ShortType => P.javaShortObjectInspector
      case ByteType => P.javaByteObjectInspector
      case DoubleType => P.javaDoubleObjectInspector
      case FloatType => P.javaFloatObjectInspector
      case BooleanType => P.javaBooleanObjectInspector
      case BinaryType => P.javaByteArrayObjectInspector
      case DateType => P.javaDateObjectInspector
      case TimestampType | TimestampNTZType => P.javaTimestampObjectInspector
      case _: DecimalType => P.javaHiveDecimalObjectInspector
      case other => sys.error(s"graft-text: unsupported column type $other")
    }
  }

  /** Catalyst VALUE (as stored in InternalRow/ArrayData) → the Hive-Java
    * object [[javaOI]] declares, recursive. */
  def toHiveValue(v: Any, dt: DataType, zone: java.time.ZoneId): Object = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    if (v == null) return null
    dt match {
      case ArrayType(et, _) =>
        val ad = v.asInstanceOf[ArrayData]
        val out = new java.util.ArrayList[Object](ad.numElements())
        var i = 0
        while (i < ad.numElements()) {
          out.add(toHiveValue(ad.get(i, et), et, zone)); i += 1
        }
        out
      case MapType(kt, vt, _) =>
        val md = v.asInstanceOf[MapData]
        val out = new java.util.LinkedHashMap[Object, Object]()
        val ks = md.keyArray(); val vs = md.valueArray()
        var i = 0
        while (i < md.numElements()) {
          out.put(toHiveValue(ks.get(i, kt), kt, zone),
            toHiveValue(vs.get(i, vt), vt, zone))
          i += 1
        }
        out
      case st: StructType =>
        val r = v.asInstanceOf[InternalRow]
        val out = new java.util.ArrayList[Object](st.length)
        var i = 0
        while (i < st.length) {
          out.add(toHiveValue(
            if (r.isNullAt(i)) null else r.get(i, st.fields(i).dataType),
            st.fields(i).dataType, zone))
          i += 1
        }
        out
      case StringType => v.asInstanceOf[UTF8String].toString
      case IntegerType | LongType | ShortType | ByteType |
           DoubleType | FloatType | BooleanType => v.asInstanceOf[Object]
      case BinaryType => v.asInstanceOf[Array[Byte]]
      case d: DecimalType => org.apache.hadoop.hive.common.`type`.HiveDecimal
        .create(v.asInstanceOf[Decimal].toJavaBigDecimal)
      case DateType => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case TimestampType => java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.ofInstant(
          DateTimeUtils.microsToInstant(v.asInstanceOf[Long]), zone))
      case TimestampNTZType => java.sql.Timestamp.valueOf(
        DateTimeUtils.microsToLocalDateTime(v.asInstanceOf[Long]))
      case other => sys.error(s"graft-text: unsupported write type $other")
    }
  }

  /** Lazy serde object (+ its OI) → Catalyst value, recursive — the
    * deserialize-side bridge. Primitives reuse the RCFile source's
    * converter (same java objects). */
  def fromHive(data: Any,
      oi: org.apache.hadoop.hive.serde2.objectinspector.ObjectInspector,
      dt: DataType, zone: java.time.ZoneId): Any = {
    import org.apache.hadoop.hive.serde2.objectinspector._
    if (data == null) return null
    (oi, dt) match {
      case (p: PrimitiveObjectInspector, _) =>
        RcV2Util.hiveJavaToCatalyst(p.getPrimitiveJavaObject(data), dt, zone)
      case (l: ListObjectInspector, ArrayType(et, _)) =>
        val n = l.getListLength(data)
        val arr = new Array[Any](n)
        var i = 0
        while (i < n) {
          arr(i) = fromHive(l.getListElement(data, i),
            l.getListElementObjectInspector, et, zone)
          i += 1
        }
        new GenericArrayData(arr)
      case (m: MapObjectInspector, MapType(kt, vt, _)) =>
        val entries = m.getMap(data)
        val ks = new Array[Any](entries.size()); val vs = new Array[Any](entries.size())
        var i = 0
        entries.entrySet().asScala.foreach { e =>
          ks(i) = fromHive(e.getKey, m.getMapKeyObjectInspector, kt, zone)
          vs(i) = fromHive(e.getValue, m.getMapValueObjectInspector, vt, zone)
          i += 1
        }
        new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
      case (s: StructObjectInspector, st: StructType) =>
        // resolve fields by NAME, not position: Spark prunes NESTED
        // struct fields (required may carry struct<y> while the serde's
        // OI still has struct<x,y>), so positions need not line up
        val vals = new Array[Any](st.length)
        var i = 0
        while (i < st.length) {
          val ref = s.getStructFieldRef(st.fields(i).name)
          vals(i) = fromHive(s.getStructFieldData(data, ref),
            ref.getFieldObjectInspector, st.fields(i).dataType, zone)
          i += 1
        }
        new GenericInternalRow(vals)
      case (other, _) => sys.error(
        s"graft-text: unsupported inspector ${other.getClass.getName} for $dt")
    }
  }

  /** Schema-less reads see string columns c0..cN from the first line's
    * field count — tables always carry a declared schema, so this is a
    * programmatic-read convenience only. */
  def inferSchema(dir: String, fieldDelim: String): StructType = {
    val files = SeqV2Util.listFiles(dir)
    require(files.nonEmpty, s"no files under $dir")
    val p = new Path(files.head)
    val conf = FileSplits.hadoopConf()
    val in = openMaybeCompressed(p, conf)
    val lr = new org.apache.hadoop.util.LineReader(in)
    val line = new Text()
    val n = try {
      if (lr.readLine(line) > 0)
        line.toString.split(java.util.regex.Pattern.quote(fieldDelim), -1).length
      else 1
    } finally lr.close()
    StructType((0 until n).map(i => StructField(s"c$i", StringType)))
  }

  /** Open with codec-factory decompression (gzip text files are standard
    * Hive practice; they read as one split, same as the reference). */
  def openMaybeCompressed(p: Path, conf: Configuration): java.io.InputStream = {
    val raw = p.getFileSystem(conf).open(p)
    Option(new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
      .getCodec(p)) match {
      case Some(codec) => codec.createInputStream(raw)
      case None => raw
    }
  }
}

case class TextTable(path: String, tableSchema: StructType,
    partCols: Seq[String], props: Map[String, String])
    extends Table with SupportsRead with SupportsWrite
    with SupportsMetadataColumns {
  override def name(): String = s"graft-text:$path"
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] =
    PartLayout.identityTransforms(partCols)
  override def metadataColumns(): Array[MetadataColumn] =
    Array(FileMetadataColumn)
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TextScanBuilder(path, tableSchema, partCols, props)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new TextWriteBuilder(path, info.schema(), partCols, props)
}

class TextScanBuilder(path: String, full: StructType, partCols: Seq[String],
    props: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = full
  private var prune: Seq[Filter] = Nil
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // partition equality/IN filters prune the directory listing only;
  // every filter is returned for Spark to re-evaluate post-scan
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    prune = filters.toSeq.filter {
      case org.apache.spark.sql.sources.EqualTo(a, _) => partCols.contains(a)
      case org.apache.spark.sql.sources.In(a, _) => partCols.contains(a)
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = Array.empty
  override def build(): Scan = TextScan(path, full, required, partCols, prune, props)
}

case class TextScan(path: String, full: StructType, required: StructType,
    partCols: Seq[String], prune: Seq[Filter], props: Map[String, String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-text ReadSchema: ${required.fieldNames.mkString(",")}" +
      (if (prune.nonEmpty) s" PartitionPrune: ${prune.mkString(",")}" else "")
  override def planInputPartitions(): Array[InputPartition] = {
    // newline-boundary byte ranges for uncompressed text (the
    // LineRecordReader convention); suffix-compressed files (gzip —
    // standard Hive practice) stay one split each
    val target = FileSplits.targetBytes
    val listed: Seq[(String, Long, Map[String, String])] =
      if (partCols.isEmpty)
        FileSplits.listFilesWithLen(path).map { case (f, len) =>
          (f, len, Map.empty[String, String]) }
      else {
        val root = new Path(path)
        PartLayout.listPartitionedFilesWithLen(root,
          root.getFileSystem(FileSplits.hadoopConf()), partCols, _ => true,
          spec => PartPrune.accepts(prune, spec, PartLayout.partTypes(full, partCols)))
      }
    listed.flatMap { case (f, len, spec) =>
      FileSplits.forFile(f, len, target).map { case (start, length) =>
        SeqFilePartition(f, spec, start, length): InputPartition
      }
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    TextReaderFactory(full.json, required.json, partCols,
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone, props,
      FileSplits.confOverlay())
}

case class TextReaderFactory(fullJson: String, requiredJson: String,
    partCols: Seq[String], sessionTz: String, props: Map[String, String],
    confOverlay: Map[String, String] = Map.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqFilePartition]
    val full = DataType.fromJson(fullJson).asInstanceOf[StructType]
    val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
    val zone = java.time.ZoneId.of(sessionTz)
    val dataFields = full.fields.filterNot(f => partCols.contains(f.name))
    val posOf = dataFields.map(_.name).zipWithIndex.toMap
    val fieldPos = required.fields.map { f =>
      if (f.name == FileMetadataColumn.NAME) -1
      else if (partCols.contains(f.name)) -2 - partCols.indexOf(f.name)
      else posOf(f.name)
    }
    val types = required.fields.map(_.dataType)
    val partVals = partCols.map(c =>
      p.partSpec.get(c).map(v => PartLayout.castValue(v,
        full(full.fieldIndex(c)).dataType)).orNull).toArray
    val metaRow = FileMetadataColumn.rowFor(p.file)
    val conf = FileSplits.buildConf(confOverlay)
    val serde = TextV2Util.newSerde(
      StructType(dataFields.toSeq.map(_.copy())), props)
    val soi = serde.getObjectInspector
      .asInstanceOf[org.apache.hadoop.hive.serde2.objectinspector.StructObjectInspector]
    val refs = soi.getAllStructFieldRefs
    // Newline-aligned byte range (LineRecordReader convention): a line
    // belongs to the split containing its FIRST byte. A non-zero start
    // seeks then discards the partial line (the previous split read it —
    // it reads through the first line ENDING past its end); compressed
    // streams are never range-split, and their decompressed position is
    // unbounded, so their end is +inf.
    val fsPath = new Path(p.file)
    val rawFs = fsPath.getFileSystem(conf)
    val codec = Option(
      new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
        .getCodec(fsPath))
    val end: Long = codec match {
      case Some(_) => Long.MaxValue
      case None =>
        if (p.length == Long.MaxValue) Long.MaxValue else p.start + p.length
    }
    var pos: Long = p.start
    val lr = codec match {
      case Some(c) =>
        new org.apache.hadoop.util.LineReader(c.createInputStream(rawFs.open(fsPath)))
      case None =>
        val s = rawFs.open(fsPath)
        if (p.start > 0) s.seek(p.start)
        val r = new org.apache.hadoop.util.LineReader(s)
        if (p.start > 0) pos += r.readLine(new Text())
        r
    }
    val line = new Text()
    new PartitionReader[InternalRow] {
      override def next(): Boolean = {
        if (pos > end) false
        else {
          val n = lr.readLine(line)
          pos += n
          n > 0
        }
      }
      override def get(): InternalRow = {
        val struct = serde.deserialize(line)
        val vals = new Array[Any](types.length)
        var i = 0
        while (i < types.length) {
          vals(i) =
            if (fieldPos(i) == -1) metaRow
            else if (fieldPos(i) <= -2) partVals(-2 - fieldPos(i))
            else {
              val ref = refs.get(fieldPos(i))
              TextV2Util.fromHive(soi.getStructFieldData(struct, ref),
                ref.getFieldObjectInspector, types(i), zone)
            }
          i += 1
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = lr.close()
    }
  }
}

class TextWriteBuilder(path: String, schema: StructType, partCols: Seq[String],
    props: Map[String, String])
    extends WriteBuilder with SupportsTruncate with SupportsOverwrite
    with SupportsDynamicOverwrite {
  private var mode = "NONE"
  private var staticSpec: Map[String, String] = Map.empty
  override def truncate(): WriteBuilder = { mode = "ALL"; this }
  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    val real = filters.filterNot(_ == org.apache.spark.sql.sources.AlwaysTrue)
    if (real.isEmpty) { mode = "ALL"; return this }
    val specs = real.map {
      case org.apache.spark.sql.sources.EqualTo(a, v) if partCols.contains(a) =>
        a -> String.valueOf(v)
      case org.apache.spark.sql.sources.EqualNullSafe(a, v) if partCols.contains(a) =>
        a -> (if (v == null) PartLayout.NULL_DIR else String.valueOf(v))
      case f => sys.error(
        s"graft-text supports only full-table or partition-equality overwrite, got: $f")
    }
    mode = "STATIC"; staticSpec = specs.toMap; this
  }
  override def overwriteDynamicPartitions(): WriteBuilder = {
    mode = if (partCols.isEmpty) "ALL" else "DYNAMIC"; this
  }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = TextBatchWrite(path, schema.json,
      partCols, mode, staticSpec,
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone, props,
      TextV2Util.effectiveOutputCodec(props))
  }
}

case class TextBatchWrite(path: String, schemaJson: String,
    partCols: Seq[String], mode: String, staticSpec: Map[String, String],
    sessionTz: String, props: Map[String, String],
    outputCodec: Option[String]) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val p = new Path(path)
    val fs = p.getFileSystem(FileSplits.hadoopConf())
    mode match {
      case "ALL" => if (fs.exists(p)) fs.delete(p, true): Unit
      case "STATIC" =>
        PartLayout.deleteMatchingPartitions(p, fs, partCols, staticSpec,
          PartLayout.partTypes(
            DataType.fromJson(schemaJson).asInstanceOf[StructType], partCols))
      case _ => ()
    }
    fs.mkdirs(p): Unit
    TextWriterFactory(path, schemaJson, partCols, sessionTz, props,
      outputCodec, FileSplits.confOverlay())
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    if (mode == "DYNAMIC") {
      val p = new Path(path)
      val fs = p.getFileSystem(FileSplits.hadoopConf())
      val msgs = messages.toSeq.collect { case m: PartWriteMessage => m }
      PartLayout.commitDynamicOverwrite(p, fs,
        msgs.flatMap(_.partDirs).toSet, msgs.flatMap(_.files).toSet,
        partCols, PartLayout.partTypes(
          DataType.fromJson(schemaJson).asInstanceOf[StructType], partCols))
    }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class TextWriterFactory(path: String, schemaJson: String,
    partCols: Seq[String], sessionTz: String, props: Map[String, String],
    outputCodec: Option[String],
    confOverlay: Map[String, String] = Map.empty) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val sparkSchema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val dataIdx = sparkSchema.fields.zipWithIndex
      .filterNot { case (f, _) => partCols.contains(f.name) }.map(_._2)
    val partOrds = partCols.map(c =>
      sparkSchema.fieldIndex(c) -> sparkSchema(sparkSchema.fieldIndex(c)).dataType)
    val zone = java.time.ZoneId.of(sessionTz)
    val uid = java.util.UUID.randomUUID().toString.take(8)
    val conf = FileSplits.buildConf(confOverlay)
    val fs = new Path(path).getFileSystem(conf)
    val dataSchema = StructType(dataIdx.toSeq.map(i => sparkSchema.fields(i)))
    val serde = TextV2Util.newSerde(dataSchema, props)
    val oi = org.apache.hadoop.hive.serde2.objectinspector.ObjectInspectorFactory
      .getStandardStructObjectInspector(
        dataSchema.fieldNames.toSeq.asJava,
        dataSchema.fields.toSeq.map(f => TextV2Util.javaOI(f.dataType)).asJava)
    val newline = "\n".getBytes("UTF-8")
    // hive.exec.compress.output parity (FileSinkOperator wraps the text
    // stream in the configured codec and suffixes the file; the read path
    // resolves the codec back from the suffix via CompressionCodecFactory)
    val codec = outputCodec.map(TextV2Util.newCodec(_, conf))
    val ext = ".txt" + codec.map(_.getDefaultExtension).getOrElse("")
    new DataWriter[InternalRow] {
      private val writers = scala.collection.mutable
        .LinkedHashMap[String, (java.io.OutputStream, Path)]()
      private var seq = 0
      private def writerFor(rel: String): java.io.OutputStream =
        writers.getOrElseUpdate(rel, {
          val dir = if (rel.isEmpty) new Path(path) else new Path(path, rel)
          fs.mkdirs(dir): Unit
          seq += 1
          val file = new Path(dir, f"part-$partitionId%05d-$taskId-$uid-$seq%03d$ext")
          val raw = fs.create(file, false)
          (codec.map(_.createOutputStream(raw): java.io.OutputStream)
            .getOrElse(raw), file)
        })._1
      // r18 write-loop allocation cut: row ArrayList + partition path
      // reused across rows (serialize() copies into the serde's own Text
      // whose bytes are written out immediately below).
      private val jrow = new java.util.ArrayList[Object](dataIdx.length)
      private val relCache =
        if (partCols.isEmpty) null
        else new PartLayout.PartPathCache(partCols, partOrds)
      override def write(row: InternalRow): Unit = {
        val rel = if (relCache == null) "" else relCache.relFor(row)
        jrow.clear()
        dataIdx.foreach { i =>
          jrow.add(TextV2Util.toHiveValue(
            if (row.isNullAt(i)) null
            else row.get(i, sparkSchema.fields(i).dataType),
            sparkSchema.fields(i).dataType, zone)): Unit
        }
        val text = serde.serialize(jrow, oi).asInstanceOf[Text]
        val out = writerFor(rel)
        out.write(text.getBytes, 0, text.getLength)
        out.write(newline)
      }
      override def commit(): WriterCommitMessage = {
        writers.values.foreach(_._1.close())
        PartWriteMessage(writers.values.map(_._2.toString).toSeq,
          writers.keys.toSeq)
      }
      override def abort(): Unit = {
        writers.values.foreach { case (w, f) =>
          w.close(); fs.delete(f, false): Unit
        }
      }
      override def close(): Unit = ()
    }
  }
}
