package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** The write half of the DSv2 connector — `to_snowflake`'s architecture
  * (SURVEY §3.2): every partition writes its own staged file in parallel
  * (`write_pandas` per partition, core.py:117-120); names are unique per
  * (task, attempt) so speculative/retried tasks never collide; `abort`
  * deletes the attempt's file. Overwrite maps to truncate-at-commit-time
  * like the reference's `overwrite=True` passthrough (test_core.py:135).
  *
  * `df.write.format("graft").mode(...).save(dir)` stages files that
  * [[BatchSource]] (or any parquet reader) reads back — the two halves
  * of the connector close the loop.
  */
private[sources] class BatchWriteBuilder(
    schema: StructType, dir: String, partitionBy: Seq[String])
    extends WriteBuilder with SupportsTruncate {

  partitionBy.foreach { c =>
    require(schema.fieldNames.contains(c),
      s"partition_by column '$c' not in the written schema " +
        s"[${schema.fieldNames.mkString(",")}]")
    // a '.'/'_'-prefixed directory segment is HIDDEN to the reader's
    // listing — such a write would succeed and then be invisible
    require(!c.startsWith(".") && !c.startsWith("_"),
      s"partition_by column '$c' would create hidden '$c=...' directories " +
        "the reader skips")
    // '=' / '/' in the NAME corrupt the path encoding itself (values are
    // URL-encoded, names are not): parseRaw would split at the first '='
    // and reconstruct a phantom column, silently losing this one
    require(!c.contains("=") && !c.contains("/"),
      s"partition_by column name '$c' must not contain '=' or '/'")
    // partition values become PATH segments, so only types with an exact
    // reader-invertible string form are routable. Validate HERE, on the
    // driver at build time — the routing writer's own type switch throwing
    // mid-write surfaced the mistake as an executor task failure after
    // staged files already existed. Readback note: IntegerType values come
    // back as LongType (the path carries only digits and
    // [[Partitions.inferType]] infers the widest integral type) — pinned
    // in ConnectorSpec.
    schema(c).dataType match {
      case IntegerType | LongType | StringType | BooleanType | DoubleType => ()
      case other => throw new IllegalArgumentException(
        s"partition_by column '$c' has unsupported type $other — " +
          "supported: int, long, string, boolean, double")
    }
  }
  require(partitionBy.size < schema.length || partitionBy.isEmpty,
    "partition_by cannot cover every column — data files would be empty")

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    if (!doTruncate) {
      // APPEND must not mix layouts: a partitioned subtree appended with
      // different (or no) partition columns would silently degrade the
      // whole directory's inferred schema (partition keys are only
      // recognized when present in EVERY file's path). Overwrite replaces
      // the layout, so any partitioning is fine there.
      val conf = BatchSource.hadoopConf()
      val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("path", dir))
      val existing = BatchSource.listFiles(opts, conf)
      if (existing.nonEmpty) {
        val layout = Partitions.partitionFields(existing, conf,
          BatchSource.qualifiedDir(opts, conf)).map(_.name)
        require(layout == partitionBy,
          s"append partitioning [${partitionBy.mkString(",")}] does not match " +
            s"the existing layout [${layout.mkString(",")}] at $dir")
      }
    }
    new Write {
      override def toBatch: BatchWrite =
        new BatchSinkWrite(schema, dir, doTruncate, partitionBy)
    }
  }
}

private[sources] class BatchSinkWrite(
    schema: StructType, dir: String, truncate: Boolean, partitionBy: Seq[String])
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new BatchWriterFactory(schema, dir,
      new SerializableHadoopConf(BatchSource.hadoopConf()), partitionBy)

  /** Commit: truncate-then-visible. Staged attempt files are invisible to
    * [[BatchSource]] until renamed to `.parquet` here, so readers never
    * see a half-written result — the same DDL-before-DML sequencing idea
    * as the reference's schema-first write (core.py:110-116). Truncate
    * walks recursively so a partitioned layout's `col=value/` subtrees
    * are emptied too. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = BatchSource.hadoopConf()
    val path = new Path(dir)
    val fs = path.getFileSystem(conf)
    if (truncate && fs.exists(path)) {
      // delete exactly what readers see: the same manual walk as
      // BatchSource.listFiles (the located-status iterator stats every
      // file and throws if a concurrent writer's temp file vanishes)
      val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("path", dir))
      BatchSource.listFiles(opts, conf).foreach(f => fs.delete(f.getPath, false))
    }
    messages.foreach { case BatchFileCommit(stagedPaths) =>
      stagedPaths.foreach { staged =>
        val p = new Path(staged)
        fs.rename(p, new Path(p.getParent, p.getName.stripSuffix(".staged") + ".parquet"))
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = BatchSource.hadoopConf()
    messages.foreach { case BatchFileCommit(stagedPaths) =>
      stagedPaths.foreach { staged =>
        val p = new Path(staged)
        p.getFileSystem(conf).delete(p, false)
      }
    }
  }
}

private[sources] case class BatchFileCommit(stagedPaths: Seq[String])
    extends WriterCommitMessage

private[sources] class BatchWriterFactory(
    schema: StructType, dir: String, conf: SerializableHadoopConf,
    partitionBy: Seq[String])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    if (partitionBy.isEmpty)
      new BatchDataWriter(schema, dir, partitionId, taskId, conf)
    else
      new PartitionedBatchDataWriter(schema, dir, partitionId, taskId, conf, partitionBy)
}

/** Hive-layout routing writer: each row lands in the file for its
  * partition-value combination (`col=value/part-…`), partition columns are
  * DROPPED from the data files (the path carries them — exactly the
  * layout [[Partitions.partitionFields]] reads back). One open writer per
  * distinct combination per task: writers scale with the task's distinct
  * partition values, so callers should cluster input by the partition key
  * (`df.repartition(col)`) the same way Spark's own file sink expects. */
private[sources] class PartitionedBatchDataWriter(
    schema: StructType, dir: String, partitionId: Int, taskId: Long,
    conf: SerializableHadoopConf, partitionBy: Seq[String])
    extends DataWriter[InternalRow] {

  private val partOrds: Array[Int] = partitionBy.map(schema.fieldIndex).toArray
  private val dataFields: Array[Int] =
    schema.fields.indices.filterNot(partOrds.contains(_)).toArray
  private val dataSchema = StructType(dataFields.map(schema.fields))

  private val open = scala.collection.mutable.LinkedHashMap
    .empty[String, BatchDataWriter]

  private def partValue(row: InternalRow, ord: Int, name: String): Any =
    if (row.isNullAt(ord)) null
    else schema.fields(ord).dataType match {
      case IntegerType => row.getInt(ord)
      case LongType => row.getLong(ord)
      case StringType => row.getUTF8String(ord).toString
      case BooleanType => row.getBoolean(ord)
      case DoubleType => row.getDouble(ord)
      case other => throw new IllegalArgumentException(
        s"unsupported partition_by type $other for column '$name'")
    }

  // hot-path cache: after the documented repartition(col) clustering,
  // consecutive rows almost always share a partition key — compare the
  // raw values against the previous row's before rebuilding the
  // URL-encoded directory string
  private var lastVals: Array[Any] = _
  private var lastWriter: BatchDataWriter = _

  override def write(row: InternalRow): Unit = {
    val vals = new Array[Any](partOrds.length)
    var i = 0
    while (i < partOrds.length) {
      vals(i) = partValue(row, partOrds(i), partitionBy(i))
      i += 1
    }
    if (lastVals == null || !java.util.Arrays.equals(
        vals.asInstanceOf[Array[AnyRef]], lastVals.asInstanceOf[Array[AnyRef]])) {
      val key = partitionBy.zip(vals.toIndexedSeq)
        .map { case (n, v) => s"$n=${Partitions.encode(v)}" }.mkString("/")
      lastWriter = open.getOrElseUpdate(key,
        new BatchDataWriter(dataSchema, s"$dir/$key", partitionId, taskId, conf))
      lastVals = vals
    }
    val writer = lastWriter
    // project partition columns out; the path carries them
    val projected = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      dataFields.map(i => row.get(i, schema.fields(i).dataType)): Array[Any])
    writer.write(projected)
  }

  override def commit(): WriterCommitMessage =
    BatchFileCommit(open.values.toSeq.flatMap(_.commit() match {
      case BatchFileCommit(ps) => ps
    }))

  override def abort(): Unit = open.values.foreach(_.abort())

  override def close(): Unit = open.values.foreach(_.close())
}

private[sources] class BatchDataWriter(
    schema: StructType, dir: String, partitionId: Int, taskId: Long,
    conf: SerializableHadoopConf)
    extends DataWriter[InternalRow] {

  private val msg: MessageType = BatchSink.toMessageType(schema)
  // unique per (partition, task attempt): retries never collide
  private val staged = new Path(dir,
    f"part-$partitionId%05d-$taskId-${UUID.randomUUID().toString.take(8)}.staged")
  private lazy val writer = {
    val c = new org.apache.hadoop.conf.Configuration(conf.value)
    ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(staged, c))
      .withType(msg)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  /** Write one present primitive value from `row(ord)` into `g(idx)` —
    * shared by top-level fields and struct subfields. */
  private def addPrim(
      g: org.apache.parquet.example.data.Group, idx: Int, dt: DataType,
      row: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
      ord: Int): Unit = dt match {
    case BooleanType => g.add(idx, row.getBoolean(ord))
    case IntegerType => g.add(idx, row.getInt(ord))
    case LongType => g.add(idx, row.getLong(ord))
    case FloatType => g.add(idx, row.getFloat(ord))
    case DoubleType => g.add(idx, row.getDouble(ord))
    case StringType => g.add(idx, row.getUTF8String(ord).toString)
    case BinaryType => g.add(idx,
      org.apache.parquet.io.api.Binary.fromConstantByteArray(row.getBinary(ord)))
    case DateType => g.add(idx, row.getInt(ord)) // days since epoch
    case d: DecimalType =>
      val dec = row.getDecimal(ord, d.precision, d.scale)
      if (d.precision <= Decimal.MAX_INT_DIGITS) g.add(idx, dec.toUnscaledLong.toInt)
      else if (d.precision <= Decimal.MAX_LONG_DIGITS) g.add(idx, dec.toUnscaledLong)
      else g.add(idx, org.apache.parquet.io.api.Binary.fromConstantByteArray(
        dec.toJavaBigDecimal.unscaledValue().toByteArray))
    case TimestampType | TimestampNTZType => g.add(idx, row.getLong(ord)) // µs
    case other => throw new IllegalArgumentException(s"unsupported type $other")
  }

  override def write(row: InternalRow): Unit = {
    val g = new SimpleGroup(msg)
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) schema.fields(i).dataType match {
        case st: StructType =>
          val sub = row.getStruct(i, st.length)
          val grp = g.addGroup(i)
          var k = 0
          while (k < st.length) {
            if (!sub.isNullAt(k)) addPrim(grp, k, st.fields(k).dataType, sub, k)
            k += 1
          }
        case MapType(kt, vt, _) =>
          val m = row.getMap(i)
          val keys = m.keyArray()
          val vals = m.valueArray()
          val mapGroup = g.addGroup(i)
          var j = 0
          while (j < m.numElements()) {
            val kv = mapGroup.addGroup(0)
            addPrim(kv, 0, kt, keys, j)
            if (!vals.isNullAt(j)) addPrim(kv, 1, vt, vals, j)
            j += 1
          }
        case ArrayType(elemType, _) =>
          // 3-level list: field group → repeated "list" group → "element";
          // a null element is a "list" entry with no "element" child
          val arr = row.getArray(i)
          val listGroup = g.addGroup(i)
          var j = 0
          while (j < arr.numElements()) {
            val entry = listGroup.addGroup(0)
            if (!arr.isNullAt(j)) elemType match {
              case FloatType => entry.add(0, arr.getFloat(j))
              case DoubleType => entry.add(0, arr.getDouble(j))
              case IntegerType => entry.add(0, arr.getInt(j))
              case LongType => entry.add(0, arr.getLong(j))
              case StringType => entry.add(0, arr.getUTF8String(j).toString)
              case other => throw new IllegalArgumentException(
                s"unsupported array element type $other")
            }
            j += 1
          }
        case dt => addPrim(g, i, dt, row, i)
      }
      i += 1
    }
    writer.write(g)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    BatchFileCommit(Seq(staged.toString))
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Throwable => () }
    staged.getFileSystem(conf.value).delete(staged, false)
  }

  override def close(): Unit = ()
}

private[sources] object BatchSink {

  /** Spark StructType → parquet MessageType (inverse of
    * [[BatchSource.toStructType]]): flat primitives plus ArrayType as the
    * standard 3-level list encoding — `embeddings`' array<float> stages
    * through the connector like any other column. */
  def toMessageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val rep = if (f.nullable) org.apache.parquet.schema.Type.Repetition.OPTIONAL
        else org.apache.parquet.schema.Type.Repetition.REQUIRED
      f.dataType match {
        case ArrayType(elem, containsNull) =>
          val elemRep =
            if (containsNull) org.apache.parquet.schema.Type.Repetition.OPTIONAL
            else org.apache.parquet.schema.Type.Repetition.REQUIRED
          val elemType = elem match {
            case FloatType => Types.primitive(PrimitiveTypeName.FLOAT, elemRep)
            case DoubleType => Types.primitive(PrimitiveTypeName.DOUBLE, elemRep)
            case IntegerType => Types.primitive(PrimitiveTypeName.INT32, elemRep)
            case LongType => Types.primitive(PrimitiveTypeName.INT64, elemRep)
            case StringType => Types.primitive(PrimitiveTypeName.BINARY, elemRep)
              .as(LogicalTypeAnnotation.stringType())
            case other => throw new IllegalArgumentException(
              s"unsupported array element type $other for column '${f.name}'")
          }
          b.addField(Types.list(rep).element(elemType.named("element")).named(f.name))
        case st: StructType =>
          // one-level struct → unannotated parquet group of primitives
          // (the shape [[BatchSource.toStructType]] maps back)
          val grp = Types.buildGroup(rep)
          st.fields.foreach { sub =>
            sub.dataType match {
              case _: ArrayType | _: StructType | _: MapType =>
                throw new IllegalArgumentException(
                  s"struct field '${f.name}.${sub.name}' must be primitive " +
                    "(one nesting level)")
              case _ => grp.addField(primitiveType(sub).named(sub.name))
            }
          }
          b.addField(grp.named(f.name))
        case MapType(kt, vt, valueContainsNull) =>
          // standard parquet MAP: repeated key_value group, required key,
          // optionally-null value — the same canonical layout as the wire
          val keyT = primitiveType(StructField("key", kt, nullable = false))
            .named("key")
          val valT = primitiveType(StructField("value", vt, valueContainsNull))
            .named("value")
          b.addField(Types.map(rep).key(keyT).value(valT).named(f.name))
        case _ =>
          b.addField(primitiveType(f).named(f.name))
      }
    }
    b.named("graft_staged")
  }

  private def primitiveType(f: StructField): Types.Builder[_, _ <: org.apache.parquet.schema.Type] = {
    val rep = if (f.nullable) org.apache.parquet.schema.Type.Repetition.OPTIONAL
      else org.apache.parquet.schema.Type.Repetition.REQUIRED
    f.dataType match {
        case BooleanType => Types.primitive(PrimitiveTypeName.BOOLEAN, rep)
        case IntegerType => Types.primitive(PrimitiveTypeName.INT32, rep)
        case LongType => Types.primitive(PrimitiveTypeName.INT64, rep)
        case FloatType => Types.primitive(PrimitiveTypeName.FLOAT, rep)
        case DoubleType => Types.primitive(PrimitiveTypeName.DOUBLE, rep)
        case StringType => Types.primitive(PrimitiveTypeName.BINARY, rep)
          .as(LogicalTypeAnnotation.stringType())
        case BinaryType => Types.primitive(PrimitiveTypeName.BINARY, rep)
        case DateType => Types.primitive(PrimitiveTypeName.INT32, rep)
          .as(LogicalTypeAnnotation.dateType())
        // Snowflake NUMBER ↔ parquet DECIMAL: physical width by precision,
        // same mapping the warehouse's own unload uses
        case dt: DecimalType =>
          val phys =
            if (dt.precision <= Decimal.MAX_INT_DIGITS) PrimitiveTypeName.INT32
            else if (dt.precision <= Decimal.MAX_LONG_DIGITS) PrimitiveTypeName.INT64
            else PrimitiveTypeName.BINARY
          Types.primitive(phys, rep)
            .as(LogicalTypeAnnotation.decimalType(dt.scale, dt.precision))
        case TimestampType => Types.primitive(PrimitiveTypeName.INT64, rep)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case TimestampNTZType => Types.primitive(PrimitiveTypeName.INT64, rep)
          .as(LogicalTypeAnnotation.timestampType(false,
            LogicalTypeAnnotation.TimeUnit.MICROS))
      case dt => throw new IllegalArgumentException(
        s"unsupported type $dt for column '${f.name}'")
    }
  }
}
