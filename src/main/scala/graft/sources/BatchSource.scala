package graft.sources

import java.util

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, PrimitiveType, Type => PType}
import org.apache.parquet.schema.LogicalTypeAnnotation.{TimestampLogicalTypeAnnotation, TimeUnit}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.connector.Partitioner

/** DataSource V2 connector — the literal re-expression of the reference's
  * read architecture (SURVEY §1.2: `ArrowResultBatch` lazy handle ↔
  * `InputPartition`):
  *
  *   - a staged result set is a directory of parquet files (what
  *     `write_pandas` uploads to a Snowflake stage, core.py:32-40);
  *   - the "batches" are parquet ROW GROUPS — lazy handles carrying only
  *     (path, index, rows, bytes) from the footers, no data, exactly like
  *     the reference's batch objects carry stage URLs (core.py:144-146);
  *   - `planInputPartitions` greedy-packs batches into size- or
  *     count-targeted partitions with the SAME [[Partitioner.pack]]
  *     algorithm the reference implements (core.py:149-197);
  *   - each `PartitionReader` opens only its own row groups on the
  *     executor (`skipNextRowGroup` for the rest) — the parallel
  *     worker↔stage data plane of SURVEY §3.1 stage 10.
  *
  * Options: `partition_size` (default 100 MiB) / `npartitions`, exactly
  * one (core.py:164-167). Column pruning is pushed into the parquet reads
  * via `SupportsPushDownRequiredColumns`. Scope: flat relational schemas
  * (the shape `write_pandas` stages) plus one nesting level —
  * array<primitive> (embeddings) and struct<primitive…> (multimodal
  * metadata); deeper nesting is rejected at schema inference.
  *
  * Usage: `spark.read.format("graft").option("npartitions", 8).load(dir)`.
  */
class BatchSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = BatchSource.hadoopConf()
    val files = BatchSource.listFiles(options, conf)
    require(files.nonEmpty, s"no parquet files under '${BatchSource.dir(options)}'")
    // hive-style `col=value/` segments become trailing partition columns
    // (the layout [[PartitionedBatchDataWriter]] stages)
    StructType(
      BatchSource.toStructType(BatchSource.footerSchema(files.head, conf)).fields ++
        Partitions.partitionFields(files, conf,
          BatchSource.qualifiedDir(options, conf)))
  }

  /** Writes arrive with the DataFrame's schema — don't force inference
    * (the target dir may not exist yet). */
  override def supportsExternalMetadata(): Boolean = true

  /** The existing hive layout IS the table's partitioning — declaring it
    * here lets `df.write.format("graft").partitionBy(...)` validate
    * against (and write into) the on-disk layout. */
  override def inferPartitioning(options: CaseInsensitiveStringMap): Array[Transform] = {
    val conf = BatchSource.hadoopConf()
    Partitions.partitionFields(BatchSource.listFiles(options, conf), conf,
        BatchSource.qualifiedDir(options, conf))
      .map(f => org.apache.spark.sql.connector.expressions.Expressions.identity(f.name))
      .toArray
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BatchTable(schema, new CaseInsensitiveStringMap(properties), partitioning)
}

/** Insertion-ordered bounded cache: past `max` entries the OLDEST entry
  * is evicted. Backs the per-scan footer-sweep cache — a replan-heavy
  * workload cycling distinct runtime filters must not grow driver memory
  * without bound. */
private[sources] final class BoundedCache[K, V](max: Int) {
  private val m = mutable.LinkedHashMap.empty[K, V]
  def getOrElseUpdate(k: K, v: => V): V = synchronized {
    m.get(k) match {
      case Some(x) => x
      case None =>
        val x = v
        m.put(k, x)
        while (m.size > max) m.remove(m.head._1)
        x
    }
  }
  def size: Int = synchronized(m.size)
  def contains(k: K): Boolean = synchronized(m.contains(k))
}

private[sources] object BatchSource {

  /** Fixed-size digest of a file listing — the cache key holds 65 bytes
    * per entry instead of the full path list (100k paths × several
    * replans held megabytes of strings). Length-prefixed + NUL-separated,
    * so no concatenation of distinct lists collides. */
  private[sources] def pathDigest(paths: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    paths.foreach { p => md.update(p.getBytes("UTF-8")); md.update(0.toByte) }
    s"${paths.length}:${md.digest().map("%02x".format(_)).mkString}"
  }

  def dir(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "BatchSource requires a path: spark.read.format(\"graft\").load(dir)")
    p
  }

  /** Canonical (fs-qualified) form of the stage dir — the same prefix
    * file statuses report, so root-relative path arithmetic (partition
    * parsing) is exact. */
  def qualifiedDir(options: CaseInsensitiveStringMap, conf: Configuration): String = {
    val p = new Path(dir(options))
    p.getFileSystem(conf).makeQualified(p).toString
  }

  /** The SESSION's hadoop conf — spark.hadoop.* settings (object-store
    * credentials etc.) must reach the connector's filesystem access. */
  def hadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** All staged `.parquet` files under the directory, RECURSIVE so
    * hive-layout `col=value/` subtrees are discovered; hidden segments
    * (`.`/`_` prefixes, e.g. `_spark_metadata`) are skipped. */
  def listFiles(options: CaseInsensitiveStringMap, conf: Configuration): Seq[FileStatus] = {
    val path = new Path(dir(options))
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) Seq.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
      // manual walk with listStatus, not fs.listFiles(recursive=true): the
      // located-status iterator stats every file (a shell exec per file on
      // the local FS) and throws if a concurrent writer's temp file
      // vanishes mid-walk — a live stage directory is exactly that.
      def walk(p: Path): Unit = {
        val entries =
          try fs.listStatus(p)
          catch { case _: java.io.FileNotFoundException => Array.empty[FileStatus] }
        entries.foreach { e =>
          val name = e.getPath.getName
          if (name.startsWith(".") || name.startsWith("_")) ()
          else if (e.isDirectory) walk(e.getPath)
          else if (e.isFile && name.endsWith(".parquet")) out += e
        }
      }
      walk(path)
      out.toIndexedSeq.sortBy(_.getPath.toString)
    }
  }

  def footerSchema(file: FileStatus, conf: Configuration): MessageType = {
    val in = HadoopInputFile.fromStatus(file, conf)
    val reader = ParquetFileReader.open(in)
    try reader.getFooter.getFileMetaData.getSchema
    finally reader.close()
  }

  /** Parquet MessageType → Spark StructType: flat primitives, standard
    * 3-level LIST groups (array<primitive> — the `embeddings` shape), and
    * unannotated groups of primitives (struct<primitive…> — the multimodal
    * `meta` shape). Deeper nesting is still rejected loudly. */
  def toStructType(msg: MessageType): StructType = StructType(
    msg.getFields.asScala.map { f =>
      val dt =
        if (f.isPrimitive) sparkType(f.asPrimitiveType())
        else if (f.getLogicalTypeAnnotation == LogicalTypeAnnotation.listType()) {
          val repeated = f.asGroupType().getFields.get(0).asGroupType()
          val elem = repeated.getFields.get(0)
          require(elem.isPrimitive,
            s"nested list elements unsupported on '${f.getName}'")
          ArrayType(sparkType(elem.asPrimitiveType()),
            elem.getRepetition != PType.Repetition.REQUIRED)
        } else if (f.getLogicalTypeAnnotation == LogicalTypeAnnotation.mapType()) {
          val kv = f.asGroupType().getFields.get(0).asGroupType()
          val k = kv.getFields.get(0)
          val v = kv.getFields.get(1)
          require(k.isPrimitive && v.isPrimitive,
            s"map key/value on '${f.getName}' must be primitive")
          MapType(sparkType(k.asPrimitiveType()), sparkType(v.asPrimitiveType()),
            v.getRepetition != PType.Repetition.REQUIRED)
        } else {
          require(f.getLogicalTypeAnnotation == null,
            s"nested field '${f.getName}' unsupported by graft BatchSource " +
              s"(only LIST, MAP and unannotated STRUCT groups)")
          StructType(f.asGroupType().getFields.asScala.map { sub =>
            require(sub.isPrimitive,
              s"struct field '${f.getName}.${sub.getName}' must be primitive " +
                "(one nesting level)")
            StructField(sub.getName, sparkType(sub.asPrimitiveType()),
              sub.getRepetition != PType.Repetition.REQUIRED)
          }.toIndexedSeq)
        }
      StructField(f.getName, dt, f.getRepetition != PType.Repetition.REQUIRED)
    }.toIndexedSeq)

  private def sparkType(p: PrimitiveType): DataType = {
    val ann = p.getLogicalTypeAnnotation
    def dec(d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation): DataType =
      DecimalType(d.getPrecision, d.getScale)
    p.getPrimitiveTypeName match {
      case BOOLEAN => BooleanType
      case FLOAT => FloatType
      case DOUBLE => DoubleType
      // Snowflake NUMBER stages as parquet DECIMAL (the reference's
      // dominant dtype, tests/test_core.py:63-65) and DATE as annotated
      // INT32 — both are first-class here; remaining annotated ints
      // (TIME etc.) are still rejected LOUDLY rather than decoded as
      // silently-corrupt raw ints
      case INT32 => ann match {
        case null => IntegerType
        case _: LogicalTypeAnnotation.IntLogicalTypeAnnotation => IntegerType
        case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => DateType
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => dec(d)
        case other => throw new IllegalArgumentException(
          s"unsupported INT32 logical type $other on '${p.getName}'")
      }
      case INT64 => ann match {
        // match the native reader's mapping: UTC-adjusted → TimestampType,
        // wall-clock (isAdjustedToUTC=false) → TimestampNTZType
        case t: TimestampLogicalTypeAnnotation =>
          if (t.isAdjustedToUTC) TimestampType else TimestampNTZType
        case null => LongType
        case _: LogicalTypeAnnotation.IntLogicalTypeAnnotation => LongType
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => dec(d)
        case other => throw new IllegalArgumentException(
          s"unsupported INT64 logical type $other on '${p.getName}'")
      }
      case BINARY if ann == LogicalTypeAnnotation.stringType() => StringType
      case BINARY | FIXED_LEN_BYTE_ARRAY
          if ann.isInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation] =>
        dec(ann.asInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation])
      // unannotated BINARY = opaque bytes (the multimodal payload column)
      case BINARY if ann == null => BinaryType
      case other => throw new IllegalArgumentException(
        s"unsupported parquet type $other${if (ann != null) s" ($ann)" else ""} on '${p.getName}'")
    }
  }

  /** One lazy batch handle = one row group (path + index + stats only). */
  case class BatchHandle(path: String, rowGroup: Int, rows: Long, bytes: Long)

  /** Driver-only per-column row-group statistics for batch pruning:
    * (min, max, nullCount) as comparable values; None when the footer has
    * no usable stats for the column. */
  type ColStats = Map[String, (Any, Any, Long)]

  /** Test hook: each discoverBatches call is one full footer sweep (it
    * opens EVERY staged file's footer) — specs pin how many a query runs. */
  private[sources] val footerSweeps = new java.util.concurrent.atomic.AtomicLong

  def discoverBatches(
      files: Seq[FileStatus], conf: Configuration,
      statCols: Set[String] = Set.empty): Seq[(BatchHandle, ColStats)] = {
    footerSweeps.incrementAndGet()
    files.flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(f, conf))
      try reader.getFooter.getBlocks.asScala.zipWithIndex.map { case (b, i) =>
        val stats: ColStats =
          if (statCols.isEmpty) Map.empty
          else b.getColumns.asScala.flatMap { c =>
            val name = c.getPath.toDotString
            val s = c.getStatistics
            if (statCols.contains(name) && s != null && s.hasNonNullValue)
              Some(name -> ((statValue(s.genericGetMin, c.getPrimitiveType),
                statValue(s.genericGetMax, c.getPrimitiveType), s.getNumNulls)))
            else None
          }.toMap
        (BatchHandle(f.getPath.toString, i, b.getRowCount, b.getCompressedSize), stats)
      }.toIndexedSeq
      finally reader.close()
    }
  }

  /** Footer min/max → the value SPARK sees for that cell: decimal unscaled
    * ints become BigDecimal at the annotated scale, DATE day numbers stay
    * Int (= Spark's internal days), timestamps normalize to µs with the
    * SAME floor-division the partition readers apply to NANOS, strings
    * decode from Binary. Pruning comparisons against filter literals are
    * then exact in the value domain the reader materializes. */
  private def statValue(v: Any, p: PrimitiveType): Any = p.getLogicalTypeAnnotation match {
    case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => v match {
      case i: java.lang.Integer => java.math.BigDecimal.valueOf(i.longValue, d.getScale)
      case l: java.lang.Long => java.math.BigDecimal.valueOf(l.longValue, d.getScale)
      case b: org.apache.parquet.io.api.Binary =>
        new java.math.BigDecimal(new java.math.BigInteger(b.getBytes), d.getScale)
      case other => other
    }
    case t: TimestampLogicalTypeAnnotation => v match {
      case l: java.lang.Long =>
        java.lang.Long.valueOf(t.getUnit match {
          case TimeUnit.MILLIS => Math.multiplyExact(l.longValue, 1000L)
          case TimeUnit.MICROS => l.longValue
          case TimeUnit.NANOS => Math.floorDiv(l.longValue, 1000L)
        })
      case other => other
    }
    case _ => v match {
      case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
      case other => other
    }
  }

  /** Spark source-filter literal → a JVM value in the same domain as
    * [[statValue]]: dates to epoch days, timestamps to µs, Scala decimals
    * unwrapped. */
  private def literalValue(v: Any): Any = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    v match {
      case d: java.sql.Date => Int.box(DateTimeUtils.fromJavaDate(d))
      case ld: java.time.LocalDate => Int.box(DateTimeUtils.localDateToDays(ld))
      case t: java.sql.Timestamp => Long.box(DateTimeUtils.fromJavaTimestamp(t))
      case i: java.time.Instant => Long.box(DateTimeUtils.instantToMicros(i))
      case ldt: java.time.LocalDateTime => Long.box(DateTimeUtils.localDateTimeToMicros(ldt))
      case bd: scala.math.BigDecimal => bd.bigDecimal
      case other => other
    }
  }

  /** EXACT comparison of a footer stat against a filter literal (or two
    * stats). Longs compare as longs — `doubleValue` rounding made values
    * beyond 2⁵³ (warehouse surrogate keys) collide and could prune row
    * groups that still contained matches; mixed numeric widths go through
    * BigDecimal, which is exact for every JVM numeric. None = incomparable
    * → callers keep the batch (conservative). */
  private[sources] def exactCmp(a0: Any, b0: Any): Option[Int] =
    (literalValue(a0), literalValue(b0)) match {
      case (x: Number, y: Number) => numCmp(x, y)
      case (x: String, y: String) => Some(x.compareTo(y))
      case (x: java.lang.Boolean, y: java.lang.Boolean) => Some(x.compareTo(y))
      case _ => None
    }

  private def numCmp(x: Number, y: Number): Option[Int] = {
    def nonFinite(n: Number): Boolean = n match {
      case d: java.lang.Double => d.isNaN || d.isInfinite
      case f: java.lang.Float => f.isNaN || f.isInfinite
      case _ => false
    }
    if (nonFinite(x) || nonFinite(y)) {
      val (xd, yd) = (x.doubleValue(), y.doubleValue())
      if (xd.isNaN || yd.isNaN) None // NaN is unordered — never prune on it
      else Some(java.lang.Double.compare(xd, yd))
    } else (x, y) match {
      case (a: java.lang.Long, b: java.lang.Long) => Some(java.lang.Long.compare(a, b))
      case (a: java.lang.Integer, b: java.lang.Integer) => Some(Integer.compare(a, b))
      case _ => Some(toBig(x).compareTo(toBig(y)))
    }
  }

  private def toBig(n: Number): java.math.BigDecimal = n match {
    case bd: java.math.BigDecimal => bd
    case sd: scala.math.BigDecimal => sd.bigDecimal
    case bi: java.math.BigInteger => new java.math.BigDecimal(bi)
    case d: java.lang.Double => new java.math.BigDecimal(d.doubleValue) // exact binary value
    case f: java.lang.Float => new java.math.BigDecimal(f.doubleValue) // float→double widening is exact
    case other => java.math.BigDecimal.valueOf(other.longValue)
  }

  /** Can `filter` provably match NO row of a batch with these stats?
    * (conservative: unknown columns/shapes → keep the batch) */
  def excludes(filter: org.apache.spark.sql.sources.Filter, stats: ColStats,
      rows: Long): Boolean = {
    import org.apache.spark.sql.sources._

    def cmp(a: Any, b: Any): Option[Int] = exactCmp(a, b)

    filter match {
      case EqualTo(c, v) => stats.get(c).exists { case (mn, mx, _) =>
        cmp(v, mn).exists(_ < 0) || cmp(v, mx).exists(_ > 0) }
      // the shape runtime (DPP-style) filters arrive in: the batch is
      // excluded only if EVERY candidate value falls outside [min, max]
      case In(c, vs) => stats.get(c).exists { case (mn, mx, _) =>
        vs.nonEmpty && vs.forall(v =>
          cmp(v, mn).exists(_ < 0) || cmp(v, mx).exists(_ > 0)) }
      case GreaterThan(c, v) => stats.get(c).exists { case (_, mx, _) =>
        cmp(mx, v).exists(_ <= 0) }
      case GreaterThanOrEqual(c, v) => stats.get(c).exists { case (_, mx, _) =>
        cmp(mx, v).exists(_ < 0) }
      case LessThan(c, v) => stats.get(c).exists { case (mn, _, _) =>
        cmp(mn, v).exists(_ >= 0) }
      case LessThanOrEqual(c, v) => stats.get(c).exists { case (mn, _, _) =>
        cmp(mn, v).exists(_ > 0) }
      case IsNull(c) => stats.get(c).exists { case (_, _, nulls) => nulls == 0 }
      case IsNotNull(c) => stats.get(c).exists { case (_, _, nulls) => nulls == rows }
      case And(l, r) => excludes(l, stats, rows) || excludes(r, stats, rows)
      case Or(l, r) => excludes(l, stats, rows) && excludes(r, stats, rows)
      case _ => false
    }
  }

  /** Column names a filter references (for targeted stats collection). */
  def filterCols(f: org.apache.spark.sql.sources.Filter): Set[String] =
    f.references.toSet

  /** The parquet projection for a (possibly leaf-pruned) required schema:
    * whole fields as stored, except unannotated groups (structs), which
    * keep only the requested leaves in the requested order — the reader's
    * per-index decode plans then line up with the pruned group, and
    * parquet never materializes pages of unrequested leaves. */
  def pruneMessage(fileMsg: MessageType, required: StructType): MessageType =
    new MessageType("graft_pruned", required.fields.map { f =>
      val ft = fileMsg.getFields.get(fileMsg.getFieldIndex(f.name))
      (f.dataType, ft) match {
        case (st: StructType, gt: org.apache.parquet.schema.GroupType)
            if gt.getLogicalTypeAnnotation == null =>
          new org.apache.parquet.schema.GroupType(gt.getRepetition, gt.getName,
            st.fields.map(sf => gt.getType(sf.name)): _*)
        case _ => ft
      }
    }: _*)
}

/** Hadoop Configuration isn't Serializable — ship it to executors with
  * its own writable protocol. */
private[sources] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[sources] class BatchTable(
    tableSchema: StructType, options: CaseInsensitiveStringMap,
    partitionTransforms: Array[Transform] = Array.empty)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  override def name(): String = s"graft:${BatchSource.dir(options)}"
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] = partitionTransforms
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new BatchScanBuilder(tableSchema, options)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    // `partition_by=colA[,colB]` write option, or the native
    // `df.write.partitionBy(...)` identity transforms — same sink path
    val fromTransforms = partitionTransforms.toSeq.flatMap(t =>
      t.references.headOption.map(_.fieldNames.mkString(".")))
    val partitionBy = Option(info.options.get("partition_by"))
      .orElse(Option(options.get("partition_by")))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(fromTransforms)
    new BatchWriteBuilder(info.schema(), BatchSource.dir(options), partitionBy)
  }
}

private[sources] class BatchScanBuilder(
    fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit {

  // validate the partition spec eagerly (core.py:164-167) — every scan
  // path, including the metadata-only aggregate path, must reject
  // contradictory options
  Partitioner.resolveSpec(
    Option(options.get("npartitions")).map(_.toInt),
    Option(options.get("partition_size")))

  private var required: StructType = fullSchema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty

  /** The directory's hive-layout partition columns (one listing + one
    * footer open; empty for flat stages). */
  private lazy val partCols: Seq[StructField] = {
    val conf = BatchSource.hadoopConf()
    Partitions.partitionFields(BatchSource.listFiles(options, conf), conf,
      BatchSource.qualifiedDir(options, conf))
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the file's field order; keep only requested columns — and
    // for struct columns only the requested LEAVES (Spark's nested schema
    // pruning hands us e.g. meta:struct<mime> when the query touches only
    // meta.mime; decoding the other leaves would be pure waste)
    required = StructType(fullSchema.fields.flatMap { f =>
      requiredSchema.fields.find(_.name == f.name).map { rf =>
        (f.dataType, rf.dataType) match {
          case (fs: StructType, rs: StructType) =>
            val kept = fs.fields.filter(sf => rs.fieldNames.contains(sf.name))
            if (kept.isEmpty) f else f.copy(dataType = StructType(kept))
          case _ => f
        }
      }
    })

  /** Accept filters for ROW-GROUP PRUNING via footer min/max stats —
    * whole batches whose stats exclude the predicate are never planned,
    * never opened, never read. Filters over only PARTITION columns are
    * absorbed COMPLETELY (file-level evaluation is exact — a partition
    * value is constant across its file), so Spark drops them from the
    * plan and column pruning can drop the partition column itself; all
    * other filters are returned as residual: row-group pruning is a
    * skip-optimization, row-level evaluation stays with Spark (same
    * contract as parquet row-group skipping). */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters
    if (partCols.isEmpty) filters
    else {
      val names = partCols.map(_.name).toSet
      filters.filterNot(Partitions.absorbable(_, names))
    }
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  // -------- aggregate pushdown: COUNT(*)/MIN/MAX answered from footers --
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}

  private var aggValues: Option[(StructType, Array[Any])] = None

  /** Global COUNT(*)/MIN/MAX need no data at all: row counts and column
    * min/max live in the parquet footers (the warehouse-connector trick —
    * Snowflake answers these from metadata too). Only attempted by Spark
    * when no residual filters exist, so metadata is authoritative. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translateAgg(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    translateAgg(agg) match {
      case Some(v) => aggValues = Some(v); true
      case None => false
    }

  private def translateAgg(agg: Aggregation): Option[(StructType, Array[Any])] = {
    if (agg.groupByExpressions.nonEmpty || pushed.nonEmpty) return None
    val conf = BatchSource.hadoopConf()
    val statCols = agg.aggregateExpressions.flatMap {
      case m: Min => m.column.references.headOption.map(_.fieldNames.head)
      case m: Max => m.column.references.headOption.map(_.fieldNames.head)
      case _ => None
    }.toSet
    lazy val listed = BatchSource.listFiles(options, conf)
    lazy val discovered = BatchSource.discoverBatches(listed, conf, statCols)

    /** MIN/MAX of a PARTITION column comes from the paths alone — exact
      * (a partition value is constant per file) and zero IO beyond the
      * listing: the warehouse-metadata trick extended to the layout. */
    lazy val qroot = BatchSource.qualifiedDir(options, conf)
    def partMinMax(f: StructField, wantMin: Boolean): Option[(StructField, Any)] = {
      val vals = listed.flatMap(file =>
        Option(Partitions.valuesOf(file.getPath.toString, qroot, Seq(f))
          .getOrElse(f.name, null)))
      if (vals.isEmpty) None // all-null / no files: let Spark scan
      else {
        val cmp = new Ordering[Any] {
          def compare(a: Any, b: Any): Int =
            BatchSource.exactCmp(a, b).getOrElse(0)
        }
        Some((f.copy(nullable = true), if (wantMin) vals.min(cmp) else vals.max(cmp)))
      }
    }

    def minMax(name: String, wantMin: Boolean): Option[(StructField, Any)] = {
      partCols.find(_.name == name) match {
        case Some(pf) => return partMinMax(pf, wantMin)
        case None => ()
      }
      fullSchema.fields.find(_.name == name).flatMap { field =>
        val stats = discovered.map(_._2.get(name))
        if (stats.exists(_.isEmpty)) None // a batch without stats → bail out
        else {
          val vals = stats.flatten.map(s => if (wantMin) s._1 else s._2)
          // exact ordering (Long as Long, BigDecimal across widths) — an
          // incomparable pair means the metadata answer would be a guess,
          // so refuse the pushdown and let Spark scan the data
          if (vals.sliding(2).exists(p =>
              p.length == 2 && BatchSource.exactCmp(p(0), p(1)).isEmpty)) None
          else {
            val cmp = new Ordering[Any] {
              def compare(a: Any, b: Any): Int =
                BatchSource.exactCmp(a, b).getOrElse(0)
            }
            Some((field.copy(nullable = true),
              if (wantMin) vals.min(cmp) else vals.max(cmp)))
          }
        }
      }
    }

    val translated = agg.aggregateExpressions.map {
      case _: CountStar =>
        Some((StructField("count_star", LongType, nullable = false),
          discovered.map(_._1.rows).sum: Any))
      case m: Min => minMax(m.column.references.head.fieldNames.head, wantMin = true)
      case m: Max => minMax(m.column.references.head.fieldNames.head, wantMin = false)
      case _ => None
    }
    if (translated.exists(_.isEmpty)) None
    else Some((StructType(translated.flatten.map(_._1)),
      translated.flatten.map(_._2).toArray))
  }

  /** LIMIT pushdown — footer row counts make a filterless LIMIT a
    * metadata question: the scan keeps only a PREFIX of row-group
    * batches whose cumulative count covers n, instead of planning the
    * whole stage. PARTIAL pushdown (the default contract): Spark keeps
    * its exact limit on top, so truncation only ever has to be a
    * superset-prefix — which is exactly what raw footer counts
    * guarantee WHEN NO FILTER is pushed. With filters the qualifying
    * row count per batch is unknowable from metadata, a truncated
    * prefix could under-produce, so the pushdown declines (the same
    * honesty rule as the aggregate pushdown above). */
  private var limit: Option[Int] = None

  override def pushLimit(n: Int): Boolean =
    if (pushed.isEmpty && n >= 0) { limit = Some(n); true } else false

  override def build(): Scan = aggValues match {
    case Some((schema, values)) => new MetadataAggScan(schema, values, options)
    case None => new BatchScan(required, options, pushed, partCols, limit)
  }
}

/** A scan whose entire result was computed from footer metadata on the
  * driver: one partition, one row, zero data files opened. */
private[sources] class MetadataAggScan(
    aggSchema: StructType, values: Array[Any], options: CaseInsensitiveStringMap)
    extends Scan with Batch {

  override def readSchema(): StructType = aggSchema

  override def description(): String =
    s"GraftBatchScan(dir=${BatchSource.dir(options)}, METADATA-ONLY agg=[" +
      aggSchema.fieldNames.mkString(",") + "])"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(MetadataAggPartition(values.map {
      case s: String => s; case other => other // already plain JVM values
    }))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var done = false
          private val vals = p.asInstanceOf[MetadataAggPartition].values.map {
            case s: String => UTF8String.fromString(s)
            // decimal footer stats travel as BigDecimal; DATE stats are
            // already internal days (Int) and timestamps internal µs (Long)
            case bd: java.math.BigDecimal => Decimal(bd)
            case other => other
          }
          override def next(): Boolean = if (done) false else { done = true; true }
          override def get(): InternalRow = new GenericInternalRow(vals.toArray[Any])
          override def close(): Unit = ()
        }
    }
}

private[sources] case class MetadataAggPartition(values: Array[Any])
    extends InputPartition

private[sources] class BatchScan(
    required: StructType, options: CaseInsensitiveStringMap,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
    partCols: Seq[StructField] = Seq.empty,
    limit: Option[Int] = None)
    extends Scan with Batch with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  private val conf = BatchSource.hadoopConf()
  private lazy val allFiles = BatchSource.listFiles(options, conf)
  private lazy val rootDir = BatchSource.qualifiedDir(options, conf)

  /** PARTITION PRUNING — the first and cheapest gate: whole files whose
    * path-encoded partition values contradict a filter are dropped from
    * the listing before any footer is opened (zero IO per excluded file;
    * at 100 TB this is the difference between touching one `lang=en/`
    * subtree and sweeping every footer in the stage). Runtime (DPP)
    * filters participate too: a dim-side join key over a partition column
    * prunes files at replan time. */
  private def files: Seq[FileStatus] = {
    if (partCols.isEmpty) allFiles
    else {
      val fs = allFilters.filter(f =>
        f.references.exists(partColNames.contains))
      if (fs.isEmpty) allFiles
      else allFiles.filter { f =>
        val vals = Partitions.valuesOf(f.getPath.toString, rootDir, partCols)
        fs.forall(Partitions.matches(_, vals))
      }
    }
  }

  private val partColNames = partCols.map(_.name).toSet

  // runtime (DPP-style) filters arrive AFTER planning starts — e.g. the
  // join-key values produced by a dimension subquery — so batch pruning is
  // (re)computed lazily against static + runtime filters combined
  @volatile private var runtimeFilters: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    required.fieldNames.map(
      org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(fs: Array[org.apache.spark.sql.sources.Filter]): Unit =
    runtimeFilters = fs

  private def allFilters = filters ++ runtimeFilters

  // ONE footer sweep per (stat-column set, partition-pruned file set),
  // shared by description(), estimateStatistics() and
  // planInputPartitions() — at 100k staged files a sweep is 100k footer
  // opens on the driver, so re-running it per consumer was 2-3× pure
  // waste. A runtime (DPP) filter on a NEW column changes the key and
  // invalidates once; new values on already-swept columns re-prune the
  // cached stats for free; a runtime filter on a PARTITION column
  // shrinks the file set and sweeps only the survivors. The file set is
  // keyed by a DIGEST of the path list, not the list itself (100k paths ×
  // a few replans held megabytes of strings per entry), and the cache is
  // capped: a replan-heavy workload cycling through distinct runtime
  // filters evicts oldest-first instead of growing without bound.
  private val discoveryCache = new BoundedCache[
    (Set[String], String),
    Seq[(BatchSource.BatchHandle, BatchSource.ColStats)]](max = 8)

  private def pruned: (Seq[BatchSource.BatchHandle], Int) = {
    val fs = allFilters
    val keptFiles = files // partition-pruned listing — before any footer IO
    // partition columns have no footer stats: never sweep for them
    val statCols: Set[String] =
      fs.flatMap(BatchSource.filterCols).toSet -- partColNames
    val discovered = discoveryCache.getOrElseUpdate(
      (statCols, BatchSource.pathDigest(keptFiles.map(_.getPath.toString))),
      BatchSource.discoverBatches(keptFiles, conf, statCols))
    val kept = discovered.filterNot { case (h, stats) =>
      fs.exists(BatchSource.excludes(_, stats, h.rows))
    }
    (kept.map(_._1), discovered.length)
  }

  private lazy val batches = pruned._1 // for stats; re-pruned at plan time

  override def readSchema(): StructType = required

  override def description(): String = {
    val (kept, total) = pruned
    val fileNote =
      if (partCols.isEmpty) ""
      else s", files=${files.length}/${allFiles.length}"
    // a runtime (DPP) filter arriving after push time disables the
    // prefix truncation in planInputPartitions — the explain string
    // must not claim a cut that will not happen
    val limitNote = limit.map { n =>
      if (runtimeFilters.nonEmpty) s", limit=$n(inactive:runtime-filter)"
      else s", limit=$n"
    }.getOrElse("")
    s"GraftBatchScan(dir=${BatchSource.dir(options)}, " +
      s"cols=[${required.fieldNames.mkString(",")}], " +
      s"batches=${kept.length}/$total$fileNote$limitNote)"
  }

  override def toBatch: Batch = this

  override def toMicroBatchStream(
      checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new BatchMicroBatchStream(required, options, checkpointLocation, partCols)

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(batches.map(_.bytes).sum)
    override def numRows(): util.OptionalLong =
      util.OptionalLong.of(batches.map(_.rows).sum)
  }

  /** The reference's partition planning (core.py:149-197), verbatim
    * semantics: count mode → row target total//n; size mode → byte target;
    * greedy first-fit pack preserving batch order. */
  override def planInputPartitions(): Array[InputPartition] = {
    val (keptAll, _) = pruned // fresh: includes any runtime filters by now
    // limit truncation: only when NOTHING filters rows (static filters
    // were required empty at push time; a runtime filter arriving later
    // would make the prefix under-produce, so its presence disables the
    // cut — Spark's own limit on top keeps either path exact)
    val kept = limit match {
      case Some(n) if filters.isEmpty && runtimeFilters.isEmpty =>
        val cum = keptAll.scanLeft(0L)(_ + _.rows).tail
        val need = cum.indexWhere(_ >= n.toLong)
        if (need < 0) keptAll else keptAll.take(need + 1)
      case _ => keptAll
    }
    val np = Option(options.get("npartitions")).map(_.toInt)
    val ps = Option(options.get("partition_size"))
    val (countMode, sizeMode) = Partitioner.resolveSpec(np, ps)
    val groups: Seq[Seq[Int]] = countMode match {
      case Some(n) =>
        val target = Partitioner.rowsPerPartition(kept.map(_.rows).sum, n)
        Partitioner.pack(kept.map(_.rows), target)
      case None =>
        Partitioner.pack(kept.map(_.bytes), sizeMode.get)
    }
    groups.map { idxs =>
      BatchInputPartition(idxs.map(kept).toArray): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BatchReaderFactory(required, new SerializableHadoopConf(conf),
      partCols.filter(f => required.fieldNames.contains(f.name)), rootDir)
}

/** Serialized to executors: only the lazy handles, never data. */
private[sources] case class BatchInputPartition(
    handles: Array[BatchSource.BatchHandle]) extends InputPartition

private[sources] class BatchReaderFactory(
    required: StructType, conf: SerializableHadoopConf,
    partCols: Seq[StructField] = Seq.empty, rootDir: String = "")
    extends PartitionReaderFactory {

  /** `required` minus path-derived partition columns — what the parquet
    * files themselves must supply. */
  private val fileRequired = StructType(
    required.fields.filterNot(f => partCols.exists(_.name == f.name)))

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    if (partCols.isEmpty)
      new BatchPartitionReader(p.asInstanceOf[BatchInputPartition], required, conf)
    else
      new PartitionedRowReader(
        p.asInstanceOf[BatchInputPartition], required, fileRequired, partCols,
        rootDir, conf)

  /** Default data plane is COLUMNAR (ColumnarBatch + codegen'd
    * ColumnarToRow); the row-based reader above stays as the fallback for
    * projections with no file-backed columns (a zero-column parquet read
    * has no column readers to drive the batch row count). */
  override def supportColumnarReads(p: InputPartition): Boolean =
    fileRequired.nonEmpty

  override def createColumnarReader(
      p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    if (partCols.isEmpty)
      new ColumnarBatchPartitionReader(
        p.asInstanceOf[BatchInputPartition], required, conf)
    else
      new PartitionedColumnarReader(
        p.asInstanceOf[BatchInputPartition], required, fileRequired, partCols,
        rootDir, conf)
}

/** Executor-side materialization (SURVEY §3.1 stage 10): open each file,
  * read ONLY this partition's row groups (skip the rest without IO),
  * decode to InternalRow with the pruned schema. */
private[sources] class BatchPartitionReader(
    partition: BatchInputPartition, required: StructType,
    serConf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val conf = serConf.value
  private val byFile: Seq[(String, Seq[Int])] = partition.handles
    .groupBy(_.path).view.mapValues(_.map(_.rowGroup).toIndexedSeq)
    .toSeq.sortBy(_._1)

  private var fileIdx = 0
  private var reader: ParquetFileReader = _
  private var prunedMsg: MessageType = _
  private var wanted: Set[Int] = Set.empty
  private var groupIdx = 0
  private var recordIter: Iterator[Group] = Iterator.empty
  private var current: InternalRow = _

  private def openNextFile(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    if (fileIdx >= byFile.length) return false
    val (path, groups) = byFile(fileIdx)
    fileIdx += 1
    val in = HadoopInputFile.fromPath(new Path(path), conf)
    reader = ParquetFileReader.open(in)
    val fileMsg = reader.getFooter.getFileMetaData.getSchema
    prunedMsg = BatchSource.pruneMessage(fileMsg, required)
    reader.setRequestedSchema(prunedMsg)
    wanted = groups.toSet
    groupIdx = 0
    recordIter = Iterator.empty
    true
  }

  private def advanceRowGroup(): Boolean = {
    while (reader != null) {
      if (groupIdx >= reader.getFooter.getBlocks.size()) {
        if (!openNextFile()) return false
      } else if (!wanted.contains(groupIdx)) {
        reader.skipNextRowGroup()
        groupIdx += 1
      } else {
        val pages = reader.readNextRowGroup()
        val rows = reader.getFooter.getBlocks.get(groupIdx).getRowCount
        groupIdx += 1
        val io = new ColumnIOFactory().getColumnIO(prunedMsg)
        val rr = io.getRecordReader(pages, new GroupRecordConverter(prunedMsg))
        recordIter = (0L until rows).iterator.map(_ => rr.read())
        return true
      }
    }
    false
  }

  override def next(): Boolean = {
    while (!recordIter.hasNext) {
      if (reader == null) {
        if (!openNextFile()) return false
      } else if (!advanceRowGroup()) return false
    }
    current = convert(recordIter.next())
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = if (reader != null) reader.close()

  /** Decode one present primitive value at `(g, idx)` to Spark internal
    * representation; `pt` is the parquet type carrying the physical width
    * / timestamp unit the Spark schema doesn't. Shared by top-level and
    * struct-nested fields. */
  private def primValue(g: Group, idx: Int, dt: DataType, pt: PType): Any = dt match {
    case BooleanType => g.getBoolean(idx, 0)
    case IntegerType => g.getInteger(idx, 0)
    case LongType => g.getLong(idx, 0)
    case FloatType => g.getFloat(idx, 0)
    case DoubleType => g.getDouble(idx, 0)
    case StringType => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
    case BinaryType => g.getBinary(idx, 0).getBytes
    case DateType => g.getInteger(idx, 0) // parquet DATE = Spark days
    case d: DecimalType =>
      import org.apache.spark.sql.types.Decimal
      pt.asPrimitiveType().getPrimitiveTypeName match {
        case INT32 => Decimal(g.getInteger(idx, 0).toLong, d.precision, d.scale)
        case INT64 => Decimal(g.getLong(idx, 0), d.precision, d.scale)
        case _ => Decimal(new java.math.BigDecimal(
            new java.math.BigInteger(g.getBinary(idx, 0).getBytes), d.scale),
          d.precision, d.scale)
      }
    case TimestampType | TimestampNTZType =>
      // Spark internal = µs since epoch; normalize the parquet unit
      val raw = g.getLong(idx, 0)
      pt.asPrimitiveType().getLogicalTypeAnnotation match {
        case t: TimestampLogicalTypeAnnotation => t.getUnit match {
          case TimeUnit.MILLIS => raw * 1000L
          case TimeUnit.MICROS => raw
          // floor (not truncate): pre-epoch nanos must round down
          // like Spark's native parquet reader
          case TimeUnit.NANOS => Math.floorDiv(raw, 1000L)
        }
        case _ => raw
      }
    case other => throw new IllegalArgumentException(s"unsupported type $other")
  }

  private def convert(g: Group): InternalRow = {
    val vals = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      vals(i) =
        if (g.getFieldRepetitionCount(i) == 0) null
        else required.fields(i).dataType match {
          case st: StructType =>
            // one-level struct group: decode each present primitive subfield
            val grp = g.getGroup(i, 0)
            val gt = prunedMsg.getType(i).asGroupType()
            val sub = new Array[Any](st.length)
            var k = 0
            while (k < st.length) {
              sub(k) =
                if (grp.getFieldRepetitionCount(k) == 0) null
                else primValue(grp, k, st.fields(k).dataType, gt.getType(k))
              k += 1
            }
            new GenericInternalRow(sub)
          case MapType(kt, vt, _) =>
            // standard MAP: outer group → repeated key_value(key, value)
            val outer = g.getGroup(i, 0)
            val kvType = prunedMsg.getType(i).asGroupType().getType(0).asGroupType()
            val m = outer.getFieldRepetitionCount(0)
            val keys = new Array[Any](m)
            val values = new Array[Any](m)
            var j = 0
            while (j < m) {
              val kv = outer.getGroup(0, j)
              keys(j) = primValue(kv, 0, kt, kvType.getType(0))
              values(j) =
                if (kv.getFieldRepetitionCount(1) == 0) null
                else primValue(kv, 1, vt, kvType.getType(1))
              j += 1
            }
            new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
              new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
              new org.apache.spark.sql.catalyst.util.GenericArrayData(values))
          case ArrayType(elemType, _) =>
            // 3-level list: outer group → repeated "list" → "element"
            val outer = g.getGroup(i, 0)
            val n = outer.getFieldRepetitionCount(0)
            val values = new Array[Any](n)
            var j = 0
            while (j < n) {
              val entry = outer.getGroup(0, j)
              values(j) =
                if (entry.getFieldRepetitionCount(0) == 0) null
                else elemType match {
                  case FloatType => entry.getFloat(0, 0)
                  case DoubleType => entry.getDouble(0, 0)
                  case IntegerType => entry.getInteger(0, 0)
                  case LongType => entry.getLong(0, 0)
                  case StringType => UTF8String.fromBytes(entry.getBinary(0, 0).getBytes)
                  case other => throw new IllegalArgumentException(
                    s"unsupported array element type $other")
                }
              j += 1
            }
            new org.apache.spark.sql.catalyst.util.GenericArrayData(values)
          case dt => primValue(g, i, dt, prunedMsg.getType(i))
        }
      i += 1
    }
    new GenericInternalRow(vals)
  }
}
