package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.column.ColumnReader
import org.apache.parquet.column.impl.ColumnReadStoreImpl
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType}
import org.apache.parquet.schema.LogicalTypeAnnotation.{TimestampLogicalTypeAnnotation, TimeUnit}
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** Vectorized executor-side materialization for the DSv2 connector — the
  * columnar data plane of the reference (Arrow result batches,
  * dask_snowflake/core.py:127-130), re-expressed as Spark `ColumnarBatch`:
  *
  *   - each assigned row group is decoded COLUMN AT A TIME with
  *     parquet-column's `ColumnReadStoreImpl` — a tight primitive loop per
  *     column per batch, no per-record `Group` object tree (the previous
  *     row-at-a-time path paid ~40× over a native scan on decode alone);
  *   - values land directly in `OnHeapColumnVector`s, so Spark reads them
  *     through codegen'd `ColumnarToRow` — the scan joins the same
  *     whole-stage-codegen pipeline as the built-in parquet source;
  *   - vectors are allocated once per reader and reset per batch: zero
  *     steady-state allocation beyond string bytes.
  *
  * Scope matches [[BatchSource.toStructType]]: flat schemas (what a staged
  * warehouse result looks like) plus one nesting level — 3-level LIST
  * columns and one-level STRUCT groups of primitives (the multimodal
  * `meta` shape).
  */
private[sources] class ColumnarBatchPartitionReader(
    partition: BatchInputPartition, required: StructType,
    serConf: SerializableHadoopConf, capacity: Int = 4096)
    extends PartitionReader[ColumnarBatch] {

  import ColumnarBatchPartitionReader._

  private val conf = serConf.value
  private val byFile: Seq[(String, Seq[Int])] = partition.handles
    .groupBy(_.path).view.mapValues(_.map(_.rowGroup).toIndexedSeq)
    .toSeq.sortBy(_._1)

  private var fileIdx = 0
  private var reader: ParquetFileReader = _
  private var prunedMsg: MessageType = _
  private var createdBy: String = _
  private var wanted: Set[Int] = Set.empty
  private var groupIdx = 0

  // current-row-group decode state. A spark column maps to ≥1 parquet
  // LEAF columns (structs of m primitives own m leaves, everything else
  // exactly one); leaf-indexed arrays align with prunedMsg.getColumns
  // (depth-first leaf order), leafStart(c) is spark column c's first leaf.
  private var leafReaders: Array[ColumnReader] = _
  private var maxDefs: Array[Int] = _ // per leaf
  private var leafStart: Array[Int] = _ // per spark column
  private var codes: Array[Int] = _ // per spark column
  private var elemCodes: Array[Int] = _ // array columns: element decode plan
  private var elemOpt: Array[Boolean] = _ // array columns: element OPTIONAL?
  private var structCodes: Array[Array[Int]] = _ // struct columns: leaf plans
  private var structOpt: Array[Boolean] = _ // struct columns: group OPTIONAL?
  private var mapCodes: Array[Array[Int]] = _ // map columns: (key, value) plans
  private var remaining: Array[Long] = _ // per leaf: triplets left in group
  private var rowsLeft: Long = 0L

  private val vectors: Array[OnHeapColumnVector] =
    required.fields.map(f => new OnHeapColumnVector(capacity, f.dataType))
  private val batch = new ColumnarBatch(vectors.toArray[ColumnVector])

  private def openNextFile(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    if (fileIdx >= byFile.length) return false
    val (path, groups) = byFile(fileIdx)
    fileIdx += 1
    val in = HadoopInputFile.fromPath(new Path(path), conf)
    reader = ParquetFileReader.open(in)
    val meta = reader.getFooter.getFileMetaData
    val fileMsg = meta.getSchema
    createdBy = meta.getCreatedBy
    prunedMsg = BatchSource.pruneMessage(fileMsg, required)
    reader.setRequestedSchema(prunedMsg)
    codes = required.indices.map(colCode).toArray
    elemCodes = required.indices.map(elemCode).toArray
    elemOpt = required.indices.map { i =>
      codes(i) == ARR &&
        prunedMsg.getType(i).asGroupType().getFields.get(0).asGroupType()
          .getFields.get(0)
          .getRepetition == org.apache.parquet.schema.Type.Repetition.OPTIONAL
    }.toArray
    structCodes = required.indices.map { i =>
      if (codes(i) != STRUCT) Array.empty[Int]
      else {
        val gt = prunedMsg.getType(i).asGroupType()
        required.fields(i).dataType.asInstanceOf[StructType].fields.zipWithIndex
          .map { case (sub, k) => codeFor(sub.dataType, gt.getType(k).asPrimitiveType()) }
      }
    }.toArray
    structOpt = required.indices.map(i =>
      codes(i) == STRUCT && prunedMsg.getType(i).getRepetition ==
        org.apache.parquet.schema.Type.Repetition.OPTIONAL).toArray
    mapCodes = required.indices.map { i =>
      if (codes(i) != MAP) Array.empty[Int]
      else {
        val kv = prunedMsg.getType(i).asGroupType().getType(0).asGroupType()
        val MapType(kt, vt, _) = required.fields(i).dataType: @unchecked
        Array(codeFor(kt, kv.getType(0).asPrimitiveType()),
          codeFor(vt, kv.getType(1).asPrimitiveType()))
      }
    }.toArray
    leafStart = {
      val starts = new Array[Int](required.length)
      var acc = 0
      var i = 0
      while (i < required.length) {
        starts(i) = acc
        acc += (codes(i) match {
          case STRUCT => structCodes(i).length
          case MAP => 2 // key leaf + value leaf
          case _ => 1
        })
        i += 1
      }
      starts
    }
    wanted = groups.toSet
    groupIdx = 0
    true
  }

  /** Element decode plan for array columns (−1 for non-arrays). */
  private def elemCode(i: Int): Int = required.fields(i).dataType match {
    case ArrayType(FloatType, _) => FLOAT
    case ArrayType(DoubleType, _) => DOUBLE
    case ArrayType(IntegerType, _) => INT32
    case ArrayType(LongType, _) => INT64
    case ArrayType(StringType, _) => STR
    case ArrayType(other, _) => throw new IllegalArgumentException(
      s"unsupported array element type $other")
    case _ => -1
  }

  /** Per-column decode plan for the CURRENT file (the timestamp unit and
    * decimal width live in the file footer, not the Spark schema). */
  private def colCode(i: Int): Int = required.fields(i).dataType match {
    case _: ArrayType => ARR // element plan in elemCodes
    case _: StructType => STRUCT // leaf plans in structCodes
    case _: MapType => MAP // key/value plans in mapCodes
    case dt => codeFor(dt, prunedMsg.getType(i).asPrimitiveType())
  }

  /** Primitive decode plan for spark type `dt` backed by parquet type `p` —
    * shared by top-level columns and struct leaves. */
  private def codeFor(
      dt: DataType, p: org.apache.parquet.schema.PrimitiveType): Int = dt match {
    case BooleanType => BOOL
    case IntegerType | DateType => INT32 // parquet DATE = days, Spark DateType = days
    case LongType => INT64
    case FloatType => FLOAT
    case DoubleType => DOUBLE
    case StringType | BinaryType => STR // same byte-array vector layout
    case TimestampType | TimestampNTZType =>
      p.getLogicalTypeAnnotation match {
        case t: TimestampLogicalTypeAnnotation => t.getUnit match {
          case TimeUnit.MILLIS => TS_MILLIS
          case TimeUnit.MICROS => INT64
          case TimeUnit.NANOS => TS_NANOS
        }
        case _ => INT64
      }
    case dt: DecimalType =>
      // decode plan = (physical source) × (vector storage by precision:
      // ≤9 int-backed, ≤18 long-backed, else bytes) — the same layout
      // WritableColumnVector.getDecimal reads back
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
      p.getPrimitiveTypeName match {
        // the parquet spec caps INT32-backed decimals at precision 9 and
        // INT64-backed at 18; a nonconforming file would otherwise write
        // through the wrong vector storage (putInt into byte-backed etc.)
        // — reject loudly instead of decoding corrupt values
        case INT32 =>
          require(dt.precision <= Decimal.MAX_INT_DIGITS,
            s"decimal(${dt.precision},${dt.scale}) annotated on INT32 exceeds " +
              s"precision ${Decimal.MAX_INT_DIGITS} — nonconforming parquet file")
          DEC_INT_I32
        case INT64 =>
          require(dt.precision <= Decimal.MAX_LONG_DIGITS,
            s"decimal(${dt.precision},${dt.scale}) annotated on INT64 exceeds " +
              s"precision ${Decimal.MAX_LONG_DIGITS} — nonconforming parquet file")
          if (dt.precision <= Decimal.MAX_INT_DIGITS) DEC_INT_I64
          else DEC_LONG_I64
        case BINARY | FIXED_LEN_BYTE_ARRAY =>
          if (dt.precision <= Decimal.MAX_INT_DIGITS) DEC_INT_BIN
          else if (dt.precision <= Decimal.MAX_LONG_DIGITS) DEC_LONG_BIN
          else DEC_BYTES_BIN
        case other => throw new IllegalArgumentException(
          s"unsupported decimal physical type $other")
      }
    case dt => throw new IllegalArgumentException(s"unsupported type $dt")
  }

  /** Position on the next assigned, non-empty row group (skipping unwanted
    * groups without IO), creating fresh per-column readers. */
  private def advanceRowGroup(): Boolean = {
    while (true) {
      if (reader == null || groupIdx >= reader.getFooter.getBlocks.size()) {
        if (!openNextFile()) return false
      } else if (!wanted.contains(groupIdx)) {
        reader.skipNextRowGroup()
        groupIdx += 1
      } else {
        val pages = reader.readNextRowGroup()
        groupIdx += 1
        if (pages.getRowCount > 0) {
          val store = new ColumnReadStoreImpl(pages,
            new GroupRecordConverter(prunedMsg).getRootConverter, prunedMsg, createdBy)
          val descs = prunedMsg.getColumns.asScala
          leafReaders = descs.map(store.getColumnReader).toArray
          maxDefs = descs.map(_.getMaxDefinitionLevel).toArray
          remaining = leafReaders.map(_.getTotalValueCount)
          rowsLeft = pages.getRowCount
          return true
        }
      }
    }
    false
  }

  override def next(): Boolean = {
    while (rowsLeft == 0L) if (!advanceRowGroup()) return false
    val n = math.min(capacity.toLong, rowsLeft).toInt
    var c = 0
    while (c < vectors.length) {
      vectors(c).reset()
      decodeColumn(c, n)
      c += 1
    }
    rowsLeft -= n
    batch.setNumRows(n)
    true
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    if (reader != null) { reader.close(); reader = null }
    batch.close() // closes the vectors
  }

  /** One tight loop per column per batch — the match stays OUTSIDE the
    * row loop so each branch is a monomorphic primitive copy. */
  private def decodeColumn(c: Int, n: Int): Unit = {
    val vec = vectors(c)
    val cr = leafReaders(leafStart(c))
    val maxDef = maxDefs(leafStart(c))
    var r = 0
    codes(c) match {
      case BOOL =>
        while (r < n) {
          if (cr.getCurrentDefinitionLevel == maxDef) vec.putBoolean(r, cr.getBoolean)
          else vec.putNull(r)
          cr.consume(); r += 1
        }
      case INT32 =>
        while (r < n) {
          if (cr.getCurrentDefinitionLevel == maxDef) vec.putInt(r, cr.getInteger)
          else vec.putNull(r)
          cr.consume(); r += 1
        }
      case INT64 =>
        while (r < n) {
          if (cr.getCurrentDefinitionLevel == maxDef) vec.putLong(r, cr.getLong)
          else vec.putNull(r)
          cr.consume(); r += 1
        }
      case TS_MILLIS =>
        while (r < n) {
          if (cr.getCurrentDefinitionLevel == maxDef) vec.putLong(r, cr.getLong * 1000L)
          else vec.putNull(r)
          cr.consume(); r += 1
        }
      case TS_NANOS =>
        // floor (not truncate): pre-epoch nanos round down like the native reader
        while (r < n) {
          if (cr.getCurrentDefinitionLevel == maxDef)
            vec.putLong(r, Math.floorDiv(cr.getLong, 1000L))
          else vec.putNull(r)
          cr.consume(); r += 1
        }
      case FLOAT =>
        while (r < n) {
          if (cr.getCurrentDefinitionLevel == maxDef) vec.putFloat(r, cr.getFloat)
          else vec.putNull(r)
          cr.consume(); r += 1
        }
      case DOUBLE =>
        while (r < n) {
          if (cr.getCurrentDefinitionLevel == maxDef) vec.putDouble(r, cr.getDouble)
          else vec.putNull(r)
          cr.consume(); r += 1
        }
      case STR =>
        while (r < n) {
          if (cr.getCurrentDefinitionLevel == maxDef) {
            val bytes = cr.getBinary.getBytes
            vec.putByteArray(r, bytes, 0, bytes.length)
          } else vec.putNull(r)
          cr.consume(); r += 1
        }
      case DEC_INT_I32 =>
        while (r < n) {
          if (cr.getCurrentDefinitionLevel == maxDef) vec.putInt(r, cr.getInteger)
          else vec.putNull(r)
          cr.consume(); r += 1
        }
      case DEC_INT_I64 =>
        while (r < n) {
          if (cr.getCurrentDefinitionLevel == maxDef) vec.putInt(r, cr.getLong.toInt)
          else vec.putNull(r)
          cr.consume(); r += 1
        }
      case DEC_LONG_I64 =>
        while (r < n) {
          if (cr.getCurrentDefinitionLevel == maxDef) vec.putLong(r, cr.getLong)
          else vec.putNull(r)
          cr.consume(); r += 1
        }
      case DEC_INT_BIN =>
        while (r < n) {
          if (cr.getCurrentDefinitionLevel == maxDef)
            vec.putInt(r, new java.math.BigInteger(cr.getBinary.getBytes).intValue)
          else vec.putNull(r)
          cr.consume(); r += 1
        }
      case DEC_LONG_BIN =>
        while (r < n) {
          if (cr.getCurrentDefinitionLevel == maxDef)
            vec.putLong(r, new java.math.BigInteger(cr.getBinary.getBytes).longValue)
          else vec.putNull(r)
          cr.consume(); r += 1
        }
      case DEC_BYTES_BIN =>
        // two's-complement big-endian unscaled bytes, exactly the layout
        // byte-backed decimal vectors expose through getBinary/getDecimal
        while (r < n) {
          if (cr.getCurrentDefinitionLevel == maxDef) {
            val bytes = cr.getBinary.getBytes
            vec.putByteArray(r, bytes, 0, bytes.length)
          } else vec.putNull(r)
          cr.consume(); r += 1
        }
      case ARR =>
        // 3-level list via (rep, def) triplets. Definition levels along
        // the path [field?, repeated list, element?]:
        //   maxDef      → element present
        //   maxDef-1    → list entry with null element (element OPTIONAL)
        //   defEmpty    → array present but empty
        //   below       → array null
        // Repetition level 0 starts a new record; 1 continues the array.
        val child = vec.arrayData()
        val ec = elemCodes(c)
        val defEmpty = maxDef - (if (elemOpt(c)) 2 else 1)
        var rem = remaining(leafStart(c))
        while (r < n) {
          val d = cr.getCurrentDefinitionLevel
          if (d < defEmpty) { vec.putNull(r); cr.consume(); rem -= 1 }
          else if (d == defEmpty) {
            vec.putArray(r, child.getElementsAppended, 0)
            cr.consume(); rem -= 1
          } else {
            val start = child.getElementsAppended
            var cont = true
            while (cont) {
              if (cr.getCurrentDefinitionLevel == maxDef) ec match {
                case FLOAT => child.appendFloat(cr.getFloat)
                case DOUBLE => child.appendDouble(cr.getDouble)
                case INT32 => child.appendInt(cr.getInteger)
                case INT64 => child.appendLong(cr.getLong)
                case STR =>
                  val bytes = cr.getBinary.getBytes
                  child.appendByteArray(bytes, 0, bytes.length)
              } else child.appendNull()
              cr.consume(); rem -= 1
              cont = rem > 0 && cr.getCurrentRepetitionLevel > 0
            }
            vec.putArray(r, start, child.getElementsAppended - start)
          }
          r += 1
        }
        remaining(leafStart(c)) = rem
      case MAP =>
        // standard MAP via the key leaf's (rep, def) triplets, value leaf
        // consumed in LOCKSTEP (both leaves carry one triplet per entry —
        // and one per empty/null map). Definition levels on the key path
        // [map?, repeated key_value, key(required)]:
        //   maxDefK      → entry present (key always present then)
        //   maxDefK - 1  → map present but empty
        //   below        → map null
        // The value leaf adds its own optionality: value present only at
        // its maxDefV. Offsets land through putArray like arrays do.
        val kChild = vec.getChild(0)
        val vChild = vec.getChild(1)
        val base = leafStart(c)
        val kr = leafReaders(base)
        val vr = leafReaders(base + 1)
        val kCode = mapCodes(c)(0)
        val vCode = mapCodes(c)(1)
        val maxDefK = maxDefs(base)
        val maxDefV = maxDefs(base + 1)
        val defEmpty = maxDefK - 1
        var rem = remaining(base)
        while (r < n) {
          val d = kr.getCurrentDefinitionLevel
          if (d < defEmpty) {
            vec.putNull(r); kr.consume(); vr.consume(); rem -= 1
          } else if (d == defEmpty) {
            vec.putArray(r, kChild.getElementsAppended, 0)
            kr.consume(); vr.consume(); rem -= 1
          } else {
            val start = kChild.getElementsAppended
            var cont = true
            while (cont) {
              appendLeaf(kChild, kCode, kr)
              if (vr.getCurrentDefinitionLevel == maxDefV) appendLeaf(vChild, vCode, vr)
              else vChild.appendNull()
              kr.consume(); vr.consume(); rem -= 1
              cont = rem > 0 && kr.getCurrentRepetitionLevel > 0
            }
            vec.putArray(r, start, kChild.getElementsAppended - start)
          }
          r += 1
        }
        remaining(base) = rem
      case STRUCT =>
        // one-level struct of primitives: m independent leaf streams, one
        // value per row each (no repetition). Definition levels:
        //   maxDef(leaf)     → subfield present
        //   ≥1 (group OPT)   → struct present (subfield may still be null)
        //   0 with group OPT → struct null
        // Children are positional (rowId-aligned with the parent), so a
        // null struct also nulls every child slot to keep positions dense.
        val lcodes = structCodes(c)
        val base = leafStart(c)
        val sOpt = structOpt(c)
        val children = Array.tabulate(lcodes.length)(vec.getChild)
        while (r < n) {
          val present = !sOpt || leafReaders(base).getCurrentDefinitionLevel >= 1
          if (!present) vec.putNull(r)
          var k = 0
          while (k < lcodes.length) {
            val lr = leafReaders(base + k)
            if (present && lr.getCurrentDefinitionLevel == maxDefs(base + k))
              putLeaf(children(k), r, lcodes(k), lr)
            else children(k).putNull(r)
            lr.consume()
            k += 1
          }
          r += 1
        }
    }
  }

  /** Append one present repeated-leaf value (map keys/values) — same
    * storage conventions as [[putLeaf]], append-positioned like the array
    * element branch. */
  private def appendLeaf(
      child: org.apache.spark.sql.execution.vectorized.WritableColumnVector,
      code: Int, cr: ColumnReader): Unit = code match {
    case BOOL => child.appendBoolean(cr.getBoolean)
    case INT32 => child.appendInt(cr.getInteger)
    case INT64 => child.appendLong(cr.getLong)
    case TS_MILLIS => child.appendLong(cr.getLong * 1000L)
    case TS_NANOS => child.appendLong(Math.floorDiv(cr.getLong, 1000L))
    case FLOAT => child.appendFloat(cr.getFloat)
    case DOUBLE => child.appendDouble(cr.getDouble)
    case STR =>
      val bytes = cr.getBinary.getBytes
      child.appendByteArray(bytes, 0, bytes.length)
    case DEC_INT_I32 => child.appendInt(cr.getInteger)
    case DEC_INT_I64 => child.appendInt(cr.getLong.toInt)
    case DEC_LONG_I64 => child.appendLong(cr.getLong)
    case DEC_INT_BIN =>
      child.appendInt(new java.math.BigInteger(cr.getBinary.getBytes).intValue)
    case DEC_LONG_BIN =>
      child.appendLong(new java.math.BigInteger(cr.getBinary.getBytes).longValue)
    case DEC_BYTES_BIN =>
      val bytes = cr.getBinary.getBytes
      child.appendByteArray(bytes, 0, bytes.length)
  }

  /** Write one present struct-leaf value — same storage conventions as the
    * flat-column branches of [[decodeColumn]] (timestamp µs normalization,
    * decimal vector storage by precision). */
  private def putLeaf(
      child: org.apache.spark.sql.execution.vectorized.WritableColumnVector,
      r: Int, code: Int, cr: ColumnReader): Unit = code match {
    case BOOL => child.putBoolean(r, cr.getBoolean)
    case INT32 => child.putInt(r, cr.getInteger)
    case INT64 => child.putLong(r, cr.getLong)
    case TS_MILLIS => child.putLong(r, cr.getLong * 1000L)
    case TS_NANOS => child.putLong(r, Math.floorDiv(cr.getLong, 1000L))
    case FLOAT => child.putFloat(r, cr.getFloat)
    case DOUBLE => child.putDouble(r, cr.getDouble)
    case STR =>
      val bytes = cr.getBinary.getBytes
      child.putByteArray(r, bytes, 0, bytes.length)
    case DEC_INT_I32 => child.putInt(r, cr.getInteger)
    case DEC_INT_I64 => child.putInt(r, cr.getLong.toInt)
    case DEC_LONG_I64 => child.putLong(r, cr.getLong)
    case DEC_INT_BIN =>
      child.putInt(r, new java.math.BigInteger(cr.getBinary.getBytes).intValue)
    case DEC_LONG_BIN =>
      child.putLong(r, new java.math.BigInteger(cr.getBinary.getBytes).longValue)
    case DEC_BYTES_BIN =>
      val bytes = cr.getBinary.getBytes
      child.putByteArray(r, bytes, 0, bytes.length)
  }
}

private[sources] object ColumnarBatchPartitionReader {
  // decode plans (timestamp MICROS decodes as INT64: Spark internal is µs)
  final val BOOL = 0
  final val INT32 = 1
  final val INT64 = 2
  final val TS_MILLIS = 3
  final val TS_NANOS = 4
  final val FLOAT = 5
  final val DOUBLE = 6
  final val STR = 7
  final val DEC_INT_I32 = 8
  final val DEC_INT_I64 = 9
  final val DEC_LONG_I64 = 10
  final val DEC_INT_BIN = 11
  final val DEC_LONG_BIN = 12
  final val DEC_BYTES_BIN = 13
  final val ARR = 14
  final val STRUCT = 15
  final val MAP = 16
}
