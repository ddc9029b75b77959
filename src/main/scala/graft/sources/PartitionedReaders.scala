package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side materialization of path-derived partition columns.
  *
  * A [[BatchInputPartition]] may pack row groups from files in DIFFERENT
  * `col=value/` subtrees (the greedy packer is partition-agnostic), so
  * the wrappers group the partition's handles by partition values and
  * run the ordinary file readers group-by-group, splicing each group's
  * constant values in: as [[ConstantColumnVector]]s on the columnar
  * plane (zero per-row cost — the same vector Spark's own file source
  * uses for partition columns), as constants in a merged row on the row
  * plane. Data files never store partition values; the path is the
  * single source of truth.
  */
private[sources] object PartitionedReaders {

  /** Handles grouped by their files' partition values, first-appearance
    * order (files sharing values — one subtree — share one group). */
  def groupHandles(
      handles: Array[BatchSource.BatchHandle],
      partCols: Seq[StructField],
      rootDir: String): Seq[(Map[String, Any], Array[BatchSource.BatchHandle])] = {
    val order = mutable.LinkedHashMap
      .empty[Map[String, Any], mutable.ArrayBuffer[BatchSource.BatchHandle]]
    handles.foreach { h =>
      val vals = Partitions.valuesOf(h.path, rootDir, partCols)
      order.getOrElseUpdate(vals, mutable.ArrayBuffer.empty) += h
    }
    order.view.map { case (k, v) => (k, v.toArray) }.toSeq
  }

  /** External partition value → Catalyst internal value. */
  def internalValue(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType => UTF8String.fromString(v.toString)
      case _ => v // Long / Double box as-is
    }
}

/** Columnar plane: the inner [[ColumnarBatchPartitionReader]] decodes the
  * file-backed columns; partition columns ride as constant vectors. */
private[sources] class PartitionedColumnarReader(
    partition: BatchInputPartition, required: StructType,
    fileRequired: StructType, partCols: Seq[StructField], rootDir: String,
    conf: SerializableHadoopConf, capacity: Int = 4096)
    extends PartitionReader[ColumnarBatch] {

  private val groups =
    PartitionedReaders.groupHandles(partition.handles, partCols, rootDir)
  private var groupIdx = 0
  private var inner: ColumnarBatchPartitionReader = _
  private var constants: Seq[ConstantColumnVector] = Seq.empty
  private var outer: ColumnarBatch = _

  private def openNextGroup(): Boolean = {
    closeCurrent()
    if (groupIdx >= groups.length) return false
    val (vals, handles) = groups(groupIdx)
    groupIdx += 1
    inner = new ColumnarBatchPartitionReader(
      BatchInputPartition(handles), fileRequired, conf, capacity)
    val consts = mutable.Map.empty[String, ConstantColumnVector]
    partCols.foreach { f =>
      val vec = new ConstantColumnVector(capacity, f.dataType)
      vals.getOrElse(f.name, null) match {
        case null => vec.setNull()
        case l: java.lang.Long => vec.setLong(l)
        case d: java.lang.Double => vec.setDouble(d)
        case b: java.lang.Boolean => vec.setBoolean(b)
        case other => vec.setUtf8String(UTF8String.fromString(other.toString))
      }
      consts(f.name) = vec
    }
    constants = partCols.map(f => consts(f.name))
    val innerBatch = inner.get()
    val vectors: Array[ColumnVector] = required.fields.map { f =>
      val fi = fileRequired.fieldNames.indexOf(f.name)
      if (fi >= 0) innerBatch.column(fi)
      else consts(f.name): ColumnVector
    }
    outer = new ColumnarBatch(vectors)
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (inner == null && !openNextGroup()) return false
      if (inner.next()) {
        outer.setNumRows(inner.get().numRows)
        return true
      }
      closeCurrent()
    }
    false // unreachable
  }

  override def get(): ColumnarBatch = outer

  private def closeCurrent(): Unit = {
    if (inner != null) { inner.close(); inner = null }
    constants.foreach(_.close())
    constants = Seq.empty
  }

  override def close(): Unit = closeCurrent()
}

/** Row plane: used when NO file-backed column is required (the inner
  * empty-projection reader still drives the row count) or Spark declines
  * columnar. Merges each inner row with the group's constants in
  * `required` order. */
private[sources] class PartitionedRowReader(
    partition: BatchInputPartition, required: StructType,
    fileRequired: StructType, partCols: Seq[StructField], rootDir: String,
    conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val groups =
    PartitionedReaders.groupHandles(partition.handles, partCols, rootDir)
  private var groupIdx = 0
  private var inner: BatchPartitionReader = _
  // per required field: file ordinal (≥0) or -(partCol index)-1
  private val mapping: Array[Int] = required.fields.map { f =>
    val fi = fileRequired.fieldNames.indexOf(f.name)
    if (fi >= 0) fi else -(partCols.indexWhere(_.name == f.name)) - 1
  }
  private var consts: Array[Any] = _

  private def openNextGroup(): Boolean = {
    if (inner != null) { inner.close(); inner = null }
    if (groupIdx >= groups.length) return false
    val (vals, handles) = groups(groupIdx)
    groupIdx += 1
    inner = new BatchPartitionReader(BatchInputPartition(handles), fileRequired, conf)
    consts = partCols.map(f =>
      PartitionedReaders.internalValue(vals.getOrElse(f.name, null), f.dataType)).toArray
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (inner == null && !openNextGroup()) return false
      if (inner.next()) return true
      inner.close(); inner = null
    }
    false // unreachable
  }

  override def get(): InternalRow = {
    val row = inner.get()
    val out = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      val m = mapping(i)
      out(i) =
        if (m >= 0) {
          if (row.isNullAt(m)) null
          else row.get(m, required.fields(i).dataType)
        } else consts(-m - 1)
      i += 1
    }
    new GenericInternalRow(out)
  }

  override def close(): Unit = if (inner != null) { inner.close(); inner = null }
}
