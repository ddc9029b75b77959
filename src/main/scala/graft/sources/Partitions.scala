package graft.sources

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.FileStatus
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Hive-style partition layout for the graft connector: the write side
  * routes rows into `col=value/` subdirectories ([[BatchDataWriter]] with
  * the `partition_by` option), the read side turns those path segments
  * back into columns and — the point of the exercise — prunes whole
  * DIRECTORIES of files from a scan before a single footer is opened.
  *
  * The reference never wrote prunable layouts (its `to_snowflake` stages
  * flat tables, core.py:70-124), but its read side prunes eagerly; this
  * closes the asymmetry: what the sink writes, the scan can skip.
  *
  * Scale contract: partition pruning is PATH arithmetic on the driver's
  * file listing — zero IO per excluded file. A filter on a partition
  * column is absorbed COMPLETELY (not returned as a residual), because a
  * partition value is constant across its file: Spark neither re-reads
  * nor re-evaluates it, and column pruning then drops the partition
  * column from the data read entirely.
  */
private[sources] object Partitions {

  val NullMarker = "__GRAFT_NULL__"

  /** Value → path segment chunk (inverse of [[parseRaw]]). */
  def encode(v: Any): String =
    if (v == null) NullMarker
    else URLEncoder.encode(v.toString, StandardCharsets.UTF_8.name())

  /** Raw `col=value` pairs from a file path's DIRECTORY segments BELOW
    * the table root, in path order. Anchoring at the root matters: an
    * ancestor directory that happens to contain '=' (/data/run=3/stage)
    * must not become a phantom partition column — the same reason Spark's
    * own partition discovery anchors at basePath. The file name itself
    * never participates. `root` is the canonical (qualified) table dir. */
  def parseRaw(path: String, root: String): Seq[(String, String)] = {
    val rel = path.stripPrefix(root).stripPrefix("/")
    if (rel == path) return Seq.empty // not under root — never parse ancestors
    val segs = rel.split('/').dropRight(1)
    segs.toIndexedSeq.flatMap { s =>
      val i = s.indexOf('=')
      if (i <= 0 || s.startsWith(".") || s.startsWith("_")) None
      else Some(s.take(i) ->
        URLDecoder.decode(s.drop(i + 1), StandardCharsets.UTF_8.name()))
    }
  }

  /** Narrowest common type across raw values: every value parses as Long
    * → LongType; as Double → DoubleType; 'true'/'false' → BooleanType;
    * otherwise StringType. The boolean rung deliberately diverges from
    * Spark's own ladder (which leaves 'true' a string): this sink writes
    * BooleanType partition columns as 'true'/'false', and round-tripping
    * the writer's own layout to the written type wins over the corner of
    * a STRING column whose every value happens to be 'true'/'false'. */
  def inferType(raws: Iterable[String]): DataType = {
    val present = raws.filterNot(_ == NullMarker)
    if (present.isEmpty) StringType
    else if (present.forall(v => scala.util.Try(v.toLong).isSuccess)) LongType
    else if (present.forall(v => scala.util.Try(v.toDouble).isSuccess)) DoubleType
    else if (present.forall(v => v == "true" || v == "false")) BooleanType
    else StringType
  }

  /** Raw path value → external JVM value of `dt` (null for the marker). */
  def castValue(raw: String, dt: DataType): Any =
    if (raw == NullMarker) null
    else dt match {
      case LongType => java.lang.Long.valueOf(raw.toLong)
      case DoubleType => java.lang.Double.valueOf(raw.toDouble)
      case BooleanType => java.lang.Boolean.valueOf(raw.toBoolean)
      case _ => raw
    }

  /** The partition columns of a staged directory: path keys present in
    * EVERY file's directory segments (so a value is defined, and constant,
    * for each file), minus names the data files themselves carry (a data
    * column always wins — path-derived shadowing would silently change
    * values), minus keys any file repeats (a hand-made `/x=1/x=2/file`
    * layout has no single constant value for `x` — promoting it would
    * duplicate the StructField and make pruning pick an arbitrary copy;
    * the key stays path decoration instead). Types inferred across all
    * files. */
  def partitionFields(
      files: Seq[FileStatus], conf: Configuration, root: String): Seq[StructField] = {
    if (files.isEmpty) return Seq.empty
    val perFile = files.map(f => parseRaw(f.getPath.toString, root))
    val common = perFile.map(_.map(_._1).toSet).reduce(_ intersect _)
    if (common.isEmpty) return Seq.empty
    val dup = perFile.flatMap(pf =>
      pf.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }).toSet
    val fileCols = BatchSource.footerSchema(files.head, conf)
      .getFields
    val dataNames = (0 until fileCols.size()).map(fileCols.get(_).getName).toSet
    val ordered = perFile.head.map(_._1).distinct.filter(k =>
      common(k) && !dataNames(k) && !dup(k))
    ordered.map { k =>
      val raws = perFile.flatMap(_.collect { case (`k`, v) => v })
      StructField(k, inferType(raws), nullable = true)
    }
  }

  /** Typed partition values of one file, keyed by column name. */
  def valuesOf(
      path: String, root: String, partCols: Seq[StructField]): Map[String, Any] = {
    val raw = parseRaw(path, root).toMap
    partCols.flatMap(f => raw.get(f.name).map(r =>
      f.name -> castValue(r, f.dataType))).toMap
  }

  /** Is `filter` a shape [[matches]] evaluates EXACTLY over constant
    * partition values, referencing only partition columns? Only such
    * filters may be absorbed (removed from Spark's residual). */
  def absorbable(filter: Filter, partCols: Set[String]): Boolean =
    filter.references.forall(partCols.contains) && evaluable(filter)

  private def evaluable(f: Filter): Boolean = f match {
    case _: EqualTo | _: In | _: IsNull | _: IsNotNull |
         _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual => true
    case And(l, r) => evaluable(l) && evaluable(r)
    case Or(l, r) => evaluable(l) && evaluable(r)
    case Not(c) => evaluable(c)
    case _ => false
  }

  /** Evaluation state for [[matches]] — genuine SQL three-valued logic
    * plus a fourth "varies per row" state:
    *   - [[Unknown]] is a NULL-valued comparison. A partition value is
    *     CONSTANT across its file, so Unknown at the top level means
    *     every row evaluates to UNKNOWN → no row satisfies the filter →
    *     the file is excluded, exactly like [[KnownFalse]].
    *   - [[PerRow]] marks a sub-expression whose value can differ per
    *     row (a reference to a non-partition column, or an incomparable
    *     literal): some row might satisfy it → keeps the file.
    * The distinction is what a blanket "NULL under NOT → exclude" got
    * wrong: Not(IsNotNull(c)) over a null partition value is TRUE (IS
    * NULL), not UNKNOWN — IsNull/IsNotNull never return UNKNOWN. */
  private sealed trait Tri
  private case object KnownTrue extends Tri
  private case object KnownFalse extends Tri
  private case object Unknown extends Tri
  private case object PerRow extends Tri

  /** Exact evaluation of an [[evaluable]] filter against one file's
    * constant partition values. True = some row of the file may satisfy
    * the filter; false = provably none does (file excluded). A reference
    * to a column not in `vals` keeps the file (conservative — only
    * reachable for non-absorbed filters, which Spark re-evaluates
    * row-level anyway). */
  def matches(filter: Filter, vals: Map[String, Any]): Boolean =
    eval3(filter, vals) match {
      case KnownTrue | PerRow => true
      case KnownFalse | Unknown => false
    }

  private def eval3(f: Filter, vals: Map[String, Any]): Tri = {
    // comparison leaf: missing column → per-row; NULL operand → UNKNOWN;
    // incomparable types → conservative per-row keep
    def cmp3(c: String, v: Any)(p: Int => Boolean): Tri =
      if (!vals.contains(c)) PerRow
      else if (vals(c) == null || v == null) Unknown
      else BatchSource.exactCmp(vals(c), v) match {
        case Some(r) => if (p(r)) KnownTrue else KnownFalse
        case None => PerRow
      }
    f match {
      case EqualTo(c, v) => cmp3(c, v)(_ == 0)
      case GreaterThan(c, v) => cmp3(c, v)(_ > 0)
      case GreaterThanOrEqual(c, v) => cmp3(c, v)(_ >= 0)
      case LessThan(c, v) => cmp3(c, v)(_ < 0)
      case LessThanOrEqual(c, v) => cmp3(c, v)(_ <= 0)
      case In(c, vs) =>
        if (!vals.contains(c)) PerRow
        else {
          val rs = vs.toIndexedSeq.map(v => cmp3(c, v)(_ == 0))
          if (rs.contains(KnownTrue)) KnownTrue
          else if (rs.contains(PerRow)) PerRow
          else if (rs.contains(Unknown)) Unknown // NULL in list, no match
          else KnownFalse // includes the empty IN — vacuously false
        }
      case IsNull(c) =>
        if (!vals.contains(c)) PerRow
        else if (vals(c) == null) KnownTrue else KnownFalse
      case IsNotNull(c) =>
        if (!vals.contains(c)) PerRow
        else if (vals(c) != null) KnownTrue else KnownFalse
      case And(l, r) => (eval3(l, vals), eval3(r, vals)) match {
        case (KnownFalse, _) | (_, KnownFalse) => KnownFalse
        case (KnownTrue, KnownTrue) => KnownTrue
        case (PerRow, KnownTrue) | (KnownTrue, PerRow)
           | (PerRow, PerRow) => PerRow
        // an Unknown conjunct bars TRUE for every row: AND(x, UNKNOWN)
        // is FALSE or UNKNOWN, never TRUE → excludable
        case _ => Unknown
      }
      case Or(l, r) => (eval3(l, vals), eval3(r, vals)) match {
        case (KnownTrue, _) | (_, KnownTrue) => KnownTrue
        case (KnownFalse, KnownFalse) => KnownFalse
        case (Unknown, Unknown) | (Unknown, KnownFalse)
           | (KnownFalse, Unknown) => Unknown
        // OR with a per-row side can still be TRUE for some row → keep
        case _ => PerRow
      }
      case Not(c) => eval3(c, vals) match {
        case KnownTrue => KnownFalse
        case KnownFalse => KnownTrue
        case other => other // NOT(UNKNOWN)=UNKNOWN; NOT(per-row)=per-row
      }
      case _ => PerRow // non-evaluable shape: keep; Spark re-checks rows
    }
  }
}
