package graft.connector

/** Partition-planning math — the Spark-side counterpart of the reference's
  * only physical-planning algorithm, `_partition_batches`
  * (dask_snowflake/core.py:149-197): greedy, order-preserving first-fit
  * packing of result batches into right-sized partitions.
  *
  * In Spark the same job is normally done by `spark.sql.files.maxPartitionBytes`
  * (scan-side bin packing) and AQE advisory sizes (post-shuffle); this class
  * exists to (a) reproduce the reference's exact semantics — exactly-one-of
  * validation (core.py:164-167), 100 MiB default (core.py:259-260), row
  * targets from a sampled row width (core.py:172-179) — and (b) drive the
  * `coalesce`/`repartition` decision in [[Read]].
  */
object Partitioner {

  /** Default target partition size (dask_snowflake/core.py:259-260). */
  val DefaultPartitionSize = "100 MiB"

  /** Parse "100 MiB" / "2MB" / "1024" style sizes to bytes.
    * Decimal (kB/MB/GB = 1000ⁿ) and binary (KiB/MiB/GiB = 1024ⁿ) units,
    * matching dask.utils.parse_bytes semantics used by the reference. */
  def parseBytes(s: String): Long = {
    val t = s.trim.toLowerCase
    val m = raw"([0-9]*\.?[0-9]+)\s*([a-z]*)".r
    t match {
      case m(num, unit) =>
        val mult: Double = unit match {
          case "" | "b"          => 1d
          case "k" | "kb"        => 1e3
          case "m" | "mb"        => 1e6
          case "g" | "gb"        => 1e9
          case "t" | "tb"        => 1e12
          case "ki" | "kib"      => 1024d
          case "mi" | "mib"      => 1024d * 1024
          case "gi" | "gib"      => 1024d * 1024 * 1024
          case "ti" | "tib"      => 1024d * 1024 * 1024 * 1024
          case other => throw new IllegalArgumentException(
            s"Could not interpret byte unit '$other' in '$s'")
        }
        (num.toDouble * mult).toLong
      case _ => throw new IllegalArgumentException(s"Could not parse bytes: '$s'")
    }
  }

  /** Exactly-one-of guard (dask_snowflake/core.py:164-167): `npartitions`
    * and `partitionSize` are mutually exclusive; neither → size mode with
    * the 100 MiB default. Returns the effective (npartitions, sizeBytes). */
  def resolveSpec(
      npartitions: Option[Int],
      partitionSize: Option[String]): (Option[Int], Option[Long]) =
    (npartitions, partitionSize) match {
      case (Some(_), Some(_)) =>
        throw new IllegalArgumentException(
          "Please specify either `npartitions` or `partition_size`, not both")
      case (Some(n), None) =>
        require(n > 0, s"npartitions must be positive, got $n")
        (Some(n), None)
      case (None, ps) =>
        (None, Some(parseBytes(ps.getOrElse(DefaultPartitionSize))))
    }

  /** Greedy order-preserving first-fit pack (dask_snowflake/core.py:183-195):
    * accumulate consecutive batches until the *next* batch would push the
    * running total past `target`; an oversize batch occupies a partition
    * alone. Returns contiguous index groups covering 0..sizes.length-1.
    *
    * Invariants (property-tested): groups are a partition of the index
    * range in order; every group's total ≤ target unless it is a single
    * oversize batch; no empty groups.
    */
  def pack(sizes: Seq[Long], target: Long): Seq[Seq[Int]] = {
    require(target > 0, s"target must be positive, got $target")
    if (sizes.isEmpty) return Seq.empty
    val groups = Seq.newBuilder[Seq[Int]]
    var cur = Vector.empty[Int]
    var acc = 0L
    sizes.zipWithIndex.foreach { case (sz, i) =>
      if (cur.nonEmpty && acc + sz > target) {
        groups += cur
        cur = Vector.empty
        acc = 0L
      }
      cur :+= i
      acc += sz
    }
    if (cur.nonEmpty) groups += cur
    groups.result()
  }

  /** Row target for count mode (core.py:169-171): total // npartitions. */
  def rowsPerPartition(totalRows: Long, npartitions: Int): Long =
    math.max(1L, totalRows / npartitions)

  /** Row target for size mode (core.py:172-179): partitionBytes divided by
    * the approximate bytes-per-row sampled from a representative batch. */
  def rowsForSize(partitionBytes: Long, approxRowBytes: Double): Long =
    math.max(1L, (partitionBytes / math.max(approxRowBytes, 1e-9)).toLong)
}
