package graft.sources

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.connector.Partitioner

/** Micro-batch streaming read through the connector: new files landing in
  * the staged directory become the next micro-batch — the continuously-fed
  * stage scenario (a warehouse unloading result batches while the cluster
  * consumes them). Reuses the batch machinery wholesale: discovery, greedy
  * packing, and the columnar [[BatchPartitionReader]] plane.
  *
  * Offsets index into a FILE LOG persisted under the query's checkpoint
  * (`graft-file-log/seg-<start>`, one segment per discovery that found new
  * files, first-seen order). The log — not the live directory listing — is
  * the source of truth for which file an offset denotes, which buys:
  *
  *   - restart safety: a restarted query replays exactly the files the
  *     committed offsets covered, even if the directory has since grown or
  *     its listing order changed;
  *   - retention/compaction tolerance: deleting an already-processed
  *     staged file can't shift later offsets (the log pins them); a logged
  *     file missing at (re)planning time is skipped with a warning rather
  *     than silently re-mapping offsets to different files.
  *
  * Segments are written ATOMICALLY (temp name + rename) and carry a
  * trailing `#<count>` footer line; [[restoreLog]] refuses a segment whose
  * footer is missing or disagrees with its line count — a crash that
  * truncated a segment is a HARD restart error, never silent data loss.
  *
  * Admission control (`max_files_per_trigger` option): a restarted stream
  * over a backlogged stage (the steady state for a continuously-unloading
  * warehouse) drains the backlog in bounded micro-batches instead of one
  * giant catch-up batch — the same dial as the file source's
  * `maxFilesPerTrigger`, surfaced through [[SupportsAdmissionControl]].
  */
private[sources] class BatchMicroBatchStream(
    required: StructType, options: CaseInsensitiveStringMap,
    checkpointLocation: String)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val conf: Configuration = BatchSource.hadoopConf()
  private val logDir = new Path(checkpointLocation, "graft-file-log")

  private val maxFilesPerTrigger: Option[Int] =
    Option(options.get("max_files_per_trigger")).map { s =>
      val n = s.toInt
      require(n > 0, s"max_files_per_trigger must be positive, got $n")
      n
    }

  // in-memory mirror of the log (rebuilt from it on restart)
  private val logged = mutable.LinkedHashSet.empty[String]
  restoreLog()

  private def fs = logDir.getFileSystem(conf)

  private def restoreLog(): Unit = synchronized {
    if (fs.exists(logDir)) {
      fs.listStatus(logDir).toIndexedSeq
        .filter(_.getPath.getName.startsWith("seg-"))
        .sortBy(_.getPath.getName.stripPrefix("seg-").toLong)
        .foreach { seg =>
          val in = fs.open(seg.getPath)
          val bytes = try in.readAllBytes() finally in.close()
          val lines = new String(bytes, StandardCharsets.UTF_8)
            .linesIterator.filter(_.nonEmpty).toIndexedSeq
          // footer check: `#<n>` written last, after all n path lines — a
          // segment that lost its footer (crash mid-write on a filesystem
          // without atomic rename) is corrupt; refusing it loudly beats
          // silently treating its paths as retention-deleted files
          require(lines.nonEmpty && lines.last.startsWith("#") &&
              lines.last.drop(1).toIntOption.contains(lines.length - 1),
            s"truncated/corrupt stream-log segment ${seg.getPath}: " +
              s"expected a trailing #<count> footer matching its lines; " +
              s"the checkpoint cannot be trusted")
          lines.dropRight(1).foreach(logged.add)
        }
    }
  }

  /** Discover new files and append them to the log; returns log size.
    * The segment becomes visible only via rename — readers never observe
    * a half-written segment (same discipline as [[BatchSinkWrite.commit]]). */
  private def refresh(): Int = synchronized {
    val fresh = BatchSource.listFiles(options, conf)
      .map(_.getPath.toString).filterNot(logged.contains)
    if (fresh.nonEmpty) {
      val seg = new Path(logDir, s"seg-${logged.size}")
      val tmp = new Path(logDir, s".seg-${logged.size}.tmp")
      val out = fs.create(tmp, false)
      try out.write((fresh.mkString("", "\n", "\n") + s"#${fresh.size}\n")
        .getBytes(StandardCharsets.UTF_8))
      finally out.close()
      require(fs.rename(tmp, seg), s"failed to commit stream-log segment $seg")
      fresh.foreach(logged.add)
    }
    logged.size
  }

  override def initialOffset(): Offset = FileCountOffset(0)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  /** Admission-controlled latest offset: at most `max_files_per_trigger`
    * NEW files per micro-batch; a backlog drains across several batches. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val total = refresh()
    val s = start.asInstanceOf[FileCountOffset].n
    FileCountOffset(limit match {
      case mf: ReadMaxFiles => math.min(total, s + mf.maxFiles())
      case _ => total
    })
  }

  /** The true tip of the log, regardless of admission limits (drives the
    * engine's latestOffset metric / backlog accounting). */
  override def reportLatestOffset(): Offset = FileCountOffset(synchronized(logged.size))

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "BatchMicroBatchStream implements SupportsAdmissionControl: " +
      "use latestOffset(start, limit)")

  override def deserializeOffset(json: String): Offset =
    FileCountOffset(json.trim.toInt)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[FileCountOffset].n,
      end.asInstanceOf[FileCountOffset].n)
    val slice = synchronized {
      // a restarted stream replans committed offsets before its first
      // refresh — rebuild the mirror up to `e` under the SAME lock that
      // guards the mutation (an unlocked size read raced refresh/restore)
      if (logged.size < e) refresh()
      logged.toIndexedSeq.slice(s, e)
    }
    val statuses = slice.flatMap { p =>
      val path = new Path(p)
      if (fs.exists(path)) Some(fs.getFileStatus(path))
      else {
        // retention/compaction removed an already-logged file: its offset
        // slot stays pinned (later offsets don't shift), its data is gone
        System.err.println(s"[graft] logged staged file missing, skipping: $p")
        None
      }
    }
    val batches = BatchSource.discoverBatches(statuses, conf).map(_._1)
    if (batches.isEmpty) return Array.empty
    val target = Partitioner.parseBytes(
      Option(options.get("partition_size")).getOrElse(Partitioner.DefaultPartitionSize))
    Partitioner.pack(batches.map(_.bytes), target)
      .map(idxs => BatchInputPartition(idxs.map(batches).toArray): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BatchReaderFactory(required, new SerializableHadoopConf(conf))

  override def stop(): Unit = ()
}

private[sources] case class FileCountOffset(n: Int) extends Offset {
  override def json(): String = n.toString
}
