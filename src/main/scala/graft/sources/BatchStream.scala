package graft.sources

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
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
  */
private[sources] class BatchMicroBatchStream(
    required: StructType, options: CaseInsensitiveStringMap,
    checkpointLocation: String)
    extends MicroBatchStream {

  private val conf: Configuration = BatchSource.hadoopConf()
  private val logDir = new Path(checkpointLocation, "graft-file-log")

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
          new String(bytes, StandardCharsets.UTF_8).linesIterator
            .filter(_.nonEmpty).foreach(logged.add)
        }
    }
  }

  /** Discover new files and append them to the log; returns log size. */
  private def refresh(): Int = synchronized {
    val fresh = BatchSource.listFiles(options, conf)
      .map(_.getPath.toString).filterNot(logged.contains)
    if (fresh.nonEmpty) {
      val seg = new Path(logDir, s"seg-${logged.size}")
      val out = fs.create(seg, false)
      try out.write(fresh.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
      finally out.close()
      fresh.foreach(logged.add)
    }
    logged.size
  }

  override def initialOffset(): Offset = FileCountOffset(0)

  override def latestOffset(): Offset = FileCountOffset(refresh())

  override def deserializeOffset(json: String): Offset =
    FileCountOffset(json.trim.toInt)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[FileCountOffset].n,
      end.asInstanceOf[FileCountOffset].n)
    if (logged.size < e) refresh()
    val slice = synchronized { logged.toIndexedSeq.slice(s, e) }
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
