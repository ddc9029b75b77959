package graft.sources

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.connector.Partitioner

/** Micro-batch streaming read through the connector: new files landing in
  * the staged directory become the next micro-batch — the continuously-fed
  * stage scenario (a warehouse unloading result batches while the cluster
  * consumes them). Reuses the batch machinery wholesale: discovery,
  * greedy packing, and the row-group [[BatchPartitionReader]].
  *
  * Offsets count files in first-seen order, tracked per query instance —
  * an append-only staging contract (files are never rewritten in place,
  * which [[BatchSink]]'s rename-at-commit guarantees).
  */
private[sources] class BatchMicroBatchStream(
    required: StructType, options: CaseInsensitiveStringMap)
    extends MicroBatchStream {

  private val conf: Configuration = BatchSource.hadoopConf()
  // stable first-seen order: a name sort alone could interleave late
  // arrivals between already-processed files
  private val seen = mutable.LinkedHashMap.empty[String, org.apache.hadoop.fs.FileStatus]

  private def refresh(): Int = synchronized {
    BatchSource.listFiles(options, conf).foreach { f =>
      val k = f.getPath.toString
      if (!seen.contains(k)) seen.put(k, f)
    }
    seen.size
  }

  override def initialOffset(): Offset = FileCountOffset(0)

  override def latestOffset(): Offset = FileCountOffset(refresh())

  override def deserializeOffset(json: String): Offset =
    FileCountOffset(json.trim.toInt)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[FileCountOffset].n,
      end.asInstanceOf[FileCountOffset].n)
    refresh()
    val slice = synchronized { seen.values.slice(s, e).toIndexedSeq }
    val batches = BatchSource.discoverBatches(slice, conf).map(_._1)
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
