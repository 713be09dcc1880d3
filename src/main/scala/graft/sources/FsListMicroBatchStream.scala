package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Continuous inventory: the fslist listing as a Structured Streaming
  * micro-batch source. Each trigger emits the objects that appeared since
  * the last batch, so a manifest stays current without re-running the job
  * — `readStream.format("graft.sources.FsListSource")` → transforms →
  * `writeStream` (the streaming twin of the reference's one-shot scan).
  *
  * Offset = high-water mark over object mtimes. A batch covers the range
  * `(startMtime, endMtime]`; the end offset is probed by a driver-side
  * walk at each trigger, and the batch's rows are produced by the SAME
  * sharded executor listing as the batch source (slices, bundles, prefix
  * pruning all apply), filtered to the mtime window per shard.
  *
  * Polling-inventory semantics, documented plainly:
  *  - each trigger re-lists (there is no change log on a filesystem /
  *    object store; production systems with bucket event notifications
  *    should ingest those instead — this source is the polling fallback);
  *  - an object whose mtime lands exactly on a committed boundary ms
  *    AFTER that batch's probe ran can be missed, and copies that
  *    preserve old mtimes are never "new" — the mtime watermark trades
  *    exactly-once for statelessness (no key log to keep). An inventory
  *    snapshot heals on the next full batch run.
  */
class FsListMicroBatchStream(path: String, delimiter: String,
                             required: StructType, batchScan: FsListScan)
    extends MicroBatchStream {

  private def maxMtime(): Long = {
    val root = new Path(path)
    if (FsListReader.isLocal(path)) {
      import java.nio.file.{Files, Paths}
      val stream = Files.walk(Paths.get(root.toUri.getPath))
      try {
        var mx = -1L
        stream.filter(f => Files.isRegularFile(f)).forEach { f =>
          val t = Files.getLastModifiedTime(f).toMillis
          if (t > mx) mx = t
        }
        mx
      } finally stream.close()
    } else {
      val fs = root.getFileSystem(batchScan.sessionHadoopConf())
      var mx = -1L
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val t = it.next().getModificationTime
        if (t > mx) mx = t
      }
      mx
    }
  }

  override def initialOffset(): Offset = FsListOffset(-1L)

  override def latestOffset(): Offset = {
    // monotone: never rewind past what a previous batch committed, even
    // if the newest object was deleted between triggers
    val probed = maxMtime()
    val prev = committed
    FsListOffset(math.max(probed, prev))
  }

  @volatile private var committed = -1L

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FsListOffset].maxMtimeMs
    val e = end.asInstanceOf[FsListOffset].maxMtimeMs
    if (e <= s) Array.empty
    else batchScan.planInputPartitions().map {
      case p: FsListPartition => p.copy(mtimeRange = Some((s, e))): InputPartition
      case other => other
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    batchScan.createReaderFactory()

  override def deserializeOffset(json: String): Offset =
    FsListOffset(FsListOffset.parse(json))

  override def commit(end: Offset): Unit =
    committed = math.max(committed, end.asInstanceOf[FsListOffset].maxMtimeMs)

  override def stop(): Unit = ()
}

case class FsListOffset(maxMtimeMs: Long) extends Offset {
  override def json(): String = s"""{"maxMtimeMs":$maxMtimeMs}"""
}

object FsListOffset {
  private val Re = """\{"maxMtimeMs":(-?\d+)\}""".r
  def parse(json: String): Long = json.trim match {
    case Re(v) => v.toLong
    case other => throw new IllegalArgumentException(s"bad fslist offset: $other")
  }
}
