package graft.sources

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, StringStartsWith}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 "fslist": expose a filesystem listing as a table with the
  * reference manifest schema. This is the scale path for manifest
  * generation: where the reference pages ListObjectsV2 sequentially on one
  * thread (/root/reference/src/main.rs:187-257, 1000 keys per round-trip),
  * this source plans one InputPartition per top-level child of the root,
  * and each EXECUTOR lists its shard — listing throughput scales with the
  * cluster, not the page-size×RTT product.
  *
  * Pushdown: a `Key LIKE 'prefix%'` filter prunes whole shards whose path
  * can't match (the DSv2 analog of the server-side `prefix` parameter in
  * the List request, src/main.rs:190). Filters are still reported back as
  * residual so Spark re-applies them — mirroring the reference's defensive
  * client-side re-check (src/main.rs:210-219) and keeping correctness
  * independent of pruning.
  *
  * Usage: spark.read.format("graft.sources.FsListSource")
  *                  .option("path", dir).option("delimiter", "/").load()
  */
class FsListSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.manifest.ManifestGen.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FsListTable(properties.get("path"),
      Option(properties.get("delimiter")).getOrElse("/"))
}

class FsListTable(path: String, delimiter: String) extends Table with SupportsRead {
  require(path != null, "fslist requires .option(\"path\", ...)")
  override def name(): String = s"fslist($path)"
  override def schema(): StructType = graft.manifest.ManifestGen.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FsListScanBuilder(path, delimiter)
}

class FsListScanBuilder(path: String, delimiter: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {
  private var prefix: Option[String] = None
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = graft.manifest.ManifestGen.schema
  private var limit: Option[Int] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.collect { case f @ StringStartsWith("Key", p) => prefix = Some(p); f }
    filters // all residual: Spark re-applies (defensive re-check semantics)
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Column pruning: a `SELECT Key, Size` manifest query must not pay for
    * FileName extraction or timestamp conversion per object. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Per-partition limit pushdown: `LIMIT n` stops each shard's walk after
    * n objects instead of listing the whole subtree (the DSv2 analog of
    * stopping pagination early). Spark applies the global limit on top. */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); false }

  override def build(): Scan = new FsListScan(path, delimiter, prefix, required, limit)
}

class FsListScan(path: String, delimiter: String, prefix: Option[String],
                 required: StructType = graft.manifest.ManifestGen.schema,
                 limit: Option[Int] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Recursive shard planning: descend the tree breadth-first, splitting
    * directory shards into their children until there are at least
    * ~4× cores shards (or the tree bottoms out). A bucket whose objects
    * all live under ONE deep prefix (`data/year=…/…`, the common real
    * layout) must not degrade to a single sequential listing — that is
    * exactly the reference's bottleneck (src/main.rs:187-257) this source
    * exists to kill. Shards whose path can't contain the pushed prefix are
    * pruned at every level; a directory whose fan-out would blow the shard
    * count far past the target is kept whole (its reader lists it
    * recursively — bounded task-scheduling overhead beats 100k single-file
    * tasks). */
  override def planInputPartitions(): Array[InputPartition] = {
    val root = new Path(path)
    val fs = root.getFileSystem(new Configuration())
    val bucket = root.getName
    val cores = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.defaultParallelism).getOrElse(32)
    val target = 4 * cores
    val matches: Path => Boolean = p => prefix.forall { pre =>
      val cp = p.toUri.getPath
      // keep if this subtree could contain keys starting with `pre`
      cp.startsWith(pre) || pre.startsWith(cp)
    }
    val queue = scala.collection.mutable.Queue(fs.getFileStatus(root) -> 0)
    val out = scala.collection.mutable.ArrayBuffer.empty[Path]
    val maxDepth = 6
    while (queue.nonEmpty) {
      val (st, depth) = queue.dequeue()
      val planned = out.size + queue.size
      if (st.isDirectory && depth < maxDepth && planned + 1 < target) {
        val kids = fs.listStatus(st.getPath).filter(k => matches(k.getPath))
        // Split is all-or-nothing per directory (the reader lists its shard
        // recursively — emitting a parent AND a child would double-read).
        // Worth splitting when the children include directories (descend
        // toward real parallelism) or the dir is a flat mega-dir (then
        // per-file tasks genuinely parallelize the stat work). A fan-out
        // past 8× target stays whole: 100k single-file tasks cost more in
        // scheduling than one recursive walk.
        val worthSplitting = kids.exists(_.isDirectory) || kids.length >= 1024
        if (kids.isEmpty) () // empty or fully pruned subtree — drop it
        else if (!worthSplitting || kids.length > 8 * target) out += st.getPath
        else kids.foreach(k => queue.enqueue(k -> (depth + 1)))
      } else if (matches(st.getPath)) out += st.getPath
    }
    val shards =
      out.map(p => FsListPartition(p.toUri.getPath, bucket): InputPartition).toArray
    if (shards.isEmpty) Array(FsListPartition(root.toUri.getPath, bucket))
    else shards
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FsListReaderFactory(delimiter, required.fieldNames, limit)

  /** The reference's live progress meter (objects scanned, src/main.rs:176-185)
    * becomes a DSv2 custom metric: per-task counts roll up in the SQL UI. */
  override def supportedCustomMetrics(): Array[CustomMetric] =
    Array(new ObjectsListedMetric)
}

class ObjectsListedMetric extends CustomSumMetric {
  override def name(): String = "objectsListed"
  override def description(): String = "objects listed"
}

case class ObjectsListedTaskMetric(value: Long) extends CustomTaskMetric {
  override def name(): String = "objectsListed"
}

case class FsListPartition(shardPath: String, bucket: String) extends InputPartition

class FsListReaderFactory(delimiter: String,
                          fields: Array[String] = graft.manifest.ManifestGen.schema.fieldNames,
                          limit: Option[Int] = None) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FsListReader(partition.asInstanceOf[FsListPartition], delimiter, fields, limit)
}

object FsListReader {
  /** Hadoop Configuration construction parses XML resources (~100ms+);
    * share one instance per executor JVM — FileSystem.get() then serves
    * cached filesystems keyed by scheme. */
  lazy val sharedConf = new Configuration()

  private def isLocal(path: String): Boolean = {
    val scheme = new java.net.URI(path).getScheme
    scheme == null || scheme == "file"
  }
}

/** Executor-side recursive listing of one shard.
  *
  * Local paths walk via java.nio: Hadoop's RawLocalFileSystem spends ~4ms
  * PER FILE materializing permission info (it forks `ls`), which would cap
  * listing at ~250 objects/sec/core — the NIO walk is ~1000× faster.
  * Non-local schemes (s3a://, …) go through the Hadoop FileSystem, whose
  * object-store listings are the batched LIST calls we want there.
  */
class FsListReader(p: FsListPartition, delimiter: String,
                   fields: Array[String] = graft.manifest.ManifestGen.schema.fieldNames,
                   limit: Option[Int] = None)
    extends PartitionReader[InternalRow] {
  import java.nio.file.{Files, Paths}

  private var listed = 0L
  private var current: InternalRow = _

  private val nioStream =
    if (FsListReader.isLocal(p.shardPath)) Files.walk(Paths.get(new java.net.URI(p.shardPath).getPath match {
      case "" => p.shardPath; case s => s
    })) else null
  private val nioIt =
    if (nioStream != null) {
      val jit = nioStream.filter(f => Files.isRegularFile(f)).iterator()
      new Iterator[(String, Long, Long)] {
        def hasNext: Boolean = jit.hasNext
        def next(): (String, Long, Long) = {
          val f = jit.next()
          (f.toAbsolutePath.toString, Files.size(f),
            Files.getLastModifiedTime(f).toMillis)
        }
      }
    } else null

  private lazy val fs = new Path(p.shardPath).getFileSystem(FsListReader.sharedConf)
  private val hadoopIt =
    if (nioIt != null) null
    else {
      val path = new Path(p.shardPath)
      if (fs.getFileStatus(path).isDirectory) {
        val jit = fs.listFiles(path, true)
        new Iterator[(String, Long, Long)] {
          def hasNext: Boolean = jit.hasNext
          def next(): (String, Long, Long) = {
            val st = jit.next()
            (st.getPath.toUri.getPath, st.getLen, st.getModificationTime)
          }
        }
      } else {
        val st = fs.getFileStatus(path)
        Iterator((st.getPath.toUri.getPath, st.getLen, st.getModificationTime))
      }
    }

  private val it: Iterator[(String, Long, Long)] =
    if (nioIt != null) nioIt else hadoopIt

  override def next(): Boolean = {
    if (limit.exists(listed >= _)) return false
    if (it.hasNext) {
      val (key, size, mtime) = it.next()
      current = toRow(key, size, mtime)
      listed += 1
      true
    } else false
  }

  override def currentMetricsValues(): Array[CustomTaskMetric] =
    Array(ObjectsListedTaskMetric(listed))

  private def toRow(key: String, size: Long, mtimeMs: Long): InternalRow = {
    val k = if (key == null) "" else key
    val values: Array[Any] = fields.map {
      case "Bucket" => UTF8String.fromString(p.bucket)
      case "Key" => UTF8String.fromString(k)
      case "FileName" =>
        val idx = k.lastIndexOf(delimiter)
        UTF8String.fromString(
          if (delimiter.isEmpty || idx < 0) k else k.substring(idx + delimiter.length))
      case "Size" => size
      case "LastModified" => mtimeMs * 1000L // TimestampType micros
    }
    InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(values))
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (nioStream != null) nioStream.close()
}
