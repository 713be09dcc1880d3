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
      Option(properties.get("delimiter")).getOrElse("/"),
      Option(properties.get("maxObjectsPerTrigger")).map(_.toLong))
}

class FsListTable(path: String, delimiter: String,
                  maxPerTrigger: Option[Long] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(path != null, "fslist requires .option(\"path\", ...)")
  require(maxPerTrigger.forall(_ > 0), "maxObjectsPerTrigger must be positive")
  override def name(): String = s"fslist($path)"
  override def schema(): StructType = graft.manifest.ManifestGen.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FsListScanBuilder(path, delimiter, maxPerTrigger)
  // the WRITE half ([[ManifestWriteBuilder]]): manifest-out through the
  // DSv2 commit protocol, same connector both directions
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new ManifestWriteBuilder(path, info)
}

class FsListScanBuilder(path: String, delimiter: String,
                        maxPerTrigger: Option[Long] = None)
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

  override def build(): Scan =
    new FsListScan(path, delimiter, prefix, required, limit, maxPerTrigger)
}

class FsListScan(path: String, delimiter: String, prefix: Option[String],
                 required: StructType = graft.manifest.ManifestGen.schema,
                 limit: Option[Int] = None,
                 maxPerTrigger: Option[Long] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** The pushed Key prefix, exposed so the micro-batch stream's offset
    * probe can subscribe to the same subset the batch scan reads. */
  private[sources] def pushedPrefix: Option[String] = prefix

  /** Continuous inventory: the same listing as a micro-batch stream (see
    * [[FsListMicroBatchStream]] for offset semantics and caveats). */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new FsListMicroBatchStream(path, this, maxPerTrigger)

  /** The session's Hadoop configuration — this is where S3A credentials,
    * endpoints, and per-bucket overrides live (spark.hadoop.* /
    * [[graft.manifest.S3AConfig]]); a bare `new Configuration()` would
    * silently ignore them. */
  private[sources] def sessionHadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** Recursive shard planning: descend the tree breadth-first, splitting
    * directory shards into their children until there are at least
    * ~4× cores shards (or the tree bottoms out). A bucket whose objects
    * all live under ONE deep prefix (`data/year=…/…`, the common real
    * layout) must not degrade to a single sequential listing — that is
    * exactly the reference's bottleneck (src/main.rs:187-257) this source
    * exists to kill. Shards whose path can't contain the pushed prefix are
    * pruned at every level.
    *
    * A directory whose fan-out exceeds 8× target (the flat 10M-object
    * mega-prefix — the reference tool's bread-and-butter input) is split
    * into K HASH-SLICED shards of the SAME directory: each shard re-reads
    * the (stat-free) readdir stream but owns only the top-level entries
    * whose stable name hash lands on its index, so every object is
    * emitted exactly once and the expensive per-object work (stat + row
    * construction + downstream processing) spreads across K executors
    * while each file is stat'ed exactly once across all slices. The
    * enumeration itself is repeated K times — the price of the Hadoop FS
    * abstraction having no start-after marker. Stores that CAN serve
    * start-after pagination register a [[RangedLister]]; the planner then
    * emits key-range shards instead, which read each listing page exactly
    * once between them (no re-walk). Hash slices beat lexicographic
    * first-char ranges because DIRECT children balance evenly with zero
    * knowledge of the name distribution; an owned subdirectory rides
    * whole with its owning slice, so a mega-dir hiding one giant subtree
    * degrades that slice toward the old whole-dir walk — the overflow
    * trigger (>8×target direct children) makes the flat case the common
    * one, and the worst case is never worse than pre-slicing behavior.
    * Child statuses are streamed via listStatusIterator and abandoned at
    * the threshold, so the planner never materializes a mega-directory's
    * children (the OOM that whole-dir fallback used to guard against). */
  override def planInputPartitions(): Array[InputPartition] = {
    val root = new Path(path)
    val fs = root.getFileSystem(sessionHadoopConf())
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
    // the root stat is a driver-side listing call like any other — a
    // transient 503 on the very first request gets the same 3×/100ms
    // budget the per-directory LIST calls below already have
    val planTk = FsListReader.throttleKeyFor(root)
    val queue = scala.collection.mutable.Queue(
      graft.manifest.Retry.withRetries(throttleKey = planTk) { fs.getFileStatus(root) } -> 0)
    val out = scala.collection.mutable.ArrayBuffer.empty[FsListPartition]
    val maxDepth = 6
    // round-robin bundles of file children: a 100k-file prefix
    // parallelizes without 100k single-file tasks
    def bundle(files: Seq[org.apache.hadoop.fs.FileStatus]): Unit =
      if (files.nonEmpty) {
        val groups = math.min(target, 1 + (files.length - 1) / 64)
        files.iterator.zipWithIndex
          .toSeq.groupBy(_._2 % groups).values
          .foreach(g => out += FsListPartition(g.map(_._1.getPath.toString), bucket))
      }
    while (queue.nonEmpty) {
      val (st, depth) = queue.dequeue()
      val planned = out.size + queue.size
      if (st.isDirectory && depth < maxDepth && planned + 1 < target) {
        // stream children, stopping at the mega-dir threshold — never
        // materialize an unbounded child list in the driver. The local
        // branch streams readdir via NIO: Hadoop's RawLocalFileSystem
        // listStatusIterator materializes EVERY child status first
        // (~700ms planning per action on a 50k-file dir); the NIO stream
        // reads just past the threshold and stops. Only children that
        // can MATCH the pushed prefix count toward (or are kept past)
        // the threshold — a selective prefix over a mega-directory plans
        // to its few matching children, not to whole-dir slices. A
        // separate cap on TOTAL scanned entries bounds driver time when
        // a selective prefix meets a 10M-child directory: past it, fall
        // back to slices and let the residual filter prune rows.
        val maxKids = 8 * target
        val maxScan = 64 * maxKids
        var scanned = 0
        val raw = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
        var overflow = false
        if (FsListReader.isLocal(st.getPath.toString)) {
          val dir = java.nio.file.Paths.get(st.getPath.toUri.getPath)
          val ds = java.nio.file.Files.newDirectoryStream(dir)
          try {
            val kit = ds.iterator()
            while (kit.hasNext && !overflow) {
              val e = kit.next()
              scanned += 1
              // string-built child path: `new Path(e.toUri)` would stat
              // the entry (UnixPath.toUri probes for the directory form)
              // — the prefix check must run before ANY attribute access
              val hp = new Path(st.getPath,
                new Path(null, null, e.getFileName.toString))
              if (matches(hp)) {
                // an entry can vanish between readdir and stat when the
                // tree is mutated concurrently — skip it, don't fail the
                // whole planning. NOFOLLOW classification keeps the
                // symlink policy consistent with the executor walk:
                // link-to-file is listed (as a file), link-to-dir is
                // never followed (cycle safety), dangling links skipped.
                try {
                  val a = java.nio.file.Files.readAttributes(e,
                    classOf[java.nio.file.attribute.BasicFileAttributes],
                    java.nio.file.LinkOption.NOFOLLOW_LINKS)
                  if (a.isSymbolicLink) {
                    val t = java.nio.file.Files.readAttributes(e,
                      classOf[java.nio.file.attribute.BasicFileAttributes])
                    if (t.isRegularFile)
                      raw += new org.apache.hadoop.fs.FileStatus(t.size, false, 1,
                        64L << 20, t.lastModifiedTime.toMillis, hp)
                  } else
                    raw += new org.apache.hadoop.fs.FileStatus(a.size, a.isDirectory, 1,
                      64L << 20, a.lastModifiedTime.toMillis, hp)
                } catch { case _: java.io.IOException => () }
              }
              if (raw.length > maxKids || scanned > maxScan) overflow = true
            }
          } finally ds.close()
        } else {
          // one LIST call's failure gets the reference's 3×/100ms retry
          // budget (nothing below retries for non-S3A schemes; S3A has its
          // own policy, and a stream dying MID-page is Spark task-retry
          // territory on the executor side — see graft.manifest.Retry)
          val (rRaw, rScanned, rOverflow) =
            graft.manifest.Retry.withRetries(throttleKey = planTk) {
              val acc = scala.collection.mutable.ArrayBuffer
                .empty[org.apache.hadoop.fs.FileStatus]
              var sc = 0
              var ov = false
              val kit = fs.listStatusIterator(st.getPath)
              while (kit.hasNext && !ov) {
                val k = kit.next()
                sc += 1
                if (matches(k.getPath)) acc += k
                if (acc.length > maxKids || sc > maxScan) ov = true
              }
              (acc, sc, ov)
            }
          raw ++= rRaw; scanned = rScanned; overflow = rOverflow
        }
        if (overflow) {
          // Prefer KEY-RANGE shards when the store can serve them
          // ([[RangedLister]]): K (startAfter, endAt] ranges read each
          // page of the listing exactly once between them — no re-walk —
          // so K can track the core count even remotely.
          val dirPath = st.getPath.toString
          // Scope the ranges to the pushed Key prefix when it narrows
          // INSIDE this directory (ListObjectsV2 Prefix + StartAfter are
          // independent parameters): split points are then quantiles of
          // the MATCHING keyspace — points drawn from the whole directory
          // would land ~all matching keys in one shard — and each shard's
          // LIST never enumerates non-matching keys just to discard them
          // on the residual filter.
          val dirUriPath = st.getPath.toUri.getPath
          val dirSlash =
            if (dirUriPath.endsWith("/")) dirUriPath else dirUriPath + "/"
          val effPrefix = prefix.filter(_.startsWith(dirSlash))
          // No points + no prefix = the lister declined to split: hash
          // slices still buy K-way per-object parallelism there. No
          // points + a prefix = few matching keys: ONE prefix-scoped
          // range shard lists just the matching pages — K whole-dir
          // hash slices would re-walk everything to discard it.
          val ranged = RangedListers.forPath(dirPath).map { lister =>
            lister.splitPoints(dirPath, effPrefix, math.min(16, target))
              .distinct.sorted
          }.filter(ps => ps.nonEmpty || effPrefix.isDefined)
          ranged match {
            case Some(points) =>
              val los = None +: points.map(Option(_))
              val his = points.map(Option(_)) :+ None
              los.zip(his).foreach { case (lo, hi) =>
                out += FsListPartition(Seq(dirPath), bucket,
                  range = Some((lo, hi)), rangePrefix = effPrefix)
              }
            case None =>
              // Hash-slice fallback: each slice re-issues the full
              // recursive LIST (K× amplification — nothing is shared; the
              // win is parallelizing the per-object downstream work), so K
              // stays small remotely. Local slices share nothing either,
              // but a readdir re-scan is nearly free next to the per-file
              // stat it skips — K tracks 2× cores (target/2), enough waves
              // to balance stat work without multiplying the shared-nothing
              // re-scan further (at 16 slices on 4 cores the re-scans
              // dominate the walk; capped at 16 either way, so wide
              // driver-scale runs are unchanged).
              val slices =
                if (FsListReader.isLocal(dirPath)) math.min(16, math.max(2, target / 2))
                else math.min(4, target)
              for (i <- 0 until slices)
                out += FsListPartition(Seq(dirPath), bucket, Some((i, slices)))
          }
        } else {
          // Split is all-or-nothing per directory (the reader lists its
          // shard recursively — emitting a parent AND a child would
          // double-read). Directory children are enqueued for further
          // descent; file children are bundled round-robin.
          val (dirs, files) = raw.partition(_.isDirectory)
          dirs.foreach(k => queue.enqueue(k -> (depth + 1)))
          bundle(files.toSeq)
        }
        // shard paths keep their FULL URI (scheme + authority): a shard of
        // an object-store listing (s3a://bucket/...) must route back to
        // that store's FileSystem on the executor, not to the local walk
      } else if (matches(st.getPath)) out += FsListPartition(Seq(st.getPath.toString), bucket)
    }
    // Coalesce plain shards down to the target: a wide-but-shallow tree
    // (e.g. 250 directories at one level) otherwise emits one task per
    // directory, and task DISPATCH — ~1ms each through the scheduler —
    // then dominates the walk itself (measured: 250×200-file shards list
    // at ~140k obj/s, the same tree in ~target merged shards at ~2× that;
    // planning and walking are single-digit ms). Round-robin by index
    // keeps neighbors apart, so similarly-sized siblings spread evenly.
    // Slice/range shards are never merged — their fan-out was chosen
    // deliberately, and a merged slice would re-walk its directory.
    val (plain, special) = out.partition(p => p.slice.isEmpty && p.range.isEmpty)
    // 2× cores (not the 4× planning target): enough shards that work
    // stealing still balances uneven subtrees, few enough that dispatch
    // stops being the listing's critical path.
    val mergeTarget = math.max(2, target / 2)
    val merged: Seq[FsListPartition] =
      if (plain.length > mergeTarget)
        // sort groups by residue so partition composition/order is
        // deterministic across runs (groupBy hands back a HashMap)
        plain.zipWithIndex.groupBy(_._2 % mergeTarget).toSeq.sortBy(_._1)
          .map { case (_, g) =>
            FsListPartition(g.map(_._1).flatMap(_.paths).toSeq, bucket) }
      else plain.toSeq
    val shards = (merged ++ special).map(p => p: InputPartition).toArray
    if (shards.isEmpty) Array(FsListPartition(Seq(root.toString), bucket))
    else shards
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // ship the filesystem-relevant config (credentials, endpoints,
    // per-bucket overrides — all under fs.*) to the executors; a fresh
    // Configuration there would lack everything set on the session
    import scala.jdk.CollectionConverters._
    val shipPrefixes = Seq("fs.", "hadoop.security.", "dfs.", "io.")
    val fsProps = sessionHadoopConf().iterator().asScala
      .map(e => e.getKey -> e.getValue)
      .filter { case (k, _) => shipPrefixes.exists(k.startsWith) }
      .toMap
    new FsListReaderFactory(delimiter, required.fieldNames, limit, fsProps)
  }

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

/** One listing shard: a bundle of roots the reader walks in sequence.
  * Bundles come from flat-directory round-robin grouping; descent shards
  * carry a single root. `slice = Some((i, n))` marks a hash-slice shard
  * of a mega-directory: the reader enumerates the same root as its n-1
  * siblings but OWNS only the top-level entries whose stable name hash is
  * i mod n (an owned subdirectory contributes its entire subtree).
  * Entries partition exactly across the n slices, so together they emit
  * every key exactly once — and a non-owned entry is skipped straight off
  * the readdir/LIST stream without ever being stat'ed.
  * `range = Some((startAfter, endAt))` marks a KEY-RANGE shard instead:
  * the reader enumerates startAfter < key <= endAt through the scheme's
  * registered [[RangedLister]] — ranges chain over the planner's split
  * points, so together they emit every key exactly once while reading
  * each listing page exactly once (no per-slice re-walk). `rangePrefix`
  * carries the pushed Key prefix into those LIST calls (the ListObjectsV2
  * `Prefix` parameter riding next to `StartAfter`), so a selective filter
  * over a mega-prefix lists only matching pages. */
case class FsListPartition(paths: Seq[String], bucket: String,
                           slice: Option[(Int, Int)] = None,
                           mtimeRange: Option[(Long, Long)] = None,
                           range: Option[(Option[String], Option[String])] = None,
                           rangePrefix: Option[String] = None)
    extends InputPartition

object FsListPartition {
  def apply(path: String, bucket: String): FsListPartition =
    FsListPartition(Seq(path), bucket)
}

class FsListReaderFactory(delimiter: String,
                          fields: Array[String] = graft.manifest.ManifestGen.schema.fieldNames,
                          limit: Option[Int] = None,
                          fsProps: Map[String, String] = Map.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FsListReader(partition.asInstanceOf[FsListPartition], delimiter, fields,
      limit, fsProps)
}

object FsListReader {
  /** Hadoop Configuration construction parses XML resources (~100ms+);
    * cache one instance per distinct shipped property set per executor
    * JVM. Caveat shared with Spark's own Hadoop I/O: `FileSystem.get`
    * caches by (scheme, authority, user) — a FileSystem built with one
    * credential set is reused even if later scans ship changed props.
    * Mid-application credential rotation therefore needs a provider that
    * refreshes internally (e.g. an instance-profile/credential-provider
    * chain), not static keys. */
  private val confCache =
    new java.util.concurrent.ConcurrentHashMap[Map[String, String], Configuration]()
  def confFor(fsProps: Map[String, String]): Configuration =
    confCache.computeIfAbsent(fsProps, props => {
      val c = new Configuration()
      props.foreach { case (k, v) => c.set(k, v) }
      c
    })

  private[sources] def isLocal(path: String): Boolean = {
    // Hadoop Path parsing (not raw java.net.URI): tolerates unescaped
    // characters in file names
    val scheme = new Path(path).toUri.getScheme
    scheme == null || scheme == "file"
  }

  /** AIMD pacing scope for [[graft.manifest.AdaptiveThrottle]]: one
    * governor per (scheme, authority) = per store/bucket per JVM. Local
    * paths opt out — nothing throttles the local FS, and the pacing sleep
    * would only slow the NIO fast path.
    */
  private[sources] def throttleKeyFor(p: Path): Option[String] = {
    val u = p.toUri
    Option(u.getScheme).filter(_ != "file")
      .map(s => s + "://" + Option(u.getAuthority).getOrElse(""))
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
                   limit: Option[Int] = None,
                   fsProps: Map[String, String] = Map.empty)
    extends PartitionReader[InternalRow] {
  import java.nio.file.{Files, Paths}

  private var listed = 0L
  private var current: InternalRow = _
  private val openStreams =
    scala.collection.mutable.ArrayBuffer.empty[java.util.stream.Stream[_]]
  private val openCloseables =
    scala.collection.mutable.ArrayBuffer.empty[java.io.Closeable]

  /** Slice membership over a shard-root ENTRY NAME (one path segment).
    * A slice owns the top-level entries whose stable hash lands on its
    * index; an owned directory entry contributes its ENTIRE subtree.
    * Hashing the entry (not each emitted key) is what makes the local
    * walk cheap: non-owned entries are skipped straight off the readdir
    * stream without ever being stat'ed — `Files.walk` would stat every
    * file in every slice just to traverse. */
  private def ownsEntry(name: String): Boolean = p.slice match {
    case Some((idx, n)) =>
      java.lang.Math.floorMod(scala.util.hashing.MurmurHash3.stringHash(name), n) == idx
    case None => true
  }

  /** Full recursive NIO walk (no slicing), ONE `readAttributes` per entry.
    * The previous `Files.walk`-based walk cost 3-4 stat syscalls per file
    * (the walker's internal classification, then `isRegularFile`, then
    * `size` + `getLastModifiedTime` separately); at hundreds of thousands
    * of objects per second the walk IS the syscall count, so the manual
    * DFS reads each entry's attributes exactly once and branches on them.
    * Symlinks are classified NOFOLLOW (same as `Files.walk`'s default) —
    * no cycle risk, and object-store trees have no links anyway.
    * Best-effort under concurrent mutation: a file vanishing between
    * enumeration and stat is skipped, and a subtree vanishing mid-walk
    * truncates that directory (the inventory reflects some point-in-time
    * view of a moving tree either way — failing the task buys nothing). */
  private def nioWalkAll(root: java.nio.file.Path): Iterator[(String, Long, Long)] = {
    import java.nio.file.LinkOption
    import java.nio.file.attribute.BasicFileAttributes
    def attrsOf(p: java.nio.file.Path): Option[BasicFileAttributes] =
      try Some(Files.readAttributes(p, classOf[BasicFileAttributes],
        LinkOption.NOFOLLOW_LINKS))
      catch { case _: java.io.IOException => None }
    attrsOf(root) match {
      case None => Iterator.empty
      case Some(a) if !a.isDirectory =>
        // bundle paths are type-agnostic: a plain-file shard emits itself;
        // a symlink shard emits its target if that is a regular file
        if (a.isRegularFile)
          Iterator((root.toAbsolutePath.toString, a.size, a.lastModifiedTime.toMillis))
        else if (a.isSymbolicLink)
          (try {
            val t = Files.readAttributes(root, classOf[BasicFileAttributes])
            if (t.isRegularFile)
              Iterator((root.toAbsolutePath.toString, t.size, t.lastModifiedTime.toMillis))
            else Iterator.empty
          } catch { case _: java.io.IOException => Iterator.empty })
        else Iterator.empty
      case Some(_) =>
        final case class Frame(ds: java.nio.file.DirectoryStream[java.nio.file.Path],
                               it: java.util.Iterator[java.nio.file.Path])
        val stack = scala.collection.mutable.Stack.empty[Frame]
        def push(d: java.nio.file.Path): Unit =
          try {
            val ds = Files.newDirectoryStream(d)
            openCloseables += ds // safety net if the reader closes mid-walk
            stack.push(Frame(ds, ds.iterator()))
          } catch { case _: java.io.IOException => () }
        push(root)
        new Iterator[Option[(String, Long, Long)]] {
          def hasNext: Boolean = {
            while (stack.nonEmpty) {
              val f = stack.top
              // DirectoryStream iterators surface mid-iteration I/O
              // errors as DirectoryIteratorException (not the
              // UncheckedIOException Files.walk wrapped them in) —
              // treat both as end-of-directory, preserving the
              // best-effort-under-concurrent-mutation contract above.
              val more =
                try f.it.hasNext
                catch {
                  case _: java.io.UncheckedIOException => false
                  case _: java.nio.file.DirectoryIteratorException => false
                }
              if (more) return true
              try f.ds.close() catch { case _: java.io.IOException => () }
              stack.pop()
            }
            false
          }
          def next(): Option[(String, Long, Long)] = {
            val e =
              try stack.top.it.next()
              catch {
                case _: java.io.UncheckedIOException => return None
                case _: java.nio.file.DirectoryIteratorException => return None
              }
            attrsOf(e) match {
              case Some(a) if a.isDirectory => push(e); None
              case Some(a) if a.isRegularFile =>
                Some((e.toAbsolutePath.toString, a.size, a.lastModifiedTime.toMillis))
              case Some(a) if a.isSymbolicLink =>
                // parity with the previous Files.walk + isRegularFile
                // behavior: a link to a FILE is emitted (with the
                // target's size/mtime); a link to a directory is NOT
                // followed (no cycle risk — Files.walk's default too)
                try {
                  val t = Files.readAttributes(e,
                    classOf[BasicFileAttributes]) // follows the link
                  if (t.isRegularFile)
                    Some((e.toAbsolutePath.toString, t.size, t.lastModifiedTime.toMillis))
                  else None
                } catch { case _: java.io.IOException => None } // dangling link
              case _ => None
            }
          }
        }.flatten
    }
  }

  private def nioPath(shardPath: String): java.nio.file.Path =
    Paths.get(new Path(shardPath).toUri.getPath match {
      case "" => shardPath; case s => s
    })

  /** Sliced local walk: stream the root's readdir, keep owned entries
    * only, and stat just those (owned dirs recurse via the full walk).
    * One readdir pass per slice, one stat per owned object — the n
    * slices of a flat mega-directory collectively stat each file exactly
    * once. */
  private def nioWalkSliced(root: java.nio.file.Path): Iterator[(String, Long, Long)] = {
    val ds = Files.newDirectoryStream(root)
    openCloseables += ds
    import scala.jdk.CollectionConverters._
    ds.iterator().asScala
      .filter(e => ownsEntry(e.getFileName.toString))
      .flatMap { e =>
        // skip entries vanishing between readdir and stat (see nioWalkAll);
        // symlink policy matches nioWalkAll: link-to-file emitted with
        // target stats, link-to-dir never followed
        try {
          val attrs = Files.readAttributes(e,
            classOf[java.nio.file.attribute.BasicFileAttributes],
            java.nio.file.LinkOption.NOFOLLOW_LINKS)
          if (attrs.isDirectory) nioWalkAll(e)
          else if (attrs.isRegularFile)
            Iterator((e.toAbsolutePath.toString, attrs.size(),
              attrs.lastModifiedTime().toMillis))
          else if (attrs.isSymbolicLink) {
            val t = Files.readAttributes(e,
              classOf[java.nio.file.attribute.BasicFileAttributes])
            if (t.isRegularFile)
              Iterator((e.toAbsolutePath.toString, t.size(),
                t.lastModifiedTime().toMillis))
            else Iterator.empty
          } else Iterator.empty
        } catch { case _: java.io.IOException => Iterator.empty }
      }
  }

  /** Top-level path segment of `key` under the shard root (the entry the
    * slice contract is defined over) — remote listings return a flat
    * recursive stream, so the entry is recovered from the key. */
  private def topSegment(rootPath: String, key: String): String = {
    val root = if (rootPath.endsWith("/")) rootPath else rootPath + "/"
    val rel = if (key.startsWith(root)) key.substring(root.length) else key
    val i = rel.indexOf('/')
    if (i < 0) rel else rel.substring(0, i)
  }

  private def walkOne(shardPath: String): Iterator[(String, Long, Long)] =
    if (p.range.isDefined) {
      // key-range shard: enumerate through the scheme's registered ranged
      // lister (the planner only emits these when the driver had one; the
      // executor must have the same library registration)
      val (lo, hi) = p.range.get
      val lister = RangedListers.forPath(shardPath).getOrElse(throw new IllegalStateException(
        s"range shard for $shardPath but no RangedLister is registered " +
          "for its scheme on this executor"))
      lister.listRange(shardPath, p.rangePrefix, lo, hi)
    } else if (FsListReader.isLocal(shardPath)) {
      val root = nioPath(shardPath)
      if (p.slice.isDefined) nioWalkSliced(root) else nioWalkAll(root)
    } else {
      val path = new Path(shardPath)
      val rootPath = path.toUri.getPath
      val fs = path.getFileSystem(FsListReader.confFor(fsProps))
      // the OPEN of the listing gets the reference retry budget; a stream
      // failing mid-pagination is retried by Spark at task granularity
      // (the whole shard re-runs — a paginator has position, a call does
      // not; see graft.manifest.Retry). The per-store throttle key adds
      // AIMD pacing on 503s — each executor's shards collectively slow
      // down instead of hammering a throttling prefix at full rate.
      val tk = FsListReader.throttleKeyFor(path)
      if (graft.manifest.Retry.withRetries(throttleKey = tk) { fs.getFileStatus(path) }.isDirectory) {
        val jit = graft.manifest.Retry.withRetries(throttleKey = tk) { fs.listFiles(path, true) }
        new Iterator[(String, Long, Long)] {
          def hasNext: Boolean = jit.hasNext
          def next(): (String, Long, Long) = {
            val st = jit.next()
            (st.getPath.toUri.getPath, st.getLen, st.getModificationTime)
          }
          // object-store listings carry size+mtime inline, so the slice
          // filter adds no per-object calls — but each slice DOES issue
          // its own full recursive LIST (the planner bounds remote slice
          // counts accordingly; see planInputPartitions)
        }.filter(t => ownsEntry(topSegment(rootPath, t._1)))
      } else {
        val st = graft.manifest.Retry.withRetries(throttleKey = tk) { fs.getFileStatus(path) }
        Iterator((st.getPath.toUri.getPath, st.getLen, st.getModificationTime))
          .filter(t => ownsEntry(topSegment(rootPath, t._1)))
      }
    }

  // lazy flatMap: each bundle root opens only when the previous is
  // drained. Streaming shards carry an (start, end] mtime window — the
  // micro-batch source's new-objects filter.
  private val it: Iterator[(String, Long, Long)] = {
    val base = p.paths.iterator.flatMap(walkOne)
    p.mtimeRange match {
      case Some((s, e)) => base.filter(t => t._3 > s && t._3 <= e)
      case None => base
    }
  }

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
  override def close(): Unit = {
    openStreams.foreach(_.close())
    openCloseables.foreach(_.close())
  }
}
