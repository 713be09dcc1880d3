package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}

/** Continuous inventory: the fslist listing as a Structured Streaming
  * micro-batch source. Each trigger emits the objects that appeared since
  * the last batch, so a manifest stays current without re-running the job
  * — `readStream.format("graft.sources.FsListSource")` → transforms →
  * `writeStream` (the streaming twin of the reference's one-shot scan).
  *
  * Offset = high-water mark over object mtimes. A batch covers the range
  * `(startMtime, endMtime]`. The end offset is probed by a DISTRIBUTED
  * aggregate over the sharded DSv2 listing itself (max LastModified) — a
  * driver-side sequential walk here would re-introduce the exact
  * bottleneck the sharded source exists to kill on a 10M-object prefix.
  * The batch's rows are then produced by the same sharded executor
  * listing (slices, bundles, prefix pruning all apply), filtered to the
  * mtime window per shard.
  *
  * Polling-inventory semantics, documented plainly:
  *  - each trigger re-lists — twice (probe + batch); there is no change
  *    log on a filesystem / object store. Production systems with bucket
  *    event notifications should ingest those instead — this source is
  *    the stateless polling fallback;
  *  - an object whose mtime lands exactly on a committed boundary ms
  *    AFTER that batch's probe ran can be missed, and copies that
  *    preserve old mtimes are never "new" — the mtime watermark trades
  *    exactly-once for statelessness (no per-key log to keep). An
  *    inventory snapshot heals on the next full batch run;
  *  - a probe that fails mid-flight (e.g. an object deleted while a shard
  *    walks) falls back to the current high-water mark: the trigger is a
  *    no-op (logged) and the next one retries. Persistent failures are
  *    NOT silent: after [[FsListMicroBatchStream.MaxConsecutiveProbeFailures]]
  *    consecutive failed probes the exception propagates and fails the
  *    query — a deleted path or expired credentials must not look like an
  *    idle stream forever;
  *  - `.option("maxObjectsPerTrigger", n)` bounds each batch via
  *    [[SupportsAdmissionControl]]: the probe advances the watermark to
  *    the exact n-th new mtime instead of the max, so an initial
  *    10M-object backfill drains as a sequence of bounded batches rather
  *    than one giant one (mtime-granular; see [[probeMaxMtime]]), and
  *    `Trigger.AvailableNow` drains the FULL backlog before stopping
  *    because [[reportLatestOffset]] exposes the true end;
  *  - a pushed Key prefix scopes the probe too: the offset tracks only the
  *    subscribed subset, and the probe listing is shard-pruned to it. The
  *    checkpointed offset does NOT record the prefix, so restarting a
  *    checkpoint with a broadened/removed Key filter is unsupported (out-
  *    of-prefix objects older than the scoped high-water mark would be
  *    silently treated as already emitted) — consistent with Spark's
  *    general rule that a streaming query's source definition must not
  *    change across a checkpoint restart. Start a fresh checkpoint to
  *    change the subscription.
  */
class FsListMicroBatchStream(path: String, batchScan: FsListScan,
                             maxPerTrigger: Option[Long] = None)
    extends MicroBatchStream with SupportsAdmissionControl {

  /** Monotone high-water mark. Restart-durable via [[deserializeOffset]]:
    * restoring the checkpointed offset bumps the mark BEFORE the first
    * probe, so a post-restart probe over a shrunken directory (newest
    * objects deleted) can never rewind the offset log and re-emit an
    * mtime-preserving re-appearance of an already-emitted key. */
  @volatile private var highWater = -1L
  // AtomicInteger rather than a volatile RMW: latestOffset is driver-side
  // and effectively single-threaded in micro-batch execution, but the
  // counter should not depend on that scheduling detail.
  private val consecutiveProbeFailures = new java.util.concurrent.atomic.AtomicInteger(0)
  private def bump(v: Long): Unit = synchronized {
    if (v > highWater) highWater = v
  }

  /** Probe the next end offset. `sinceMs` is the current start mark;
    * `bound` caps the batch at ~bound objects past it (None = take all).
    * Either form is ONE distributed listing: unbounded probes a plain
    * max-mtime aggregate; bounded takes the per-shard top-`bound` mtimes
    * (TakeOrdered — `bound` rows reach the driver, and `bound` is the
    * user's own per-trigger size) and returns their max, i.e. the exact
    * `bound`-th new mtime. Mtime-granular like the offset itself: every
    * object sharing the cutoff mtime rides along. */
  private def probeMaxMtime(sinceMs: Long, bound: Option[Long]): Long =
    try {
      import org.apache.spark.sql.functions.{col, max, unix_millis}
      val spark = org.apache.spark.sql.SparkSession.active
      val base = spark.read.format("graft.sources.FsListSource")
        .option("path", path).load()
      // subscribe the probe to the same subset the batch scan reads: the
      // startsWith pushes down as the shard-pruning prefix, so (a) the
      // probe doesn't pay a full-tree listing for a narrow subscription
      // and (b) out-of-prefix objects can't advance the offset and widen
      // the boundary-mtime miss window for in-prefix objects
      val scoped = batchScan.pushedPrefix
        .map(pre => base.filter(col("Key").startsWith(pre))).getOrElse(base)
      val probed = bound match {
        case None =>
          val row = scoped.agg(max(unix_millis(col("LastModified")))).head()
          if (row.isNullAt(0)) sinceMs else math.max(row.getLong(0), sinceMs)
        case Some(n) =>
          val cap = math.min(n, Int.MaxValue.toLong).toInt
          val row = scoped
            .select(unix_millis(col("LastModified")).as("mt"))
            .filter(col("mt") > sinceMs)
            .orderBy(col("mt")).limit(cap)
            .agg(max(col("mt"))).head()
          if (row.isNullAt(0)) sinceMs else row.getLong(0)
      }
      consecutiveProbeFailures.set(0)
      probed
    } catch {
      // transient mid-stream failure (tree mutating, brief store error):
      // no-op trigger, the next one retries. The FIRST probe propagates
      // instead — a bad path or credentials must fail the query loudly,
      // not surface as a silently-empty stream. (A restart restores the
      // high-water mark before probing, so restarts count as mid-stream.)
      // A PERSISTENT failure (path deleted, credentials expired mid-run)
      // must not degrade into an infinite silent no-op either: each
      // swallowed failure is logged, and the cap rethrows.
      case e: Exception
          if sinceMs >= 0 &&
            consecutiveProbeFailures.get + 1 < FsListMicroBatchStream.MaxConsecutiveProbeFailures =>
        val n = consecutiveProbeFailures.incrementAndGet()
        FsListMicroBatchStream.log.warn(
          s"fslist offset probe failed ($n consecutive, " +
            s"no-op trigger; fails at ${FsListMicroBatchStream.MaxConsecutiveProbeFailures}): $e")
        sinceMs
    }

  override def initialOffset(): Offset = FsListOffset(-1L)

  /** Admission control: the engine drives batch sizing through
    * [[latestOffset(Offset, ReadLimit)]] and learns the TRUE backlog end
    * from [[reportLatestOffset]] — which is what makes
    * `Trigger.AvailableNow` correct under `maxObjectsPerTrigger`: the
    * wrapper pins the full-backlog offset as its target and keeps
    * triggering bounded batches until it is reached, instead of stopping
    * after the first under-reported latestOffset. */
  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = math.max(start.asInstanceOf[FsListOffset].maxMtimeMs, highWater)
    val bound = limit match {
      case r: ReadMaxRows => Some(r.maxRows())
      case _ => None
    }
    FsListOffset(math.max(probeMaxMtime(s, bound), s))
  }

  /** The true high end of the backlog, regardless of the read limit. */
  override def reportLatestOffset(): Offset =
    FsListOffset(math.max(probeMaxMtime(highWater, None), highWater))

  /** Unused once [[SupportsAdmissionControl]] is implemented — the engine
    * calls the two-argument form. */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) drives this source")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FsListOffset].maxMtimeMs
    val e = end.asInstanceOf[FsListOffset].maxMtimeMs
    // keep the mark current from plan time (commit also bumps, later):
    // the high-water mark is the defensive floor for probes and restart
    // monotonicity, and end >= start so bumping the end covers both
    bump(e)
    if (e <= s) Array.empty
    else batchScan.planInputPartitions().map {
      case p: FsListPartition => p.copy(mtimeRange = Some((s, e))): InputPartition
      case other => other
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    batchScan.createReaderFactory()

  override def deserializeOffset(json: String): Offset = {
    val v = FsListOffset.parse(json)
    bump(v)
    FsListOffset(v)
  }

  override def commit(end: Offset): Unit =
    bump(end.asInstanceOf[FsListOffset].maxMtimeMs)

  override def stop(): Unit = ()
}

object FsListMicroBatchStream {
  /** A probe failing this many triggers in a row is treated as permanent
    * (path deleted, credentials expired mid-run) and fails the query. */
  private[graft] val MaxConsecutiveProbeFailures = 5
  private[sources] val log =
    org.slf4j.LoggerFactory.getLogger(classOf[FsListMicroBatchStream])
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
