package graft.sources

/** Store-specific ranged enumeration — the seam that lets an SDK-level
  * `start-after` paginator replace hash-slice re-walks of a flat
  * mega-prefix.
  *
  * The Hadoop FileSystem contract can only enumerate a directory from the
  * beginning, so the planner's fallback for an over-fanout directory is K
  * hash slices that each re-issue the full LIST (K× request amplification;
  * see [[FsListScan.planInputPartitions]]). Object-store SDKs can do
  * better: ListObjectsV2 takes a `StartAfter` key
  * (the reference pages exactly that API sequentially,
  * /root/reference/src/main.rs:187-257), so K KEY-RANGE shards read each
  * page of the listing exactly once between them. This trait abstracts
  * that capability: when an implementation is registered for a scheme, the
  * planner emits range shards instead of hash slices and the reader
  * enumerates through the lister.
  *
  * Range semantics: a shard owns keys k with startAfter < k <= endAt
  * (lexicographic; None = unbounded) — StartAfter-exclusive like the S3
  * API, so chaining split points covers the keyspace exactly once by
  * construction. A range is RECURSIVE under the prefix (ListObjectsV2
  * without a delimiter), unlike hash slices, whose ownership unit is the
  * top-level entry.
  *
  * Split-point discovery is store-specific: a store with a sorted index
  * (the mem:// test double; a filesystem with an ordered directory B-tree)
  * returns exact quantile keys; vanilla S3 has no quantile API — there an
  * implementation derives points from an S3 Inventory manifest or adaptive
  * StartAfter/MaxKeys=1 probing. The planner treats the points as a
  * balance hint only; correctness needs them ordered, nothing more.
  */
trait RangedLister {
  /** All keys under `dirPath` (recursive, lexicographic order) with
    * startAfter < key <= endAt, and — when `prefix` is set — starting
    * with that full-path key prefix. Prefix and markers are SEPARATE
    * parameters, exactly like ListObjectsV2's `Prefix` + `StartAfter`:
    * the store never enumerates keys outside the prefix, so a selective
    * pushed filter pays LIST work proportional to the MATCHING subset,
    * not the directory. Returns (keyPath, size, mtimeMs). */
  def listRange(dirPath: String, prefix: Option[String],
                startAfter: Option[String],
                endAt: Option[String]): Iterator[(String, Long, Long)]

  /** Up to n-1 ordered split keys partitioning the keyspace of `dirPath`
    * (restricted to `prefix` when set — points drawn from the full
    * directory would land ~all matching keys in one shard) into ~n
    * balanced ranges. Returning fewer (even zero) is allowed — the
    * planner falls back to hash slices when no usable points come back. */
  def splitPoints(dirPath: String, prefix: Option[String], n: Int): Seq[String]
}

/** JVM-wide scheme → lister registry. A range shard carries only its
  * (startAfter, endAt] bounds; the EXECUTOR resolves the lister by scheme
  * at read time, so implementations never ride task serialization. Local
  * tests register the mem:// double directly; a cluster deployment
  * registers its lister from library init code present on both driver and
  * executor classpaths (same discipline as registering a FileSystem). The
  * planner only emits range shards when the driver-side registry has the
  * scheme, and the reader fails loudly if an executor lacks it. */
object RangedListers {
  private val byScheme =
    new java.util.concurrent.ConcurrentHashMap[String, RangedLister]()
  def register(scheme: String, lister: RangedLister): Unit =
    byScheme.put(scheme, lister)
  def unregister(scheme: String): Unit = byScheme.remove(scheme)
  def forPath(path: String): Option[RangedLister] = {
    val scheme = new org.apache.hadoop.fs.Path(path).toUri.getScheme
    Option(scheme).flatMap(s => Option(byScheme.get(s)))
  }
}
