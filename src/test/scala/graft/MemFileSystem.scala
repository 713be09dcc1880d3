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
  * "directories" exist only as key prefixes. Listing-related calls are
  * implemented; mutations are unsupported. This exercises the exact
  * non-local branch of [[graft.sources.FsListReader]] (getFileStatus +
  * recursive listFiles) that an s3a:// deployment would hit — the wire
  * protocol itself needs a real endpoint (documented gap), but the
  * FileSystem-contract path is covered here.
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
    val p = f.toUri.getPath
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

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    throw new UnsupportedOperationException("mem: read-only listing store")
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("mem: read-only listing store")
  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("mem: read-only listing store")
  override def rename(src: Path, dst: Path): Boolean =
    throw new UnsupportedOperationException("mem: read-only listing store")
  override def delete(f: Path, recursive: Boolean): Boolean =
    throw new UnsupportedOperationException("mem: read-only listing store")
  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    throw new UnsupportedOperationException("mem: read-only listing store")
}

object MemFileSystem {
  /** Flat key space: absolute key path → (size, mtime millis). */
  val objects = scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]
  /** Listing page size (ListObjectsV2 default 1000; tests shrink it). */
  @volatile var PageSize: Int = 1000
  /** Pages served across all listStatusIterator calls since last reset. */
  val pagesServed = new java.util.concurrent.atomic.AtomicInteger(0)
}
