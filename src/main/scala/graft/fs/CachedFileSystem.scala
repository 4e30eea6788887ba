package graft.fs

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FSInputStream,
  FileStatus, FileSystem, Path}
import org.apache.hadoop.util.Progressable

/** A Hadoop scheme family (`cached-<inner>://`) that routes QUERY-PATH
  * reads through the read-through [[ObjectCache]] — the reference's
  * cache store wraps every engine object read, not just ingest
  * (crates/cdl-store/src/lib.rs:183-243); this closes the same gap for
  * `spark.read.parquet` on remote tables. `cached-s3a://host/path`
  * delegates all metadata and write operations to `s3a://host/path`;
  * `open` serves ranged reads from the per-node cache copy when the
  * object clears the admission threshold, so a second scan of a hot
  * table never re-fetches from the remote store. The inner scheme lives
  * IN the scheme name (not in a conf key): two wrapped schemes — s3a
  * and gs, or two mock schemes in one test session — never collide.
  *
  * Semantics assume WRITE-ONCE objects — the rootfs model: parquet part
  * files and commit-log entries are immutable once written, new data
  * arrives as new files (same contract the reference's cache relies on).
  * `delete`/`rename` still invalidate the cache copy defensively.
  *
  * Cluster shape: the cache directory is per-executor local disk (the
  * conf keys ship with the Hadoop conf to every executor), so each node
  * builds its own working set of the objects its tasks actually scan —
  * no coordination, no shared state, exactly the reference's per-node
  * cache dir at 1000-executor scale.
  */
class CachedFileSystem extends FileSystem {

  private var inner: FileSystem = _
  private var innerScheme: String = _
  private var myScheme: String = CachedFileSystem.SchemePrefix + "?"
  private var self: URI = _

  override def getScheme: String = myScheme

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setConf(conf)
    myScheme = uri.getScheme
    require(myScheme != null &&
        myScheme.startsWith(CachedFileSystem.SchemePrefix) &&
        myScheme.length > CachedFileSystem.SchemePrefix.length,
      s"cached scheme must be ${CachedFileSystem.SchemePrefix}<inner>, got $uri")
    innerScheme = myScheme.substring(CachedFileSystem.SchemePrefix.length)
    self = new URI(myScheme, uri.getAuthority, "/", null, null)
    inner = FileSystem.get(
      new URI(innerScheme, uri.getAuthority, "/", null, null), conf)
  }

  override def getUri: URI = self

  private def toInner(p: Path): Path = {
    val u = p.toUri
    new Path(new URI(innerScheme, u.getAuthority, u.getPath, null, null))
  }

  private def fromInner(p: Path): Path = {
    val u = p.toUri
    new Path(new URI(myScheme, u.getAuthority, u.getPath, null, null))
  }

  private def rewrap(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime,
      Option(s.getPermission).getOrElse(
        if (s.isDirectory) FsPermission.getDirDefault
        else FsPermission.getFileDefault),
      s.getOwner, s.getGroup, fromInner(s.getPath))

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val ip = toInner(f)
    // admission decided once per open: below-threshold objects (and an
    // unarmed cache) stream straight from the backend — same verdict
    // ObjectCache.readRange would reach per read, without paying it per
    // read. Length also bounds EOF handling in the cached stream. The
    // stat runs only when a cache is armed: an unarmed session must not
    // pay an extra metadata RPC per open just to discard the length.
    ObjectCache.fromConf(getConf) match {
      case Some(c) =>
        val len = inner.getFileStatus(ip).getLen
        if (len >= c.minObjectSize)
          new FSDataInputStream(
            new CachedFileSystem.CachedInput(getConf, ip, len))
        else inner.open(ip, bufferSize)
      case None => inner.open(ip, bufferSize)
    }
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    // a (re)write through this scheme must never leave a stale cache copy
    ObjectCache.invalidate(getConf, toInner(f))
    inner.create(toInner(f), permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = {
    ObjectCache.invalidate(getConf, toInner(f))
    inner.append(toInner(f), bufferSize, progress)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    ObjectCache.invalidate(getConf, toInner(src))
    ObjectCache.invalidate(getConf, toInner(dst))
    inner.rename(toInner(src), toInner(dst))
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    ObjectCache.invalidate(getConf, toInner(f))
    inner.delete(toInner(f), recursive)
  }

  override def listStatus(f: Path): Array[FileStatus] =
    inner.listStatus(toInner(f)).map(rewrap)

  override def setWorkingDirectory(dir: Path): Unit =
    inner.setWorkingDirectory(toInner(dir))

  override def getWorkingDirectory: Path = fromInner(inner.getWorkingDirectory)

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    inner.mkdirs(toInner(f), permission)

  override def getFileStatus(f: Path): FileStatus =
    rewrap(inner.getFileStatus(toInner(f)))
}

object CachedFileSystem {

  val SchemePrefix = "cached-"

  /** Register `cached-<innerScheme>://` on `conf` (e.g. "s3a" →
    * `cached-s3a://`). Idempotent; the ObjectCache knobs themselves
    * travel via `ObjectCache.configure`. */
  def install(conf: Configuration, innerScheme: String): Unit =
    conf.set(s"fs.$SchemePrefix$innerScheme.impl",
      classOf[CachedFileSystem].getName)

  /** `inner://host/path` → `cached-inner://host/path` (the caller must
    * have `install`ed the matching inner scheme on the session conf).
    * A pure string prefix — NOT a URI round-trip: data-file paths may
    * carry URI-illegal characters (a space in a partition value is the
    * classic one — Spark's escapePathName leaves spaces alone), and
    * URI.create throws on them where re-encoding would silently change
    * the path downstream readers resolve. Prefixing leaves the path
    * bytes untouched, so the routed path parses exactly as the
    * un-routed one would. */
  def route(uri: String): String = {
    require(uri.contains("://"), s"route needs a scheme'd URI: $uri")
    SchemePrefix + uri
  }

  /** Seekable/pread stream over ObjectCache ranged reads. Parquet
    * readers issue positioned reads (footer, then column chunks); each
    * maps to one `readRange`, which serves from the local cache copy
    * after the first touch pulls the object. */
  private final class CachedInput(conf: Configuration, p: Path, len: Long)
    extends FSInputStream {

    private var pos = 0L

    // Read-ahead buffer for the single-byte `read()` path: parquet
    // readers issue positioned bulk reads (below) and never touch it,
    // but a generic byte-at-a-time reader through the cached scheme
    // (text/CSV/avro sync-marker probing) would otherwise pay one full
    // `readRange` per byte. 8 KiB amortizes that to one range per block
    // while staying far below any sane row-group size. The buffer is
    // validity-checked by range, so seeks and bulk reads need no
    // explicit invalidation (cached objects are immutable snapshots;
    // staleness is ObjectCache's concern, not this stream's).
    private val BufCap = 8192
    private var bufStart = 0L
    private var buf: Array[Byte] = Array.emptyByteArray

    override def seek(newPos: Long): Unit = {
      if (newPos < 0) throw new java.io.EOFException(s"negative seek: $newPos")
      pos = newPos
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false

    override def read(): Int =
      if (pos >= len) -1
      else {
        if (pos < bufStart || pos >= bufStart + buf.length) {
          val n = math.min(BufCap.toLong, len - pos).toInt
          buf = ObjectCache.readRange(conf, p, pos, n)
          bufStart = pos
        }
        val b = buf((pos - bufStart).toInt)
        pos += 1
        b & 0xff
      }

    override def read(b: Array[Byte], off: Int, l: Int): Int = {
      if (pos >= len) return -1
      val n = math.min(l.toLong, len - pos).toInt
      if (n == 0) return 0
      val got = ObjectCache.readRange(conf, p, pos, n)
      System.arraycopy(got, 0, b, off, n)
      pos += n
      n
    }

    override def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int = {
      if (position >= len) return -1
      val n = math.min(length.toLong, len - position).toInt
      if (n == 0) return 0
      val got = ObjectCache.readRange(conf, p, position, n)
      System.arraycopy(got, 0, buffer, offset, n)
      n
    }

    override def close(): Unit = ()
  }
}
