package graft.fs

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Path => JPath, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Read-through object cache for remote payload reads — the reference's
  * `CachedObjectStoreBackend` (crates/cdl-store/src/lib.rs:156-341):
  *
  *  - objects are cached ONLY when the requested read is at least
  *    `minObjectSize` (reference `threshold_object_size`, default 64 MiB) —
  *    small metadata reads go straight to the backend;
  *  - before storing, the cache shrinks to `maxCacheSize` (default
  *    32 GiB) by evicting files in the reference's BTreeSet `pop_last`
  *    order — (is_large, atime, len, path) descending — large and
  *    recently-pulled objects first;
  *  - local (`file:`) backends are never cached (a cache copy of a local
  *    file is pure overhead); the cache activates on remote schemes.
  *
  * The knobs travel via Hadoop conf keys (`graft.cache.*`) so EXECUTORS
  * apply them — the cache is per-executor-JVM local disk, which is
  * exactly the reference's per-node cache dir at cluster scale.
  */
object ObjectCache {

  val DirKey = "graft.cache.dir"
  val MinObjectKey = "graft.cache.min-object-size"
  val MaxSizeKey = "graft.cache.max-size"

  final case class Config(cacheDir: String, minObjectSize: Long, maxCacheSize: Long)

  /** Per-JVM memo of remote object sizes (admission verdicts). */
  private val sizeCache = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Count of `readRange` calls — a TEST hook pinning read amplification
    * (CachedFileSystemSpec's buffered single-byte contract); not product
    * surface. */
  private[fs] val rangeCalls = new java.util.concurrent.atomic.AtomicLong

  def configure(conf: Configuration, catalog: graft.core.DatasetCatalog): Unit = {
    conf.set(DirKey, catalog.cacheDir)
    conf.setLong(MinObjectKey, catalog.minCacheObjectSize)
    conf.setLong(MaxSizeKey, catalog.maxCacheSize)
  }

  def fromConf(conf: Configuration): Option[Config] =
    Option(conf.get(DirKey)).map(d =>
      Config(d,
        conf.getLong(MinObjectKey, 64L << 20),
        conf.getLong(MaxSizeKey, 32L << 30)))

  /** Ranged read through the cache. Admission is by OBJECT size (the
    * reference's `threshold_object_size` is a per-object minimum,
    * crates/cdl-store/src/lib.rs:109-117): a remote object ≥ the
    * threshold is pulled whole on first touch and every range — large or
    * small — is served locally afterwards; smaller objects and local
    * (`file:`) backends read directly. An already-cached object always
    * serves from cache (no per-range re-admission). */
  def readRange(conf: Configuration, p: Path, off: Long, len: Long): Array[Byte] = {
    rangeCalls.incrementAndGet()
    if (len <= 0L) return Array.emptyByteArray
    val scheme = Option(p.toUri.getScheme).getOrElse("file")
    val cfg = fromConf(conf)
    if (scheme == "file" || cfg.isEmpty) return readDirect(conf, p, off, len)
    val target = cachePath(cfg.get, p)
    val haveLocal = Files.exists(target)
    if (!haveLocal) {
      // one status RPC decides admission; the verdict is memoized so
      // chunk-by-chunk reads of millions of small objects don't pay a
      // per-read round-trip. Bounded: cleared wholesale if it ever grows
      // past ~64k entries (re-stat is cheap relative to leaking memory).
      val key = p.toString
      val objLen = sizeCache.get(key) match {
        case Some(l) => l
        case None =>
          val l = p.getFileSystem(conf).getFileStatus(p).getLen
          if (sizeCache.size > 65536) sizeCache.clear()
          sizeCache.put(key, l)
          l
      }
      if (objLen < cfg.get.minObjectSize) return readDirect(conf, p, off, len)
    }
    try readLocal(ensureCached(conf, cfg.get, p), p, off, len)
    catch {
      // a concurrent store's shrink may evict between ensureCached and
      // the read — re-pull once and retry before giving up
      case _: java.nio.file.NoSuchFileException =>
        readLocal(ensureCached(conf, cfg.get, p), p, off, len)
      // a short read means the CACHED copy is stale (the object grew
      // since it was pulled) — drop it so ensureCached re-downloads
      case _: java.io.EOFException =>
        Files.deleteIfExists(cachePath(cfg.get, p))
        readLocal(ensureCached(conf, cfg.get, p), p, off, len)
    }
  }

  private def readLocal(local: JPath, p: Path, off: Long, len: Long): Array[Byte] = {
    val ch = java.nio.channels.FileChannel.open(local)
    try {
      val buf = java.nio.ByteBuffer.allocate(len.toInt)
      var pos = off
      while (buf.hasRemaining) {
        val r = ch.read(buf, pos)
        if (r < 0) throw new java.io.EOFException(s"$p at $pos")
        pos += r
      }
      buf.array()
    } finally ch.close()
  }

  private def readDirect(conf: Configuration, p: Path, off: Long, len: Long): Array[Byte] = {
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](len.toInt)
      in.readFully(off, buf)
      buf
    } finally in.close()
  }

  /** Drop the cached copy (and memoized size) of `p`, if any — called by
    * write paths (`CachedFileSystem.create/rename/delete`) so a rewrite
    * through the cached scheme never serves stale bytes. Best-effort:
    * objects are write-once in the rootfs model, this is defense. */
  def invalidate(conf: Configuration, p: Path): Unit = {
    sizeCache.remove(p.toString)
    fromConf(conf).foreach(cfg => Files.deleteIfExists(cachePath(cfg, p)))
    ()
  }

  /** Cache-local path of an object: md5 of the full URI + the filename
    * (collision-safe and debuggable). */
  def cachePath(cfg: Config, p: Path): JPath = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(p.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Paths.get(cfg.cacheDir, s"$digest-${p.getName}")
  }

  /** Per-object download monitors, striped by cache path: concurrent
    * tasks pulling DISTINCT objects proceed fully in parallel (a JVM-wide
    * lock here would single-file an executor's whole admission path
    * behind one cold multi-GiB pull); two pulls of the SAME object
    * serialize, so the second serves from cache instead of re-
    * downloading. Bounded like sizeCache — and correctness never depends
    * on the monitor map: cross-process (and post-clear) races are already
    * safe via the unique-temp + atomic-move protocol. */
  private val pathLocks = scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Pull the object into the cache (if absent) and return its local
    * path. Shrinks first (reference store(), lib.rs:298-341). Download
    * goes to a UNIQUE temp name + atomic move: concurrent pullers — in
    * this JVM (other objects run in parallel; the same object is
    * serialized by its striped lock) or in a sibling executor process
    * sharing the cache dir — never observe a partial object; if two
    * writers race, each writes its own temp and the last atomic move
    * wins with a complete copy. shrink() may run concurrently from two
    * pulls: deletes are idempotent (deleteIfExists) and the size target
    * is re-checked per entry, so a concurrent shrink only over-evicts by
    * at most in-flight entries — never corrupts. */
  def ensureCached(conf: Configuration, cfg: Config, p: Path): JPath = {
    val target0 = cachePath(cfg, p)
    if (pathLocks.size > 65536) pathLocks.clear()
    val lock = pathLocks.getOrElseUpdate(target0.toString, new Object)
    lock.synchronized { ensureCachedLocked(conf, cfg, p) }
  }

  private def ensureCachedLocked(conf: Configuration, cfg: Config, p: Path): JPath = {
    val target = cachePath(cfg, p)
    if (Files.exists(target)) {
      Files.setAttribute(target, "lastAccessTime",
        FileTime.fromMillis(System.currentTimeMillis()))
      return target
    }
    shrink(cfg)
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(
      s"${target.getFileName}.${java.util.UUID.randomUUID()}.inflight")
    try {
      val fs = p.getFileSystem(conf)
      val in = fs.open(p)
      try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp) // failed downloads must not orphan temps
    target
  }

  /** Single-flight guard for eviction: downloads of distinct objects run
    * in parallel (striped locks above), but two concurrent shrinks would
    * race each other's deletes and double-evict. Serializing the (rare,
    * cheap) shrink keeps the hot path parallel. */
  private val shrinkLock = new Object

  /** Evict until total ≤ maxCacheSize, in the reference's pop_last order:
    * (is_large, atime, len, path) descending. */
  def shrink(cfg: Config): Unit = shrinkLock.synchronized {
    val root = Paths.get(cfg.cacheDir)
    if (!Files.isDirectory(root)) return
    // Files.list, NOT Files.walk: the cache dir is flat, and walk's
    // iterator stats every entry during traversal to decide recursion —
    // a concurrent puller's .inflight temp atomically moving away
    // between the directory listing and that stat threw
    // NoSuchFileException out of hasNext itself, past any per-entry
    // guard (hit for real by 32 query-path tasks pulling + shrinking)
    val stream = Files.list(root)
    val entries =
      try stream.iterator().asScala
        .filter(f => !f.getFileName.toString.endsWith(".inflight")) // in-flight downloads
        .flatMap { f =>
          // a SIBLING PROCESS sharing the cache dir may delete f between
          // the listing and the stat — skip, never throw out of a read
          try {
            if (!Files.isRegularFile(f)) None
            else {
              val len = Files.size(f)
              val atime = Files.readAttributes(f,
                classOf[java.nio.file.attribute.BasicFileAttributes])
                .lastAccessTime().toMillis
              Some((len >= cfg.minObjectSize, atime, len, f))
            }
          } catch { case _: java.io.IOException => None }
        }.toSeq
      finally stream.close()
    var total = entries.map(_._3).sum
    val order = entries.sortBy { case (isLarge, atime, len, path) =>
      (!isLarge, -atime, -len, path.toString)
    }
    val it = order.iterator
    while (total > cfg.maxCacheSize && it.hasNext) {
      val (_, _, len, path) = it.next()
      Files.deleteIfExists(path)
      total -= len
    }
  }
}
