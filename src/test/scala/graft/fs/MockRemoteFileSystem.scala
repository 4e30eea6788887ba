package graft.fs

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** A "remote" Hadoop scheme backed by local disk: everything goes
  * through the full `FileSystem` API (listing, create, open, rename)
  * exactly as s3a would — no java.nio shortcut is possible on a
  * `mock://` URI, and [[AtomicRename.isAtomic]] classifies the scheme
  * rename-less, so every swap fence takes its object-store path
  * (pointer flips, overwrite-PUT sidecars, mtime heartbeat sidecars).
  *
  * Lives in TEST sources (r19 ADVICE — a mock filesystem must not ride
  * the production classpath, where setting `fs.mock.impl` would
  * activate it), together with the scale soaks that drive it
  * ([[graft.Soak]]'s `ptr` family, [[graft.DeleteSoak]]'s pointer-store
  * cascade arm); soaks launch via `sbt "Test/runMain graft.Soak …"`,
  * which extends the main classpath with this tree. Statuses are
  * materialized eagerly because RawLocalFileSystem's lazy permission
  * loader assumes `file:` URIs. */
class MockRemoteFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mock:///")
  override def getScheme: String = "mock"

  /** Injectable per-op latency (r19 verdict #9): local disk answers
    * metadata ops in microseconds, a real object store in tens of
    * milliseconds — so pointer-churn race margins and GC cadences
    * measured on the raw mock carry local-disk timing. Conf keys
    * `fs.mock.latency.put.ms` (create/rename/delete — the PUT-shaped
    * mutations) and `fs.mock.latency.list.ms` (listStatus /
    * getFileStatus — LIST/HEAD) add a fixed sleep per call, default 0
    * (latency off; every pre-r20 use is unchanged). Read per-call from
    * the live conf so a soak can turn latency on for one phase. */
  private def napMs(key: String): Unit = {
    val conf = getConf
    if (conf != null) {
      val ms = conf.getLong(key, 0L)
      if (ms > 0L) Thread.sleep(ms)
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    napMs("fs.mock.latency.list.ms")
    super.listStatus(f).map(eager)
  }
  override def getFileStatus(f: Path): FileStatus = {
    napMs("fs.mock.latency.list.ms")
    eager(super.getFileStatus(f))
  }
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    napMs("fs.mock.latency.put.ms")
    // ATOMIC no-overwrite create (r20 — found by the repair-vs-GC race
    // test): RawLocalFileSystem implements overwrite=false as
    // exists-then-create, a TOCTOU two same-instant writers both pass —
    // but the contract this scheme MODELS is an object store's
    // conditional PUT (If-None-Match), which StoreLock's claim relies
    // on. Claim the path with the kernel's O_CREAT|O_EXCL first, then
    // open normally; a loser gets FileAlreadyExistsException exactly
    // like a failed conditional PUT.
    if (!overwrite) {
      val local = java.nio.file.Paths.get(f.toUri.getPath)
      if (local.getParent != null)
        java.nio.file.Files.createDirectories(local.getParent)
      try java.nio.file.Files.createFile(local)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"$f already exists (conditional PUT lost)")
      }
      super.create(f, permission, true, bufferSize, replication,
        blockSize, progress)
    } else
      super.create(f, permission, overwrite, bufferSize, replication,
        blockSize, progress)
  }
  override def rename(src: Path, dst: Path): Boolean = {
    napMs("fs.mock.latency.put.ms")
    super.rename(src, dst)
  }
  override def delete(f: Path, recursive: Boolean): Boolean = {
    napMs("fs.mock.latency.put.ms")
    super.delete(f, recursive)
  }

  private def eager(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime,
      if (s.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      "test", "test", s.getPath)
}
