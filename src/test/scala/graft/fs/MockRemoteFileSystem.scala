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
  * Lives in MAIN sources (moved from the test tree in r19) because the
  * scale soaks ([[graft.Soak]]'s `ptr` family, [[graft.DeleteSoak]]'s
  * pointer-store cascade arm) drive the rename-less contract at soak
  * factors via `runMain`, where test classes are off the classpath.
  * Statuses are materialized eagerly because RawLocalFileSystem's lazy
  * permission loader assumes `file:` URIs. */
class MockRemoteFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mock:///")
  override def getScheme: String = "mock"
  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(eager)
  override def getFileStatus(f: Path): FileStatus =
    eager(super.getFileStatus(f))
  private def eager(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime,
      if (s.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      "test", "test", s.getPath)
}
