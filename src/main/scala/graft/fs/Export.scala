package graft.fs

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._

import graft.core.RootFs

/** rootfs table → local tree export (the reference's `dump_all` local sink,
  * crates/cdl-fs/src/lib.rs:721-770): create dirs, seek to `chunk_offset`,
  * write bytes, then restore atime/mtime/mode and truncate to `size`.
  *
  * Scale design: ALL three passes run on executors via `foreachPartition`
  * — file creation/truncate (chunk-0 rows), positional chunk writes (each
  * chunk row carries its own (path, offset), so tasks write independently
  * with no shuffle or ordering requirement), then metadata restore. The
  * sequential jobs provide the barriers (no chunk write after its file's
  * mtime is restored). The driver never materializes a row. ctime is not
  * restorable on POSIX; the reference doesn't restore it either
  * (SURVEY §7.4.3).
  */
object Export {

  /** Keep only each path's LATEST append. The rootfs table is append-only,
    * so a re-uploaded file coexists with its older generations; exporting
    * all of them would let positional writes race nondeterministically
    * (the reference's dump streams scan_in_order so the later append
    * wins — crates/cdl-fs/src/lib.rs:721-770). An append's chunk rows
    * carry contiguous row_ids (base + chunk_id), so `row_id - chunk_id`
    * is a per-generation key; max per (parent, name) is the newest. One
    * hash-partitioned agg + equi-join — no windows, no driver state.
    * Unstamped legacy tables (null row_id) degrade to no dedupe. The
    * unstamped sentinel is -1 — BELOW any genuine generation (the
    * writeRootfs/fallbackStamped convention): 0 would collide with the
    * table's very first stamped append (row_id 0 − chunk_id 0), and a
    * later unstamped append of the same path would then TIE it instead
    * of losing, letting two generations' positional writes race. */
  private[fs] def latestGeneration(table: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val gen = table.withColumn("__gen",
      coalesce(col("row_id") - col("chunk_id"), lit(-1L)))
    val newest = gen.groupBy("parent", "name").agg(max("__gen").as("__gen"))
    gen.join(newest, Seq("parent", "name", "__gen")).drop("__gen")
  }

  def dumpAll(fs: CdlFs, destRoot: String): Unit = {
    val dest = Paths.get(destRoot).toAbsolutePath.normalize.toString
    Files.createDirectories(Paths.get(dest))
    val current = latestGeneration(fs.table)
    val files = current.filter(col("size").isNotNull)
      .select("parent", "name", "size", "mode", "atime", "mtime")

    // Pass 1: create every file at full size (createDirectories is
    // idempotent, so concurrent tasks sharing a parent dir are safe).
    files.select("parent", "name", "size")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val p = Paths.get(dest + r.getAs[String]("parent"), r.getAs[String]("name"))
          Files.createDirectories(p.getParent)
          val ch = java.nio.channels.FileChannel.open(
            p, StandardOpenOption.CREATE, StandardOpenOption.WRITE)
          try ch.truncate(r.getAs[Long]("size"))
          finally ch.close()
        }
      }

    // Pass 2: positional chunk payload writes. `data` is nullable in
    // the schema (an external writer may append metadata-only rows);
    // a null payload writes nothing — pass 1's truncate already sized
    // the file, so skipping is exactly the positional-write semantics.
    current
      .select("parent", "name", "chunk_offset", "data")
      .filter(col("data").isNotNull)
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val p = Paths.get(
            dest + r.getAs[String]("parent"), r.getAs[String]("name"))
          val ch = java.nio.channels.FileChannel.open(p, StandardOpenOption.WRITE)
          try ch.write(
            java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]]("data")),
            r.getAs[Long]("chunk_offset"))
          finally ch.close()
        }
      }

    // Pass 3: metadata restore, after every write has finished.
    files.select("parent", "name", "mode", "atime", "mtime")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val p = Paths.get(dest + r.getAs[String]("parent"), r.getAs[String]("name"))
          Option(r.getAs[java.sql.Timestamp]("mtime")).foreach(t =>
            Files.setLastModifiedTime(p, fileTimeMicros(t)))
          Option(r.getAs[Any]("mode")).foreach { m =>
            Files.setPosixFilePermissions(p, modeToPerms(m.asInstanceOf[Int]))
          }
          Option(r.getAs[java.sql.Timestamp]("atime")).foreach { t =>
            Files.getFileAttributeView(
              p, classOf[java.nio.file.attribute.BasicFileAttributeView])
              .setTimes(null, fileTimeMicros(t), null)
          }
        }
      }
  }

  /** Restore at the µs precision the ingest captured (fromMillis would
    * drop the Timestamp's sub-millisecond nanos). */
  private def fileTimeMicros(t: java.sql.Timestamp): FileTime =
    FileTime.from(
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L,
      java.util.concurrent.TimeUnit.MICROSECONDS)

  private[fs] def modeToPerms(mode: Int): java.util.Set[java.nio.file.attribute.PosixFilePermission] = {
    import java.nio.file.attribute.PosixFilePermission._
    val bits = Seq(
      0x100 -> OWNER_READ, 0x80 -> OWNER_WRITE, 0x40 -> OWNER_EXECUTE,
      0x20 -> GROUP_READ, 0x10 -> GROUP_WRITE, 0x8 -> GROUP_EXECUTE,
      0x4 -> OTHERS_READ, 0x2 -> OTHERS_WRITE, 0x1 -> OTHERS_EXECUTE)
    val set = new java.util.HashSet[java.nio.file.attribute.PosixFilePermission]()
    bits.foreach { case (bit, perm) => if ((mode & bit) != 0) set.add(perm) }
    set
  }
}
