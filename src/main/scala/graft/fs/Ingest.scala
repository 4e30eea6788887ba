package graft.fs

import java.nio.file.attribute.PosixFileAttributeView
import java.nio.file.{Files, LinkOption, Path, Paths}
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core._

/** Local tree → rootfs table ingest (the reference's `load_all` +
  * `dump_all_to_s3` pipeline, crates/cdl-fs/src/lib.rs:593-770,822-882).
  *
  * Scale design: the DRIVER only walks the directory tree and collects
  * per-file metadata (cheap: one stat per file — same cost the reference
  * pays single-threaded). File BYTES are read on EXECUTORS: the metadata
  * list is parallelized, each task reads its files from shared storage and
  * emits chunk rows via an iterator (never holding more than one chunk in
  * memory), and the parquet writer streams them out. Chunking bounds row
  * size (`maxChunkSize`), so a 100 GiB file becomes N bounded rows instead
  * of one unwritable row — the reference's chunk semantics
  * (crates/cdl-fs/src/lib.rs:666-697) double as our executor-memory bound.
  */
object Ingest {

  /** Per-file metadata captured on the driver walk (reference captures
    * atime/ctime/mtime/mode/size at crates/cdl-fs/src/lib.rs:628-664). */
  final case class FileMeta(
      absPath: String,
      name: String,
      parent: String,
      atimeMicros: Long,
      ctimeMicros: Long,
      mtimeMicros: Long,
      mode: Int,
      size: Long)

  /** Walk a local tree. Regular files only: symlinks and special files are
    * skipped (reference: crates/cdl-fs/src/lib.rs:611-613). `parent` is the
    * directory relative to `root`, `/`-rooted (reference: lib.rs:619-626). */
  def walk(root: String): Seq[FileMeta] = {
    val rootPath = Paths.get(root).toAbsolutePath.normalize
    def micros(ft: java.nio.file.attribute.FileTime): Long = ft.toMillis * 1000L
    Files.walk(rootPath).iterator().asScala
      .filter(p => Files.isRegularFile(p, LinkOption.NOFOLLOW_LINKS))
      .map { p =>
        val rel = rootPath.relativize(p)
        val parent = Option(rel.getParent)
          .map(pp => "/" + pp.toString).getOrElse("/")
        val attrs = Files.readAttributes(
          p, classOf[java.nio.file.attribute.PosixFileAttributes],
          LinkOption.NOFOLLOW_LINKS)
        val mode = posixMode(p)
        FileMeta(
          p.toString, rel.getFileName.toString, parent,
          micros(attrs.lastAccessTime), micros(attrs.creationTime),
          micros(attrs.lastModifiedTime), mode, attrs.size)
      }
      .toSeq.sortBy(m => (m.parent, m.name))
  }

  private def posixMode(p: Path): Int = {
    import java.nio.file.attribute.PosixFilePermission._
    val perms = Files.getPosixFilePermissions(p, LinkOption.NOFOLLOW_LINKS).asScala
    val bits = Seq(
      OWNER_READ -> 0x100, OWNER_WRITE -> 0x80, OWNER_EXECUTE -> 0x40,
      GROUP_READ -> 0x20, GROUP_WRITE -> 0x10, GROUP_EXECUTE -> 0x8,
      OTHERS_READ -> 0x4, OTHERS_WRITE -> 0x2, OTHERS_EXECUTE -> 0x1)
    bits.collect { case (perm, bit) if perms.contains(perm) => bit }
      .foldLeft(0x8000)(_ | _) // S_IFREG
  }

  /** Hard ceiling applied when chunking is disabled: a single rootfs row
    * cannot exceed JVM array limits (and shouldn't approach executor
    * memory), so files larger than this are chunked regardless. The
    * reference leaves chunking off and would build an unbounded row
    * (SURVEY §7.4.1 documents this divergence). */
  val SafetyChunkSize: Long = 256L << 20 // 256 MiB

  /** Build the rootfs rows DataFrame for a walked tree. Bytes are read on
    * executors; metadata rides only on chunk 0 (reference `metadata.take()`,
    * crates/cdl-fs/src/lib.rs:687). */
  def rootfsRows(spark: SparkSession, files: Seq[FileMeta], maxChunkSize0: Long): DataFrame = {
    import spark.implicits._
    val maxChunkSize =
      if (maxChunkSize0 > 0) maxChunkSize0 else SafetyChunkSize
    val parallelism = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    val rows = spark.sparkContext.parallelize(files, parallelism).flatMap { m =>
      val layout = RootFs.chunkLayout(m.size, maxChunkSize)
      val ch = java.nio.channels.FileChannel.open(Paths.get(m.absPath))
      val it = layout.iterator.map { case (id, off, len) =>
        val buf = java.nio.ByteBuffer.allocate(len.toInt)
        ch.position(off)
        var read = 0
        while (read < len && ch.read(buf) >= 0) read = buf.position()
        val first = id == 0L
        RootFs.FileRecord(
          m.name, m.parent,
          if (first) Some(new Timestamp(m.atimeMicros / 1000)) else None,
          if (first) Some(new Timestamp(m.ctimeMicros / 1000)) else None,
          if (first) Some(new Timestamp(m.mtimeMicros / 1000)) else None,
          if (first) Some(m.mode) else None,
          if (first) Some(m.size) else None,
          id, off, len, buf.array())
      }
      // close the channel after the last chunk is consumed
      new Iterator[RootFs.FileRecord] {
        def hasNext: Boolean = { val h = it.hasNext; if (!h) ch.close(); h }
        def next(): RootFs.FileRecord = it.next()
      }
    }
    spark.createDataset(rows).toDF()
  }

  /** Top-level directory segment of `parent` — the rootfs partition key.
    * Partitioning by the first path segment keeps partition cardinality
    * bounded (top-level dirs, not full paths) while letting `read_dir`
    * and prefix queries prune entire partitions at 100 TB. */
  def topSegment(parent: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val seg = split(parent, "/").getItem(1)
    when(seg.isNull || seg === "", lit("_root")).otherwise(seg)
  }

  /** Append rootfs rows to a table location, hive-partitioned by `p0`
    * (append-only — the reference write path is WriteMode::Append at
    * crates/cdl-fs/src/lib.rs:831). */
  def writeRootfs(rows: DataFrame, location: String): Unit = {
    import org.apache.spark.sql.functions.col
    rows.withColumn("p0", topSegment(col("parent")))
      .write.mode("append").partitionBy("p0").parquet(location)
  }

  /** Ingest a local tree into a dataset's rootfs table. */
  def run(fs: CdlFs, localRoot: String): Unit = {
    val files = walk(localRoot)
    writeRootfs(rootfsRows(fs.spark, files, fs.catalog.maxChunkSize),
      fs.tableLocation)
    fs.refresh()
  }
}
