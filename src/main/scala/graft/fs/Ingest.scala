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
    // data files land first, then the snapshot manifest — readers of a
    // committed version never observe a partial append (local tables;
    // remote object stores would commit through the Hadoop FS API)
    if (!location.contains("://") || location.startsWith("file:"))
      CommitLog.commit(location)
  }

  /** Ingest a local tree into a dataset's rootfs table. */
  def run(fs: CdlFs, localRoot: String): Unit = {
    val files = walk(localRoot)
    writeRootfs(rootfsRows(fs.spark, files, fs.catalog.maxChunkSize),
      fs.tableLocation)
    fs.refresh()
  }

  /** Fully-distributed ingest via the `binaryFile` source: executors do
    * BOTH the listing and the reading, so no driver walk bounds the job —
    * the path for 100 M-file trees on shared storage. Trade-off vs
    * `run()`: metadata fidelity is (mtime, size) only — binaryFile
    * exposes no atime/ctime/mode — and ZERO-BYTE files are invisible to
    * the source (Hadoop listing skips them); symlinks, which the
    * reference skips at ingest, are filtered executor-side. Use `run()`
    * when full POSIX fidelity matters. Chunking is declarative: explode
    * over chunk ids + binary substring. */
  def runDistributed(fs: CdlFs, localRoot: String): Unit = {
    import org.apache.spark.sql.functions._
    val rootAbs = Paths.get(localRoot).toAbsolutePath.normalize.toString
    val cs = if (fs.catalog.maxChunkSize > 0) fs.catalog.maxChunkSize
      else SafetyChunkSize
    val notSymlink = udf { (p: String) =>
      !Files.isSymbolicLink(Paths.get(new java.net.URI(p).getPath))
    }
    val bin = fs.spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true").load(rootAbs)
      .filter(notSymlink(col("path"))) // per-file metadata check, executor-side
    val rel = regexp_replace(col("path"), "^file:(//)?" +
      java.util.regex.Pattern.quote(rootAbs), "")
    val name = substring_index(rel, "/", -1)
    val parentLen = length(rel) - length(name) - 1
    val parent = when(parentLen <= 0, lit("/"))
      .otherwise(expr("substring(__rel, 1, __plen)"))
    val nChunks = (floor((greatest(col("size"), lit(1L)) - 1) / cs) + 1)
      .cast("long")
    val rows = bin
      .withColumn("__rel", rel).withColumn("__plen", parentLen)
      .select(
        name.as("name"), parent.as("parent"),
        col("modificationTime").cast("timestamp").as("mtime"),
        col("length").as("size"), col("content"))
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1)))
      .select(
        col("name"), col("parent"),
        lit(null).cast("timestamp").as("atime"),
        lit(null).cast("timestamp").as("ctime"),
        when(col("chunk_id") === 0, col("mtime")).cast("timestamp").as("mtime"),
        lit(null).cast("int").as("mode"),
        when(col("chunk_id") === 0, col("size")).as("size"),
        col("chunk_id"),
        (col("chunk_id") * cs).as("chunk_offset"),
        least(col("size") - col("chunk_id") * cs, lit(cs)).as("chunk_size"),
        // binaryFile caps files at 2 GiB, so int positions are safe
        expr(s"substring(content, CAST(chunk_id * ${cs}L + 1 AS INT), ${math.min(cs, Int.MaxValue).toInt})")
          .as("data"))
    writeRootfs(rows, fs.tableLocation)
    fs.refresh()
  }
}
