package graft.fs

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Minimal append-only commit log over a parquet table directory,
  * providing snapshot isolation for readers and time travel — the
  * surfaced form of the versioning the reference's Lance tables carry but
  * never expose (SURVEY §2.3 "time-travel … never surfaced"; Delta/
  * Iceberg jars are unavailable in this environment, so the manifest is
  * self-contained JSON).
  *
  * All I/O goes through the Hadoop `FileSystem` API, so the log works
  * identically on `file:`, `s3a:`, or any registered scheme — the
  * reference's datasets live at `s3://<name>/rootfs`
  * (crates/cdl-fs/src/lib.rs:343-352) and its commit append is at
  * lib.rs:822-853.
  *
  * Layout: `<table>/_graft_log/v%08d.json`, each listing the table's data
  * files as of that version (relative paths) plus the cumulative
  * `row_count` (the base ordinal for the next append's `row_id` stamp).
  * Appends write data files first, then the manifest — a reader of
  * version N never sees a partial append. In-flight `_temporary` task
  * files and dot-prefixed work files are excluded from manifests, so a
  * concurrent append can never leak paths that job commit will rename
  * away. Commit concurrency is last-writer-wins, matching the
  * reference's explicitly unsafe commit handler
  * (crates/cdl-catalog/src/lib.rs:241-243; SURVEY §7.4.6).
  */
object CommitLog {

  private val LogDir = "_graft_log"

  final case class Snapshot(
      version: Int,
      timestampMs: Long,
      rowCount: Long,
      files: Seq[String])

  private def open(tableLocation: String, conf: Configuration): (FileSystem, Path) = {
    val p = new Path(tableLocation)
    (p.getFileSystem(conf), p)
  }

  /** All data files currently in the table directory, root-relative.
    * Skips the log dir, Spark/Hadoop `_temporary` job attempt dirs, and
    * hidden (`.`/`_`-prefixed) work files anywhere on the path. */
  def dataFiles(
      tableLocation: String,
      conf: Configuration = new Configuration()): Seq[String] =
    dataFilesWithLen(tableLocation, conf).map(_._1)

  /** Same listing with each file's length — the statuses the recursive
    * list returns already carry it, and a caller that re-stats N files
    * one by one to size a compaction pays N serial metadata RPCs for
    * information this ONE pass had in hand. */
  def dataFilesWithLen(
      tableLocation: String,
      conf: Configuration = new Configuration()): Seq[(String, Long)] = {
    val (fs, root) = open(tableLocation, conf)
    listDataFiles(fs, root)
  }

  private def listDataFiles(fs: FileSystem, root: Path): Seq[(String, Long)] = {
    if (!fs.exists(root)) return Seq.empty
    val rootUri = root.toUri.getPath.stripSuffix("/")
    val out = Seq.newBuilder[(String, Long)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      val segs = rel.split("/")
      val hidden = segs.exists(s => s.startsWith(".") || s == "_temporary") ||
        segs.head == LogDir
      if (!hidden && rel.endsWith(".parquet")) out += ((rel, st.getLen))
    }
    out.result().sortBy(_._1)
  }

  def versions(tableLocation: String, conf: Configuration = new Configuration()): Seq[Int] = {
    val (fs, root) = open(tableLocation, conf)
    val dir = new Path(root, LogDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.matches("v\\d{8}\\.json") => s.substring(1, 9).toInt }
      .sorted
  }

  def snapshot(
      tableLocation: String,
      version: Int,
      conf: Configuration = new Configuration()): Option[Snapshot] = {
    val (fs, root) = open(tableLocation, conf)
    val f = new Path(new Path(root, LogDir), f"v$version%08d.json")
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      val body =
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      import scala.jdk.CollectionConverters._
      Some(Snapshot(
        node.get("version").asInt,
        node.get("timestamp_ms").asLong,
        Option(node.get("row_count")).map(_.asLong).getOrElse(0L),
        node.get("files").elements().asScala.map(_.asText).toSeq))
    }
  }

  def latest(
      tableLocation: String,
      conf: Configuration = new Configuration()): Option[Snapshot] =
    versions(tableLocation, conf).lastOption
      .flatMap(snapshot(tableLocation, _, conf))

  /** Record the table's current file set as the next version.
    * `rowsAdded` is this append's row count; the manifest carries the
    * cumulative total so the next append knows its base ordinal without
    * scanning the table. Called after the append's data files land. */
  def commit(
      tableLocation: String,
      rowsAdded: Long,
      conf: Configuration = new Configuration()): Snapshot = {
    val (fs, root) = open(tableLocation, conf)
    val dir = new Path(root, LogDir)
    fs.mkdirs(dir)
    val prev = latest(tableLocation, conf)
    val version = prev.map(_.version).getOrElse(0) + 1
    val rowCount = prev.map(_.rowCount).getOrElse(0L) + rowsAdded
    val files = listDataFiles(fs, root).map(_._1)
    val ts = System.currentTimeMillis()
    // serialize with Jackson (the same mapper snapshot() reads with):
    // hand-rolled escaping missed control characters, which are legal
    // in POSIX filenames an EXTERNAL writer may have dropped into the
    // table — one such path would wedge every later read of the log
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("version", version)
    node.put("timestamp_ms", ts)
    node.put("row_count", rowCount)
    val arr = node.putArray("files")
    files.foreach(arr.add)
    val json = mapper.writeValueAsString(node)
    // temp-write + atomic rename (the StoreLock.atomicRewrite pattern):
    // a crash mid-write must not leave a torn manifest — versions()
    // would list it and every snapshot()/latest() (and therefore every
    // later commit, stamp, and compact) would throw until someone
    // deletes the file by hand. The `_`-prefixed temp is invisible to
    // both versions() (name regex) and parquet discovery.
    val dst = new Path(dir, f"v$version%08d.json")
    // sweep orphaned temp files first (the writeManifest pattern): a
    // crashed commit's _v<N>.tmp-<pid> would otherwise sit in the log
    // dir forever, and a LATER process that drew the same pid at the
    // same version would silently overwrite it mid-write. Safe to
    // delete unconditionally: commit is single-writer by contract (a
    // concurrent commit already races the version rename itself), so
    // any tmp present here is a dead writer's
    fs.listStatus(dir)
      .filter(_.getPath.getName.startsWith("_v"))
      .filter(_.getPath.getName.contains(".tmp-"))
      .foreach(s => fs.delete(s.getPath, false))
    val tmp = new Path(dir, s"_v$version.tmp-${ProcessHandle.current().pid()}")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, dst), s"manifest rename failed: $tmp -> $dst")
    Snapshot(version, ts, rowCount, files)
  }

  /** Drop snapshot manifests that are no longer READABLE — versions
    * referencing at least one data file a later compact or delete
    * physically removed (both document that trade: OPTIMIZE+VACUUM(0) /
    * takedown semantics). Such a version's `tableAt` already fails at
    * scan time with a missing-file error; vacuuming turns the confusing
    * late failure into an honest absent version. The LATEST version is
    * kept unconditionally (it lists the live file set by construction),
    * and readable history — appends nothing rewrote — survives, so time
    * travel over intact versions is untouched. Single-writer contract,
    * like `commit`. Returns the dropped version numbers. */
  def vacuum(
      tableLocation: String,
      conf: Configuration = new Configuration()): Seq[Int] = {
    val (fs, root) = open(tableLocation, conf)
    val vs = versions(tableLocation, conf)
    if (vs.size <= 1) return Nil
    val present = listDataFiles(fs, root).map(_._1).toSet
    val dropped = vs.init.filter { v =>
      snapshot(tableLocation, v, conf)
        .exists(s => !s.files.forall(present.contains))
    }
    val dir = new Path(root, LogDir)
    dropped.foreach(v => fs.delete(new Path(dir, f"v$v%08d.json"), false))
    dropped
  }

  /** Fully-qualified paths of a snapshot's data files (for
    * spark.read.parquet) — scheme preserved, so time travel works on
    * object stores too. */
  def snapshotFilePaths(
      tableLocation: String,
      version: Int,
      conf: Configuration = new Configuration()): Seq[String] =
    snapshot(tableLocation, version, conf) match {
      case None => throw new IllegalArgumentException(
        s"no version $version at $tableLocation")
      case Some(s) =>
        val base = tableLocation.stripSuffix("/")
        s.files.map(f => s"$base/$f")
    }
}
