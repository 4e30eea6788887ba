package graft.fs

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** Minimal append-only commit log over a parquet table directory,
  * providing snapshot isolation for readers and time travel — the
  * surfaced form of the versioning the reference's Lance tables carry but
  * never expose (SURVEY §2.3 "time-travel … never surfaced"; Delta/
  * Iceberg jars are unavailable in this environment, so the manifest is
  * self-contained JSON).
  *
  * Layout: `<table>/_graft_log/v%08d.json`, each listing the table's data
  * files as of that version (relative paths). Appends write data files
  * first, then the manifest — a reader of version N never sees a partial
  * append. Commit concurrency is last-writer-wins, matching the
  * reference's explicitly unsafe commit handler
  * (crates/cdl-catalog/src/lib.rs:241-243; SURVEY §7.4.6).
  */
object CommitLog {

  private val LogDir = "_graft_log"

  final case class Snapshot(version: Int, timestampMs: Long, files: Seq[String])

  private def logPath(tableLocation: String): Path =
    Paths.get(stripScheme(tableLocation), LogDir)

  private def stripScheme(loc: String): String =
    loc.stripPrefix("file://").stripPrefix("file:")

  /** All data files currently in the table directory, log-relative. */
  private def listDataFiles(tableLocation: String): Seq[String] = {
    val root = Paths.get(stripScheme(tableLocation))
    if (!Files.isDirectory(root)) return Seq.empty
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .filterNot(_.toString.contains(LogDir))
      .map(p => root.relativize(p).toString)
      .toSeq.sorted
  }

  def versions(tableLocation: String): Seq[Int] = {
    val dir = logPath(tableLocation)
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d{8}\\.json") =>
        s.substring(1, 9).toInt }
      .toSeq.sorted
  }

  def snapshot(tableLocation: String, version: Int): Option[Snapshot] = {
    val f = logPath(tableLocation).resolve(f"v$version%08d.json")
    if (!Files.exists(f)) None
    else {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readString(f))
      Some(Snapshot(
        node.get("version").asInt,
        node.get("timestamp_ms").asLong,
        node.get("files").elements().asScala.map(_.asText).toSeq))
    }
  }

  def latest(tableLocation: String): Option[Snapshot] =
    versions(tableLocation).lastOption.flatMap(snapshot(tableLocation, _))

  /** Record the table's current file set as the next version. Called
    * after each append's data files land. */
  def commit(tableLocation: String): Snapshot = {
    val dir = logPath(tableLocation)
    Files.createDirectories(dir)
    val version = versions(tableLocation).lastOption.getOrElse(0) + 1
    val files = listDataFiles(tableLocation)
    val json = new StringBuilder()
      .append("{\"version\":").append(version)
      .append(",\"timestamp_ms\":").append(System.currentTimeMillis())
      .append(",\"files\":[")
      .append(files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
        .mkString(","))
      .append("]}").toString
    Files.write(dir.resolve(f"v$version%08d.json"),
      json.getBytes(StandardCharsets.UTF_8))
    Snapshot(version, System.currentTimeMillis(), files)
  }

  /** Absolute paths of a snapshot's data files (for spark.read.parquet). */
  def snapshotFilePaths(tableLocation: String, version: Int): Seq[String] =
    snapshot(tableLocation, version) match {
      case None => throw new IllegalArgumentException(
        s"no version $version at $tableLocation")
      case Some(s) =>
        val root = stripScheme(tableLocation)
        s.files.map(f => s"$root/$f")
    }
}
