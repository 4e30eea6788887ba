package graft.fs

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import graft.core.{DatasetCatalog, GlobalPath}
import org.apache.spark.sql.functions._

/** Copy-on-write DELETE (CdlFs.deleteWhere): the takedown path. The
  * contract under test — matching rows physically gone (bytes absent
  * from every data file, not just filtered), clean files carried over
  * untouched, kept rows' row_ids stable, version bumped, no-match is a
  * no-op. */
class DeleteSpec extends SparkSuite {

  /** Fresh table per test: ingest a 6-file tree whose payloads carry
    * distinctive byte markers we can grep the raw parquet files for. */
  private def freshFs(tag: String): CdlFs = {
    val root = Files.createTempDirectory(s"del-$tag").toString
    val fixture = s"$root/fixture"
    Files.createDirectories(Paths.get(s"$fixture/keepdir"))
    Files.createDirectories(Paths.get(s"$fixture/purgedir"))
    Files.write(Paths.get(s"$fixture/keepdir/a.txt"), "KEEPMARK-A".getBytes)
    Files.write(Paths.get(s"$fixture/keepdir/b.txt"), "KEEPMARK-B".getBytes)
    Files.write(Paths.get(s"$fixture/purgedir/secret1.txt"),
      "PURGEMARK-ONE".getBytes)
    Files.write(Paths.get(s"$fixture/purgedir/secret2.txt"),
      "PURGEMARK-TWO".getBytes)
    // multi-chunk file in the purge dir: every chunk row must go
    Files.write(Paths.get(s"$fixture/purgedir/big.bin"),
      Array.fill[Byte](2560)('Z'))
    Files.write(Paths.get(s"$fixture/c.txt"), "KEEPMARK-C".getBytes)
    val f = CdlFs.open(spark, DatasetCatalog(maxChunkSize = 1024),
      GlobalPath.parse(s"$root/ds").toOption.get)
    Ingest.run(f, fixture)
    f
  }

  private def rawBytes(fs: CdlFs): Array[Byte] = {
    val dir = Paths.get(fs.tableLocation)
    import scala.jdk.CollectionConverters._
    Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .flatMap(p => Files.readAllBytes(p).iterator)
      .toArray
  }

  private def containsMarker(hay: Array[Byte], marker: String): Boolean = {
    val m = marker.getBytes
    hay.indices.exists(i =>
      i + m.length <= hay.length && hay.slice(i, i + m.length).sameElements(m))
  }

  test("delete removes matching rows and their bytes; keeps the rest") {
    val fs = freshFs("basic")
    val before = fs.table.count()
    val v0 = fs.versions.max
    val deleted = fs.deleteWhere("parent = '/purgedir'")
    // secret1 + secret2 + big.bin's 3 chunk rows
    assert(deleted == 5)
    assert(fs.table.count() == before - 5)
    assert(fs.sql("SELECT * FROM rootfs WHERE parent = '/purgedir'").count() == 0)
    // version bumped, commit recorded
    assert(fs.versions.max == v0 + 1)
    // takedown is PHYSICAL: the payload bytes are gone from every file
    val raw = rawBytes(fs)
    assert(!containsMarker(raw, "PURGEMARK"))
    assert(containsMarker(raw, "KEEPMARK-A"))
    assert(containsMarker(raw, "KEEPMARK-C"))
  }

  test("clean files are carried over untouched (file-level pruning)") {
    val fs = freshFs("prune")
    import org.apache.hadoop.fs.Path
    val hconf = spark.sparkContext.hadoopConfiguration
    val beforeFiles = CommitLog.dataFilesWithLen(fs.tableLocation, hconf).toMap
    // ingest partitions by p0, so /keepdir rows live in files the
    // /purgedir predicate never touches
    val beforeTimes = beforeFiles.keys.map { rel =>
      val p = new Path(s"${fs.tableLocation}/$rel")
      rel -> p.getFileSystem(hconf).getFileStatus(p).getModificationTime
    }.toMap
    fs.deleteWhere("parent = '/purgedir' AND name = 'secret1.txt'")
    val afterFiles = CommitLog.dataFilesWithLen(fs.tableLocation, hconf).toMap
    val keepdirBefore = beforeFiles.keys.filter(_.contains("p0=keepdir"))
    assert(keepdirBefore.nonEmpty)
    keepdirBefore.foreach { rel =>
      // same file, same bytes, same mtime — never rewritten
      assert(afterFiles.get(rel).contains(beforeFiles(rel)))
      val p = new Path(s"${fs.tableLocation}/$rel")
      assert(p.getFileSystem(hconf).getFileStatus(p).getModificationTime ==
        beforeTimes(rel))
    }
    // the purgedir file WAS rewritten (old name gone)
    val purgedirBefore = beforeFiles.keys.filter(_.contains("p0=purgedir"))
    assert(purgedirBefore.exists(rel => !afterFiles.contains(rel)))
  }

  test("kept rows keep their row_id stamps; take stays consistent") {
    val fs = freshFs("stamps")
    val keptBefore = fs.table
      .filter(col("parent") =!= "/purgedir")
      .select("parent", "name", "chunk_id", "row_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    fs.deleteWhere("parent = '/purgedir'")
    val after = fs.table
      .select("parent", "name", "chunk_id", "row_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(after == keptBefore)
    // point lookup through take on a surviving ordinal
    val someId = keptBefore.values.head
    val got = fs.take(Seq(someId), Seq("parent", "name")).collect()
    assert(got.length == 1 && got.head.getLong(0) == someId)
  }

  test("row_id high-water mark survives delete: later appends never reuse ids") {
    val fs = freshFs("hwm")
    val hconf = spark.sparkContext.hadoopConfiguration
    val hwmBefore = CommitLog.latest(fs.tableLocation, hconf).get.rowCount
    fs.deleteWhere("parent = '/purgedir'")
    val hwmAfter = CommitLog.latest(fs.tableLocation, hconf).get.rowCount
    assert(hwmAfter == hwmBefore) // deleted ordinals retire, never free
    // append a new tree: its stamps start at the high-water mark
    val extraRoot = Files.createTempDirectory("del-hwm-extra").toString
    Files.write(Paths.get(s"$extraRoot/new.txt"), "NEWROW".getBytes)
    Ingest.run(fs, extraRoot)
    val newIds = fs.table.filter(col("name") === "new.txt")
      .select("row_id").collect().map(_.getLong(0))
    assert(newIds.nonEmpty && newIds.forall(_ >= hwmBefore))
  }

  test("no-match delete is a no-op: zero rows, no new version") {
    val fs = freshFs("nomatch")
    val v0 = fs.versions.max
    val n = fs.deleteWhere("name = 'does-not-exist.xyz'")
    assert(n == 0)
    assert(fs.versions.max == v0)
  }

  test("vacuum drops exactly the versions a delete made unreadable") {
    val fs = freshFs("vacuum")
    // v1 = ingest; append a second tree so v2's history is also live
    val extra = Files.createTempDirectory("del-vac-extra").toString
    Files.write(Paths.get(s"$extra/later.txt"), "LATERROW".getBytes)
    Ingest.run(fs, extra)
    val before = fs.versions
    assert(before.size >= 2)
    // nothing unreadable yet: vacuum is a no-op
    assert(fs.vacuumLog().isEmpty)
    assert(fs.versions == before)
    // the delete rewrites purgedir files listed by EVERY prior version
    fs.deleteWhere("parent = '/purgedir'")
    val dropped = fs.vacuumLog()
    assert(dropped.toSet == before.toSet) // all pre-delete versions gone
    val left = fs.versions
    assert(left.size == 1)
    // the surviving (latest) version stays readable via time travel
    assert(fs.tableAt(left.head).count() == fs.table.count())
    // idempotent
    assert(fs.vacuumLog().isEmpty)
  }

  test("crashed delete rolls forward on open: no duplicate kept rows") {
    // the r13 ADVICE window: rewrites moved in, sources not yet retired,
    // commit not yet written — before the pending marker this left
    // duplicate kept rows for the NEXT writer's commit to bake in.
    // Manufacture that exact state by hand, then prove open() heals it.
    val fs = freshFs("crash")
    import org.apache.hadoop.fs.Path
    val hconf = spark.sparkContext.hadoopConfiguration
    val loc = fs.tableLocation
    val before = fs.table.count()
    val v0 = fs.versions.max
    val touched = CommitLog.dataFilesWithLen(loc, hconf).map(_._1)
      .filter(_.contains("p0=purgedir"))
    assert(touched.nonEmpty)
    val hfs = new Path(loc).getFileSystem(hconf)
    // stage + move in the rewrite (kept rows of the touched files:
    // everything but secret1), as the crashed rename loop left it
    val stage = s"$loc/.graft_crash_stage"
    spark.read.parquet(touched.map(r => s"$loc/$r"): _*)
      .filter(col("name") =!= "secret1.txt")
      .coalesce(1).write.parquet(stage)
    val part = hfs.listStatus(new Path(stage))
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    assert(hfs.rename(part, new Path(s"$loc/p0=purgedir/${part.getName}")))
    hfs.delete(new Path(stage), true)
    // the pending marker (the delete's commit point): sources listed
    val out = hfs.create(new Path(s"$loc/.graft_delete_pending"), true)
    out.write(touched.mkString("\n").getBytes("UTF-8"))
    out.close()
    // the crash window is live: kept purgedir rows exist TWICE
    fs.refresh()
    assert(fs.table.count() > before)
    // open() sweeps: duplicates gone, the deleted row gone, commit written
    val healed = CdlFs.open(spark, DatasetCatalog(maxChunkSize = 1024), fs.root)
    assert(healed.table.count() == before - 1)
    assert(healed.sql(
      "SELECT * FROM rootfs WHERE name = 'secret1.txt'").count() == 0)
    assert(healed.table.groupBy("parent", "name", "chunk_id")
      .count().filter(col("count") > 1).count() == 0)
    assert(healed.versions.max == v0 + 1)
    assert(!hfs.exists(new Path(s"$loc/.graft_delete_pending")))
  }

  test("pre-marker crash discards the staging dir; table untouched") {
    val fs = freshFs("premarker")
    import org.apache.hadoop.fs.Path
    val hconf = spark.sparkContext.hadoopConfiguration
    val loc = fs.tableLocation
    val before = fs.table.count()
    val v0 = fs.versions.max
    val hfs = new Path(loc).getFileSystem(hconf)
    hfs.mkdirs(new Path(s"$loc/.graft_delete_tmp/p0=purgedir"))
    val healed = CdlFs.open(spark, DatasetCatalog(maxChunkSize = 1024), fs.root)
    assert(!hfs.exists(new Path(s"$loc/.graft_delete_tmp")))
    assert(healed.table.count() == before)
    assert(healed.versions.max == v0)
  }

  test("NULL condition keeps the row (SQL DELETE semantics)") {
    val fs = freshFs("nulls")
    val before = fs.table.count()
    // `size > 0` is NULL on chunk rows past chunk 0 (size rides chunk 0
    // only) — those rows must survive; only TRUE deletes
    val deleted = fs.deleteWhere("size = 2560")
    assert(deleted == 1) // big.bin's chunk-0 row only
    assert(fs.table.count() == before - 1)
    // the later chunks of big.bin are still there (condition was NULL)
    assert(fs.sql(
      "SELECT count(*) AS n FROM rootfs WHERE name = 'big.bin'")
      .collect().head.getLong(0) == 2)
  }
}
