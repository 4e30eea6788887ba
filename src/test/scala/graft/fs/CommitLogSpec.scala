package graft.fs

import java.net.URI
import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

import graft.SparkSuite

// MockRemoteFileSystem moved to MAIN sources (graft/fs/
// MockRemoteFileSystem.scala, r19) so the scale soaks can drive the
// rename-less contract via runMain; same FQN, all tests unchanged.

/** CommitLog over a NON-local scheme: snapshot isolation and time travel
  * must hold on the storage the reference was built for (datasets at
  * `s3://<name>/rootfs`, crates/cdl-fs/src/lib.rs:343-352). */
class CommitLogSpec extends SparkSuite {

  private def hconf = {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mock.impl", classOf[MockRemoteFileSystem].getName)
    spark.sparkContext.hadoopConfiguration
  }

  test("append + versions + time travel end-to-end over mock:// scheme") {
    val conf = hconf
    val tmp = Files.createTempDirectory("mocklog").toString
    val loc = s"mock://$tmp/rootfs"

    val treeA = s"$tmp/treeA"
    Files.createDirectories(Paths.get(treeA))
    Files.write(Paths.get(s"$treeA/a.txt"), "aaa".getBytes)
    val filesA = Ingest.walk(treeA)
    Ingest.writeRootfs(
      Ingest.rootfsRows(spark, filesA, 0L, 0L), loc,
      rowsAdded = Ingest.rowCount(filesA, 0L))

    assert(CommitLog.versions(loc, conf) == Seq(1))
    val v1 = CommitLog.snapshot(loc, 1, conf).get
    assert(v1.rowCount == 1 && v1.files.nonEmpty)

    val treeB = s"$tmp/treeB"
    Files.createDirectories(Paths.get(treeB))
    Files.write(Paths.get(s"$treeB/b.txt"), "bbbb".getBytes)
    val filesB = Ingest.walk(treeB)
    Ingest.writeRootfs(
      Ingest.rootfsRows(spark, filesB, 0L, v1.rowCount), loc,
      rowsAdded = Ingest.rowCount(filesB, 0L))

    assert(CommitLog.versions(loc, conf) == Seq(1, 2))
    assert(CommitLog.snapshot(loc, 2, conf).get.rowCount == 2)

    // snapshot isolation: v1 readers are unaffected by the later append
    val v1df = spark.read.parquet(CommitLog.snapshotFilePaths(loc, 1, conf): _*)
    assert(v1df.count() == 1)
    assert(v1df.select("name").collect().head.getString(0) == "a.txt")
    assert(spark.read.parquet(CommitLog.snapshotFilePaths(loc, 2, conf): _*)
      .count() == 2)
    // full table read over the remote scheme sees both appends
    assert(spark.read.parquet(loc).count() == 2)
  }

  test("full dataset lifecycle over the remote scheme: ingest, list, take, time travel") {
    val conf = hconf // registers fs.mock.impl on the shared session
    graft.core.Scheme.registerHadoopScheme("mock")
    val tmp = Files.createTempDirectory("mockds").toString
    val tree = s"$tmp/tree"
    Files.createDirectories(Paths.get(s"$tree/sub"))
    Files.write(Paths.get(s"$tree/a.txt"), "alpha".getBytes)
    Files.write(Paths.get(s"$tree/sub/b.txt"), "bb".getBytes)

    val gp = graft.core.GlobalPath.parse(s"mock://$tmp/dsm").toOption.get
    assert(!gp.isLocal)
    val fs = CdlFs.open(spark, graft.core.DatasetCatalog(), gp)
    assert(fs.tableLocation == s"mock://$tmp/dsm/rootfs")

    Ingest.run(fs, tree)
    assert(fs.readDir("/").collect().map(_.getAs[String]("name")).toSeq ==
      Seq("a.txt"))
    assert(fs.readDirAll().count() == 2)
    assert(new String(fs.readFilesByCondition("name = 'a.txt'")
      .collect().head.getAs[Array[Byte]]("data")) == "alpha")
    assert(fs.take(Seq(1L), Seq("name")).collect()
      .head.getAs[String]("name") == "b.txt")
    assert(fs.versions == Seq(1))

    // append a second tree; snapshot isolation must hold over mock://
    val tree2 = s"$tmp/tree2"
    Files.createDirectories(Paths.get(tree2))
    Files.write(Paths.get(s"$tree2/c.txt"), "ccc".getBytes)
    Ingest.run(fs, tree2)
    assert(fs.versions == Seq(1, 2))
    assert(fs.tableAt(1).count() == 2)
    assert(fs.tableAt(2).count() == 3)
    assert(fs.table.filter("name = 'c.txt'").collect()
      .head.getAs[Long]("row_id") == 2L) // append-monotonic stamp continues
  }

  test("distributed ingest reads a REMOTE source tree (listing + chunk reads via FS)") {
    hconf // ensure fs.mock.impl registered
    graft.core.Scheme.registerHadoopScheme("mock")
    val tmp = Files.createTempDirectory("mocksrc").toString
    val tree = s"$tmp/tree"
    Files.createDirectories(Paths.get(s"$tree/sub"))
    Files.write(Paths.get(s"$tree/a.bin"), Array.fill[Byte](2500)('x'))
    Files.write(Paths.get(s"$tree/sub/b.txt"), "bb".getBytes)
    Files.write(Paths.get(s"$tree/zero.bin"), Array.emptyByteArray)
    // HIDDEN files must be ingested like run()'s walk ingests them —
    // this is a filesystem COPY tool, and /.bashrc or a _SUCCESS
    // marker silently missing from an export is data loss. Spark's
    // binaryFile listing cannot see them (hardcoded hidden-path
    // filter), so the driver-side gap walk contributes them; the
    // non-empty dotfile proves its BYTES flow through the executor
    // read path too.
    Files.write(Paths.get(s"$tree/_SUCCESS"), Array.emptyByteArray)
    Files.write(Paths.get(s"$tree/sub/.hidden"), "dot".getBytes)

    val fs = CdlFs.open(spark,
      graft.core.DatasetCatalog(maxChunkSize = 1024),
      graft.core.GlobalPath.parse(s"$tmp/ds-remote-src").toOption.get)
    Ingest.runDistributed(fs, s"mock://$tree") // remote URI source

    val rows = fs.table
      .selectExpr("parent", "name", "chunk_id", "md5(data) AS h")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set(
      ("/", "a.bin", 0L), ("/", "a.bin", 1L), ("/", "a.bin", 2L),
      ("/", "zero.bin", 0L), ("/sub", "b.txt", 0L),
      ("/", "_SUCCESS", 0L), ("/sub", ".hidden", 0L)))
    // bytes round-trip through the remote read path — for the plainly
    // listed file AND the gap-walked hidden one
    assert(new String(fs.readFilesByCondition("name = 'b.txt'")
      .collect().head.getAs[Array[Byte]]("data")) == "bb")
    assert(new String(fs.readFilesByCondition("name = '.hidden'")
      .collect().head.getAs[Array[Byte]]("data")) == "dot")
  }

  test("a data file with a control char in its name does not wedge the log") {
    val conf = hconf
    val tmp = Files.createTempDirectory("ctrlname").toString
    val loc = s"$tmp/rootfs"
    Files.createDirectories(Paths.get(loc))
    // legal POSIX filename an EXTERNAL writer could drop in; the
    // manifest serializer must escape it or every later read throws
    Files.write(Paths.get(loc, "bad\nname.parquet"), "junk".getBytes)
    val snap = CommitLog.commit(loc, 0L, conf)
    assert(snap.files.exists(_.contains("bad\nname")))
    // the round-trip is the point: a torn serializer parses nothing
    val back = CommitLog.snapshot(loc, snap.version, conf).get
    assert(back.files == snap.files)
  }

  test("manifests exclude in-flight _temporary and hidden work files") {
    val conf = hconf
    val tmp = Files.createTempDirectory("mocktmp").toString
    val loc = s"mock://$tmp/rootfs"
    val tree = s"$tmp/tree"
    Files.createDirectories(Paths.get(tree))
    Files.write(Paths.get(s"$tree/x.txt"), "x".getBytes)
    val files = Ingest.walk(tree)
    Ingest.writeRootfs(Ingest.rootfsRows(spark, files, 0L, 0L), loc,
      rowsAdded = 1L)

    // simulate a concurrent append's in-flight task files
    Files.createDirectories(Paths.get(s"$tmp/rootfs/_temporary/0/t0"))
    Files.write(Paths.get(s"$tmp/rootfs/_temporary/0/t0/part-0.parquet"),
      "junk".getBytes)
    Files.write(Paths.get(s"$tmp/rootfs/.part-1.parquet.crc"), "junk".getBytes)

    val snap = CommitLog.commit(loc, 0L, conf)
    assert(snap.files.nonEmpty)
    assert(!snap.files.exists(_.contains("_temporary")), snap.files)
    assert(!snap.files.exists(_.split("/").exists(_.startsWith("."))), snap.files)
    // the captured snapshot still reads cleanly
    assert(spark.read.parquet(
      CommitLog.snapshotFilePaths(loc, snap.version, conf): _*).count() == 1)
  }
}
