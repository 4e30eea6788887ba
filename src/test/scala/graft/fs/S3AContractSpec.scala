package graft.fs

import java.net.URI
import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.SparkSuite

/** A mock remote FS hardened to the S3A behaviors the engine relies on
  * (reference premise: datasets live on object storage,
  * crates/cdl-fs/src/lib.rs:343-352, 805-820):
  *
  *  - `initialize` FAILS unless the Hadoop conf carries the expected
  *    `fs.s3a.endpoint` — so a test passing creds/endpoint only through
  *    `DatasetCatalog.storageOptions` proves the option mapping works by
  *    EFFECT (wrong endpoint ⇒ every FS op fails), not by key equality;
  *  - `rename` is COPY-then-DELETE, never atomic — S3A's semantics. The
  *    parquet job committer renames task files at commit, so an ingest
  *    over this scheme exercises the engine's independence from atomic
  *    rename end-to-end;
  *  - `readFully` past EOF throws (inherited) — asserted explicitly
  *    because the chunk reader and the cache's stale-copy recovery
  *    depend on it. */
class S3ASemanticsMockFs extends MockRemoteFileSystem {
  override def getUri: URI = URI.create("mocks3:///")
  override def getScheme: String = "mocks3"

  override def initialize(uri: URI, conf: Configuration): Unit = {
    val ep = conf.get("fs.s3a.endpoint")
    if (ep != S3AContractSpec.Endpoint)
      throw new java.io.IOException(
        s"endpoint unreachable: ${Option(ep).getOrElse("<unset>")}")
    super.initialize(uri, conf)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    val st = getFileStatus(src)
    if (st.isDirectory) {
      mkdirs(dst)
      listStatus(src).forall(c =>
        rename(c.getPath, new Path(dst, c.getPath.getName))) &&
        delete(src, true)
    } else {
      val in = open(src)
      try {
        val out = create(dst, true)
        try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
        finally out.close()
      } finally in.close()
      delete(src, false)
    }
  }
}

object S3AContractSpec {
  val Endpoint = "http://contract-endpoint:9000"
}

/** End-to-end contract over the hardened scheme: storage options honored
  * by effect, ingest through non-atomic renames, chunk reads through the
  * cache admission path, random access, listing consistency. */
class S3AContractSpec extends SparkSuite {

  private lazy val tmp = Files.createTempDirectory("s3acontract").toString

  private lazy val catalog = graft.core.DatasetCatalog(
    cacheDir = s"$tmp/cache",
    maxChunkSize = 1500,
    minCacheObjectSize = 1024,
    s3Endpoint = S3AContractSpec.Endpoint)

  /** Registers the scheme and — via CdlFs.open → storageOptions — the
    * endpoint the FS demands. Cache disabled so initialize() runs (and
    * validates) on every acquisition, like a fresh client per task. */
  private lazy val fs: CdlFs = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.mocks3.impl", classOf[S3ASemanticsMockFs].getName)
    hc.set("fs.mocks3.impl.disable.cache", "true")
    graft.core.Scheme.registerHadoopScheme("mocks3")
    CdlFs.open(spark, catalog,
      graft.core.GlobalPath.parse(s"mocks3://$tmp/ds").toOption.get)
  }

  test("wrong/missing endpoint makes the store unreachable (options matter by effect)") {
    val bare = new Configuration()
    bare.set("fs.mocks3.impl", classOf[S3ASemanticsMockFs].getName)
    bare.set("fs.mocks3.impl.disable.cache", "true")
    val e = intercept[java.io.IOException] {
      FileSystem.get(URI.create("mocks3:///"), bare)
    }
    assert(e.getMessage.contains("endpoint unreachable"))
    bare.set("fs.s3a.endpoint", "http://wrong-host:1234")
    val e2 = intercept[java.io.IOException] {
      FileSystem.get(URI.create("mocks3:///"), bare)
    }
    assert(e2.getMessage.contains("wrong-host"))
  }

  test("readFully past EOF throws — the contract chunk reads and cache recovery rely on") {
    fs // force open: endpoint now on the session conf
    val obj = Paths.get(s"$tmp/eof.bin")
    Files.write(obj, Array.fill[Byte](100)(1))
    val hfs = FileSystem.get(URI.create("mocks3:///"),
      spark.sparkContext.hadoopConfiguration)
    val in = hfs.open(new Path(s"mocks3://$obj"))
    try intercept[java.io.EOFException] {
      in.readFully(50, new Array[Byte](100)) // 50 + 100 > 100
    } finally in.close()
  }

  test("ingest → query → take over the hardened scheme, big object through cache admission") {
    val tree = s"$tmp/tree"
    Files.createDirectories(Paths.get(s"$tree/sub"))
    val big = Array.tabulate[Byte](4096)(i => (i % 251).toByte) // ≥ minObjectSize
    Files.write(Paths.get(s"$tree/big.bin"), big)
    Files.write(Paths.get(s"$tree/sub/small.txt"), "tiny".getBytes) // < min: direct

    // distributed ingest FROM the remote scheme: executor chunk reads go
    // through ObjectCache.readRange — big.bin admitted and pulled once
    Ingest.runDistributed(fs, s"mocks3://$tree")

    // non-atomic copy+delete renames happened inside the parquet job
    // commit; the committed listing must be consistent (no stray task
    // files, all data files visible)
    assert(fs.versions == Seq(1))
    val listed = fs.readDirAll().collect()
      .map(r => (r.getAs[String]("parent"), r.getAs[String]("name"))).toSeq
    assert(listed == Seq("/" -> "big.bin", "/sub" -> "small.txt"))

    // byte-exact payloads through chunked remote reads (1500/1500/1096)
    val got = fs.readFilesByCondition("name = 'big.bin'")
      .orderBy("chunk_id").collect()
      .flatMap(_.getAs[Array[Byte]]("data"))
    assert(got.toSeq == big.toSeq)

    // random access rides the persistent stamp (plain pruned filter)
    assert(fs.take(Seq(0L), Seq("name")).collect()
      .head.getAs[String]("name") == "big.bin")

    // admission: the ≥ minObjectSize ingest object is in the cache dir,
    // pulled WHOLE (4096 bytes); the small file read went direct. Since
    // r8 the QUERY path reads through the cache too (CdlFs.scanLocation
    // routes remote scans via cached-<scheme>://), so the rootfs parquet
    // part files the queries above scanned are legitimately cached
    // alongside it — but never the sub-threshold small.txt
    val cached = Files.list(Paths.get(s"$tmp/cache")).toArray.map(_.toString)
    val bigEntries = cached.filter(_.contains("big.bin"))
    assert(bigEntries.length == 1, cached.mkString(","))
    assert(Files.size(Paths.get(bigEntries.head)) == 4096)
    assert(!cached.exists(_.contains("small.txt")), cached.mkString(","))
    assert(cached.forall(f => f.contains("big.bin") || f.contains(".parquet")),
      cached.mkString(","))
  }

  test("deleteWhere/compact are gated on the rename-less scheme; override proceeds correctly") {
    // r16 verdict #1: the table mutations' source-retirement/layout
    // swaps are rename-fenced, which this scheme (copy+delete rename)
    // cannot honor for concurrent readers — they must fail loudly up
    // front, and proceed correctly once the operator opts in (readers
    // quiesced). Runs after the ingest test above (suite order), so the
    // table holds big.bin + sub/small.txt.
    fs.refresh()
    val e = intercept[IllegalStateException] { fs.deleteWhere("name = 'small.txt'") }
    assert(e.getMessage.contains("atomic") &&
      e.getMessage.contains(AtomicRename.OverrideKey), e.getMessage)
    val e2 = intercept[IllegalStateException] { fs.compact() }
    assert(e2.getMessage.contains("atomic"), e2.getMessage)
    // nothing staged, table intact
    assert(fs.readDirAll().count() == 2L)
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setBoolean(AtomicRename.OverrideKey, true)
    try {
      assert(fs.deleteWhere("name = 'small.txt'") == 1L)
      val listed = fs.readDirAll().collect().map(_.getAs[String]("name")).toSeq
      assert(listed == Seq("big.bin"), listed.mkString(","))
      // and the non-atomic-rename compact still commits a consistent layout
      fs.compact()
      val got = fs.readFilesByCondition("name = 'big.bin'")
        .orderBy("chunk_id").collect()
        .flatMap(_.getAs[Array[Byte]]("data"))
      assert(got.toSeq == Array.tabulate[Byte](4096)(i => (i % 251).toByte).toSeq)
    } finally hc.unset(AtomicRename.OverrideKey)
  }
}
