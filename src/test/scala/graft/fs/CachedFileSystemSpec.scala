package graft.fs

import java.net.URI
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path

import graft.SparkSuite

/** Mock remote scheme that counts data-object `open` calls — the "remote
  * GET" ledger the cache assertions read. */
class CountingMockFs extends MockRemoteFileSystem {
  override def getUri: URI = URI.create("mockcnt:///")
  override def getScheme: String = "mockcnt"
  override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    CountingMockFs.opens.merge(f.getName, 1, (a, b) => a + b)
    super.open(f, bufferSize)
  }
}

object CountingMockFs {
  val opens = new java.util.concurrent.ConcurrentHashMap[String, Int]()
  def parquetOpens: Int =
    opens.asScala.filter(_._1.endsWith(".parquet")).values.sum
  def reset(): Unit = opens.clear()
}

/** Query-path read-through cache: `spark.read.parquet` over `cached://`
  * must hit the remote backend once per object and serve every later
  * scan from per-node local disk (the reference caches engine QUERY
  * reads, not just ingest — crates/cdl-store/src/lib.rs:183-243). */
class CachedFileSystemSpec extends SparkSuite {

  private def arm(cacheDir: String, minObject: Long): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.mockcnt.impl", classOf[CountingMockFs].getName)
    CachedFileSystem.install(hc, "mockcnt")
    hc.set(ObjectCache.DirKey, cacheDir)
    hc.setLong(ObjectCache.MinObjectKey, minObject)
    hc.setLong(ObjectCache.MaxSizeKey, 1L << 30)
  }

  test("second scan of a remote parquet table issues zero backend GETs") {
    val tmp = Files.createTempDirectory("cachedfs1").toString
    arm(s"$tmp/cache", minObject = 1)
    spark.range(20000).selectExpr("id", "id * 2 AS v")
      .repartition(3).write.parquet(s"$tmp/tbl")

    CountingMockFs.reset()
    val loc = s"cached-mockcnt://$tmp/tbl"
    assert(spark.read.parquet(loc).count() == 20000)
    val coldGets = CountingMockFs.parquetOpens
    assert(coldGets > 0, "first scan must pull from the backend")
    // the objects landed in the local cache dir
    assert(Files.list(Paths.get(s"$tmp/cache")).count() > 0)

    // scan 2 — including schema inference footer reads — is served
    // entirely from the cache: not one further backend open
    assert(spark.read.parquet(loc).count() == 20000)
    assert(spark.read.parquet(loc)
      .agg(org.apache.spark.sql.functions.sum("v")).collect()
      .head.getLong(0) == 20000L * 19999L)
    assert(CountingMockFs.parquetOpens == coldGets,
      s"second scan re-fetched from the backend: $coldGets -> ${CountingMockFs.parquetOpens}")
  }

  test("cached scheme returns identical data to the direct scheme") {
    val tmp = Files.createTempDirectory("cachedfs2").toString
    arm(s"$tmp/cache", minObject = 1)
    spark.range(5000).selectExpr("id", "CAST(id AS STRING) AS s")
      .write.parquet(s"$tmp/tbl")
    val direct = spark.read.parquet(s"$tmp/tbl")
      .orderBy("id").collect().toSeq
    val cached = spark.read.parquet(s"cached-mockcnt://$tmp/tbl")
      .orderBy("id").collect().toSeq
    assert(cached == direct)
  }

  test("below-threshold objects stream from the backend, not the cache") {
    val tmp = Files.createTempDirectory("cachedfs3").toString
    arm(s"$tmp/cache", minObject = 1L << 40) // nothing admits
    spark.range(100).write.parquet(s"$tmp/tbl")
    assert(spark.read.parquet(s"cached-mockcnt://$tmp/tbl").count() == 100)
    // no cache dir materialized: every read went straight through
    assert(!Files.isDirectory(Paths.get(s"$tmp/cache")) ||
      Files.list(Paths.get(s"$tmp/cache")).count() == 0)
  }

  test("single-byte reads are buffered: byte parity at bounded readRange cost") {
    // a generic (non-parquet) reader through the cached scheme goes
    // byte-at-a-time through InputStream.read(); unbuffered, that was one
    // full ObjectCache.readRange PER BYTE. The 8 KiB read-ahead must keep
    // parity while spending ~size/8192 ranges, not ~size.
    val tmp = Files.createTempDirectory("cachedfs6").toString
    arm(s"$tmp/cache", minObject = 1)
    val payload = Array.tabulate[Byte](40000)(i => ((i * 31 + 7) & 0xff).toByte)
    Files.write(Paths.get(s"$tmp/blob.bin"), payload)

    val hc = spark.sparkContext.hadoopConfiguration
    val p = new Path(s"cached-mockcnt://$tmp/blob.bin")
    val fs = p.getFileSystem(hc)
    val before = ObjectCache.rangeCalls.get()
    val in = fs.open(p)
    val got = new Array[Byte](payload.length)
    try {
      var i = 0
      var b = in.read()
      while (b >= 0) { got(i) = b.toByte; i += 1; b = in.read() }
      assert(i == payload.length)
    } finally in.close()
    assert(got.sameElements(payload), "single-byte path corrupted the stream")
    val spent = ObjectCache.rangeCalls.get() - before
    // 40000/8192 = 5 buffer fills (+1 slack for the admission path)
    assert(spent <= 6, s"single-byte reads cost $spent readRange calls (want <=6)")

    // and a seek back into the buffered window is served with NO new range
    val in2 = fs.open(p)
    try {
      assert(in2.read() == (payload(0) & 0xff))
      val mid = ObjectCache.rangeCalls.get()
      in2.seek(4000) // inside the first 8 KiB fill
      assert(in2.read() == (payload(4000) & 0xff))
      assert(ObjectCache.rangeCalls.get() == mid,
        "seek within the buffered window re-fetched")
    } finally in2.close()
  }

  test("route is a pure scheme prefix: URI-illegal path chars survive") {
    // a space in a partition value is legal on the filesystem; routing
    // must not throw on it or re-encode the path bytes
    assert(CachedFileSystem.route("s3a://b/p0=My Documents/x.parquet") ==
      "cached-s3a://b/p0=My Documents/x.parquet")
    intercept[IllegalArgumentException] {
      CachedFileSystem.route("/no/scheme/here")
    }
  }

  test("writes through the cached scheme land on the backend and invalidate") {
    val tmp = Files.createTempDirectory("cachedfs4").toString
    arm(s"$tmp/cache", minObject = 1)
    spark.range(10).write.parquet(s"cached-mockcnt://$tmp/tbl")
    // readable via BOTH schemes — the write was delegated to the backend
    assert(spark.read.parquet(s"$tmp/tbl").count() == 10)
    assert(spark.read.parquet(s"cached-mockcnt://$tmp/tbl").count() == 10)
  }

  test("local datasets scan raw file: paths; remote datasets scan cached://") {
    // the routing pin: CdlFs must never interpose the cache on a local
    // table (a cache copy of local disk is pure overhead) and must
    // always interpose it on a remote one
    val tmp = Files.createTempDirectory("cachedfs5").toString
    val tree = s"$tmp/tree"
    Files.createDirectories(Paths.get(tree))
    Files.write(Paths.get(s"$tree/a.txt"), "alpha".getBytes)

    val local = CdlFs.open(spark, graft.core.DatasetCatalog(),
      graft.core.GlobalPath.parse(s"$tmp/dsl").toOption.get)
    Ingest.run(local, tree)
    assert(local.table.inputFiles.nonEmpty)
    assert(local.table.inputFiles.forall(_.startsWith("file:")),
      local.table.inputFiles.toSeq.toString)

    spark.sparkContext.hadoopConfiguration
      .set("fs.mockcnt.impl", classOf[CountingMockFs].getName)
    graft.core.Scheme.registerHadoopScheme("mockcnt")
    val remote = CdlFs.open(spark, graft.core.DatasetCatalog(),
      graft.core.GlobalPath.parse(s"mockcnt://$tmp/dsr").toOption.get)
    Ingest.run(remote, tree)
    assert(remote.table.inputFiles.nonEmpty)
    assert(remote.table.inputFiles.forall(_.startsWith("cached-mockcnt:")),
      remote.table.inputFiles.toSeq.toString)
    // and the cached route reads the same rows the raw route holds
    assert(remote.table.count() ==
      spark.read.parquet(s"mockcnt://$tmp/dsr/rootfs").count())
  }
}
