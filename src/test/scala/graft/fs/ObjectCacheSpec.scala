package graft.fs

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.scalatest.funsuite.AnyFunSuite

/** Mock remote FS whose data-object `open` rendezvouses two concurrent
  * callers: proves the cache's download locking is per-object, not
  * JVM-global (see the striped-lock test below). */
class BlockingMockFs extends MockRemoteFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mockblk:///")
  override def getScheme: String = "mockblk"
  override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    if (f.getName.endsWith(".blk"))
      BlockingMockFs.gate.await(10, java.util.concurrent.TimeUnit.SECONDS)
    super.open(f, bufferSize)
  }
}

object BlockingMockFs {
  val gate = new java.util.concurrent.CyclicBarrier(2)
}

/** Read-through cache semantics against the mock remote scheme (no Spark
  * needed — the cache is plain Hadoop-FS + local disk, exactly what runs
  * inside an executor). */
class ObjectCacheSpec extends AnyFunSuite {

  private def freshConf(cacheDir: String, min: Long, max: Long): Configuration = {
    val c = new Configuration()
    c.set("fs.mock.impl", classOf[MockRemoteFileSystem].getName)
    c.set(ObjectCache.DirKey, cacheDir)
    c.setLong(ObjectCache.MinObjectKey, min)
    c.setLong(ObjectCache.MaxSizeKey, max)
    c
  }

  test("large remote read caches the object; later reads are served locally") {
    val tmp = Files.createTempDirectory("oc1").toString
    val conf = freshConf(s"$tmp/cache", min = 512, max = 10L << 20)
    val backing = Paths.get(s"$tmp/obj.bin")
    Files.write(backing, Array.tabulate[Byte](2048)(_.toByte))
    val p = new Path(s"mock://$backing")

    val got = ObjectCache.readRange(conf, p, 100, 1024)
    assert(got.toSeq == Array.tabulate[Byte](2048)(_.toByte).slice(100, 1124).toSeq)
    val cached = Files.list(Paths.get(s"$tmp/cache")).toArray
    assert(cached.length == 1)

    // mutate the backend; a cache HIT must still serve the old bytes
    Files.write(backing, Array.fill[Byte](2048)(9))
    val again = ObjectCache.readRange(conf, p, 0, 600)
    assert(again.toSeq == Array.tabulate[Byte](2048)(_.toByte).take(600).toSeq)
  }

  test("below-threshold and local-scheme reads bypass the cache") {
    val tmp = Files.createTempDirectory("oc2").toString
    val conf = freshConf(s"$tmp/cache", min = 512, max = 10L << 20)
    val backing = Paths.get(s"$tmp/small.bin")
    Files.write(backing, Array.fill[Byte](256)(1))

    def cacheCount: Long =
      if (!Files.isDirectory(Paths.get(s"$tmp/cache"))) 0L
      else Files.list(Paths.get(s"$tmp/cache")).count()

    // small read on the remote scheme: direct, nothing cached
    val r1 = ObjectCache.readRange(conf, new Path(s"mock://$backing"), 0, 256)
    assert(r1.forall(_ == 1))
    assert(cacheCount == 0)
    // backend mutation is immediately visible (no stale cache copy)
    Files.write(backing, Array.fill[Byte](256)(2))
    assert(ObjectCache.readRange(conf, new Path(s"mock://$backing"), 0, 256)
      .forall(_ == 2))

    // big read on the LOCAL scheme: also direct (never cache file:)
    val big = Paths.get(s"$tmp/big.bin")
    Files.write(big, Array.fill[Byte](4096)(3))
    val r2 = ObjectCache.readRange(conf, new Path(s"file://$big"), 0, 4096)
    assert(r2.length == 4096)
    assert(cacheCount == 0)
  }

  test("concurrent pulls of DISTINCT objects run in parallel (striped lock)") {
    import java.util.concurrent.{Callable, Executors, TimeUnit}
    val tmp = Files.createTempDirectory("oc4").toString
    val conf = freshConf(s"$tmp/cache", min = 512, max = 10L << 20)
    conf.set("fs.mockblk.impl", classOf[BlockingMockFs].getName)
    val o1 = Paths.get(s"$tmp/o1.blk")
    val o2 = Paths.get(s"$tmp/o2.blk")
    Files.write(o1, Array.fill[Byte](1024)(1))
    Files.write(o2, Array.fill[Byte](1024)(2))
    val pool = Executors.newFixedThreadPool(2)
    try {
      val f1 = pool.submit(new Callable[Array[Byte]] {
        def call(): Array[Byte] =
          ObjectCache.readRange(conf, new Path(s"mockblk://$o1"), 0, 1024)
      })
      val f2 = pool.submit(new Callable[Array[Byte]] {
        def call(): Array[Byte] =
          ObjectCache.readRange(conf, new Path(s"mockblk://$o2"), 0, 1024)
      })
      // BlockingMockFs.open() rendezvouses the two downloads: both threads
      // must be INSIDE their pulls at the same time for the barrier to
      // release. A JVM-global download lock (the pre-r3 shape) holds one
      // thread outside open() while the other waits at the barrier —
      // timing out the await and failing both futures.
      assert(f1.get(30, TimeUnit.SECONDS).forall(_ == 1))
      assert(f2.get(30, TimeUnit.SECONDS).forall(_ == 2))
    } finally pool.shutdownNow()
    assert(Files.list(Paths.get(s"$tmp/cache")).count() == 2)
  }

  test("pre-store shrink evicts to the size bound") {
    val tmp = Files.createTempDirectory("oc3").toString
    val conf = freshConf(s"$tmp/cache", min = 100, max = 250)
    (0 until 5).foreach { i =>
      val backing = Paths.get(s"$tmp/o$i.bin")
      Files.write(backing, Array.fill[Byte](100)(i.toByte))
      val r = ObjectCache.readRange(conf, new Path(s"mock://$backing"), 0, 100)
      assert(r.forall(_ == i.toByte))
    }
    // shrink runs before each store: ≤ 250 bytes pre-existing + the new
    // object, so never more than 3 cached files
    val files = Files.list(Paths.get(s"$tmp/cache")).toArray
    assert(files.length <= 3, files.mkString(","))
  }
}
