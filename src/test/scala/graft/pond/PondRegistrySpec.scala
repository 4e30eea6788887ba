package graft.pond

import java.nio.file.Files

import graft.SparkSuite
import PondRegistry._

/** Pond selection policy + the pull/push sync matrix (FIXTURES §A6;
  * reference optimizer/model_claim/mod.rs:107-133, object.rs:1202-1340). */
class PondRegistrySpec extends SparkSuite {

  private val ponds = Seq(
    Pond("a", "file:///tmp/pond-a", 100, 90), // 10 free
    Pond("b", "file:///tmp/pond-b", 100, 20), // 80 free
    Pond("c", "file:///tmp/pond-c", 100, 50)) // 50 free

  test("LowestCopy picks the pond with max available capacity") {
    assert(selectPond(ponds, 5).map(_.name) == Right("b"))
  }

  test("quota admission filters ponds below the request") {
    assert(selectPond(ponds, 60).map(_.name) == Right("b"))
    assert(selectPond(ponds, 85).isLeft)
  }

  test("Balanced / LowestLatency are declared but unimplemented (ref bail!)") {
    assert(selectPond(ponds, 1, BindingPolicy.Balanced).isLeft)
    assert(selectPond(ponds, 1, BindingPolicy.LowestLatency).isLeft)
  }

  test("sync matrix: pull OnCreate mirrors on bind; push OnDelete on unbind") {
    import spark.implicits._
    val root = Files.createTempDirectory("ponds").toString
    val src = Pond("src", s"$root/src", 1000, 0)
    val dst = Pond("dst", s"$root/dst", 1000, 0)
    Seq((1, "x"), (2, "y")).toDF("id", "v")
      .write.parquet(s"${src.rootUri}/ds1")

    val jobs = new SyncJobs(spark, graft.core.DatasetCatalog())
    val b = Binding("ds1", src, dst, PullPolicy.OnCreate, PushPolicy.OnDelete)
    assert(jobs.onBind(b) == Seq("pull:OnCreate"))
    assert(spark.read.parquet(s"${dst.rootUri}/ds1").count() == 2)

    // write new data into target, then unbind -> mirrored back
    Seq((3, "z")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"${dst.rootUri}/ds1")
    assert(jobs.onUnbind(b) == Seq("push:OnDelete"))
    assert(spark.read.parquet(s"${src.rootUri}/ds1").count() == 1)
  }

  test("sync matrix: pull Always mirrors on bind and push Always arms replication") {
    import spark.implicits._
    val root = Files.createTempDirectory("ponds2").toString
    val src = Pond("src", s"$root/src", 1000, 0)
    val dst = Pond("dst", s"$root/dst", 1000, 0)
    Seq((1, "x")).toDF("id", "v").write.parquet(s"${src.rootUri}/dsA")
    val jobs = new SyncJobs(spark, graft.core.DatasetCatalog())
    val acts = jobs.onBind(Binding("dsA", src, dst,
      PullPolicy.Always, PushPolicy.Always))
    assert(acts.toSet == Set("pull:Always", "push:replication-rule-armed"))
    assert(spark.read.parquet(s"${dst.rootUri}/dsA").count() == 1)

    // push-Always is continuous: a write to the working (target) copy
    // followed by the onWrite hook lands DATA at the source, not a marker
    Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"${dst.rootUri}/dsA")
    assert(jobs.onWrite("dsA") == Seq("push:Always"))
    assert(spark.read.parquet(s"${src.rootUri}/dsA").count() == 3)
    // tearing down an UNRELATED pull-only binding must not disarm the rule
    assert(jobs.onUnbind(Binding("dsA", src, dst,
      PullPolicy.OnCreate, PushPolicy.Never)).isEmpty)
    assert(jobs.onWrite("dsA") == Seq("push:Always"))
    // a SUPERSEDED push binding (different target) must not disarm the
    // currently-armed one
    val dst2 = Pond("dst2", s"$root/dst2", 1000, 0)
    jobs.onBind(Binding("dsA", src, dst2, PullPolicy.Never, PushPolicy.Always))
    assert(jobs.onUnbind(Binding("dsA", src, dst,
      PullPolicy.Always, PushPolicy.Always)).isEmpty) // old binding, old target
    Seq((9, "w")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"${dst2.rootUri}/dsA")
    assert(jobs.onWrite("dsA") == Seq("push:Always")) // still armed (dst2)
    assert(spark.read.parquet(s"${src.rootUri}/dsA").count() == 1)
    // unbinding the ARMED push binding itself disarms it
    assert(jobs.onUnbind(Binding("dsA", src, dst2,
      PullPolicy.Never, PushPolicy.Always)).isEmpty)
    assert(jobs.onWrite("dsA").isEmpty)
  }

  test("Cloned provisions AND seeds from the reference pond; Owned starts empty") {
    val root = Files.createTempDirectory("pondkind").toString
    val conf = spark.sparkContext.hadoopConfiguration
    // the reference store already holds data
    Files.createDirectories(java.nio.file.Paths.get(s"$root/ref/ds1"))
    Files.write(java.nio.file.Paths.get(s"$root/ref/ds1/part-0"), "seed".getBytes)

    val owned = provision(conf, "own", s"$root/own", StorageKind.Owned,
      quotaBytes = Some(1000))
    assert(owned.usedBytes == 0L && owned.capacityBytes == 1000L)
    assert(StorageKind.Owned.isUnique)

    // Cloned = provision + one-time mirror of the reference's content
    // (the site-replication join, object.rs:913-960 semantics)
    val cloned = provision(conf, "cln", s"$root/cln",
      StorageKind.Cloned(s"$root/ref"), quotaBytes = Some(1000))
    assert(cloned.usedBytes == 4L, cloned.toString) // "seed" arrived
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/cln/ds1/part-0"))) == "seed")
    assert(StorageKind.Cloned(s"$root/ref").isUnique)
  }

  test("Borrowed binds the external URI without provisioning anything") {
    val root = Files.createTempDirectory("pondborrow").toString
    val conf = spark.sparkContext.hadoopConfiguration
    Files.createDirectories(java.nio.file.Paths.get(s"$root/ext"))
    Files.write(java.nio.file.Paths.get(s"$root/ext/obj"), "abcde".getBytes)

    val b = provision(conf, "brw", s"$root/IGNORED",
      StorageKind.Borrowed(s"$root/ext"), quotaBytes = Some(100))
    assert(b.rootUri == s"$root/ext") // bound to the external store
    assert(b.usedBytes == 5L)
    // no directory was created for the ignored own-root
    assert(!Files.exists(java.nio.file.Paths.get(s"$root/IGNORED")))
    // and a borrowed store is shareable (not unique), per the reference
    assert(!StorageKind.Borrowed(s"$root/ext").isUnique)
  }

  test("measured selection runs LowestCopy on observed bytes, not declared ones") {
    val root = Files.createTempDirectory("pondmeasure").toString
    val conf = spark.sparkContext.hadoopConfiguration
    Files.createDirectories(java.nio.file.Paths.get(s"$root/a"))
    Files.createDirectories(java.nio.file.Paths.get(s"$root/b"))
    // disk truth: a holds 6000 bytes, b holds 1000
    Files.write(java.nio.file.Paths.get(s"$root/a/blob"), new Array[Byte](6000))
    Files.write(java.nio.file.Paths.get(s"$root/b/blob"), new Array[Byte](1000))

    val m = measure(conf, "a", s"$root/a", Some(10000))
    assert(m.usedBytes == 6000L && m.availableBytes == 4000L)

    // declared numbers would pick a (claims empty); measurement picks b
    val declared = Seq(
      Pond("a", s"$root/a", 10000, 0), Pond("b", s"$root/b", 10000, 5000))
    assert(selectPond(declared, 3000).map(_.name) == Right("a"))
    val picked = selectPondMeasured(conf,
      Seq(("a", s"$root/a", Some(10000L)), ("b", s"$root/b", Some(10000L))),
      3000)
    assert(picked.map(_.name) == Right("b"))
    // quota admission on measured bytes: nothing fits 9500
    assert(selectPondMeasured(conf,
      Seq(("a", s"$root/a", Some(10000L)), ("b", s"$root/b", Some(10000L))),
      9500).isLeft)
  }

  test("quota-less measure reads the store's global capacity (FsStatus)") {
    val root = Files.createTempDirectory("pondglobal").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val p = measure(conf, "g", s"$root", None)
    // local disk: capacity positive, used within [0, capacity]
    assert(p.capacityBytes > 0L)
    assert(p.usedBytes >= 0L && p.usedBytes <= p.capacityBytes)
  }

  test("sync matrix: pull Never / push Never do nothing") {
    val jobs = new SyncJobs(spark, graft.core.DatasetCatalog())
    val src = Pond("s", "file:///nonexistent-src", 1, 0)
    val dst = Pond("d", "file:///nonexistent-dst", 1, 0)
    val b = Binding("ds", src, dst, PullPolicy.Never, PushPolicy.Never)
    assert(jobs.onBind(b).isEmpty)   // would throw if it touched the paths
    assert(jobs.onUnbind(b).isEmpty)
  }
}
