package graft

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** The py4j-facing bridge exercised exactly as the Python wrapper calls
  * it: java.util collections in, DataFrames/Java collections out
  * (scripts/cdlake.py is the consumer; python_api_demo.py drives it
  * end-to-end from a real pyspark gateway). */
class PyBridgeSpec extends SparkSuite {

  import scala.jdk.CollectionConverters._

  test("open → ingest → take → versions → storageOptions round-trip") {
    val root = Files.createTempDirectory("pybridge").toString
    val tree = s"$root/tree"
    Files.createDirectories(Paths.get(tree))
    Files.write(Paths.get(s"$tree/a.txt"), "alpha".getBytes)
    Files.write(Paths.get(s"$tree/b.txt"), "bb".getBytes)

    // kwargs arrive as a java.util.Map from py4j — snake_case keys
    val opts = Map("max_chunk_size" -> "1024", "s3_region" -> "eu-test").asJava
    val fs = PyBridge.open(spark, s"$root/ds", opts)
    assert(fs.catalog.maxChunkSize == 1024L)

    PyBridge.ingest(fs, tree)
    assert(PyBridge.versions(fs).asScala.toSeq == Seq(Int.box(1)))

    // indices arrive as java.lang.Numbers of py4j-chosen width
    val idx: java.util.List[java.lang.Number] =
      Seq[java.lang.Number](Int.box(0), Long.box(1L)).asJava
    val got = PyBridge.take(fs, idx, Seq("name").asJava)
      .orderBy("row_id").collect().map(_.getAs[String]("name")).toSeq
    assert(got == Seq("a.txt", "b.txt"))

    // storage options surface the catalog's S3A mapping for handoff
    val so = PyBridge.storageOptions(fs).asScala
    assert(so("fs.s3a.endpoint.region") == "eu-test")

    // unknown catalog kwargs must raise, like the reference's strict merge
    intercept[RuntimeException] {
      PyBridge.open(spark, s"$root/ds2", Map("no_such_key" -> "1").asJava)
    }
  }

  test("copyTo appends into a table dataset via the bridge") {
    val root = Files.createTempDirectory("pybridge2").toString
    val tree = s"$root/tree"
    Files.createDirectories(Paths.get(tree))
    Files.write(Paths.get(s"$tree/x.txt"), "x".getBytes)
    val fs = PyBridge.open(spark, s"$root/ds", new java.util.HashMap())
    PyBridge.ingest(fs, tree)
    Files.createDirectories(Paths.get(s"$root/ds2/rootfs"))
    PyBridge.copyTo(fs, s"$root/ds2")
    val fs2 = PyBridge.open(spark, s"$root/ds2", new java.util.HashMap())
    assert(fs2.table.count() == 1)
    // unregistered scheme -> parse error surfaces as IllegalArgument
    intercept[IllegalArgumentException] { PyBridge.copyTo(fs, "bogus://x/y") }
  }

  test("compact via the bridge reduces files and keeps rows") {
    val root = Files.createTempDirectory("pybridge3").toString
    val tree = s"$root/tree"
    Files.createDirectories(Paths.get(tree))
    (1 to 4).foreach(i =>
      Files.write(Paths.get(s"$tree/f$i.txt"), s"payload $i".getBytes))
    val fs = PyBridge.open(spark, s"$root/ds", new java.util.HashMap())
    PyBridge.ingest(fs, tree)
    PyBridge.ingest(fs, tree) // second generation -> more files
    val rows = fs.table.count()
    // py4j delivers Python ints as boxed Numbers — Integer here
    val n = PyBridge.compact(fs, Integer.valueOf(128 * 1024 * 1024))
    assert(n >= 1)
    assert(fs.table.count() == rows)
  }
}
