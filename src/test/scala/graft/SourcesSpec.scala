package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink parity (SURVEY §2.3 scans/sources row): the reference
  * compiles Arrow csv/ipc/json codecs but exposes no reader; Spark's
  * csv/json sources are first-class — pin the round-trip so the claim is
  * tested, not assumed. */
class SourcesSpec extends SparkSuite {

  private lazy val part = spark.read.parquet(s"$sf/part.parquet")

  test("csv round-trip preserves rows and types (with header + schema)") {
    val dir = Files.createTempDirectory("csvsrc").toString
    part.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(part.schema).csv(dir)
    assert(back.count() == part.count())
    val a = part.orderBy("p_partkey").collect().toSeq
    val b = back.orderBy("p_partkey").collect().toSeq
    assert(a == b)
  }

  test("json round-trip preserves rows") {
    val dir = Files.createTempDirectory("jsonsrc").toString
    part.write.mode("overwrite").json(dir)
    val back = spark.read.schema(part.schema).json(dir)
    assert(back.orderBy("p_partkey").collect().toSeq ==
      part.orderBy("p_partkey").collect().toSeq)
  }

  test("csv/json of the rootfs listing shape (no binary column)") {
    val dir = Files.createTempDirectory("listingcsv").toString
    val listing = Queries.qReadDirAll(spark, sf).drop("data") // csv has no binary
    listing.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(listing.schema).csv(dir)
    assert(back.count() == listing.count())
  }
}
