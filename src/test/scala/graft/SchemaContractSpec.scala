package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The corpus-drift preflight must pass the real corpus and name the
  * table/column when a fixture is deliberately re-encoded — the r10
  * events.ts incident as a unit test. */
class SchemaContractSpec extends SparkSuite {

  test("the shipped corpus is contract-clean at sf0.001") {
    assert(SchemaContract.violations(spark, sf) == Seq.empty)
  }

  test("a re-encoded column is caught and named") {
    // clone the corpus dir, re-encode events.ts to STRING — the drift
    // class no dispatch arm handles
    val dir = Files.createTempDirectory("drift").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet")
        .write.parquet(s"$dir/$t.parquet")
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", col("ts").cast("string"))
      .write.parquet(s"$dir/events.parquet")
    val v = SchemaContract.violations(spark, dir)
    assert(v.exists(x => x.contains("events.ts") && x.contains("STRING")),
      v.mkString("; "))
    // only the re-encoded column is flagged
    assert(v.size == 1, v.mkString("; "))
  }

  test("a missing column is caught and named") {
    val dir = Files.createTempDirectory("driftmiss").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "embeddings")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tables.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet")
        .write.parquet(s"$dir/$t.parquet")
    }
    spark.read.parquet(s"$sf/documents.parquet").drop("lang")
      .write.parquet(s"$dir/documents.parquet")
    val v = SchemaContract.violations(spark, dir)
    assert(v.exists(_.contains("documents.lang: MISSING")), v.mkString("; "))
  }
}
