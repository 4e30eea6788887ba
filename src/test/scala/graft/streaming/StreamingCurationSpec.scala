package graft.streaming

import java.nio.file.Files

import graft.SparkSuite
import graft.ops.{Redaction, TextAnalysis}
import org.apache.spark.sql.functions._

/** The curation column expressions (profile, redaction, repetition,
  * sketches) are stateless projections, so they must run UNCHANGED in
  * Structured Streaming — the property that lets one pipeline definition
  * serve both the backfill (batch) and the live feed. This spec drives
  * the real streaming engine (file source → memory sink) and checks
  * stream output equals the batch computation on the same rows. */
class StreamingCurationSpec extends SparkSuite {

  private lazy val docsDir: String = {
    val dir = Files.createTempDirectory("curstream").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def readDocsStream() =
    spark.readStream
      .schema(spark.read.parquet(docsDir).schema)
      .parquet(docsDir)

  test("text profile and repetition stream unchanged (batch = stream)") {
    val curated = TextAnalysis.profile(readDocsStream())
      .join(TextAnalysis.repetitionProfile(readDocsStream()), "doc_id")
    EventStreams.runToMemory(curated, "cur_profile")
    val got = spark.table("cur_profile").orderBy("doc_id")
      .collect().map(_.toString)
    val want = TextAnalysis.profile(spark.read.parquet(docsDir))
      .join(TextAnalysis.repetitionProfile(spark.read.parquet(docsDir)), "doc_id")
      .orderBy("doc_id").collect().map(_.toString)
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }

  test("redaction and sketch expressions stream unchanged (batch = stream)") {
    def shape(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Dedup.simhash(df)
        .join(df.select(col("doc_id"),
          Redaction.redact(col("text")).as("masked")), "doc_id")
    EventStreams.runToMemory(shape(readDocsStream()), "cur_sketch")
    val got = spark.table("cur_sketch").orderBy("doc_id")
      .collect().map(_.toString)
    val want = shape(spark.read.parquet(docsDir))
      .orderBy("doc_id").collect().map(_.toString)
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }
}
