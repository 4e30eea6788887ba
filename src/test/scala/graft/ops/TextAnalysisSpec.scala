package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSuite {

  private def one(text: String) = {
    import spark.implicits._
    Seq((0L, text)).toDF("doc_id", "text")
  }

  test("token counts: whitespace and bpe-ish") {
    val r = one("hello world, 42 times!").select(
      TextAnalysis.tokenCount(col("text")).as("ws"),
      TextAnalysis.bpeishTokenCount(col("text")).as("bpe")).collect().head
    assert(r.getAs[Long]("ws") == 4)
    // hello|world|,|42|times|! -> 6
    assert(r.getAs[Long]("bpe") == 6)
  }

  test("stopword ratio") {
    val r = one("the cat is a cat").select(
      TextAnalysis.stopwordRatio(col("text")).as("r")).collect().head
    assert(r.getAs[Double]("r") == 0.6) // the, is, a of 5
  }

  test("punct ratio counts non-alnum-non-space chars") {
    val r = one("ab, cd!").select(
      TextAnalysis.punctRatio(col("text")).as("r")).collect().head
    assert(r.getAs[Double]("r") == math.round(2.0 / 7.0 * 10000) / 10000.0)
  }

  test("langIdHeuristic picks the language with most marker hits") {
    import spark.implicits._
    val d = Seq(
      (1L, "the cat and the dog is of note"),
      (2L, "der hund und die katze ist hier"),
      (3L, "le chat et la maison est grande"),
      (4L, "xyzzy plugh quux")).toDF("doc_id", "text")
    val m = d.select(col("doc_id"),
      TextAnalysis.langIdHeuristic(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "en" && m(2L) == "de" && m(3L) == "fr" && m(4L) == "und")
  }

  test("fingerprint is whitespace/case-insensitive") {
    import spark.implicits._
    val d = Seq((0L, "Hello   World"), (1L, "hello world")).toDF("doc_id", "text")
    val fps = d.select(TextAnalysis.fingerprint(col("text")).as("f"))
      .collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("quality score bounded in [0,1] on the real corpus") {
    val r = TextAnalysis.profile(
      spark.read.parquet(s"$sf/documents.parquet"))
    assert(r.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
  }
}
