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

  test("winnowing: identical docs share sketches; near-dups overlap heavily") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far " +
      "away into the deep green forest while birds sing above the trees"
    val d = Seq((0L, base), (1L, base),
      (2L, base.replace("lazy", "sleepy")),
      (3L, "totally unrelated words about catalyst plans and shuffles here"))
      .toDF("doc_id", "text")
    val s = TextAnalysis.winnowingSketch(d, k = 3, w = 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(s(0L) == s(1L))
    val overlap02 = (s(0L) & s(2L)).size.toDouble / (s(0L) | s(2L)).size
    assert(overlap02 >= 0.5, s"near-dup overlap $overlap02")
    assert((s(0L) & s(3L)).isEmpty)
  }

  test("quality score bounded in [0,1] on the real corpus") {
    val r = TextAnalysis.profile(
      spark.read.parquet(s"$sf/documents.parquet"))
    assert(r.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
  }

  test("length histogram bins partition the corpus; last bin is open-ended") {
    import spark.implicits._
    val d = Seq(
      (0L, "a", "x" * 50), (1L, "a", "x" * 150),
      (2L, "a", "x" * 5000), // way past the last bin edge -> bin 9
      (3L, "b", "x" * 10)).toDF("doc_id", "source", "text")
    val h = TextAnalysis.lengthHistogram(d).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(h == Map(("a", 0L) -> 1L, ("a", 1L) -> 1L, ("a", 9L) -> 1L,
      ("b", 0L) -> 1L))
    assert(h.values.sum == 4) // every doc lands in exactly one bin
  }

  test("topTokens is the deterministic frequency head with token tiebreak") {
    import spark.implicits._
    val d = Seq((0L, "b b a a c"), (1L, "a b z")).toDF("doc_id", "text")
    val got = TextAnalysis.topTokens(d, 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // a and b tie at 3 -> token order breaks the tie
    assert(got == Seq(("a", 3L), ("b", 3L), ("c", 1L)))
  }
}
