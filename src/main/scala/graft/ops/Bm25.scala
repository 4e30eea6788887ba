package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval over a documents table — the keyword-search
  * operator a training-data pipeline runs for quality-mix retrieval and
  * benchmark decontamination (exact-overlap decontamination is
  * [[Decontaminate]]; BM25 catches the paraphrased-but-lexically-close
  * tail).
  *
  * Plan shape, chosen for the 100 TB regime where the corpus is huge
  * and the query set small:
  *
  *   1. ONE corpus pass builds the query-restricted posting list: each
  *      document explodes to (term, doc_id, dl) rows and a broadcast
  *      LEFT SEMI against the query-term set drops every non-matching
  *      term BEFORE any aggregation — the shuffle carries only rows for
  *      terms some query contains, not the corpus vocabulary.
  *   2. Corpus stats (N, avgdl) are one map-only aggregate (1 row,
  *      crossJoined — the broadcast-scalar idiom used across Queries).
  *   3. Per-term df comes from the restricted postings (df of a term
  *      no query mentions is never needed), joins back broadcast.
  *   4. Scores aggregate per (query, doc) and the per-query top-k runs
  *      through [[Similarity.twoStageTopK]], so no partition ever holds
  *      one query's whole match set.
  *
  * Scoring is textbook BM25 (Robertson/Sparck Jones idf in the
  * Lucene-style `ln(1 + (N - df + 0.5)/(df + 0.5))` form, so idf is
  * always positive):
  *
  *   score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * Determinism contract (the gate's cross-engine hash compare): the
  * per-(query, doc) score is round()ed to 4 dp BEFORE ranking, and ties
  * break on doc_id ascending — float sum-order drift (~1e-15) between
  * engines cannot flip a rank. Tokenization is the corpus convention
  * ([[TextAnalysis.tokens]], single-space split).
  */
object Bm25 {

  /** The query-restricted posting list — (term, doc_id, dl, tf) for
    * query terms only. The broadcast LEFT SEMI sits BELOW the tf
    * aggregation so the exploded corpus never reaches a shuffle
    * unfiltered; package-private so the plan-shape spec can pin that
    * property on the subtree search() checkpoints. */
  private[ops] def postingsOf(
      docs: DataFrame,
      qterms: DataFrame,
      docIdCol: String,
      textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // fanOut: the tokenize+explode is the corpus pass's CPU cost; an
    // under-parallel scan must not serialize it (no-op on well-split
    // scans — see Scale.fanOutForCompute)
    Scale.fanOutForCompute(docs, col(docIdCol))
      .select(col(docIdCol).as("doc_id"),
        size(toks).cast("double").as("dl"),
        explode(toks).as("term"))
      .join(broadcast(qterms.select("term").distinct()), Seq("term"), "left_semi")
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).cast("double").as("tf"))
  }

  def search(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      docIdCol: String = "doc_id",
      textCol: String = "text",
      queryIdCol: String = "query_id",
      queryCol: String = "query"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // distinct (query, term): repeated terms in one query score once —
    // the standard bag-of-words-query simplification, and what keeps
    // the oracle SQL one DISTINCT away from the same semantics
    val qterms = queries.select(col(queryIdCol).as("query_id"),
        explode(TextAnalysis.tokens(col(queryCol))).as("term"))
      .distinct()
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(toks)).as("avgdl"))
    // localCheckpoint: postings feeds BOTH the broadcast df-per-term
    // aggregate and the scoring join — without it the broadcast
    // materialization and the main plan each run the full
    // explode+semi-join+aggregate corpus pass (the SemDedup.pairs
    // shared-subtree convention; blocks freed once unreachable)
    val postings = postingsOf(docs, qterms, docIdCol, textCol).localCheckpoint()
    val dfPerTerm = postings.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))
    val scored = postings
      .join(broadcast(dfPerTerm), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id").as("neighbor_id"),
        (F.log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))).as("part"))
      .groupBy("query_id", "neighbor_id")
      // round BEFORE ranking — see the determinism contract above
      .agg(round(sum("part"), 4).as("cosine"))
    Similarity.twoStageTopK(scored, k)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("cosine").as("bm25"), col("rank"))
  }
}
