package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of a lexical (BM25)
  * and a semantic (cosine ANN) ranking —
  * `score(d) = Σ_modality 1/(k0 + rank_modality(d))` over the union of
  * the two per-query top-n lists, the standard fusion rule (k0 = 60)
  * that needs no score calibration between modalities because it
  * consumes RANKS, not scores. The retrieval shape RAG-style corpus
  * search and paraphrase-tolerant decontamination both want: BM25
  * catches lexical overlap, the embedding side catches rewordings.
  *
  * Scale shape: both inputs are per-query top-n lists (n rows per
  * query, not corpus-sized) produced by operators that are themselves
  * scale-safe (Bm25.search's query-restricted postings, the ANN
  * family's two-stage top-k). Fusion is one full-outer equi-join of
  * the two small lists plus a per-query window over ≤ 2n candidates —
  * bounded by n, never by the corpus.
  *
  * Determinism contract (the gate's cross-engine compare): both input
  * ranks are already deterministic (4-dp-rounded scores, doc_id
  * tie-break); the RRF sum is two exact divisions added in fixed
  * textual order, rounded at 6 dp BEFORE the fused ranking, ties on
  * doc_id. */
object HybridSearch {

  /** Fuse two (query_id, doc_id, rank) frames; top-`k` per query as
    * (query_id, doc_id, rrf, rank). */
  def rrf(
      lexical: DataFrame,
      semantic: DataFrame,
      k: Int,
      k0: Int = 60): DataFrame = {
    val l = lexical.select(col("query_id"), col("doc_id"),
      col("rank").as("lex_rank"))
    val s = semantic.select(col("query_id"), col("doc_id"),
      col("rank").as("sem_rank"))
    val fused = l.join(s, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        round(
          coalesce(lit(1.0) / (lit(k0) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(k0) + col("sem_rank")), lit(0.0)),
          6).as("rrf"))
    // per-query window over ≤ 2n fused candidates — bounded by the
    // top-n inputs, so no twoStageTopK needed here
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Convenience end-to-end: `queries` carries BOTH modalities
    * (query_id, query text, qvec); BM25 over `docs` and exact cosine
    * over `embs` (keyed `vec_id` = doc_id), each top-`nPer`, fused
    * top-`k`. */
  def search(
      docs: DataFrame,
      embs: DataFrame,
      queries: DataFrame,
      k: Int,
      nPer: Int = 10,
      k0: Int = 60): DataFrame = {
    val lex = Bm25.search(docs, queries.select("query_id", "query"), nPer)
    val sem = Similarity.bruteForceTopK(
      queries.select(col("query_id").as("vec_id"), col("qvec").as("embedding")),
      embs, nPer)
      .withColumnRenamed("neighbor_id", "doc_id")
    rrf(lex, sem, k, k0)
  }

  /** Index-backed end-to-end (r13 verdict #2): the semantic arm probes
    * the PERSISTED IVF(-PQ) index at `indexDir` instead of scanning the
    * corpus — `IvfIndex.search`'s cell-pruned read (nprobe/nlist of the
    * corpus off disk; with `rerank` ≥ 1 the probe reads int8 codes
    * only). At 100 TB this is the difference between a pruned point
    * probe and a full corpus pass PER SEARCH; the brute-force
    * convenience path above stays for index-less corpora. `rrf()` is
    * rank-source-agnostic, so fusion semantics are identical — when the
    * probe's top-n equals the brute-force top-n (recall 1.0 at the
    * measured rerank settings), the fused lists are equal too
    * (HybridSearchSpec pins ≥ 0.95 on the gate corpus). */
  def searchIndexed(
      docs: DataFrame,
      indexDir: String,
      queries: DataFrame,
      k: Int,
      nPer: Int = 10,
      nprobe: Int = 4,
      rerank: Int = 0,
      k0: Int = 60): DataFrame = {
    val lex = Bm25.search(docs, queries.select("query_id", "query"), nPer)
    val sem = IvfIndex.search(docs.sparkSession, indexDir,
      queries.select("query_id", "qvec"), nPer, nprobe,
      idCol = "query_id", vecCol = "qvec", rerank = rerank)
      .withColumnRenamed("neighbor_id", "doc_id")
    rrf(lex, sem, k, k0)
  }

  /** Fully-indexed end-to-end (r14): BOTH arms are pruned index reads —
    * the lexical arm probes the persisted BM25 index
    * ([[Bm25Index.search]], only the query terms' partitions open) and
    * the semantic arm the IVF(-PQ) index. A search batch touches ZERO
    * corpus passes; at 100 TB this is the retrieval shape that actually
    * serves. Fusion semantics unchanged (rrf is rank-source-agnostic). */
  def searchFullyIndexed(
      spark: org.apache.spark.sql.SparkSession,
      bm25Dir: String,
      ivfDir: String,
      queries: DataFrame,
      k: Int,
      nPer: Int = 10,
      nprobe: Int = 4,
      rerank: Int = 0,
      k0: Int = 60): DataFrame = {
    val lex = Bm25Index.search(spark, bm25Dir,
      queries.select("query_id", "query"), nPer)
    val sem = IvfIndex.search(spark, ivfDir,
      queries.select("query_id", "qvec"), nPer, nprobe,
      idCol = "query_id", vecCol = "qvec", rerank = rerank)
      .withColumnRenamed("neighbor_id", "doc_id")
    rrf(lex, sem, k, k0)
  }
}
