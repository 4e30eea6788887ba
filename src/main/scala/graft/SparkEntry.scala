package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each entry is one operator from the SURVEY §2 inventory (or a
  * north-star training-data-pipeline operator); Oracles.map carries the
  * DuckDB-dialect equivalent for the driver's correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.qJoinShuffle(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tier-A rootfs operators (SURVEY §2.1-2.2)
    "q_read_dir" -> (Queries.qReadDir _),
    "q_read_dir_all" -> (Queries.qReadDirAll _),
    "q_read_files_condition" -> (Queries.qReadFilesCondition _),
    "q_len_udf" -> (Queries.qLenUdf _),
    "q_random_access" -> (Queries.qRandomAccess _),
    // Tier-B relational surface (SURVEY §2.3)
    "q1_pricing_summary" -> (Queries.q1PricingSummary _),
    "q_filter_pushdown" -> (Queries.qFilterPushdown _),
    "q_proj_arith" -> (Queries.qProjArith _),
    "q_join_broadcast" -> (Queries.qJoinBroadcast _),
    "q_join_shuffle" -> (Queries.qJoinShuffle _),
    "q_join_left" -> (Queries.qJoinLeft _),
    "q_join_full" -> (Queries.qJoinFull _),
    "q_join_semi" -> (Queries.qJoinSemi _),
    "q_join_anti" -> (Queries.qJoinAnti _),
    "q_join_cross" -> (Queries.qJoinCross _),
    "q_agg_distinct" -> (Queries.qAggDistinct _),
    "q_rollup" -> (Queries.qRollup _),
    "q_cube" -> (Queries.qCube _),
    "q_grouping_sets" -> (Queries.qGroupingSets _),
    "q_window_rownum" -> (Queries.qWindowRownum _),
    "q_window_running" -> (Queries.qWindowRunning _),
    "q_window_lag" -> (Queries.qWindowLag _),
    "q_window_moving_avg" -> (Queries.qWindowMovingAvg _),
    "q_window_rank_fns" -> (Queries.qWindowRankFns _),
    "q_topk_orders" -> (Queries.qTopkOrders _),
    "q_union_all" -> (Queries.qUnionAll _),
    "q_intersect" -> (Queries.qIntersect _),
    "q_except" -> (Queries.qExcept _),
    "q_except_all" -> (Queries.qExceptAll _),
    "q_intersect_all" -> (Queries.qIntersectAll _),
    "q_group_concat" -> (Queries.qGroupConcat _),
    "q_string_fns" -> (Queries.qStringFns _),
    "q_regex" -> (Queries.qRegex _),
    "q_datetime" -> (Queries.qDatetime _),
    "q_math" -> (Queries.qMath _),
    "q_array_fns" -> (Queries.qArrayFns _),
    "q_crypto_hash" -> (Queries.qCryptoHash _),
    "q_encoding" -> (Queries.qEncoding _),
    "q_subquery_in" -> (Queries.qSubqueryIn _),
    "q_subquery_exists" -> (Queries.qSubqueryExists _),
    "q_subquery_scalar" -> (Queries.qSubqueryScalar _),
    "q_approx_distinct" -> (Queries.qApproxDistinct _),
    "q_stats" -> (Queries.qStats _),
    "q_json_extract" -> (Queries.qJsonExtract _),
    "q_events_hourly" -> (Queries.qEventsHourly _),
    "q_sessionize" -> (Queries.qSessionize _),
    "q_asof_join" -> (Queries.qAsofJoin _),
    "q_range_join" -> (Queries.qRangeJoin _),
    "q_subquery_correlated" -> (Queries.qSubqueryCorrelated _),
    // training-data pipeline operators (north-star extensions)
    "q_dedup_exact" -> (Queries.qDedupExact _),
    "q_dedup_fingerprint" -> (Queries.qDedupFingerprint _),
    "q_dedup_ngram_jaccard" -> (Queries.qDedupNgramJaccard _),
    "q_dedup_minhash_lsh" -> (Queries.qDedupMinhashLsh _),
    "q_dedup_simhash" -> (Queries.qDedupSimhash _),
    "q_dedup_embedding" -> (Queries.qDedupEmbedding _),
    "q_dedup_clusters" -> (Queries.qDedupClusters _),
    "q_dedup_keep" -> (Queries.qDedupKeep _),
    "q_sample_hash" -> (Queries.qSampleHash _),
    "q_split_assign" -> (Queries.qSplitAssign _),
    "q_sample_stratified" -> (Queries.qSampleStratified _),
    "q_sample_mixture" -> (Queries.qSampleMixture _),
    "q_text_profile" -> (Queries.qTextProfile _),
    "q_text_histogram" -> (Queries.qTextHistogram _),
    "q_vocab_topk" -> (Queries.qVocabTopk _),
    "q_embedding_quantize" -> (Queries.qEmbeddingQuantize _),
    "q_corpus_clean" -> (Queries.qCorpusClean _),
    "q_fingerprint_rolling" -> (Queries.qFingerprintRolling _),
    "q_winnowing" -> (Queries.qWinnowing _),
    "q_knn_bruteforce" -> (Queries.qKnnBruteforce _),
    "q_knn_lsh" -> (Queries.qKnnLsh _),
    "q_knn_ivf" -> (Queries.qKnnIvf _),
    "q_embedding_norm" -> (Queries.qEmbeddingNorm _),
    "q_multimodal_meta" -> (Queries.qMultimodalMeta _),
    "q_multimodal_features" -> (Queries.qMultimodalFeatures _),
    "q_decontaminate" -> (Queries.qDecontaminate _),
    "q_seq_packing" -> (Queries.qSeqPacking _),
    "q_pii_redact" -> (Queries.qPiiRedact _),
    "q_text_repetition" -> (Queries.qTextRepetition _),
    "q_zorder_key" -> (Queries.qZorderKey _),
    "q_dedup_incremental" -> (Queries.qDedupIncremental _),
    "q_knn_ivf_index" -> (Queries.qKnnIvfIndex _),
    "q_knn_ivf_pq" -> (Queries.qKnnIvfPq _),
    "q_bm25_search" -> (Queries.qBm25Search _),
    "q_bm25_index" -> (Queries.qBm25Index _),
    "q_importance_topk" -> (Queries.qImportanceTopk _),
    "q_semantic_dedup" -> (Queries.qSemanticDedup _),
    "q_semdedup_recall_probe" -> (Queries.qSemdedupRecallProbe _),
    "q_token_budget" -> (Queries.qTokenBudget _),
    "q_hybrid_search" -> (Queries.qHybridSearch _),
    "q_span_dedup" -> (Queries.qSpanDedup _),
    "q_span_dedup_clean" -> (Queries.qSpanDedupClean _),
    "q_importance_resample" -> (Queries.qImportanceResample _),
    "q_skew_salted_join" -> (Queries.qSkewSaltedJoin _),
    "q_heavy_hitters" -> (Queries.qHeavyHitters _),
    "q_dedup_incremental_embedding" -> (Queries.qDedupIncrementalEmbedding _),
    "q_dedup_clusters_incremental" -> (Queries.qDedupClustersIncremental _),
    "q_dedup_incremental_simhash" -> (Queries.qDedupIncrementalSimhash _),
    "q_dedup_incremental_ngram" -> (Queries.qDedupIncrementalNgram _),
    "q_curation_funnel" -> (Queries.qCurationFunnel _),
    "q_curation_neardup" -> (Queries.qCurationNeardup _),
    "q_curation_docs" -> (Queries.qCurationDocs _),
    "q_span_dedup_incremental" -> (Queries.qSpanDedupIncremental _)
  ) ++ FuzzQueries.queries ++ // differential fuzz gate (seeded AST → both engines)
    Tpch.queries // the 22-query TPC-H suite (Tpch.scala), corpus-adapted

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. EVERY query has one (92/92): inherently
    * engine-specific values (HLL registers, LSH retrieval sets) are
    * gated semantically instead — the query emits the engine-independent
    * contract (exact counts + tolerance booleans, verified pair sets,
    * recall flags) and the oracle recomputes the truth. */
  def oracleSql: Map[String, String] =
    Oracles.map ++ FuzzQueries.oracleSql ++ Tpch.oracleSql
}
