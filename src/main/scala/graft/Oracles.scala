package graft

/** DuckDB oracle SQL for every SQL-expressible query in Queries.scala.
  * Written in DuckDB 1.0 dialect; the driver runs these over the same
  * parquet tables and hash-compares against our parquet output, so every
  * column name, type (BIGINT for computed ints, DOUBLE for rounded
  * aggregates), rounding, and ORDER BY must mirror the Spark side exactly.
  */
object Oracles {

  /** Shared label CTE for the two curation rows: corpus = documents
    * minus src0, per-doc (n_tokens, quality, md5 digest), exit stage
    * charged to the FIRST dropping stage — quality(<0.4 or NULL text) →
    * exact_dup (not the digest's min quality-passing doc_id) →
    * contaminated (any 5-gram shared with src0) → NULL (survivor).
    * Formula fragments are the proven q_corpus_clean / q_decontaminate
    * restatements. */
  private val curationLab: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents WHERE source <> 'src0'),
      |feat AS (
      |  SELECT doc_id, text,
      |    CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT) AS n_tokens,
      |    round((least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) +
      |           (1.0 - least(round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) /
      |             CAST(greatest(length(text), 1) AS DOUBLE), 4) * 5.0, 1.0)) +
      |           least(round(CAST(len(list_filter(string_split(text, ' '), x -> x IN
      |               ('the','a','of','and','to','in','is','it'))) AS DOUBLE) /
      |             CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE), 4) * 4.0, 1.0)) / 3.0, 4) AS quality,
      |    md5(text) AS digest
      |  FROM corpus),
      |lab0 AS (
      |  SELECT *, (text IS NOT NULL AND quality >= 0.4) AS qpass FROM feat),
      |withk AS (
      |  SELECT *, min(CASE WHEN qpass THEN doc_id END)
      |    OVER (PARTITION BY digest) AS keeper FROM lab0),
      |tkc AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
      |shc AS (SELECT DISTINCT doc_id, source,
      |          unnest(list_transform(range(1, greatest(len(t) - 4, 1) + 1),
      |            i -> array_to_string(t[i:i+4], ' '))) AS g
      |        FROM tkc),
      |bgc AS (SELECT DISTINCT g FROM shc WHERE source = 'src0'),
      |contam AS (SELECT shc.doc_id FROM shc JOIN bgc USING (g)
      |           WHERE shc.source <> 'src0'
      |           GROUP BY shc.doc_id HAVING count(*) >= 1),
      |lab AS (
      |  SELECT doc_id, n_tokens, quality,
      |    CASE WHEN NOT qpass THEN 'quality'
      |         WHEN doc_id <> keeper THEN 'exact_dup'
      |         WHEN doc_id IN (SELECT doc_id FROM contam) THEN 'contaminated'
      |         END AS exit
      |  FROM withk)""".stripMargin

  /** Span-dedup detection (shared by the one-shot and incremental
    * rows): duplicated 10-token windows ranked by (doc_id, pos); rank 1
    * is the keeper, every later occurrence is a span to cut — the same
    * total order the Spark side's min(struct(doc_id, pos)) selects. */
  private val spanDedupSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |win AS (
      |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
      |    array_to_string(toks[i:i+9], ' ') AS wtext
      |  FROM d, UNNEST(generate_series(1, len(toks) - 9)) AS t(i)
      |),
      |dup AS (SELECT wtext FROM win GROUP BY wtext HAVING count(*) >= 2),
      |ranked AS (
      |  SELECT w.doc_id, w.pos,
      |    row_number() OVER (PARTITION BY w.wtext ORDER BY w.doc_id, w.pos) AS rn
      |  FROM win w JOIN dup USING (wtext)
      |)
      |SELECT doc_id, pos FROM ranked WHERE rn > 1
      |ORDER BY doc_id, pos""".stripMargin

  val map: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter_pushdown" ->
      """SELECT p_partkey, p_name, p_brand, p_size FROM part
        |WHERE p_type = 'ECONOMY' AND p_size BETWEEN 10 AND 30
        |  AND p_name LIKE '%gear%'
        |ORDER BY p_partkey""".stripMargin,

    "q_proj_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge,
        |  round(l_extendedprice * l_discount, 4) AS disc_amt
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, charge, disc_amt""".stripMargin,

    "q_join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  round(sum(c_acctbal), 2) AS acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q_join_shuffle" ->
      """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_date,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_custkey, o_date
        |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_join_left" ->
      """SELECT n_nationkey, n_name, count(c_custkey) AS n_cust
        |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin,

    "q_join_full" ->
      """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
        |     s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT coalesce(c.nk, s.nk) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk
        |ORDER BY nationkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 480000)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_cross" ->
      """SELECT r_name, count(*) AS n FROM region CROSS JOIN nation
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus)*2 + grouping(o_orderpriority) AS BIGINT) AS g,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY g, o_orderstatus, o_orderpriority""".stripMargin,

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag)*2 + grouping(l_linestatus) AS BIGINT) AS g,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g, l_returnflag, l_linestatus""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus)*2 + grouping(o_orderpriority) AS BIGINT) AS g,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g, o_orderstatus, o_orderpriority""".stripMargin,

    "q_window_rownum" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        CAST(row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        |      FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_window_running" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(sum(l_quantity) OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, running_qty""".stripMargin,

    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  coalesce(lag(round(o_totalprice, 2)) OVER w, -1.0) AS prev_price,
        |  coalesce(lead(round(o_totalprice, 2)) OVER w, -1.0) AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_window_moving_avg" ->
      """SELECT event_id, event_type,
        |  round(avg(value) OVER (PARTITION BY event_type
        |    ORDER BY epoch_ms(ts) ASC, event_id ASC
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg
        |FROM events ORDER BY event_id""".stripMargin,

    "q_window_rank_fns" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 4) AS pct_rank,
        |  round(cume_dist() OVER w, 4) AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice ASC, o_orderkey ASC)
        |ORDER BY o_orderkey""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price,
        |  CAST(o_orderdate AS DATE) AS o_date
        |FROM orders ORDER BY price DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_union_all" ->
      """SELECT 'cust' AS src, c_custkey AS id FROM customer
        |UNION ALL SELECT 'supp', s_suppkey FROM supplier
        |ORDER BY src, id""".stripMargin,

    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,

    "q_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,

    "q_group_concat" ->
      """SELECT s_nationkey AS nationkey,
        |  string_agg(s_name, ',' ORDER BY s_name) AS names,
        |  count(*) AS n
        |FROM supplier GROUP BY s_nationkey ORDER BY nationkey""".stripMargin,

    "q_except_all" ->
      """WITH d AS (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT ALL
        |  SELECT s_nationkey FROM supplier)
        |SELECT nationkey, count(*) AS n_surplus FROM d
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,

    "q_intersect_all" ->
      """WITH d AS (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT ALL
        |  SELECT s_nationkey FROM supplier)
        |SELECT nationkey, count(*) AS n_common FROM d
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,

    "q_string_fns" ->
      """SELECT p_partkey, upper(p_name) AS up_name, substr(p_name, 1, 4) AS prefix,
        |  concat_ws('-', p_brand, p_type) AS tag,
        |  lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_pad,
        |  CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_regex" ->
      """SELECT p_partkey, regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
        |FROM part WHERE regexp_matches(p_type, '^(ECONOMY|SMALL)$')
        |ORDER BY p_partkey""".stripMargin,

    "q_datetime" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY yr, mo, month_start ORDER BY yr, mo""".stripMargin,

    "q_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(sqrt(l_quantity), 4) AS sqrt_qty,
        |  round(ln(l_extendedprice), 4) AS ln_price,
        |  round(pow(1 + l_discount, 2), 4) AS pow_disc,
        |  CAST(l_partkey % 7 AS BIGINT) AS mod_part,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        |  round(abs(l_tax - 0.5), 4) AS abs_tax
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, ln_price, sqrt_qty, mod_part""".stripMargin,

    "q_array_fns" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
        |SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
        |  tk[1] AS first_tok, tk[-1] AS last_tok,
        |  list_contains(tk, 'the') AS has_the,
        |  array_to_string(tk[1:3], ' ') AS head3
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_crypto_hash" ->
      """SELECT c_custkey, md5(c_name) AS md5_name, sha256(c_name) AS sha256_name
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_encoding" ->
      """SELECT p_partkey, base64(encode(p_brand)) AS b64,
        |  hex(p_brand) AS hexed, p_brand AS roundtrip
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_subquery_in" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q_subquery_exists" ->
      """SELECT s_suppkey, s_name FROM supplier s
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
        |ORDER BY s_suppkey""".stripMargin,

    "q_subquery_scalar" ->
      """SELECT count(*) AS n, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""".stripMargin,

    "q_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(corr(l_extendedprice, l_quantity), 4) AS corr_pq,
        |  round(covar_samp(l_extendedprice, l_quantity), 4) AS covar_pq,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        |  round(quantile_cont(l_quantity, 0.95), 4) AS p95_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_events_hourly" ->
      """SELECT event_type, epoch_ms(date_trunc('hour', ts)) AS hour_ms,
        |  count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY event_type, hour_ms
        |ORDER BY event_type, hour_ms""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
        |f AS (SELECT user_id,
        |        CASE WHEN ts_ms - lag(ts_ms) OVER (PARTITION BY user_id
        |          ORDER BY ts_ms ASC, event_id ASC) > 1800000 THEN 1 ELSE 0 END AS ns
        |      FROM e)
        |SELECT user_id, CAST(sum(ns) + 1 AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_asof_join" ->
      """WITH r AS (SELECT o_custkey, epoch_ms(o_orderdate) AS ot,
        |             max(o_orderkey) AS o_orderkey
        |           FROM orders GROUP BY o_custkey, ot),
        |l AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events)
        |SELECT l.event_id, l.user_id, r.o_orderkey
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.o_custkey AND l.ts_ms >= r.ot
        |ORDER BY event_id""".stripMargin,

    "q_range_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events)
        |SELECT a.user_id, count(*) AS n_pairs
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id AND a.event_id <> b.event_id
        |  AND abs(b.ts_ms - a.ts_ms) <= 60000
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,

    "q_subquery_correlated" ->
      """SELECT c_custkey,
        |  (SELECT round(max(o_totalprice), 2) FROM orders
        |   WHERE o_custkey = c_custkey) AS max_price
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // ---- Tier-A rootfs over the documents-derived table ----

    "q_read_dir" ->
      """SELECT CAST(doc_id AS VARCHAR) || '.txt' AS name, '/' || source AS parent,
        |  CAST(420 AS INTEGER) AS mode, n_chars AS size,
        |  CAST(0 AS BIGINT) AS chunk_id, CAST(0 AS BIGINT) AS chunk_offset,
        |  n_chars AS chunk_size, '' AS data_hex
        |FROM documents WHERE '/' || source = '/src3'
        |ORDER BY name""".stripMargin,

    "q_read_dir_all" ->
      """SELECT CAST(doc_id AS VARCHAR) || '.txt' AS name, '/' || source AS parent,
        |  CAST(420 AS INTEGER) AS mode, n_chars AS size,
        |  CAST(0 AS BIGINT) AS chunk_id, CAST(0 AS BIGINT) AS chunk_offset,
        |  n_chars AS chunk_size, '' AS data_hex
        |FROM documents ORDER BY parent, name""".stripMargin,

    "q_read_files_condition" ->
      """SELECT CAST(doc_id AS VARCHAR) || '.txt' AS name, '/' || source AS parent,
        |  CAST(420 AS INTEGER) AS mode, n_chars AS size,
        |  CAST(0 AS BIGINT) AS chunk_id, CAST(0 AS BIGINT) AS chunk_offset,
        |  n_chars AS chunk_size, upper(hex(encode(text))) AS data_hex
        |FROM documents
        |WHERE (CAST(doc_id AS VARCHAR) || '.txt') LIKE '1%.txt' AND n_chars > 200
        |ORDER BY parent, name""".stripMargin,

    "q_len_udf" ->
      """SELECT '/' || source AS parent, CAST(doc_id AS VARCHAR) || '.txt' AS name,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents
        |ORDER BY n_chars DESC, name ASC LIMIT 10""".stripMargin,

    "q_random_access" ->
      """WITH r AS (SELECT '/' || source AS parent,
        |  CAST(doc_id AS VARCHAR) || '.txt' AS name, n_chars AS size FROM documents),
        |o AS (SELECT parent, name, size,
        |  CAST(row_number() OVER (ORDER BY parent, name) AS BIGINT) - 1 AS row_id
        |  FROM r)
        |SELECT row_id, parent, name, size FROM o
        |WHERE row_id IN (0, 7, 42, 123, 400) ORDER BY row_id""".stripMargin,

    // ---- training-data pipeline ops ----

    "q_dedup_exact" ->
      """SELECT md5(text) AS digest, min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY digest ORDER BY digest""".stripMargin,

    "q_dedup_fingerprint" ->
      """SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint,
        |  min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY fingerprint ORDER BY fingerprint""".stripMargin,

    "q_dedup_ngram_jaccard" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |           i -> array_to_string(t[i:i+2], ' '))) AS shingle
        |       FROM tk),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |it AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |       FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
        |       GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_common,
        |  round(CAST(n_common AS DOUBLE) /
        |    CAST(sa.n + sb.n - n_common AS DOUBLE), 4) AS jaccard
        |FROM it JOIN sizes sa ON it.doc_a = sa.doc_id
        |        JOIN sizes sb ON it.doc_b = sb.doc_id
        |WHERE round(CAST(n_common AS DOUBLE) /
        |    CAST(sa.n + sb.n - n_common AS DOUBLE), 4) >= 0.01
        |ORDER BY doc_a, doc_b""".stripMargin,

    // q_dedup_minhash_lsh emits the engine-independent verified set
    // {pairs : true 3-gram jaccard >= 0.8} (LSH only BLOCKS candidates;
    // the exact verify defines the output) — so the oracle is the same
    // brute-force jaccard as q_dedup_ngram_jaccard at the 0.8 threshold.
    // The gate thereby asserts LSH recall = 1 on the corpus' qualifying
    // pairs (they sit at s >= 0.94, banding hit prob 1-(1-s^4)^16 ≈ 1).
    "q_dedup_minhash_lsh" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |           i -> array_to_string(t[i:i+2], ' '))) AS shingle
        |       FROM tk),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |it AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |       FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
        |       GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_common,
        |  round(CAST(n_common AS DOUBLE) /
        |    CAST(sa.n + sb.n - n_common AS DOUBLE), 4) AS jaccard
        |FROM it JOIN sizes sa ON it.doc_a = sa.doc_id
        |        JOIN sizes sb ON it.doc_b = sb.doc_id
        |WHERE round(CAST(n_common AS DOUBLE) /
        |    CAST(sa.n + sb.n - n_common AS DOUBLE), 4) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,

    // q_dedup_simhash is a RECALL gate: the Spark side outputs the
    // engine-independent TRUE pair count at jaccard >= 0.9 (the oracle's
    // brute force recomputes it — a cross-check of the exact-verify
    // math) plus a boolean asserting radius-3 simhash blocking recovered
    // >= 50% of those pairs (measured 0.60-0.78 across SFs; hamming of
    // qualifying pairs reaches 11, so completeness at radius 3 is
    // impossible and a completeness-equality oracle would be dishonest).
    "q_dedup_simhash" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |           i -> array_to_string(t[i:i+2], ' '))) AS shingle
        |       FROM tk),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |it AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |       FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
        |       GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_true_pairs, TRUE AS recall_ok
        |FROM it JOIN sizes sa ON it.doc_a = sa.doc_id
        |        JOIN sizes sb ON it.doc_b = sb.doc_id
        |WHERE round(CAST(n_common AS DOUBLE) /
        |    CAST(sa.n + sb.n - n_common AS DOUBLE), 4) >= 0.9""".stripMargin,

    // q_dedup_embedding emits the engine-independent verified set
    // {pairs : true cosine >= 0.95} over the derived corpus (embeddings
    // ∪ first-25 perturbed copies — see Queries.qDedupEmbedding; LSH
    // only BLOCKS, the exact cosine verify defines the output) — so the
    // oracle is a brute-force all-pairs cosine at the same threshold.
    // The gate thereby asserts multi-table LSH recall = 1 on the
    // corpus' qualifying pairs (planted at cosine ≥ 0.968; per-pair
    // blocking miss prob ≈ 1e-5 with 16 tables × 8 planes, and the
    // planes are deterministic).
    "q_dedup_embedding" ->
      """WITH idx AS (SELECT unnest(range(1, 65)) AS i),
        |be AS (SELECT vec_id AS id, i, CAST(embedding[i] AS DOUBLE) AS x
        |       FROM embeddings, idx),
        |pe AS (SELECT id + 100000 AS id, i,
        |         x + CASE WHEN i = 1 THEN 0.25 ELSE 0 END AS x
        |       FROM be WHERE id < 25),
        |ue AS (SELECT * FROM be UNION ALL SELECT * FROM pe),
        |nrm AS (SELECT id, sqrt(sum(x * x)) AS nrm FROM ue GROUP BY id),
        |dots AS (SELECT a.id AS id_a, b.id AS id_b, sum(a.x * b.x) AS dot
        |         FROM ue a JOIN ue b USING (i) WHERE a.id < b.id
        |         GROUP BY 1, 2),
        |scored AS (SELECT id_a, id_b,
        |             round(dot / (na.nrm * nb.nrm), 4) AS cosine
        |           FROM dots JOIN nrm na ON id_a = na.id
        |                     JOIN nrm nb ON id_b = nb.id)
        |SELECT id_a, id_b, cosine FROM scored
        |WHERE cosine >= 0.95 ORDER BY id_a, id_b""".stripMargin,

    // the incremental embedding store must lose nothing across appends:
    // the union of per-batch pair sets equals the full-corpus brute-force
    // all-pairs oracle (same derived corpus as q_dedup_embedding)
    "q_dedup_incremental_embedding" ->
      """WITH idx AS (SELECT unnest(range(1, 65)) AS i),
        |be AS (SELECT vec_id AS id, i, CAST(embedding[i] AS DOUBLE) AS x
        |       FROM embeddings, idx),
        |pe AS (SELECT id + 100000 AS id, i,
        |         x + CASE WHEN i = 1 THEN 0.25 ELSE 0 END AS x
        |       FROM be WHERE id < 25),
        |ue AS (SELECT * FROM be UNION ALL SELECT * FROM pe),
        |nrm AS (SELECT id, sqrt(sum(x * x)) AS nrm FROM ue GROUP BY id),
        |dots AS (SELECT a.id AS id_a, b.id AS id_b, sum(a.x * b.x) AS dot
        |         FROM ue a JOIN ue b USING (i) WHERE a.id < b.id
        |         GROUP BY 1, 2),
        |scored AS (SELECT id_a, id_b,
        |             round(dot / (na.nrm * nb.nrm), 4) AS cosine
        |           FROM dots JOIN nrm na ON id_a = na.id
        |                     JOIN nrm nb ON id_b = nb.id)
        |SELECT id_a, id_b, cosine FROM scored
        |WHERE cosine >= 0.95 ORDER BY id_a, id_b""".stripMargin,

    // q_approx_distinct is a TOLERANCE gate: the Spark side emits exact
    // counts plus booleans asserting |HLL estimate − exact| ≤ 15% (3·rsd
    // at the default rsd 0.05); the oracle recomputes the exact counts
    // and expects the booleans TRUE. The estimate itself never leaves
    // the query — it is register-layout-specific by nature.
    "q_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        |  count(DISTINCT l_suppkey) AS exact_supps,
        |  TRUE AS parts_within_tol, TRUE AS supps_within_tol
        |FROM lineitem""".stripMargin,

    // q_knn_lsh is a RECALL gate: the Spark side computes both the
    // multi-table LSH retrieval and the exact top-k, and asserts macro
    // recall@3 ≥ 0.45; the oracle recomputes n_queries and expects
    // recall_ok TRUE. The retrieved set depends on the engine's plane
    // hashes (sign-LSH on near-random embeddings cannot promise exact
    // top-k at sub-linear cost — the IVF queries pin the equality
    // contract), but a signature/banding/re-rank regression drops
    // recall below the bound and fails this gate.
    "q_knn_lsh" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5""".stripMargin,

    // q_multimodal_features: the corpus payloads are utf-8 text bytes, so
    // the codec's non-image path applies — a byte histogram
    // (bucket = byte mod 16) whose L2 norm the oracle recomputes per
    // character. ASCII-only corpus (asserted in RabinFingerprintSpec)
    // makes chars == bytes; the image path is pinned by MultimodalSpec
    // on generated PNGs.
    "q_multimodal_features" ->
      """WITH ix AS (
        |  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id, ascii(substr(text, CAST(i AS INTEGER), 1)) % 16 AS bkt
        |  FROM ix),
        |b AS (SELECT doc_id, bkt, count(*) AS c FROM ch GROUP BY 1, 2),
        |nrm AS (SELECT doc_id,
        |          round(sqrt(sum(CAST(c AS DOUBLE) * c)), 4) AS feature_norm
        |        FROM b GROUP BY 1)
        |SELECT d.doc_id AS item_id,
        |  CAST(coalesce(length(d.text), 0) AS BIGINT) AS n_bytes,
        |  coalesce(n.feature_norm, 0.0) AS feature_norm
        |FROM documents d LEFT JOIN nrm n ON d.doc_id = n.doc_id
        |ORDER BY item_id""".stripMargin,

    // duplicate clustering: the same ngram pair graph as
    // q_dedup_ngram_jaccard (restricted to 2 sources), components by a
    // recursive reachability CTE — min reachable id = component id
    "q_dedup_clusters" ->
      """WITH RECURSIVE tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE source IN ('src0', 'src1')),
        |sh AS (SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |           i -> array_to_string(t[i:i+2], ' '))) AS shingle
        |       FROM tk),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |it AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |       FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
        |       GROUP BY 1, 2),
        |p AS (SELECT doc_a, doc_b FROM it
        |      JOIN sizes sa ON it.doc_a = sa.doc_id
        |      JOIN sizes sb ON it.doc_b = sb.doc_id
        |      WHERE round(CAST(n_common AS DOUBLE) /
        |        CAST(sa.n + sb.n - n_common AS DOUBLE), 4) >= 0.01),
        |e AS (SELECT doc_a AS a, doc_b AS b FROM p
        |      UNION ALL SELECT doc_b, doc_a FROM p),
        |r AS (SELECT a AS v, a AS u FROM e
        |      UNION
        |      SELECT r.v, e.b FROM r JOIN e ON r.u = e.a),
        |comp AS (SELECT v AS doc_id, min(u) AS component FROM r GROUP BY v)
        |SELECT doc_id, component,
        |  count(*) OVER (PARTITION BY component) AS cluster_size
        |FROM comp ORDER BY doc_id""".stripMargin,

    // incremental clustering: the SAME full-corpus recursive-CTE oracle
    // as q_dedup_clusters — the store's two-batch arrival must land on
    // the identical resolved label set
    "q_dedup_clusters_incremental" ->
      """WITH RECURSIVE tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE source IN ('src0', 'src1')),
        |sh AS (SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |           i -> array_to_string(t[i:i+2], ' '))) AS shingle
        |       FROM tk),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |it AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |       FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
        |       GROUP BY 1, 2),
        |p AS (SELECT doc_a, doc_b FROM it
        |      JOIN sizes sa ON it.doc_a = sa.doc_id
        |      JOIN sizes sb ON it.doc_b = sb.doc_id
        |      WHERE round(CAST(n_common AS DOUBLE) /
        |        CAST(sa.n + sb.n - n_common AS DOUBLE), 4) >= 0.01),
        |e AS (SELECT doc_a AS a, doc_b AS b FROM p
        |      UNION ALL SELECT doc_b, doc_a FROM p),
        |r AS (SELECT a AS v, a AS u FROM e
        |      UNION
        |      SELECT r.v, e.b FROM r JOIN e ON r.u = e.a),
        |comp AS (SELECT v AS doc_id, min(u) AS component FROM r GROUP BY v)
        |SELECT doc_id, component,
        |  count(*) OVER (PARTITION BY component) AS cluster_size
        |FROM comp ORDER BY doc_id""".stripMargin,

    // survivors of duplicate clustering: same recursive-CTE components
    // as q_dedup_clusters; a doc survives iff it is unpaired or its
    // cluster's min id
    "q_dedup_keep" ->
      """WITH RECURSIVE tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE source IN ('src0', 'src1')),
        |sh AS (SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |           i -> array_to_string(t[i:i+2], ' '))) AS shingle
        |       FROM tk),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |it AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |       FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
        |       GROUP BY 1, 2),
        |p AS (SELECT doc_a, doc_b FROM it
        |      JOIN sizes sa ON it.doc_a = sa.doc_id
        |      JOIN sizes sb ON it.doc_b = sb.doc_id
        |      WHERE round(CAST(n_common AS DOUBLE) /
        |        CAST(sa.n + sb.n - n_common AS DOUBLE), 4) >= 0.01),
        |e AS (SELECT doc_a AS a, doc_b AS b FROM p
        |      UNION ALL SELECT doc_b, doc_a FROM p),
        |r AS (SELECT a AS v, a AS u FROM e
        |      UNION
        |      SELECT r.v, e.b FROM r JOIN e ON r.u = e.a),
        |comp AS (SELECT v AS doc_id, min(u) AS component FROM r GROUP BY v)
        |SELECT d.doc_id, d.source FROM documents d
        |WHERE d.source IN ('src0', 'src1')
        |  AND d.doc_id NOT IN
        |    (SELECT doc_id FROM comp WHERE doc_id <> component)
        |ORDER BY d.doc_id""".stripMargin,

    "q_sample_hash" ->
      """SELECT doc_id, source FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000'
        |ORDER BY doc_id""".stripMargin,

    // mixture weights -> 4-hex-digit thresholds (floor(f*65536)):
    // 1.0 -> 'g' (above every hex digit), 0.75 -> c000, 0.5 -> 8000,
    // 0.25 -> 4000, default 0.1 -> 1999
    "q_sample_mixture" ->
      """SELECT doc_id, source FROM documents
        |WHERE substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 4) <
        |  CASE source
        |    WHEN 'src0' THEN 'g' WHEN 'src1' THEN 'c000'
        |    WHEN 'src2' THEN '8000' WHEN 'src3' THEN '4000'
        |    ELSE '1999' END
        |ORDER BY doc_id""".stripMargin,

    "q_split_assign" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CASE WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
        |           THEN 'train'
        |         WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM s GROUP BY split ORDER BY split""".stripMargin,

    "q_sample_stratified" ->
      """SELECT source, doc_id, CAST(rn AS BIGINT) AS rank
        |FROM (SELECT source, doc_id,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)) AS rn
        |      FROM documents)
        |WHERE rn <= 3 ORDER BY source, rank""".stripMargin,

    "q_text_profile" ->
      """WITH base AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
        |feat AS (
        |  SELECT doc_id, text, tk,
        |    CAST(len(tk) AS BIGINT) AS n_tokens,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish,
        |    round(CAST(length(text) - len(tk) + 1 AS DOUBLE) /
        |      CAST(greatest(len(tk), 1) AS DOUBLE), 4) AS mean_tok_len,
        |    round(CAST(len(list_filter(tk, x -> x IN
        |        ('the','a','of','and','to','in','is','it'))) AS DOUBLE) /
        |      CAST(greatest(len(tk), 1) AS DOUBLE), 4) AS stopword_ratio,
        |    round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) /
        |      CAST(greatest(length(text), 1) AS DOUBLE), 4) AS punct_ratio,
        |    len(list_filter(tk, x -> x IN ('der','die','und','ist'))) AS h_de,
        |    len(list_filter(tk, x -> x IN ('the','and','of','is'))) AS h_en,
        |    len(list_filter(tk, x -> x IN ('el','los','y','es'))) AS h_es,
        |    len(list_filter(tk, x -> x IN ('le','la','et','est'))) AS h_fr
        |  FROM base)
        |SELECT doc_id, n_tokens, n_bpeish, mean_tok_len, stopword_ratio, punct_ratio,
        |  round((least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) +
        |         (1.0 - least(punct_ratio * 5.0, 1.0)) +
        |         least(stopword_ratio * 4.0, 1.0)) / 3.0, 4) AS quality,
        |  CASE
        |    WHEN h_de = greatest(h_de, h_en, h_es, h_fr) AND greatest(h_de, h_en, h_es, h_fr) > 0 THEN 'de'
        |    WHEN h_en = greatest(h_de, h_en, h_es, h_fr) AND greatest(h_de, h_en, h_es, h_fr) > 0 THEN 'en'
        |    WHEN h_es = greatest(h_de, h_en, h_es, h_fr) AND greatest(h_de, h_en, h_es, h_fr) > 0 THEN 'es'
        |    WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) AND greatest(h_de, h_en, h_es, h_fr) > 0 THEN 'fr'
        |    ELSE 'und' END AS pred_lang,
        |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
        |FROM feat ORDER BY doc_id""".stripMargin,

    // NOTE: RabinFingerprint hashes UTF-8 BYTES; this oracle folds per-
    // character code points (ascii(substr(...))). The two agree only on
    // ASCII text — which the synthetic corpus is (asserted in
    // RabinFingerprintSpec). Non-ASCII parity is covered on the Spark side
    // by the spec's multi-byte reference-value cases.
    "q_corpus_clean" ->
      """WITH base AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
        |feat AS (
        |  SELECT doc_id, text, tk,
        |    CAST(len(tk) AS BIGINT) AS n_tokens,
        |    round(CAST(len(list_filter(tk, x -> x IN
        |        ('the','a','of','and','to','in','is','it'))) AS DOUBLE) /
        |      CAST(greatest(len(tk), 1) AS DOUBLE), 4) AS stopword_ratio,
        |    round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) /
        |      CAST(greatest(length(text), 1) AS DOUBLE), 4) AS punct_ratio,
        |    len(list_filter(tk, x -> x IN ('der','die','und','ist'))) AS h_de,
        |    len(list_filter(tk, x -> x IN ('the','and','of','is'))) AS h_en,
        |    len(list_filter(tk, x -> x IN ('el','los','y','es'))) AS h_es,
        |    len(list_filter(tk, x -> x IN ('le','la','et','est'))) AS h_fr
        |  FROM base),
        |prof AS (
        |  SELECT doc_id, n_tokens,
        |    round((least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) +
        |           (1.0 - least(punct_ratio * 5.0, 1.0)) +
        |           least(stopword_ratio * 4.0, 1.0)) / 3.0, 4) AS quality,
        |    CASE
        |      WHEN h_de = greatest(h_de, h_en, h_es, h_fr) AND greatest(h_de, h_en, h_es, h_fr) > 0 THEN 'de'
        |      WHEN h_en = greatest(h_de, h_en, h_es, h_fr) AND greatest(h_de, h_en, h_es, h_fr) > 0 THEN 'en'
        |      WHEN h_es = greatest(h_de, h_en, h_es, h_fr) AND greatest(h_de, h_en, h_es, h_fr) > 0 THEN 'es'
        |      WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) AND greatest(h_de, h_en, h_es, h_fr) > 0 THEN 'fr'
        |      ELSE 'und' END AS pred_lang
        |  FROM feat),
        |keep AS (
        |  SELECT min(doc_id) AS doc_id FROM documents
        |  GROUP BY md5(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |SELECT p.doc_id, p.n_tokens, p.quality, p.pred_lang
        |FROM prof p JOIN keep k ON p.doc_id = k.doc_id
        |WHERE p.pred_lang = 'en' AND p.quality >= 0.4 AND p.n_tokens >= 5
        |ORDER BY p.doc_id""".stripMargin,

    "q_text_histogram" ->
      """SELECT source, CAST(least(floor(length(text) / 100), 9) AS BIGINT) AS bin,
        |  count(*) AS n
        |FROM documents WHERE text IS NOT NULL
        |GROUP BY source, bin ORDER BY source, bin""".stripMargin,

    "q_vocab_topk" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |SELECT token, count(*) AS freq FROM t GROUP BY token
        |ORDER BY freq DESC, token ASC LIMIT 20""".stripMargin,

    // int8 quantization: floor(x + 0.5) on BOTH sides — engines disagree
    // on round()'s half-tie rule, floor is bit-deterministic
    "q_embedding_quantize" ->
      """WITH b AS (
        |  SELECT vec_id,
        |    greatest(list_aggregate(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE))), 'max'), 1e-300) AS m,
        |    embedding AS e
        |  FROM embeddings),
        |q AS (SELECT vec_id, m,
        |        list_transform(e, x ->
        |          CAST(floor(CAST(x AS DOUBLE) * 127.0 / m + 0.5) AS BIGINT)) AS qv
        |      FROM b)
        |SELECT vec_id, m AS scale,
        |  CAST(list_aggregate(qv, 'sum') AS BIGINT) AS sum_q,
        |  CAST(len(list_filter(qv, v -> abs(v) = 127)) AS BIGINT) AS n_max
        |FROM q ORDER BY vec_id""".stripMargin,

    "q_fingerprint_rolling" ->
      """SELECT doc_id,
        |  list_reduce(list_transform(range(1, length(text) + 1),
        |    i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
        |    (a, x) -> (a * 31 + x) % 2147483647) AS rhash
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_knn_bruteforce" ->
      """WITH idx AS (SELECT unnest(range(1, 65)) AS i),
        |q AS (SELECT vec_id AS qid, embedding AS e FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS nid, embedding AS e FROM embeddings WHERE vec_id >= 5),
        |qe AS (SELECT qid, i, CAST(e[i] AS DOUBLE) AS x FROM q, idx),
        |ce AS (SELECT nid, i, CAST(e[i] AS DOUBLE) AS x FROM c, idx),
        |qn AS (SELECT qid, sqrt(sum(x * x)) AS nrm FROM qe GROUP BY qid),
        |cn AS (SELECT nid, sqrt(sum(x * x)) AS nrm FROM ce GROUP BY nid),
        |dots AS (SELECT qid, nid, sum(qe.x * ce.x) AS dot
        |         FROM qe JOIN ce USING (i) GROUP BY qid, nid),
        |scored AS (SELECT qid AS query_id, nid AS neighbor_id,
        |             round(dot / (qn.nrm * cn.nrm), 4) AS cosine
        |           FROM dots JOIN qn USING (qid) JOIN cn USING (nid)),
        |ranked AS (SELECT query_id, neighbor_id, cosine,
        |             CAST(row_number() OVER (PARTITION BY query_id
        |               ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
        |           FROM scored)
        |SELECT query_id, neighbor_id, cosine, rank FROM ranked
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    // exhaustive-probe IVF must equal brute force — same oracle shape
    "q_knn_ivf" ->
      """WITH idx AS (SELECT unnest(range(1, 65)) AS i),
        |q AS (SELECT vec_id AS qid, embedding AS e FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS nid, embedding AS e FROM embeddings WHERE vec_id >= 5),
        |qe AS (SELECT qid, i, CAST(e[i] AS DOUBLE) AS x FROM q, idx),
        |ce AS (SELECT nid, i, CAST(e[i] AS DOUBLE) AS x FROM c, idx),
        |qn AS (SELECT qid, sqrt(sum(x * x)) AS nrm FROM qe GROUP BY qid),
        |cn AS (SELECT nid, sqrt(sum(x * x)) AS nrm FROM ce GROUP BY nid),
        |dots AS (SELECT qid, nid, sum(qe.x * ce.x) AS dot
        |         FROM qe JOIN ce USING (i) GROUP BY qid, nid),
        |scored AS (SELECT qid AS query_id, nid AS neighbor_id,
        |             round(dot / (qn.nrm * cn.nrm), 4) AS cosine
        |           FROM dots JOIN qn USING (qid) JOIN cn USING (nid)),
        |ranked AS (SELECT query_id, neighbor_id, cosine,
        |             CAST(row_number() OVER (PARTITION BY query_id
        |               ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
        |           FROM scored)
        |SELECT query_id, neighbor_id, cosine, rank FROM ranked
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    // BM25 keyword retrieval — the full formula recomputed in SQL:
    // Lucene-form idf ln(1 + (N - df + .5)/(df + .5)), k1 = 1.2,
    // b = 0.75; the 4-dp round lands BEFORE ranking in both engines so
    // sum-order float drift cannot flip a rank
    "q_bm25_search" ->
      """WITH q(query_id, query) AS (VALUES
        |    (CAST(0 AS BIGINT), 'hash join merge'),
        |    (CAST(1 AS BIGINT), 'scan filter column')),
        |qterms AS (SELECT DISTINCT query_id,
        |    unnest(string_split(query, ' ')) AS term FROM q),
        |dls AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        |  FROM documents),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |    avg(dl) AS avgdl FROM dls),
        |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |postings AS (
        |  SELECT term, t.doc_id, dl, CAST(count(*) AS DOUBLE) AS tf
        |  FROM toks t JOIN dls USING (doc_id)
        |  WHERE term IN (SELECT term FROM qterms)
        |  GROUP BY term, t.doc_id, dl),
        |dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
        |  FROM postings GROUP BY term),
        |scored AS (
        |  SELECT query_id, doc_id,
        |    round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2
        |      / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25
        |  FROM postings JOIN dft USING (term) JOIN qterms USING (term), stats
        |  GROUP BY query_id, doc_id),
        |ranked AS (SELECT query_id, doc_id, bm25,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY bm25 DESC, doc_id ASC) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT query_id, doc_id, bm25, rank FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // BM25 through the persisted inverted index (r14): identical output
    // contract to the scan operator, so the oracle is q_bm25_search's
    // full-formula SQL verbatim — the gate thereby asserts the pruned
    // index read loses nothing vs the corpus scan
    "q_bm25_index" ->
      """WITH q(query_id, query) AS (VALUES
        |    (CAST(0 AS BIGINT), 'hash join merge'),
        |    (CAST(1 AS BIGINT), 'scan filter column')),
        |qterms AS (SELECT DISTINCT query_id,
        |    unnest(string_split(query, ' ')) AS term FROM q),
        |dls AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        |  FROM documents),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |    avg(dl) AS avgdl FROM dls),
        |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |postings AS (
        |  SELECT term, t.doc_id, dl, CAST(count(*) AS DOUBLE) AS tf
        |  FROM toks t JOIN dls USING (doc_id)
        |  WHERE term IN (SELECT term FROM qterms)
        |  GROUP BY term, t.doc_id, dl),
        |dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
        |  FROM postings GROUP BY term),
        |scored AS (
        |  SELECT query_id, doc_id,
        |    round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2
        |      / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25
        |  FROM postings JOIN dft USING (term) JOIN qterms USING (term), stats
        |  GROUP BY query_id, doc_id),
        |ranked AS (SELECT query_id, doc_id, bm25,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY bm25 DESC, doc_id ASC) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT query_id, doc_id, bm25, rank FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,


    // DSIR importance selection — the full hashed-bucket LLR formula in
    // SQL: md5-prefix buckets (B=4096), add-one smoothing on both the
    // target (lang='en') and raw distributions, per-doc occurrence sum
    // rounded at 4 dp BEFORE ranking (the BM25 rule)
    "q_importance_topk" ->
      """WITH tok AS (SELECT doc_id, lang = 'en' AS t,
        |    unnest(string_split(text, ' ')) AS token FROM documents),
        |b AS (SELECT doc_id, t, substr(md5(token), 1, 3) AS bucket FROM tok),
        |counts AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_raw,
        |    CAST(count(*) FILTER (WHERE t) AS BIGINT) AS n_tgt
        |  FROM b GROUP BY bucket),
        |tot AS (SELECT CAST(sum(n_raw) AS DOUBLE) AS nr,
        |    CAST(sum(n_tgt) AS DOUBLE) AS nt FROM counts),
        |w AS (SELECT bucket,
        |    ln((n_tgt + 1) / (nt + 4096)) - ln((n_raw + 1) / (nr + 4096)) AS w
        |  FROM counts, tot),
        |scored AS (SELECT doc_id, round(sum(w), 4) AS importance
        |  FROM b JOIN w USING (bucket) GROUP BY doc_id)
        |SELECT doc_id, importance FROM scored
        |ORDER BY importance DESC, doc_id ASC LIMIT 50""".stripMargin,

    // Gumbel-top-k resample: same scores, selection by noisy key. The
    // seeded uniform is six md5 hex digits decoded positionally (exact
    // powers of two, so the sum is bit-exact in any engine); the ln()
    // ulp drift is absorbed by the 4-dp round before ranking
    "q_importance_resample" ->
      """WITH tok AS (SELECT doc_id, lang = 'en' AS t,
        |    unnest(string_split(text, ' ')) AS token FROM documents),
        |b AS (SELECT doc_id, t, substr(md5(token), 1, 3) AS bucket FROM tok),
        |counts AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_raw,
        |    CAST(count(*) FILTER (WHERE t) AS BIGINT) AS n_tgt
        |  FROM b GROUP BY bucket),
        |tot AS (SELECT CAST(sum(n_raw) AS DOUBLE) AS nr,
        |    CAST(sum(n_tgt) AS DOUBLE) AS nt FROM counts),
        |w AS (SELECT bucket,
        |    ln((n_tgt + 1) / (nt + 4096)) - ln((n_raw + 1) / (nr + 4096)) AS w
        |  FROM counts, tot),
        |scored AS (SELECT doc_id, round(sum(w), 4) AS importance
        |  FROM b JOIN w USING (bucket) GROUP BY doc_id),
        |h AS (SELECT doc_id, importance,
        |    md5('dsir' || CAST(doc_id AS VARCHAR)) AS h FROM scored),
        |u AS (SELECT doc_id, importance,
        |    (CASE WHEN ascii(substr(h, 1, 1)) >= 97
        |      THEN ascii(substr(h, 1, 1)) - 87 ELSE ascii(substr(h, 1, 1)) - 48 END) * 0.0625
        |  + (CASE WHEN ascii(substr(h, 2, 1)) >= 97
        |      THEN ascii(substr(h, 2, 1)) - 87 ELSE ascii(substr(h, 2, 1)) - 48 END) * 0.00390625
        |  + (CASE WHEN ascii(substr(h, 3, 1)) >= 97
        |      THEN ascii(substr(h, 3, 1)) - 87 ELSE ascii(substr(h, 3, 1)) - 48 END) * 0.000244140625
        |  + (CASE WHEN ascii(substr(h, 4, 1)) >= 97
        |      THEN ascii(substr(h, 4, 1)) - 87 ELSE ascii(substr(h, 4, 1)) - 48 END) * 1.52587890625e-05
        |  + (CASE WHEN ascii(substr(h, 5, 1)) >= 97
        |      THEN ascii(substr(h, 5, 1)) - 87 ELSE ascii(substr(h, 5, 1)) - 48 END) * 9.5367431640625e-07
        |  + (CASE WHEN ascii(substr(h, 6, 1)) >= 97
        |      THEN ascii(substr(h, 6, 1)) - 87 ELSE ascii(substr(h, 6, 1)) - 48 END) * 5.960464477539063e-08
        |  + 2.9802322387695312e-08 AS u FROM h)
        |SELECT doc_id, importance,
        |  round(importance / 2.0 - ln(-ln(u)), 4) AS gumbel_key
        |FROM u ORDER BY gumbel_key DESC, doc_id ASC LIMIT 50""".stripMargin,

    // span (ExactSubstr-style) dedup, detection half: duplicated
    // 10-token windows ranked by (doc_id, pos); rank 1 is the keeper,
    // every later occurrence is a span to cut — the same total order
    // the Spark side's min(struct(doc_id, pos)) selects
    "q_span_dedup" -> spanDedupSql,

    // incremental span dedup: first-arrival keepers under the gate's
    // doc_id-ORDERED two-batch split equal the one-shot global-min
    // keepers, so the union of batch span sets is the full-corpus span
    // set — the oracle is the one-shot text verbatim
    "q_span_dedup_incremental" -> spanDedupSql,

    // span dedup, rewrite half: surviving tokens re-joined in position
    // order for every doc a span touched; a fully-covered doc keeps ''
    // (LEFT JOIN + coalesce — string_agg over zero rows yields no row)
    "q_span_dedup_clean" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |win AS (
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
        |    array_to_string(toks[i:i+9], ' ') AS wtext
        |  FROM d, UNNEST(generate_series(1, len(toks) - 9)) AS t(i)
        |),
        |dup AS (SELECT wtext FROM win GROUP BY wtext HAVING count(*) >= 2),
        |ranked AS (
        |  SELECT w.doc_id, w.pos,
        |    row_number() OVER (PARTITION BY w.wtext ORDER BY w.doc_id, w.pos) AS rn
        |  FROM win w JOIN dup USING (wtext)
        |),
        |spans AS (SELECT doc_id, pos FROM ranked WHERE rn > 1),
        |tok AS (
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, toks[i] AS tok
        |  FROM d, UNNEST(generate_series(1, len(toks))) AS t(i)
        |),
        |surv AS (
        |  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.p) AS text_clean
        |  FROM tok t
        |  WHERE NOT EXISTS (SELECT 1 FROM spans s
        |    WHERE s.doc_id = t.doc_id AND t.p BETWEEN s.pos AND s.pos + 9)
        |  GROUP BY t.doc_id
        |)
        |SELECT c.doc_id, coalesce(v.text_clean, '') AS text_clean
        |FROM (SELECT DISTINCT doc_id FROM spans) c
        |LEFT JOIN surv v USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // hybrid retrieval — BM25 (the q_bm25_search formula, top-10) full-
    // outer-joined with exact cosine (queries = embeddings 0/1 over the
    // whole table, top-10), RRF k0=60, fused rank <= 5. CAST(1 AS
    // DOUBLE): a bare 1.0 is DECIMAL in DuckDB and the division must
    // stay IEEE double to match Spark bit-for-bit
    "q_hybrid_search" ->
      """WITH q(query_id, query) AS (VALUES
        |    (CAST(0 AS BIGINT), 'hash join merge'),
        |    (CAST(1 AS BIGINT), 'scan filter column')),
        |qterms AS (SELECT DISTINCT query_id,
        |    unnest(string_split(query, ' ')) AS term FROM q),
        |dls AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        |  FROM documents),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |    avg(dl) AS avgdl FROM dls),
        |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |postings AS (
        |  SELECT term, t.doc_id, dl, CAST(count(*) AS DOUBLE) AS tf
        |  FROM toks t JOIN dls USING (doc_id)
        |  WHERE term IN (SELECT term FROM qterms)
        |  GROUP BY term, t.doc_id, dl),
        |dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
        |  FROM postings GROUP BY term),
        |bscored AS (
        |  SELECT query_id, doc_id,
        |    round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2
        |      / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25
        |  FROM postings JOIN dft USING (term) JOIN qterms USING (term), stats
        |  GROUP BY query_id, doc_id),
        |lex AS (SELECT query_id, doc_id,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY bm25 DESC, doc_id ASC) AS INTEGER) AS rank
        |  FROM bscored QUALIFY rank <= 10),
        |idx AS (SELECT unnest(range(1, 65)) AS i),
        |qv AS (SELECT vec_id AS qid, embedding AS e FROM embeddings WHERE vec_id < 2),
        |cv AS (SELECT vec_id AS nid, embedding AS e FROM embeddings),
        |qe AS (SELECT qid, i, CAST(e[i] AS DOUBLE) AS x FROM qv, idx),
        |ce AS (SELECT nid, i, CAST(e[i] AS DOUBLE) AS x FROM cv, idx),
        |qn AS (SELECT qid, sqrt(sum(x * x)) AS nrm FROM qe GROUP BY qid),
        |cn AS (SELECT nid, sqrt(sum(x * x)) AS nrm FROM ce GROUP BY nid),
        |dots AS (SELECT qid, nid, sum(qe.x * ce.x) AS dot
        |         FROM qe JOIN ce USING (i) GROUP BY qid, nid),
        |sscored AS (SELECT qid AS query_id, nid AS doc_id,
        |             round(dot / (qn.nrm * cn.nrm), 4) AS cosine
        |           FROM dots JOIN qn USING (qid) JOIN cn USING (nid)),
        |sem AS (SELECT query_id, doc_id,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, doc_id ASC) AS INTEGER) AS rank
        |  FROM sscored QUALIFY rank <= 10),
        |fused AS (
        |  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
        |         COALESCE(l.doc_id, s.doc_id) AS doc_id,
        |         round(COALESCE(CAST(1 AS DOUBLE) / (60 + l.rank), 0)
        |             + COALESCE(CAST(1 AS DOUBLE) / (60 + s.rank), 0), 6) AS rrf
        |  FROM lex l FULL OUTER JOIN sem s
        |    ON l.query_id = s.query_id AND l.doc_id = s.doc_id),
        |ranked AS (SELECT query_id, doc_id, rrf,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY rrf DESC, doc_id ASC) AS INTEGER) AS rank
        |  FROM fused)
        |SELECT query_id, doc_id, rrf, rank FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // token-budget selection — the same prefix cumsum in SQL. ROWS
    // frame spelled out: the default RANGE frame would include ORDER BY
    // peers, and although (n_chars, doc_id) is tie-free the contract
    // should not depend on that
    "q_token_budget" ->
      """SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens FROM (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    sum(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
        |      ORDER BY n_chars DESC, doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM documents) t
        |WHERE cum_tokens <= 5000
        |ORDER BY cum_tokens ASC""".stripMargin,

    // Curation pipeline: the q_corpus_clean quality formula + md5-digest
    // keep-min dedup + the q_decontaminate 3-gram overlap + the
    // q_token_budget window cumsum, composed sequentially; a doc is
    // charged to the FIRST stage dropping it. Budget = floor(60 % of
    // the stage-3 survivors' tokens) — exact IEEE product both sides.
    "q_curation_funnel" ->
      s"""$curationLab,
        |stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_in,
        |    CAST(sum(CASE WHEN exit = 'quality' THEN 1 ELSE 0 END) AS BIGINT) AS n_q,
        |    CAST(sum(CASE WHEN exit = 'exact_dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_d,
        |    CAST(sum(CASE WHEN exit = 'contaminated' THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
        |    CAST(sum(CASE WHEN exit IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_s,
        |    CAST(sum(CASE WHEN exit IS NULL THEN n_tokens ELSE 0 END) AS BIGINT) AS t_s,
        |    CAST(sum(CASE WHEN exit = 'contaminated' OR exit IS NULL THEN n_tokens ELSE 0 END) AS BIGINT) AS t_2,
        |    CAST(sum(CASE WHEN exit IS NOT NULL AND exit <> 'quality' OR exit IS NULL THEN n_tokens ELSE 0 END) AS BIGINT) AS t_1
        |  FROM lab),
        |sel AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_b,
        |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t_b
        |  FROM (SELECT n_tokens, sum(n_tokens) OVER (
        |          ORDER BY quality DESC, doc_id ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |        FROM lab WHERE exit IS NULL) s, stats
        |  WHERE cum <= CAST(floor(0.6 * t_s) AS BIGINT))
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage_idx, 'quality' AS stage,
        |    n_in AS docs_in, n_in - n_q AS docs_out, t_1 AS tokens_out FROM stats
        |  UNION ALL SELECT 2, 'exact_dup', n_in - n_q, n_in - n_q - n_d, t_2 FROM stats
        |  UNION ALL SELECT 3, 'contaminated', n_in - n_q - n_d, n_s, t_s FROM stats
        |  UNION ALL SELECT 4, 'budget', n_s, n_b, t_b FROM stats, sel)
        |ORDER BY stage_idx""".stripMargin,

    // Five-stage funnel with the fuzzy pass: the curationLab quality /
    // exact-dedup fragments, then TRUE 3-gram jaccard >= 0.8 pairs over
    // the stage-2 survivors (the q_dedup_minhash_lsh oracle equivalence:
    // LSH only blocks, banding recall is 1 at 0.8, the exact verify
    // defines the set), connected components by recursive CTE (the
    // q_dedup_clusters convention, min-id canonical), non-representative
    // members charged to near_dup; decontamination and the 60 % budget
    // close the funnel.
    "q_curation_neardup" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents WHERE source <> 'src0'),
        |feat AS (
        |  SELECT doc_id, text,
        |    CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT) AS n_tokens,
        |    round((least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) +
        |           (1.0 - least(round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) /
        |             CAST(greatest(length(text), 1) AS DOUBLE), 4) * 5.0, 1.0)) +
        |           least(round(CAST(len(list_filter(string_split(text, ' '), x -> x IN
        |               ('the','a','of','and','to','in','is','it'))) AS DOUBLE) /
        |             CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE), 4) * 4.0, 1.0)) / 3.0, 4) AS quality,
        |    md5(text) AS digest
        |  FROM corpus),
        |lab0 AS (
        |  SELECT *, (text IS NOT NULL AND quality >= 0.4) AS qpass FROM feat),
        |withk AS (
        |  SELECT *, min(CASE WHEN qpass THEN doc_id END)
        |    OVER (PARTITION BY digest) AS keeper FROM lab0),
        |tk2 AS (SELECT doc_id, string_split(text, ' ') AS t FROM withk
        |        WHERE qpass AND doc_id = keeper),
        |sh2 AS (SELECT DISTINCT doc_id,
        |          unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |            i -> array_to_string(t[i:i+2], ' '))) AS shingle
        |        FROM tk2),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
        |it AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |       FROM sh2 a JOIN sh2 b USING (shingle) WHERE a.doc_id < b.doc_id
        |       GROUP BY 1, 2),
        |p AS (SELECT doc_a, doc_b FROM it
        |      JOIN sizes sa ON it.doc_a = sa.doc_id
        |      JOIN sizes sb ON it.doc_b = sb.doc_id
        |      WHERE round(CAST(n_common AS DOUBLE) /
        |        CAST(sa.n + sb.n - n_common AS DOUBLE), 4) >= 0.8),
        |e AS (SELECT doc_a AS a, doc_b AS b FROM p
        |      UNION ALL SELECT doc_b, doc_a FROM p),
        |r AS (SELECT a AS v, a AS u FROM e
        |      UNION
        |      SELECT r.v, e.b FROM r JOIN e ON r.u = e.a),
        |ndrop AS (SELECT v AS doc_id FROM
        |            (SELECT v, min(u) AS component FROM r GROUP BY v)
        |          WHERE v <> component),
        |tkc AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |shc AS (SELECT DISTINCT doc_id, source,
        |          unnest(list_transform(range(1, greatest(len(t) - 4, 1) + 1),
        |            i -> array_to_string(t[i:i+4], ' '))) AS g
        |        FROM tkc),
        |bgc AS (SELECT DISTINCT g FROM shc WHERE source = 'src0'),
        |contam AS (SELECT shc.doc_id FROM shc JOIN bgc USING (g)
        |           WHERE shc.source <> 'src0'
        |           GROUP BY shc.doc_id HAVING count(*) >= 1),
        |lab AS (
        |  SELECT doc_id, n_tokens, quality,
        |    CASE WHEN NOT qpass THEN 'quality'
        |         WHEN doc_id <> keeper THEN 'exact_dup'
        |         WHEN doc_id IN (SELECT doc_id FROM ndrop) THEN 'near_dup'
        |         WHEN doc_id IN (SELECT doc_id FROM contam) THEN 'contaminated'
        |         END AS exit
        |  FROM withk),
        |stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_in,
        |    CAST(sum(CASE WHEN exit = 'quality' THEN 1 ELSE 0 END) AS BIGINT) AS n_q,
        |    CAST(sum(CASE WHEN exit = 'exact_dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_d,
        |    CAST(sum(CASE WHEN exit = 'near_dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_n,
        |    CAST(sum(CASE WHEN exit = 'contaminated' THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
        |    CAST(sum(CASE WHEN exit IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_s,
        |    CAST(sum(CASE WHEN exit IS NULL THEN n_tokens ELSE 0 END) AS BIGINT) AS t_s,
        |    CAST(sum(CASE WHEN exit = 'contaminated' OR exit IS NULL THEN n_tokens ELSE 0 END) AS BIGINT) AS t_2b,
        |    CAST(sum(CASE WHEN exit IN ('near_dup', 'contaminated') OR exit IS NULL THEN n_tokens ELSE 0 END) AS BIGINT) AS t_2,
        |    CAST(sum(CASE WHEN exit IS NOT NULL AND exit <> 'quality' OR exit IS NULL THEN n_tokens ELSE 0 END) AS BIGINT) AS t_1
        |  FROM lab),
        |sel AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_b,
        |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t_b
        |  FROM (SELECT n_tokens, sum(n_tokens) OVER (
        |          ORDER BY quality DESC, doc_id ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |        FROM lab WHERE exit IS NULL) s, stats
        |  WHERE cum <= CAST(floor(0.6 * t_s) AS BIGINT))
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage_idx, 'quality' AS stage,
        |    n_in AS docs_in, n_in - n_q AS docs_out, t_1 AS tokens_out FROM stats
        |  UNION ALL SELECT 2, 'exact_dup', n_in - n_q, n_in - n_q - n_d, t_2 FROM stats
        |  UNION ALL SELECT 3, 'near_dup', n_in - n_q - n_d, n_in - n_q - n_d - n_n, t_2b FROM stats
        |  UNION ALL SELECT 4, 'contaminated', n_in - n_q - n_d - n_n, n_s, t_s FROM stats
        |  UNION ALL SELECT 5, 'budget', n_s, n_b, t_b FROM stats, sel)
        |ORDER BY stage_idx""".stripMargin,

    "q_curation_docs" ->
      s"""$curationLab,
        |tot AS (SELECT sum(n_tokens) AS t_s FROM lab WHERE exit IS NULL),
        |sel AS (SELECT doc_id, n_tokens, CAST(sum(n_tokens) OVER (
        |          ORDER BY quality DESC, doc_id ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |        FROM lab WHERE exit IS NULL)
        |SELECT doc_id, n_tokens, cum_tokens FROM sel, tot
        |WHERE cum_tokens <= CAST(floor(0.6 * t_s) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,

    // SemDeDup: k-means cells are engine-specific, so the gate checks
    // the operator's guarantees in-engine (no over-removal vs exact
    // cosine, planted-clone recall) and the oracle pins corpus size +
    // the expected flags (q_knn_lsh convention). +25 = planted clones.
    "q_semantic_dedup" ->
      """SELECT CAST(count(*) + 25 AS BIGINT) AS n_docs,
        |  TRUE AS no_overremoval_ok, TRUE AS planted_recall_ok
        |FROM embeddings""".stripMargin,

    // banded pair probe (r14 verdict #2): flags pinned — the planted
    // near-dup pairs must surface in the NON-clone bands and read fully
    // co-celled at gate scale (the q_knn_lsh convention)
    "q_semdedup_recall_probe" ->
      """SELECT CAST(count(*) + 25 AS BIGINT) AS n_docs,
        |  TRUE AS near_pairs_ok, TRUE AS near_recall_ok
        |FROM embeddings""".stripMargin,

    // coded (IVF-PQ) probe: recall boolean, the q_knn_lsh convention —
    // the Spark side computes recall against ITS exact brute force; the
    // oracle pins the query count and the expected flag
    "q_knn_ivf_pq" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5""".stripMargin,

    // persisted-IVF exhaustive probe — must equal brute force, same SQL
    "q_knn_ivf_index" ->
      """WITH idx AS (SELECT unnest(range(1, 65)) AS i),
        |q AS (SELECT vec_id AS qid, embedding AS e FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS nid, embedding AS e FROM embeddings WHERE vec_id >= 5),
        |qe AS (SELECT qid, i, CAST(e[i] AS DOUBLE) AS x FROM q, idx),
        |ce AS (SELECT nid, i, CAST(e[i] AS DOUBLE) AS x FROM c, idx),
        |qn AS (SELECT qid, sqrt(sum(x * x)) AS nrm FROM qe GROUP BY qid),
        |cn AS (SELECT nid, sqrt(sum(x * x)) AS nrm FROM ce GROUP BY nid),
        |dots AS (SELECT qid, nid, sum(qe.x * ce.x) AS dot
        |         FROM qe JOIN ce USING (i) GROUP BY qid, nid),
        |scored AS (SELECT qid AS query_id, nid AS neighbor_id,
        |             round(dot / (qn.nrm * cn.nrm), 4) AS cosine
        |           FROM dots JOIN qn USING (qid) JOIN cn USING (nid)),
        |ranked AS (SELECT query_id, neighbor_id, cosine,
        |             CAST(row_number() OVER (PARTITION BY query_id
        |               ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
        |           FROM scored)
        |SELECT query_id, neighbor_id, cosine, rank FROM ranked
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,


    "q_embedding_norm" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dims,
        |  round(sqrt(list_aggregate(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    // winnowing over md5-hex grams: positional 5-gram fingerprints,
    // lexicographic min per 4-window, distinct sorted sketch
    "q_winnowing" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id,
        |        list_transform(range(1, greatest(len(t) - 4, 1) + 1),
        |          i -> md5(array_to_string(t[i:i+4], ' '))) AS gs
        |      FROM tk),
        |s AS (SELECT doc_id,
        |        list_sort(list_distinct(list_transform(range(1, len(gs) - 2),
        |          j -> list_aggregate(gs[j:j+3], 'min')))) AS sk
        |      FROM g WHERE len(gs) >= 4)
        |SELECT doc_id, CAST(len(sk) AS BIGINT) AS sketch_size, sk[1] AS min_fp
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id AS item_id, 'text' AS modality,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  'utf8' AS codec,
        |  CAST(floor((length(text) - 1) / 16) + 1 AS BIGINT) AS n_sampled
        |FROM documents ORDER BY item_id""".stripMargin,

    // decontamination: distinct 3-grams of each non-src0 doc that appear
    // anywhere in src0 (the stand-in eval benchmark); engine counts
    // hashed grams — equal up to xxhash64 collisions
    "q_decontaminate" ->
      """WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS t
        |            FROM documents),
        |sh AS (SELECT DISTINCT doc_id, source,
        |         unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |           i -> array_to_string(t[i:i+2], ' '))) AS g
        |       FROM tk),
        |bg AS (SELECT DISTINCT g FROM sh WHERE source = 'src0')
        |SELECT doc_id, count(*) AS n_contaminated_grams
        |FROM sh JOIN bg USING (g)
        |WHERE sh.source <> 'src0'
        |GROUP BY doc_id
        |HAVING count(*) >= 1
        |ORDER BY doc_id""".stripMargin,

    // sequence packing: per-source running token offset in doc_id order,
    // cut into 512-token packs (concat-then-chunk layout)
    "q_seq_packing" ->
      """WITH d AS (SELECT source AS shard, doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |           FROM documents),
        |o AS (SELECT shard, doc_id, n_tokens,
        |        CAST(coalesce(sum(n_tokens) OVER (
        |          PARTITION BY shard ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS tok_offset
        |      FROM d)
        |SELECT shard, doc_id, n_tokens, tok_offset,
        |  CAST(floor(tok_offset / 512.0) AS BIGINT) AS first_pack,
        |  CAST(floor((tok_offset + n_tokens - 1) / 512.0) AS BIGINT) AS last_pack
        |FROM o ORDER BY shard, doc_id""".stripMargin,

    // PII redaction over the deterministic PII-bearing string built from
    // customer (see Queries.qPiiRedact); patterns are lookaround-free so
    // java.util.regex and DuckDB's RE2 agree
    "q_pii_redact" ->
      """WITH raw AS (
        |  SELECT c_custkey,
        |    concat('reach ', c_name, ' at user', CAST(c_custkey AS VARCHAR),
        |      '@mail.example',
        |      CASE WHEN c_custkey % 2 = 0
        |        THEN concat(' or +1-555-',
        |          lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0'))
        |        ELSE '' END,
        |      CASE WHEN c_custkey % 3 = 0
        |        THEN concat(' ip 10.0.', CAST(c_custkey % 256 AS VARCHAR), '.1')
        |        ELSE '' END) AS t
        |  FROM customer)
        |SELECT c_custkey,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
        |    '(\+[0-9]{1,2}-)?[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS masked,
        |  CAST(len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t,
        |    '(\+[0-9]{1,2}-)?[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(t,
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips
        |FROM raw ORDER BY c_custkey""".stripMargin,

    // incremental exact dedup: batch 2 (src0/src1) judged against the
    // store built from every other source — whole-corpus SQL restatement
    "q_dedup_incremental" ->
      """WITH b1 AS (SELECT doc_id, md5(text) AS digest FROM documents
        |            WHERE source NOT IN ('src0', 'src1')),
        |b2 AS (SELECT doc_id, md5(text) AS digest FROM documents
        |       WHERE source IN ('src0', 'src1')),
        |k1 AS (SELECT digest, min(doc_id) AS keep FROM b1 GROUP BY digest),
        |k2 AS (SELECT digest, min(doc_id) AS bkeep FROM b2 GROUP BY digest)
        |SELECT b2.doc_id, b2.digest,
        |  CASE WHEN k1.keep IS NOT NULL THEN k1.keep
        |       WHEN k2.bkeep < b2.doc_id THEN k2.bkeep END AS dup_of
        |FROM b2
        |LEFT JOIN k1 USING (digest)
        |JOIN k2 USING (digest)
        |ORDER BY doc_id""".stripMargin,

    // q_dedup_incremental_ngram: the union over batch arrivals IS the
    // engine-independent exact-Jaccard pair set over the five-source
    // subset, so the oracle recomputes the full output values — the
    // strongest oracle form in the incremental family.
    "q_dedup_incremental_ngram" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t
        |            FROM documents
        |            WHERE source IN ('src0','src1','src5','src12','src13')),
        |sh AS (SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |           i -> array_to_string(t[i:i+2], ' '))) AS shingle
        |       FROM tk),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |it AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |       FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
        |       GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_common,
        |  round(CAST(n_common AS DOUBLE) /
        |    CAST(sa.n + sb.n - n_common AS DOUBLE), 4) AS jaccard
        |FROM it JOIN sizes sa ON it.doc_a = sa.doc_id
        |        JOIN sizes sb ON it.doc_b = sb.doc_id
        |WHERE round(CAST(n_common AS DOUBLE) /
        |    CAST(sa.n + sb.n - n_common AS DOUBLE), 4) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,

    // q_dedup_incremental_simhash: the store-path contract (incremental
    // union ≡ full-corpus one-shot) is checked Spark-side — both sides
    // are simhash computations no SQL engine reproduces — and surfaces
    // as the inc_eq_full boolean; the oracle recomputes the
    // engine-independent true-pair count (the same brute force as
    // q_dedup_simhash, over the gate's five-source subset) and
    // expects both booleans TRUE.
    "q_dedup_incremental_simhash" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t
        |            FROM documents
        |            WHERE source IN ('src0','src1','src5','src12','src13')),
        |sh AS (SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |           i -> array_to_string(t[i:i+2], ' '))) AS shingle
        |       FROM tk),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |it AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |       FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
        |       GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
        |  TRUE AS inc_eq_full, TRUE AS recall_ok
        |FROM it JOIN sizes sa ON it.doc_a = sa.doc_id
        |        JOIN sizes sb ON it.doc_b = sb.doc_id
        |WHERE round(CAST(n_common AS DOUBLE) /
        |    CAST(sa.n + sb.n - n_common AS DOUBLE), 4) >= 0.9""".stripMargin,

    // z-order key: 16+16-bit Morton interleave as an explicit bitwise
    // expression (generated term list — identical math to Layout.morton2)
    "q_zorder_key" -> {
      val terms = (0 until 16).flatMap { b =>
        Seq(s"(((l_partkey >> $b) & 1) << ${2 * b})",
          s"(((l_suppkey >> $b) & 1) << ${2 * b + 1})")
      }.mkString(" | ")
      s"""SELECT DISTINCT l_partkey, l_suppkey, ($terms) AS zorder
         |FROM lineitem
         |ORDER BY zorder, l_partkey, l_suppkey""".stripMargin
    },

    // skew-salted join is SEMANTICALLY a plain inner join — the salt
    // only changes physical distribution, so the oracle is the join
    "q_skew_salted_join" ->
      """SELECT l_suppkey AS s_suppkey, s_name,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1, 2
        |ORDER BY s_suppkey""".stripMargin,

    // two-stage heavy hitters ≡ the textbook windowed top-k
    "q_heavy_hitters" ->
      """SELECT l_returnflag, l_partkey, n, CAST(rank AS INT) AS rank FROM (
        |  SELECT l_returnflag, l_partkey, n,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY n DESC, l_partkey ASC) AS rank
        |  FROM (SELECT l_returnflag, l_partkey,
        |          CAST(count(*) AS BIGINT) AS n
        |        FROM lineitem GROUP BY 1, 2))
        |WHERE rank <= 5
        |ORDER BY l_returnflag, rank""".stripMargin,

    // intra-document repetition: positional vs distinct 3-gram counts
    "q_text_repetition" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id,
        |        list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |          i -> array_to_string(t[i:i+2], ' ')) AS gs
        |      FROM tk)
        |SELECT doc_id,
        |  CAST(len(gs) AS BIGINT) AS n_grams,
        |  CAST(len(list_distinct(gs)) AS BIGINT) AS n_distinct_grams,
        |  round(1.0 - CAST(len(list_distinct(gs)) AS DOUBLE)
        |    / CAST(len(gs) AS DOUBLE), 4) AS rep_ratio
        |FROM g ORDER BY doc_id""".stripMargin
  )
}
