package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level (span) deduplication — the ExactSubstr recipe: find
  * every `w`-token window whose text occurs MORE THAN ONCE across the
  * corpus, keep the first occurrence, and cut the covered tokens out of
  * every other document. Doc-level dedup (exact/MinHash/SimHash) removes
  * whole near-identical documents; this removes the boilerplate
  * *inside* otherwise-distinct documents (licence headers, navigation
  * chrome, quoted replies) — the complementary dedup axis a training
  * pipeline runs after doc-level dedup ("Deduplicating Training Data
  * Makes Language Models Better" — Lee et al., 2022; approximated here
  * at fixed window width w instead of maximal suffix-array matches,
  * which keeps every stage a relational operator).
  *
  * Determinism contract: the keeper of a duplicated window is the
  * minimum (doc_id, pos) occurrence — a total order, so any engine
  * agrees; a token is removed iff some NON-keeper duplicated window
  * covers it. Overlapping duplicated windows merge naturally through
  * coverage. (A keeper span's own tokens survive unless a different
  * non-keeper span overlaps them — the documented fixed-w
  * approximation of maximal-match dedup.)
  *
  * Scale shape (the Decontaminate asymmetry, corpus-never-shuffles):
  *
  *   1. Window pass: map-only explode of each doc's `n - w + 1` window
  *      starts as (doc_id, pos, wh) where wh = md5 of the space-joined
  *      window — 16-byte keys, never the window text, so the ONE
  *      shuffle (groupBy wh for count + min-keeper) moves ~24 B/row.
  *   2. The duplicated-window table (wh, keeper) BROADCASTS: it is
  *      bounded by DISTINCT duplicated content, the same asymmetry
  *      Decontaminate exploits for benchmarks. Span extraction is then
  *      a map-side hash probe of each doc's windows.
  *   3. Rebuild: per-doc span-start lists (collect_list over the span
  *      rows — only affected docs) broadcast back, and the cut is a
  *      map-only higher-order `filter` over the token array. The corpus
  *      itself never exchanges — it is SCANNED up to three map-only
  *      times (dup aggregate, probe, rebuild), the deliberate trade:
  *      checkpointing the window table to share the first two scans
  *      would materialize ~w× the corpus bytes, far costlier than a
  *      repeated tokenize+md5 map pass.
  *
  *   At pathological duplication (distinct duplicated windows too big
  *   to broadcast) drop the two explicit broadcast() hints and let AQE
  *   pick shuffle joins — semantics identical; the hints encode the
  *   common case, not a correctness requirement.
  *
  * Tokenization is the corpus convention (TextAnalysis.tokens,
  * single-space split). The reference (SmartX-Team/connected-data-lake)
  * has no curation ops — this extends the engine for training
  * pipelines (SURVEY §2.10).
  */
object SpanDedup {

  /** (doc_id, pos, wh): one row per w-token window start (0-based token
    * index); wh = md5 hex of the space-joined window text. Docs with
    * fewer than w tokens contribute no windows. Map-only. */
  private[ops] def windows(
      docs: DataFrame, w: Int, idCol: String, textCol: String): DataFrame =
    // fanOut: the per-window slice+concat+md5 is the CPU-heavy pass of
    // the whole operator; an under-parallel scan (one small file) must
    // not serialize it — no-op when the scan already has ≥ cores splits
    Scale.fanOutForCompute(docs, col(idCol))
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= w)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), col("n") - w),
        i => struct(i.cast("long").as("pos"),
          md5(concat_ws(" ", slice(col("toks"), i + 1, lit(w)))).as("wh"))))
        .as("pw"))
      .select(col("doc_id"), col("pw.pos").as("pos"), col("pw.wh").as("wh"))

  /** Non-keeper occurrences of every window duplicated anywhere in the
    * corpus: (doc_id, pos) — the w-token spans removeSpans will cut.
    * The keeper (global min (doc_id, pos) per window) is NOT listed. */
  def duplicatedSpans(
      docs: DataFrame,
      w: Int = 10,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(w >= 2, s"window width must be >= 2 tokens, got $w")
    // ONE windows evaluation (r20): the old aggregate-then-probe shape
    // evaluated the windows() subtree twice — the dup aggregate pass and
    // the probe join side each re-ran the tokenize + per-window
    // slice/concat/md5 map over the whole corpus, and that hash pass IS
    // the operator's dominant CPU at every scale. The analytic-window
    // form computes count + min-keeper over the same wh partitioning in
    // one pass over ONE materialization of the window rows; the shuffle
    // moves the same (doc_id, pos, wh) rows the groupBy moved (unique
    // windows don't partially aggregate), and the per-group sort is
    // bounded by duplicate-occurrence counts. Semantics are unchanged:
    // keeper = min (doc_id, pos) struct per wh, emit non-keepers of
    // windows with count ≥ 2.
    val win = windows(docs, w, idCol, textCol)
    val byWh = Window.partitionBy("wh")
    win.select(col("doc_id"), col("pos"),
        count(lit(1)).over(byWh).as("__c"),
        min(struct(col("doc_id"), col("pos"))).over(byWh).as("__k"))
      .filter(col("__c") >= 2 &&
        !(col("doc_id") === col("__k.doc_id") && col("pos") === col("__k.pos")))
      .select(col("doc_id"), col("pos"))
  }

  /** Documents with every non-keeper duplicated span cut out: original
    * columns with `textCol` rewritten (a fully-covered doc keeps an
    * EMPTY string — it was pure duplicated content; doc-level dedup is
    * the operator that drops whole rows). Unaffected docs pass through
    * byte-identical, NULL text stays NULL. */
  def removeSpans(
      docs: DataFrame,
      w: Int = 10,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    cutSpans(docs, duplicatedSpans(docs, w, idCol, textCol), w, idCol, textCol)

  /** The rebuild half alone: cut the given (doc_id, pos) w-token spans
    * out of `docs` (same coverage-merge, pass-through, and empty-string
    * contracts as removeSpans). Lets a caller that already HAS the span
    * set — the incremental store, a saved detection run — pay only the
    * map-side rewrite. */
  def cutSpans(
      docs: DataFrame,
      spans: DataFrame,
      w: Int = 10,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val perDoc = spans
      .groupBy("doc_id").agg(collect_list(col("pos")).as("__starts"))
      .withColumnRenamed("doc_id", "__span_doc")
    val wl = lit(w.toLong)
    val cut: Column = concat_ws(" ",
      filter(TextAnalysis.tokens(col(textCol)),
        (t, i) => !exists(col("__starts"),
          s => i.cast("long") >= s && i.cast("long") < s + wl)))
    docs
      .join(broadcast(perDoc), col(idCol) === col("__span_doc"), "left")
      .withColumn(textCol,
        when(col("__starts").isNull, col(textCol)).otherwise(cut))
      .drop("__span_doc", "__starts")
  }
}
