package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, all
  * expressed as codegen'd Column expressions (no UDFs) so they stay inside
  * whole-stage codegen and scale linearly with input splits — no shuffle,
  * no driver involvement, safe at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count on whitespace. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish token count: word pieces + digit runs + punctuation, the
    * common pre-tokenizer regex family. `regexp_count`, not
    * `size(regexp_extract_all(…))` — the latter materializes every match
    * as a string in an array just to count it. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Per-language marker lexicons, key-sorted (tie order is part of the
    * langIdHeuristic contract). */
  private val langMarkers = Seq(
    "de" -> Seq("der", "die", "und", "ist"),
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "los", "y", "es"),
    "fr" -> Seq("le", "la", "et", "est"))

  /** ALL marker counts — stopwords then each language — as one
    * `token_set_counts` expression (SketchExprs.scala): a single
    * tokenization pass per row, and because every consumer builds this
    * SAME subtree, whole-stage codegen's subexpression elimination
    * computes it once per row for the whole profile. The previous forms
    * paid per-set passes: `size(filter(tokens, isin))` is an interpreted
    * HOF that re-split the text per set (2.4× on the full profile), and
    * one regex per set still scanned the text five times. */
  private def markerCounts(text: Column): Column =
    graft.functions.SketchExprs.tokenSetCounts(
      text, stopwords +: langMarkers.map(_._2))

  /** Fraction of tokens that are (English) stopwords — the standard cheap
    * quality / language signal. Known skew, shared with the DuckDB
    * oracle's restatement: the numerator (tokenSetCounts) skips
    * zero-length tokens while the denominator (size of a single-space
    * split) counts them, so text with repeated/leading/trailing spaces
    * under-scores proportionally to its empty-token count. Both sides
    * of the gate compute it identically; fixing it means changing the
    * ratio's definition in BOTH at once. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    round(
      element_at(markerCounts(text), 1).cast("double") /
        greatest(size(toks), lit(1)).cast("double"),
      4)
  }

  /** Mean token length. */
  def meanTokenLen(text: Column): Column =
    round(
      (length(text) - size(tokens(text)) + 1).cast("double") /
        greatest(size(tokens(text)), lit(1)).cast("double"),
      4)

  /** Ratio of non-alphanumeric, non-space chars (punctuation density). */
  def punctRatio(text: Column): Column =
    round(
      regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") /
        greatest(length(text), lit(1)).cast("double"),
      4)

  /** Composite quality score in [0,1]: long enough, low punctuation, sane
    * stopword density. Deterministic and explainable — the usual first
    * filter in a pretraining pipeline. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round((lenScore + punctScore + stopScore) / 3.0, 4)
  }

  /** Language-ID by stopword evidence: counts hits from tiny per-language
    * marker lexicons and picks the argmax (zero hits → 'und'; equal
    * non-zero hits break by language-key order — de/en/es/fr — the
    * deterministic rule the gate pins). N-gram-free but
    * the same shape as real lang-id: per-language evidence → argmax. */
  def langIdHeuristic(text: Column): Column = {
    val scored = langMarkers.zipWithIndex.map { case ((lang, _), i) =>
      (lang, element_at(markerCounts(text), i + 2))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und")) { case ((lang, h), els) =>
      when(h === best && best > 0, lit(lang)).otherwise(els)
    }
  }

  /** Document fingerprint: hash of whitespace-normalized, lowercased text.
    * md5 keeps it oracle-checkable; at scale the hash choice is free since
    * it's a map-only projection. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Winnowing document sketch (the MOSS fingerprint): hash every word
    * k-gram, then keep the minimum hash of each sliding window of `w`
    * consecutive k-grams — a position-robust subset of shingle hashes
    * whose overlap estimates document similarity.
    *
    * Shape: windows never cross documents, so the sketch is a
    * per-document reduction — ONE fused expression per row
    * (`winnow_minima`, SketchExprs.scala), map-only. The
    * posexplode → partitioned-window-min → collect_list form it
    * replaces shuffled every gram hash to sort it next to its
    * neighbors, which the gram array already provides positionally
    * (measured 3.4 s → sub-second at sf0.1); a lambda of the form
    * `transform(seq, i -> array_min(slice(hashes, i, w)))` is worse
    * still — it re-evaluates the whole hash array per window. */
  def winnowingSketch(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String = "text",
      k: Int = 5,
      w: Int = 4,
      oracleMd5: Boolean = false): org.apache.spark.sql.DataFrame = {
    // POSITIONAL grams (no distinct): winnowing windows are over gram
    // positions, so duplicates must stay in place. `oracleMd5` swaps the
    // gram hash to md5-hex strings — the hash DuckDB shares, so the gate
    // query is oracle-checkable; production default is xxhash64 longs
    // (cheaper, same plan shape, lexicographic-vs-numeric minima both
    // match array_sort's ordering).
    val hashes =
      if (oracleMd5)
        graft.functions.SketchExprs.gramMd5(col(textCol), k, distinct = false)
      else
        graft.functions.SketchExprs.gramHashes(col(textCol), k, distinct = false)
    docs.select(col("doc_id"),
      graft.functions.SketchExprs.winnowMinima(hashes, w).as("sketch"))
      // a doc with fewer than w grams has no complete window — drop it,
      // matching the positional form's `pos ≥ w−1` filter
      .filter(size(col("sketch")) > 0)
  }

  /** Equi-width histogram of text length per group — the curation stat a
    * pipeline reports per source/shard before and after cleaning. One
    * partial-aggregated groupBy of (group, bin) pairs: at 100 TB the
    * shuffle carries only #groups × maxBins rows after map-side combine.
    * The last bin is open-ended (everything ≥ (maxBins−1)·binWidth). */
  def lengthHistogram(
      docs: DataFrame,
      groupCol: String = "source",
      textCol: String = "text",
      binWidth: Int = 100,
      maxBins: Int = 10): DataFrame =
    docs
      // NULL text would otherwise land in the TOP bin (Spark's least()
      // skips NULL arguments) — exclude explicitly, and identically in
      // the oracle, since engines disagree on least(NULL, k)
      .filter(col(textCol).isNotNull)
      .groupBy(col(groupCol),
        least(floor(length(col(textCol)) / binWidth), lit(maxBins - 1))
          .cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))

  /** Corpus vocabulary head: deterministic top-k tokens by frequency
    * (ties broken by the token itself). Explode → partial-agg count →
    * TakeOrderedAndProject: the full vocabulary never leaves the
    * executors, only the top-k rows reach the driver side of the plan. */
  def topTokens(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(k)

  /** Intra-document repetition profile (the Gopher-style duplicate-n-gram
    * quality rule): positional n-gram count, distinct n-gram count, and
    * their complement ratio per document. Row-local (two fused gram
    * passes, no shuffle); distinct-by-hash equals distinct-by-gram up to
    * xxhash64 collisions. */
  def repetitionProfile(docs: DataFrame, n: Int = 3, textCol: String = "text"): DataFrame = {
    val total = size(graft.functions.SketchExprs.gramHashes(
      col(textCol), n, distinct = false))
    val dist = size(graft.functions.SketchExprs.gramHashes(
      col(textCol), n, distinct = true))
    docs.select(
      col("doc_id"),
      total.cast("long").as("n_grams"),
      dist.cast("long").as("n_distinct_grams"),
      round(lit(1.0) - dist.cast("double") / total.cast("double"), 4)
        .as("rep_ratio"))
  }

  /** One-call profile of a documents table. */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // no fanOut (measured): the feature battery is one codegen pass —
    // at sf0.1 the spread's exchange cost more than it saved (~0.3-0.5s
    // on q_corpus_clean / q_text_profile)
    docs.select(
      col("doc_id"),
      tokenCount(t).as("n_tokens"),
      bpeishTokenCount(t).as("n_bpeish"),
      meanTokenLen(t).as("mean_tok_len"),
      stopwordRatio(t).as("stopword_ratio"),
      punctRatio(t).as("punct_ratio"),
      qualityScore(t).as("quality"),
      langIdHeuristic(t).as("pred_lang"),
      fingerprint(t).as("fingerprint"))
  }
}
