package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the n-gram-overlap check every serious
  * training-data pipeline runs before training: a training document that
  * shares enough n-grams with an evaluation benchmark leaks the test set
  * into the training corpus and must be dropped (or at least flagged).
  *
  * Scale design: the asymmetry is the whole point. The corpus is the
  * 100 TB side; benchmarks are a few MB of eval questions. Distinct
  * benchmark grams therefore BROADCAST, and the corpus side is a
  * map-only scan → gram explode → broadcast-hash semi-join → partial
  * count — the corpus never shuffles, and the output is only the
  * contaminated (doc_id, count) pairs. Grams are 64-bit hashes computed
  * off the text bytes (`gram_hashes`), so the broadcast table is 8 bytes
  * per gram; overlap-by-hash equals overlap-by-gram up to xxhash64
  * collisions (~(#grams)²/2⁶⁵).
  *
  * The reference (SmartX-Team/connected-data-lake) has no curation ops —
  * this extends the engine for training pipelines (SURVEY §2.8).
  */
object Decontaminate {

  /** Per-corpus-document count of distinct `n`-grams also present
    * anywhere in `benchmark`. Only documents with ≥ `minOverlap`
    * overlapping grams are returned (the contaminated set — at corpus
    * scale the clean majority would dwarf the output). */
  def overlap(
      corpus: DataFrame,
      benchmark: DataFrame,
      textCol: String = "text",
      n: Int = 5,
      minOverlap: Int = 1): DataFrame = {
    val cg = corpus.select(col("doc_id"), explode(
      graft.functions.SketchExprs.gramHashes(col(textCol), n, distinct = true))
      .as("g"))
    val bg = benchmark.select(explode(
      graft.functions.SketchExprs.gramHashes(col(textCol), n, distinct = true))
      .as("g")).distinct()
    cg.join(broadcast(bg), Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated_grams"))
      .filter(col("n_contaminated_grams") >= minOverlap)
  }
}
