package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Token-budget-bounded corpus selection: the maximal priority-ordered
  * prefix of documents whose cumulative token count stays within a
  * budget — "give me the best N-billion-token subset" — the last step
  * between scored/deduped corpus and tokenizer. Greedy PREFIX
  * semantics: cumulative counts are monotone (every doc counts ≥ 0
  * tokens; NULL text counts 0), so the first overflowing document cuts the stream and
  * nothing after it back-fills — deterministic, order-stable, and
  * expressible identically in any SQL engine.
  *
  * Scale shape — the reason this is not `sum OVER (ORDER BY …)`: a
  * global-order window funnels 100 TB through ONE partition (Spark
  * warns "Moving all data to a single partition"). Instead the
  * `Ordinal.stampWithCount` two-pass scheme, summing tokens rather
  * than counting rows: range-repartition on the priority keys, ONE
  * per-partition token-sum collect (a #partitions-sized driver edge —
  * KB at 100 TB), then cum = partition_base + within-partition cumsum
  * with the window PARTITIONED by the range bucket. Every stage is
  * distributed.
  *
  * The ranged intermediate is persisted for the same reason as
  * Ordinal's: range partitioning samples its bounds, and the sum pass
  * and the stamp pass must observe the same physical layout. Release
  * via the returned handle after the consuming action (or rely on
  * `spark.catalog.clearCache()` between batch queries). */
object BudgetSample {

  final case class Selected(df: DataFrame, release: () => Unit)

  /** The user-facing ordering mini-syntax — "col" (ascending) or
    * "col:desc" — parsed in ONE place so the CLI and the Python bridge
    * can never drift on what the same argument selects. */
  def parseOrd(specs: Seq[String]): Seq[Column] =
    specs.map { c =>
      if (c.endsWith(":desc")) col(c.stripSuffix(":desc")).desc
      else col(c).asc
    }

  /** Docs of the maximal `ord`-ordered prefix with cumulative tokens ≤
    * `budget`, as (original columns…, n_tokens, cum_tokens), in
    * priority order. `ord` must be a total order (tie-break on a
    * unique id) for the selection to be reproducible. `tokenCol`: name
    * of a PRECOMPUTED per-doc token-count column to use instead of
    * re-tokenizing `textCol` — callers that already carry the count
    * (Curation's labeled frame) skip a full tokenize pass over the
    * surviving text. */
  def takeUntilWithRelease(
      docs: DataFrame,
      budget: Long,
      ord: Seq[Column],
      textCol: String = "text",
      tokenCol: Option[String] = None): Selected = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val spark = docs.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    // nonce: same cache-dedupe defeat as Ordinal.stampWithCount — two
    // selections over one source must not share a canonicalized plan
    val nonce = java.util.UUID.randomUUID().toString
    // coalesce(0): a NULL text row counts zero tokens and stays
    // selectable — without it the per-partition sum row is NULL when a
    // range bucket holds only null-text docs and getLong below throws
    val tokenExpr = tokenCol match {
      case Some(c) => coalesce(col(c).cast("long"), lit(0L))
      case None    => coalesce(TextAnalysis.tokenCount(col(textCol)), lit(0L))
    }
    val ranged = docs
      .withColumn("n_tokens", tokenExpr)
      .repartitionByRange(parts, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__budget_nonce", lit(nonce))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sums = ranged.groupBy("__pid")
      .agg(sum(col("n_tokens")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val bases = sums.scanLeft(0L)(_ + _._2)
    val baseDf = spark.createDataFrame(
      sums.map(_._1).zip(bases).toSeq).toDF("__pid", "__base")
    val w = Window.partitionBy("__pid").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val selected = ranged
      .join(broadcast(baseDf), Seq("__pid"))
      .withColumn("cum_tokens", col("__base") + sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .drop("__pid", "__base", "__budget_nonce")
    Selected(selected, () => { ranged.unpersist(); () })
  }

  /** Fire-and-forget form (the Ordinal.stamp caveat applies: the pinned
    * intermediate lives as long as the returned plan). */
  def takeUntil(
      docs: DataFrame,
      budget: Long,
      ord: Seq[Column],
      textCol: String = "text"): DataFrame =
    takeUntilWithRelease(docs, budget, ord, textCol).df
}
