package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** End-to-end corpus curation: the canonical pretraining funnel —
  * quality filter → exact dedup → benchmark decontamination → token
  * budget — run as ONE operator that returns both the curated corpus
  * and a per-stage attrition report ("the funnel": docs in/out and
  * surviving tokens after every stage).
  *
  * The reference (SmartX-Team/connected-data-lake) has no curation ops;
  * this composes the engine's §2.10 pipeline family into the shape a
  * training-data team actually runs, with the accounting they actually
  * need (how much did each stage cost me?).
  *
  * Scale design — the funnel must not multiply corpus passes:
  *
  *   - Stages 1–3 label every document with its EXIT STAGE in one
  *     logical plan: a map pass computes (n_tokens, quality, digest),
  *     ONE shuffle on the content digest finds each digest group's
  *     first quality-passing doc (the dedup keeper), and the
  *     contaminated id set — small by the Decontaminate asymmetry —
  *     broadcast-joins back. The labeled frame persists once
  *     (MEMORY_AND_DISK); the funnel is a ≤4-group aggregate over it
  *     and the survivor frame is a filter of it — neither rescans the
  *     source.
  *   - Decontamination's gram explode is its own corpus scan
  *     (inherent: grams ≠ the label columns), so the pipeline costs
  *     TWO source scans when a benchmark is given, one otherwise.
  *   - Stage 4 reuses `BudgetSample.takeUntilWithRelease` on the
  *     persisted survivors: range-repartition on the priority keys +
  *     the two-pass partition-sum cumsum — never a single-partition
  *     global window. Because that machinery already collects the
  *     per-partition token sums, a FRACTIONAL budget (keep the best
  *     60 % of surviving tokens) is free: the stage-3 funnel row
  *     already knows the survivors' token total.
  *
  * Sequential semantics (the funnel contract): a document is charged
  * to the FIRST stage that drops it — a low-quality doc that is also
  * contaminated counts against `quality`, and the dedup keeper is the
  * min doc_id among QUALITY-PASSING copies (a duplicate family whose
  * every copy fails quality contributes nothing to `exact_dup`).
  * NULL text fails the quality gate (a quality filter that cannot
  * score a document drops it), counting 0 tokens.
  *
  * Determinism: every stage is md5/count-based and every order is
  * total (digest keeper by doc_id; budget priority must be a total
  * order), so the same corpus and config always select the same docs —
  * the whole funnel is DuckDB-recomputable and both gate rows are full
  * value oracles.
  */
object Curation {

  /** Pipeline configuration. Stages 1–2 always run; 3 runs when
    * `benchmark` is set; 4 runs when `budget` or `budgetFraction` is
    * set (absolute wins if both are given). `ord` is the stage-4
    * priority (must be a total order; defaults to best-quality-first,
    * doc_id tie-break). `decontamN` follows Decontaminate.overlap's
    * default (5 — short grams over-flag; the gate measured 3-grams
    * marking ~100 % of a synthetic corpus). `broadcastContaminated`
    * hints the contaminated-id join; turn it OFF when the benchmark
    * overlaps a large corpus fraction (the flagged set then approaches
    * corpus size and must not ship to every executor — AQE picks a
    * shuffle join instead, semantics identical). */
  final case class Config(
      minQuality: Double = 0.4,
      benchmark: Option[DataFrame] = None,
      decontamN: Int = 5,
      minOverlap: Int = 1,
      budget: Option[Long] = None,
      budgetFraction: Option[Double] = None,
      ord: Seq[Column] = Seq(col("quality").desc, col("doc_id").asc),
      textCol: String = "text",
      broadcastContaminated: Boolean = true)

  /** `docs`: the curated corpus (original columns + n_tokens, quality;
    * + cum_tokens when stage 4 ran), in stage-4 priority order when
    * stage 4 ran. `funnel`: one row per executed stage —
    * (stage_idx, stage, docs_in, docs_out, tokens_out). `release()`
    * unpersists the pinned intermediates once the caller is done. */
  final case class Result(docs: DataFrame, funnel: DataFrame, release: () => Unit)

  def run(docs: DataFrame, cfg: Config = Config()): Result = {
    val spark = docs.sparkSession
    import spark.implicits._
    val text = col(cfg.textCol)

    // ---- stages 1–3 as one labeled plan -----------------------------
    val contaminated: Option[DataFrame] = cfg.benchmark.map { bm =>
      Decontaminate.overlap(docs, bm, cfg.textCol, cfg.decontamN, cfg.minOverlap)
        .select(col("doc_id"), lit(true).as("__contam"))
    }
    val featured = docs
      .withColumn("n_tokens",
        coalesce(TextAnalysis.tokenCount(text), lit(0L)))
      .withColumn("quality", TextAnalysis.qualityScore(text))
      .withColumn("__digest", md5(text))
      .withColumn("__qpass",
        text.isNotNull && col("quality") >= cfg.minQuality)
    // dedup keeper = min doc_id among the digest's quality survivors;
    // digest groups are duplicate families (tiny), so the window's
    // shuffle is the one exact-dedup fundamentally requires
    val keeperW = Window.partitionBy("__digest")
    val withKeeper = featured.withColumn("__keeper",
      min(when(col("__qpass"), col("doc_id"))).over(keeperW))
    val joined = contaminated match {
      case Some(c) =>
        val side = if (cfg.broadcastContaminated) broadcast(c) else c
        withKeeper.join(side, Seq("doc_id"), "left")
      case None    => withKeeper.withColumn("__contam", lit(null).cast("boolean"))
    }
    val labeled = joined
      .withColumn("__exit",
        when(!col("__qpass"), lit("quality"))
          .when(col("doc_id") =!= col("__keeper"), lit("exact_dup"))
          .when(coalesce(col("__contam"), lit(false)), lit("contaminated")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ---- the funnel: a ≤4-group aggregate, O(stages) on the driver --
    val agg = labeled.groupBy("__exit")
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("t"))
      .collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2)))
      .toMap
    def at(k: Option[String]): (Long, Long) = agg.getOrElse(k, (0L, 0L))
    val (nQ, _) = at(Some("quality"))
    val (nD, _) = at(Some("exact_dup"))
    val (nC, _) = at(Some("contaminated"))
    val (nS, tS) = at(None)
    val nIn = agg.values.map(_._1).sum

    val survivors = labeled.filter(col("__exit").isNull)
      .drop("__digest", "__qpass", "__keeper", "__contam", "__exit")

    // ---- stage 4: token budget over the survivors -------------------
    val budgetOpt: Option[Long] = cfg.budget.orElse(
      cfg.budgetFraction.map(f => math.floor(f * tS).toLong))
    val (finalDocs, nB, tB, releaseBudget) = budgetOpt match {
      case Some(b) =>
        // tokenCol: the labeled frame already carries n_tokens — the
        // budget stage must not re-tokenize the surviving text
        val sel = BudgetSample.takeUntilWithRelease(
          survivors, b, cfg.ord, cfg.textCol, tokenCol = Some("n_tokens"))
        val out = sel.df.agg(
          count(lit(1)).cast("long"), coalesce(sum("n_tokens"), lit(0L)))
          .collect().head
        (sel.df, out.getLong(0), out.getLong(1), sel.release)
      case None => (survivors, nS, tS, () => ())
    }

    // tokens_out after quality/dedup/contamination follow from the exit
    // sums backwards: each stage's survivors are the later exits + kept
    val tAfter3 = tS
    val tAfter2 = tAfter3 + at(Some("contaminated"))._2
    val tAfter1 = tAfter2 + at(Some("exact_dup"))._2
    val rows = Seq(
      Some((1, "quality", nIn, nIn - nQ, tAfter1)),
      Some((2, "exact_dup", nIn - nQ, nIn - nQ - nD, tAfter2)),
      cfg.benchmark.map(_ =>
        (3, "contaminated", nIn - nQ - nD, nIn - nQ - nD - nC, tAfter3)),
      budgetOpt.map(_ => (4, "budget", nS, nB, tB))).flatten
    val funnel = rows
      .toDF("stage_idx", "stage", "docs_in", "docs_out", "tokens_out")
      .select(col("stage_idx").cast("long"), col("stage"),
        col("docs_in"), col("docs_out"), col("tokens_out"))

    Result(finalDocs, funnel, () => { releaseBudget(); labeled.unpersist(); () })
  }
}
