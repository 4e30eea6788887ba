package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** End-to-end corpus curation: the canonical pretraining funnel —
  * quality filter → exact dedup → optional NEAR-dup dedup (MinHash-LSH
  * blocked, exact n-gram-jaccard verified; `Config.nearDup`) →
  * benchmark decontamination → token budget — run as ONE operator that
  * returns both the curated corpus and a per-stage attrition report
  * ("the funnel": docs in/out and surviving tokens after every stage).
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
      broadcastContaminated: Boolean = true,
      nearDup: Option[Double] = None,
      nearDupN: Int = 3,
      nearDupDfCap: Int = 1000)

  /** `docs`: the curated corpus (original columns + n_tokens, quality;
    * + cum_tokens when stage 4 ran), in stage-4 priority order when
    * stage 4 ran. `funnel`: one row per executed stage —
    * (stage_idx, stage, docs_in, docs_out, tokens_out). `release()`
    * unpersists the pinned intermediates once the caller is done. */
  final case class Result(docs: DataFrame, funnel: DataFrame, release: () => Unit)

  def run(docs0: DataFrame, cfg: Config = Config()): Result = {
    val spark = docs0.sparkSession
    import spark.implicits._
    val text = col(cfg.textCol)
    // fanOut: stage 1's feature map (tokenize + quality regexes + md5)
    // and the decontamination gram explode are the corpus CPU passes;
    // an under-parallel scan must not serialize them (no-op on
    // well-split scans — see Scale.fanOutForCompute)
    val docs = Scale.fanOutForCompute(docs0, col("doc_id"))

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
    // shuffle is the one exact-dedup fundamentally requires. Quality
    // FAILURES exit at stage 1 and never need a keeper, so they get
    // singleton partition keys instead of riding the digest: on a dirty
    // corpus every NULL-text doc digests to NULL and every empty doc to
    // one constant — without the salt they all funnel into one window
    // task each (a single-task skew hotspot doing work whose result is
    // discarded). Quality passers can't have a NULL digest (NULL text
    // fails the gate), so keeper semantics are unchanged.
    val keeperW = Window.partitionBy(
      when(col("__qpass"), col("__digest"))
        .otherwise(concat(lit(" nq:"), col("doc_id").cast("string"))))
    val withKeeper0 = featured.withColumn("__keeper",
      min(when(col("__qpass"), col("doc_id"))).over(keeperW))
    // near-dup mode consumes this frame TWICE (the pair generation's
    // eager checkpoint, then the labeled persist) — pin it so the
    // feature map + keeper shuffle run once, keeping the one-labeled-
    // plan contract; the stage-off path has a single consumer, no pin
    val withKeeper =
      if (cfg.nearDup.isDefined) withKeeper0.localCheckpoint()
      else withKeeper0
    // stage 2b (optional): NEAR-dup dedup over the stage-2 survivors —
    // the canonical funnel's fuzzy pass (quality → exact → near-dup →
    // decontam → budget). MinHash-LSH blocking + EXACT n-gram-jaccard
    // verify (the q_dedup_minhash_lsh machinery: at the production 0.8
    // threshold banding recall is 1, so the pair set — and therefore
    // the funnel — is engine-independent), components over the pairs,
    // min-id representative kept, every other member charged to
    // `near_dup`. Computed over survivors ONLY, so first-stage charging
    // is automatic: a quality-failing copy never enters the pair join.
    // This is one additional corpus-scan over the survivors (signatures
    // need the text; inherent, like decontamination's gram explode) and
    // the (id,label)-only component shuffles.
    val nearDrop: Option[DataFrame] = cfg.nearDup.map { thr =>
      val surv2 = withKeeper
        .filter(col("__qpass") && col("doc_id") === col("__keeper"))
        .select(col("doc_id"), text.as("text"))
      val pairs = Dedup.minhashLshNearDupPairs(
        surv2, "text", n = cfg.nearDupN, threshold = thr)
      Components.ofPairs(pairs)
        .filter(col("v") =!= col("component"))
        .select(col("v").as("doc_id"), lit(true).as("__neardup"))
        .localCheckpoint()
    }
    val withNear = nearDrop match {
      case Some(nd) => withKeeper.join(nd, Seq("doc_id"), "left")
      case None     =>
        withKeeper.withColumn("__neardup", lit(null).cast("boolean"))
    }
    val joined = contaminated match {
      case Some(c) =>
        val side = if (cfg.broadcastContaminated) broadcast(c) else c
        withNear.join(side, Seq("doc_id"), "left")
      case None    => withNear.withColumn("__contam", lit(null).cast("boolean"))
    }
    val labeled = joined
      .withColumn("__exit",
        when(!col("__qpass"), lit("quality"))
          .when(col("doc_id") =!= col("__keeper"), lit("exact_dup"))
          .when(coalesce(col("__neardup"), lit(false)), lit("near_dup"))
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
    val (nN, _) = at(Some("near_dup"))
    val (nC, _) = at(Some("contaminated"))
    val (nS, tS) = at(None)
    val nIn = agg.values.map(_._1).sum

    val survivors = labeled.filter(col("__exit").isNull)
      .drop("__digest", "__qpass", "__keeper", "__neardup", "__contam", "__exit")

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

    // tokens_out after each map/label stage follows from the exit sums
    // backwards: a stage's surviving tokens are the later exits + kept.
    // Executed stages number SEQUENTIALLY (near-dup off reproduces the
    // original 1..4 indices exactly).
    val tAfterContam = tS
    val tAfterNear = tAfterContam + at(Some("contaminated"))._2
    val tAfterDup = tAfterNear + at(Some("near_dup"))._2
    val tAfterQ = tAfterDup + at(Some("exact_dup"))._2
    val out1 = nIn - nQ
    val out2 = out1 - nD
    val out2b = out2 - nN
    val stages: Seq[(String, Long, Long, Long)] =
      Seq(("quality", nIn, out1, tAfterQ),
        ("exact_dup", out1, out2, tAfterDup)) ++
        cfg.nearDup.map(_ =>
          ("near_dup", out2, out2b, tAfterNear)).toSeq ++
        cfg.benchmark.map(_ =>
          ("contaminated", out2b, out2b - nC, tAfterContam)).toSeq ++
        budgetOpt.map(_ => ("budget", nS, nB, tB)).toSeq
    val rows = stages.zipWithIndex.map { case ((st, i, o, t), idx) =>
      (idx + 1, st, i, o, t)
    }
    val funnel = rows
      .toDF("stage_idx", "stage", "docs_in", "docs_out", "tokens_out")
      .select(col("stage_idx").cast("long"), col("stage"),
        col("docs_in"), col("docs_out"), col("tokens_out"))

    Result(finalDocs, funnel, () => { releaseBudget(); labeled.unpersist(); () })
  }

  /** Streaming twin of the funnel (r13 verdict #5; near-dup stage r16,
    * r15 verdict #5): curate a document
    * STREAM, one epoch at a time, with stage 2's dedup state in the
    * persisted exact store — the live-feed counterpart of the batch
    * backfill, under the store family's per-epoch-overwrite
    * exactly-once contract. Per micro-batch: stage-1 quality labels
    * map-side, the quality SURVIVORS run one locked
    * [[IncrementalDedup.exactBatch]] cycle (first-arrival keepers
    * across epochs; feeding only quality passers preserves the batch
    * funnel's "keeper = min quality-passing copy" rule), stage 3
    * decontaminates statelessly against the broadcast benchmark, and
    * the epoch's survivors + funnel rows land under
    * `resultsDir/{docs,funnel}/batch=<epoch>`, overwritten on replay
    * (the store cycle itself replays idempotently).
    *
    * Parity contract (StreamingCurationSpec): when epochs arrive in
    * ascending doc_id order, the union of epoch survivors equals the
    * batch funnel's survivors and the per-stage drop counts sum to the
    * batch funnel's — first-arrival keepers then coincide with global
    * min doc_id.
    *
    * Stage 2b (near-dup) streams through the incremental store family
    * (r16, lifting the old batch-only reject): the epoch's stage-2
    * survivors run one locked [[IncrementalDedup.ngramBatch]] cycle —
    * EXACT n-gram jaccard at the funnel's threshold, the same verify
    * the batch stage applies after its LSH blocking — and the emitted
    * pairs (cross-epoch included: the posting store remembers every
    * earlier survivor) absorb into a persisted
    * [[IncrementalComponents]] label store; an epoch doc whose resolved
    * component root is not itself is charged to `near_dup`. Under the
    * ascending-epoch parity precondition the root IS the global min-id
    * representative, so epoch-union = batch-funnel including this
    * stage's drop counts (the parity unit pins it) — with ONE
    * documented exception inherent to streaming: near-dup similarity is
    * not transitive, so a LATER doc can BRIDGE two already-emitted
    * survivors into one component (jaccard(a,c) and jaccard(b,c) above
    * threshold with jaccard(a,b) below). The batch funnel would then
    * drop both non-min members; the stream has already shipped the
    * earlier survivor and cannot retract it, so it keeps first-arrivals
    * and charges only the bridge doc — the standard streaming-dedup
    * semantic, pinned by its own unit. A backfill batch run remains the
    * tool when retroactive component semantics are required. Both
    * stores ride
    * `nearDupStores = (pairStoreDir, clustersStoreDir)` — required
    * exactly when the config carries the stage.
    *
    * Stage 4 (token budget) stays batch-only by construction — a
    * global best-token prefix over an unbounded stream is ill-defined
    * — so configs carrying it are rejected loudly. */
  def stream(
      docsStream: DataFrame,
      storeDir: String,
      resultsDir: String,
      checkpointDir: String,
      cfg: Config = Config(),
      storeParts: Int = IncrementalDedup.AdoptOrDefaultStoreParts,
      nearDupStores: Option[(String, String)] = None,
      perEpochBudget: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery = {
    // r17 verdict #8: the GLOBAL budget stays batch-only by
    // construction (a best-token prefix over an unbounded stream is
    // ill-defined), but a PER-EPOCH quota — each epoch keeps its own
    // best `budget` tokens (or `budgetFraction` of ITS surviving
    // tokens) — is well-defined and is what streaming curation
    // deployments actually run. It is an explicit opt-in because the
    // semantics genuinely differ: the batch prefix ranks ALL survivors
    // against each other; the epoch quota never lets a later epoch's
    // better doc displace an earlier epoch's worse one (shipped docs
    // cannot be retracted). Epoch-quota selections therefore do NOT
    // equal a batch run over the union — run the backfill batch when
    // the global prefix is what you need.
    require(cfg.budget.isEmpty && cfg.budgetFraction.isEmpty || perEpochBudget,
      "the token-budget stage is batch-only: a global priority prefix " +
        "over an unbounded stream is ill-defined — run it on the " +
        "backfill, or opt in to PER-EPOCH quota semantics (each epoch " +
        "keeps its own best tokens; NOT the batch prefix) with " +
        "perEpochBudget = true")
    require(cfg.nearDup.isEmpty || nearDupStores.isDefined,
      "the streaming near-dup stage needs its persistent state: pass " +
        "nearDupStores = (pairStoreDir, clustersStoreDir)")
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val (docsOut, funnel) =
          streamEpoch(batch.toDF(), storeDir, cfg, storeParts, nearDupStores,
            perEpochBudget)
        docsOut.write.mode("overwrite").parquet(s"$resultsDir/docs/batch=$id")
        funnel.write.mode("overwrite").parquet(s"$resultsDir/funnel/batch=$id")
        ()
      }
      .start()
  }

  /** One epoch of [[stream]]: (survivors, funnel rows). Factored out so
    * the parity spec can drive it batch-shaped. */
  private[graft] def streamEpoch(
      docs: DataFrame,
      storeDir: String,
      cfg: Config,
      storeParts: Int = IncrementalDedup.AdoptOrDefaultStoreParts,
      nearDupStores: Option[(String, String)] = None,
      perEpochBudget: Boolean = false): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ascending-epoch precondition enforced LOUDLY and FIRST (r16
    // verdict #6) — before any store mutation: the stage keeps
    // FIRST-ARRIVAL survivors, which equals the batch funnel's min-id
    // keepers only when every epoch's ids exceed all earlier epochs'.
    // An out-of-order epoch would make a NEW doc the cluster-min root
    // of an EXISTING component — the root-based charge would keep it
    // while the component's earlier survivor has already shipped and
    // cannot be retracted: two survivors, a silent correctness hole.
    // Checked only when the near-dup stage runs (its pair store hosts
    // the watermark); an exact replay of the LAST accepted epoch
    // re-passes — the foreachBatch retry shape.
    if (cfg.nearDup.isDefined) {
      val pairStoreDir = nearDupStores.getOrElse(sys.error(
        "streaming near-dup stage without nearDupStores"))._1
      val bounds = docs.agg(min(col("doc_id")), max(col("doc_id")))
        .collect().head
      if (!bounds.isNullAt(0))
        enforceAscendingEpoch(spark, pairStoreDir,
          bounds.getLong(0), bounds.getLong(1))
    }
    val text = col(cfg.textCol)
    val featured = docs
      .withColumn("n_tokens",
        coalesce(TextAnalysis.tokenCount(text), lit(0L)))
      .withColumn("quality", TextAnalysis.qualityScore(text))
      .withColumn("__qpass",
        text.isNotNull && col("quality") >= cfg.minQuality)
      // one materialization feeds the store cycle, the label join, the
      // funnel aggregate, and the survivor filter
      .localCheckpoint()
    val verdicts = IncrementalDedup.exactBatch(
      featured.filter(col("__qpass")), storeDir, cfg.textCol, storeParts)
    val dupIds = verdicts.filter(col("dup_of").isNotNull)
      .select(col("doc_id"), lit(true).as("__dup"))
      .localCheckpoint() // label join + the near-dup stage's anti-join
    // stage 2b (r16): near-dup over THIS epoch's stage-2 survivors vs
    // all earlier epochs — one locked ngram-store cycle (exact jaccard,
    // the batch stage's verify), pairs absorbed into the persisted
    // label store; a doc whose component root is not itself drops
    val nearIds: Option[DataFrame] = cfg.nearDup.map { thr =>
      val (pairStoreDir, ccStoreDir) = nearDupStores.getOrElse(sys.error(
        "streaming near-dup stage without nearDupStores"))
      val surv2 = featured.filter(col("__qpass"))
        .join(dupIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col(cfg.textCol))
      // dfCap rides the config (r16 review): the batch stage's exact
      // verify has no df cutoff, so stream/batch parity additionally
      // requires no shared gram's document frequency to exceed the cap
      // — raise nearDupDfCap on boilerplate-heavy corpora
      val pairs = IncrementalDedup.ngramBatch(
        surv2, pairStoreDir, cfg.textCol, n = cfg.nearDupN, threshold = thr,
        dfCap = cfg.nearDupDfCap)
      IncrementalComponents.addPairs(pairs, ccStoreDir)
        .filter(col("v") =!= col("component"))
        .select(col("v").as("doc_id"), lit(true).as("__neardup"))
    }
    val contaminated = cfg.benchmark.map { bm =>
      Decontaminate.overlap(docs, bm, cfg.textCol, cfg.decontamN, cfg.minOverlap)
        .select(col("doc_id"), lit(true).as("__contam"))
    }
    val withDup = featured.join(dupIds, Seq("doc_id"), "left")
    val withNear = nearIds match {
      case Some(nd) => withDup.join(nd, Seq("doc_id"), "left")
      case None => withDup.withColumn("__neardup", lit(null).cast("boolean"))
    }
    val joined = contaminated match {
      case Some(c) =>
        val side = if (cfg.broadcastContaminated) broadcast(c) else c
        withNear.join(side, Seq("doc_id"), "left")
      case None => withNear.withColumn("__contam", lit(null).cast("boolean"))
    }
    val labeled = joined
      .withColumn("__exit",
        when(!col("__qpass"), lit("quality"))
          .when(coalesce(col("__dup"), lit(false)), lit("exact_dup"))
          .when(coalesce(col("__neardup"), lit(false)), lit("near_dup"))
          .when(coalesce(col("__contam"), lit(false)), lit("contaminated")))
      .localCheckpoint()
    val agg = labeled.groupBy("__exit")
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("t"))
      .collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2)))
      .toMap
    def at(k: Option[String]): (Long, Long) = agg.getOrElse(k, (0L, 0L))
    val (nQ, _) = at(Some("quality"))
    val (nD, _) = at(Some("exact_dup"))
    val (nN, _) = at(Some("near_dup"))
    val (nC, _) = at(Some("contaminated"))
    val (nS, tS) = at(None)
    val nIn = agg.values.map(_._1).sum
    // tokens after each stage follow from the exit sums backwards, the
    // batch funnel's rule; executed stages number sequentially
    val tAfterContam = tS
    val tAfterNear = tAfterContam + at(Some("contaminated"))._2
    val tAfterDup = tAfterNear + at(Some("near_dup"))._2
    val tAfterQ = tAfterDup + at(Some("exact_dup"))._2
    val out1 = nIn - nQ
    val out2 = out1 - nD
    val out2b = out2 - nN
    val survivors = labeled.filter(col("__exit").isNull)
      .drop("__qpass", "__dup", "__neardup", "__contam", "__exit")
    // per-epoch token quota (r17 verdict #8, opt-in — see stream()):
    // the SAME BudgetSample machinery as batch stage 4, applied to THIS
    // epoch's survivors against THIS epoch's quota. `budgetFraction`
    // resolves against the epoch's surviving tokens — "each epoch keeps
    // its best f of what survived" — deliberately NOT the batch prefix.
    val (outDocs, budgetStage) =
      if (perEpochBudget && (cfg.budget.nonEmpty || cfg.budgetFraction.nonEmpty)) {
        val b = cfg.budget.getOrElse(
          math.floor(cfg.budgetFraction.get * tS).toLong)
        val sel = BudgetSample.takeUntilWithRelease(
          survivors, b, cfg.ord, cfg.textCol, tokenCol = Some("n_tokens"))
        val picked = sel.df.localCheckpoint()
        sel.release()
        val row = picked
          .agg(count(lit(1)), coalesce(sum(col("n_tokens")), lit(0L)))
          .collect().head
        (picked, Seq(("budget", nS, row.getLong(0), row.getLong(1))))
      } else (survivors, Nil)
    val stages: Seq[(String, Long, Long, Long)] =
      Seq(("quality", nIn, out1, tAfterQ),
        ("exact_dup", out1, out2, tAfterDup)) ++
        cfg.nearDup.map(_ =>
          ("near_dup", out2, out2b, tAfterNear)).toSeq ++
        cfg.benchmark.map(_ =>
          ("contaminated", out2b, nS, tAfterContam)).toSeq ++
        budgetStage
    val rows = stages.zipWithIndex.map { case ((st, i, o, t), idx) =>
      (idx + 1, st, i, o, t)
    }
    val funnel = rows
      .toDF("stage_idx", "stage", "docs_in", "docs_out", "tokens_out")
      .select(col("stage_idx").cast("long"), col("stage"),
        col("docs_in"), col("docs_out"), col("tokens_out"))
    (outDocs, funnel)
  }

  private val WatermarkFile = "_stream_watermark"

  /** The streaming near-dup stage's ascending-epoch gate (r16 verdict
    * #6): a sidecar under the pair store records the max doc_id across
    * accepted epochs plus the LAST epoch's exact (min, max). A new
    * epoch must either strictly exceed the watermark or replay the last
    * epoch byte-for-byte in id range (Structured Streaming's
    * foreachBatch retries exactly the most recent failed batch — the
    * one replay shape the store cycles themselves already absorb
    * idempotently). Anything else throws BEFORE any store mutation,
    * naming the fix. The sidecar publishes via the scheme-aware
    * single-file path (no torn/absent window). */
  private[ops] def enforceAscendingEpoch(
      spark: org.apache.spark.sql.SparkSession, pairStoreDir: String,
      epochMin: Long, epochMax: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(pairStoreDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(root, WatermarkFile)
    val prior: Option[(Long, Long, Long)] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val body =
          try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
        Some((n.get("max").asLong, n.get("last_min").asLong,
          n.get("last_max").asLong))
      }
    prior match {
      case Some((m, lm, lx)) =>
        val replay = epochMin == lm && epochMax == lx
        require(replay || epochMin > m,
          s"streaming near-dup: out-of-order epoch (min doc_id $epochMin " +
            s"does not exceed the store watermark $m at $pairStoreDir) — " +
            "the stage keeps first-arrival survivors and cannot retract " +
            "an already-shipped doc, so unordered ids would silently keep " +
            "two members of one component; feed epochs in ascending " +
            "doc_id order, or run the batch funnel as the backfill tool")
        if (!replay) writeWatermark(fs, p, epochMax, epochMin, epochMax)
      case None => writeWatermark(fs, p, epochMax, epochMin, epochMax)
    }
  }

  private def writeWatermark(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, max: Long, lastMin: Long,
      lastMax: Long): Unit =
    graft.fs.AtomicRename.publishSmallFile(fs, p,
      s"""{"max":$max,"last_min":$lastMin,"last_max":$lastMax}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8),
      s".tmp-${ProcessHandle.current().pid()}")
}
