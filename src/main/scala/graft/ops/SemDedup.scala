package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style SEMANTIC deduplication: partition the embedding space
  * with k-means, generate near-duplicate pairs only WITHIN each cluster
  * (exact cosine ≥ `tau` on the clustered candidates), then keep one
  * representative per duplicate component. The embedding-space
  * complement to the LSH blocking in `Dedup.embeddingNearDupPairs`:
  * LSH blocks by random hyperplanes, SemDeDup blocks by LEARNED
  * cluster structure — the recipe the paper applies to web-scale
  * image/text corpora, where semantic duplicates concentrate inside
  * k-means cells.
  *
  * Scale shape: the cluster assignment is one broadcast join against
  * k centroid rows plus a per-id argmax (map-side). The quadratic
  * step is fenced INSIDE cells — the within-cell self-join shuffles
  * (cell, id, vec) rows by cell, and with k sized so cells hold ~10³
  * vectors (k ≈ N/1000) each cell's pair block is ~10⁶ comparisons,
  * embarrassingly parallel across cells. A skewed cell degrades one
  * task, not the job; `IvfIndex.imbalance`-style occupancy telemetry
  * applies unchanged if cells drift. Components + keep-one reuse the
  * dedup family's machinery ((id,label)-only shuffles).
  *
  * Approximation contract (the paper's, stated not hidden): duplicates
  * SPLIT ACROSS cells are not examined — exact clones always co-locate
  * (identical vectors have identical centroid distances and the argmax
  * tie-break is deterministic), but near-dups straddling a cell
  * boundary can survive. Pair formation counters exactly that loss with
  * SOFT top-2 assignment (r15 verdict #1): a vector whose best/second
  * cosine margin is within [[SemDedup.DefaultBand]] also forms pairs in
  * its second-nearest cell — both members of a straddling cosine-≥τ
  * pair sit near the shared boundary, so both carry a small margin and
  * the pair co-buckets in one of the probed cells (corner straddlers
  * need the top-3 probe — see [[SemDedup.DefaultMaxProbe]]). Assignment
  * stays map-only (the fused `nearest_cells_soft` argmax); only
  * in-band vectors duplicate, so within-cell work grows with the band
  * fraction, not 4×. Raising `iters` tightens cells; LSH
  * (`Dedup.embeddingNearDupPairs`) remains the exhaustive-recall
  * alternative when a missed pair is a correctness defect. */
object SemDedup {

  /** Default soft-assignment cosine margin for pair formation: vectors
    * whose centroid cosine sits within this margin of their best cell
    * also probe the next-nearest cell(s). Measured on the 100× soak
    * corpus (BASELINE r16): non-clone straddler recall 0.768 (hard
    * fence) → 0.98 at 1.2× the semdedup wall. 0 restores the paper's
    * hard fence. */
  val DefaultBand: Double = 0.03

  /** Probe-set cap for soft assignment. 3, not 2: the 100× soak
    * measured top-2 plateauing at 0.949 non-clone recall however wide
    * the band (0.04 and 0.06 read identically) — the remaining true
    * pairs split across a CORNER where three cells meet, so the
    * partner's cell is one member's THIRD-nearest. Top-3 at band 0.03
    * reads 0.98. Cells past the band never emit, so the common case
    * still probes 1 cell. */
  val DefaultMaxProbe: Int = 3

  /** Production cluster count for a corpus of `n` vectors: cells hold
    * ~`targetCell` members, so the within-cell pair block stays
    * ~targetCell² comparisons per cell REGARDLESS of corpus size — the
    * `Similarity.planesFor` analogue for the k-means fence (a fixed k
    * densifies cells linearly with the corpus and the self-join grows
    * quadratically, the same failure the LSH soak measured at fixed
    * planes). Assignment cost grows as n·k; at k ≈ n/targetCell that is
    * n²/targetCell broadcast-local flops — bounded cell size is the
    * trade SemDeDup makes for learned (not random) blocking. */
  def clustersFor(n: Long, targetCell: Int = 256): Int =
    math.max(4, math.ceil(n.toDouble / targetCell).toInt)

  /** Cluster assignment: (id, cell, vec) with each embedding assigned
    * to its max-cosine centroid (ties → higher cell id, deterministic)
    * — the shared map-only `Similarity.assignCells` path (the
    * `nearest_cell` codegen argmax; no n·k join explosion). */
  def assign(
      embs: DataFrame,
      nClusters: Int,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // no fanOut (measured at sf0.1): the argmax passes are cheap enough
    // that the spread's exchange cost ~0.9-1.2s across the semdedup
    // gates — and leaving the scan's partitioning alone also keeps the
    // k-means mean's summation order (hence cell centroids) identical
    // to every earlier round's
    val cents = Similarity.kmeansCentroids(embs, nClusters, iters, idCol, vecCol)
    Similarity.assignCells(
      embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec")),
      cents)
      .select(col("id"), col("cell"), col("vec"))
  }

  /** Soft-assignment variant of [[assign]] for pair formation:
    * (id, cell, cells, vec) where `cell` is exactly [[assign]]'s
    * primary answer and `cells` adds the second-nearest centroid for
    * vectors within `band` of their cell boundary (see DefaultBand). */
  def assignSoft(
      embs: DataFrame,
      nClusters: Int,
      band: Double = DefaultBand,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxProbe: Int = DefaultMaxProbe): DataFrame = {
    // no fanOut — see assign()
    val cents = Similarity.kmeansCentroids(embs, nClusters, iters, idCol, vecCol)
    Similarity.assignCellsSoft(
      embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec")),
      cents, band, maxProbe)
      .select(col("id"), col("cell"), col("cells"), col("vec"))
  }

  /** Within-cell near-duplicate pairs at exact cosine ≥ `tau`:
    * (doc_a, doc_b, cosine) with doc_a < doc_b, 4-dp rounded cosine
    * (the family's determinism convention). Pair formation probes the
    * SOFT cell set (top-2 within `band` — straddler recovery, r15
    * verdict #1): a vector participates in every probed cell, and the
    * pair set dedupes the (rare) pair co-probed in both cells. */
  def pairs(
      embs: DataFrame,
      nClusters: Int,
      tau: Double,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      band: Double = DefaultBand,
      maxProbe: Int = DefaultMaxProbe): DataFrame = {
    val probe = assignSoft(embs, nClusters, band, iters, idCol, vecCol, maxProbe)
      .select(col("id"), col("vec"), explode(col("cells")).as("cell"))
      .localCheckpoint() // one k-means, reused by both join sides
    probe.as("a")
      .join(probe.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        round(Similarity.cosine(col("a.vec"), col("b.vec")), 4).as("cosine"))
      .filter(col("cosine") >= tau)
      // a pair whose members share BOTH probed cells arrives twice —
      // dedup over the surviving (tiny) pair set only
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Cell-fence recall telemetry (r13 verdict #7): the paper's
    * approximation contract says near-dups STRADDLING a cell boundary
    * survive — this measures that loss instead of trusting it. A
    * deterministic `sampleN`-vector sample (xxhash64-ordered, so the
    * same corpus probes the same sample every run) is cross-checked:
    * pairs the exhaustive LSH blocker finds on the sample
    * ([[Dedup.embeddingNearDupPairs]] at the same `tau`) vs pairs that
    * are CO-CELLED under `assigned` — within-cell search is exhaustive,
    * so the co-celled fraction IS the operator's recall on the sample.
    * Returns 1.0 on a pair-free sample. Log it like
    * [[IvfIndex.imbalance]]: a drifting corpus shows up as a falling
    * probe before it shows up as surviving duplicates. Cost: LSH over
    * `sampleN` vectors — bounded by the sample, never the corpus (the
    * fixed default LSH geometry is safe for exactly that reason). */
  /** NOTE (r14 verdict #2 — why [[recallBands]] supersedes this for
    * telemetry): this probe samples VECTORS, and a uniform sample's
    * surviving true pairs are clone-heavy (a pair needs BOTH endpoints
    * drawn — rate (s/N)² — so only dense clone groups yield pairs at
    * scale), while clones provably co-locate; the probe then reads 1.0
    * even when near-dup straddler loss is real. It remains correct as
    * an overall-sample recall; use the banded pair probe to SEE the
    * boundary loss. */
  def recallOfAssignment(
      assigned: DataFrame, tau: Double, sampleN: Int = 2000): Double = {
    val sample = assigned.orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleN)
      .localCheckpoint() // truth pairs + both cell joins read it
    val truth = Dedup.embeddingNearDupPairs(
      sample.select(col("id").as("vec_id"), col("vec").as("embedding")),
      threshold = tau)
      .select("id_a", "id_b")
    // a SOFT assignment is co-celled when the probe sets overlap — the
    // recallBands rule; a hard one degenerates to cell equality
    val cells = sample.select(col("id"),
      (if (assigned.columns.contains("cells")) col("cells")
       else array(col("cell"))).as("cs"))
    val counts = truth
      .join(cells.select(col("id").as("id_a"), col("cs").as("ca")), Seq("id_a"))
      .join(cells.select(col("id").as("id_b"), col("cs").as("cb")), Seq("id_b"))
      .agg(count(lit(1)).as("n"),
        count(when(arrays_overlap(col("ca"), col("cb")), lit(1))).as("co"))
      .collect().head
    if (counts.getLong(0) == 0L) 1.0
    else counts.getLong(1).toDouble / counts.getLong(0)
  }

  /** One cosine band of the pair-sampled recall probe. `clone` marks
    * the ≥ 0.9999 band (exact/near-exact copies — these co-locate by
    * construction and would mask the boundary signal if pooled). */
  final case class BandRecall(
      lo: Double, hi: Double, isClone: Boolean, pairs: Long, coCelled: Long) {
    def recall: Double = if (pairs == 0) 1.0 else coCelled.toDouble / pairs
  }

  /** Pair-sampled, cosine-banded cell-fence recall (r14 verdict #2):
    * the vector-sampling probe above cannot see near-dup straddlers —
    * its sampled true pairs are clone-heavy and clones co-locate — so
    * this probe samples PAIRS instead, via LSH-bucket sampling: one
    * map-only signature pass over `assigned` (the same O(corpus) class
    * as the assignment itself), keep only buckets whose
    * xxhash64(table, bucket) hashes into a 1-in-`m` sample sized so
    * ~`sampleN` vectors survive per table, and generate candidate pairs
    * WITHIN sampled buckets only — pair yield scales LINEARLY with the
    * true-pair count (every true pair co-buckets in some table at LSH
    * recall), not quadratically with the vector-sampling rate, and the
    * quadratic join cost stays bounded by the sample. Surviving pairs
    * at cosine ≥ `tau` are stratified by cosine band (clones ≥ 0.9999
    * separate; `bandWidth` slices from `tau` up) and each band reports
    * its co-celled fraction — within-cell search is exhaustive, so that
    * fraction IS the operator's recall on that band. A falling
    * near-band recall is the cell-straddle loss showing up in
    * telemetry before it shows up as surviving duplicates. */
  def recallBands(
      assigned: DataFrame,
      tau: Double,
      sampleN: Int = 2000,
      bandWidth: Double = 0.05,
      tables: Int = 16): Seq[BandRecall] = {
    val n = assigned.count()
    if (n == 0) return Nil
    val planes = Similarity.planesFor(n)
    val m = math.max(1L, math.round(n.toDouble / sampleN))
    // a SOFT assignment ([[assignSoft]] — carries the probed cell SET)
    // is co-celled when the probe sets overlap: that is exactly the
    // pair-formation condition [[pairs]] applies, so the measured
    // fraction stays the operator's true recall on the band
    val soft = assigned.columns.contains("cells")
    val cellCols =
      if (soft) Seq(col("cells")) else Seq(col("cell"))
    val sig = assigned.select((Seq(col("id"), col("vec")) ++ cellCols :+
        explode(array((0 until tables).map { t =>
          struct(lit(t).as("tbl"),
            Similarity.lshSignature(col("vec"), planes, t * planes)
              .as("bucket"))
        }: _*)).as("tb")): _*)
      .select((Seq(col("id"), col("vec")) ++ cellCols ++
        Seq(col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))): _*)
      // the bucket sample: deterministic, whole buckets — a pair's two
      // endpoints survive or fall TOGETHER, which is the whole trick
      .filter(pmod(xxhash64(col("tbl"), col("bucket")), lit(m)) === 0)
      .localCheckpoint() // both sides of the bucket self-join read it
    val coPred =
      if (soft) arrays_overlap(col("a.cells"), col("b.cells"))
      else col("a.cell") === col("b.cell")
    val pairs = sig.as("a").join(sig.as("b"), Seq("tbl", "bucket"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(Similarity.cosine(col("a.vec"), col("b.vec")), 4).as("cosine"),
        coPred.as("co"))
      .filter(col("cosine") >= tau)
      .dropDuplicates("id_a", "id_b")
    val rows = pairs.withColumn("band",
        when(col("cosine") >= 0.9999, lit(-1))
          .otherwise(floor((col("cosine") - lit(tau)) / lit(bandWidth))
            .cast("int")))
      .groupBy("band").agg(count(lit(1)).as("n"),
        count(when(col("co"), lit(1))).as("co"))
      .collect()
    rows.map { r =>
      val b = r.getInt(0)
      if (b == -1) BandRecall(0.9999, 1.0, isClone = true,
        r.getLong(1), r.getLong(2))
      else BandRecall(tau + b * bandWidth,
        math.min(0.9999, tau + (b + 1) * bandWidth), isClone = false,
        r.getLong(1), r.getLong(2))
    }.sortBy(_.lo).toIndexedSeq
  }

  /** The headline number over [[recallBands]]: co-celled fraction of
    * the NON-clone pairs — the straddler loss the clone band masks.
    * 1.0 when the sample yielded no non-clone pairs (check the bands'
    * `pairs` counts before trusting a 1.0). */
  def nearDupRecall(bands: Seq[BandRecall]): Double = {
    val near = bands.filterNot(_.isClone)
    val p = near.map(_.pairs).sum
    if (p == 0) 1.0 else near.map(_.coCelled).sum.toDouble / p
  }

  /** Convenience form: cluster, assign, probe — for standalone health
    * checks. A pipeline already running [[dedup]] should call
    * [[recallOfAssignment]] on the assignment it computed instead of
    * paying a second k-means. */
  def recallProbe(
      embs: DataFrame,
      nClusters: Int,
      tau: Double,
      iters: Int = 2,
      sampleN: Int = 2000,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Double =
    recallOfAssignment(assign(embs, nClusters, iters, idCol, vecCol),
      tau, sampleN)

  /** Keep-one semantic dedup: `embs` minus every non-representative
    * member of a within-cell duplicate component (min-id
    * representative, via the shared components machinery). */
  def dedup(
      embs: DataFrame,
      nClusters: Int,
      tau: Double,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      band: Double = DefaultBand,
      maxProbe: Int = DefaultMaxProbe): DataFrame =
    Dedup.keepRepresentatives(
      embs,
      pairs(embs, nClusters, tau, iters, idCol, vecCol, band, maxProbe),
      idCol)

  /** Result of [[tuneSoft]]: the chosen soft-assignment geometry, the
    * recall it measured, and how many ladder rungs were probed. */
  final case class SoftTune(
      band: Double, maxProbe: Int, recall: Double, rungsProbed: Int)

  /** The escalation ladder [[tuneSoft]] climbs: each rung widens the
    * boundary margin or the probe-set cap from the shipped defaults.
    * Ordered by pair-formation cost (within-cell work grows with the
    * duplicated-vector fraction, so band doubles before maxProbe
    * bumps). The final rung is the widest geometry the tuner will
    * recommend — past it, LSH (`Dedup.embeddingNearDupPairs`) is the
    * honest exhaustive-recall alternative. */
  val TuneLadder: Seq[(Double, Int)] = Seq(
    (DefaultBand, DefaultMaxProbe),       // shipped default (0.03, 3)
    (2 * DefaultBand, DefaultMaxProbe),   // wider margin, same corners
    (2 * DefaultBand, DefaultMaxProbe + 1),
    (4 * DefaultBand, DefaultMaxProbe + 1),
    (4 * DefaultBand, DefaultMaxProbe + 2))

  /** Recall-targeted soft-assignment tuning (r16 verdict #3): the
    * shipped (band, maxProbe) was hand-tuned on one synthetic soak
    * corpus — at a different embedding distribution (or 1000× the
    * scale) the fixed margin drifts. This drives the geometry from the
    * measurement instead: ONE k-means (reused across rungs — the tuner
    * never re-clusters), then per ladder rung a map-only soft
    * assignment and a [[recallBands]] probe; the first rung whose
    * non-clone recall meets `targetRecall` wins. `wallBudgetSec` bounds
    * the climb: when a rung's probe exhausts the budget, the best rung
    * SO FAR returns (with its measured recall, so the caller sees the
    * shortfall instead of trusting a silent cap). Returns the widest
    * rung's result when the target is never met — recall is reported,
    * never assumed. Cost per rung: one n·k assignment + one
    * bucket-sampled probe, both the same O(corpus) class as the dedup
    * itself. */
  def tuneSoft(
      embs: DataFrame,
      nClusters: Int,
      tau: Double,
      targetRecall: Double = 0.95,
      iters: Int = 2,
      sampleN: Int = 2000,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      wallBudgetSec: Double = Double.MaxValue,
      ladder: Seq[(Double, Int)] = TuneLadder): SoftTune = {
    require(ladder.nonEmpty, "tuneSoft: empty ladder")
    // saturating add: the no-budget default is Double.MaxValue, whose
    // nanos overflow a Long — a wrapped (negative) deadline would stop
    // the climb after rung 1
    val deadline = {
      val now = System.nanoTime()
      val budgetNanos = wallBudgetSec * 1e9
      if (budgetNanos >= (Long.MaxValue - now).toDouble) Long.MaxValue
      else now + budgetNanos.toLong
    }
    val cents = Similarity.kmeansCentroids(embs, nClusters, iters, idCol, vecCol)
    val base = embs.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .localCheckpoint() // one read feeds every rung's assignment
    var best: Option[SoftTune] = None
    var rungs = 0
    ladder.foreach { case (b, mp) =>
      if (best.forall(_.recall < targetRecall) &&
          (rungs == 0 || System.nanoTime() < deadline)) {
        rungs += 1
        val assigned = Similarity.assignCellsSoft(base, cents, b, mp)
          .select(col("id"), col("cell"), col("cells"), col("vec"))
        val r = nearDupRecall(recallBands(assigned, tau, sampleN))
        if (best.forall(_.recall < r)) best = Some(SoftTune(b, mp, r, rungs))
        else best = best.map(_.copy(rungsProbed = rungs))
      }
    }
    best.get
  }
}
