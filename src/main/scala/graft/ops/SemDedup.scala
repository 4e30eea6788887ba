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
  * boundary can survive. Raising `iters` tightens cells; LSH
  * (`Dedup.embeddingNearDupPairs`) is the exhaustive-recall
  * alternative when a missed pair is a correctness defect. */
object SemDedup {

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
    val cents = Similarity.kmeansCentroids(embs, nClusters, iters, idCol, vecCol)
    Similarity.assignCells(
      embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec")),
      cents)
      .select(col("id"), col("cell"), col("vec"))
  }

  /** Within-cell near-duplicate pairs at exact cosine ≥ `tau`:
    * (doc_a, doc_b, cosine) with doc_a < doc_b, 4-dp rounded cosine
    * (the family's determinism convention). */
  def pairs(
      embs: DataFrame,
      nClusters: Int,
      tau: Double,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val assigned = assign(embs, nClusters, iters, idCol, vecCol)
      .localCheckpoint() // one k-means, reused by both join sides
    assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        round(Similarity.cosine(col("a.vec"), col("b.vec")), 4).as("cosine"))
      .filter(col("cosine") >= tau)
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
  def recallOfAssignment(
      assigned: DataFrame, tau: Double, sampleN: Int = 2000): Double = {
    val sample = assigned.orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleN)
      .localCheckpoint() // truth pairs + both cell joins read it
    val truth = Dedup.embeddingNearDupPairs(
      sample.select(col("id").as("vec_id"), col("vec").as("embedding")),
      threshold = tau)
      .select("id_a", "id_b")
    val cells = sample.select("id", "cell")
    val counts = truth
      .join(cells.select(col("id").as("id_a"), col("cell").as("ca")), Seq("id_a"))
      .join(cells.select(col("id").as("id_b"), col("cell").as("cb")), Seq("id_b"))
      .agg(count(lit(1)).as("n"),
        count(when(col("ca") === col("cb"), lit(1))).as("co"))
      .collect().head
    if (counts.getLong(0) == 0L) 1.0
    else counts.getLong(1).toDouble / counts.getLong(0)
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
      vecCol: String = "embedding"): DataFrame =
    Dedup.keepRepresentatives(
      embs, pairs(embs, nClusters, tau, iters, idCol, vecCol), idCol)
}
