package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, both declarative (no UDFs, no driver loops):
  *  - `bruteForceTopK`: exact cosine top-k. The query set is broadcast
  *    (small dim table), candidates never move; top-k is computed in two
  *    stages — partial top-k per hash-slice of the candidates, then final
  *    top-k — so no single partition ever holds all candidates for a query
  *    (the naive `Window.partitionBy(query)` plan funnels the whole corpus
  *    through |queries| partitions; at 100 TB that is THE bottleneck).
  *  - `lshPairs` / `lshTopK`: random-hyperplane LSH. Deterministic planes
  *    (seeded hash, not RNG) → sign-bit signature → bucket equi-join.
  *    Exact cosine verifies candidates after blocking.
  *
  * Self-join blocker frames use EAGER `localCheckpoint`, not `persist` —
  * no CacheManager leak, blocks freed once unreachable — at the cost of
  * (a) no recovery on executor loss (checkpoint blocks have no lineage;
  * persist would recompute) and (b) a Spark job at call time even if the
  * result is never consumed. Same trade `Components.ofPairs` documents;
  * use its reliable-`checkpointDir` pattern around these operators when
  * executor churn is expected.
  */
object Similarity {

  /** dot(a, b) over array<float|double> columns, accumulated in double —
    * the native codegen expression (graft.functions.VectorDot), not the
    * interpreted `aggregate(zip_with(…))` lambda route. */
  def dot(a: Column, b: Column): Column = graft.functions.Vec.dot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused single-loop cosine (graft.functions.CosineSimilarity): one
    * codegen'd traversal for a·b, ‖a‖², ‖b‖² instead of six interpreted
    * ones. */
  def cosine(a: Column, b: Column): Column = graft.functions.Vec.cosine(a, b)

  /** Exact cosine top-k: for each row of `queries`, the k nearest rows of
    * `candidates` (both keyed by `idCol`, vectors in `vecCol`). */
  def bruteForceTopK(
      queries: DataFrame,
      candidates: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      slices: Int = 32): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val scored = c.join(q) // broadcast nested loop: candidates × (small) queries
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qvec"), col("cvec")), 4).as("cosine"))
    twoStageTopK(scored, k, slices)
  }

  /** Exact per-query top-k of a (query_id, neighbor_id, cosine) frame in
    * two stages: top-k within each hash-slice of the candidate space,
    * then final top-k over the ≤ slices·k survivors. Identical rows to
    * the single-window form (every global top-k row survives its slice),
    * but no partition ever holds one query's whole candidate set — the
    * naive `Window.partitionBy(query)` funnels the corpus through
    * |queries| partitions, THE scale bottleneck of every ANN scorer
    * here, so all of them (brute-force, LSH, IVF, the persisted index)
    * end in this helper. */
  private[ops] def twoStageTopK(scored: DataFrame, k: Int, slices: Int = 32): DataFrame = {
    val sliced = scored.withColumn("slice", pmod(hash(col("neighbor_id")), lit(slices)))
    val w1 = Window.partitionBy("query_id", "slice")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val partial = sliced.withColumn("r", row_number().over(w1)).filter(col("r") <= k)
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    partial.withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Sign-bit LSH signature: bit p = (v · plane_p) >= 0 with
    * deterministic pseudo-random planes (xxhash64-derived components,
    * same constants every run). Delegates to the fused codegen
    * expression (graft.functions.LshSignature) — one planes×dims loop
    * in whole-stage codegen instead of `planes` interpreted lambda
    * trees per row. */
  def lshSignature(vec: Column, planes: Int, planeOffset: Int = 0): Column =
    graft.functions.Vec.lshSignature(vec, planes, planeOffset)

  /** All candidate pairs sharing an LSH bucket, with exact cosine. */
  def lshPairs(
      embs: DataFrame,
      planes: Int = 12,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val sig = embs.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", lshSignature(col("vec"), planes))
      // both sides of the bucket self-join read this; materialize once.
      // localCheckpoint, not persist: persist registers in CacheManager
      // and leaks the blocks until an explicit unpersist (which a lazy
      // return can never safely place); checkpoint blocks are freed by
      // the ContextCleaner once the frame is unreachable.
      .localCheckpoint()
    sig.as("a").join(sig.as("b"), Seq("bucket"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosine(col("a.vec"), col("b.vec")), 4).as("cosine"))
  }

  /** Plane count that keeps expected per-bucket occupancy bounded as
    * the corpus grows: 2^planes sign-buckets per table, so fixing
    * occupancy at `targetPerBucket` means planes = ⌈log2(n/target)⌉.
    * Geometry is a SCALE KNOB, not a constant — the r9 soak measured
    * the fixed 8-plane default quadratic in corpus size (0.8 s at 800
    * vectors, 8.0 s at 8k, unfinishable at 80k) while log-scaled
    * planes stayed ~linear (BASELINE §r9). Recall cost of more planes
    * is bounded by the independent tables: per-table collision at
    * cosine 0.968 is 0.919^planes, so 16 tables hold pair-miss under
    * ~0.3% through planes=14; past ~20 planes raise `tables` too.
    * Clamped to [minPlanes, 24]. */
  def planesFor(
      corpusSize: Long,
      targetPerBucket: Int = 16,
      minPlanes: Int = 8): Int = {
    require(corpusSize >= 0 && targetPerBucket >= 1)
    val needed = math.ceil(
      math.log(math.max(corpusSize, 1).toDouble / targetPerBucket) /
        math.log(2.0)).toInt
    math.min(math.max(needed, minPlanes), 24)
  }

  /** All candidate pairs sharing an LSH bucket in ANY of `tables`
    * independent plane sets, with exact cosine — the multi-table variant
    * of `lshPairs`. Single-table sign-LSH is a poor BLOCKER for a
    * completeness contract (a pair at angle θ shares all `planes` sign
    * bits with prob (1−θ/π)^planes — only ~0.51 at cosine 0.97 with 8
    * planes); `tables` independent plane sets drive the miss probability
    * down geometrically ((1−0.51)^16 ≈ 1e-5 per pair) while candidate
    * volume grows only linearly — the same recall/cost dial as
    * `lshTopKMulti`, applied to the self-join.
    *
    * Scale: the bucket explode is MAP-ONLY (`tables` rows per vector);
    * the only shuffles are the (tbl, bucket) self-join — keys distribute
    * uniformly by construction — and the pair dedupe. Vectors ride the
    * join so the exact cosine needs no third join; at dim 64 that is
    * ~0.5 KB per row, cheaper than re-joining the corpus twice. */
  def lshPairsMulti(
      embs: DataFrame,
      planes: Int = 8,
      tables: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(tables >= 1, s"tables must be >= 1: $tables")
    val sig = embs.select(col(idCol).as("id"), col(vecCol).as("vec"),
      explode(array((0 until tables).map { t =>
        struct(lit(t).as("tbl"),
          lshSignature(col(vecCol), planes, t * planes).as("bucket"))
      }: _*)).as("tb"))
      .select(col("id"), col("vec"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      // both sides of the bucket self-join read this; materialize once.
      // localCheckpoint, not persist — see lshPairs: no CacheManager
      // entry to leak, blocks freed when the frame is unreachable.
      .localCheckpoint()
      // fanOut on the join key: the self-join's reduce side runs every
      // cosine; an AQE-byte-coalesced (or single-block) checkpoint must
      // not serialize it — no-op at scale (see Scale.fanOutForCompute)
      .transform(s => Scale.fanOutForCompute(s, col("tbl"), col("bucket")))
    sig.as("a").join(sig.as("b"), Seq("tbl", "bucket"))
      .filter(col("a.id") < col("b.id"))
      // score BEFORE the pair dedupe: the cosine is a map-side fused
      // loop (dim multiply-adds) computed while both vectors are already
      // in hand from the bucket join, so the dedupe exchange moves only
      // (id, id, cosine) rows — 32 bytes — instead of two vectors per
      // row. Recomputing the cosine for a pair that collides in several
      // tables costs ≤ tables·dim flops; shuffling vectors to save that
      // recompute costs ~30× the exchange volume (measured 2× wall-clock
      // at sf0.1, worse with wider embeddings).
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosine(col("a.vec"), col("b.vec")), 4).as("cosine"))
      // a pair colliding in several tables must surface once
      .dropDuplicates("id_a", "id_b")
  }

  /** Lloyd-iteration k-means centroids for the IVF index, fully
    * deterministic: init = first `nlist` vectors in id order, then
    * `iters` rounds of (broadcast-assign → per-dimension mean). Each
    * round is one pass over the corpus; the k×dim centroid table rides
    * on the driver between rounds (tiny). Means are computed in double
    * via posexplode + avg — no vector UDFs. */
  def kmeansCentroids(
      candidates: DataFrame,
      nlist: Int,
      iters: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val cand = candidates.select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    var cents = cand.orderBy("cid").limit(nlist)
      .withColumn("cell",
        row_number().over(Window.orderBy("cid")).cast("long") - 1)
      .select(col("cell"), col("cvec").cast("array<double>").as("centroid"))
    var round = 0
    var emptySeed = false // an empty corpus stays empty — stop refining
    while (round < iters && !emptySeed) {
      // map-only argmax (nearest_cell): the old join-then-groupBy shape
      // shuffled n·k vector-carrying rows per Lloyd round — see
      // assignCells. Collecting cents is the k×dim driver round-trip
      // this loop already makes at the end of every round.
      val crows = cents
        .select(col("cell").cast("long"), col("centroid").cast("array<double>"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1)
      if (crows.isEmpty) emptySeed = true
      else {
        val assigned = cand.select(
          graft.functions.Vec.nearestCell(
            col("cvec"), crows.map(_._1), crows.map(_._2)).as("cell"),
          col("cvec"))
        val means = assigned
          .select(col("cell"), posexplode(col("cvec")).as(Seq("pos", "x")))
          .groupBy("cell", "pos").agg(avg(col("x")).as("m"))
          .groupBy("cell")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            p => p.getField("m")).as("centroid"))
        // k×dim round-trip through the driver keeps the next round's plan flat
        val rows = means.collect().map(r =>
          (r.getAs[Long]("cell"), r.getSeq[Double](1)))
        cents = rows.toSeq.toDF("cell", "centroid")
      }
      round += 1
    }
    cents
  }

  /** Seed centroids: the first `nlist` vectors in id order, as
    * (cell, centroid) — ONE implementation shared by the inline IVF
    * operator and the persisted index (IvfIndex): the "persisted index
    * reproduces the inline path" parity contract requires identical
    * seeding. Expects columns (id, vec). */
  private[ops] def seedCentroids(cand: DataFrame, nlist: Int): DataFrame =
    cand.orderBy("id").limit(nlist)
      .select(col("id").as("cell"), col("vec").cast("array<double>").as("centroid"))

  /** Nearest-centroid assignment, MAP-ONLY via the `nearest_cell`
    * codegen expression — same sharing rationale as seedCentroids.
    * Expects (id, vec) × (cell, centroid) → (id, vec, cell).
    *
    * The previous shape (broadcast join × k centroids → n·k exploded
    * rows → vector-carrying groupBy argmax) shuffled n·k rows and went
    * quadratic as k tracks the corpus (1123 s at the 100× SemDeDup
    * soak); the fused argmax loop needs no shuffle at all. The collect
    * is the k-row centroid table (nlist / clustersFor — the same
    * driver bound kmeansCentroids' own round-trip already carries).
    * Assignments are bit-identical: same cosine accumulation order as
    * CosineSimilarity, ties → higher cell like max(struct(c, cell)). */
  private[ops] def assignCells(cand: DataFrame, centroids: DataFrame): DataFrame = {
    val rows = centroids
      .select(col("cell").cast("long"), col("centroid").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    if (rows.isEmpty) cand.select(col("id"), col("vec"))
      .withColumn("cell", lit(0L)).limit(0)
    else cand.select(col("id"), col("vec"),
      graft.functions.Vec.nearestCell(
        col("vec"), rows.map(_._1), rows.map(_._2)).as("cell"))
  }

  /** Soft top-2 variant of [[assignCells]] (r15 verdict #1 — SemDeDup
    * straddler recovery): (id, vec, cell, cells) where `cell` is
    * exactly assignCells' primary answer (`cells(0)`) and `cells` adds
    * the second-nearest centroid when the cosine margin is within
    * `band`. Still map-only — one fused argmax pass, no shuffle. */
  private[ops] def assignCellsSoft(
      cand: DataFrame, centroids: DataFrame, band: Double,
      maxProbe: Int = 2): DataFrame = {
    val rows = centroids
      .select(col("cell").cast("long"), col("centroid").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    if (rows.isEmpty) cand.select(col("id"), col("vec"))
      .withColumn("cell", lit(0L))
      .withColumn("cells", array(lit(0L))).limit(0)
    else cand.select(col("id"), col("vec"),
        graft.functions.Vec.nearestCellsSoft(
          col("vec"), rows.map(_._1), rows.map(_._2), band, maxProbe)
          .as("cells"))
      .select(col("id"), col("vec"),
        element_at(col("cells"), 1).as("cell"), col("cells"))
  }

  /** IVF (inverted-file) ANN top-k: candidates are partitioned into
    * `nlist` cells by nearest centroid; each query probes only its
    * `nprobe` nearest cells. Default centroids are the first `nlist`
    * candidates in id order; pass `kmeansIters > 0` for Lloyd-refined
    * cells. Cell assignment is a broadcast nested-loop + max_by —
    * candidates never shuffle by anything except their cell id, so the
    * index build is one pass over the corpus and the probe reads
    * nprobe/nlist of it. */
  def ivfTopK(
      queries: DataFrame,
      candidates: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      kmeansIters: Int = 0): DataFrame = {
    val cand = candidates.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val centroids = broadcast(
      if (kmeansIters > 0)
        kmeansCentroids(candidates, nlist, kmeansIters, idCol, vecCol)
      else seedCentroids(cand, nlist))
    val assigned = assignCells(cand, centroids)
      .withColumnRenamed("id", "neighbor_id").withColumnRenamed("vec", "cvec")
    val qcells = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .join(centroids)
      .withColumn("r", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(cosine(col("qvec"), col("centroid")).desc, col("cell").asc)))
      .filter(col("r") <= nprobe)
      .select(col("query_id"), col("qvec"), col("cell"))
    val scored = assigned.join(broadcast(qcells), Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qvec"), col("cvec")), 4).as("cosine"))
    twoStageTopK(scored, k)
  }

  /** ANN top-k via LSH: search only same-bucket candidates. Recall is
    * tunable by `planes` (fewer planes → bigger buckets → higher recall). */
  def lshTopK(
      queries: DataFrame,
      candidates: DataFrame,
      k: Int,
      planes: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("bucket", lshSignature(col("qvec"), planes)))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("bucket", lshSignature(col("cvec"), planes))
    val scored = c.join(q, Seq("bucket"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qvec"), col("cvec")), 4).as("cosine"))
    twoStageTopK(scored, k)
  }

  /** Multi-table ANN top-k via LSH: `tables` independent plane sets
    * (plane indices t·planes..t·planes+planes−1 — deterministic, like
    * everything here), candidates = union of same-bucket points across
    * tables, exact-cosine re-rank of the deduplicated union. Recall
    * rises with tables (miss probability decays geometrically: a
    * neighbor at angle θ collides in one table with prob (1−θ/π)^planes
    * and must miss ALL tables to be lost) while candidate volume grows
    * only linearly — the standard recall/cost dial of sign-LSH.
    *
    * Scale: the query side (tables × |queries| rows) broadcasts; the
    * candidate side explodes `tables` bucket rows per vector MAP-ONLY —
    * the only shuffles are the two-stage top-k's, over matched
    * candidates, never the corpus. */
  def lshTopKMulti(
      queries: DataFrame,
      candidates: DataFrame,
      k: Int,
      planes: Int = 8,
      tables: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(tables >= 1, s"tables must be >= 1: $tables")
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        explode(array((0 until tables).map { t =>
          struct(lit(t).as("tbl"),
            lshSignature(col(vecCol), planes, t * planes).as("bucket"))
        }: _*)).as("tb"))
        .select(col(id), col(vec), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val q = broadcast(bucketed(queries, "query_id", "qvec"))
    val c = bucketed(candidates, "neighbor_id", "cvec")
    val scored = c.join(q, Seq("tbl", "bucket"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qvec"), col("cvec")), 4).as("cosine"))
      // a candidate colliding in several tables must score once
      .dropDuplicates("query_id", "neighbor_id")
    twoStageTopK(scored, k)
  }

  /** Int8 scalar quantization summary — the storage-compression step a
    * 100 TB embedding table runs before indexing (4× smaller than
    * float32): per vector, scale = max |component|, each component maps
    * to floor(x·127/scale + 0.5) ∈ [−127, 127].
    *
    * Map-only projection (no shuffle until the caller aggregates).
    * `floor(x + 0.5)` instead of `round`: engines disagree on
    * round-half-to-even vs half-up, floor is bit-deterministic
    * everywhere — which is what keeps this DuckDB-oracle-checkable.
    * `greatest(scale, 1e-300)` guards the all-zero vector without
    * changing any normal value. Per-row lambda cost is bounded by the
    * embedding dimension (64 here), the regime the HOF forms are fine
    * in (VectorExprs covers the hot O(n·k) scoring paths). */
  def quantizeInt8(
      embs: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val x = col(vecCol)
    val m = greatest(
      array_max(transform(x, v => abs(v.cast("double")))), lit(1e-300))
    embs
      .withColumn("__m", m)
      .withColumn("__q",
        transform(x, v =>
          floor(v.cast("double") * 127.0 / col("__m") + 0.5)))
      .select(
        col(idCol),
        col("__m").as("scale"),
        aggregate(col("__q"), lit(0L), (a, v) => a + v).as("sum_q"),
        size(filter(col("__q"), v => abs(v) === 127)).cast("long").as("n_max"))
  }
}
