package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** SemDeDup semantic dedup: clone groups collapse to their min-id
  * representative, distinct vectors survive, assignment is
  * deterministic, and the within-cell fence holds (pairs only form
  * inside a cell). */
class SemDedupSpec extends SparkSuite {

  /** 4 well-separated base directions in 8 dims, plus exact clones of
    * base 0 and near-clones (tiny perturbation) of base 1. */
  private lazy val corpus = {
    import spark.implicits._
    def v(dir: Int, eps: Double = 0.0): Seq[Double] = {
      val a = Array.fill(8)(0.01)
      a(dir * 2) = 1.0
      a((dir * 2 + 1) % 8) += eps
      a.toSeq
    }
    Seq(
      (0L, v(0)), (1L, v(0)), (2L, v(0, 0.02)), // clone group {0,1,2}
      (10L, v(1)), (11L, v(1, 0.05)),           // near-clone pair {10,11}
      // (0.05, not smaller: pairs round cosine at 4 dp, so a
      // perturbation must keep the rounded cosine clear of 1.0000)
      (20L, v(2)),                              // singletons
      (30L, v(3))
    ).toDF("vec_id", "embedding")
  }

  test("clone groups collapse to the min-id representative") {
    val kept = SemDedup.dedup(corpus, nClusters = 4, tau = 0.99)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 10L, 20L, 30L))
  }

  test("tau fences the pair set: higher tau removes less") {
    val loose = SemDedup.dedup(corpus, nClusters = 4, tau = 0.9).count()
    val tight = SemDedup.dedup(corpus, nClusters = 4, tau = 0.9995).count()
    assert(loose <= tight)
    // at a tau above the near-clone cosine only EXACT clones collapse
    val keptTight = SemDedup.dedup(corpus, nClusters = 4, tau = 0.9995)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptTight.contains(10L) && keptTight.contains(11L))
  }

  test("exact clones always co-locate; pairs carry exact 4-dp cosine") {
    val p = SemDedup.pairs(corpus, nClusters = 4, tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the exact clone pair is present at cosine 1.0
    assert(p.exists { case (a, b, c) => a == 0L && b == 1L && c == 1.0 })
    p.foreach { case (a, b, c) =>
      assert(a < b); assert(c >= 0.99 && c <= 1.0)
    }
  }

  test("assignment is deterministic across runs") {
    val a1 = SemDedup.assign(corpus, nClusters = 4)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a2 = SemDedup.assign(corpus, nClusters = 4)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a1 == a2)
  }

  test("assignment is map-only (nearest_cell, no join); pair join never cartesian") {
    // parquet-backed source: a local Seq corpus constant-folds to a
    // LocalTableScan and the plan under test disappears
    val real = spark.read.parquet(s"$sf/embeddings.parquet")
    val aPlan = SemDedup.assign(real, nClusters = 4)
      .queryExecution.executedPlan.toString
    // the n·k centroid join is gone: assignment is one codegen argmax
    // over the plan-embedded matrix — no join, no exchange
    assert(aPlan.contains("nearest_cell"),
      s"assignment must use the nearest_cell expression, got:\n$aPlan")
    assert(!aPlan.contains("Join"),
      s"assignment must not join against centroids, got:\n$aPlan")
    val pPlan = SemDedup.pairs(corpus, nClusters = 4, tau = 0.99)
      .queryExecution.executedPlan.toString
    assert(!pPlan.contains("CartesianProduct"),
      s"within-cell pairs must equi-join on cell, got:\n$pPlan")
  }

  test("no over-removal on the real corpus: every removed doc has a true witness") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    // background corpus max pair cosine ≈ 0.6 → nothing qualifies at .95
    val kept = SemDedup.dedup(embs, nClusters = 16, tau = 0.95)
    assert(kept.count() == embs.count())
  }

  test("recall probe: co-celled fraction of the sample's true pairs, exactly") {
    import spark.implicits.newProductEncoder
    import spark.implicits.localSeqToDatasetHolder
    // manufactured assignment — the metric itself under test: 4 true
    // pairs (clone vectors at cosine 1.0), two co-celled and two
    // straddling a cell boundary → recall 0.5, no k-means in the loop
    def v(seed: Int): Seq[Double] = {
      val a = Array.fill(8)(0.01); a(seed % 8) = 1.0; a(seed % 3) += 0.2
      a.toSeq
    }
    val assigned = Seq(
      (1L, 0L, v(1)), (2L, 0L, v(1)),   // pair in one cell
      (3L, 1L, v(2)), (4L, 1L, v(2)),   // pair in one cell
      (5L, 2L, v(3)), (6L, 3L, v(3)),   // pair straddles cells
      (7L, 2L, v(4)), (8L, 4L, v(4)),   // pair straddles cells
      (9L, 5L, v(5))                    // pairless singleton
    ).toDF("id", "cell", "vec")
    assert(SemDedup.recallOfAssignment(assigned, tau = 0.99) == 0.5)
    // all co-celled → 1.0; pair-free sample → 1.0 by convention
    val coCelled = assigned.withColumn("cell", lit(0L))
    assert(SemDedup.recallOfAssignment(coCelled, tau = 0.99) == 1.0)
    val single = Seq((1L, 0L, v(1))).toDF("id", "cell", "vec")
    assert(SemDedup.recallOfAssignment(single, tau = 0.99) == 1.0)
    // end-to-end convenience form on the real corpus: identical clones
    // always co-locate (deterministic argmax) → probe reads 1.0
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val clones = embs.filter(col("vec_id") < 25)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val withClones = embs.unionByName(clones)
    val probe = SemDedup.recallProbe(withClones,
      SemDedup.clustersFor(withClones.count()), tau = 0.95)
    assert(probe == 1.0, s"clone probe read $probe")
  }

  test("banded pair probe sees the straddler loss the clone band masks") {
    import spark.implicits.newProductEncoder
    import spark.implicits.localSeqToDatasetHolder
    def v(seed: Int, eps: Double = 0.0): Seq[Double] = {
      val a = Array.fill(8)(0.01); a(seed % 8) = 1.0
      a((seed + 1) % 8) += eps
      a.toSeq
    }
    // clones co-celled (the real operator's invariant), near-dups
    // (cosine ≈ 0.97-0.99, below the 0.9999 clone cut) straddling —
    // the exact shape the vector-sampled probe reads as 1.0
    val assigned = Seq(
      (1L, 0L, v(1)), (2L, 0L, v(1)),          // clone pair, co-celled
      (3L, 1L, v(2)), (4L, 1L, v(2)),          // clone pair, co-celled
      (10L, 2L, v(3)), (11L, 5L, v(3, 0.18)),  // near pair, STRADDLES
      (12L, 3L, v(4)), (13L, 6L, v(4, 0.18)),  // near pair, STRADDLES
      (20L, 4L, v(5))
    ).toDF("id", "cell", "vec")
    // the old probe: 4 true pairs, 2 co-celled -> 0.5 pooled; with a
    // clone-dominant sample it would read near 1.0 — the banded probe
    // separates the signal instead of pooling it
    val bands = SemDedup.recallBands(assigned, tau = 0.9)
    val clone = bands.filter(_.isClone)
    val near = bands.filterNot(_.isClone)
    assert(clone.map(_.pairs).sum == 2 && clone.forall(_.recall == 1.0),
      s"clone band wrong: $bands")
    assert(near.map(_.pairs).sum == 2 && near.map(_.coCelled).sum == 0,
      s"near bands must hold the straddlers: $bands")
    assert(SemDedup.nearDupRecall(bands) == 0.0)
    // co-celling the near pairs flips the headline to 1.0
    val healed = assigned.withColumn("cell",
      when(col("id") === 11L, lit(2L))
        .when(col("id") === 13L, lit(3L)).otherwise(col("cell")))
    val healedBands = SemDedup.recallBands(healed, tau = 0.9)
    assert(SemDedup.nearDupRecall(healedBands) == 1.0, s"$healedBands")
    assert(SemDedup.nearDupRecall(Nil) == 1.0) // pair-free convention
  }

  test("nearest_cells_soft: element 0 is the hard argmax; band widens to top-2") {
    import spark.implicits.newProductEncoder
    import spark.implicits.localSeqToDatasetHolder
    // fixed centroids at the axes; v at 45° ± ε has margin ≈ 1.41ε
    val cells = Array(0L, 1L)
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val eps = 0.02 // rad — margin ≈ 0.028
    val vs = Seq(
      (0L, Seq(math.cos(math.Pi / 4 - eps), math.sin(math.Pi / 4 - eps))),
      (1L, Seq(math.cos(math.Pi / 4 + eps), math.sin(math.Pi / 4 + eps))),
      (2L, Seq(1.0, 0.0)), // dead-center in cell 0: margin ≈ 0.29
      (3L, Seq(0.0, 0.0))  // zero vector: NaN cosine, single cell
    ).toDF("id", "vec")
    def softAt(band: Double): Map[Long, Seq[Long]] = vs.select(col("id"),
        graft.functions.Vec.nearestCellsSoft(col("vec"), cells, cents, band)
          .as("cs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hard = vs.select(col("id"),
        graft.functions.Vec.nearestCell(col("vec"), cells, cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wide = softAt(0.05)
    // element 0 ALWAYS equals the hard argmax — primary semantics pinned
    wide.foreach { case (id, cs) => assert(cs.head == hard(id), s"id $id") }
    assert(wide(0L) == Seq(0L, 1L) && wide(1L) == Seq(1L, 0L),
      s"boundary vectors must probe both cells: $wide")
    assert(wide(2L) == Seq(0L), "a solidly-assigned vector stays single")
    assert(wide(3L).length == 1, "NaN margin must stay single-celled")
    val tight = softAt(1e-9)
    assert(tight.values.forall(_.length == 1),
      s"near-zero band must restore the hard fence: $tight")
  }

  test("soft band recovers a pair straddling the k-means boundary") {
    import spark.implicits.newProductEncoder
    import spark.implicits.localSeqToDatasetHolder
    // ids 0,1 are the k-means seeds (first in id order) at the poles —
    // Lloyd keeps the two cells there; the planted pair sits on the 45°
    // bisector, one member each side (margin ≈ 0.028, cosine ≈ 0.9992)
    def at(theta: Double): Seq[Double] = Seq(math.cos(theta), math.sin(theta))
    val jig = Seq(
      (0L, at(0.0)), (1L, at(math.Pi / 2)),
      (2L, at(0.05)), (3L, at(0.08)), (4L, at(-0.06)),
      (5L, at(math.Pi / 2 - 0.05)), (6L, at(math.Pi / 2 + 0.06)),
      (100L, at(math.Pi / 4 - 0.02)), (101L, at(math.Pi / 4 + 0.02))
    ).toDF("vec_id", "embedding")
    val hardCells = SemDedup.assign(jig, nClusters = 2)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hardCells(100L) != hardCells(101L),
      s"fixture must straddle: $hardCells") // the loss being fixed
    def pairSet(band: Double): Set[(Long, Long)] =
      SemDedup.pairs(jig, nClusters = 2, tau = 0.999, band = band)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairSet(0.0).contains((100L, 101L)),
      "band 0 is the paper's hard fence — the straddler survives")
    assert(pairSet(0.05).contains((100L, 101L)),
      "the soft band must recover the straddling pair")
    // keep-one dedup over the soft pairs drops exactly one member
    val kept = SemDedup.dedup(jig, nClusters = 2, tau = 0.999, band = 0.05)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(100L) && !kept.contains(101L), s"kept: $kept")
    // primary assignment parity: assignSoft's cell == assign's cell
    val soft = SemDedup.assignSoft(jig, nClusters = 2, band = 0.05)
    val prim = soft.select("id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prim == hardCells)
    soft.select("cell", "cells").collect().foreach(r =>
      assert(r.getSeq[Long](1).head == r.getLong(0)))
    // the banded probe measures the SOFT fence: the straddler counts
    // as co-celled because its probe sets overlap
    val bands = SemDedup.recallBands(soft.localCheckpoint(), tau = 0.999)
    assert(SemDedup.nearDupRecall(bands) == 1.0,
      s"soft probe must see the recovered straddler: $bands")
  }

  test("tuneSoft: climbs the ladder to the recall target, reports honestly past it") {
    import spark.implicits.newProductEncoder
    import spark.implicits.localSeqToDatasetHolder
    // the straddler jig again: the hard fence misses the planted pair,
    // so a ladder starting at band=0 must CLIMB; the shipped rung
    // (0.03, 3) already recovers it (margin ≈ 0.028 < 0.03)
    def at(theta: Double): Seq[Double] = Seq(math.cos(theta), math.sin(theta))
    val jig = Seq(
      (0L, at(0.0)), (1L, at(math.Pi / 2)),
      (2L, at(0.05)), (3L, at(0.08)), (4L, at(-0.06)),
      (5L, at(math.Pi / 2 - 0.05)), (6L, at(math.Pi / 2 + 0.06)),
      (100L, at(math.Pi / 4 - 0.02)), (101L, at(math.Pi / 4 + 0.02))
    ).toDF("vec_id", "embedding")
    // rung 1 = the paper's hard fence (misses the straddler), rung 2 =
    // the shipped default (recovers it): the tuner must stop at rung 2
    val t = SemDedup.tuneSoft(jig, nClusters = 2, tau = 0.999,
      targetRecall = 1.0,
      ladder = Seq((0.0, 1), (SemDedup.DefaultBand, SemDedup.DefaultMaxProbe)))
    assert(t.rungsProbed == 2 && t.band == SemDedup.DefaultBand &&
      t.maxProbe == SemDedup.DefaultMaxProbe, t.toString)
    assert(t.recall == 1.0, t.toString)
    // an unreachable target: the widest rung returns WITH its measured
    // shortfall — the caller sees the truth, never a silent cap
    val miss = SemDedup.tuneSoft(jig, nClusters = 2, tau = 0.999,
      targetRecall = 1.0, ladder = Seq((0.0, 1)))
    assert(miss.recall < 1.0 && miss.band == 0.0 && miss.rungsProbed == 1,
      miss.toString)
    // the tuned geometry feeds dedup: the straddler pair collapses
    val kept = SemDedup.dedup(jig, nClusters = 2, tau = 0.999,
      band = t.band, maxProbe = t.maxProbe)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(100L) && !kept.contains(101L), s"kept: $kept")
  }
}
