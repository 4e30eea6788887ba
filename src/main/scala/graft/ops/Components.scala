package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a near-dup pair graph — the clustering step
  * a production dedup pipeline runs AFTER pair generation: each duplicate
  * cluster keeps one representative. The component id IS the
  * representative (the cluster's minimum doc id), so "keep one per
  * cluster" is a `doc_id === component` filter downstream.
  *
  * Algorithm: iterative min-label propagation kept in DataFrame land.
  * `label(v)` starts at `v`; each round lowers it to the min over v and
  * its neighbors; the fixpoint labels every vertex with its component's
  * minimum. Rounds needed = graph diameter. Near-dup clusters are
  * near-cliques by construction (every pair shares many shingles /
  * signature bands), so this converges in a handful of rounds — the
  * O(log n)-round alternating-star algorithm would pay extra shuffles
  * per round for a bound this graph never needs. At 100 TB each round
  * shuffles only (id, label) longs — document payloads never enter the
  * graph — and lineage is truncated every round (`localCheckpoint`) so
  * plan depth and re-planning cost stay O(1) across iterations.
  */
object Components {

  /** Per-vertex component assignment for the undirected graph given by
    * `pairs`. Only vertices that appear in a pair are labeled —
    * singletons are their own trivial cluster and don't need clustering.
    * Throws after `maxIter` rounds without convergence (a pathological
    * chain graph) rather than returning silently wrong labels. */
  def ofPairs(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      maxIter: Int = 30): DataFrame = {
    val edges = pairs.select(
      col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    val sym = edges
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("v")).distinct()
      .withColumn("component", col("v"))
      .localCheckpoint()
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // min label among neighbors: one shuffle to join labels onto edge
      // sources, one partial-agg min per destination
      val nbrMin = sym
        .join(labels.withColumnRenamed("v", "src"), "src")
        .groupBy(col("dst").as("v"))
        .agg(min("component").as("nbr"))
      // the lowered-this-round flag rides INSIDE the checkpointed result,
      // so the convergence probe is a filter on materialized data — no
      // extra join/shuffle per round (labels only ever decrease, so `<`
      // is sufficient)
      val next = labels.join(nbrMin, Seq("v"), "left")
        .select(col("v"),
          least(col("component"), coalesce(col("nbr"), col("component")))
            .as("component"),
          (coalesce(col("nbr"), col("component")) < col("component"))
            .as("__lowered"))
        .localCheckpoint()
      done = next.filter(col("__lowered")).limit(1).isEmpty
      labels = next.drop("__lowered")
      iter += 1
    }
    sym.unpersist()
    if (!done) throw new IllegalStateException(
      s"components did not converge within $maxIter rounds — " +
        "graph diameter exceeds the bound; raise maxIter")
    labels
  }
}
