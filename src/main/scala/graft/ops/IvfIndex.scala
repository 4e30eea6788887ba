package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF (inverted-file) ANN index — the build-once / query-many
  * shape a production vector store runs, as two plain parquet tables:
  *
  *   <indexDir>/centroids    (cell, centroid array<double>)   k×dim, tiny
  *   <indexDir>/assignments  (id, vec, cell=<hive partition>)  the corpus
  *
  * The assignments table is HIVE-PARTITIONED BY CELL, which is the whole
  * point: a probe filters `cell IN (the query's nprobe nearest cells)`,
  * so partition pruning reads nprobe/nlist of the corpus from disk —
  * at 100 TB the search is a pruned scan, not a full pass (the inline
  * `Similarity.ivfTopK` re-assigns cells per call; this index pays that
  * cost once at build). Any parquet reader can consume both tables —
  * same external-handoff contract as the rootfs table.
  */
object IvfIndex {

  /** Build the index at `indexDir` (overwrites): assigns every candidate
    * to its nearest centroid (first-`nlist` seed, or `kmeansIters` Lloyd
    * rounds) and writes the cell-partitioned corpus + centroid table. */
  def build(
      candidates: DataFrame,
      indexDir: String,
      nlist: Int = 16,
      kmeansIters: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val cand = candidates.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // seeding + assignment are the SAME helpers the inline ivfTopK uses —
    // the "persisted index reproduces the inline path" contract
    val cents =
      if (kmeansIters > 0)
        Similarity.kmeansCentroids(candidates, nlist, kmeansIters, idCol, vecCol)
      else Similarity.seedCentroids(cand, nlist)
    cents.coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    val centroids =
      candidates.sparkSession.read.parquet(s"$indexDir/centroids")
    Similarity.assignCells(cand, centroids)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/assignments")
  }

  /** Append a batch to an existing index WITHOUT a rebuild — the
    * maintenance path an hourly-ingest vector store actually runs. New
    * vectors are assigned to the FROZEN build-time centroids (broadcast,
    * map-only) and appended to their cell partitions, one file per
    * touched cell. A drifting corpus therefore degrades recall
    * gradually (cells grow imbalanced) rather than wrongly — rebuild
    * with fresh centroids when imbalance warrants; `compactStore`-style
    * file fragmentation is bounded by one file per cell per append.
    *
    * Idempotent retries by the dedup-store argument: a retried vector
    * assigns to the SAME cell (frozen centroids, deterministic
    * tie-break), so the cell-pruned existing-assignments view is a
    * complete witness for the id anti-join — a re-run appends nothing,
    * at touched-cell cost, never a corpus scan. Writers serialize on
    * the index StoreLock; searches are lock-free parquet reads. */
  def append(
      batch: DataFrame,
      indexDir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit =
    graft.fs.StoreLock.withLock(indexDir,
      batch.sparkSession.sparkContext.hadoopConfiguration) {
      val spark = batch.sparkSession
      val cand = batch.select(col(idCol).as("id"), col(vecCol).as("vec"))
      val centroids = spark.read.parquet(s"$indexDir/centroids")
      val assigned = Similarity.assignCells(cand, centroids)
        // reused by the touched probe, the anti-join, and the write
        .localCheckpoint()
      val touched = assigned.select("cell").distinct()
        .collect().map(_.getLong(0)).toSeq // ≤ nlist values, driver-safe
      val existing = probedAssignments(spark, indexDir, touched)
      assigned
        .join(existing.select(col("id")), Seq("id"), "left_anti")
        .repartition(col("cell"))
        .write.mode("append").partitionBy("cell")
        .parquet(s"$indexDir/assignments")
    }

  /** The assignments scan restricted to `cells` — THE partition-pruned
    * read (search() and the pruning spec share it, so the spec tests the
    * real plan). Cells filter as INT literals: hive partition-type
    * inference types the small numeric `cell=` values as INT, and a
    * BIGINT comparison would wrap the partition attribute in a cast —
    * which defeats partition pruning and silently degrades every probe
    * to a full corpus scan. */
  private[ops] def probedAssignments(
      spark: SparkSession, indexDir: String, cells: Seq[Long]): DataFrame =
    spark.read.parquet(s"$indexDir/assignments")
      .filter(col("cell").isin(cells.map(_.toInt): _*))

  /** Search the index: exact cosine top-k over the `nprobe` nearest
    * cells of each query. The probed cell set reaches the assignments
    * scan as a partition filter (≤ nlist values, collected driver-side —
    * k-sized, not corpus-sized), so only those partitions are read. */
  def search(
      spark: SparkSession,
      indexDir: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val centroids = broadcast(spark.read.parquet(s"$indexDir/centroids"))
    val qcells = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .join(centroids)
      .withColumn("r", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(Similarity.cosine(col("qvec"), col("centroid")).desc,
            col("cell").asc)))
      .filter(col("r") <= nprobe)
      .select(col("query_id"), col("qvec"), col("cell"))
      // reused twice (cell list + the probe join) and tiny — pin briefly
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probedCells = qcells.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    val assignments = probedAssignments(spark, indexDir, probedCells)
    val scored = assignments.join(broadcast(qcells), Seq("cell"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(Similarity.cosine(col("qvec"), col("vec")), 4).as("cosine"))
    // two-stage top-k: no partition ever holds a query's whole probed set
    val out = Similarity.twoStageTopK(scored, k)
      .localCheckpoint() // release the qcells pin without invalidating out
    qcells.unpersist()
    out
  }
}
