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
    val cents =
      if (kmeansIters > 0)
        Similarity.kmeansCentroids(candidates, nlist, kmeansIters, idCol, vecCol)
      else
        cand.orderBy("id").limit(nlist)
          .select(col("id").as("cell"), col("vec").cast("array<double>").as("centroid"))
    cents.coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    val centroids = broadcast(
      candidates.sparkSession.read.parquet(s"$indexDir/centroids"))
    cand.join(centroids)
      .groupBy("id")
      .agg(max(struct(Similarity.cosine(col("vec"), col("centroid")).as("c"),
        col("cell").as("cell"))).as("best"),
        first(col("vec")).as("vec"))
      .select(col("id"), col("vec"), col("best.cell").as("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/assignments")
  }

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
    val assignments = spark.read.parquet(s"$indexDir/assignments")
      .filter(col("cell").isin(probedCells: _*))
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
