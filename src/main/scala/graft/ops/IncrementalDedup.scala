package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental deduplication across corpus appends — the shape a 100 TB
  * pipeline actually runs: signatures for the existing corpus are
  * computed ONCE and persisted next to the dataset; each new batch only
  * computes its own signatures and joins them against the store, so an
  * append's dedup cost is O(|batch| + touched buckets), never O(corpus).
  * Re-running full-corpus dedup per append is quadratic over the
  * pipeline's lifetime and is the difference between minutes and days at
  * scale.
  *
  * Two variants:
  *  - exact (content digest): the store is (digest, keep_doc_id); a new
  *    batch's duplicates are one broadcast-or-shuffle equi-join away.
  *  - MinHash-LSH (near-dup): the store is the signature table the
  *    batch path already persists; new signatures band and bucket-join
  *    against the banded store. Incremental pairs over a batch sequence
  *    equal the full-batch pairs (IncrementalDedupSpec proves parity).
  *
  * The reference (SmartX-Team/connected-data-lake) has no curation ops —
  * this extends the engine for training pipelines (SURVEY §2.8/§2.10).
  */
object IncrementalDedup {

  /** Exact-dedup one batch against the digest store at `storeDir`
    * (created if absent), returning (doc_id, digest, dup_of) for the
    * batch — `dup_of` is the keeper doc_id when the content was already
    * seen (in the store OR earlier in this batch, min doc_id wins), null
    * when the doc is novel. Appends the batch's novel digests to the
    * store.
    *
    * Null-text docs have no content to dedup and are EXCLUDED from the
    * verdicts (md5(null) digests to null, which equality joins cannot
    * carry) — filter them out, explicitly, rather than losing them to
    * join semantics silently.
    *
    * Multi-writer safety: the whole read-store → compute → append cycle
    * holds the store lock (`graft.fs.StoreLock`) — two pipelines
    * appending concurrently would otherwise both observe the same base
    * store and double-commit a shared digest under different keepers. A
    * concurrent writer fails loudly with the holder's identity instead
    * of corrupting the store. */
  def exactBatch(
      docsNew: DataFrame,
      storeDir: String,
      textCol: String = "text"): DataFrame =
    graft.fs.StoreLock.withLock(storeDir,
      docsNew.sparkSession.sparkContext.hadoopConfiguration) {
      exactBatchLocked(docsNew, storeDir, textCol)
    }

  private def exactBatchLocked(
      docsNew: DataFrame,
      storeDir: String,
      textCol: String): DataFrame = {
    val spark = docsNew.sparkSession
    val digested = docsNew
      .filter(col(textCol).isNotNull)
      .select(col("doc_id"), md5(col(textCol)).as("digest"))
    val store = readStore(spark, storeDir,
      "digest STRING, keep_doc_id BIGINT")
    // batch-internal keeper: min doc_id per digest within the batch
    val batchKeep = digested.groupBy("digest")
      .agg(min("doc_id").as("batch_keep"))
    val out = digested
      .join(store.withColumnRenamed("keep_doc_id", "store_keep"),
        Seq("digest"), "left")
      .join(batchKeep, Seq("digest"))
      // `store_keep =!= doc_id`: on a RETRIED batch the store already
      // holds this batch's keepers — a keeper must stay novel, not be
      // reported as a duplicate of itself (idempotent re-runs)
      .withColumn("dup_of",
        when(col("store_keep").isNotNull && col("store_keep") =!= col("doc_id"),
          col("store_keep"))
          .when(col("store_keep").isNull && col("batch_keep") < col("doc_id"),
            col("batch_keep"))
          .otherwise(lit(null).cast("long")))
      .select("doc_id", "digest", "dup_of")
      // materialize BEFORE the store append below: the plan reads the
      // store directory, and a lazy frame re-evaluated after the append
      // would see the batch's own digests and mark every doc a dup
      .localCheckpoint()
    // persist the batch's NOVEL digests (one keeper per new digest);
    // anti-join the store so a RETRIED batch — whose keepers stay novel
    // in the verdicts but whose digests are already stored — appends
    // nothing (idempotent re-runs)
    out.filter(col("dup_of").isNull)
      .join(store.select("digest"), Seq("digest"), "left_anti")
      .select(col("digest"), col("doc_id").as("keep_doc_id"))
      .write.mode("append").parquet(storeDir)
    out
  }

  /** MinHash near-dup pairs of one batch against the signature store at
    * `storeDir` (created if absent): returns (doc_a, doc_b, est_jaccard)
    * for every pair with at least one side in the batch (store-internal
    * pairs were reported when THEIR batches arrived), then appends the
    * batch's signatures to the store. Over a sequence of batches the
    * union of results equals the full-corpus `Dedup.minhashLshPairs`.
    *
    * Holds the store lock for the read → compute → append cycle like
    * `exactBatch` — a concurrent writer fails loudly, never corrupts. */
  def minhashBatch(
      docsNew: DataFrame,
      storeDir: String,
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame =
    graft.fs.StoreLock.withLock(storeDir,
      docsNew.sparkSession.sparkContext.hadoopConfiguration) {
      minhashBatchLocked(docsNew, storeDir, textCol, numHashes, bands, threshold)
    }

  private def minhashBatchLocked(
      docsNew: DataFrame,
      storeDir: String,
      textCol: String,
      numHashes: Int,
      bands: Int,
      threshold: Double): DataFrame = {
    val spark = docsNew.sparkSession
    val rowsPerBand = numHashes / bands
    val newSigs = Dedup.minhashSignatures(docsNew, textCol, numHashes = numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val store = readStore(spark, storeDir, "doc_id BIGINT, sig ARRAY<BIGINT>")
    // the ONE banding implementation (Dedup.bandSignatures): the store is
    // only usable if every batch bands identically
    def banded(sigs: DataFrame): DataFrame =
      Dedup.bandSignatures(sigs, bands, rowsPerBand)
    // candidates: every bucket pair touching the batch. doc_a < doc_b
    // normalizes orientation and drops self-pairs; dropDuplicates
    // collapses pairs sharing several buckets.
    val all = banded(store.unionByName(newSigs))
    val cand = all.as("a").join(banded(newSigs).as("b"), Seq("band", "bh"))
      .filter(col("a.doc_id") =!= col("b.doc_id"))
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
        when(col("a.doc_id") < col("b.doc_id"), col("a.sig"))
          .otherwise(col("b.sig")).as("sig_a"),
        when(col("a.doc_id") < col("b.doc_id"), col("b.sig"))
          .otherwise(col("a.sig")).as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    val out = cand
      .withColumn("est_jaccard",
        Dedup.estJaccard(col("sig_a"), col("sig_b"), numHashes))
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard")
      // materialize BEFORE the store append below rewrites the directory
      // the `store` side of the join reads
      .localCheckpoint()
    // idempotent append: a retried batch (downstream failure, re-run)
    // must not duplicate its signatures — a doubled store would inflate
    // every future batch's bucket join and break the batch-sequence =
    // full-corpus parity contract
    newSigs.join(store.select("doc_id"), Seq("doc_id"), "left_anti")
      .write.mode("append").parquet(storeDir)
    newSigs.unpersist()
    out
  }

  /** Embedding near-dup pairs of one batch against the vector store at
    * `storeDir` (created if absent) — the cosine-domain member of the
    * incremental family: returns (id_a, id_b, cosine) for every pair
    * with true cosine ≥ `threshold` and at least one side in the batch
    * (store-internal pairs were reported when THEIR batches arrived),
    * then appends the batch's vectors to the store. Over a batch
    * sequence the union of results equals the full-corpus
    * `Dedup.embeddingNearDupPairs` (the blocking planes are
    * deterministic, so batch order cannot change which pairs block).
    *
    * Scale shape mirrors the batch operator: multi-table hyperplane LSH
    * blocks candidates map-only (`tables` bucket rows per vector), only
    * buckets TOUCHING the batch join, the exact cosine is computed
    * map-side while both vectors are in hand from the bucket join, and
    * the pair-dedupe exchange moves (id, id, cosine) rows — vectors
    * never ride it. Store cost per append is O(|batch|).
    *
    * Holds the store lock for the read → compute → append cycle like
    * the other variants — a concurrent writer fails loudly, never
    * corrupts. Vectors are stored as ARRAY<DOUBLE> (float batches are
    * upcast exactly), so every future batch scores against identical
    * values regardless of the source column's width. */
  def embeddingBatch(
      embsNew: DataFrame,
      storeDir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.95,
      planes: Int = 8,
      tables: Int = 16): DataFrame =
    graft.fs.StoreLock.withLock(storeDir,
      embsNew.sparkSession.sparkContext.hadoopConfiguration) {
      embeddingBatchLocked(embsNew, storeDir, idCol, vecCol, threshold,
        planes, tables)
    }

  private def embeddingBatchLocked(
      embsNew: DataFrame,
      storeDir: String,
      idCol: String,
      vecCol: String,
      threshold: Double,
      planes: Int,
      tables: Int): DataFrame = {
    val spark = embsNew.sparkSession
    val newVecs = embsNew.select(col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("vec"))
      .localCheckpoint() // feeds blocking, scoring, and the store append
    val store = readStore(spark, storeDir, "vec_id BIGINT, vec ARRAY<DOUBLE>")
    // map-only bucket explode, shared with the batch path's geometry:
    // same planes ⇒ the store blocks identically for every batch
    def bucketed(v: DataFrame): DataFrame = v.select(
      col("vec_id"), col("vec"),
      explode(array((0 until tables).map { t =>
        struct(lit(t).as("tbl"),
          Similarity.lshSignature(col("vec"), planes, t * planes).as("bucket"))
      }: _*)).as("tb"))
      .select(col("vec_id"), col("vec"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val out = bucketed(store.unionByName(newVecs)).as("a")
      .join(bucketed(newVecs).as("b"), Seq("tbl", "bucket"))
      .filter(col("a.vec_id") =!= col("b.vec_id"))
      // score BEFORE the pair dedupe (cosine is symmetric, orientation
      // free): the dedupe exchange then moves 32-byte rows, not vectors
      .select(
        least(col("a.vec_id"), col("b.vec_id")).as("id_a"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("id_b"),
        round(Similarity.cosine(col("a.vec"), col("b.vec")), 4).as("cosine"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("cosine") >= threshold)
      // materialize BEFORE the store append rewrites the directory the
      // `store` side of the join reads
      .localCheckpoint()
    // idempotent append: a retried batch must not double its vectors —
    // a doubled store would emit every cross pair twice-blocked and
    // break batch-sequence = full-corpus parity
    newVecs.join(store.select("vec_id"), Seq("vec_id"), "left_anti")
      .write.mode("append").parquet(storeDir)
    out
  }

  /** Streaming form of `exactBatch`: dedup a document STREAM against
    * the persisted store. Each micro-batch runs the locked
    * read → compute → append cycle via `foreachBatch`, so the stream
    * inherits the batch operator's exactness, idempotent replay (a
    * re-run epoch appends nothing to the STORE — it keeps novel digests
    * only — and a replayed batch computes identical verdicts against
    * it), and multi-writer discipline. Verdict rows land under
    * `resultsDir/batch=<epoch>`, OVERWRITTEN per epoch — foreachBatch is
    * at-least-once, and the per-epoch overwrite is what upgrades the
    * results sink to exactly-once across replays (a blind append would
    * duplicate the replayed epoch's rows). This is the live-feed twin of
    * the backfill path — ONE operator definition serves both, the
    * property StreamingCurationSpec pins for the stateless curation
    * expressions and this method extends to stateful-store dedup. */
  def exactStream(
      docsStream: DataFrame,
      storeDir: String,
      resultsDir: String,
      checkpointDir: String,
      textCol: String = "text"): org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        exactBatch(batch.toDF(), storeDir, textCol)
          .write.mode("overwrite").parquet(s"$resultsDir/batch=$id")
        ()
      }
      .start()

  /** Streaming twin of `minhashBatch` — near-dup pairs of a document
    * stream against the persisted signature store, one locked cycle per
    * micro-batch; pair rows land under `resultsDir/batch=<epoch>` with
    * the same per-epoch-overwrite exactly-once contract as
    * `exactStream`. */
  def minhashStream(
      docsStream: DataFrame,
      storeDir: String,
      resultsDir: String,
      checkpointDir: String,
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        minhashBatch(batch.toDF(), storeDir, textCol, numHashes, bands, threshold)
          .write.mode("overwrite").parquet(s"$resultsDir/batch=$id")
        ()
      }
      .start()

  /** Read a store dir that may not exist yet (first batch): an empty
    * frame with the right schema keeps the joins well-typed. */
  private def readStore(
      spark: SparkSession, dir: String, ddl: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
      spark.read.schema(schema).parquet(dir)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
