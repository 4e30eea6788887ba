package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.GlobalPath
import graft.fs.CdlFs

/** py4j-friendly entry points for the Python surface (scripts/cdlake.py)
  * — the runnable counterpart of the reference's Python bindings
  * (python/src/lib.rs:24-165, python/cdlake/filesystem.py:44-74).
  *
  * Most `CdlFs` methods (`sql`, `readDir`, `readDirAll`,
  * `readFilesByCondition`, `tableLocation`) are plain JVM methods and are
  * called directly over the gateway; this object only adapts the entry
  * points whose Scala signatures (default-arg catalogs, `Seq`
  * collections) py4j cannot express. Python lists/dicts arrive as
  * `java.util.List`/`java.util.Map` via pyspark's auto-converting
  * gateway; numeric elements arrive as boxed `Number`s of
  * magnitude-dependent width, hence the `Number` element type. */
object PyBridge {

  /** `Cdl(**catalog).open(url)` — kwargs arrive as a Python dict. */
  def open(spark: SparkSession, url: String,
      options: java.util.Map[String, String]): CdlFs =
    Cdl(Option(options).map(_.asScala.toMap).getOrElse(Map.empty))
      .open(spark, url)

  /** Lance-style `take(indices, columns)`. */
  def take(fs: CdlFs, indices: java.util.List[java.lang.Number],
      columns: java.util.List[String]): DataFrame =
    fs.take(indices.asScala.map(_.longValue()).toSeq, columns.asScala.toSeq)

  def versions(fs: CdlFs): java.util.List[Integer] =
    fs.versions.map(Int.box).asJava

  def storageOptions(fs: CdlFs): java.util.Map[String, String] =
    fs.storageOptions.asJava

  def ingest(fs: CdlFs, localRoot: String): Unit =
    graft.fs.Ingest.run(fs, localRoot)

  def copyTo(fs: CdlFs, dst: String): Unit =
    GlobalPath.parse(dst) match {
      case Right(p)  => fs.copyTo(p)
      case Left(err) => throw new IllegalArgumentException(err)
    }

  /** OPTIMIZE-style compaction (CdlFs.compact — default-arg adapter). */
  def compact(fs: CdlFs, targetFileBytes: java.lang.Number): Int =
    fs.compact(targetFileBytes.longValue())

  /** Copy-on-write DELETE (CdlFs.deleteWhere): physically removes rows
    * matching the SQL condition, rewriting only touched files. */
  def deleteWhere(fs: CdlFs, condition: String): Long =
    fs.deleteWhere(condition)

  /** Cascaded DELETE: also retracts the retired row ids from every
    * attached derived store (CdlFs.deleteWhere(cond, cascade)). */
  def deleteWhereCascade(fs: CdlFs, condition: String): Long =
    fs.deleteWhere(condition, cascade = true)

  /** Register a derived store for cascaded takedown (CdlFs.attachStore). */
  def attachStore(fs: CdlFs, storeDir: String, idCol: String): Unit =
    fs.attachStore(storeDir, idCol)

  def detachStore(fs: CdlFs, storeDir: String): Boolean =
    fs.detachStore(storeDir)

  /** The registry as ["dir\tid_col", ...] (py4j-friendly flat list). */
  def attachedStores(fs: CdlFs): java.util.List[String] = {
    import scala.jdk.CollectionConverters._
    fs.attachedStores.map { case (d, c) => s"$d\t$c" }.asJava
  }

  /** Stores still owed by a pending cascade (empty when clean). */
  def cascadePendingStores(fs: CdlFs): java.util.List[String] = {
    import scala.jdk.CollectionConverters._
    fs.cascadePendingStores.asJava
  }

  /** Resume a pending cascade; returns ["dir\trows_removed", ...] for
    * the stores finished by this call. */
  def runCascadePending(fs: CdlFs): java.util.List[String] = {
    import scala.jdk.CollectionConverters._
    fs.runCascadePending().map { case (d, n) => s"$d\t$n" }.asJava
  }

  /** Drop commit-log versions a compact/delete made unreadable; returns
    * the dropped version numbers. */
  def vacuumLog(fs: CdlFs): java.util.List[Integer] = {
    import scala.jdk.CollectionConverters._
    fs.vacuumLog().map(Integer.valueOf).asJava
  }

  /** Z-order variant: `zorderBy` is a java.util.List of exactly two
    * column names (py4j marshals Python lists to that). */
  def compactZOrder(
      fs: CdlFs,
      targetFileBytes: java.lang.Number,
      zorderBy: java.util.List[String]): Int = {
    import scala.jdk.CollectionConverters._
    fs.compact(targetFileBytes.longValue(), zorderBy.asScala.toSeq)
  }

  // -- incremental dedup (training-pipeline extension, SURVEY §2.10 —
  // the reference's Python surface has no dedup; these make the store
  // family reachable from the same session that built the batch) -------

  /** One locked exact-dedup cycle of `df` against the store. The
    * pyspark DataFrame's underlying Dataset[Row] arrives over the
    * gateway unchanged. */
  def dedupExact(df: DataFrame, storeDir: String): DataFrame =
    graft.ops.IncrementalDedup.exactBatch(df, storeDir)

  def dedupMinhash(df: DataFrame, storeDir: String,
      threshold: Double): DataFrame =
    graft.ops.IncrementalDedup.minhashBatch(df, storeDir,
      threshold = threshold)

  def dedupSimhash(df: DataFrame, storeDir: String,
      maxHamming: Int): DataFrame =
    graft.ops.IncrementalDedup.simhashBatch(df, storeDir,
      maxHamming = maxHamming)

  def dedupNgram(df: DataFrame, storeDir: String,
      threshold: Double): DataFrame =
    graft.ops.IncrementalDedup.ngramBatch(df, storeDir,
      threshold = threshold)

  def dedupEmbedding(df: DataFrame, storeDir: String,
      threshold: Double): DataFrame =
    graft.ops.IncrementalDedup.embeddingBatch(df, storeDir,
      threshold = threshold)

  /** One locked span-dedup cycle: duplicated w-token spans of `df`
    * against the persisted window store (first-arrival keepers). */
  def dedupSpan(df: DataFrame, storeDir: String, w: java.lang.Number): DataFrame =
    graft.ops.IncrementalSpanDedup.spanBatch(df, storeDir, w.intValue)

  /** Rebuild half of span dedup alone: cut the given (doc_id, pos)
    * spans out of `docs` — the incremental flow's rewrite step. */
  def cutSpans(docs: DataFrame, spans: DataFrame,
      w: java.lang.Number): DataFrame =
    graft.ops.SpanDedup.cutSpans(docs, spans, w.intValue)

  /** `layout`: "inline" | "split" | "adopt" (follow the manifest). */
  def dedupEmbeddingLayout(df: DataFrame, storeDir: String,
      threshold: Double, layout: String): DataFrame =
    graft.ops.IncrementalDedup.embeddingBatch(df, storeDir,
      threshold = threshold, layout = layout)

  def compactDedupStore(spark: SparkSession, storeDir: String): Int =
    graft.ops.IncrementalDedup.compactStore(spark, storeDir)

  /** Takedown for DERIVED data: erase the ids' rows from a dedup-family
    * store (exact/minhash/simhash/ngram/embedding/span/components,
    * dispatched on the manifest). Returns rows removed. */
  def retract(spark: SparkSession, storeDir: String,
      ids: java.util.List[java.lang.Number]): Long =
    graft.ops.Retract.retract(spark, storeDir,
      ids.asScala.map(_.longValue()).toSeq)

  /** Takedown for the IVF index: remove the ids' assignment rows,
    * rewriting only touched cells. */
  def ivfRetract(spark: SparkSession, indexDir: String,
      ids: java.util.List[java.lang.Number]): Long =
    graft.ops.IvfIndex.retract(spark, indexDir,
      ids.asScala.map(_.longValue()).toSeq)

  /** newParts <= 0 auto-sizes from the store's rows. */
  def rebuildDedupStore(spark: SparkSession, srcDir: String,
      dstDir: String, newParts: Int): Int =
    graft.ops.IncrementalDedup.rebuildStore(spark, srcDir, dstDir,
      if (newParts <= 0) graft.ops.IncrementalDedup.AutoStoreParts
      else newParts)

  // -- incremental clustering (training-pipeline extension, SURVEY
  // §2.10): the persisted union-find the dedup pair batches feed -------

  /** One locked cycle absorbing a pair batch; returns the batch's
    * resolved (v, component) view. */
  def clustersAddPairs(pairs: DataFrame, storeDir: String): DataFrame =
    graft.ops.IncrementalComponents.addPairs(pairs, storeDir)

  def clustersLabels(spark: SparkSession, storeDir: String): DataFrame =
    graft.ops.IncrementalComponents.labels(spark, storeDir)

  def clustersKeepers(spark: SparkSession, storeDir: String): DataFrame =
    graft.ops.IncrementalComponents.keepers(spark, storeDir)

  def clustersCompact(spark: SparkSession, storeDir: String): Long =
    graft.ops.IncrementalComponents.compact(spark, storeDir)

  // -- persisted IVF ANN index (training-pipeline extension, SURVEY
  // §2.10): build-once / append-many / search-many from pyspark --------

  def ivfBuild(df: DataFrame, indexDir: String, nlist: java.lang.Number,
      kmeansIters: java.lang.Number): Unit =
    graft.ops.IvfIndex.build(df, indexDir, nlist.intValue,
      kmeansIters.intValue)

  /** Locked append; returns true iff the cell-health trigger fired a
    * recluster (rebuildImbalance <= 0 keeps the trigger off). */
  def ivfAppend(df: DataFrame, indexDir: String,
      rebuildImbalance: Double, rebuildIters: java.lang.Number): Boolean =
    graft.ops.IvfIndex.append(df, indexDir,
      rebuildImbalance = rebuildImbalance,
      rebuildIters = rebuildIters.intValue)

  /** rerank 0 = exact probe; rerank >= 1 scores the probed cells on
    * int8 codes (8× fewer scan bytes) and exact-re-ranks the top
    * k·rerank candidates per query (requires a coded index). */
  def ivfSearch(spark: SparkSession, indexDir: String, queries: DataFrame,
      k: java.lang.Number, nprobe: java.lang.Number,
      rerank: java.lang.Number): DataFrame =
    graft.ops.IvfIndex.search(spark, indexDir, queries, k.intValue,
      nprobe.intValue, rerank = rerank.intValue)

  // -- BM25 lexical retrieval (training-pipeline extension, SURVEY
  // §2.10): keyword search / lexical decontamination from pyspark -----

  def bm25Search(docs: DataFrame, queries: DataFrame,
      k: java.lang.Number, k1: Double, b: Double): DataFrame =
    graft.ops.Bm25.search(docs, queries, k.intValue, k1, b)

  /** One locked index cycle against the persisted BM25 inverted index
    * (created if absent); returns the number of novel docs added. */
  def bm25IndexBatch(docs: DataFrame, indexDir: String): Long =
    graft.ops.Bm25Index.indexBatch(docs, indexDir)

  /** Term-partition-pruned BM25 search over the persisted index —
    * identical output contract to bm25Search. */
  def bm25IndexSearch(spark: SparkSession, indexDir: String,
      queries: DataFrame, k: java.lang.Number, k1: Double,
      b: Double): DataFrame =
    graft.ops.Bm25Index.search(spark, indexDir, queries, k.intValue, k1, b)

  /** Fully-indexed hybrid: BOTH arms pruned index reads. */
  def hybridSearchFullyIndexed(spark: SparkSession, bm25Dir: String,
      ivfDir: String, queries: DataFrame, k: java.lang.Number,
      nPer: java.lang.Number, nprobe: java.lang.Number,
      rerank: java.lang.Number): DataFrame =
    graft.ops.HybridSearch.searchFullyIndexed(spark, bm25Dir, ivfDir,
      queries, k.intValue, nPer.intValue, nprobe.intValue, rerank.intValue)

  // -- DSIR importance selection + SemDeDup (training-pipeline
  // extensions, SURVEY §2.10) ----------------------------------------

  /** Deterministic top-k by hashed-bucket LLR importance against the
    * SQL `targetCond` subset. */
  def dsirTopK(docs: DataFrame, targetCond: String,
      k: java.lang.Number): DataFrame =
    graft.ops.ImportanceSampling.selectTopK(
      docs, org.apache.spark.sql.functions.expr(targetCond), k.intValue)

  /** Seeded Gumbel-top-k importance resample (∝ softmax(score/T)). */
  def dsirResample(docs: DataFrame, targetCond: String,
      k: java.lang.Number, temperature: Double, salt: String): DataFrame =
    graft.ops.ImportanceSampling.resampleGumbel(
      docs, org.apache.spark.sql.functions.expr(targetCond), k.intValue,
      temperature, salt)

  /** Token-budget selection: priority columns as "col" or "col:desc"
    * strings (py4j-marshalled list). The curate() discipline: release
    * the range-partitioned pinned intermediate BEFORE returning —
    * py4j callers hold results across arbitrary Python time, so the
    * fire-and-forget form would accumulate cached blocks per call
    * until context shutdown. */
  def budgetTakeUntil(docs: DataFrame, budget: java.lang.Number,
      ord: java.util.List[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val sel = graft.ops.BudgetSample.takeUntilWithRelease(docs,
      budget.longValue, graft.ops.BudgetSample.parseOrd(ord.asScala.toSeq))
    val out = sel.df.localCheckpoint()
    sel.release()
    out
  }

  /** Hybrid retrieval: RRF fusion of BM25 and exact cosine; `queries`
    * carries (query_id, query, qvec). */
  def hybridSearch(docs: DataFrame, embs: DataFrame, queries: DataFrame,
      k: java.lang.Number, nPer: java.lang.Number): DataFrame =
    graft.ops.HybridSearch.search(docs, embs, queries, k.intValue, nPer.intValue)

  /** Hybrid retrieval with the semantic arm probing the persisted
    * IVF(-PQ) index at `indexDir` — the cell-pruned scale path. */
  def hybridSearchIndexed(docs: DataFrame, indexDir: String,
      queries: DataFrame, k: java.lang.Number, nPer: java.lang.Number,
      nprobe: java.lang.Number, rerank: java.lang.Number): DataFrame =
    graft.ops.HybridSearch.searchIndexed(docs, indexDir, queries,
      k.intValue, nPer.intValue, nprobe.intValue, rerank.intValue)

  /** Store consistency audit (r17): findings as "level\tcheck\tdetail"
    * lines, empty list = clean. `deep` adds the content-level scans. */
  def storeFsck(spark: SparkSession, dir: String,
      deep: Boolean): java.util.List[String] = {
    import scala.jdk.CollectionConverters._
    graft.ops.StoreFsck.fsck(spark, dir, deep)
      .map(f => s"${f.level}\t${f.check}\t${f.detail}").asJava
  }

  /** Locked repair mode for the Python surface (r17 verdict #2):
    * apply each finding's named heal, returning
    * (level, check, applied|refused, action) rows — re-audit with
    * [[storeFsck]] to verify. */
  def storeFsckRepair(spark: SparkSession, dir: String,
      deep: Boolean): java.util.List[String] = {
    import scala.jdk.CollectionConverters._
    graft.ops.StoreFsck.repair(spark, dir, deep)
      .map(a => s"${a.finding.level}\t${a.finding.check}\t" +
        s"${if (a.applied) "applied" else "refused"}\t${a.action}").asJava
  }

  /** ModelUser secret-ref resolution for the Python surface (r16
    * verdict #9; pond/ModelUser.scala — the CRD spec's consumption
    * path): resolve the ref against a caller-supplied secret map
    * (name → {key → value}), graft the credential pair onto a catalog
    * built from `kwargs`, and return the resulting storage options —
    * the same `fs.s3a.*` map the JVM side feeds the Hadoop conf.
    * Failures throw with the reference's exact strings ("no such
    * secret: …", "no such secret key: …/…"). A null `secretName` is the
    * token-less spec: the catalog's own credentials stand. */
  def modelUserStorageOptions(
      kwargs: java.util.Map[String, String],
      secrets: java.util.Map[String, java.util.Map[String, String]],
      secretName: String, mapAccessKey: String,
      mapSecretKey: String): java.util.Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val catalog = graft.core.DatasetCatalog.fromMap(kwargs.asScala.toMap)
      .fold(e => sys.error(e), identity)
    val spec =
      if (secretName == null) graft.pond.ModelUser.Spec(None)
      else graft.pond.ModelUser.Spec(Some(
        graft.pond.ModelUser.AccessTokenSecretRef(
          graft.pond.ModelUser.SecretRef(mapAccessKey, mapSecretKey,
            secretName))))
    val store: String => Option[Map[String, Array[Byte]]] = n =>
      Option(secrets.get(n)).map(_.asScala.toMap.map { case (k, v) =>
        k -> v.getBytes(java.nio.charset.StandardCharsets.UTF_8) })
    graft.pond.ModelUser.catalogWith(catalog, spec, store)
      .fold(e => sys.error(e), c => c.storageOptions.asJava)
  }

  /** SemDeDup keep-one semantic dedup over k-means cells. */
  def semDedup(embs: DataFrame, nClusters: java.lang.Number,
      tau: Double): DataFrame =
    graft.ops.SemDedup.dedup(embs, nClusters.intValue, tau)

  /** [[semDedup]] with the straddler-recovery knobs exposed (r16
    * verdict #4): `band` = soft-assignment cosine margin, `maxProbe` =
    * probe-set cap. */
  def semDedupWith(embs: DataFrame, nClusters: java.lang.Number,
      tau: Double, band: Double, maxProbe: java.lang.Number): DataFrame =
    graft.ops.SemDedup.dedup(embs, nClusters.intValue, tau,
      band = band, maxProbe = maxProbe.intValue)

  /** Recall-targeted soft-assignment tuning (r16 verdict #3): climbs
    * the band/maxProbe ladder until the banded probe's non-clone
    * recall meets `targetRecall`. Returns
    * "band\tmax_probe\trecall\trungs_probed". */
  def semDedupTune(embs: DataFrame, nClusters: java.lang.Number,
      tau: Double, targetRecall: Double): String = {
    val t = graft.ops.SemDedup.tuneSoft(embs, nClusters.intValue, tau,
      targetRecall = targetRecall)
    s"${t.band}\t${t.maxProbe}\t${t.recall}\t${t.rungsProbed}"
  }

  /** Banded pair-sampled cell-fence recall (r15): rows as
    * "lo\thi\tis_clone\tpairs\tco_celled" plus a final
    * "near_dup_recall\t<v>" line — the telemetry a pipeline logs per
    * epoch so cell-straddle drift is measured, not trusted. */
  def semDedupRecallBands(embs: DataFrame, nClusters: java.lang.Number,
      tau: Double): java.util.List[String] = {
    import scala.jdk.CollectionConverters._
    val assigned = graft.ops.SemDedup.assignSoft(embs, nClusters.intValue)
      .localCheckpoint() // soft probe set — the fence pairs() really uses
    val bands = graft.ops.SemDedup.recallBands(assigned, tau)
    (bands.map(b =>
      s"${b.lo}\t${b.hi}\t${b.isClone}\t${b.pairs}\t${b.coCelled}") :+
      s"near_dup_recall\t${graft.ops.SemDedup.nearDupRecall(bands)}").asJava
  }

  /** Span (ExactSubstr-style) dedup: duplicated w-token spans cut,
    * keepers kept. */
  def spanDedup(docs: DataFrame, w: java.lang.Number): DataFrame =
    graft.ops.SpanDedup.removeSpans(docs, w.intValue)

  /** Detection half of spanDedup: the (doc_id, pos) spans it would cut. */
  def duplicatedSpans(docs: DataFrame, w: java.lang.Number): DataFrame =
    graft.ops.SpanDedup.duplicatedSpans(docs, w.intValue)

  /** End-to-end curation funnel. Returns [curated docs, funnel]; both
    * are localCheckpointed so the pinned intermediates release before
    * the bridge returns (the curated corpus materializes once —
    * py4j callers hold results across arbitrary Python time). Nullable
    * knobs: benchmark (skip decontamination), budget/budgetFraction
    * (skip the token-budget stage; absolute wins). */
  def curate(docs: DataFrame, benchmark: DataFrame,
      minQuality: Double, budget: java.lang.Long,
      budgetFraction: java.lang.Double,
      decontamN: java.lang.Number): Array[DataFrame] =
    curateNearDup(docs, benchmark, minQuality, budget, budgetFraction,
      decontamN, null)

  /** curate() with the optional near-dup stage (nearDup = exact
    * n-gram-jaccard threshold, null = off). */
  def curateNearDup(docs: DataFrame, benchmark: DataFrame,
      minQuality: Double, budget: java.lang.Long,
      budgetFraction: java.lang.Double,
      decontamN: java.lang.Number,
      nearDup: java.lang.Double): Array[DataFrame] = {
    val res = graft.ops.Curation.run(docs, graft.ops.Curation.Config(
      minQuality = minQuality,
      benchmark = Option(benchmark),
      decontamN = decontamN.intValue,
      budget = Option(budget).map(_.longValue),
      budgetFraction = Option(budgetFraction).map(_.doubleValue),
      nearDup = Option(nearDup).map(_.doubleValue)))
    val out = Array(res.docs.localCheckpoint(), res.funnel.localCheckpoint())
    res.release()
    out
  }

  /** Per-cell occupancy (cell, n) — the health feed. */
  def ivfOccupancy(spark: SparkSession, indexDir: String): DataFrame =
    graft.ops.IvfIndex.cellOccupancy(spark, indexDir)

  /** max/mean cell occupancy (1.0 = balanced). */
  def ivfImbalance(spark: SparkSession, indexDir: String): Double =
    graft.ops.IvfIndex.imbalance(spark, indexDir)

  def ivfRebuild(spark: SparkSession, indexDir: String,
      kmeansIters: java.lang.Number): Unit =
    graft.ops.IvfIndex.rebuild(spark, indexDir, kmeansIters.intValue)
}
