package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental connected components over an ARRIVING pair stream — the
  * clustering maintenance a production dedup pipeline runs between full
  * rebuilds: `Components.ofPairs` answers "what are the clusters of
  * THESE pairs", this store answers "what are the clusters of every
  * pair ever seen", one batch at a time, without recomputing the
  * corpus-wide fixpoint per batch (quadratic over the pipeline's
  * lifetime — the same argument as [[IncrementalDedup]], one level up
  * the stack: its pair batches are exactly this operator's input).
  *
  * Layout (the union-find shape, made restartable):
  *  - `labels/` — (v, component) parquet, hive-partitioned by
  *    `bp = pmod(xxhash64(v), parts)`: the lookup an arriving batch
  *    does — "what clusters do MY endpoints already belong to" — is a
  *    partition-pruned scan of the batch's own hash range. One row per
  *    vertex EVER seen in a pair, appended once, never rewritten by
  *    arrivals.
  *  - `merges/` — (old, new) parquet: the union-find parent log. When a
  *    batch's pairs connect existing clusters, nothing in `labels`
  *    moves — the dethroned roots get one merge row each. Cluster
  *    merges touch O(merged clusters) rows, not O(cluster members):
  *    relabeling a billion-member cluster on arrival would be the
  *    quadratic this store exists to avoid.
  *  - reads resolve labels THROUGH the merge log: the log is bounded by
  *    total merge events, collected driver-side and path-compressed (a
  *    few MB per million merges — cf. the IVF centroid pull), then
  *    broadcast into one equi-join. [[compact]] folds the log into
  *    `labels` in place and empties it — run it when the log grows past
  *    taste; the store works identically (only slower reads) if never
  *    compacted.
  *
  * Component ids are the cluster's MINIMUM vertex id (the
  * `Components.ofPairs` convention), so incremental labels are
  * BATCH-ORDER INDEPENDENT: after any sequence of pair batches the
  * resolved view equals `Components.ofPairs` over the union of all
  * pairs (IncrementalComponentsSpec pins the parity; the gate checks a
  * two-batch split against the full-corpus recursive-CTE oracle).
  *
  * Concurrency: every cycle (and the compaction) runs under the store's
  * [[graft.fs.StoreLock]], like the dedup stores. Retried batches are
  * tolerated: label appends are anti-joined per vertex, and a replayed
  * merge row maps a root to the root it already maps to (resolution is
  * idempotent); duplicate log rows are cleared by the next compact. */
object IncrementalComponents {

  private val LabelsDir = "labels"
  private val MergesDir = "merges"

  private def bpOf(parts: Int, v: org.apache.spark.sql.Column) =
    IncrementalDedup.bpOf(parts, v)

  /** Driver-side union-find resolution of the merge log: collect the
    * (old, new) rows — bounded by merge EVENTS, not corpus — and
    * path-compress every chain to its root. Returns the compressed
    * mapping (empty when the log is empty or absent).
    *
    * Lock-free callers (labels()) can race a FOLD's post-commit log
    * delete: the listing sees files the collect job then cannot open
    * (r19 fold-race find). A vanished log file means the fold is
    * COMMITTED, so a RE-READ — shorter or absent log — pairs
    * consistently with the labels listed after this map (see labels()'
    * ordering note); retry instead of failing the read
    * ([[SwapRetry.retryVanished]] — structured vanished-file
    * classification, deadline-bound). LOCKED callers (the batch cycle,
    * the fold, the rebuild) never retry: no fold can race the lock they
    * hold, so a log file vanishing under them is real damage that must
    * surface immediately (r19 ADVICE). */
  private def mergeMap(
      spark: SparkSession, dir: String, locked: Boolean): Map[Long, Long] =
    mergeMapCounted(spark, dir, locked)._1

  /** [[mergeMap]] plus the RAW log row count (duplicates included) from
    * the same collect — the batch cycle's merge-log-cap check reads it
    * instead of re-counting the log with a second job (r21). */
  private def mergeMapCounted(
      spark: SparkSession, dir: String,
      locked: Boolean): (Map[Long, Long], Long) = {
    val p = new org.apache.hadoop.fs.Path(dir, MergesDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def once: (Map[Long, Long], Long) =
      if (!fs.exists(p)) (Map.empty, 0L) else mergeMapOnce(spark, p.toString)
    if (locked) once
    else SwapRetry.retryVanished(s"clusters merge-log read on $dir")(once)
  }

  private def mergeMapOnce(
      spark: SparkSession, mergesPath: String): (Map[Long, Long], Long) = {
    {
      val rows = spark.read.schema("old BIGINT, new BIGINT")
        .parquet(mergesPath)
        .collect()
      val raw = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
      // path compression: follow chains (c3->c2, c2->c1 => c3->c1).
      // Chains are acyclic by construction (new < old always), so every
      // walk terminates. ITERATIVE walk with an explicit path, not
      // recursion: a re-entrant getOrElseUpdate can corrupt a resizing
      // mutable map, and a million-link chain would blow the stack.
      // Each link is walked once total (memo), so the whole pass is
      // O(log size).
      val memo = scala.collection.mutable.HashMap.empty[Long, Long]
      raw.keys.foreach { k =>
        if (!memo.contains(k)) {
          var c = k
          val path = scala.collection.mutable.ArrayBuffer.empty[Long]
          while (!memo.contains(c) && raw.contains(c)) {
            path += c
            c = raw(c)
          }
          val r = memo.getOrElse(c, c)
          path.foreach(memo.update(_, r))
        }
      }
      (raw.keys.map(k => k -> memo(k)).toMap, rows.length.toLong)
    }
  }

  /** Read-path self-heal (the IvfIndex.ensureReadable discipline): a
    * compact crash between the live delete and the rename leaves
    * `labels/` missing with the ready marker set — a read would
    * otherwise silently return an EMPTY frame (every document looks
    * unclustered) until the next locked writer heals it. When — and
    * only when — the marker is present, take the lock briefly and
    * finish the swap; normal reads never touch the lock. */
  private def ensureReadable(spark: SparkSession, storeDir: String): Unit = {
    val ready = new org.apache.hadoop.fs.Path(storeDir, "_compact_ready")
    val fs = ready.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(ready) || Retract.pending(spark, s"$storeDir/$LabelsDir"))
      graft.fs.StoreLock.withLock(storeDir,
        spark.sparkContext.hadoopConfiguration) {
        sweepCompact(spark, storeDir)
        Retract.sweep(spark, s"$storeDir/$LabelsDir")
      }
  }

  /** The resolved label view: every vertex ever seen, with its CURRENT
    * canonical component (labels joined through the compressed merge
    * log). This is the frame a pipeline joins against to shrink a
    * corpus. */
  def labels(spark: SparkSession, storeDir: String): DataFrame = {
    ensureReadable(spark, storeDir)
    val lp = s"$storeDir/$LabelsDir"
    val ready = new org.apache.hadoop.fs.Path(storeDir, "_compact_ready")
    val fs = ready.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // SEQLOCK bracket (r19 ADVICE: labels() was lock-free with only the
    // merge-log read retried — a read racing two successive pointer
    // folds could lose its resolved generation when the second fold's
    // commit dropped the grace-held prev, failing FILE_NOT_EXIST on the
    // labels TABLE). Same discipline as the bm25/IVF searches: attempt,
    // validate the (pending, epoch, fold-marker) signature unmoved,
    // retry swap-shaped failures that signature movement explains. The
    // attempt MATERIALIZES (localCheckpoint) so the returned frame
    // survives any later fold's GC — the price of a consistent
    // lock-free snapshot, proportional to paired vertices, not corpus
    // (and the fold itself rewrites this same table wholesale). The
    // `_compact_ready` marker joins the signature AND the busy probe:
    // the rename-path fold's delete→rename window has no pending
    // marker, so without it a read landing exactly there would fail
    // unexplained.
    SwapRetry.seqlockRead(spark, lp, s"clusters label read on $storeDir",
      () => ensureReadable(spark, storeDir),
      extraSig = () => fs.exists(ready),
      busy = () => fs.exists(ready),
      refreshPath = Some(storeDir)) { () =>
      // merge map BEFORE the label listing — the lock-free order that
      // makes every interleaving with a concurrent pointer-mode fold
      // correct: the fold commits folded labels (one PUT), THEN deletes
      // the log. A partially-deleted log can therefore only be observed
      // with the POST-fold labels (already canonical: the stale rows'
      // dethroned roots no longer appear as components, so applying any
      // subset of them is a no-op), while a full log pairs correctly
      // with either generation. Listing labels first would permit
      // old-labels + partial-log — under-resolved components.
      val mm = mergeMap(spark, storeDir, locked = false)
      val (base, has) = IncrementalDedup.readStoreRaw(spark, lp,
        "v BIGINT, component BIGINT, bp INT")
      if (!has)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "v BIGINT, component BIGINT"))
      else resolve(base.drop("bp"), mm).localCheckpoint()
    }
  }

  /** Join `frame`'s `component` column through the compressed merge
    * map — one broadcast equi-join, or the frame unchanged when the
    * log is empty. */
  private def resolve(frame: DataFrame, mm: Map[Long, Long]): DataFrame =
    if (mm.isEmpty) frame
    else {
      val spark = frame.sparkSession
      import spark.implicits._
      val m = broadcast(mm.toSeq.toDF("__old", "__root"))
      frame.join(m, frame("component") === m("__old"), "left")
        .withColumn("component",
          coalesce(col("__root"), col("component")))
        .drop("__old", "__root")
    }

  /** Rebuild the label store under new partition geometry into a fresh
    * dir — the components arm of `IncrementalDedup.rebuildStore`,
    * called under the SOURCE store's lock. Rebuild resolves THROUGH
    * the merge log (the same fold `compact` applies), so the new store
    * starts with canonical labels and an EMPTY log: geometry migration
    * is also a full compaction. Manifest commits last, like the dedup
    * variants. */
  private[ops] def rebuildLocked(
      spark: SparkSession, srcDir: String, dstDir: String,
      requestedParts: Int): Int = {
    sweepCompact(spark, srcDir) // finish any crashed compact swap first
    Retract.sweep(spark, s"$srcDir/$LabelsDir")
    val readL = IncrementalDedup.readStoreRaw(spark, s"$srcDir/$LabelsDir",
      "v BIGINT, component BIGINT, bp INT")
    val resolved =
      if (!readL._2) None
      else Some(resolve(readL._1.drop("bp"),
        mergeMap(spark, srcDir, locked = true)).localCheckpoint())
    val parts =
      if (requestedParts > 0) requestedParts
      else IncrementalDedup.storePartsFor(
        resolved.map(_.count()).getOrElse(0L))
    resolved.foreach { r =>
      r.withColumn("bp", bpOf(parts, col("v")))
        .repartition(col("bp"))
        .write.partitionBy("bp").mode("errorifexists")
        .parquet(s"$dstDir/$LabelsDir")
    }
    val dstFs = new org.apache.hadoop.fs.Path(dstDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    IncrementalDedup.writeManifest(dstFs, dstDir, Map(
      "variant" -> "components", "store_parts" -> parts.toString))
    parts
  }

  /** Absorb one batch of undirected pairs into the store (created on
    * first use) and return the resolved (v, component) view of THIS
    * batch's vertices. Store partition count fixes at creation via
    * [[IncrementalDedup.storePartsFor]] over the batch's vertex count
    * (manifest-recorded, explicit wins — the dedup-store discipline). */
  def addPairs(
      pairs: DataFrame,
      storeDir: String,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      storeParts: Int = IncrementalDedup.AutoStoreParts,
      mergeLogCap: Long = DefaultMergeLogCap): DataFrame =
    graft.fs.StoreLock.withLock(storeDir,
      pairs.sparkSession.sparkContext.hadoopConfiguration) {
      addPairsLocked(pairs, storeDir, aCol, bCol, storeParts, mergeLogCap)
    }

  /** Merge-log row cap before a cycle auto-compacts (r12 verdict #3):
    * [[mergeMap]] collects the log driver-side, so an uncompacted
    * lifetime of merge events was the one unbounded driver structure
    * left in the engine. Folding at ~1M rows bounds the collect at
    * ~16 MB while keeping compactions rare (a merge event retires a
    * CLUSTER — corpora don't produce millions of cluster merges per
    * batch). 0 disables the auto-fold (a caller running its own
    * compaction cadence). */
  val DefaultMergeLogCap: Long = 1L << 20

  private def addPairsLocked(
      pairs: DataFrame,
      storeDir: String,
      aCol: String,
      bCol: String,
      requestedParts: Int,
      mergeLogCap: Long = DefaultMergeLogCap): DataFrame = {
    val spark = pairs.sparkSession
    // heal a crashed compaction or retraction swap BEFORE reading anything
    sweepCompact(spark, storeDir)
    Retract.sweep(spark, s"$storeDir/$LabelsDir")
    val edges = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .localCheckpoint()
    val vertsRaw = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .distinct()
    // explicit beats manifest beats batch-sized auto (the dedup-store
    // precedence; a mismatched explicit fails loudly in the meta check);
    // the streaming sentinel adopts the manifest, creates at the default
    val knownParts: Option[Int] = requestedParts match {
      case IncrementalDedup.AutoStoreParts =>
        IncrementalDedup.manifestParts(spark, storeDir)
      case IncrementalDedup.AdoptOrDefaultStoreParts =>
        Some(IncrementalDedup.manifestParts(spark, storeDir)
          .getOrElse(IncrementalDedup.DefaultStoreParts))
      case r => Some(r)
    }
    // geometry-known cycles ride the touched-partition probe on the
    // verts checkpoint's own materialization (the resolveGeometry
    // observe pattern, r21) — the dedicated distinct+collect probe job
    // below is creation-only, where the store it would prune is empty
    val (verts, touchedV, storeParts) = knownParts match {
      case Some(p) =>
        val obs = org.apache.spark.sql.Observation()
        val v = vertsRaw
          .withColumn("__bp", IncrementalDedup.bpOf(p, col("v")))
          .observe(obs, collect_set(col("__bp")).as("touched"))
          .localCheckpoint()
        val t = obs.get("touched") match {
          case s: scala.collection.Seq[_] =>
            s.map(_.asInstanceOf[Number].intValue).toIndexedSeq
          case a: Array[_] => a.toIndexedSeq.map(_.asInstanceOf[Number].intValue)
          case other => sys.error(s"unexpected touched metric shape: $other")
        }
        (v.drop("__bp"), t, p)
      case None =>
        val v = vertsRaw.localCheckpoint()
        (v, Seq.empty[Int], IncrementalDedup.storePartsFor(v.count()))
    }
    // the SHARED manifest discipline (actionable corrupt-manifest error,
    // tmp-orphan sweep, temp-write + rename) — one implementation
    IncrementalDedup.checkOrWriteMeta(spark, storeDir, Map(
      "variant" -> "components", "store_parts" -> storeParts.toString))

    val lp = s"$storeDir/$LabelsDir"
    val (mm, mmRows) = mergeMapCounted(spark, storeDir, locked = true)
    // existing assignments of the batch's endpoints: partition-pruned to
    // the batch's own hash range, resolved through the merge log —
    // pointer-aware read (rename-less schemes commit folds/retractions
    // by pointer flip; a blind listing would miss versioned partitions)
    val readL = IncrementalDedup.readStoreRaw(spark, lp,
      "v BIGINT, component BIGINT, bp INT")
    val existing =
      if (!readL._2)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "v BIGINT, component BIGINT"))
      else {
        // touched set rode the verts checkpoint (observe); creation-only
        // cycles never reach here (an absent manifest means no data)
        val touched =
          if (touchedV.nonEmpty) touchedV
          else verts
            .select(bpOf(storeParts, col("v")).as("bp")).distinct()
            .collect().map(_.getInt(0)).toIndexedSeq
        resolve(
          IncrementalDedup.prune(readL._1, touched).drop("bp")
            .join(verts, Seq("v"), "left_semi"),
          mm)
      }
    val existingCk = existing.localCheckpoint()
    // local graph: the batch's pairs plus one (v — current root) edge
    // per already-labeled endpoint. Component ids live in the vertex id
    // namespace (cluster-min convention), so a root participates as a
    // virtual vertex and min-label propagation over this SMALL graph
    // yields the correct NEW canonical for every touched cluster.
    val graph = edges.select(col("a").as("doc_a"), col("b").as("doc_b"))
      .unionAll(existingCk
        .filter(col("v") =!= col("component"))
        .select(col("v").as("doc_a"), col("component").as("doc_b")))
    val comp = Components.ofPairs(graph).localCheckpoint()

    // 1. fresh vertices get their first label row
    val fresh = comp.join(verts, Seq("v"), "left_semi")
      .join(existingCk.select("v"), Seq("v"), "left_anti")
      .withColumn("bp", bpOf(storeParts, col("v")))
    // pointer-aware append (appendStore routes through
    // PartitionPointer.appendPartitioned on pointer stores)
    IncrementalDedup.appendStore(fresh, lp,
      IncrementalDedup.appendWidth(touchedV, storeParts))
    // 2. dethroned roots get a merge row: roots whose NEW component is
    //    smaller than themselves. O(touched clusters) rows.
    val dethroned = comp
      .join(existingCk.select(col("component").as("v")).distinct(), Seq("v"),
        "left_semi")
      .filter(col("component") < col("v"))
      .select(col("v").as("old"), col("component").as("new"))
    // the batch's merge-row count rides the append's own materialization
    // (observe) — the cap check below needs it and must not re-count
    val dethObs = org.apache.spark.sql.Observation()
    dethroned.observe(dethObs, count(lit(1)).as("n"))
      .write.mode("append").parquet(s"$storeDir/$MergesDir")
    val dethRows = dethObs.get("n").asInstanceOf[Long]

    // merge-log residence bound: once the log (pre-existing rows — the
    // RAW count off this cycle's own mergeMap collect — plus this
    // batch's appended merge rows) passes the cap, fold it into labels
    // NOW, under the lock we already hold; after the fold the log is
    // empty, so the next cycle's driver-side collect is bounded by
    // cap + one batch's merges. (r21: the counts ride actions this
    // cycle already runs — the dedicated parquet re-count job is gone.)
    if (mergeLogCap > 0 && mmRows + dethRows > mergeLogCap) {
      val folded = compactLocked(spark, storeDir)
      if (sys.env.contains("GRAFT_COMPONENTS_LOG"))
        System.err.println(
          s"[components] merge-log cap $mergeLogCap hit: folded, " +
            s"$folded labels rewritten")
    }

    // the batch view: resolved labels for this batch's vertices.
    // comp already holds the final canonical for every batch vertex —
    // return it directly (checkpointed above, so later store writes
    // cannot invalidate it).
    comp.join(verts, Seq("v"), "left_semi")
  }

  /** Streaming form: absorb a PAIR STREAM into the label store, one
    * locked cycle per micro-batch — the natural downstream of
    * `IncrementalDedup.minhashStream`'s pair output. Batch views land
    * under `resultsDir/batch=<epoch>`, overwritten per epoch (the
    * exactly-once contract of the dedup streams); the STORE itself is
    * idempotent under replay, so the pipeline end-to-end tolerates
    * at-least-once delivery. */
  def pairStream(
      pairsStream: DataFrame,
      storeDir: String,
      resultsDir: String,
      checkpointDir: String,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      storeParts: Int = IncrementalDedup.AdoptOrDefaultStoreParts): org.apache.spark.sql.streaming.StreamingQuery =
    pairsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        addPairs(batch.toDF(), storeDir, aCol, bCol, storeParts)
          .write.mode("overwrite").parquet(s"$resultsDir/batch=$id")
        ()
      }
      .start()

  /** Retraction arm of [[Retract.retract]] (runs under the already-held
    * store lock): erase the retired vertices' label rows AND their
    * identity as cluster NAMES. The merge log is folded first
    * ([[compactLocked]] — after it every raw label is canonical and the
    * log is empty, so retired ids can only appear as `v` or as a
    * cluster's `component` name), then ONE compound rewrite commits
    * both effects under a single `_retract_pending` marker (r14 verdict
    * #3 — the old two-sequential-commits shape left a crash window
    * between them where labels named a retired doc_id until a manual
    * re-run): the touched set is every partition holding a retiree's
    * own row OR any member row of a cluster a retiree NAMES (all such
    * members carry the retired name in their `component` column, so the
    * discovery scan sees the full cluster), and the staged replacement
    * drops the retirees' rows then re-canonicalizes retired-named
    * clusters to their min SURVIVING member — computed AFTER the drop,
    * from the touched rows themselves, so the mapping is complete.
    *
    * Graph semantics, stated: edges a retired doc contributed stay
    * merged — the cluster was derived from OTHER documents' content
    * too, and splitting it would re-run the pair history this store
    * exists to avoid. What retraction erases is every occurrence of the
    * retired ID (as a vertex and as a name); RetractSpec pins both.
    * Returns label rows removed (renames are updates, not removals). */
  private[ops] def retractLocked(
      spark: SparkSession, storeDir: String, ids: Seq[Long]): Long = {
    sweepCompact(spark, storeDir)
    compactLocked(spark, storeDir)
    val lp = s"$storeDir/$LabelsDir"
    val parts = IncrementalDedup.manifestParts(spark, storeDir).getOrElse(
      sys.error(s"$storeDir has no store_parts in its manifest"))
    // removed = own rows only (renames are updates): one column-pruned
    // count, bp-prefiltered — the compound matcher below can't report
    // it (its hit count includes renamed members)
    Retract.sweep(spark, lp)
    val (labels0, hasData) = IncrementalDedup.readStoreRaw(
      spark, lp, "v BIGINT, component BIGINT, bp INT")
    if (!hasData) return 0L
    val bps = Retract.bpsOf(spark, ids, parts)
    val removed = Retract.semiOn(spark, ids, "v")(
      labels0.filter(col("bp").isin(bps: _*))).count()
    val ownOf = Retract.semiOn(spark, ids, "v")
    val namedOf = Retract.semiOn(spark, ids, "component")
    // allowPointer (r18 verdict #1): labels(), the fold, and the batch
    // cycle all read this table through the pointer-aware readStoreRaw,
    // so rename-less schemes commit this swap by pointer flip with NO
    // override (and the fold itself commits by pointer too — see
    // compactLocked)
    Retract.rewriteTouched(spark, lp, "bp",
      df => ownOf(df).unionByName(namedOf(df)),
      df => {
        val kept = Retract.antiOn(spark, ids, "v")(df)
        // min surviving member per retired-named cluster; retired-named
        // clusters are ≤ the takedown batch, so the mapping broadcasts
        val canon = namedOf(kept)
          .groupBy("component").agg(min(col("v")).as("__new"))
        kept.join(broadcast(canon), Seq("component"), "left")
          .withColumn("component", coalesce(col("__new"), col("component")))
          .drop("__new")
      })
    removed
  }

  /** One row per CLUSTER: the canonical member (v == component) of
    * every multi-member cluster plus, implicitly, every never-paired
    * document a caller keeps by anti-joining the label view — the
    * store-backed form of `Dedup.keepRepresentatives`'s decision.
    * Shrinking a corpus is then `docs ⨝ keepers ∪ docs ⟂ labels`. */
  def keepers(spark: SparkSession, storeDir: String): DataFrame =
    labels(spark, storeDir).filter(col("v") === col("component"))

  /** Fold the merge log into the label table and clear it. Relabeling
    * never moves a row between partitions (bp keys on v, not
    * component), so this rewrites the labels table in place via the
    * tmp + ready-marker roll-forward (the IvfIndex rebuild protocol):
    * a crash either discards the half-built tmp or finishes the swap on
    * the next locked cycle. Returns the number of rows whose label
    * changed. */
  def compact(spark: SparkSession, storeDir: String): Long =
    graft.fs.StoreLock.withLock(storeDir,
      spark.sparkContext.hadoopConfiguration) {
      sweepCompact(spark, storeDir)
      Retract.sweep(spark, s"$storeDir/$LabelsDir")
      compactLocked(spark, storeDir)
    }

  /** The compaction fold body, for callers that already hold the store
    * lock (the public [[compact]], and [[addPairsLocked]]'s merge-log
    * cap). */
  private[ops] def compactLocked(spark: SparkSession, storeDir: String): Long = {
      val mm = mergeMap(spark, storeDir, locked = true)
      if (mm.isEmpty) 0L
      else {
        import org.apache.hadoop.fs.Path
        val root = new Path(storeDir)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val lp = s"$storeDir/$LabelsDir"
        val lpRoot = new Path(lp)
        // POINTER COMMIT on rename-less schemes (r18 verdict #1,
        // upgrading the r18-review gate to real support): relabeling
        // never moves a row between partitions, so the fold is a
        // replace-every-partition swap — stage it, move each staged bp
        // to a fresh unreferenced pv= path, and commit with ONE pointer
        // PUT (no marker: a crash before the PUT rolls BACK to the
        // unfolded state + intact log; after it, the fold is committed
        // and the merge-log delete below is GC — replaying a stale log
        // over folded labels is a no-op, since the dethroned roots no
        // longer appear as any row's component).
        val pointerMode = !graft.fs.AtomicRename.isAtomic(root) ||
          graft.fs.PartitionPointer.active(fs, lpRoot)
        if (!pointerMode)
          // swap-fence scheme gate for the rename path (r18 review):
          // sweepCompact (the heal of a committed _compact_ready) stays
          // ungated
          graft.fs.AtomicRename.requireForSwap(root,
            spark.sparkContext.hadoopConfiguration,
            "clusters-store compaction fold")
        val (base0, hasData) = IncrementalDedup.readStoreRaw(spark, lp,
          "v BIGINT, component BIGINT, bp INT")
        if (!hasData) return 0L
        val obs = org.apache.spark.sql.Observation()
        val resolved = resolve(
          base0.withColumn("__prev", col("component")), mm)
          .observe(obs, count(when(col("component") =!= col("__prev"),
            lit(1))).as("changed"))
          .drop("__prev")
        if (pointerMode) {
          val tmp = new Path(lpRoot, "_fold_tmp")
          fs.delete(tmp, true)
          resolved.repartition(col("bp"))
            .write.partitionBy("bp").parquet(tmp.toString)
          val changed = obs.get("changed").asInstanceOf[Long]
          val staged = fs.listStatus(tmp).toIndexedSeq
            .map(_.getPath.getName).filter(_.startsWith("bp="))
          // every live partition restages (the fold preserves rows);
          // drop is defensive completeness for a live partition that
          // somehow staged nothing
          val liveNow: Set[String] = {
            val legacy = fs.listStatus(lpRoot).map(_.getPath.getName)
              .filter(_.startsWith("bp=")).toSet
            graft.fs.PartitionPointer.readPtr(fs, lpRoot) match {
              case Some(p) =>
                p.entries.collect { case (n, e) if e.live >= 0 => n }.toSet ++
                  (legacy -- p.entries.keySet)
              case None => legacy
            }
          }
          val lines = staged.map(n => s"replace:$n") ++
            (liveNow -- staged).toSeq.sorted.map(n => s"drop:$n")
          graft.fs.PartitionPointer.commitSwap(spark, lpRoot, "bp", lines,
            tmp, () => Retract.bumpEpochAt(spark, lp))
          fs.delete(new Path(root, MergesDir), true)
          changed
        } else {
          val tmp = new Path(root, "_compact_tmp")
          fs.delete(tmp, true)
          resolved.repartition(col("bp"))
            .write.partitionBy("bp").parquet(tmp.toString)
          val changed = obs.get("changed").asInstanceOf[Long]
          fs.create(new Path(root, "_compact_ready"), true).close()
          finishSwap(spark, fs, root)
          changed
        }
      }
    }

  /** Roll the compaction swap forward: place tmp as labels, drop the
    * folded merge log, bump the labels swap epoch, clear the marker.
    * Every locked cycle calls [[sweepCompact]] first, so a crash
    * mid-swap heals on the next cycle. The epoch bump (r20, with the
    * labels() seqlock bracket) makes the rename-path fold observable
    * to lock-free readers exactly like the pointer-path fold (whose
    * commitSwap bumps via its callback): bump BEFORE the marker
    * delete — the arm ordering — so a reader that saw no marker and
    * an unchanged epoch can conclude no fold overlapped its read. */
  private def finishSwap(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = new Path(root, "_compact_tmp")
    val live = new Path(root, LabelsDir)
    if (fs.exists(tmp)) {
      fs.delete(live, true)
      require(fs.rename(tmp, live), s"rename failed: $tmp -> $live")
    }
    fs.delete(new Path(root, MergesDir), true)
    Retract.bumpEpochAt(spark, live.toString)
    fs.delete(new Path(root, "_compact_ready"), false)
  }

  private def sweepCompact(spark: SparkSession, storeDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(root, "_compact_ready"))) finishSwap(spark, fs, root)
    else fs.delete(new Path(root, "_compact_tmp"), true)
    // pointer-mode fold staging from a pre-commit crash (roll-back:
    // the pointer never named it); orphan pv dirs are swept by the
    // Retract.sweep -> PartitionPointer.sweepGarbage every cycle runs
    fs.delete(new Path(root, s"$LabelsDir/_fold_tmp"), true)
  }
}
