package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Store retraction — the takedown path for DERIVED data (r13 verdict
  * #1): `CdlFs.deleteWhere` removes a document's rows from the TABLE,
  * but its content-derived artifacts survive in the persisted stores —
  * digest/minhash/simhash rows, ngram postings, span-window keepers,
  * LSH-bucketed vectors, IVF assignments, cluster labels. For
  * right-to-be-forgotten those are retained content-derived data;
  * `retract(storeDir, docIds)` erases them, per store, under the same
  * store lock the batch cycles hold.
  *
  * Scale shape: discovery is ONE column-pruned scan of the store's
  * 8-byte id column (the ngram df-pass class of cost — columnar,
  * embarrassingly parallel, no data columns read); the REWRITE then
  * touches only the partitions that actually held a retired row —
  * O(touched partitions), never O(store). Stores whose partition key IS
  * the id hash (the split layout's `vectors/`, the clusters store's
  * `labels/`) skip even the discovery scan: the candidate `bp` set is
  * computed from the ids and pruning applies end-to-end. `docIds` is a
  * driver-side list by design — takedown batches are thousands of ids,
  * not corpus-sized. Batches past [[IsinThreshold]] switch from `isin`
  * predicates to broadcast hash semi/anti joins automatically (r14
  * verdict #4): per-id cost stays flat and the plan never inflates with
  * the id count, so a 10k-id takedown is one call, not ten chunked ones.
  *
  * Keeper semantics (exact + span stores): DROP THE ROW and let the
  * next arrival re-keep. The stores record only the keeper — not the
  * other occurrences — so "promote the next-min survivor" would need
  * occurrence history they deliberately don't keep; dropping erases the
  * content's memory with its keeper (the RTBF-consistent reading: the
  * first post-retraction copy of that content is novel again).
  * RetractSpec proves both halves: a retracted keeper appears in no
  * store scan, and a later batch re-detects against the surviving
  * state correctly. The ngram store's bloom sidecar is left as a
  * SUPERSET (it may still claim retired grams) — supersets only cost
  * false-positive scans, never correctness (the sidecar's standing
  * contract); `rebuildStore` re-derives it tight.
  *
  * Crash contract — roll-forward, the family discipline: the
  * replacement partitions are fully staged under `_retract_tmp`, then a
  * `_retract_pending` marker (listing each touched partition as
  * `replace:` or `drop:`) commits the retraction; [[sweep]] — run by
  * every locked cycle's store read and by the index/label read-heal
  * paths — finishes the swap after any crash. Before the marker a
  * crash discards the staging dir and the store is untouched.
  */
object Retract {

  private val RetractTmp = "_retract_tmp"
  private val RetractPending = "_retract_pending"
  private val RetractOldPrefix = "_retractold_"

  /** Retract `docIds` from the dedup-family store at `storeDir`
    * (variant from the manifest): removes every row derived from a
    * retired doc — signature/posting/vector rows keyed `doc_id`/
    * `vec_id`, keeper rows keyed `keep_doc_id` (exact/span), label rows
    * and cluster names (components, via
    * [[IncrementalComponents.retractLocked]]). Returns rows removed. */
  def retract(spark: SparkSession, storeDir: String, docIds: Seq[Long]): Long = {
    require(docIds.nonEmpty, "retract: empty id list")
    // IVF indexes dispatch BEFORE the lock (r14 ADVICE): IvfIndex.retract
    // manages its own locked cycle, and the store lock is not reentrant —
    // a mis-targeted `retract` on an ivf manifest must route, not confuse
    if (IncrementalDedup.storeManifest(spark, storeDir)
        .get("variant").contains("ivf"))
      return IvfIndex.retract(spark, storeDir, docIds)
    graft.fs.StoreLock.withLock(storeDir,
      spark.sparkContext.hadoopConfiguration) {
      val manifest = IncrementalDedup.storeManifest(spark, storeDir)
      require(manifest.contains("variant"),
        s"$storeDir has no readable _graft_store.json manifest — not a " +
          "graft store")
      val ids = docIds.distinct
      def del(dir: String, idCol: String,
          prefilter: Option[Column] = None): Long = {
        // finish any crashed compaction swap first: rows stranded in
        // `_compact_trash` are invisible to the discovery scan, and a
        // retired row hiding there would resurface on the next compact
        IncrementalDedup.sweepCompactTrash(spark, dir)
        rewriteTouched(spark, dir, "bp", semiOn(spark, ids, idCol),
          antiOn(spark, ids, idCol), prefilter = prefilter)
      }
      // bucket-partitioned stores with a doc→bp index (r16): the index
      // names the exact candidate bps for the batch — the discovery
      // scan prunes to them (O(touched), no full id-column pass) — and
      // the index's own rows for the retired ids are erased afterwards
      // (it over-claims between the two steps: pruning cost only)
      // the index lives UNDER the bucket-partitioned data dir it maps
      // (the store root for single-table stores, `postings/` for the
      // split/bm25 two-table layouts)
      def delIndexedAt(dataDir: String, idCol: String): Long = {
        val dpParts = manifest.get("doc_index_parts").map(_.toInt)
          .getOrElse(manifest("store_parts").toInt)
        val pre =
          if (IncrementalDedup.docIndexEnabled(manifest))
            // None (index dir gone despite the flag) → full-scan
            // discovery, never a silent no-op takedown
            IncrementalDedup.docIndexBps(spark, dataDir, ids, dpParts)
              .map(bps => col("bp").isin(bps: _*))
          else None // legacy store: full-scan discovery
        val n = del(dataDir, idCol, prefilter = pre)
        IncrementalDedup.retractDocIndex(spark, dataDir, ids, dpParts)
        n
      }
      def delIndexed(idCol: String): Long = delIndexedAt(storeDir, idCol)
      manifest("variant") match {
        case "exact"               => delIndexed("keep_doc_id")
        case "span"                => delIndexed("keep_doc_id")
        case "minhash" | "simhash" => delIndexed("doc_id")
        case "ngram"               => delIndexed("doc_id")
        case "embedding" =>
          if (manifest.get("store_layout").contains("split")) {
            // vectors/ is id-hash partitioned: candidate bps from the
            // ids themselves — pruning end-to-end, no discovery scan;
            // postings/ is bucket-hash partitioned → doc index
            val parts = manifest("store_parts").toInt
            delIndexedAt(s"$storeDir/postings", "vec_id") +
              del(s"$storeDir/vectors", "vec_id",
                prefilter = Some(col("bp").isin(bpsOf(spark, ids, parts): _*)))
          } else delIndexed("vec_id")
        case "components" =>
          IncrementalComponents.retractLocked(spark, storeDir, ids)
        case "bm25" =>
          Bm25Index.retractLocked(spark, storeDir, ids)
        case v => sys.error(s"unknown store variant in manifest: $v")
      }
    }
  }

  /** The candidate partition ids a retired-id set hashes into — a tiny
    * local-relation job (ids are driver-side), the same pmod(xxhash64)
    * the stores bucket with. */
  private[ops] def bpsOf(
      spark: SparkSession, ids: Seq[Long], parts: Int): Seq[Int] = {
    import spark.implicits._
    ids.toDF("id").select(IncrementalDedup.bpOf(parts, col("id")).as("bp"))
      .distinct().collect().map(_.getInt(0)).toIndexedSeq
  }

  /** Takedown batches larger than this switch from `isin` predicates to
    * broadcast hash joins (r14 verdict #4): an N-term isin inflates the
    * predicate tree — plan analysis, codegen, and every pruned scan's
    * filter all walk it — while a broadcast join against the id list
    * costs one tiny exchange regardless of N. Below it, isin wins: the
    * predicate pushes to parquet row-group stats and skips clean files
    * without a join operator in the plan. */
  private[ops] val IsinThreshold = 1000

  private def idsDf(spark: SparkSession, ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.toDF("__rid")
  }

  /** Rows of the frame whose `idCol` IS a retired id — isin below
    * [[IsinThreshold]], broadcast left-semi join above. NULL ids match
    * neither (SQL join semantics = the old !coalesce(pred) reading). */
  private[ops] def semiOn(spark: SparkSession, ids: Seq[Long],
      idCol: String): DataFrame => DataFrame =
    if (ids.size <= IsinThreshold) _.filter(col(idCol).isin(ids: _*))
    else df => df.join(broadcast(idsDf(spark, ids)),
      df(idCol) === col("__rid"), "left_semi")

  /** Rows of the frame whose `idCol` is NOT a retired id (NULLs kept) —
    * the complement of [[semiOn]], broadcast left-anti above the
    * threshold. */
  private[ops] def antiOn(spark: SparkSession, ids: Seq[Long],
      idCol: String): DataFrame => DataFrame =
    if (ids.size <= IsinThreshold)
      _.filter(!coalesce(col(idCol).isin(ids: _*), lit(false)))
    else df => df.join(broadcast(idsDf(spark, ids)),
      df(idCol) === col("__rid"), "left_anti")

  /** Rewrite the partitions of `dataDir` that hold `matcher`-selected
    * rows — and ONLY those — replacing each touched partition's content
    * with `transform` of it. Returns the number of matching rows found.
    * `prefilter` (partition-column-only) narrows the discovery scan for
    * id-hash-partitioned stores. Caller holds the store lock; the swap
    * is the marker roll-forward documented on the object. */
  private[ops] def rewriteTouched(
      spark: SparkSession,
      dataDir: String,
      partCol: String,
      matcher: DataFrame => DataFrame,
      transform: DataFrame => DataFrame,
      sortCols: Seq[String] = Nil,
      prefilter: Option[Column] = None,
      allowPointer: Boolean = true): Long = {
    import org.apache.hadoop.fs.Path
    sweep(spark, dataDir)
    val root = new Path(dataDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // rename-less schemes commit by POINTER FLIP instead of the marker
    // + rename roll-forward (r17 verdict #1, upgrading the r16 loud
    // refusal to real support): staging is identical, but each staged
    // partition moves to a fresh unreferenced versioned path and ONE
    // small-file PUT of the partition->version map commits the whole
    // swap — see graft.fs.PartitionPointer. `allowPointer=false` callers
    // (IVF assignments, components labels) read their stores with
    // direct spark.read.parquet listings that cannot resolve a pointer,
    // so they keep the r16 gate + rename path until their reads are
    // centralized.
    val pointerMode = !graft.fs.AtomicRename.isAtomic(root) && allowPointer
    if (!pointerMode)
      // swap-fence scheme gate (r16 verdict #1): the whole-old/whole-new
      // reader contract below rides atomic directory renames — on a
      // rename-less scheme fail loudly BEFORE any staging, unless the
      // operator quiesced readers and set the override. The sweep above
      // is deliberately ungated: healing an already-committed marker
      // must always finish.
      graft.fs.AtomicRename.requireForSwap(root,
        spark.sparkContext.hadoopConfiguration, "store retraction/rewrite")
    val hasData = (fs.exists(root) && fs.listStatus(root)
      .exists(_.getPath.getName.startsWith(s"$partCol="))) ||
      graft.fs.PartitionPointer.hasLive(fs, root)
    if (!hasData) return 0L
    val df0 = graft.fs.PartitionPointer.readWholeInferred(spark, dataDir)
      .getOrElse(spark.read.parquet(dataDir))
    val scan = prefilter.map(df0.filter).getOrElse(df0)
    // discovery: (id, partition) only — column-pruned, no data columns
    val hits = matcher(scan)
      .groupBy(partCol).agg(count(lit(1)).as("__n")).collect()
    if (hits.isEmpty) return 0L
    val affected = hits.map(_.getLong(1)).sum
    val touchedVals: Seq[Any] = hits.map(_.get(0)).toIndexedSeq
    val touchedNames = touchedVals.map(v => s"$partCol=$v")
    // stage: touched partitions only (partition-pruned read), transformed
    val replaced = transform(df0.filter(col(partCol).isin(touchedVals: _*)))
    val tmp = new Path(root, RetractTmp)
    fs.delete(tmp, true)
    val repart = replaced.repartition(col(partCol))
    (if (sortCols.nonEmpty) repart.sortWithinPartitions(sortCols.map(col): _*)
     else repart)
      .write.partitionBy(partCol).mode("overwrite").parquet(tmp.toString)
    // commit point: a partition whose rows ALL matched stages no tmp dir
    // and is recorded as drop: — the sweep can then distinguish
    // "already placed" from "must delete" after any crash
    val lines = touchedNames.map { n =>
      if (fs.exists(new Path(tmp, n))) s"replace:$n" else s"drop:$n"
    }
    if (pointerMode)
      graft.fs.PartitionPointer.commitSwap(spark, root, partCol, lines,
        tmp, () => bumpEpoch(fs, root))
    else {
      writeMarker(fs, root, lines)
      finish(fs, root, lines)
    }
    affected
  }

  /** Heal a crashed retraction: marker present → finish the swap
    * (roll forward); marker absent → any staging dir is a pre-commit
    * crash, discard it. Run by every locked store read (private[graft]:
    * the soak's pointer-GC cadence probe also times it, under its own
    * lock hold). */
  private[graft] def sweep(spark: SparkSession, dataDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dataDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(root, RetractPending)
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val body =
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      finish(fs, root, body.split("\n").toSeq.map(_.trim).filter(_.nonEmpty))
    } else {
      fs.delete(new Path(root, RetractTmp), true)
      // fenced-out corpses can only outlive their marker if the final
      // marker delete itself crashed mid-metadata-op — hygiene, and the
      // underscore prefix keeps them invisible to readers either way
      if (fs.exists(root))
        fs.listStatus(root)
          .filter(_.getPath.getName.startsWith(RetractOldPrefix))
          .foreach(s => fs.delete(s.getPath, true))
    }
    // pointer-store GC (rename-less schemes): collect grace-expired
    // previous generations, orphan staged versions, dead tombstones —
    // one exists() probe on stores without a pointer
    graft.fs.PartitionPointer.sweepGarbage(spark, dataDir)
  }

  /** Quick marker probe for lock-free read paths (the ensureReadable
    * discipline): heal only when a crashed retraction is actually
    * pending, taking the lock briefly. */
  private[ops] def pending(spark: SparkSession, dataDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dataDir, RetractPending)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private val RetractEpochFile = "_retract_epoch"
  private val RetractArmFile = "_retract_arm"

  /** Arm-busy sentinel for retraction arms whose consistency surface
    * spans MULTIPLE swaps plus sidecar rewrites (r16 ADVICE, medium):
    * bm25's arm is postings swap → docs swap → doc-index maintenance →
    * stats rewrite → final epoch bump. Each inner swap's own marker and
    * bump cover only itself, so a lock-free reader whose whole
    * read-and-validate cycle fell BETWEEN the postings swap's bump and
    * the final bump saw new postings + stale stats with no marker and
    * an unchanged epoch — and accepted. The sentinel is raised before
    * the first swap and cleared only AFTER the final bump; readers
    * treat it exactly like a pending marker (busy → wait), so the
    * docs/stats phase is observable. A crashed arm leaves the sentinel
    * up; the owner's read-heal path (e.g. Bm25Index.ensureReadable)
    * finishes the arm's idempotent tail (sweep + stats recompute +
    * bump) under the store lock and clears it. Content is a debug aid
    * (pid); only existence is read, so no write-atomicity is needed. */
  private[ops] def armRaise(spark: SparkSession, dataDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dataDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val out = fs.create(new Path(root, RetractArmFile), true)
    try out.write(ProcessHandle.current().pid().toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Clear the arm-busy sentinel — call only after the arm's final
    * epoch bump (the bump-before-clear ordering is what lets a reader
    * that saw no sentinel and an unchanged epoch conclude no arm
    * overlapped its read). */
  private[ops] def armClear(spark: SparkSession, dataDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dataDir, RetractArmFile)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
  }

  /** Probe the arm-busy sentinel (lock-free read paths). */
  private[ops] def armBusy(spark: SparkSession, dataDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dataDir, RetractArmFile)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Swap-completion counter for LOCK-FREE readers — the seqlock half
    * the rename-fence alone cannot give (r16, r15 verdict #6): the
    * fence guarantees a racing reader never sees a HALF-DELETED
    * partition, but a listing taken inside the two-rename window still
    * misses the partition entirely, and a reader that probed the
    * pending marker before and after its read can be fooled by a swap
    * that started AND finished in between. [[finish]] bumps this
    * counter exactly once per completed swap, BEFORE deleting the
    * marker; a reader that snapshots (pending, epoch), reads, and
    * re-snapshots therefore observes ANY overlapping swap — as a live
    * marker or as a changed epoch — and retries. Missing file = 0
    * (pre-epoch stores); temp-write + rename keeps the value atomic. */
  private[ops] def epoch(spark: SparkSession, dataDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dataDir, RetractEpochFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var attempt = 0
    while (true) {
      try {
        if (!fs.exists(p)) return 0L
        val in = fs.open(p)
        val body =
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8).trim
          finally in.close()
        body.toLongOption match {
          case Some(v) => return v
          // empty/garbled = a concurrent overwrite-create publish
          // caught mid-write (possible only on posix-backed schemes —
          // real object stores PUT atomically on close): transient,
          // same retry as the vanished-file race below. Persistent
          // garbage after the retries is real corruption — loud.
          case None if attempt < 20 => attempt += 1; Thread.sleep(10L)
          case None => throw new IllegalStateException(
            s"corrupt swap-epoch counter at $p: '$body'")
        }
      } catch {
        // exists→open races bumpEpoch's delete→rename window (µs): a
        // vanished file here IS a concurrent bump — brief retry
        case _: java.io.FileNotFoundException if attempt < 20 =>
          attempt += 1; Thread.sleep(10L)
      }
    }
    0L // unreachable
  }

  /** Re-bump a directory's swap epoch from OUTSIDE a finish() — for
    * retraction arms whose consistency surface extends past the data
    * swap (r16 review: bm25's stats sidecar rewrites AFTER the postings
    * swap already bumped, so a reader could pair new postings with
    * stale totals; the extra bump forces its seqlock retry). Caller
    * holds the store lock. */
  private[ops] def bumpEpochAt(spark: SparkSession, dataDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(dataDir)
    bumpEpoch(root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  /** Write an explicit epoch value — for swaps that REPLACE the whole
    * directory the counter lives in (IvfIndex.rebuild swaps the entire
    * assignments/ dir, destroying `_retract_epoch` with it; a plain
    * bump would then read 0 and write 1 in EVERY generation, making
    * successive rebuilds seqlock-indistinguishable — the ABA a reader
    * spanning exactly one full swap would accept). The caller captures
    * the pre-swap epoch and publishes `old + 1` into the fresh dir.
    * Caller holds the store lock. */
  private[ops] def setEpochAt(
      spark: SparkSession, dataDir: String, value: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.fs.AtomicRename.publishSmallFile(fs,
      new org.apache.hadoop.fs.Path(root, RetractEpochFile),
      value.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      s".tmp-${ProcessHandle.current().pid()}")
  }

  private def bumpEpoch(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(root, RetractEpochFile)
    val cur =
      if (!fs.exists(p)) 0L
      else {
        val in = fs.open(p)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong
        finally in.close()
      }
    // scheme-aware publish (r16 verdict #1): temp+rename on
    // rename-atomic schemes (µs absent window, readers retry); direct
    // overwrite-PUT on object stores — atomic on close, NO absent
    // window (the old delete+copy+delete flow left the counter
    // momentarily missing, which epoch() would misread as 0)
    graft.fs.AtomicRename.publishSmallFile(fs, p,
      (cur + 1).toString.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      s".tmp-${ProcessHandle.current().pid()}")
  }

  /** Roll the staged swap forward; every step re-runs safely after a
    * crash. Partition replacement is RENAME-FENCED (r14 ADVICE): the
    * live dir first renames to an underscore-prefixed `_retractold_*`
    * sibling (invisible to parquet listing — readers atomically stop
    * seeing the OLD rows), then the staged dir renames in, then the old
    * corpse drops. A lock-free concurrent reader (Bm25Index.search)
    * listing inside the swap can transiently miss the partition
    * entirely — the same already-stated crash-healed shape — but can no
    * longer observe a HALF-DELETED directory (the old delete-then-rename
    * flow deleted the live dir file-by-file under readers). Crash
    * matrix: old-present/live-absent → place src, drop old;
    * src-absent → already placed, drop old; drop lines rename-then-
    * delete the same way. */
  private def finish(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      lines: Seq[String]): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = new Path(root, RetractTmp)
    def fenceOut(name: String): Path = {
      // atomically retire the live dir behind an ignored-prefix name;
      // re-runs skip when a prior attempt already moved it
      val old = new Path(root, s"$RetractOldPrefix$name")
      val live = new Path(root, name)
      if (fs.exists(live)) {
        fs.delete(old, true) // a stale corpse from an even earlier crash
        require(fs.rename(live, old), s"retract fence rename failed: $live")
      }
      old
    }
    lines.foreach { l =>
      l.split(":", 2) match {
        case Array("drop", name) => fs.delete(fenceOut(name), true)
        case Array("replace", name) =>
          val src = new Path(tmp, name)
          val old =
            if (fs.exists(src)) {
              val o = fenceOut(name)
              require(fs.rename(src, new Path(root, name)),
                s"retract rename failed: $src")
              o
            } else new Path(root, s"$RetractOldPrefix$name") // already placed
          fs.delete(old, true)
        case other => sys.error(s"corrupt retract marker line: $l")
      }
    }
    // seqlock order: bump BEFORE the marker delete — a reader that saw
    // no marker and an unchanged epoch is guaranteed swap-free. A crash
    // between the two re-runs finish (idempotent renames) and bumps
    // again: spurious reader retries, never a missed swap.
    bumpEpoch(fs, root)
    fs.delete(new Path(root, RetractPending), false)
    fs.delete(tmp, true)
  }

  /** Marker write — temp + rename (the manifest discipline): a crash
    * mid-write must leave either no marker (pre-commit) or a complete
    * one (roll forward), never a truncated line list. */
  private def writeMarker(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      lines: Seq[String]): Unit = {
    import org.apache.hadoop.fs.Path
    fs.listStatus(root)
      .filter(_.getPath.getName.startsWith(s"$RetractPending.tmp-"))
      .foreach(s => fs.delete(s.getPath, false))
    val tmp = new Path(root,
      s"$RetractPending.tmp-${ProcessHandle.current().pid()}")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, new Path(root, RetractPending)),
      s"retract marker rename failed under $root")
  }
}
