"""Python user API for the graft engine — the runnable counterpart of the
reference's `cdlake` package (python/cdlake/filesystem.py, python/src/lib.rs).

Where the reference binds a native engine through PyO3, this binds the
Spark engine through pyspark's py4j gateway: the same session object
drives both the Python DataFrame API and the graft Scala library, so
`sql` results come back as ordinary pyspark DataFrames (lazy) with
`*_as_pandas` variants for the reference's collected-batch contract.

Usage (classpath must include the compiled graft classes):

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.driver.extraClassPath",
                     "<repo>/target/scala-2.13/classes")
             .getOrCreate())
    fs = Cdl(spark, max_chunk_size="1024").open("/tmp/ds1")
    fs.sql_as_pandas("SELECT parent, name, size FROM rootfs ...")
    fs.read_files("name LIKE '%.txt'")
    fs.take([0, 2], ["parent", "name"])
"""
from pyspark.sql import DataFrame


class CdlFs:
    """One dataset session — mirrors cdlake.CdlFS."""

    def __init__(self, spark, jfs):
        self._spark = spark
        self._jfs = jfs
        self._bridge = spark._jvm.graft.PyBridge

    # -- queries (lazy pyspark DataFrames) --------------------------------
    def sql(self, query):
        return DataFrame(self._jfs.sql(query), self._spark)

    def read_dir(self, parent):
        return DataFrame(self._jfs.readDir(parent), self._spark)

    def read_dir_all(self):
        return DataFrame(self._jfs.readDirAll(), self._spark)

    def take(self, indices, columns):
        return DataFrame(self._bridge.take(self._jfs, indices, columns),
                         self._spark)

    def table_at(self, version):
        return DataFrame(self._jfs.tableAt(version), self._spark)

    # -- collected contracts (the reference's one-batch semantics) --------
    def sql_as_pandas(self, query):
        return self.sql(query).toPandas()

    def sql_as_polars(self, query):
        """Collected result as a polars DataFrame — the reference's
        arrow-native contract (python/cdlake/filesystem.py:51-56:
        `pl.from_arrow(self.sql(sql))`). Arrow path first (pyspark's
        `toArrow`, zero pandas detour), pandas round-trip if the arrow
        bridge is unavailable. polars itself is an optional dependency
        exactly as in the reference: absent wheel -> ImportError naming
        it, so callers can fall back to `sql_as_pandas` deliberately."""
        try:
            import polars as pl
        except ImportError as e:
            raise ImportError(
                "sql_as_polars needs the 'polars' wheel (pip install "
                "polars); use sql_as_pandas as the fallback") from e
        df = self.sql(query)
        try:
            return pl.from_arrow(df.toArrow())
        except Exception:
            return pl.from_pandas(df.toPandas())

    def read_files(self, condition):
        """Payload bytes of matching files, reassembled in chunk order
        (python/src/lib.rs:105-129 read_files)."""
        rows = (self.sql(
            f"SELECT parent, name, chunk_id, data FROM rootfs "
            f"WHERE (parent, name) IN (SELECT parent, name FROM rootfs "
            f"  WHERE size IS NOT NULL AND ({condition})) "
            f"ORDER BY parent, name, chunk_id").collect())
        chunks = {}
        for r in rows:
            key = f"{r['parent'].rstrip('/')}/{r['name']}"
            chunks.setdefault(key, []).append(bytes(r["data"] or b""))
        # join once per file — appending to bytes would re-copy the whole
        # accumulated payload per chunk (quadratic on chunk count)
        return {k: b"".join(v) for k, v in chunks.items()}

    # -- control/handoff --------------------------------------------------
    def ingest(self, local_root):
        self._bridge.ingest(self._jfs, local_root)

    def copy_to(self, dst):
        self._bridge.copyTo(self._jfs, dst)

    def compact(self, target_file_bytes=128 * 1024 * 1024, zorder=None):
        """OPTIMIZE-style rewrite into few stats-tight files; returns the
        data-file count after compaction. Invalidates pre-compaction time
        travel (OPTIMIZE+VACUUM(0) semantics — see CdlFs.compact).
        `zorder=[x, y]` clusters the rewrite by the Morton code of two
        numeric columns instead of the row_id stamp (tight per-file
        min/max boxes on both — see CdlFs.compact's zorderBy)."""
        if zorder:
            return self._bridge.compactZOrder(
                self._jfs, target_file_bytes, list(zorder))
        return self._bridge.compact(self._jfs, target_file_bytes)

    def delete_where(self, condition, cascade=False):
        """Copy-on-write DELETE (takedown path): physically removes rows
        matching the SQL condition; only files containing a match are
        rewritten, row_ids of kept rows are stable. Returns the number
        of rows deleted. Not undoable (see CdlFs.deleteWhere).
        cascade=True also retracts the retired row ids from every
        attached derived store (attach_store) — one call, whole takedown
        loop; a failing store leaves a resumable pending marker
        (run_cascade_pending)."""
        if cascade:
            return self._bridge.deleteWhereCascade(self._jfs, condition)
        return self._bridge.deleteWhere(self._jfs, condition)

    def attach_store(self, store_dir, id_col="row_id"):
        """Register a derived dedup/index store for cascaded takedown:
        its rows are keyed by this table's id_col (BIGINT) values."""
        self._bridge.attachStore(self._jfs, store_dir, id_col)

    def detach_store(self, store_dir):
        """Unregister a store (data untouched); True if it was attached."""
        return self._bridge.detachStore(self._jfs, store_dir)

    def attached_stores(self):
        """The registry as [(store_dir, id_col), ...]."""
        return [tuple(s.split("\t")) for s in self._bridge.attachedStores(self._jfs)]

    def cascade_pending_stores(self):
        """Stores still owed a retraction by a pending cascade."""
        return list(self._bridge.cascadePendingStores(self._jfs))

    def run_cascade_pending(self):
        """Resume a pending cascade; returns [(store_dir, rows_removed)]
        for the stores finished by this call."""
        out = []
        for s in self._bridge.runCascadePending(self._jfs):
            d, n = s.split("\t")
            out.append((d, int(n)))
        return out

    def vacuum(self):
        """Drop commit-log versions a compact/delete made unreadable;
        returns the dropped version numbers."""
        return list(self._bridge.vacuumLog(self._jfs))

    def versions(self):
        return list(self._bridge.versions(self._jfs))

    @property
    def table_location(self):
        """External-engine handoff: any parquet reader (duckdb, pyarrow,
        torch data loaders) can consume this directly — the
        to_lance_dataset/to_torch_dataset equivalent."""
        return self._jfs.tableLocation()

    @property
    def storage_options(self):
        return dict(self._bridge.storageOptions(self._jfs))


class Cdl:
    """`Cdl(spark, **catalog)` — kwargs-merge construction; unknown keys
    raise, like the reference's strict DatasetCatalog merge."""

    def __init__(self, spark, **catalog):
        self._spark = spark
        # snake_case kwargs, exactly the reference's Cdl(**catalog) keys
        # (DatasetCatalog.fromMap validates; unknown keys raise)
        self._catalog = {k: str(v) for k, v in catalog.items()}

    def open(self, url):
        jfs = self._spark._jvm.graft.PyBridge.open(
            self._spark._jsparkSession, url, self._catalog)
        return CdlFs(self._spark, jfs)

    def store_fsck(self, store_dir, deep=False):
        """Audit a persisted store's invariants (read-only): returns a
        list of (level, check, detail) tuples, empty when clean. Light
        mode checks metadata/debris; ``deep=True`` adds content scans
        (bucketing, doc-index superset, bloom supersets, bm25 stats and
        referential integrity, keeper uniqueness)."""
        raw = self._spark._jvm.graft.PyBridge.storeFsck(
            self._spark._jsparkSession, store_dir, bool(deep))
        return [tuple(line.split("\t", 2)) for line in raw]

    def store_fsck_repair(self, store_dir, deep=False):
        """Locked repair mode: audit, then APPLY each finding's named
        heal (marker sweeps, stats recompute, bloom re-derivation,
        doc-index rebuild, orphan-posting docs reconstruction, merge-log
        fold). Findings with no safe automatic remedy are refused with
        the reason. Returns (level, check, applied|refused, action)
        tuples; re-run ``store_fsck`` to verify cleanliness."""
        raw = self._spark._jvm.graft.PyBridge.storeFsckRepair(
            self._spark._jsparkSession, store_dir, bool(deep))
        return [tuple(line.split("\t", 3)) for line in raw]

    def model_user_storage_options(self, secrets,
                                   secret_name="object-storage-user-0",
                                   map_access_key="CONSOLE_ACCESS_KEY",
                                   map_secret_key="CONSOLE_SECRET_KEY"):
        """Resolve a ModelUser access-token secret reference (the
        control plane's CRD spec) against ``secrets`` — a dict of
        ``{secret_name: {key: value}}``, the K8s Secret shape — and
        return the storage_options this Cdl's catalog produces with the
        resolved credential pair grafted on (``fs.s3a.access.key`` /
        ``secret.key``). Defaults mirror the CRD's serde defaults
        (CONSOLE_* keys, the minio tenant's user-0 secret). A missing
        secret or key raises with the reference's exact failure string.
        Pass ``secret_name=None`` for a token-less spec (catalog
        credentials stand)."""
        opts = self._spark._jvm.graft.PyBridge.modelUserStorageOptions(
            self._catalog, secrets, secret_name,
            map_access_key, map_secret_key)
        return dict(opts)

    # -- incremental dedup (graft extension; the reference's Python
    # surface has no dedup). Each call is one locked batch cycle against
    # the persisted store at `store_dir` (created on first use); the
    # result is a lazy pyspark DataFrame of verdicts/pairs. ------------
    def dedup_exact(self, df, store_dir):
        return DataFrame(
            self._spark._jvm.graft.PyBridge.dedupExact(df._jdf, store_dir),
            self._spark)

    def dedup_minhash(self, df, store_dir, threshold=0.5):
        return DataFrame(
            self._spark._jvm.graft.PyBridge.dedupMinhash(
                df._jdf, store_dir, float(threshold)),
            self._spark)

    def dedup_simhash(self, df, store_dir, max_hamming=3):
        return DataFrame(
            self._spark._jvm.graft.PyBridge.dedupSimhash(
                df._jdf, store_dir, int(max_hamming)),
            self._spark)

    def dedup_ngram(self, df, store_dir, threshold=0.5):
        return DataFrame(
            self._spark._jvm.graft.PyBridge.dedupNgram(
                df._jdf, store_dir, float(threshold)),
            self._spark)

    def dedup_span(self, df, store_dir, w=10):
        """One locked span-dedup cycle: (doc_id, pos, keep_doc_id,
        keep_pos) of every w-token window of df already seen — in the
        store or earlier in df. Appends df's novel windows. Feed the
        result to cut_spans to rewrite the batch."""
        return DataFrame(
            self._spark._jvm.graft.PyBridge.dedupSpan(
                df._jdf, store_dir, int(w)),
            self._spark)

    def cut_spans(self, docs, spans, w=10):
        """Rebuild half of span dedup alone: cut the given (doc_id,
        pos) w-token spans out of docs (coverage-merge, pass-through,
        and empty-string contracts as span_dedup)."""
        return DataFrame(
            self._spark._jvm.graft.PyBridge.cutSpans(
                docs._jdf, spans._jdf, int(w)),
            self._spark)

    def dedup_embedding(self, df, store_dir, threshold=0.95, layout="adopt"):
        """layout: "inline" (vectors ride every bucket row), "split"
        (posting/forward-index split, ~tables x smaller at rest), or
        "adopt" (follow the store's manifest; creates inline)."""
        return DataFrame(
            self._spark._jvm.graft.PyBridge.dedupEmbeddingLayout(
                df._jdf, store_dir, float(threshold), layout),
            self._spark)

    def compact_dedup_store(self, store_dir):
        """Rewrite fragmented store partitions in place (one file per
        partition); returns the number rewritten."""
        return self._spark._jvm.graft.PyBridge.compactDedupStore(
            self._spark._jsparkSession, store_dir)

    def rebuild_dedup_store(self, src_dir, dst_dir, new_parts=0):
        """Re-bucket a store into dst_dir under new partition geometry
        (new_parts <= 0 auto-sizes from the store's rows); repoint the
        pipeline at dst_dir afterwards. Returns the partition count."""
        return self._spark._jvm.graft.PyBridge.rebuildDedupStore(
            self._spark._jsparkSession, src_dir, dst_dir, int(new_parts))

    def retract(self, store_dir, ids):
        """Takedown for DERIVED data: erase the given doc/vec ids' rows
        from a dedup-family store (variant from the manifest) — pair
        with delete_where on the table itself. Returns rows removed."""
        return self._spark._jvm.graft.PyBridge.retract(
            self._spark._jsparkSession, store_dir,
            [int(i) for i in ids])

    def ivf_retract(self, index_dir, ids):
        """Takedown for the IVF index: remove the ids' assignment rows,
        rewriting only touched cells. Returns rows removed."""
        return self._spark._jvm.graft.PyBridge.ivfRetract(
            self._spark._jsparkSession, index_dir,
            [int(i) for i in ids])

    # -- incremental clustering (graft extension): the persisted
    # union-find the dedup pair batches feed. ---------------------------
    def clusters_add_pairs(self, df, store_dir):
        """Absorb one batch of (doc_a, doc_b) pairs; returns the batch's
        resolved (v, component) view."""
        return DataFrame(
            self._spark._jvm.graft.PyBridge.clustersAddPairs(
                df._jdf, store_dir),
            self._spark)

    def clusters_labels(self, store_dir):
        """Every vertex ever paired, with its current canonical
        component (cluster-min ids)."""
        return DataFrame(
            self._spark._jvm.graft.PyBridge.clustersLabels(
                self._spark._jsparkSession, store_dir),
            self._spark)

    def clusters_keepers(self, store_dir):
        """One canonical member per cluster (v == component)."""
        return DataFrame(
            self._spark._jvm.graft.PyBridge.clustersKeepers(
                self._spark._jsparkSession, store_dir),
            self._spark)

    def clusters_compact(self, store_dir):
        """Fold the merge log into the label table; returns the number
        of relabeled rows."""
        return self._spark._jvm.graft.PyBridge.clustersCompact(
            self._spark._jsparkSession, store_dir)

    # -- persisted IVF ANN index (graft extension): build-once /
    # append-many / search-many over cell-partitioned parquet. ----------
    def ivf_build(self, df, index_dir, nlist=16, kmeans_iters=0):
        self._spark._jvm.graft.PyBridge.ivfBuild(
            df._jdf, index_dir, int(nlist), int(kmeans_iters))

    def ivf_append(self, df, index_dir, rebuild_imbalance=0.0,
                   rebuild_iters=2):
        """Locked append against the frozen centroids. Returns True iff
        the cell-health trigger (max/mean occupancy > rebuild_imbalance)
        fired a recluster; 0.0 keeps the trigger off."""
        return self._spark._jvm.graft.PyBridge.ivfAppend(
            df._jdf, index_dir, float(rebuild_imbalance),
            int(rebuild_iters))

    def ivf_search(self, df, index_dir, k, nprobe=4, rerank=0):
        """rerank=0: exact probe. rerank>=1: IVF-PQ — score the probed
        cells on int8 codes (8x fewer scan bytes), exact-re-rank the top
        k*rerank candidates per query (needs a coded index; rebuild
        upgrades an old one)."""
        return DataFrame(
            self._spark._jvm.graft.PyBridge.ivfSearch(
                self._spark._jsparkSession, index_dir, df._jdf,
                int(k), int(nprobe), int(rerank)),
            self._spark)

    def bm25_search(self, docs, queries, k, k1=1.2, b=0.75):
        """BM25 keyword retrieval: docs (doc_id, text) x queries
        (query_id, query) -> top-k (query_id, doc_id, bm25, rank)."""
        return DataFrame(
            self._spark._jvm.graft.PyBridge.bm25Search(
                docs._jdf, queries._jdf, int(k), float(k1), float(b)),
            self._spark)

    def bm25_index(self, docs, index_dir):
        """Add docs (doc_id, text) to the persisted BM25 inverted index
        (created if absent; novel docs only — replays are no-ops).
        Returns the number of novel docs indexed."""
        return self._spark._jvm.graft.PyBridge.bm25IndexBatch(
            docs._jdf, index_dir)

    def bm25_index_search(self, index_dir, queries, k, k1=1.2, b=0.75):
        """BM25 over the persisted index — a term-partition-pruned read
        (no corpus pass); same output contract as bm25_search."""
        return DataFrame(
            self._spark._jvm.graft.PyBridge.bm25IndexSearch(
                self._spark._jsparkSession, index_dir, queries._jdf,
                int(k), float(k1), float(b)),
            self._spark)

    def hybrid_search_fully_indexed(self, bm25_dir, ivf_dir, queries, k,
                                    n_per=10, nprobe=4, rerank=0):
        """Hybrid retrieval with BOTH arms as pruned index reads — zero
        corpus passes per search batch."""
        return DataFrame(
            self._spark._jvm.graft.PyBridge.hybridSearchFullyIndexed(
                self._spark._jsparkSession, bm25_dir, ivf_dir,
                queries._jdf, int(k), int(n_per), int(nprobe), int(rerank)),
            self._spark)

    def dsir_topk(self, docs, target_cond, k):
        """DSIR importance selection: deterministic top-k of docs
        (doc_id, text) by hashed-bucket log-likelihood ratio against the
        SQL target condition (e.g. "lang = 'en'")."""
        return DataFrame(
            self._spark._jvm.graft.PyBridge.dsirTopK(
                docs._jdf, target_cond, int(k)),
            self._spark)

    def dsir_resample(self, docs, target_cond, k, temperature=1.0,
                      salt="dsir"):
        """Gumbel-top-k importance resample: k docs sampled without
        replacement proportional to softmax(importance/T),
        deterministic given the salt."""
        return DataFrame(
            self._spark._jvm.graft.PyBridge.dsirResample(
                docs._jdf, target_cond, int(k), float(temperature), salt),
            self._spark)

    def budget_take_until(self, docs, budget, order):
        """Token-budget selection: the maximal priority-ordered prefix
        of docs (needs a text column) within `budget` cumulative
        whitespace tokens. `order` is a list of "col" / "col:desc"
        priority keys (must form a total order)."""
        return DataFrame(
            self._spark._jvm.graft.PyBridge.budgetTakeUntil(
                docs._jdf, int(budget), list(order)),
            self._spark)

    def hybrid_search(self, docs, embs, queries, k, n_per=10,
                      index_dir=None, nprobe=4, rerank=0):
        """Hybrid retrieval: reciprocal-rank fusion of BM25 (docs:
        doc_id, text) and cosine ANN; queries carries (query_id, query,
        qvec). Top-k per query. index_dir=None scans embs (vec_id,
        embedding) brute-force; with index_dir set the semantic arm
        probes that persisted IVF(-PQ) index instead (cell-pruned read;
        rerank>=1 scores int8 codes) and embs may be None."""
        if index_dir is None:
            return DataFrame(
                self._spark._jvm.graft.PyBridge.hybridSearch(
                    docs._jdf, embs._jdf, queries._jdf, int(k), int(n_per)),
                self._spark)
        return DataFrame(
            self._spark._jvm.graft.PyBridge.hybridSearchIndexed(
                docs._jdf, index_dir, queries._jdf, int(k), int(n_per),
                int(nprobe), int(rerank)),
            self._spark)

    def sem_dedup(self, embs, n_clusters=16, tau=0.95,
                  band=None, max_probe=None):
        """SemDeDup keep-one semantic dedup of (vec_id, embedding) over
        k-means cells (within-cell exact cosine >= tau). ``band`` and
        ``max_probe`` tune the soft-assignment straddler recovery
        (defaults: the engine's measured 0.03 / top-3); see
        sem_dedup_tune to derive them from a recall target."""
        if band is None and max_probe is None:
            return DataFrame(
                self._spark._jvm.graft.PyBridge.semDedup(
                    embs._jdf, int(n_clusters), float(tau)),
                self._spark)
        b = 0.03 if band is None else float(band)
        m = 3 if max_probe is None else int(max_probe)
        return DataFrame(
            self._spark._jvm.graft.PyBridge.semDedupWith(
                embs._jdf, int(n_clusters), float(tau), b, m),
            self._spark)

    def sem_dedup_tune(self, embs, n_clusters=16, tau=0.95,
                       target_recall=0.95):
        """Recall-targeted soft-assignment tuning: climbs the
        band/max_probe ladder until the banded probe's non-clone recall
        meets target_recall. Returns a dict with band, max_probe, the
        recall actually measured (inspect it — the widest rung returns
        even when the target was not met), and rungs_probed."""
        raw = self._spark._jvm.graft.PyBridge.semDedupTune(
            embs._jdf, int(n_clusters), float(tau), float(target_recall))
        band, max_probe, recall, rungs = raw.split("\t")
        return {"band": float(band), "max_probe": int(max_probe),
                "recall": float(recall), "rungs_probed": int(rungs)}

    def sem_dedup_recall_bands(self, embs, n_clusters=16, tau=0.95):
        """Banded pair-sampled cell-fence recall telemetry: returns
        (bands, near_dup_recall) where bands is a list of
        (lo, hi, is_clone, pairs, co_celled) tuples — log the non-clone
        recall per epoch; a falling reading is cell-straddle drift
        showing up before surviving duplicates do."""
        raw = list(self._spark._jvm.graft.PyBridge.semDedupRecallBands(
            embs._jdf, int(n_clusters), float(tau)))
        bands = []
        near = 1.0
        for line in raw:
            parts = line.split("\t")
            if parts[0] == "near_dup_recall":
                near = float(parts[1])
            else:
                bands.append((float(parts[0]), float(parts[1]),
                              parts[2] == "true", int(parts[3]),
                              int(parts[4])))
        return bands, near

    def span_dedup(self, docs, w=10):
        """ExactSubstr-style span dedup of (doc_id, text): cut every
        non-keeper occurrence of a duplicated w-token window; the global
        first occurrence survives."""
        return DataFrame(
            self._spark._jvm.graft.PyBridge.spanDedup(docs._jdf, int(w)),
            self._spark)

    def duplicated_spans(self, docs, w=10):
        """Detection half of span_dedup: (doc_id, pos) of the spans it
        would cut."""
        return DataFrame(
            self._spark._jvm.graft.PyBridge.duplicatedSpans(docs._jdf, int(w)),
            self._spark)

    def curate(self, docs, benchmark=None, min_quality=0.4,
               budget=None, budget_fraction=None, decontam_n=5,
               near_dup=None):
        """End-to-end curation funnel over (doc_id, text) docs: quality
        filter -> exact dedup -> optional NEAR-dup dedup (near_dup =
        exact 3-gram-jaccard threshold) -> optional decontamination vs
        benchmark (decontam_n-gram overlap) -> optional token budget.
        Returns (curated_docs, funnel) where funnel rows are
        (stage_idx, stage, docs_in, docs_out, tokens_out)."""
        jvm = self._spark._jvm
        pair = jvm.graft.PyBridge.curateNearDup(
            docs._jdf,
            benchmark._jdf if benchmark is not None else None,
            float(min_quality),
            jvm.java.lang.Long(int(budget)) if budget is not None else None,
            jvm.java.lang.Double(float(budget_fraction))
            if budget_fraction is not None else None,
            int(decontam_n),
            jvm.java.lang.Double(float(near_dup))
            if near_dup is not None else None)
        return (DataFrame(pair[0], self._spark),
                DataFrame(pair[1], self._spark))

    def ivf_occupancy(self, index_dir):
        """Per-cell occupancy (cell, n) as a DataFrame — the health feed."""
        return DataFrame(
            self._spark._jvm.graft.PyBridge.ivfOccupancy(
                self._spark._jsparkSession, index_dir),
            self._spark)

    def ivf_imbalance(self, index_dir):
        """max/mean cell occupancy; 1.0 is perfectly balanced."""
        return self._spark._jvm.graft.PyBridge.ivfImbalance(
            self._spark._jsparkSession, index_dir)

    def ivf_rebuild(self, index_dir, kmeans_iters=2):
        """Re-cluster in place (fresh centroids, crash-safe swap)."""
        self._spark._jvm.graft.PyBridge.ivfRebuild(
            self._spark._jsparkSession, index_dir, int(kmeans_iters))
