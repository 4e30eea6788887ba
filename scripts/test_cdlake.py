"""pytest for the Python user API (scripts/cdlake.py) — the py4j bridge
contracts the demos drive by hand: `sql_as_pandas`, `read_files` chunk
reassembly, `take`, versions/time travel, compact, and the
external-engine handoff via `table_location` (read back with DuckDB).

Run from the repo root after `sbt compile`:

    pytest -q scripts/test_cdlake.py
"""
import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(__file__))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLASSES = f"{REPO}/target/scala-2.13/classes"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CLASSES),
    reason=f"compiled classes not found at {CLASSES} — run `sbt compile`")


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[4]")
         .config("spark.driver.extraClassPath", CLASSES)
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    s.sparkContext.setLogLevel("WARN")
    yield s
    s.stop()


@pytest.fixture(scope="module")
def ds(spark):
    """A dataset ingested from a two-file tree: one text file, one
    3-chunk binary (2560 bytes at max_chunk_size=1024)."""
    from cdlake import Cdl
    work = tempfile.mkdtemp(prefix="cdlake_pytest_")
    tree = f"{work}/tree"
    os.makedirs(f"{tree}/sub")
    with open(f"{tree}/hello.txt", "w") as f:
        f.write("hello from pytest")
    with open(f"{tree}/sub/data.bin", "wb") as f:
        f.write(bytes(range(256)) * 10)
    fs = Cdl(spark, max_chunk_size="1024").open(f"{work}/ds")
    fs.ingest(tree)
    return fs, tree, work


def test_unknown_catalog_key_raises(spark):
    from cdlake import Cdl
    with pytest.raises(Exception) as e:
        Cdl(spark, not_a_real_key="1").open(tempfile.mkdtemp() + "/ds")
    assert "not_a_real_key" in str(e.value)


def test_sql_as_pandas(ds):
    fs, _, _ = ds
    pdf = fs.sql_as_pandas(
        "SELECT parent, name, size FROM rootfs WHERE size IS NOT NULL "
        "ORDER BY parent, name")
    assert list(pdf.columns) == ["parent", "name", "size"]
    assert list(pdf["name"]) == ["hello.txt", "data.bin"]
    assert list(pdf["size"]) == [17, 2560]


def test_read_files_reassembles_chunks(ds):
    fs, _, _ = ds
    got = fs.read_files("name = 'data.bin'")
    assert got == {"/sub/data.bin": bytes(range(256)) * 10}
    # the 2560-byte payload really was chunked: 3 rows, sizes 1024/1024/512
    pdf = fs.sql_as_pandas(
        "SELECT chunk_id, len(data) AS n FROM rootfs "
        "WHERE name = 'data.bin' ORDER BY chunk_id")
    assert list(pdf["n"]) == [1024, 1024, 512]


def test_take(ds):
    fs, _, _ = ds
    pdf = fs.take([0, 1], ["parent", "name"]).toPandas()
    assert len(pdf) == 2
    assert set(pdf["name"]) == {"hello.txt", "data.bin"}


def test_versions_and_time_travel(ds):
    fs, _, work = ds
    assert fs.versions() == [1]
    tree2 = f"{work}/tree2"
    os.makedirs(tree2, exist_ok=True)
    with open(f"{tree2}/late.txt", "w") as f:
        f.write("v2")
    fs.ingest(tree2)
    assert fs.versions() == [1, 2]
    v1 = fs.table_at(1).toPandas()
    assert "late.txt" not in set(v1["name"])
    v2 = fs.table_at(2).toPandas()
    assert "late.txt" in set(v2["name"])


def test_table_location_handoff_duckdb(ds):
    fs, _, _ = ds
    duckdb = pytest.importorskip("duckdb")
    loc = fs.table_location
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{loc}/**/*.parquet') "
        f"WHERE size IS NOT NULL").fetchone()[0]
    # logical files match the engine's own listing
    assert n == len(fs.sql_as_pandas(
        "SELECT name FROM rootfs WHERE size IS NOT NULL"))
    assert isinstance(fs.storage_options, dict)


def test_compact_keeps_data(ds):
    fs, _, _ = ds
    before = fs.sql_as_pandas(
        "SELECT parent, name FROM rootfs WHERE size IS NOT NULL "
        "ORDER BY parent, name")
    n_files = fs.compact()
    assert n_files >= 1
    after = fs.sql_as_pandas(
        "SELECT parent, name FROM rootfs WHERE size IS NOT NULL "
        "ORDER BY parent, name")
    assert before.equals(after)


def test_sql_as_polars_contract(ds):
    fs, _, _ = ds
    try:
        import polars  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="polars"):
            fs.sql_as_polars("SELECT 1 AS x")
        return
    out = fs.sql_as_polars(
        "SELECT name FROM rootfs WHERE size IS NOT NULL ORDER BY name")
    assert out["name"].to_list() == ["data.bin", "hello.txt"]


def test_incremental_dedup_over_bridge(spark):
    """The dedup family over py4j: two exact batches against one store
    (cross-batch keeper found), then a minhash near-dup pair, then a
    store compaction pass."""
    from cdlake import Cdl
    cdl = Cdl(spark)
    work = tempfile.mkdtemp(prefix="cdlake_dedup_")

    b1 = spark.createDataFrame([(1, "aaa"), (2, "bbb"), (3, "aaa")],
                               "doc_id LONG, text STRING")
    b2 = spark.createDataFrame([(10, "bbb"), (11, "ccc")],
                               "doc_id LONG, text STRING")
    store = f"{work}/exact_store"
    r1 = {r["doc_id"]: r["dup_of"]
          for r in cdl.dedup_exact(b1, store).collect()}
    assert r1 == {1: None, 2: None, 3: 1}
    r2 = {r["doc_id"]: r["dup_of"]
          for r in cdl.dedup_exact(b2, store).collect()}
    # doc 10 duplicates batch 1's keeper THROUGH the store
    assert r2 == {10: 2, 11: None}

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest while birds sing above")
    near = base.replace("lazy dog", "sleepy dog")
    mh1 = spark.createDataFrame([(0, base)], "doc_id LONG, text STRING")
    mh2 = spark.createDataFrame([(1, near)], "doc_id LONG, text STRING")
    mh_store = f"{work}/mh_store"
    assert cdl.dedup_minhash(mh1, mh_store).count() == 0
    pairs = cdl.dedup_minhash(mh2, mh_store).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(0, 1)]

    # the near-dup docs SHARE band buckets (that's why they pair), so
    # the second append fragmented the shared partitions; compaction
    # rewrites them, after which a second pass finds nothing to do and
    # the pair survives a re-read of the compacted store
    assert cdl.compact_dedup_store(mh_store) > 0
    assert cdl.compact_dedup_store(mh_store) == 0
    again = cdl.dedup_minhash(mh2, mh_store).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in again] == [(0, 1)]

    # simhash variant: identical text arriving in batch 2 pairs with
    # batch 1's doc through the store at hamming 0
    sh_store = f"{work}/sh_store"
    assert cdl.dedup_simhash(mh1, sh_store).count() == 0
    sh2 = spark.createDataFrame([(1, base)], "doc_id LONG, text STRING")
    sh_pairs = cdl.dedup_simhash(sh2, sh_store).collect()
    assert [(p["doc_a"], p["doc_b"], p["hamming"])
            for p in sh_pairs] == [(0, 1, 0)]

    # ngram variant: the near-dup pair surfaces through the posting
    # store with an exact shared-gram count and jaccard
    ng_store = f"{work}/ng_store"
    assert cdl.dedup_ngram(mh1, ng_store).count() == 0
    ng_pairs = cdl.dedup_ngram(mh2, ng_store).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in ng_pairs] == [(0, 1)]
    assert ng_pairs[0]["jaccard"] >= 0.5

    # embedding variant over the bridge, split layout: batch 2's clone
    # pairs with batch 1's vector THROUGH the posting/forward split,
    # and later calls adopt the layout from the manifest
    e1 = spark.createDataFrame([(0, [1.0, 0.1, 0.0, 0.0])],
                               "vec_id LONG, embedding ARRAY<DOUBLE>")
    e2 = spark.createDataFrame([(1, [0.99, 0.11, 0.0, 0.01])],
                               "vec_id LONG, embedding ARRAY<DOUBLE>")
    emb_store = f"{work}/emb_store"
    assert cdl.dedup_embedding(e1, emb_store, layout="split").count() == 0
    emb_pairs = cdl.dedup_embedding(e2, emb_store).collect()  # adopt
    assert [(p["id_a"], p["id_b"]) for p in emb_pairs] == [(0, 1)]
    assert emb_pairs[0]["cosine"] >= 0.95
    import os as _os
    assert _os.path.isdir(f"{emb_store}/vectors")

    # retraction (takedown for derived data): erase keeper 1 from the
    # exact store — the content re-keeps on next arrival; and erase doc 0
    # from the minhash store — the near-dup pair is gone
    assert cdl.retract(store, [1]) == 1
    r3 = {r["doc_id"]: r["dup_of"]
          for r in cdl.dedup_exact(
              spark.createDataFrame([(30, "aaa"), (31, "bbb")],
                                    "doc_id LONG, text STRING"),
              store).collect()}
    assert r3 == {30: None, 31: 2}
    assert cdl.retract(mh_store, [0]) > 0
    assert cdl.dedup_minhash(mh2, mh_store).count() == 0


def test_incremental_clusters_over_bridge(spark):
    """The clustering store over py4j: two pair batches whose second
    MERGES clusters from the first, then the resolved labels/keepers
    views and a compaction pass."""
    from cdlake import Cdl
    cdl = Cdl(spark)
    store = tempfile.mkdtemp(prefix="cdlake_clusters_") + "/store"

    b1 = spark.createDataFrame([(1, 2), (10, 11)], "doc_a LONG, doc_b LONG")
    b2 = spark.createDataFrame([(2, 10), (20, 21)], "doc_a LONG, doc_b LONG")
    v1 = {r["v"]: r["component"]
          for r in cdl.clusters_add_pairs(b1, store).collect()}
    assert v1 == {1: 1, 2: 1, 10: 10, 11: 10}
    v2 = {r["v"]: r["component"]
          for r in cdl.clusters_add_pairs(b2, store).collect()}
    assert v2 == {2: 1, 10: 1, 20: 20, 21: 20}  # 10's cluster merged into 1
    labels = {r["v"]: r["component"]
              for r in cdl.clusters_labels(store).collect()}
    assert labels == {1: 1, 2: 1, 10: 1, 11: 1, 20: 20, 21: 20}
    keepers = {r["v"] for r in cdl.clusters_keepers(store).collect()}
    assert keepers == {1, 20}
    # compaction folds the dethroned root's two stale rows and is
    # label-preserving
    assert cdl.clusters_compact(store) == 2
    after = {r["v"]: r["component"]
             for r in cdl.clusters_labels(store).collect()}
    assert after == labels


def test_ivf_index_over_bridge(spark):
    """The persisted ANN index over py4j: build, exhaustive-probe search
    (top-1 of a vector's own clone is itself at cosine 1.0), health
    telemetry, and a drift-triggered recluster."""
    import random
    from cdlake import Cdl
    cdl = Cdl(spark)
    work = tempfile.mkdtemp(prefix="cdlake_ivf_")
    idx = f"{work}/ivf"

    rng = random.Random(7)
    corpus = [(i, [rng.uniform(-1, 1) for _ in range(8)])
              for i in range(64)]
    df = spark.createDataFrame(corpus,
                               "vec_id LONG, embedding ARRAY<DOUBLE>")
    cdl.ivf_build(df, idx, nlist=8)

    q = spark.createDataFrame([corpus[3]],
                              "vec_id LONG, embedding ARRAY<DOUBLE>")
    top = cdl.ivf_search(q, idx, k=1, nprobe=8).collect()
    assert top[0]["neighbor_id"] == 3 and top[0]["cosine"] == 1.0

    occ = {r["cell"]: r["n"] for r in cdl.ivf_occupancy(idx).collect()}
    assert sum(occ.values()) == 64
    assert cdl.ivf_imbalance(idx) >= 1.0

    # a dense clone cloud of one vector drifts one cell hot; a tight
    # threshold trips the recluster, a huge one does not
    cloud = [(1000 + j, [x + j * 1e-4 for x in corpus[5][1]])
             for j in range(100)]
    cdf = spark.createDataFrame(cloud,
                                "vec_id LONG, embedding ARRAY<DOUBLE>")
    assert cdl.ivf_append(cdf, idx, rebuild_imbalance=1e9) is False
    probe = spark.createDataFrame([(2000, corpus[5][1])],
                                  "vec_id LONG, embedding ARRAY<DOUBLE>")
    rebuilt = cdl.ivf_append(probe, idx, rebuild_imbalance=2.0)
    assert rebuilt is True
    # nothing lost through the swap; the clone cloud is still findable
    assert sum(r["n"] for r in cdl.ivf_occupancy(idx).collect()) == 165
    top2 = cdl.ivf_search(q, idx, k=1, nprobe=8).collect()
    assert top2[0]["cosine"] == 1.0

    # coded (IVF-PQ) probe: same top-1 at the same exact score
    top3 = cdl.ivf_search(q, idx, k=1, nprobe=8, rerank=4).collect()
    assert top3[0]["neighbor_id"] == top2[0]["neighbor_id"]
    assert top3[0]["cosine"] == 1.0

    # retraction: vector 3 becomes unsearchable, cell-pruned rewrite
    assert cdl.ivf_retract(idx, [3]) == 1
    top4 = cdl.ivf_search(q, idx, k=1, nprobe=8).collect()
    assert top4[0]["neighbor_id"] != 3


def test_bm25_search_over_bridge(spark):
    """BM25 keyword retrieval over py4j: the exact-match doc ranks
    first, non-matching docs never surface."""
    from cdlake import Cdl
    cdl = Cdl(spark)
    docs = spark.createDataFrame(
        [(1, "spark runs fast fast"), (2, "spark runs slow"),
         (3, "ducks swim in ponds")],
        "doc_id LONG, text STRING")
    queries = spark.createDataFrame(
        [(0, "spark fast")], "query_id LONG, query STRING")
    hits = cdl.bm25_search(docs, queries, k=5).collect()
    assert [h["doc_id"] for h in hits] == [1, 2]
    assert hits[0]["bm25"] > hits[1]["bm25"]
    assert [h["rank"] for h in hits] == [1, 2]

    # persisted index: same results through the pruned read; incremental
    # (second batch appends), then retraction removes a doc end-to-end
    idx = tempfile.mkdtemp(prefix="cdlake_bm25_") + "/idx"
    assert cdl.bm25_index(docs.filter("doc_id < 3"), idx) == 2
    assert cdl.bm25_index(docs.filter("doc_id >= 3"), idx) == 1
    ih = cdl.bm25_index_search(idx, queries, k=5).collect()
    assert [(h["doc_id"], h["bm25"], h["rank"]) for h in ih] == \
        [(h["doc_id"], h["bm25"], h["rank"]) for h in hits]
    assert cdl.retract(idx, [1]) > 0
    after = cdl.bm25_index_search(idx, queries, k=5).collect()
    assert [h["doc_id"] for h in after] == [2]


def test_dsir_and_semdedup_over_bridge(spark):
    """DSIR selection + SemDeDup over py4j: target-aligned docs outrank,
    the Gumbel resample is salt-deterministic, clone groups collapse."""
    from cdlake import Cdl
    cdl = Cdl(spark)
    docs = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "alpha gamma", "en"),
         (3, "delta delta", "zz"), (4, "alpha delta", "zz")],
        "doc_id LONG, text STRING, lang STRING")
    top = cdl.dsir_topk(docs, "lang = 'en'", k=2).collect()
    assert {r["doc_id"] for r in top} <= {1, 2, 4}  # never the delta-only doc
    r1 = [r["doc_id"] for r in cdl.dsir_resample(docs, "lang = 'en'", 2,
                                                 salt="s").collect()]
    r2 = [r["doc_id"] for r in cdl.dsir_resample(docs, "lang = 'en'", 2,
                                                 salt="s").collect()]
    assert r1 == r2  # replayable

    embs = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0]), (3, [0.0, 1.0, 0.0])],
        "vec_id LONG, embedding ARRAY<DOUBLE>")
    kept = sorted(r["vec_id"] for r in
                  cdl.sem_dedup(embs, n_clusters=2, tau=0.99).collect())
    assert kept == [1, 3]

    # banded recall telemetry: the clone pair co-cells -> recall 1.0,
    # and its pair lands in the clone band (cosine 1.0 >= 0.9999)
    bands, near = cdl.sem_dedup_recall_bands(embs, n_clusters=2, tau=0.99)
    assert near == 1.0
    assert sum(b[3] for b in bands if b[2]) == 1  # one clone pair drawn

    # straddler-recovery knobs reach the bridge (r16 verdict #3): an
    # explicit band/max_probe routes through semDedupWith unchanged on
    # this clone-only corpus, and the tuner returns its dict shape with
    # the first rung already at target
    kept2 = sorted(r["vec_id"] for r in
                   cdl.sem_dedup(embs, n_clusters=2, tau=0.99,
                                 band=0.06, max_probe=2).collect())
    assert kept2 == [1, 3]
    tuned = cdl.sem_dedup_tune(embs, n_clusters=2, tau=0.99,
                               target_recall=0.95)
    assert tuned["recall"] >= 0.95 and tuned["rungs_probed"] == 1
    assert tuned["band"] > 0 and tuned["max_probe"] >= 2

    # hybrid RRF: doc 1 matches lexically AND semantically -> rank 1
    hq = spark.createDataFrame(
        [(0, "alpha beta", [1.0, 0.0, 0.0])],
        "query_id LONG, query STRING, qvec ARRAY<DOUBLE>")
    hits = cdl.hybrid_search(docs.select("doc_id", "text"), embs, hq,
                             k=3).collect()
    assert hits[0]["doc_id"] == 1 and hits[0]["rank"] == 1


def test_span_dedup_over_bridge(spark):
    """Span dedup over py4j: the non-keeper copy of a duplicated window
    is cut, the keeper doc is untouched, detection lists the cut."""
    from cdlake import Cdl
    cdl = Cdl(spark)
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x a b c y")],
        "doc_id LONG, text STRING")
    spans = [(r["doc_id"], r["pos"])
             for r in cdl.duplicated_spans(docs, w=3).collect()]
    assert spans == [(2, 1)]  # "a b c" at doc 2 pos 1; doc 1 pos 0 keeps
    out = {r["doc_id"]: r["text"]
           for r in cdl.span_dedup(docs, w=3).collect()}
    assert out == {1: "a b c d e", 2: "x y"}


def test_incremental_span_dedup_over_bridge(spark, tmp_path):
    """Incremental span store over py4j: batch 2's duplicated window is
    cut against batch 1's stored keeper."""
    from cdlake import Cdl
    cdl = Cdl(spark)
    store = str(tmp_path / "span_store")
    b1 = spark.createDataFrame([(1, "a b c d e")], "doc_id LONG, text STRING")
    b2 = spark.createDataFrame([(9, "x a b c z")], "doc_id LONG, text STRING")
    assert cdl.dedup_span(b1, store, w=3).count() == 0
    spans_df = cdl.dedup_span(b2, store, w=3)
    spans = [(r["doc_id"], r["pos"], r["keep_doc_id"], r["keep_pos"])
             for r in spans_df.collect()]
    assert spans == [(9, 1, 1, 0)]
    # rewrite the batch from the incremental span rows
    out = {r["doc_id"]: r["text"]
           for r in cdl.cut_spans(b2, spans_df, w=3).collect()}
    assert out == {9: "x z"}


def test_curate_over_bridge(spark):
    """Curation funnel over py4j: the low-quality doc drops at stage 1,
    the duplicate at stage 2, the benchmark-contaminated doc at stage 3,
    and the funnel's docs_in chain is consistent."""
    from cdlake import Cdl
    cdl = Cdl(spark)
    good = ("the quick brown fox jumps over the lazy dog and it is a "
            "fine day in the park ") * 3
    contaminated = ("the secret benchmark question about the capital of "
                    "france is answered in the training document here "
                    "with plenty of padding tokens to pass the quality "
                    "bar of the pipeline today")
    docs = spark.createDataFrame(
        [(1, good), (2, good), (3, "x!!"), (4, contaminated)],
        "doc_id LONG, text STRING")
    bench = spark.createDataFrame(
        [(100, "the secret benchmark question about the capital of "
               "france is answered")],
        "doc_id LONG, text STRING")
    kept, funnel = cdl.curate(docs, benchmark=bench, min_quality=0.4)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1]
    rows = {r["stage"]: (r["docs_in"], r["docs_out"])
            for r in funnel.collect()}
    assert rows["quality"] == (4, 3)       # doc 3 fails quality
    assert rows["exact_dup"] == (3, 2)     # doc 2 is doc 1's copy
    assert rows["contaminated"] == (2, 1)  # doc 4 shares bench 3-grams


def test_cascade_delete_over_bridge(spark):
    """One cascaded delete retracts the retired row ids from every
    attached derived store (the takedown loop in one call)."""
    from cdlake import Cdl
    cdl = Cdl(spark, max_chunk_size="1024")
    work = tempfile.mkdtemp(prefix="cdlake_cascade_")
    tree = f"{work}/tree"
    os.makedirs(f"{tree}/purgedir")
    with open(f"{tree}/keep.txt", "w") as f:
        f.write("keep these words around")
    with open(f"{tree}/purgedir/secret.txt", "w") as f:
        f.write("purge these words away")
    fs = cdl.open(f"{work}/ds")
    fs.ingest(tree)
    # derived store keyed by the table's row_id stamps
    docs = fs.sql("SELECT row_id AS doc_id, CAST(data AS STRING) AS text "
                  "FROM rootfs")
    store = f"{work}/store"
    cdl.dedup_exact(docs, store)
    fs.attach_store(store)
    assert fs.attached_stores() == [(store, "row_id")]
    retired = [r["row_id"] for r in
               fs.sql("SELECT row_id FROM rootfs WHERE parent = '/purgedir'")
               .collect()]
    assert fs.delete_where("parent = '/purgedir'", cascade=True) == 1
    store_df = spark.read.parquet(store)
    assert store_df.where(store_df["keep_doc_id"].isin(retired)).count() == 0
    assert fs.cascade_pending_stores() == []
    assert fs.run_cascade_pending() == []
    assert fs.detach_store(store) is True


def test_store_fsck_over_bridge(spark, tmp_path):
    """Store fsck over py4j: a clean store audits clean at both tiers;
    a planted violation is named by its owning check."""
    from cdlake import Cdl
    cdl = Cdl(spark)
    store = str(tmp_path / "store")
    docs = spark.createDataFrame([(1, "alpha"), (2, "beta")],
                                 "doc_id LONG, text STRING")
    cdl.dedup_exact(docs, store).collect()
    assert cdl.store_fsck(store) == []
    assert cdl.store_fsck(store, deep=True) == []
    # corrupt: demand a feature this binary lacks
    mp = store + "/_graft_store.json"
    body = open(mp).read()
    open(mp, "w").write(body.replace(
        '"required_features":"doc_index"',
        '"required_features":"doc_index,warp_sketch"'))
    import os
    crc = store + "/._graft_store.json.crc"
    if os.path.exists(crc):
        os.remove(crc)
    findings = cdl.store_fsck(store)
    assert any(f[0] == "error" and f[1] == "required_features" and
               "warp_sketch" in f[2] for f in findings), findings


def test_store_fsck_repair_over_bridge(spark, tmp_path):
    """store-fsck --repair over py4j: crash debris (a stranded arm
    sentinel) is healed by the sweep and the store re-audits clean;
    a clean store repairs as a no-op."""
    from cdlake import Cdl
    cdl = Cdl(spark)
    store = str(tmp_path / "store")
    docs = spark.createDataFrame([(1, "alpha"), (2, "beta")],
                                 "doc_id LONG, text STRING")
    cdl.dedup_exact(docs, store).collect()
    assert cdl.store_fsck_repair(store, deep=True) == []
    # plant a stranded arm sentinel (a crashed retraction arm)
    open(store + "/_retract_arm", "w").write("999")
    acts = cdl.store_fsck_repair(store)
    assert any(a[1] == "markers" and a[2] == "applied" for a in acts), acts
    assert cdl.store_fsck(store, deep=True) == []


def test_model_user_storage_options(spark):
    """ModelUser secret-ref resolution over the bridge (control-plane
    parity): the CRD's access-token reference resolves against a
    secret map into the catalog's storage options, with the reference's
    exact failure strings for a missing secret/key."""
    from cdlake import Cdl
    cdl = Cdl(spark, s3_endpoint="http://pond:9000")
    secrets = {"object-storage-user-0": {
        "CONSOLE_ACCESS_KEY": "ak-123", "CONSOLE_SECRET_KEY": "sk-456"}}
    opts = cdl.model_user_storage_options(secrets)
    assert opts["fs.s3a.access.key"] == "ak-123"
    assert opts["fs.s3a.secret.key"] == "sk-456"
    assert opts["fs.s3a.endpoint"] == "http://pond:9000"
    # token-less spec: catalog credentials stand (none here)
    bare = cdl.model_user_storage_options(secrets, secret_name=None)
    assert "fs.s3a.access.key" not in bare
    # the reference's exact failure strings
    import py4j.protocol
    try:
        cdl.model_user_storage_options(secrets, secret_name="absent")
        assert False, "missing secret must raise"
    except py4j.protocol.Py4JJavaError as e:
        assert "no such secret: absent" in str(e)
    try:
        cdl.model_user_storage_options(
            {"object-storage-user-0": {"CONSOLE_ACCESS_KEY": "ak"}})
        assert False, "missing key must raise"
    except py4j.protocol.Py4JJavaError as e:
        assert "no such secret key: object-storage-user-0/CONSOLE_SECRET_KEY" in str(e)


def test_to_csv_collates_bench_outputs(tmp_path):
    """The results collator (scripts/to_csv.py) on reference-shaped
    per-run JSON: union-of-keys header in first-seen order, index
    column, empty cells where a run lacks a key, CSV named after the
    last input file."""
    import csv
    import json
    import to_csv

    (tmp_path / "a_create.json").write_text(json.dumps({
        "kind": "create_datasets", "num_datasets": 2,
        "create_datasets_timestamp_begin": 1_000_000,
        "create_datasets_timestamp_end": 2_000_000}))
    (tmp_path / "b_sync.json").write_text(json.dumps({
        "kind": "sync_datasets", "num_datasets": 2, "num_ponds": 3,
        "sync_datasets_timestamp_begin": 3_000_000,
        "sync_datasets_timestamp_end": 4_000_000}))

    out = to_csv.main(tmp_path)
    assert out == tmp_path / "b_sync.csv"
    rows = list(csv.reader(out.open()))
    assert rows[0] == ["", "kind", "num_datasets",
                       "create_datasets_timestamp_begin",
                       "create_datasets_timestamp_end", "num_ponds",
                       "sync_datasets_timestamp_begin",
                       "sync_datasets_timestamp_end"]
    assert rows[1][:3] == ["0", "create_datasets", "2"]
    assert rows[2][:3] == ["1", "sync_datasets", "2"]
    # empty cells where a run lacks a key (create has no num_ponds)
    assert rows[1][5] == "" and rows[2][5] == "3"
