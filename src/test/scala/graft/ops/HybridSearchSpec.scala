package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** RRF fusion: hand-computed scores, missing-modality handling, rank
  * determinism, and the end-to-end BM25 × cosine composition. */
class HybridSearchSpec extends SparkSuite {

  test("rrf matches the hand formula; docs in one list only still fuse") {
    import spark.implicits._
    val lex = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val sem = Seq((0L, 11L, 1), (0L, 13L, 2))
      .toDF("query_id", "doc_id", "rank")
    val got = HybridSearch.rrf(lex, sem, k = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    def f(r: Int) = 1.0 / (60 + r)
    val want = Map( // doc -> exact rrf (6 dp)
      10L -> BigDecimal(f(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      11L -> BigDecimal(f(2) + f(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      12L -> BigDecimal(f(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      13L -> BigDecimal(f(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got.map(g => g._1 -> g._2).toMap == want)
    // doc 11 appears in BOTH lists → highest fused score → rank 1
    assert(got.find(_._1 == 11L).get._3 == 1)
    // single-modality docs are ranked by their one term
    val order = got.sortBy(_._3).map(_._1).toSeq
    assert(order == Seq(11L, 10L, 13L, 12L))
  }

  test("fused rank ties break on doc_id (deterministic)") {
    import spark.implicits._
    // two docs with identical single-modality ranks → identical rrf
    val lex = Seq((0L, 21L, 1)).toDF("query_id", "doc_id", "rank")
    val sem = Seq((0L, 20L, 1)).toDF("query_id", "doc_id", "rank")
    val got = HybridSearch.rrf(lex, sem, k = 2)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(20L, 21L)) // same rrf, lower doc_id first
  }

  test("end-to-end search fuses BM25 and cosine over the corpus") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = Seq((0L, "hash join merge")).toDF("query_id", "query")
      .join(embs.filter(col("vec_id") === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
        Seq("query_id"))
    val got = HybridSearch.search(docs, embs, queries, k = 5)
    val rows = got.collect()
    assert(rows.length == 5)
    assert(rows.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    // the query's own vector (cosine 1.0 → sem rank 1) must fuse in
    assert(rows.map(_.getLong(1)).contains(0L))
    // determinism across runs
    val again = HybridSearch.search(docs, embs, queries, k = 5).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("index-backed searchIndexed matches brute-force RRF (recall >= 0.95)") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = Seq((0L, "hash join merge"), (3L, "sort spill memory"))
      .toDF("query_id", "query")
      .join(embs.select(col("vec_id").as("query_id"),
        col("embedding").as("qvec")), Seq("query_id"))
    val dir = java.nio.file.Files
      .createTempDirectory("hybrid_ivf_").toString
    IvfIndex.build(embs, dir, nlist = 8, kmeansIters = 2)
    val k = 5
    val brute = HybridSearch.search(docs, embs, queries, k)
      .select("query_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact probe at full nprobe coverage AND the PQ-coded probe: both
    // arms must reproduce the brute-force fused top-k (recall pin)
    for (rerank <- Seq(0, 4)) {
      val indexed = HybridSearch.searchIndexed(docs, dir, queries, k,
        nprobe = 8, rerank = rerank)
        .select("query_id", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (indexed intersect brute).size.toDouble / brute.size
      assert(recall >= 0.95, s"rerank=$rerank recall $recall: " +
        s"indexed=$indexed brute=$brute")
    }
    // the pruned-scan property holds THROUGH the fusion: a 1-cell probe
    // reads measurably fewer file-source records than the full-coverage
    // probe (the BM25 arm is identical on both sides, so the delta is
    // the semantic arm's partition pruning — the IvfIndexSpec plan pin
    // can't see through search()'s eager localCheckpoint, the metric can)
    val lowIo = recordsReadDuring {
      HybridSearch.searchIndexed(docs, dir, queries, k, nprobe = 1).count()
    }
    val fullIo = recordsReadDuring {
      HybridSearch.searchIndexed(docs, dir, queries, k, nprobe = 8).count()
    }
    assert(lowIo < fullIo, s"nprobe=1 read $lowIo records vs $fullIo at " +
      "nprobe=8 — the indexed arm lost its partition pruning")
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(dir))
  }

  private def recordsReadDuring(body: => Unit): Long = {
    // the IncrementalDedupSpec pruning witness: file-source records read
    // across every task the body runs, listener-bus drain included
    val recs = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          recs.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      var last = -1L
      var stable = 0
      while (stable < 3) {
        Thread.sleep(200)
        val now = recs.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      recs.get()
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
