package graft.ops

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Incremental span dedup (window store): batch-sequence parity with
  * the one-shot operator, cross-batch keepers, retry idempotence,
  * geometry manifest, partition pruning, and the cutSpans rewrite. */
class IncrementalSpanDedupSpec extends SparkSuite {

  import spark.implicits.newProductEncoder
  import spark.implicits.localSeqToDatasetHolder

  private def store(): String =
    Files.createTempDirectory("incspan_").toString + "/store"

  // the SpanDedupSpec corpus: doc-1 keeper family, cross-doc copy,
  // within-doc repeat, full clone, short doc, NULL text
  private def corpus = Seq(
    (1L, Some("a b c d e f")),
    (2L, Some("x b c d y")),
    (3L, Some("p q r s p q r s")),
    (4L, Some("a b c d e f")),
    (5L, Some("u v")),
    (6L, None: Option[String])
  ).toDF("doc_id", "text")

  private def spansOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ordered two-batch union equals the one-shot span set") {
    val dir = store()
    val a = IncrementalSpanDedup.spanBatch(
      corpus.filter(col("doc_id") <= 3), dir, w = 3)
    val b = IncrementalSpanDedup.spanBatch(
      corpus.filter(col("doc_id") > 3), dir, w = 3)
    val oneShot = spansOf(SpanDedup.duplicatedSpans(corpus, w = 3))
    assert(spansOf(a) ++ spansOf(b) == oneShot)
    // and the batches partition the set: batch A never reports B's docs
    assert(spansOf(a).forall(_._1 <= 3) && spansOf(b).forall(_._1 > 3))
  }

  test("cross-batch duplicate carries the STORE keeper's identity") {
    val dir = store()
    IncrementalSpanDedup.spanBatch(
      Seq((1L, "a b c d e f")).toDF("doc_id", "text"), dir, w = 3)
    val out = IncrementalSpanDedup.spanBatch(
      Seq((9L, "x a b c z")).toDF("doc_id", "text"), dir, w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    // "a b c" at doc 9 pos 1 duplicates doc 1 pos 0 (the stored keeper)
    assert(out == Set((9L, 1L, 1L, 0L)))
  }

  test("a replayed batch reports the same spans and appends nothing") {
    val dir = store()
    val batch = corpus.filter(col("doc_id") <= 4)
    val first = spansOf(IncrementalSpanDedup.spanBatch(batch, dir, w = 3))
    val rowsAfterFirst = spark.read.parquet(dir).count()
    val replay = spansOf(IncrementalSpanDedup.spanBatch(batch, dir, w = 3))
    assert(replay == first)
    assert(spark.read.parquet(dir).count() == rowsAfterFirst)
  }

  test("single-batch run equals the one-shot operator (degenerate sequence)") {
    val dir = store()
    val got = spansOf(IncrementalSpanDedup.spanBatch(corpus, dir, w = 3))
    assert(got == spansOf(SpanDedup.duplicatedSpans(corpus, w = 3)))
  }

  test("geometry manifest: a mismatched w fails loudly") {
    val dir = store()
    IncrementalSpanDedup.spanBatch(corpus, dir, w = 3)
    val e = intercept[IllegalArgumentException] {
      IncrementalSpanDedup.spanBatch(corpus, dir, w = 4)
    }
    assert(e.getMessage.contains("different geometry"), e.getMessage)
  }

  test("a small append scans only its touched partitions (pruning)") {
    val dir = store()
    // 300 docs of distinct 12-token texts → ~2700 stored windows
    def text(i: Long): String =
      (0 until 12).map(j => s"w${(i * 13 + j * 7) % 9973}").mkString(" ")
    val seed = (0L until 300L).map(i => (i, text(i))).toDF("doc_id", "text")
    IncrementalSpanDedup.spanBatch(seed, dir, w = 10, storeParts = 256)
    val storeRows = spark.read.parquet(dir).count()
    val one = Seq((9999L, text(42L))).toDF("doc_id", "text")
    val recs = recordsReadDuring {
      val out = IncrementalSpanDedup.spanBatch(one, dir, w = 10).collect()
      // correctness across the pruned scan: all 3 windows of the clone
      // are duplicates of doc 42's stored keepers
      assert(out.length == 3 && out.forall(_.getLong(2) == 42L))
    }
    // a warm cycle runs TWO pruned store scans (probe join +
    // idempotency anti-join); a 3-window append touches ≤ 3 of 256
    // partitions per scan — one UNpruned scan alone would exceed this
    assert(recs < (storeRows * 2) / 10,
      s"3-window append read $recs records of a $storeRows-row store")
  }

  test("cutSpans over the incremental span rows rewrites the batch") {
    val dir = store()
    IncrementalSpanDedup.spanBatch(
      Seq((1L, "a b c d e f")).toDF("doc_id", "text"), dir, w = 3)
    val batch = Seq((9L, "x a b c z"), (10L, "no dup here")).toDF("doc_id", "text")
    val spans = IncrementalSpanDedup.spanBatch(batch, dir, w = 3)
    val out = SpanDedup.cutSpans(batch, spans, w = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(9L -> "x z", 10L -> "no dup here"))
  }

  test("spanStream: micro-batch cycles equal the cross-file window dedup") {
    val work = Files.createTempDirectory("spanstream").toString
    Seq((1L, "a b c d e")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$work/in/f1")
    Seq((9L, "x a b c z")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$work/in/f2")
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in/*")
    val q = IncrementalSpanDedup.spanStream(
      stream, s"$work/store", s"$work/out", s"$work/ckpt", w = 3)
    try q.processAllAvailable() finally q.stop()
    // "a b c" occurs once per file: whatever order the files became
    // micro-batches, exactly ONE occurrence is the keeper and the other
    // is the span — and they are the two known positions
    val out = spark.read.parquet(s"$work/out")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3))))
    assert(out.length == 1)
    val (span, keeper) = out.head
    assert(Set(span, keeper) == Set((1L, 0L), (9L, 1L)))
    // store = one keeper per distinct window across the stream (3 + 3
    // windows, "a b c" shared → 5)
    assert(spark.read.parquet(s"$work/store").count() == 5)
  }

  test("rebuildStore re-buckets a span store; appends prune and agree") {
    val src = store()
    def text(i: Long): String =
      (0 until 12).map(j => s"w${(i * 13 + j * 7) % 9973}").mkString(" ")
    val seed = (0L until 300L).map(i => (i, text(i))).toDF("doc_id", "text")
    IncrementalSpanDedup.spanBatch(seed, src, w = 10, storeParts = 256)
    val dst = store()
    val parts = IncrementalDedup.rebuildStore(spark, src, dst, 8)
    assert(parts == 8)
    val out = IncrementalSpanDedup.spanBatch(
      Seq((9999L, text(42L))).toDF("doc_id", "text"), dst, w = 10)
      .collect()
    assert(out.length == 3 && out.forall(_.getLong(2) == 42L))
  }

  private def recordsReadDuring(body: => Unit): Long = {
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
