package graft.ops

import java.nio.file.Files

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The unified swap-retry discipline (r19 verdict #2/#3/#4): structured
  * transient classification, the deadline-bound vanished-file retry,
  * and the injectable seqlock bounds — including the previously
  * untestable 30-min absolute starvation cap, pinned here with a
  * conf-shrunk cap against BOTH seqlock loops. */
class SwapRetrySpec extends SparkSuite {

  import spark.implicits.newProductEncoder
  import spark.implicits.localSeqToDatasetHolder

  // --- classification -------------------------------------------------

  test("an unrelated exception whose message contains 'does not exist' " +
      "is NOT classified vanished (r19 verdict #2)") {
    // the old substring classifier retried these — a UDF's own error or
    // a missing-column message silently burned 20 retries
    assert(!SwapRetry.fileVanished(
      new RuntimeException("column `v` does not exist in schema")))
    assert(!SwapRetry.fileVanished(new RuntimeException(
      "boom", new IllegalStateException("the table does not exist"))))
    assert(!SwapRetry.fileVanished(
      new RuntimeException("FILE_NOT_EXIST mentioned without brackets")))
  }

  test("structured arms classify vanished files: FNF chain, Spark " +
      "conditions, bracketed last-resort tokens") {
    assert(SwapRetry.fileVanished(new java.io.FileNotFoundException("/x")))
    // wrapped arbitrarily deep (Spark wraps task failures)
    assert(SwapRetry.fileVanished(new RuntimeException("outer",
      new Exception("mid", new java.io.FileNotFoundException("/y")))))
    // a SparkThrowable carrying the structured condition — the stable
    // identifier, independent of message text
    val fnf = new Exception("task failed") with org.apache.spark.SparkThrowable {
      override def getCondition: String = "FAILED_READ_FILE.FILE_NOT_EXIST"
    }
    assert(SwapRetry.fileVanished(fnf))
    val pnf = new Exception("resolution failed") with org.apache.spark.SparkThrowable {
      override def getCondition: String = "PATH_NOT_FOUND"
    }
    assert(SwapRetry.fileVanished(new RuntimeException("wrap", pnf)))
    // an UNRELATED condition does not match
    val dbz = new Exception("div") with org.apache.spark.SparkThrowable {
      override def getCondition: String = "DIVIDE_BY_ZERO"
    }
    assert(!SwapRetry.fileVanished(dbz))
    // last resort: Spark's bracketed error-class token in free text
    // (a rethrown message that lost its SparkThrowable type)
    assert(SwapRetry.fileVanished(
      new RuntimeException("[PATH_NOT_FOUND] Path does not exist: /z")))
  }

  // --- retryVanished --------------------------------------------------

  test("retryVanished re-reads through vanishes and surfaces the rest") {
    var n = 0
    val got = SwapRetry.retryVanished("test read", sleepMs = 1L) {
      n += 1
      if (n < 3) throw new java.io.FileNotFoundException("/gone")
      42
    }
    assert(got == 42 && n == 3)
    // a non-vanished shape rethrows immediately, no retry
    var m = 0
    val e = intercept[RuntimeException] {
      SwapRetry.retryVanished("test read", sleepMs = 1L) {
        m += 1; throw new RuntimeException("schema does not exist")
      }
    }
    assert(m == 1 && e.getMessage.contains("schema"))
    // the deadline bounds perpetual vanishing with a loud error
    val d = intercept[IllegalStateException] {
      SwapRetry.retryVanished("test read", deadlineMs = 120L, sleepMs = 5L) {
        throw new java.io.FileNotFoundException("/always-gone")
      }
    }
    assert(d.getMessage.contains("outrunning"))
  }

  // --- injectable seqlock bounds (r19 verdict #4) ---------------------

  private def withConf[T](kv: (String, String)*)(body: => T): T = {
    try { kv.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally kv.foreach { case (k, _) => spark.conf.unset(k) }
  }

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text").limit(200)
  private def bmQueries = Seq((0L, "hash join")).toDF("query_id", "query")

  /** Simulate a LIVE mutator that never settles: raise the pending
    * marker AND hold the store lock from another thread, so the entry
    * heal gets lock-busy (the polite-wait case) and the in-loop heal
    * escalation can never clear the marker either. */
  private def withStuckMutator[T](storeRoot: String, markerDir: String)(
      body: => T): T = {
    val marker = new Path(markerDir, "_retract_pending")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(marker, true).close()
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      graft.fs.StoreLock.withLock(storeRoot,
        spark.sparkContext.hadoopConfiguration) {
        entered.countDown(); release.await()
      })
    holder.setDaemon(true)
    holder.start()
    entered.await()
    try body
    finally {
      release.countDown(); holder.join(30000)
      fs.delete(marker, false)
    }
  }

  test("bm25 search trips the ABSOLUTE starvation cap, conf-injected") {
    val d = Files.createTempDirectory("swapretry_bm").toString + "/idx"
    Bm25Index.indexBatch(docs, d)
    withStuckMutator(d, s"$d/postings") {
      withConf(SwapRetry.AbsoluteCapConf -> "1200") {
        val e = intercept[IllegalArgumentException] {
          Bm25Index.search(spark, d, bmQueries, k = 3)
        }
        assert(e.getMessage.contains("starved"),
          s"wrong trip: ${e.getMessage}")
      }
    }
    // marker cleared + default cap restored: the same search works again
    assert(Bm25Index.search(spark, d, bmQueries, k = 3).count() >= 0)
  }

  test("ivf search trips the ABSOLUTE starvation cap, conf-injected") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = Files.createTempDirectory("swapretry_ivf").toString
    IvfIndex.build(embs.filter(col("vec_id") >= 5), dir, nlist = 4)
    withStuckMutator(dir, s"$dir/assignments") {
      withConf(SwapRetry.AbsoluteCapConf -> "1200") {
        val e = intercept[IllegalArgumentException] {
          IvfIndex.search(spark, dir, embs.filter(col("vec_id") < 2), k = 2)
        }
        assert(e.getMessage.contains("starved"),
          s"wrong trip: ${e.getMessage}")
      }
    }
  }

  test("the progress deadline still trips on a WEDGED (still) mutator, " +
      "conf-injected below the heal-escalation window") {
    val d = Files.createTempDirectory("swapretry_wedge").toString + "/idx"
    Bm25Index.indexBatch(docs, d)
    withStuckMutator(d, s"$d/postings") {
      withConf(SwapRetry.DeadlineConf -> "900",
          SwapRetry.AbsoluteCapConf -> "60000") {
        val e = intercept[IllegalArgumentException] {
          Bm25Index.search(spark, d, bmQueries, k = 3)
        }
        assert(e.getMessage.contains("wedged"),
          s"wrong trip: ${e.getMessage}")
      }
    }
  }
}
