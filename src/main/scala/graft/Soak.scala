package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup scale soak: run the expensive dedup family on an N× derived
  * corpus and report wall time + shuffle volume, so the "scales at 100×"
  * argument is a measured curve instead of a design note (BASELINE.md
  * §r8). Usage: `runMain graft.Soak [sfDir] [factor]`.
  *
  * The derived corpus is `factor` copies of `documents`, each copy's
  * tokens prefixed with a copy tag (`c<i>_`): a bijection on tokens
  * preserves every within-copy shingle relation EXACTLY (same pairs,
  * same jaccard), while cross-copy overlap collapses to zero — so true
  * pair count and cluster structure scale linearly with `factor`, the
  * shape a real 10× corpus has. Naive replication instead plants a
  * `factor`-clique on every document and grows pairs quadratically —
  * a different (and unrealistic) problem.
  *
  * Shuffle bytes come from stage metrics via a SparkListener — the same
  * numbers the UI shows, per operator, with no instrumentation inside
  * the operators themselves.
  */
object Soak {

  private final class ShuffleMeter extends SparkListener {
    val writeBytes = new java.util.concurrent.atomic.AtomicLong
    val readBytes = new java.util.concurrent.atomic.AtomicLong
    val peakStageWrite = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        val w = m.shuffleWriteMetrics.bytesWritten
        writeBytes.addAndGet(w)
        readBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        peakStageWrite.updateAndGet(p => math.max(p, w))
        ()
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Queries.rd(spark, sfDir, "documents")
      .select("doc_id", "source", "text")
    val scaled = (0 until factor).map { i =>
      docs.select(
        (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
        col("source"),
        regexp_replace(col("text"), "(^|\\s)", s"$$1c${i}_").as("text"))
    }.reduce(_ unionAll _)
    // materialize the corpus once so every operator reads the same
    // parquet (like a real pipeline stage would), not a 10-way union plan
    val tmp = java.nio.file.Files.createTempDirectory("graft_soak_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      org.apache.hadoop.fs.FileUtil.fullyDelete(tmp.toFile)
      ()
    }))
    val corpusPath = s"$tmp/documents"
    scaled.write.parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val nDocs = corpus.count()

    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    final case class Run(name: String, sec: Double, rows: Long,
        shuffleWriteMB: Double, shuffleReadMB: Double, peakStageWriteMB: Double)
    def run(name: String)(df: => DataFrame): Run = {
      spark.catalog.clearCache()
      System.gc()
      val w0 = meter.writeBytes.get; val r0 = meter.readBytes.get
      meter.peakStageWrite.set(0)
      val t0 = System.nanoTime()
      val rows = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Run(name, sec, rows,
        (meter.writeBytes.get - w0) / 1e6, (meter.readBytes.get - r0) / 1e6,
        meter.peakStageWrite.get / 1e6)
    }

    // operator configs mirror the GATE queries exactly (q_dedup_ngram_
    // jaccard / _minhash_lsh / _clusters / _keep), so the curve measures
    // the product constants (dfCap, banding) at scale — the clusters/keep
    // pair graph uses the same two-source stratum the gate uses (the
    // full-corpus threshold-0.01 graph is one giant component at every
    // factor: a degenerate shape that measures fixpoint depth, not dedup)
    val twoSrc = corpus.filter(col("source").isin("src0", "src1"))
    val runs = Seq(
      run("ngram_pairs") {
        ops.Dedup.ngramJaccardPairs(corpus, n = 3, threshold = 0.01)
      },
      // breakdown stages for the minhash pipeline: signatures alone
      // (map-only), then the banded bucket-join candidates, then the
      // full exact-verified operator — when the total curves superlinear
      // these localize which stage bent
      run("minhash_signatures") {
        ops.Dedup.minhashSignatures(corpus, n = 3)
      },
      run("minhash_candidates") {
        val sigs = ops.Dedup.minhashSignatures(corpus, n = 3)
        val banded = ops.Dedup.bandSignatures(sigs, 16, 4)
        banded.as("a").join(banded.as("b"), Seq("band", "bh"))
          .filter(col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .dropDuplicates("doc_a", "doc_b")
      },
      run("minhash_lsh_pairs") {
        ops.Dedup.minhashLshNearDupPairs(corpus, n = 3, threshold = 0.8)
      },
      run("clusters") {
        val pairs = ops.Dedup.ngramJaccardPairs(twoSrc, n = 3, threshold = 0.01)
        ops.Components.ofPairs(pairs)
      },
      run("keep_representatives") {
        val pairs = ops.Dedup.ngramJaccardPairs(twoSrc, n = 3, threshold = 0.01)
        ops.Dedup.keepRepresentatives(twoSrc, pairs)
      })

    val json = runs.map(r =>
      s"""{"op":"${r.name}","sec":${f"${r.sec}%.2f"},"rows":${r.rows},""" +
        s""""shuffle_write_mb":${f"${r.shuffleWriteMB}%.1f"},""" +
        s""""shuffle_read_mb":${f"${r.shuffleReadMB}%.1f"},""" +
        s""""peak_stage_write_mb":${f"${r.peakStageWriteMB}%.1f"}}""")
      .mkString("[", ",", "]")
    println(s"""{"soak":{"sf":"$sfDir","factor":$factor,"n_docs":$nDocs,"runs":$json}}""")
    spark.stop()
  }
}
