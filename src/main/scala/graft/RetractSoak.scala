package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Retraction-at-scale soak: measure that `Retract.retract` rewrites
  * O(touched partitions) of a store, not O(store) — the claim the
  * derived-data takedown path's 100 TB story rests on. Builds the
  * exact, minhash, and span stores over a `factor`× bijected corpus
  * (the Soak corpus discipline), retracts a 5-doc takedown batch from
  * each, and reports wall time, store rows removed, and partitions
  * rewritten vs total — the discovery scan's column-pruned cost rides
  * the wall number; the REWRITE fraction is the O(touched) witness.
  * Usage: `runMain graft.RetractSoak [sfDir] [factor]` → BASELINE rows.
  */
object RetractSoak {

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
    val hconf = spark.sparkContext.hadoopConfiguration

    val docs = Queries.rd(spark, sfDir, "documents").select("doc_id", "text")
    val scaled = (0 until factor).map { i =>
      docs.select((col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
        regexp_replace(col("text"), "(^|\\s)", s"$$1c${i}_").as("text"))
    }.reduce(_ unionAll _)
    val tmp = java.nio.file.Files.createTempDirectory("retract_soak_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      org.apache.hadoop.fs.FileUtil.fullyDelete(tmp.toFile)
      ()
    }))
    scaled.write.parquet(s"$tmp/documents")
    val corpus = spark.read.parquet(s"$tmp/documents")
    println(s"corpus: ${corpus.count()} docs (factor $factor)")
    val victims = corpus.select("doc_id").orderBy("doc_id")
      .limit(5).collect().map(_.getLong(0)).toSeq

    // per-bp file snapshot: the rewritten-partition counter
    def snapshot(dir: String): Map[String, Set[(String, Long)]] = {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(hconf)
      if (!fs.exists(root)) Map.empty
      else fs.listStatus(root).filter(_.getPath.getName.startsWith("bp="))
        .map { p =>
          p.getPath.getName -> fs.listStatus(p.getPath)
            .filter(_.getPath.getName.endsWith(".parquet"))
            .map(f => (f.getPath.getName, f.getModificationTime)).toSet
        }.toMap
    }

    def drive(variant: String, build: String => Unit): Unit = {
      val store = s"$tmp/store_$variant"
      val t0 = System.nanoTime()
      build(store)
      val buildWall = (System.nanoTime() - t0) / 1e9
      val rowsBefore = spark.read.parquet(store).count()
      val before = snapshot(store)
      val t1 = System.nanoTime()
      val removed = graft.ops.Retract.retract(spark, store, victims)
      val wall = (System.nanoTime() - t1) / 1e9
      val after = snapshot(store)
      val rewritten = before.keySet.count(k =>
        before(k) != after.getOrElse(k, Set.empty[(String, Long)]))
      println(f"$variant: store_rows=$rowsBefore parts=${before.size} " +
        f"build=$buildWall%.1fs retract_wall=$wall%.2fs removed=$removed " +
        f"parts_rewritten=$rewritten " +
        f"rewrite_frac=${rewritten.toDouble / math.max(1, before.size)}%.4f")
    }

    // AUTO geometry (the deployment default): partition count scales
    // with the store, so a fixed-size takedown batch touches a SHRINKING
    // partition fraction as the corpus grows — the claim under test
    drive("exact", s =>
      { graft.ops.IncrementalDedup.exactBatch(corpus, s); () })
    drive("minhash", s =>
      { graft.ops.IncrementalDedup.minhashBatch(corpus, s); () })
    drive("span", s =>
      { graft.ops.IncrementalSpanDedup.spanBatch(corpus, s, w = 20); () })
    // bm25 postings: the doc-keyed discovery + term-partition rewrite
    // (the docs/ half prunes end-to-end; snapshot() reads postings/)
    def snapshotSub(dir: String) = snapshot(s"$dir/postings")
    locally {
      val store = s"$tmp/store_bm25"
      val t0 = System.nanoTime()
      graft.ops.Bm25Index.indexBatch(corpus, store)
      val buildWall = (System.nanoTime() - t0) / 1e9
      val rowsBefore = spark.read.parquet(s"$store/postings").count()
      val before = snapshotSub(store)
      val t1 = System.nanoTime()
      val removed = graft.ops.Retract.retract(spark, store, victims)
      val wall = (System.nanoTime() - t1) / 1e9
      val after = snapshotSub(store)
      val rewritten = before.keySet.count(k =>
        before(k) != after.getOrElse(k, Set.empty[(String, Long)]))
      println(f"bm25: store_rows=$rowsBefore parts=${before.size} " +
        f"build=$buildWall%.1fs retract_wall=$wall%.2fs removed=$removed " +
        f"parts_rewritten=$rewritten " +
        f"rewrite_frac=${rewritten.toDouble / math.max(1, before.size)}%.4f")
    }
    // big-batch takedown (r14 verdict #4): 10k ids in ONE call ride the
    // broadcast-join path (IsinThreshold = 1000) — per-id cost must come
    // in far BELOW the small batch's (amortized across one discovery
    // scan + one staged write) and the plan must not inflate with the id
    // count the way a 10k-term isin predicate tree would
    locally {
      val store = s"$tmp/store_exact" // built above; 5 victims already gone
      val big = corpus.select("doc_id").orderBy("doc_id")
        .limit(10005).collect().map(_.getLong(0)).toSeq.drop(5)
      val before = snapshot(store)
      val t0 = System.nanoTime()
      val removed = graft.ops.Retract.retract(spark, store, big)
      val wall = (System.nanoTime() - t0) / 1e9
      val after = snapshot(store)
      val rewritten = before.keySet.count(k =>
        before(k) != after.getOrElse(k, Set.empty[(String, Long)]))
      println(f"exact_10k_batch: ids=${big.size} retract_wall=$wall%.2fs " +
        f"removed=$removed per_id_ms=${wall * 1000 / big.size}%.3f " +
        f"parts_rewritten=$rewritten/" + before.size +
        f" rewrite_frac=${rewritten.toDouble / math.max(1, before.size)}%.4f")
    }
    spark.stop()
  }
}
