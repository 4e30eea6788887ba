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

  /** The GRAFT_SOAK_ONLY vocabulary. A typo'd value must FAIL the run,
    * not silently skip every family and print an empty battery that
    * reads as a clean run (r15 ADVICE). */
  private[graft] val KnownFamilies =
    Set("text", "emb", "inc", "width", "frag", "cc", "ptr")

  /** The r16 churn race against the SOAK-SCALE index (verdict #5): a
    * stable doc + churn docs sharing its anchor term graft onto the big
    * index, a churner loops retract → re-append (each swap rewrites the
    * anchor partition and takes SECONDS here, so the search loop's 5 s
    * heal escalation and 120 s deadline genuinely engage), and a reader
    * loops searches. The row reports misses (a search that lost the
    * stable doc — must be 0), deadline trips (must be 0: a trip means
    * the 120 s deadline is mis-derived for real swap walls), churn
    * cycles completed, and the search wall distribution. Bounded:
    * `maxSearches` or 5 minutes, whichever first. */
  private def bm25ChurnRaceSoak(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      graftBase: Long, maxSearches: Int = 30): Unit = {
    import spark.implicits._
    // graft ids DERIVED from the corpus max (r18): the r17 constant 9e10
    // sat above factor 100's range but INSIDE factor 1000's (copies
    // step by 1e8, so copy 900 reclaimed it) — the same silent-collision
    // class one magnitude up, caught by the require below at the 1000×
    // attempt. A corpus-derived base cannot re-break at the next factor.
    val stableId = graftBase
    val stable = Seq((stableId, "zanchor zalpha zbeta zgamma"))
    val churnDocs = (graftBase + 100L until graftBase + 120L)
      .map(i => (i, s"zanchor zfiller$i zw$i")).toSeq
    val grafted = ops.Bm25Index.indexBatch(
      (stable ++ churnDocs).toDF("doc_id", "text"), dir)
    require(grafted == 1L + churnDocs.size,
      s"race graft appended $grafted docs — id collision with the corpus?")
    val q = Seq((0L, "zanchor")).toDF("query_id", "query")
    @volatile var stop = false
    @volatile var churnErr: Option[Throwable] = None
    @volatile var cycles = 0
    val churner = new Thread(() => {
      try {
        val df = churnDocs.toDF("doc_id", "text")
        while (!stop) {
          ops.Retract.retract(spark, dir, churnDocs.map(_._1))
          ops.Bm25Index.indexBatch(df, dir)
          cycles += 1
        }
      } catch { case t: Throwable => churnErr = Some(t) }
    }, "bm25-soak-churner")
    churner.start()
    var misses = 0
    var trips = 0
    var walls = List.empty[Double]
    val t0 = System.nanoTime()
    var n = 0
    try {
      while (n < maxSearches && (System.nanoTime() - t0) < 300e9 &&
          churnErr.isEmpty) {
        n += 1
        val s0 = System.nanoTime()
        try {
          val got = ops.Bm25Index.search(spark, dir, q, k = 30)
            .select("doc_id").collect().map(_.getLong(0)).toSet
          if (!got.contains(stableId)) misses += 1
        } catch {
          case e: Exception
              if e.getMessage != null && e.getMessage.contains("waited out") =>
            trips += 1
        }
        walls ::= (System.nanoTime() - s0) / 1e9
      }
    } finally { stop = true; churner.join(300000) }
    // churner-failure check FIRST (r17 ADVICE): if the churner died
    // before the first search iteration, `walls` is empty and the
    // percentile line's IndexOutOfBounds would mask the real cause
    require(churnErr.isEmpty, s"soak churner failed: $churnErr")
    val sorted = walls.sorted
    println(f"bm25_churn_race_soak: searches=$n misses=$misses " +
      f"deadline_trips=$trips churn_cycles=$cycles " +
      f"search_wall_med=${sorted(sorted.size / 2)}%.2fs " +
      f"max=${sorted.last}%.2fs")
    require(misses == 0, s"soak churn race: $misses searches lost the stable doc")
  }

  /** The IVF RECLUSTER churn race at soak scale (r17 verdict #6): the
    * rebuild swaps the ENTIRE assignments+centroids layout — the
    * largest swap window in the codebase, seconds long at 100× — now
    * under the arm sentinel (r18) so the search seqlock observes it.
    * A churner loops append-fresh-vectors → forced rebuild; a reader
    * loops self-queries of a stable corpus vector (its own top-1 must
    * be itself at cosine 1.0 — ANY mixed-generation probe set loses
    * it). Reports misses (must be 0), deadline trips (must be 0), the
    * rebuild cycles completed, recall-probe self-hit rate before and
    * after the race (must both be 1.0), and the search wall
    * distribution against the 120 s deadline. */
  private def ivfRebuildRaceSoak(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      embCorpus: DataFrame, maxSearches: Int = 25): Unit = {
    import spark.implicits._
    val probeRows = embCorpus.orderBy("vec_id").limit(4).collect()
    val stableId = probeRows.head.getLong(0)
    val q = Seq((stableId, probeRows.head.getSeq[Double](1)))
      .toDF("vec_id", "embedding")
    def selfHitRate(): Double = {
      val qs = probeRows.map(r => (r.getLong(0), r.getSeq[Double](1)))
        .toSeq.toDF("vec_id", "embedding")
      val hits = ops.IvfIndex.search(spark, dir, qs, k = 3, nprobe = 4)
        .filter(col("query_id") === col("neighbor_id")).count()
      hits.toDouble / probeRows.length
    }
    val before = selfHitRate()
    // churn-vector ids DERIVED from the corpus max (r18 ADVICE — the
    // same magnitude-constant collision class the bm25 soak fixed: the
    // hardcoded 9e11 base sat above factor 1000's range but INSIDE a
    // factor >= 9000's, where the race would silently degrade to
    // appending nothing)
    val vecBase = embCorpus.agg(max("vec_id")).collect().head.getLong(0) +
      1_000_000L
    val churnVecs = probeRows.zipWithIndex.map { case (r, i) =>
      (vecBase + i, r.getSeq[Double](1))
    }.toSeq
    @volatile var stop = false
    @volatile var churnErr: Option[Throwable] = None
    @volatile var cycles = 0
    val churner = new Thread(() => {
      try {
        val df = churnVecs.toDF("vec_id", "embedding")
        while (!stop) {
          ops.IvfIndex.retract(spark, dir, churnVecs.map(_._1))
          ops.IvfIndex.append(df, dir)
          ops.IvfIndex.rebuild(spark, dir, kmeansIters = 1)
          cycles += 1
        }
      } catch { case t: Throwable => churnErr = Some(t) }
    }, "ivf-soak-churner")
    churner.start()
    var misses = 0
    var trips = 0
    var walls = List.empty[Double]
    val t0 = System.nanoTime()
    var n = 0
    try {
      while (n < maxSearches && (System.nanoTime() - t0) < 300e9 &&
          churnErr.isEmpty) {
        n += 1
        val s0 = System.nanoTime()
        try {
          val got = ops.IvfIndex.search(spark, dir, q, k = 5, nprobe = 4)
            .select("neighbor_id").collect().map(_.getLong(0)).toSet
          if (!got.contains(stableId)) misses += 1
        } catch {
          case e: Exception
              if e.getMessage != null && e.getMessage.contains("waited out") =>
            trips += 1
        }
        walls ::= (System.nanoTime() - s0) / 1e9
      }
    } finally { stop = true; churner.join(300000) }
    require(churnErr.isEmpty, s"ivf soak churner failed: $churnErr")
    val sorted = walls.sorted
    val after = selfHitRate()
    println(f"ivf_rebuild_race_soak: searches=$n misses=$misses " +
      f"deadline_trips=$trips rebuild_cycles=$cycles " +
      f"selfhit_before=$before%.2f after=$after%.2f " +
      f"search_wall_med=${sorted(sorted.size / 2)}%.2fs " +
      f"max=${sorted.last}%.2fs deadline_margin=${120.0 / sorted.last}%.1fx")
    require(before == 1.0 && after == 1.0,
      f"ivf race recall probe moved: before=$before%.2f after=$after%.2f")
    require(misses == 0,
      s"ivf rebuild race: $misses searches lost the stable self-neighbor")
  }

  private[graft] def requireKnownFamily(soakOnly: Option[String]): Unit =
    soakOnly.filterNot(KnownFamilies).foreach(v =>
      sys.error(s"GRAFT_SOAK_ONLY=$v is not a soak family " +
        s"(known: ${KnownFamilies.toSeq.sorted.mkString(", ")})"))

  private final class ShuffleMeter extends SparkListener {
    val writeBytes = new java.util.concurrent.atomic.AtomicLong
    val readBytes = new java.util.concurrent.atomic.AtomicLong
    val peakStageWrite = new java.util.concurrent.atomic.AtomicLong
    val inputRecords = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        val w = m.shuffleWriteMetrics.bytesWritten
        writeBytes.addAndGet(w)
        readBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        inputRecords.addAndGet(m.inputMetrics.recordsRead)
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
      // shuffle files of DEAD shuffles are only freed when the
      // ContextCleaner notices their dependency objects got GC'd — at
      // the default 30 min periodic-GC cadence a multi-family soak
      // retains every prior stage's shuffle on scratch disk (measured:
      // 56 GB of blockmgr at a 100× run — the single biggest term of
      // the "fixture-seeding disk wall"). Tighten the cadence; the
      // between-chunk System.gc() in seedChunked does the same for the
      // chunked seeds.
      .config("spark.cleaner.periodicGC.interval", "2min")
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
        shuffleWriteMB: Double, shuffleReadMB: Double, peakStageWriteMB: Double,
        inputKRec: Long)
    def run(name: String)(df: => DataFrame): Run = {
      spark.catalog.clearCache()
      System.gc()
      val w0 = meter.writeBytes.get; val r0 = meter.readBytes.get
      val i0 = meter.inputRecords.get
      meter.peakStageWrite.set(0)
      val t0 = System.nanoTime()
      val rows = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener bus is async — poll until ALL counters stabilize
      // (outside the timer) before sampling them; a partial sum could
      // exit early on a queued event that moves only readBytes or the
      // peak-write gauge
      var last = -1L; var stable = 0
      // deadline-bounded: background Spark activity (a UI poll, a late
      // speculative task) that keeps ticking ANY counter would otherwise
      // hang the soak forever; past the deadline proceed with the last
      // sample and say so — slightly under-counted beats never-finishing
      val pollDeadline = System.currentTimeMillis() + 30000L
      while (stable < 3 && System.currentTimeMillis() < pollDeadline) {
        Thread.sleep(100)
        val now = meter.writeBytes.get + meter.readBytes.get +
          meter.inputRecords.get + meter.peakStageWrite.get
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      if (stable < 3)
        System.err.println(s"[Soak] $name: listener bus never stabilized " +
          "within 30s — metrics sampled anyway, may be slightly under-counted")
      Run(name, sec, rows,
        (meter.writeBytes.get - w0) / 1e6, (meter.readBytes.get - r0) / 1e6,
        meter.peakStageWrite.get / 1e6,
        (meter.inputRecords.get - i0) / 1000L)
    }

    // GRAFT_SOAK_ONLY=text|emb|inc|width|frag|cc|ptr restricts the
    // battery to ONE family (the others skip) — re-probing a single
    // family at a big factor without paying the whole soak; unset runs
    // everything. A typo'd value must FAIL, not silently skip every
    // family and print an empty run that reads as clean (r15 ADVICE).
    val soakOnly = sys.env.get("GRAFT_SOAK_ONLY")
    Soak.requireKnownFamily(soakOnly)
    def family(name: String)(body: => Seq[Run]): Seq[Run] =
      if (soakOnly.forall(_ == name)) body else Nil

    def dirBytes(path: String): Long = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }
    def dirFiles(path: String): Long = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.getContentSummary(p).getFileCount else 0L
    }
    // --- the 1000× fixture-seeding scratch wall (r18 verdict #3) ------
    // The bound is CUMULATIVE: at 5M docs the inc family's stores sum to
    // ~35 GB of fixtures while the banded-signature seed shuffle adds
    // ~80 GB of scratch — together past this box's disk. Two knobs, both
    // evidence-generation only (operator paths unchanged):
    //  - GRAFT_SOAK_TEARDOWN=1 deletes each store after its last timed
    //    row (bytes captured first, so the report keeps them): residency
    //    becomes max-per-store instead of the sum;
    //  - GRAFT_SOAK_SEED_CHUNKS=N seeds each store in N sequential
    //    id-sliced appends: per-job shuffle drops to ~1/N and the
    //    between-chunk System.gc() lets Spark's ContextCleaner drop the
    //    previous chunk's shuffle files before the next begins.
    val teardown = sys.env.get("GRAFT_SOAK_TEARDOWN").contains("1")
    val seedChunks = sys.env.get("GRAFT_SOAK_SEED_CHUNKS")
      .map(_.toInt).getOrElse(1)
    val capturedBytes = scala.collection.mutable.Map.empty[String, Long]
    def finishStore(name: String, path: String): Unit = if (teardown) {
      capturedBytes(name) = dirBytes(path)
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      System.err.println(s"[soak] teardown: dropped $name " +
        s"(${capturedBytes(name) / 1000000L} MB) after its rows")
    }
    def seedChunked(name: String, src: DataFrame, idCol: String)(
        append: DataFrame => DataFrame): Run =
      if (seedChunks <= 1) run(name)(append(src))
      else run(name) {
        // the timed row covers the WHOLE seed; rows reports the last
        // chunk's batch view only (informational)
        (0 until seedChunks - 1).foreach { i =>
          append(src.filter(pmod(col(idCol), lit(seedChunks)) === i)).count()
          spark.catalog.clearCache(); System.gc()
        }
        append(src.filter(
          pmod(col(idCol), lit(seedChunks)) === (seedChunks - 1)))
      }

    // operator configs mirror the GATE queries exactly (q_dedup_ngram_
    // jaccard / _minhash_lsh / _clusters / _keep), so the curve measures
    // the product constants (dfCap, banding) at scale — the clusters/keep
    // pair graph uses the same two-source stratum the gate uses (the
    // full-corpus threshold-0.01 graph is one giant component at every
    // factor: a degenerate shape that measures fixpoint depth, not dedup)
    val twoSrc = corpus.filter(col("source").isin("src0", "src1"))
    val runs = family("text")(Seq(
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
      },
      // span dedup at the gate geometry (w=10): the token bijection
      // preserves within-copy duplicated windows exactly, so true span
      // count scales linearly — detection (the wh shuffle + broadcast
      // probe) and the full rewrite measured separately
      run("span_dedup_spans") {
        ops.SpanDedup.duplicatedSpans(corpus, w = 10)
      },
      run("span_dedup_rewrite") {
        // reference the rewritten text: a bare count() lets Catalyst
        // eliminate the (aggregated-unique-key) left join and measure
        // an empty plan — the length filter forces the actual cut
        ops.SpanDedup.removeSpans(corpus, w = 10)
          .filter(coalesce(length(col("text")), lit(0)) >= 0)
      },
      // persisted BM25 index (r14): pay the corpus pass ONCE at build,
      // then every search is a pruned read of the query terms'
      // partitions — vs the scan operator's full pass PER SEARCH. The
      // bijected copies make every copy's vocabulary distinct, so the
      // query targets copy 0's terms explicitly; input_krec is the
      // scan-vs-probe witness (search_indexed must stay flat as the
      // corpus scales while search_scan tracks it)
      run("bm25_index_build") {
        import spark.implicits._
        val n = ops.Bm25Index.indexBatch(corpus, s"$tmp/bm25_idx")
        Seq(n).toDF("novel")
      },
      run("bm25_search_scan") {
        import spark.implicits._
        ops.Bm25.search(corpus,
          Seq((0L, "c0_the c0_data c0_query")).toDF("query_id", "query"),
          k = 10)
      },
      run("bm25_search_indexed") {
        import spark.implicits._
        ops.Bm25Index.search(spark, s"$tmp/bm25_idx",
          Seq((0L, "c0_the c0_data c0_query")).toDF("query_id", "query"),
          k = 10)
      },
      // r16 verdict #5: the seqlock churn race AT SOAK SCALE — on this
      // index swap windows are seconds, the regime where the search
      // loop's 5 s escalation and 120 s deadline actually bind (the
      // unit race's toy store swaps in milliseconds and never
      // exercises them). Runs as a side-block between timed rows.
      { bm25ChurnRaceSoak(spark, s"$tmp/bm25_idx",
          graftBase = corpus.agg(max("doc_id")).collect().head.getLong(0)
            + 1_000_000L)
        run("bm25_post_race_search") {
          import spark.implicits._
          // settled-state witness: the same query still answers after
          // the race tore the anchor partition up repeatedly
          ops.Bm25Index.search(spark, s"$tmp/bm25_idx",
            Seq((0L, "zanchor")).toDF("query_id", "query"), k = 10)
        } },
      // curation funnel at the gate config: copy 0 plays the benchmark
      // (every copy's windows biject, so decontamination flags exactly
      // the benchmark copy's 5-gram twins — none across copies); the
      // run returns the SELECTED docs, exercising the whole labeled
      // pass + digest shuffle + budget cumsum in one row
      run("curation_selected") {
        val bench = corpus.filter(col("doc_id") < 100000000L &&
          col("source") === "src0")
        val res = ops.Curation.run(
          corpus.filter(col("doc_id") >= 100000000L ||
            col("source") =!= "src0"),
          ops.Curation.Config(minQuality = 0.4, benchmark = Some(bench),
            decontamN = 5, budgetFraction = Some(0.6)))
        val out = res.docs.select("doc_id", "cum_tokens").localCheckpoint()
        res.release()
        out
      }))

    // --- embedding family: the gate's planted corpus scaled N× --------
    // Per-copy scaling is a deterministic SIGN FLIP per dimension — a
    // diagonal ±1 orthogonal transform: within-copy cosines (and so the
    // 25 planted pairs per copy) are preserved EXACTLY, while cross-copy
    // cosines of even identical source vectors decorrelate to
    // ~N(0, 1/64) — seven sigma below the 0.95 threshold. True pairs
    // therefore scale linearly (25·factor), the vector-domain analogue
    // of the token bijection above.
    val gateEmb = Queries.embeddingGateCorpus(spark, sfDir)
    val scaledEmb = (0 until factor).map { i =>
      gateEmb.select(
        (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        transform(col("embedding"), (x, k) =>
          when(pmod(xxhash64(lit(i), k), lit(2)) === 0, x).otherwise(-x))
          .as("embedding"))
    }.reduce(_ unionAll _)
    val embPath = s"$tmp/embeddings"
    // materialized only for the families that read it (emb + the
    // incremental embedding-store seeds) — a single-family re-probe of
    // text/width/frag/cc must not pay the write
    if (soakOnly.forall(o => o == "emb" || o == "inc"))
      scaledEmb.write.parquet(embPath)
    lazy val embCorpus = spark.read.parquet(embPath)

    // Geometry must SCALE with the corpus: 8 planes = 256 sign-buckets
    // per table, so at fixed geometry a bucket holds 800·factor/256
    // vectors and the bucket self-join grows QUADRATICALLY with factor
    // (measured: 2.2 s at 1×, 23.8 s at 10×, ~40 min at 100× — the run
    // was killed). The production knob is `Similarity.planesFor`:
    // bucket count tracks the corpus so per-bucket density stays
    // bounded, and the per-table recall loss is recovered by the 16
    // independent tables (miss probability at cosine 0.968 stays under
    // ~0.3% through planes=14). The gate query keeps its fixed 8-plane
    // geometry — ITS corpus never scales; this knob is the 100 TB
    // deploy story, exercised here through the same helper a deploy
    // calls.
    val nVecs = 800L * factor // gate corpus = 800 vectors per copy
    val scaledPlanes = ops.Similarity.planesFor(nVecs)
    val embRuns = family("emb")(Seq(
      run("embedding_pairs") {
        ops.Dedup.embeddingNearDupPairs(embCorpus, threshold = 0.95,
          planes = scaledPlanes)
      }) ++
      // fixed gate geometry kept at small factors as the densification
      // yardstick (quadratic: do NOT run at 100×)
      (if (factor <= 10) Seq(run("embedding_pairs_gate_geometry") {
        ops.Dedup.embeddingNearDupPairs(embCorpus, threshold = 0.95)
      }) else Nil) ++
      // SemDeDup over the same corpus: k tracks the corpus through
      // clustersFor so cells stay ~256 vectors and the within-cell pair
      // block is corpus-size-independent per cell; rows = kept docs
      // (≈ corpus − caught planted clones, cell-straddle loss allowed)
      {
        val nEmb = embCorpus.count() // exact corpus size for cell sizing
        val k = ops.SemDedup.clustersFor(nEmb)
        // recall telemetry rides the SAME assignment the dedup uses.
        // Two probes, deliberately side by side (r14 verdict #2): the
        // vector-sampled probe's surviving pairs are clone-heavy and
        // clones co-locate, so it reads 1.0 even at 100× where planted
        // near-dup recall is 75% — the banded PAIR probe samples LSH
        // buckets (pair yield linear in true pairs) and stratifies by
        // cosine band, so the near bands expose the straddler loss the
        // clone band masks
        // SOFT assignment (r16): the banded probe must measure the
        // top-2 pair-formation fence the dedup actually ships, so the
        // straddler fix shows up here as recovered non-clone recall
        val assigned = ops.SemDedup.assignSoft(embCorpus, k).localCheckpoint()
        val probe = ops.SemDedup.recallOfAssignment(assigned, tau = 0.95)
        println(f"semdedup_recall_probe: $probe%.4f (k=$k, sample<=2000; " +
          "vector-sampled, clone-biased — see banded rows)")
        val bands = ops.SemDedup.recallBands(assigned, tau = 0.95)
        bands.foreach(b => println(
          f"semdedup_recall_band[${b.lo}%.4f,${b.hi}%.4f${if (b.isClone) ",clone" else ""}]: " +
            f"${b.recall}%.4f (pairs=${b.pairs} co=${b.coCelled})"))
        println(f"semdedup_neardup_recall: ${ops.SemDedup.nearDupRecall(bands)}%.4f")
        // auto-tuned geometry (r16 verdict #3): derive band/maxProbe
        // from the recall target instead of the hand-tuned constants —
        // the row must hold ≥0.95 at every factor WITHOUT hand tuning
        val t0t = System.nanoTime()
        val tuned = ops.SemDedup.tuneSoft(embCorpus, k, tau = 0.95,
          targetRecall = 0.95)
        println(f"semdedup_autotune: band=${tuned.band}%.4f " +
          f"max_probe=${tuned.maxProbe} recall=${tuned.recall}%.4f " +
          f"rungs=${tuned.rungsProbed} wall=${(System.nanoTime() - t0t) / 1e9}%.1fs")
        Seq(run("semdedup_keep") {
          ops.SemDedup.dedup(embCorpus, nClusters = k, tau = 0.95)
        })
      } ++
      // r17 verdict #6: the IVF RECLUSTER churn race at soak scale —
      // the rebuild's whole-layout swap runs seconds here, the regime
      // where the arm sentinel + seqlock actually bind. Build a soak
      // index, race searches against forced append→rebuild cycles,
      // then a settled-state witness row.
      {
        val ivfDir = s"$tmp/ivf_idx"
        val nEmb2 = embCorpus.count()
        ops.IvfIndex.build(embCorpus, ivfDir,
          nlist = ops.SemDedup.clustersFor(nEmb2), kmeansIters = 1)
        ivfRebuildRaceSoak(spark, ivfDir, embCorpus)
        Seq(run("ivf_post_race_search") {
          import spark.implicits._
          val p = embCorpus.orderBy("vec_id").limit(1).collect().head
          ops.IvfIndex.search(spark, ivfDir,
            Seq((p.getLong(0), p.getSeq[Double](1)))
              .toDF("vec_id", "embedding"), k = 5, nprobe = 4)
        })
      })

    // --- incremental store growth: seed at N×, then SMALL appends -----
    // The claim under test is the partitioned-store contract: an
    // append's scan cost is bounded by its TOUCHED bp partitions, not
    // the store. Seeding the store with the full N× corpus is the
    // O(corpus) batch (its cost rightly grows with factor); the 2-doc
    // appends that follow touch ≤ 32 bucket keys → ~12% of the 256
    // partitions, so their `input_krec` must stay ~an eighth of the
    // store across factors where the pre-fix full rescan read 100%
    // (pruning granularity is store-partitions; StoreParts is the
    // deploy knob that drives the fraction toward zero at real scale).
    // Append content duplicates copy 0's docs/vectors under FRESH ids,
    // so each append also proves the path end-to-end: rows > 0 — the
    // appended items pair with their corpus twins (and with the prior
    // append's stored rows).
    // fresh append ids sit at 1e12 — far above ANY copy's id range
    // (copy i adds i*1e8; factor 100 tops out near 1e10). An id that
    // collides with a stored doc makes the idempotency anti-join treat
    // the append as a retry and silently drop its rows — exactly what
    // a 9e8 base did at factor>=10 (copy 9's raw doc 1000 = 900001000).
    val mhStore = s"$tmp/mh_store"
    val ngStore = s"$tmp/ng_store"
    val baseDocs = docs.filter(col("doc_id") < 2)
    def freshDocs(tag: Int): DataFrame = baseDocs.select(
      (col("doc_id") + lit(1000000000000L + tag * 1000L)).as("doc_id"),
      regexp_replace(col("text"), "(^|\\s)", "$1c0_").as("text"))
    val embStore = s"$tmp/emb_store"
    val embSplitStore = s"$tmp/emb_store_split_inc"
    val baseVecs = gateEmb.filter(col("vec_id") < 2)
    def freshVecs(tag: Int): DataFrame = baseVecs.select(
      (col("vec_id") + lit(2000000000000L + tag * 1000L)).as("vec_id"),
      transform(col("embedding"), (x, k) =>
        when(pmod(xxhash64(lit(0), k), lit(2)) === 0, x).otherwise(-x))
        .as("embedding"))
    val incRuns = family("inc")(Seq(
      seedChunked("inc_minhash_seed", corpus, "doc_id") { b =>
        ops.IncrementalDedup.minhashBatch(b, mhStore)
      },
      run("inc_minhash_append_a") {
        ops.IncrementalDedup.minhashBatch(freshDocs(1), mhStore)
      },
      { val r = run("inc_minhash_append_b") {
          ops.IncrementalDedup.minhashBatch(freshDocs(2), mhStore)
        }
        finishStore("mh_store", mhStore); r },
      // posting-list store (late r12): a text doc touches ~one bucket
      // PER DISTINCT GRAM (~100), not ~16 band keys — so pruning leans
      // on auto geometry: the N× seed sizes the store to ~rows/4Ki
      // partitions (2048 at factor 10) and a 2-doc append touches
      // ~200 of them (~10%), where a hand-fixed 256 would scan ~80%
      seedChunked("inc_ngram_seed", corpus, "doc_id") { b =>
        ops.IncrementalDedup.ngramBatch(b, ngStore, n = 3, threshold = 0.8)
      },
      run("inc_ngram_append_a") {
        ops.IncrementalDedup.ngramBatch(freshDocs(3), ngStore,
          n = 3, threshold = 0.8)
      },
      run("inc_ngram_append_b") {
        ops.IncrementalDedup.ngramBatch(freshDocs(4), ngStore,
          n = 3, threshold = 0.8)
      },
      // NOVEL-text append (r13): tokens bijected to a prefix no copy
      // uses, so every gram of the batch MISSES the store's bloom
      // sidecar — the pruned scans drop to near zero where the
      // duplicate-content appends above rightly scan their ~100
      // touched buckets. This is the common ingest case (most arriving
      // documents are new), and the bloom's whole payoff
      { val r = run("inc_ngram_append_novel") {
          ops.IncrementalDedup.ngramBatch(
            baseDocs.select(
              (col("doc_id") + lit(1500000000000L)).as("doc_id"),
              regexp_replace(col("text"), "(^|\\s)", "$1z9novel_").as("text")),
            ngStore, n = 3, threshold = 0.8)
        }
        finishStore("ng_store", ngStore); r },
      // window store (late r13): ~one stored row per corpus token (the
      // posting trade), auto geometry sizes partitions from the seed's
      // window count; a 2-doc append touches ~one bucket per window
      // (~180 for two ~100-token docs), so the pruned scans stay a
      // bounded store fraction while the seed rightly grows with N×.
      // The two appends measure both probe outcomes: all-hit (c0_
      // content — the corpus carries the same bijection) and all-miss
      seedChunked("inc_span_seed", corpus, "doc_id") { b =>
        ops.IncrementalSpanDedup.spanBatch(b, s"$tmp/span_store", w = 10)
      },
      run("inc_span_append_dup") {
        // copy-0 content under fresh ids (freshDocs applies the same
        // c0_ bijection the corpus carries): every window duplicates a
        // stored keeper — the all-hit path
        ops.IncrementalSpanDedup.spanBatch(
          freshDocs(9), s"$tmp/span_store", w = 10)
      },
      { val r = run("inc_span_append_novel") {
          // tokens bijected to a prefix no copy uses — every window
          // misses the store; scans stay bounded by touched partitions
          ops.IncrementalSpanDedup.spanBatch(
            baseDocs.select(
              (col("doc_id") + lit(1700000000000L)).as("doc_id"),
              regexp_replace(col("text"), "(^|\\s)", "$1z9span_").as("text")),
            s"$tmp/span_store", w = 10)
        }
        finishStore("span_store", s"$tmp/span_store"); r },
      // scaled planes here too (the seed batch is the same bucket
      // self-join); the store manifest then holds them for every append
      seedChunked("inc_embedding_seed", embCorpus, "vec_id") { b =>
        ops.IncrementalDedup.embeddingBatch(b, embStore,
          planes = scaledPlanes)
      },
      run("inc_embedding_append_a") {
        ops.IncrementalDedup.embeddingBatch(freshVecs(1), embStore,
          planes = scaledPlanes)
      },
      { val r = run("inc_embedding_append_b") {
          ops.IncrementalDedup.embeddingBatch(freshVecs(2), embStore,
            planes = scaledPlanes)
        }
        finishStore("emb_store", embStore); r },
      // split-layout twin (late r12): same contract, but appends also
      // exercise the pruned forward-index fetch. Measured trade at 10×:
      // record counts read are similar to inline (the posting rows are
      // vector-FREE, so bytes are far lower at similar krec) while wall
      // pays the extra checkpoint + vp-collect + fetch shuffle — split
      // is the at-rest/footprint choice (~10× smaller store), inline
      // the per-append-latency choice
      seedChunked("inc_embedding_split_seed", embCorpus, "vec_id") { b =>
        ops.IncrementalDedup.embeddingBatch(b, embSplitStore,
          planes = scaledPlanes, layout = "split")
      },
      run("inc_embedding_split_append_a") {
        ops.IncrementalDedup.embeddingBatch(freshVecs(3), embSplitStore,
          planes = scaledPlanes)
      },
      { val r = run("inc_embedding_split_append_b") {
          ops.IncrementalDedup.embeddingBatch(freshVecs(4), embSplitStore,
            planes = scaledPlanes)
        }
        finishStore("emb_store_split_inc", embSplitStore); r }))

    // --- store footprint: bytes at rest, float vs double width --------
    // The incremental embedding store adopts the SOURCE width (r12):
    // seed one store from the raw float embeddings table and one from
    // the same vectors upcast to double — identical geometry, identical
    // pairs — and report bytes. The f32 store should run ~2× smaller;
    // at 100 TB that halves the store scan AND the bucket-join shuffle.
    val rawEmb = Queries.rd(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val f32Store = s"$tmp/emb_store_f32"
    val f64Store = s"$tmp/emb_store_f64"
    val splitStore = s"$tmp/emb_store_split"
    val widthRuns = family("width")(Seq(
      run("inc_embedding_seed_f32") {
        ops.IncrementalDedup.embeddingBatch(rawEmb, f32Store)
      },
      run("inc_embedding_seed_f64") {
        ops.IncrementalDedup.embeddingBatch(
          rawEmb.select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("embedding")),
          f64Store)
      },
      // split layout (late r12): each vector stored once instead of
      // riding all 16 bucket rows — report bytes against the inline f32
      // twin above (same source, same geometry constants)
      run("inc_embedding_seed_split") {
        ops.IncrementalDedup.embeddingBatch(rawEmb, splitStore,
          layout = "split")
      }))

    // --- fragmentation: N appends with vs without auto-compaction -----
    // The claim: compactFiles bounds files-per-partition (and so the
    // file-open cost every later scan pays) at a constant, where the
    // uncompacted store grows one file per touched partition per append
    // — the probe append at the end must not get slower with N on the
    // auto side. 24 single-doc appends, threshold 6.
    val fragAuto = s"$tmp/frag_auto"
    val fragOff = s"$tmp/frag_off"
    // 64 novel docs per append: wide enough to touch most of the
    // 32-part gate-floor store every time, so files-per-partition grows
    // one-per-append on the uncompacted side
    val fragBase = docs.filter(col("doc_id") < 64)
    def fragBatch(tag: Int): DataFrame = fragBase.select(
      (col("doc_id") + lit(3000000000000L + tag * 1000L)).as("doc_id"),
      regexp_replace(col("text"), "(^|\\s)", s"$$1f${tag}_").as("text"))
    if (soakOnly.forall(_ == "frag")) (0 until 24).foreach { i =>
      ops.IncrementalDedup.exactBatch(fragBatch(i), fragAuto,
        compactFiles = 6)
      ops.IncrementalDedup.exactBatch(fragBatch(i), fragOff)
    }
    val fragRuns = family("frag")(Seq(
      run("frag_probe_append_auto") {
        ops.IncrementalDedup.exactBatch(fragBatch(900), fragAuto,
          compactFiles = 6)
      },
      run("frag_probe_append_off") {
        ops.IncrementalDedup.exactBatch(fragBatch(900), fragOff)
      }))

    // --- incremental clustering: the pair stream's downstream ---------
    // The N×-scaled near-dup pair graph arrives in two hash-split
    // batches; the claims under test are (a) per-batch cost tracks the
    // BATCH's graph, not the store, (b) cross-batch merges cost
    // O(dethroned roots) in the log, and (c) the resolved read and the
    // post-compact read stay cheap as the store grows.
    val ccPairsPath = s"$tmp/cc_pairs"
    // one of the soak's most expensive jobs — cc-family only
    if (soakOnly.forall(_ == "cc"))
      ops.Dedup.ngramJaccardPairs(twoSrc, n = 3, threshold = 0.01)
        .write.parquet(ccPairsPath)
    lazy val ccPairs = spark.read.parquet(ccPairsPath)
    val ccStore = s"$tmp/cc_store"
    // parity split, not hash: batch A sees only odd-id left endpoints,
    // so clusters whose true min id is EVEN get a temporary odd
    // canonical that batch B must dethrone — the merge path runs at
    // corpus scale, not just in the unit tests
    val ccSplit = pmod(col("doc_a"), lit(2))
    val ccRuns = family("cc")(Seq(
      run("inc_clusters_batch_a") {
        ops.IncrementalComponents.addPairs(ccPairs.filter(ccSplit === 1), ccStore)
      },
      run("inc_clusters_batch_b") {
        ops.IncrementalComponents.addPairs(ccPairs.filter(ccSplit === 0), ccStore)
      },
      run("inc_clusters_labels") {
        ops.IncrementalComponents.labels(spark, ccStore)
      }, {
        val folded = ops.IncrementalComponents.compact(spark, ccStore)
        System.err.println(s"[soak] clusters compact folded $folded rows")
        run("inc_clusters_labels_compacted") {
          ops.IncrementalComponents.labels(spark, ccStore)
        }
      }) ++ {
      // small-append cadence (r13 verdict #6): with the store holding
      // the full N× graph, a small batch's absorb cost must track the
      // BATCH's endpoints (pruned label-partition reads), not the store.
      // Batch content: 50 of the corpus pairs with doc_a remapped to a
      // fresh id — each fresh vertex attaches to an EXISTING cluster
      // through its stored doc_b endpoint. The "low" batch uses fresh
      // ids BELOW every stored id, so each attach also dethrones the
      // cluster's canonical — the merge path, at store scale.
      val ccSeed = ccPairs.orderBy("doc_a", "doc_b").limit(50)
        .localCheckpoint()
      def ccAttach(base: Long, tag: Int): DataFrame = ccSeed.select(
        (monotonically_increasing_id() + lit(base + tag * 1000L)).as("doc_a"),
        col("doc_b"))
      Seq(
        run("inc_clusters_append_attach") {
          ops.IncrementalComponents.addPairs(ccAttach(4000000000000L, 1), ccStore)
        },
        run("inc_clusters_append_dethrone") {
          // negative fresh ids: strictly below every stored id, so every
          // touched cluster's canonical is replaced -> merge log rows
          ops.IncrementalComponents.addPairs(ccAttach(-9000000000000L, 2), ccStore)
        },
        run("inc_clusters_labels_after_appends") {
          ops.IncrementalComponents.labels(spark, ccStore)
        })
    })

    // --- pointer-GC churn soak (r18 verdict #4) ------------------------
    // The bm25 churn race on a RENAME-LESS scheme at soak scale: every
    // retraction swap commits by pointer flip, so the race also measures
    // the pointer layer's GC cadence — generations per partition must
    // stay bounded by the one-cycle grace window (live + at most one
    // prev), the sweep must cost O(superseded dirs), and the search
    // walls must stay inside the progress-deadline margin.
    val ptrRuns = family("ptr") {
      spark.sparkContext.hadoopConfiguration.set("fs.mock.impl",
        classOf[graft.fs.MockRemoteFileSystem].getName)
      // latency-shaped mock (r19 verdict #9): the raw mock answers
      // metadata ops at local-disk speed, so race margins and GC
      // cadence numbers carried local timing. GRAFT_SOAK_MOCK_LATENCY
      // ("put=25,list=50", ms) injects object-store-shaped latency into
      // every PUT-shaped mutation and LIST/HEAD on the mock scheme —
      // the churn race and sweep below then measure against it.
      // Driver-side ops read the live conf; executor tasks snapshot it
      // at job submit, after this point.
      sys.env.get("GRAFT_SOAK_MOCK_LATENCY").foreach { s =>
        val kv = s.split(",").iterator.map(_.split("=", 2))
          .collect { case Array(k, v) => k.trim -> v.trim.toLong }.toMap
        spark.sparkContext.hadoopConfiguration.setLong(
          "fs.mock.latency.put.ms", kv.getOrElse("put", 0L))
        spark.sparkContext.hadoopConfiguration.setLong(
          "fs.mock.latency.list.ms", kv.getOrElse("list", 0L))
        println(s"[ptr] mock latency enabled: $kv")
      }
      val ptrIdx = s"mock://$tmp/bm25_ptr_idx"
      val buildRow = run("ptr_bm25_index_build") {
        import spark.implicits._
        Seq(ops.Bm25Index.indexBatch(corpus, ptrIdx)).toDF("novel")
      }
      bm25ChurnRaceSoak(spark, ptrIdx,
        graftBase = corpus.agg(max("doc_id")).collect().head.getLong(0)
          + 2_000_000L)
      // GC cadence audit over BOTH pointer stores the race churned
      val fsm = new org.apache.hadoop.fs.Path(ptrIdx)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq("postings", "docs").foreach { rel =>
        val root = new org.apache.hadoop.fs.Path(s"$ptrIdx/$rel")
        graft.fs.PartitionPointer.readPtr(fsm, root).foreach { ptr =>
          val partsRoot = new org.apache.hadoop.fs.Path(root, "_parts")
          val gens =
            if (!fsm.exists(partsRoot)) Seq(0)
            else fsm.listStatus(partsRoot).toIndexedSeq.map(pd =>
              fsm.listStatus(pd.getPath)
                .count(_.getPath.getName.startsWith("pv=")))
          val maxGen = if (gens.isEmpty) 0 else gens.max
          // superseded dirs awaiting the grace sweep
          val pending = ptr.entries.values.count(_.prev !=
            graft.fs.PartitionPointer.NoPrev)
          val s0 = System.nanoTime()
          graft.fs.StoreLock.withLock(ptrIdx,
            spark.sparkContext.hadoopConfiguration) {
            ops.Retract.sweep(spark, s"$ptrIdx/$rel")
          }
          val sweepSec = (System.nanoTime() - s0) / 1e9
          println(f"pointer_churn_soak[$rel]: seq=${ptr.seq} " +
            f"entries=${ptr.entries.size} max_generations=$maxGen " +
            f"grace_pending=$pending sweep_sec=$sweepSec%.2f")
          require(maxGen <= 2,
            s"$rel: $maxGen generations on disk for one partition — the " +
              "grace window leaked past one cycle")
        }
      }
      Seq(buildRow,
        run("ptr_post_race_search") {
          import spark.implicits._
          ops.Bm25Index.search(spark, ptrIdx,
            Seq((0L, "zanchor")).toDF("query_id", "query"), k = 10)
        })
    }

    val storeFiles =
      Seq("frag_auto" -> fragAuto, "frag_off" -> fragOff)
        .map { case (n, p) => s""""$n":${dirFiles(p)}""" }
        .mkString("{", ",", "}")
    val storeBytes =
      Seq("mh_store" -> mhStore, "ng_store" -> ngStore,
        "emb_store" -> embStore,
        "emb_store_f32" -> f32Store, "emb_store_f64" -> f64Store,
        "emb_store_split" -> splitStore,
        "emb_store_split_vectors" -> s"$splitStore/vectors",
        "emb_store_split_inc" -> embSplitStore,
        "cc_store" -> ccStore,
        "cc_store_merge_log" -> s"$ccStore/merges",
        "span_store" -> s"$tmp/span_store",
        "bm25_idx" -> s"$tmp/bm25_idx")
        // teardown mode captured each store's bytes before dropping it
        .map { case (n, p) =>
          s""""$n":${capturedBytes.getOrElse(n, dirBytes(p))}""" }
        .mkString("{", ",", "}")

    val json = (runs ++ embRuns ++ incRuns ++ widthRuns ++ fragRuns ++
      ccRuns ++ ptrRuns).map(r =>
      s"""{"op":"${r.name}","sec":${f"${r.sec}%.2f"},"rows":${r.rows},""" +
        s""""shuffle_write_mb":${f"${r.shuffleWriteMB}%.1f"},""" +
        s""""shuffle_read_mb":${f"${r.shuffleReadMB}%.1f"},""" +
        s""""peak_stage_write_mb":${f"${r.peakStageWriteMB}%.1f"},""" +
        s""""input_krec":${r.inputKRec}}""")
      .mkString("[", ",", "]")
    println(s"""{"soak":{"sf":"$sfDir","factor":$factor,"n_docs":$nDocs,"store_bytes":$storeBytes,"store_files":$storeFiles,"runs":$json}}""")
    spark.stop()
  }
}
