package graft.streaming

import java.nio.file.Files

import graft.SparkSuite
import graft.ops.{Redaction, TextAnalysis}
import org.apache.spark.sql.functions._

/** The curation column expressions (profile, redaction, repetition,
  * sketches) are stateless projections, so they must run UNCHANGED in
  * Structured Streaming — the property that lets one pipeline definition
  * serve both the backfill (batch) and the live feed. This spec drives
  * the real streaming engine (file source → memory sink) and checks
  * stream output equals the batch computation on the same rows. */
class StreamingCurationSpec extends SparkSuite {

  private lazy val docsDir: String = {
    val dir = Files.createTempDirectory("curstream").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def readDocsStream() =
    spark.readStream
      .schema(spark.read.parquet(docsDir).schema)
      .parquet(docsDir)

  test("text profile and repetition stream unchanged (batch = stream)") {
    val curated = TextAnalysis.profile(readDocsStream())
      .join(TextAnalysis.repetitionProfile(readDocsStream()), "doc_id")
    EventStreams.runToMemory(curated, "cur_profile")
    val got = spark.table("cur_profile").orderBy("doc_id")
      .collect().map(_.toString)
    val want = TextAnalysis.profile(spark.read.parquet(docsDir))
      .join(TextAnalysis.repetitionProfile(spark.read.parquet(docsDir)), "doc_id")
      .orderBy("doc_id").collect().map(_.toString)
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }

  test("incremental dedup streams against the persisted store (micro-batch = batch)") {
    import spark.implicits._
    val work = Files.createTempDirectory("incstream").toString
    // two source files with duplicates WITHIN and ACROSS them; file
    // source + maxFilesPerTrigger=1 -> one micro-batch per file
    Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$work/in/f1")
    Seq((10L, "beta"), (11L, "gamma"), (12L, "gamma"))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$work/in/f2")
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in/*")
    val q = graft.ops.IncrementalDedup.exactStream(
      stream, s"$work/store", s"$work/out", s"$work/ckpt")
    try q.processAllAvailable() finally q.stop()
    val out = spark.read.parquet(s"$work/out")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("digest"),
        Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong)))
    // every doc verdicted exactly once
    assert(out.map(_._1).sorted.toSeq == Seq(1L, 2L, 3L, 10L, 11L, 12L))
    // ONE keeper per distinct content across the whole stream, and every
    // duplicate points at its digest's keeper — batch-boundary-independent
    val keepers = out.filter(_._3.isEmpty).groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(keepers.values.forall(_.length == 1), keepers)
    out.filter(_._3.nonEmpty).foreach { case (id, digest, Some(dupOf)) =>
      assert(keepers(digest).head == dupOf, s"doc $id dup_of $dupOf")
    }
    // the store ends with exactly one keeper row per distinct content
    val store = spark.read.parquet(s"$work/store")
    assert(store.count() == 3 &&
      store.select("digest").distinct().count() == 3)
  }

  test("minhash near-dup streaming equals the full-corpus pair set") {
    import spark.implicits._
    val work = Files.createTempDirectory("mhstream").toString
    val base = "the quick brown fox jumps over the lazy dog and runs far away " +
      "into the deep green forest while birds sing songs above the tall trees"
    val near = base.replace("lazy dog", "sleepy dog")
    val far = "completely different text about spark shuffles partitions " +
      "joins aggregates windows and the catalyst optimizer pipeline stages"
    val f1 = Seq((0L, base), (1L, base), (3L, far))
    val f2 = Seq((2L, near), (4L, "the " + base))
    f1.toDF("doc_id", "text").coalesce(1).write.parquet(s"$work/in/f1")
    f2.toDF("doc_id", "text").coalesce(1).write.parquet(s"$work/in/f2")
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in/*")
    val q = graft.ops.IncrementalDedup.minhashStream(
      stream, s"$work/store", s"$work/out", s"$work/ckpt", threshold = 0.5)
    try q.processAllAvailable() finally q.stop()
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("est_jaccard"))).toSet
    // stream union over micro-batches = full-corpus batch pairs,
    // whatever the file->batch assignment was
    val got = pairs(spark.read.parquet(s"$work/out"))
    val want = pairs(graft.ops.Dedup.minhashLshPairs(
      (f1 ++ f2).toDF("doc_id", "text"), threshold = 0.5))
    assert(got == want)
    assert(want.exists(p => p._1 == 0L && p._2 == 1L)) // non-vacuous
  }

  test("ngram near-dup streaming equals the full-corpus pair set") {
    import spark.implicits._
    val work = Files.createTempDirectory("ngstream").toString
    val base = "the quick brown fox jumps over the lazy dog and runs far away " +
      "into the deep green forest while birds sing songs above the tall trees"
    val far = "completely different text about spark shuffles partitions " +
      "joins aggregates windows and the catalyst optimizer pipeline stages"
    val f1 = Seq((0L, base), (1L, base), (3L, far))
    val f2 = Seq((2L, base.replace("lazy dog", "sleepy dog")), (4L, "the " + base))
    f1.toDF("doc_id", "text").coalesce(1).write.parquet(s"$work/in/f1")
    f2.toDF("doc_id", "text").coalesce(1).write.parquet(s"$work/in/f2")
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in/*")
    val q = graft.ops.IncrementalDedup.ngramStream(
      stream, s"$work/store", s"$work/out", s"$work/ckpt", threshold = 0.5)
    try q.processAllAvailable() finally q.stop()
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_common"), r.getAs[Double]("jaccard"))).toSet
    // stream union over micro-batches = full-corpus batch pairs,
    // count-exact, whatever the file->batch assignment was
    val got = pairs(spark.read.parquet(s"$work/out"))
    val want = pairs(graft.ops.Dedup.ngramJaccardPairs(
      (f1 ++ f2).toDF("doc_id", "text"), threshold = 0.5))
    assert(got == want)
    assert(want.exists(p => p._1 == 0L && p._2 == 1L && p._4 == 1.0))
    assert(want.exists(p => p._1 == 0L && p._2 == 4L)) // cross-batch
  }

  test("simhash near-dup streaming equals the full-corpus pair set") {
    import spark.implicits._
    val work = Files.createTempDirectory("shstream").toString
    val base = "the quick brown fox jumps over the lazy dog and runs far away " +
      "into the deep green forest while birds sing songs above the tall trees"
    val far = "completely different text about spark shuffles partitions " +
      "joins aggregates windows and the catalyst optimizer pipeline stages"
    // doc 4 repeats base in the second file: a guaranteed hamming-0
    // cross-micro-batch pair through the store
    val f1 = Seq((0L, base), (1L, base), (3L, far))
    val f2 = Seq((2L, base.replace("lazy dog", "sleepy dog")), (4L, base))
    f1.toDF("doc_id", "text").coalesce(1).write.parquet(s"$work/in/f1")
    f2.toDF("doc_id", "text").coalesce(1).write.parquet(s"$work/in/f2")
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in/*")
    val q = graft.ops.IncrementalDedup.simhashStream(
      stream, s"$work/store", s"$work/out", s"$work/ckpt")
    try q.processAllAvailable() finally q.stop()
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming"))).toSet
    // stream union over micro-batches = full-corpus batch pairs,
    // whatever the file->batch assignment was
    val got = pairs(spark.read.parquet(s"$work/out"))
    val want = pairs(graft.ops.Dedup.simhashPairs(
      (f1 ++ f2).toDF("doc_id", "text")))
    assert(got == want)
    assert(Set((0L, 1L, 0L), (0L, 4L, 0L)).subsetOf(want)) // non-vacuous
  }

  test("embedding near-dup streaming equals the full-corpus pair set") {
    import spark.implicits._
    val work = Files.createTempDirectory("embstream").toString
    // 8-dim vectors: {0,1} near-identical within f1; 3 (in f2) near 0
    // (cross-batch pair through the store); 2 and 4 far from everything
    val f1 = Seq(
      (0L, Array(1.0, 0.10, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (1L, Array(1.0, 0.12, 0.01, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (2L, Array(0.0, 0.0, 1.0, 0.2, 0.0, 0.0, 0.0, 0.0)))
    val f2 = Seq(
      (3L, Array(0.99, 0.11, 0.0, 0.0, 0.01, 0.0, 0.0, 0.0)),
      (4L, Array(0.0, 1.0, 0.0, 0.0, 0.5, 0.0, 0.0, 0.0)))
    f1.toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$work/in/f1")
    f2.toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$work/in/f2")
    val stream = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<DOUBLE>")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in/*")
    val q = graft.ops.IncrementalDedup.embeddingStream(
      stream, s"$work/store", s"$work/out", s"$work/ckpt", threshold = 0.95)
    try q.processAllAvailable() finally q.stop()
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cosine"))).toSet
    // stream union over micro-batches = full-corpus batch pairs,
    // whatever the file->batch assignment was
    val got = pairs(spark.read.parquet(s"$work/out"))
    val want = pairs(graft.ops.Dedup.embeddingNearDupPairs(
      (f1 ++ f2).toDF("vec_id", "embedding"), threshold = 0.95))
    assert(got == want)
    // non-vacuous: a within-batch and a cross-batch pair both found
    assert(want.exists(p => p._1 == 0L && p._2 == 1L))
    assert(want.exists(p => p._1 == 0L && p._2 == 3L))
  }

  test("redaction and sketch expressions stream unchanged (batch = stream)") {
    def shape(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Dedup.simhash(df)
        .join(df.select(col("doc_id"),
          Redaction.redact(col("text")).as("masked")), "doc_id")
    EventStreams.runToMemory(shape(readDocsStream()), "cur_sketch")
    val got = spark.table("cur_sketch").orderBy("doc_id")
      .collect().map(_.toString)
    val want = shape(spark.read.parquet(docsDir))
      .orderBy("doc_id").collect().map(_.toString)
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }

  test("curation funnel streams against the exact store (epoch union = batch)") {
    import spark.implicits._
    val work = Files.createTempDirectory("curfunnelstream").toString
    val good =
      "the cat and the dog is in the park today and it is warm out there"
    val good2 =
      "a quiet morning walk by the river is the best start to any day here"
    val leaky =
      "the secret eval question about the old castle is hidden in this " +
        "training document with the usual padding around it"
    val bench = Seq(
      (100L, "the secret eval question about the old castle is hidden"))
      .toDF("doc_id", "text")
    // ascending doc_id epochs (the parity precondition): in-epoch dup,
    // cross-epoch dup, quality fail, contaminated doc, NULL text
    val e1 = Seq((1L, Some(good)), (2L, Some(good)), (3L, Some("z!!")))
    val e2 = Seq((10L, Some(good)), (11L, Some(leaky)),
      (12L, Some(good2)), (13L, None: Option[String]))
    e1.toDF("doc_id", "text").coalesce(1).write.parquet(s"$work/in/f1")
    e2.toDF("doc_id", "text").coalesce(1).write.parquet(s"$work/in/f2")
    val cfg = graft.ops.Curation.Config(
      minQuality = 0.4, benchmark = Some(bench), decontamN = 3)
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in/*")
    val q = graft.ops.Curation.stream(
      stream, s"$work/store", s"$work/out", s"$work/ckpt", cfg)
    try q.processAllAvailable() finally q.stop()
    // batch truth over the union
    val res = graft.ops.Curation.run((e1 ++ e2).toDF("doc_id", "text"), cfg)
    val wantDocs = res.docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val wantDrops = res.funnel.collect()
      .map(r => r.getString(1) -> (r.getLong(2) - r.getLong(3))).toMap
    res.release()
    // stream: epoch survivors union = batch survivors
    val gotDocs = spark.read.parquet(s"$work/out/docs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotDocs == wantDocs, s"stream $gotDocs vs batch $wantDocs")
    // per-stage drops sum across epochs to the batch funnel's
    val gotDrops = spark.read.parquet(s"$work/out/funnel")
      .groupBy("stage").agg(
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("docs_in") -
            org.apache.spark.sql.functions.col("docs_out")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotDrops == wantDrops, s"stream $gotDrops vs batch $wantDrops")
    // budget configs / store-less near-dup configs are rejected loudly
    intercept[IllegalArgumentException] {
      graft.ops.Curation.stream(stream, s"$work/store2", s"$work/out2",
        s"$work/ckpt2", cfg.copy(budget = Some(10L)))
    }
    intercept[IllegalArgumentException] {
      graft.ops.Curation.stream(stream, s"$work/store3", s"$work/out3",
        s"$work/ckpt3", cfg.copy(nearDup = Some(0.8)))
    }
  }

  test("streaming near-dup stage: epoch union = batch funnel incl. its drops (r15 #5)") {
    import spark.implicits._
    val work = Files.createTempDirectory("curneardupstream").toString
    // long distinct sentences; a near-dup is its base with ONE word
    // appended (word-3-gram jaccard ≈ 0.9 — above the 0.8 threshold
    // where the batch stage's LSH blocking recall is 1, so both the
    // batch LSH-blocked pass and the stream's ngram store find the
    // SAME pair set and parity is exact, not statistical)
    def sent(tag: String): String =
      (1 to 16).map(i => s"${tag}w$i").mkString(" ")
    val baseA = sent("a"); val baseB = sent("b")
    val nearA = baseA + " extraone"       // cross-epoch pair with doc 1
    val nearA2 = baseA + " extratwo"      // 3-member component {1,11,12}
    val nearB = baseB + " extrathree"     // in-epoch pair {13, 14}
    // ascending doc_id epochs (the parity precondition): epoch 1 seeds
    // the keepers, epoch 2 carries a cross-epoch near-dup, a component
    // chain, an in-epoch near pair, an exact dup, and a quality fail
    val e1 = Seq((1L, Some(baseA)), (2L, Some(sent("c"))), (3L, Some("z!!")))
    val e2 = Seq((10L, Some(baseA)),            // exact dup of 1
      (11L, Some(nearA)), (12L, Some(nearA2)),  // near-dups of keeper 1
      (13L, Some(baseB)), (14L, Some(nearB)),   // in-epoch near pair
      (15L, Some(sent("d"))))                   // clean survivor
    e1.toDF("doc_id", "text").coalesce(1).write.parquet(s"$work/in/f1")
    e2.toDF("doc_id", "text").coalesce(1).write.parquet(s"$work/in/f2")
    val cfg = graft.ops.Curation.Config(
      minQuality = 0.4, nearDup = Some(0.8), nearDupN = 3)
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in/*")
    val q = graft.ops.Curation.stream(
      stream, s"$work/store", s"$work/out", s"$work/ckpt", cfg,
      nearDupStores = Some((s"$work/ngstore", s"$work/ccstore")))
    try q.processAllAvailable() finally q.stop()
    val res = graft.ops.Curation.run((e1 ++ e2).toDF("doc_id", "text"), cfg)
    val wantDocs = res.docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val wantDrops = res.funnel.collect()
      .map(r => r.getString(1) -> (r.getLong(2) - r.getLong(3))).toMap
    res.release()
    val gotDocs = spark.read.parquet(s"$work/out/docs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotDocs == wantDocs, s"stream $gotDocs vs batch $wantDocs")
    val gotDrops = spark.read.parquet(s"$work/out/funnel")
      .groupBy("stage").agg(
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("docs_in") -
            org.apache.spark.sql.functions.col("docs_out")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotDrops == wantDrops, s"stream $gotDrops vs batch $wantDrops")
    // non-vacuous: the near-dup stage really dropped the three planted
    // members (11, 12 against keeper 1 — one cross-epoch, one closing a
    // 3-member component — and 14 against in-epoch keeper 13)
    assert(wantDrops("near_dup") == 3L, s"fixture drift: $wantDrops")
    assert(!gotDocs.exists(Set(11L, 12L, 14L)), s"near-dups survived: $gotDocs")
    assert(gotDocs.intersect(Set(1L, 13L, 15L)) == Set(1L, 13L, 15L))
  }

  test("streaming near-dup: an out-of-order epoch is rejected loudly; the last epoch replays") {
    import spark.implicits._
    // r16 verdict #6: the stage's parity precondition (every epoch's
    // ids exceed all earlier epochs') was documented but unenforced —
    // an unordered epoch would make a NEW doc the cluster-min root of
    // an EXISTING component, silently keeping two members. Now the
    // watermark sidecar rejects it BEFORE any store mutation, while an
    // exact replay of the last epoch (the foreachBatch retry shape)
    // still passes.
    val work = Files.createTempDirectory("curordergate").toString
    def sent(tag: String): String = (1 to 16).map(i => s"${tag}w$i").mkString(" ")
    val cfg = graft.ops.Curation.Config(
      minQuality = 0.4, nearDup = Some(0.8), nearDupN = 3)
    val stores = Some((s"$work/ngstore", s"$work/ccstore"))
    def epoch(rows: Seq[(Long, Option[String])]) =
      graft.ops.Curation.streamEpoch(rows.toDF("doc_id", "text"),
        s"$work/store", cfg, nearDupStores = stores)
    val e1 = Seq((10L, Some(sent("a"))), (20L, Some(sent("b"))))
    val (d1, _) = epoch(e1)
    assert(d1.count() == 2L)
    // replay of the SAME epoch: accepted (store cycles are idempotent)
    val (d1r, _) = epoch(e1)
    assert(d1r.count() == 2L)
    // an epoch whose min id precedes the watermark: rejected up front,
    // and the rejection mutated NOTHING (the next in-order epoch runs)
    val e = intercept[IllegalArgumentException] {
      epoch(Seq((5L, Some(sent("a") + " extraone"))))
    }
    assert(e.getMessage.contains("out-of-order epoch"), e.getMessage)
    assert(e.getMessage.contains("ascending"), e.getMessage)
    // the rejection fired BEFORE any store mutation: the same text
    // arriving in order is judged against the UNPOLLUTED stores — a
    // near-dup of keeper 10, charged as usual
    val (d3, _) = epoch(Seq((30L, Some(sent("a") + " extraone"))))
    assert(d3.count() == 0L)
    // an epoch whose every quality survivor is an exact dup leaves the
    // near-dup stage an EMPTY batch — must not crash (Spark's
    // bloomFilter NPEs on empty frames; the fold now skips them)
    val (d4, _) = epoch(Seq((40L, Some(sent("a")))))
    assert(d4.count() == 0L)
  }

  test("streaming near-dup: a late bridge doc keeps first-arrivals (documented)") {
    import spark.implicits._
    // near-dup similarity is NOT transitive: doc 11 bridges 1 and 2
    // (jaccard(1,11) and jaccard(2,11) >= thr while jaccard(1,2) = 0).
    // A batch run would drop BOTH non-min members {2, 11}; the stream
    // has already emitted 2 in epoch 1 and cannot retract it — it keeps
    // first-arrivals and charges only the bridge. This pins the
    // DOCUMENTED divergence so a behavior change is loud.
    val work = Files.createTempDirectory("curbridgestream").toString
    def sent(tag: String): String = (1 to 16).map(i => s"${tag}w$i").mkString(" ")
    val bridge = sent("a") + " " + sent("b") // jaccard vs each base ≈ 0.47
    val e1 = Seq((1L, Some(sent("a"))), (2L, Some(sent("b"))))
    val e2 = Seq((11L, Some(bridge)))
    e1.toDF("doc_id", "text").coalesce(1).write.parquet(s"$work/in/f1")
    e2.toDF("doc_id", "text").coalesce(1).write.parquet(s"$work/in/f2")
    val cfg = graft.ops.Curation.Config(
      minQuality = 0.4, nearDup = Some(0.4), nearDupN = 3)
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in/*")
    val q = graft.ops.Curation.stream(
      stream, s"$work/store", s"$work/out", s"$work/ckpt", cfg,
      nearDupStores = Some((s"$work/ngstore", s"$work/ccstore")))
    try q.processAllAvailable() finally q.stop()
    val gotDocs = spark.read.parquet(s"$work/out/docs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // both first-arrivals kept; only the bridge charged
    assert(gotDocs == Set(1L, 2L), s"stream kept $gotDocs")
    val nearDrops = spark.read.parquet(s"$work/out/funnel")
      .filter(org.apache.spark.sql.functions.col("stage") === "near_dup")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("docs_in") -
          org.apache.spark.sql.functions.col("docs_out")))
      .collect().head.getLong(0)
    assert(nearDrops == 1L, s"only the bridge doc is charged: $nearDrops")
  }

  test("per-epoch token budget: each epoch keeps its own quota — explicitly NOT the batch prefix (r17 #8)") {
    import spark.implicits._
    val work = Files.createTempDirectory("curepochbudget").toString
    // 8-token distinct sentences; quota 16 -> each epoch keeps exactly
    // its two lowest-priority-ordered docs (ord = doc_id asc, total)
    def sent(tag: String): String = (1 to 8).map(i => s"${tag}w$i").mkString(" ")
    val cfg = graft.ops.Curation.Config(minQuality = 0.0,
      budget = Some(16L),
      ord = Seq(org.apache.spark.sql.functions.col("doc_id").asc))
    val e1 = Seq((1L, Some(sent("a"))), (2L, Some(sent("b"))),
      (3L, Some(sent("c"))))
    val e2 = Seq((10L, Some(sent("d"))), (11L, Some(sent("e"))),
      (12L, Some(sent("f"))))
    e1.toDF("doc_id", "text").coalesce(1).write.parquet(s"$work/in/f1")
    e2.toDF("doc_id", "text").coalesce(1).write.parquet(s"$work/in/f2")
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in/*")
    // without the opt-in: the batch-only contract still rejects loudly,
    // naming the per-epoch escape hatch
    val e = intercept[IllegalArgumentException] {
      graft.ops.Curation.stream(stream, s"$work/store0", s"$work/out0",
        s"$work/ckpt0", cfg)
    }
    assert(e.getMessage.contains("batch-only") &&
      e.getMessage.contains("perEpochBudget"), e.getMessage)
    val q = graft.ops.Curation.stream(
      stream, s"$work/store", s"$work/out", s"$work/ckpt", cfg,
      perEpochBudget = true)
    try q.processAllAvailable() finally q.stop()
    // EACH epoch kept its own best 16 tokens = its two lowest ids; a
    // batch prefix over the union would have kept only {1, 2} total —
    // the semantic difference the opt-in names
    val gotDocs = spark.read.parquet(s"$work/out/docs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotDocs == Set(1L, 2L, 10L, 11L), s"epoch quotas kept $gotDocs")
    // funnel: a budget row per epoch with exact drop counts (3 -> 2)
    // and exact selected tokens (16)
    val bRows = spark.read.parquet(s"$work/out/funnel")
      .filter(org.apache.spark.sql.functions.col("stage") === "budget")
      .select("docs_in", "docs_out", "tokens_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(bRows == Seq((3L, 2L, 16L), (3L, 2L, 16L)), bRows.toString)
    // cum_tokens rides the output, the batch stage's contract
    val cums = spark.read.parquet(s"$work/out/docs")
      .select("doc_id", "cum_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cums == Map(1L -> 8L, 2L -> 16L, 10L -> 8L, 11L -> 16L),
      cums.toString)
  }
}
