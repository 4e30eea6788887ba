package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end curation funnel (Curation.run): sequential
  * first-stage charging, keeper selection, per-stage accounting,
  * optional stages, budget forms, NULL text, empty corpus, and the
  * broadcast shape of the contamination join. */
class CurationPipelineSpec extends SparkSuite {

  import spark.implicits.newProductEncoder
  import spark.implicits.localSeqToDatasetHolder

  // plain words + stopwords, no punctuation → quality well over 0.4
  private val good =
    "the cat and the dog is in the park today and it is warm out there"
  private val good2 =
    "a quiet morning walk by the river is the best start to any day here"
  private val leaky =
    "the secret eval question about the old castle is hidden in this " +
      "training document with the usual padding around it"

  private def corpus: DataFrame = Seq(
    (1L, Some(good)),   // survivor (and keeper of the 1/2 family)
    (2L, Some(good)),   // exact duplicate of 1 → exact_dup
    (3L, Some("z!!")),  // short + punct-heavy → quality
    (4L, Some(leaky)),  // shares 3-grams with the benchmark → contaminated
    (5L, Some(good2)),  // survivor
    (6L, None: Option[String]) // NULL text → quality (0 tokens)
  ).toDF("doc_id", "text")

  private def bench: DataFrame = Seq(
    (100L, "the secret eval question about the old castle is hidden")
  ).toDF("doc_id", "text")

  private def tok(s: String): Long = s.split(" ").length.toLong

  test("funnel charges each doc to the FIRST dropping stage; chain is consistent") {
    val res = Curation.run(corpus,
      Curation.Config(minQuality = 0.4, benchmark = Some(bench)))
    val rows = res.funnel.collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // docs: 6 in; quality drops 3 and 6; dedup drops 2; decontam drops 4
    assert(rows("quality") == ((6L, 4L, tok(good) * 2 + tok(leaky) + tok(good2))))
    assert(rows("exact_dup") == ((4L, 3L, tok(good) + tok(leaky) + tok(good2))))
    assert(rows("contaminated") == ((3L, 2L, tok(good) + tok(good2))))
    assert(!rows.contains("budget")) // no budget stage configured
    val kept = res.docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L))
    res.release()
  }

  test("near-dup stage charges non-representatives; first-stage rule holds") {
    // 10 ≈ 11 at 3-gram jaccard >= 0.8 (one token changed in a long
    // doc); 12 is an EXACT duplicate of 10 — it must charge to
    // exact_dup, never near_dup; 13 is a near-dup of 10 that fails
    // quality — it must charge to quality and not drag 10's component
    val long = ("alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon")
    val near = long.replace("upsilon", "phi")
    val docs = Seq(
      (10L, Some(long)),
      (11L, Some(near)),
      (12L, Some(long)),
      (13L, Some(near + " !!!!!!!!!! @@@@@@@@@@ ########## $$$$$$$$$$ " +
        "%%%%%%%%%% ^^^^^^^^^^ &&&&&&&&&& ********** (((((((((( ))))))))))"))
    ).toDF("doc_id", "text")
    val res = Curation.run(docs,
      Curation.Config(minQuality = 0.4, nearDup = Some(0.8)))
    val exits = res.docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = res.funnel.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // sequential numbering: quality=1, exact_dup=2, near_dup=3
    assert(rows.map(r => r._1 -> r._2).toSeq ==
      Seq(1L -> "quality", 2L -> "exact_dup", 3L -> "near_dup"))
    assert(rows(0)._3 == 4L && rows(0)._4 == 3L) // 13 fails quality
    assert(rows(1)._4 == 2L)                     // 12 exits exact_dup
    assert(rows(2)._4 == 1L)                     // 11 exits near_dup
    assert(exits == Set(10L))                    // min-id representative
    res.release()
  }

  test("a duplicate family that fails quality charges to quality, not exact_dup") {
    val res = Curation.run(
      Seq((1L, "x!!"), (2L, "x!!"), (3L, good)).toDF("doc_id", "text"),
      Curation.Config(minQuality = 0.4))
    val rows = res.funnel.collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(rows("quality") == ((3L, 1L)))   // both copies die here
    assert(rows("exact_dup") == ((1L, 1L))) // nothing left to dedup
    res.release()
  }

  test("absolute budget keeps the best-quality prefix in (quality desc, doc_id) order") {
    // quality ranks by length here (same punct/stopword profile):
    // a(~1.0) > b(~0.87) > c(~0.77); budget = tokens(a)+tokens(b)
    val a = ("the red fox and the grey owl is near the barn " * 5).trim
    val b = ("the red fox and the grey owl is here " * 3).trim
    val c = "the red fox is by the old barn door today"
    val docs = Seq((1L, c), (2L, a), (3L, b)).toDF("doc_id", "text")
    val res = Curation.run(docs,
      Curation.Config(budget = Some(tok(a) + tok(b))))
    val sel = res.docs.select("doc_id", "cum_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sel.keySet == Set(2L, 3L))
    assert(sel(2L) == tok(a) && sel(3L) == tok(a) + tok(b))
    val budgetRow = res.funnel.filter(col("stage") === "budget").collect().head
    assert((budgetRow.getLong(2), budgetRow.getLong(3), budgetRow.getLong(4)) ==
      ((3L, 2L, tok(a) + tok(b))))
    res.release()
  }

  test("budgetFraction derives the budget from the stage-3 survivors' tokens") {
    val docs = Seq((1L, good), (2L, good2)).toDF("doc_id", "text")
    val all = Curation.run(docs, Curation.Config(budgetFraction = Some(1.0)))
    assert(all.docs.count() == 2) // floor(1.0 * t) = t keeps everything
    all.release()
    val none = Curation.run(docs, Curation.Config(budgetFraction = Some(0.0)))
    assert(none.docs.count() == 0)
    val row = none.funnel.filter(col("stage") === "budget").collect().head
    assert(row.getLong(3) == 0L && row.getLong(4) == 0L)
    none.release()
  }

  test("NULL text fails quality with 0 tokens; token sums unaffected") {
    val res = Curation.run(
      Seq((1L, Some(good)), (2L, None: Option[String])).toDF("doc_id", "text"),
      Curation.Config())
    val q = res.funnel.filter(col("stage") === "quality").collect().head
    assert((q.getLong(2), q.getLong(3), q.getLong(4)) == ((2L, 1L, tok(good))))
    res.release()
  }

  test("empty corpus yields an all-zero funnel and no crash") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val res = Curation.run(empty,
      Curation.Config(benchmark = Some(bench), budgetFraction = Some(0.6)))
    val rows = res.funnel.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1L, "quality", 0L, 0L, 0L), (2L, "exact_dup", 0L, 0L, 0L),
      (3L, "contaminated", 0L, 0L, 0L), (4L, "budget", 0L, 0L, 0L)))
    assert(res.docs.count() == 0)
    res.release()
  }

  test("contamination id set joins back as a broadcast (corpus-side no shuffle)") {
    val res = Curation.run(corpus,
      Curation.Config(minQuality = 0.4, benchmark = Some(bench)))
    val plan = res.docs.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    res.release()
  }

  test("funnel matches the real corpus at the gate config (internal consistency)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val res = Curation.run(
      docs.filter(col("source") =!= "src0"),
      Curation.Config(minQuality = 0.4,
        benchmark = Some(docs.filter(col("source") === "src0")),
        decontamN = 3, budgetFraction = Some(0.6)))
    val rows = res.funnel.orderBy("stage_idx").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    // the chain: docs_in(k+1) == docs_out(k); tokens monotone nonincreasing
    assert(rows.sliding(2).forall { case Array(a, b) => b._1 == a._2 })
    assert(rows.map(_._3).sliding(2).forall { case Array(a, b) => b <= a })
    // stage 4 kept ≤ 60 % of stage-3 surviving tokens
    val t3 = rows(2)._3
    assert(rows(3)._3 <= math.floor(0.6 * t3).toLong)
    assert(res.docs.count() == rows(3)._2)
    res.release()
  }
}
