package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Span (ExactSubstr-style) dedup: keeper selection, coverage cut,
  * overlap merging, full-coverage docs, short docs, NULL text, and the
  * corpus-never-shuffles plan shape. */
class SpanDedupSpec extends SparkSuite {

  private def docsDf = {
    import spark.implicits._
    Seq(
      // doc 1 is the global keeper of "b c d" (min (doc_id, pos))
      (1L, Some("a b c d e f")),
      // doc 2 repeats "b c d" at pos 1 → tokens 1..3 cut → "x y"
      (2L, Some("x b c d y")),
      // doc 3 repeats its own opening: "p q r" at 0 and 4 (and "q r s"
      // at 1 and 5) → keepers are the pos-0/1 occurrences, coverage
      // cuts tokens 4..7 → "p q r s"
      (3L, Some("p q r s p q r s")),
      // doc 4 is an exact copy of doc 1: every window is a non-keeper
      // duplicate → fully covered → empty string
      (4L, Some("a b c d e f")),
      // shorter than w: no windows, byte-identical pass-through
      (5L, Some("u v")),
      (6L, None: Option[String])
    ).toDF("doc_id", "text")
  }

  test("duplicatedSpans lists non-keeper occurrences only, min-(doc,pos) keeper") {
    val spans = SpanDedup.duplicatedSpans(docsDf, w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 2 @ 1 ("b c d"); doc 3 @ 4 ("p q r") and @ 5 ("q r s");
    // doc 4 @ 0..3 (all four windows of the doc-1 clone)
    assert(spans == Set((2L, 1L), (3L, 4L), (3L, 5L),
      (4L, 0L), (4L, 1L), (4L, 2L), (4L, 3L)))
  }

  test("removeSpans cuts covered tokens, keeps keepers, empties full-coverage docs") {
    val out = SpanDedup.removeSpans(docsDf, w = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out(1L) == "a b c d e f") // keeper doc untouched
    assert(out(2L) == "x y")         // span 1..3 cut
    assert(out(3L) == "p q r s")     // overlapping spans 4..6 and 5..7 merge
    assert(out(4L) == "")            // pure duplicated content
    assert(out(5L) == "u v")         // sub-window doc passes through
    assert(out(6L) == null)          // NULL text stays NULL
  }

  test("original non-text columns ride through removeSpans") {
    import spark.implicits._
    val withExtra = docsDf.withColumn("lang", concat(lit("l"), col("doc_id")))
    val out = SpanDedup.removeSpans(withExtra, w = 3)
    assert(out.columns.toSeq == Seq("doc_id", "text", "lang"))
    assert(out.filter(col("doc_id") === 2L).select("lang").head().getString(0) == "l2")
  }

  test("idempotent: a second pass finds nothing to cut") {
    val once = SpanDedup.removeSpans(docsDf, w = 3)
    assert(SpanDedup.duplicatedSpans(once, w = 3).isEmpty)
  }

  test("plan shape: spans run ONE window pass (no probe re-scan); rebuild never shuffles the corpus") {
    // r20: detection is a single analytic-window pass over one
    // evaluation of the window rows — the old aggregate + broadcast
    // probe shape ran the tokenize+md5 window map twice (the operator's
    // dominant CPU at every scale). Pin: exactly one wh exchange, a
    // Window operator, and NO join in the detection plan.
    val spans = SpanDedup.duplicatedSpans(docsDf, w = 3)
    val sPlan = spans.queryExecution.executedPlan.toString
    assert(sPlan.contains("Window"),
      s"span detection must be the one-pass analytic-window form:\n$sPlan")
    assert(!sPlan.contains("Join"),
      s"span detection must not re-scan the corpus for a probe join:\n$sPlan")
    assert("Exchange hashpartitioning\\(wh".r.findAllIn(sPlan).size == 1,
      s"exactly one wh exchange expected:\n$sPlan")
    val out = SpanDedup.removeSpans(docsDf, w = 3)
    val oPlan = out.queryExecution.executedPlan.toString
    // the docs-side join against the per-doc span lists is the
    // broadcast hint — the corpus must not hash-exchange for it
    assert(oPlan.contains("BroadcastHashJoin"), oPlan)
  }

  test("w below 2 is rejected") {
    intercept[IllegalArgumentException](SpanDedup.duplicatedSpans(docsDf, w = 1))
  }
}
