package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Token-budget selection: prefix semantics vs a hand-computed cumsum,
  * overflow cut, degenerate budgets, determinism across partition
  * layouts, and the no-single-partition-window plan shape. */
class BudgetSampleSpec extends SparkSuite {

  private lazy val docs = {
    import spark.implicits._
    // priority = pri ASC, id ASC; token counts 3/2/4/1/2
    Seq(
      (1L, 10L, "a b c"),
      (2L, 20L, "d e"),
      (3L, 30L, "f g h i"),
      (4L, 40L, "j"),
      (5L, 50L, "k l")
    ).toDF("doc_id", "pri", "text")
  }

  private def select(budget: Long) =
    BudgetSample.takeUntil(docs, budget,
      Seq(col("pri").asc, col("doc_id").asc))
      .select("doc_id", "n_tokens", "cum_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)

  test("prefix cumsum matches hand computation; overflow doc cuts the stream") {
    // cum: 3, 5, 9, 10, 12
    assert(select(12).toSeq == Seq((1L, 3L, 3L), (2L, 2L, 5L), (3L, 4L, 9L),
      (4L, 1L, 10L), (5L, 2L, 12L)))
    // budget 9 keeps docs 1..3; doc 4 (1 token, cum 10) does NOT
    // back-fill even though it alone would fit a remaining budget of 0
    assert(select(9).map(_._1).toSeq == Seq(1L, 2L, 3L))
    // budget mid-doc-3: the overflowing doc is excluded entirely
    assert(select(8).map(_._1).toSeq == Seq(1L, 2L))
  }

  test("degenerate budgets: 0 selects nothing, huge selects everything") {
    assert(select(0).isEmpty)
    assert(select(Long.MaxValue / 2).size == 5)
  }

  test("selection is layout-independent (same rows from 1 or 7 input partitions)") {
    val base = select(9).toSeq
    val rep = BudgetSample.takeUntil(docs.repartition(7), 9L,
      Seq(col("pri").asc, col("doc_id").asc))
      .select("doc_id", "n_tokens", "cum_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3).toSeq
    assert(rep == base)
  }

  test("no single-partition window: the cumsum partitions by range bucket") {
    val sel = BudgetSample.takeUntilWithRelease(docs, 9L,
      Seq(col("pri").asc, col("doc_id").asc))
    val plan = sel.df.queryExecution.executedPlan.toString
    // the window must carry a partition spec (the __pid range bucket),
    // never the global-order single-partition form
    assert(!plan.contains("SinglePartition"),
      s"global cumsum must not funnel through one partition:\n$plan")
    sel.release()
  }

  test("NULL text counts zero tokens and stays selectable (no null-sum crash)") {
    import spark.implicits._
    // doc 2 has NULL text; docs 4/5 are an ALL-NULL priority band that
    // range-partitions together — previously their per-partition token
    // sum was NULL and the driver-side getLong threw
    val withNulls = Seq(
      (1L, 10L, Some("a b c")),
      (2L, 20L, None: Option[String]),
      (3L, 30L, Some("d e")),
      (4L, 40L, None: Option[String]),
      (5L, 41L, None: Option[String])
    ).toDF("doc_id", "pri", "text")
    val got = BudgetSample.takeUntil(withNulls, 5L,
      Seq(col("pri").asc, col("doc_id").asc))
      .select("doc_id", "n_tokens", "cum_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    // cum: 3, 3, 5, 5, 5 — every zero-token doc rides within budget
    assert(got == Seq((1L, 3L, 3L), (2L, 0L, 3L), (3L, 2L, 5L),
      (4L, 0L, 5L), (5L, 0L, 5L)))
  }

  test("a precomputed tokenCol selects identically to re-tokenizing") {
    import org.apache.spark.sql.functions.{coalesce, lit, size, split}
    val pre = docs.withColumn("tc",
      coalesce(size(split(col("text"), " ")).cast("long"), lit(0L)))
    val a = BudgetSample.takeUntilWithRelease(pre, 12L,
      Seq(col("pri").asc, col("doc_id").asc), tokenCol = Some("tc"))
    val b = BudgetSample.takeUntilWithRelease(docs, 12L,
      Seq(col("pri").asc, col("doc_id").asc))
    def rows(s: BudgetSample.Selected) = s.df
      .select("doc_id", "n_tokens", "cum_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(rows(a) == rows(b) && rows(a).nonEmpty)
    a.release(); b.release()
  }

  test("release unpins the ranged intermediate") {
    val sel = BudgetSample.takeUntilWithRelease(docs, 12L,
      Seq(col("pri").asc, col("doc_id").asc))
    assert(sel.df.count() == 5)
    sel.release() // must not throw; frame recomputes if touched again
  }
}
