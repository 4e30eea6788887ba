package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The fused sketch expressions must be drop-in equal to the declarative
  * forms they replaced — checked over adversarial generated texts
  * (multi-space runs, leading/trailing spaces, empties, multi-byte
  * UTF-8), since the gram fast path reads byte substrings directly. */
class SketchExprsSpec extends SparkSuite {

  import spark.implicits._

  /** The pre-r4 declarative gram construction (Dedup.shingles). */
  private def declGrams(text: Column, n: Int, distinct: Boolean): Column = {
    val toks = split(text, " ")
    val grams = transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    if (distinct) array_distinct(grams) else grams
  }

  private val words = Array("the", "spark", "héllo", "ünïcode", "日本語",
    "a", "b", "x1", "", "naïve")

  private lazy val corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42) // deterministic
    (0L until 400L).map { i =>
      val n = rnd.nextInt(12)
      val body = Seq.fill(n)(words(rnd.nextInt(words.length)))
        // random single/double separators exercise empty tokens
        .mkString(if (rnd.nextBoolean()) " " else "  ")
      val s = (if (rnd.nextInt(5) == 0) " " else "") + body +
        (if (rnd.nextInt(5) == 0) " " else "")
      (i, s)
    } :+ (400L, "") :+ (401L, " ") :+ (402L, "one")
  }

  test("gram_hashes equals xxhash64 over the declarative grams (both distinct modes)") {
    val df = corpus.toDF("id", "text")
    for (n <- Seq(1, 3, 5); distinct <- Seq(true, false)) {
      val mismatch = df.select(
        SketchExprs.gramHashes(col("text"), n, distinct).as("fast"),
        transform(declGrams(col("text"), n, distinct), g => xxhash64(g)).as("decl"))
        .filter(not(col("fast") === col("decl")))
        .count()
      assert(mismatch == 0, s"n=$n distinct=$distinct")
    }
  }

  test("gram_md5 equals md5 over the declarative grams") {
    val df = corpus.toDF("id", "text")
    val mismatch = df.select(
      SketchExprs.gramMd5(col("text"), 4, distinct = false).as("fast"),
      transform(declGrams(col("text"), 4, distinct = false), g => md5(g)).as("decl"))
      .filter(not(col("fast") === col("decl")))
      .count()
    assert(mismatch == 0)
  }

  test("token_set_counts equals the filter(isin) form per set") {
    val df = corpus.toDF("id", "text")
    val sets = Seq(Seq("the", "a", "日本語"), Seq("spark", "héllo"))
    val counts = SketchExprs.tokenSetCounts(col("text"), sets)
    val mismatch = df.select(
      (sets.zipWithIndex.map { case (ws, i) =>
        (element_at(counts, i + 1) =!=
          size(filter(split(col("text"), " "),
            t => t.isin(ws.map(lit(_)): _*)))).as(s"m$i")
      }): _*)
      .filter(sets.indices.map(i => col(s"m$i")).reduce(_ || _))
      .count()
    assert(mismatch == 0)
  }

  test("array_intersect_count equals size(array_intersect) on random arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // random long arrays incl. duplicates, asymmetric sizes, and empties
    val rows = (0 until 300).map { i =>
      def arr(n: Int) = Seq.fill(n)(rnd.nextInt(40).toLong)
      (i.toLong, arr(rnd.nextInt(30)), arr(rnd.nextInt(30)))
    } :+ ((300L, Seq.empty[Long], Seq(1L, 2L))) :+
      ((301L, Seq(5L, 5L, 5L), Seq(5L, 5L)))
    val df = rows.toDF("id", "a", "b")
    val mismatch = df.select(
      graft.functions.SketchExprs.arrayIntersectCount(col("a"), col("b"))
        .as("got"),
      size(array_intersect(col("a"), col("b"))).as("want"))
      .filter(col("got") =!= col("want")).count()
    assert(mismatch == 0)
  }

  test("array_intersect_count and array_eq_count handle NULL elements") {
    import spark.implicits._
    // NULL-bearing ARRAY<BIGINT> (containsNull=true) can reach the SQL
    // temp functions; NULL must not be conflated with 0L
    val rnd = new scala.util.Random(47)
    val rows = (0 until 200).map { i =>
      def arr(n: Int) = Seq.fill(n) {
        if (rnd.nextInt(5) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(10).toLong)
      }
      (i.toLong, arr(rnd.nextInt(12)), arr(rnd.nextInt(12)))
    } :+ ((200L, Seq[java.lang.Long](null, 0L), Seq[java.lang.Long](null))) :+
      ((201L, Seq[java.lang.Long](0L), Seq[java.lang.Long](null, 0L)))
    val df = rows.toDF("id", "a", "b")
    // intersect-count: oracle is size(array_intersect) which counts NULL
    // (once) iff present in both operands
    val m1 = df.select(
      graft.functions.SketchExprs.arrayIntersectCount(col("a"), col("b"))
        .as("got"),
      size(array_intersect(col("a"), col("b"))).as("want"))
      .filter(col("got") =!= col("want")).count()
    assert(m1 == 0)
    // eq-count: oracle is the positional `a[i] = b[i] IS TRUE` count —
    // NULL equals nothing, including NULL
    val zipped = zip_with(col("a"), col("b"), (x, y) => x === y)
    val m2 = df
      .filter(size(col("a")) === size(col("b"))) // zip_with pads with NULL
      .select(
        graft.functions.SketchExprs.arrayEqCount(col("a"), col("b")).as("got"),
        size(filter(zipped, e => coalesce(e, lit(false)))).as("want"))
      .filter(col("got") =!= col("want")).count()
    assert(m2 == 0)
  }

  test("winnow_minima equals the positional window-min form") {
    val df = corpus.toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis
      .winnowingSketch(df, k = 3, w = 4, oracleMd5 = true)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    // pre-r4 declarative formulation
    val hashes = transform(declGrams(col("text"), 3, distinct = false), md5(_))
    val posed = df.select(col("doc_id"),
      posexplode(hashes).as(Seq("pos", "h")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)
    val want = posed.withColumn("m", min("h").over(win))
      .filter(col("pos") >= 3)
      .groupBy("doc_id")
      .agg(array_sort(array_distinct(collect_list("m"))).as("sketch"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }
}
