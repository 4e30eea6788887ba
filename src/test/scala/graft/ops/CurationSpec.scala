package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Decontamination, sequence packing, PII redaction, and repetition —
  * the curation ops — on planted inputs with known answers. */
class CurationSpec extends SparkSuite {

  test("decontaminate flags only docs sharing n-grams with the benchmark") {
    import spark.implicits._
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // shares grams via "beta gamma delta"
      (11L, "one two three four five six seven"),   // clean
      (12L, "beta gamma delta epsilon unrelated tail here")
    ).toDF("doc_id", "text")
    val benchmark = Seq(
      (0L, "prefix words beta gamma delta epsilon suffix words")
    ).toDF("doc_id", "text")
    val r = Decontaminate.overlap(corpus, benchmark, n = 3)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        x.getAs[Long]("n_contaminated_grams")).toMap
    // doc 10: shared 3-grams = "beta gamma delta", "gamma delta epsilon"
    assert(r == Map(10L -> 2L, 12L -> 2L))
  }

  test("decontaminate broadcasts the benchmark side (corpus never shuffles pre-join)") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val bench = Seq((2L, "b c d e")).toDF("doc_id", "text")
    val p = Decontaminate.overlap(corpus, bench, n = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("packing: offsets accumulate per shard and packs split at the budget") {
    import spark.implicits._
    // shard A: 3+4+5 tokens; budget 6 → doc 1 at [0,2], doc 2 at [3,6],
    // doc 3 at [7,11] → packs: doc1 0..0, doc2 0..1 (spans), doc3 1..1
    val docs = Seq(
      ("A", 1L, "x x x"),
      ("A", 2L, "y y y y"),
      ("A", 3L, "z z z z z"),
      ("B", 9L, "q q q q q q q") // independent shard restarts at offset 0
    ).toDF("source", "doc_id", "text")
    val r = Packing.packAssignments(docs, budget = 6)
      .collect().map(x => (x.getAs[String]("shard"), x.getAs[Long]("doc_id"),
        x.getAs[Long]("tok_offset"), x.getAs[Long]("first_pack"),
        x.getAs[Long]("last_pack"))).toSet
    assert(r == Set(
      ("A", 1L, 0L, 0L, 0L),
      ("A", 2L, 3L, 0L, 1L),
      ("A", 3L, 7L, 1L, 1L),
      ("B", 9L, 0L, 0L, 1L)))
  }

  test("packing never funnels into a single partition (shard-partitioned window)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = Packing.packAssignments(docs, budget = 512)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), p)
  }

  test("redaction masks emails, phones, and IPv4s; counts match; clean text untouched") {
    import spark.implicits._
    val d = Seq(
      (1L, "mail bob.smith+x@corp.example.com now"),
      (2L, "call +1-555-0199 or 555-0200 today"),
      (3L, "host 192.168.0.1 is up"),
      (4L, "nothing sensitive here")
    ).toDF("id", "text")
    val r = d.select(col("id"), Redaction.redact(col("text")).as("m"),
        Redaction.emailCount(col("text")).as("e"),
        Redaction.phoneCount(col("text")).as("p"),
        Redaction.ipv4Count(col("text")).as("i"))
      .collect().map(x => x.getAs[Long]("id") ->
        ((x.getAs[String]("m"), x.getAs[Int]("e"), x.getAs[Int]("p"),
          x.getAs[Int]("i")))).toMap
    assert(r(1L) == (("mail <EMAIL> now", 1, 0, 0)))
    assert(r(2L) == (("call <PHONE> or <PHONE> today", 0, 2, 0)))
    assert(r(3L) == (("host <IP> is up", 0, 0, 1)))
    assert(r(4L) == (("nothing sensitive here", 0, 0, 0)))
  }

  test("repetition profile: duplicated grams lower the distinct count") {
    import spark.implicits._
    // "a b a b a b": 3-grams = (a b a), (b a b), (a b a), (b a b)
    val d = Seq((1L, "a b a b a b"), (2L, "u v w x y z")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionProfile(d, n = 3)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_grams"), x.getAs[Long]("n_distinct_grams"),
          x.getAs[Double]("rep_ratio")))).toMap
    assert(r(1L) == ((4L, 2L, 0.5)))
    assert(r(2L) == ((4L, 4L, 0.0)))
  }
}
