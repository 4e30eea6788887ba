package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** RRF fusion: hand-computed scores, missing-modality handling, rank
  * determinism, and the end-to-end BM25 × cosine composition. */
class HybridSearchSpec extends SparkSuite {

  test("rrf matches the hand formula; docs in one list only still fuse") {
    import spark.implicits._
    val lex = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val sem = Seq((0L, 11L, 1), (0L, 13L, 2))
      .toDF("query_id", "doc_id", "rank")
    val got = HybridSearch.rrf(lex, sem, k = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    def f(r: Int) = 1.0 / (60 + r)
    val want = Map( // doc -> exact rrf (6 dp)
      10L -> BigDecimal(f(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      11L -> BigDecimal(f(2) + f(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      12L -> BigDecimal(f(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      13L -> BigDecimal(f(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got.map(g => g._1 -> g._2).toMap == want)
    // doc 11 appears in BOTH lists → highest fused score → rank 1
    assert(got.find(_._1 == 11L).get._3 == 1)
    // single-modality docs are ranked by their one term
    val order = got.sortBy(_._3).map(_._1).toSeq
    assert(order == Seq(11L, 10L, 13L, 12L))
  }

  test("fused rank ties break on doc_id (deterministic)") {
    import spark.implicits._
    // two docs with identical single-modality ranks → identical rrf
    val lex = Seq((0L, 21L, 1)).toDF("query_id", "doc_id", "rank")
    val sem = Seq((0L, 20L, 1)).toDF("query_id", "doc_id", "rank")
    val got = HybridSearch.rrf(lex, sem, k = 2)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(20L, 21L)) // same rrf, lower doc_id first
  }

  test("end-to-end search fuses BM25 and cosine over the corpus") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = Seq((0L, "hash join merge")).toDF("query_id", "query")
      .join(embs.filter(col("vec_id") === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
        Seq("query_id"))
    val got = HybridSearch.search(docs, embs, queries, k = 5)
    val rows = got.collect()
    assert(rows.length == 5)
    assert(rows.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    // the query's own vector (cosine 1.0 → sem rank 1) must fuse in
    assert(rows.map(_.getLong(1)).contains(0L))
    // determinism across runs
    val again = HybridSearch.search(docs, embs, queries, k = 5).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
