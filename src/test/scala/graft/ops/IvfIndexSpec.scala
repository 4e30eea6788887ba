package graft.ops

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Persisted IVF index: build-once/search-many parity and the partition
  * pruning that makes the probe a fractional scan. */
class IvfIndexSpec extends SparkSuite {

  private lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val queries = embs.filter(col("vec_id") < 5)
  private lazy val cands = embs.filter(col("vec_id") >= 5)

  private lazy val indexDir = {
    val dir = Files.createTempDirectory("ivfindex").toString
    IvfIndex.build(cands, dir, nlist = 8)
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("query_id", "rank").collect().map(_.toString).toSeq

  test("exhaustive probe over the index equals brute force") {
    val got = rows(IvfIndex.search(spark, indexDir, queries, k = 3, nprobe = 8))
    val want = rows(Similarity.bruteForceTopK(queries, cands, k = 3))
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("partial probe over the index equals the inline IVF operator") {
    // same seeding (first-nlist centroids) -> identical cells -> identical
    // results; proves the persisted index reproduces the inline path
    val got = rows(IvfIndex.search(spark, indexDir, queries, k = 3, nprobe = 2))
    val want = rows(Similarity.ivfTopK(queries, cands, k = 3,
      nlist = 8, nprobe = 2))
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("the probe reads only the probed cells (partition pruning)") {
    val probe = IvfIndex.search(spark, indexDir, queries, k = 3, nprobe = 1)
    // queries share the corpus-sized first cells at nprobe=1 — the scan's
    // partition filter must name `cell`
    val scan = spark.read.parquet(s"$indexDir/assignments")
      .filter(col("cell").isin(0L))
    val p = scan.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cell"), p)
    assert(probe.count() > 0)
  }
}
