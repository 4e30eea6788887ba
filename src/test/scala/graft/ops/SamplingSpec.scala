package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Deterministic hash sampling / split assignment semantics. */
class SamplingSpec extends SparkSuite {

  import spark.implicits._

  private lazy val ids = (0L until 2000L).toDF("id")
    .withColumn("key", col("id").cast("string"))

  test("hash sample is deterministic and near the requested fraction") {
    def run() = Sampling.hashSample(ids, col("key"), 0.25)
      .select("id").collect().map(_.getLong(0)).toSet
    val a = run()
    assert(run() == a) // exact reproducibility
    // binomial(2000, 0.25): ±5σ ≈ ±97
    assert(math.abs(a.size - 500) < 100, s"got ${a.size}")
    // repartitioning must not change membership (unlike df.sample)
    val b = Sampling.hashSample(ids.repartition(13), col("key"), 0.25)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(b == a)
  }

  test("different salts draw independent samples") {
    val a = Sampling.hashSample(ids, col("key"), 0.5, salt = "a")
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids, col("key"), 0.5, salt = "b")
      .select("id").collect().map(_.getLong(0)).toSet
    val overlap = (a & b).size.toDouble / 2000
    assert(overlap > 0.15 && overlap < 0.35, s"overlap $overlap") // ≈ 0.25
  }

  test("fraction edge cases: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.hashSample(ids, col("key"), 0.0).count() == 0)
    assert(Sampling.hashSample(ids, col("key"), 1.0).count() == 2000)
  }

  test("splits are disjoint, exhaustive, and near their fractions") {
    val out = Sampling.assignSplits(ids, col("key"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.count() == 2000) // exhaustive, nothing dropped
    val byName = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet == Set("train", "val", "test"))
    assert(math.abs(byName("train") - 1600) < 150, byName)
    assert(math.abs(byName("val") - 200) < 100, byName)
    // membership is a pure function of the key: stable under growth
    val grown = (0L until 4000L).toDF("id")
      .withColumn("key", col("id").cast("string"))
    val before = out.select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = Sampling.assignSplits(grown, col("key"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .filter(col("id") < 2000).select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after == before)
  }

  test("mixture sample honors per-source fractions; re-weighting one source never re-rolls another") {
    val docs = (0L until 4000L).toDF("id")
      .withColumn("source", concat(lit("s"), (col("id") % 4).cast("string")))
      .withColumn("key", col("id").cast("string"))
    val w = Map("s0" -> 1.0, "s1" -> 0.5, "s2" -> 0.1)
    val kept = Sampling.mixtureSample(docs, "source", col("key"), w)
      .select("id", "source").collect().map(r => r.getLong(0) -> r.getString(1))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(bySrc.getOrElse("s0", 0L) == 1000L)                  // fraction 1.0: all
    assert(math.abs(bySrc.getOrElse("s1", 0L) - 500L) < 120, bySrc)
    assert(math.abs(bySrc.getOrElse("s2", 0L) - 100L) < 60, bySrc)
    assert(!bySrc.contains("s3"))                               // default 0.0: none
    // changing s2's weight leaves s1's sample identical (per-key draw)
    val reweighted = Sampling.mixtureSample(docs, "source", col("key"),
      w.updated("s2", 0.9))
      .filter(col("source") === "s1").select("id").collect().map(_.getLong(0)).toSet
    assert(reweighted == kept.filter(_._2 == "s1").map(_._1).toSet)
    // and the draw is an independent function of the salt
    val otherSalt = Sampling.mixtureSample(docs, "source", col("key"), w,
      salt = "mix2")
      .filter(col("source") === "s1").select("id").collect().map(_.getLong(0)).toSet
    assert(otherSalt != reweighted)
  }

  test("stratified sample keeps exactly k per stratum, deterministically") {
    val docs = (0L until 300L).toDF("id")
      .withColumn("stratum", (col("id") % 3).cast("string"))
      .withColumn("key", col("id").cast("string"))
    def run() = Sampling.stratifiedSample(docs, Seq("stratum"), col("key"), 5)
      .select("stratum", "id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = run()
    assert(got == run())
    assert(got.groupBy(_._1).view.mapValues(_.size).toMap ==
      Map("0" -> 5, "1" -> 5, "2" -> 5))
    assert(got.forall(_._3 <= 5))
  }
}
