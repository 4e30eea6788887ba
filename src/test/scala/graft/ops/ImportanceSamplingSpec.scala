package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling: hand-computed LLR parity on a tiny
  * corpus, determinism of the seeded Gumbel draw, selection-bias sanity,
  * and the degenerate empty-target case. */
class ImportanceSamplingSpec extends SparkSuite {

  import ImportanceSampling.B

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta", true),
      (2L, "alpha gamma", true),
      (3L, "delta delta", false),
      (4L, "alpha delta", false)
    ).toDF("doc_id", "text", "is_t")
  }

  /** The operator's formula, recomputed with plain Scala maps. */
  private def handScores(
      docs: Seq[(Long, String, Boolean)]): Map[Long, Double] = {
    def bucket(tok: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(3)
    }
    val all = docs.flatMap { case (_, t, isT) =>
      t.split(" ", -1).map(tok => (bucket(tok), isT))
    }
    val nRaw = all.size.toLong
    val nTgt = all.count(_._2).toLong
    val byB = all.groupBy(_._1).map { case (b, xs) =>
      b -> (xs.size.toLong, xs.count(_._2).toLong)
    }
    docs.map { case (id, t, _) =>
      val s = t.split(" ", -1).map { tok =>
        val (r, g) = byB(bucket(tok))
        math.log((g + 1).toDouble / (nTgt + B)) -
          math.log((r + 1).toDouble / (nRaw + B))
      }.sum
      id -> BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  test("importance scores match the hand-computed LLR formula") {
    val docs = Seq(
      (1L, "alpha beta", true), (2L, "alpha gamma", true),
      (3L, "delta delta", false), (4L, "alpha delta", false))
    val got = ImportanceSampling
      .importanceScores(corpus, col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = handScores(docs)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - want(id)) < 1e-9, s"doc $id: $s vs ${want(id)}")
    }
    // target-aligned docs (alpha/beta/gamma heavy) must outrank the
    // delta-only doc
    assert(got(1L) > got(3L) && got(2L) > got(3L))
  }

  test("selectTopK is the deterministic head of the score ranking") {
    val top2 = ImportanceSampling.selectTopK(corpus, col("is_t"), k = 2)
      .collect().map(_.getLong(0))
    val all = ImportanceSampling.importanceScores(corpus, col("is_t"))
      .orderBy(col("importance").desc, col("doc_id").asc)
      .collect().map(_.getLong(0))
    assert(top2.toSeq == all.take(2).toSeq)
  }

  test("Gumbel resample is salt-deterministic and softmax-biased") {
    def draw(salt: String): Seq[Long] =
      ImportanceSampling.resampleGumbel(
        corpus, col("is_t"), k = 2, temperature = 0.05, salt = salt)
        .collect().map(_.getLong(0)).toSeq
    // replayable: same salt, same sample
    assert(draw("s1") == draw("s1"))
    // bias: at a cold temperature the softmax concentrates on the top
    // scores, so across many salts the worst doc almost never appears
    val worst = ImportanceSampling.importanceScores(corpus, col("is_t"))
      .orderBy(col("importance").asc).first().getLong(0)
    val picks = (1 to 12).flatMap(i => draw(s"salt$i"))
    assert(picks.count(_ == worst) <= 2,
      s"worst doc $worst drawn ${picks.count(_ == worst)}/12 at T=0.05")
  }

  test("empty target subset degrades gracefully (uniform target prior)") {
    val scored = ImportanceSampling
      .importanceScores(corpus, lit(false))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored.size == 4)
    // with no target mass every bucket weight is log(1/(0+B)) minus the
    // raw term — finite, and rarer tokens score HIGHER (less raw mass)
    assert(scored.values.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("scoring join broadcasts the bucket-weight table (plan shape)") {
    val plan = ImportanceSampling
      .importanceScores(corpus, col("is_t"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"weight-table join must broadcast, got:\n$plan")
  }

  test("selection is distributed top-k, never a global sort or window") {
    val plan = ImportanceSampling.selectTopK(corpus, col("is_t"), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"selection must plan as TakeOrderedAndProject, got:\n$plan")
    assert(!plan.contains("Window"), s"no window in the selection:\n$plan")
  }
}
