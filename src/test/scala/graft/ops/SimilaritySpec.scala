package graft.ops

import graft.SparkSuite

class SimilaritySpec extends SparkSuite {

  import org.apache.spark.sql.functions._

  private lazy val vecs = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),  // close to 0
      (2L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to 0
      (3L, Array(0.0f, 0.9f, 0.1f)),  // close to 2
      (4L, Array(-1.0f, 0.0f, 0.0f))  // opposite of 0
    ).toDF("vec_id", "embedding")
  }

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    import spark.implicits._
    val d = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f), "same"),
      (Array(1.0f, 0.0f), Array(0.0f, 3.0f), "orth"),
      (Array(1.0f, 1.0f), Array(-1.0f, -1.0f), "opp"))
      .toDF("a", "b", "tag")
    val m = d.select(col("tag"), round(Similarity.cosine(col("a"), col("b")), 6).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("same") == 1.0 && m("orth") == 0.0 && m("opp") == -1.0)
  }

  test("bruteForceTopK ranks the geometrically nearest first") {
    val q = vecs.filter(col("vec_id") === 0L)
    val c = vecs.filter(col("vec_id") =!= 0L)
    val top = Similarity.bruteForceTopK(q, c, k = 3).collect()
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L, 3L) ||
      top.map(_.getAs[Long]("neighbor_id")).take(1).toSeq == Seq(1L))
    assert(top.head.getAs[Long]("neighbor_id") == 1L)
    assert(top.head.getAs[Int]("rank") == 1)
    assert(top.last.getAs[Long]("neighbor_id") == 4L ||
      top.head.getAs[Double]("cosine") >= top.last.getAs[Double]("cosine"))
  }

  test("two-stage top-k equals single-stage top-k (slices don't change results)") {
    val q = vecs.filter(col("vec_id") < 2)
    val c = vecs.filter(col("vec_id") >= 2)
    val a = Similarity.bruteForceTopK(q, c, k = 2, slices = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = Similarity.bruteForceTopK(q, c, k = 2, slices = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a == b)
  }

  test("lsh signature deterministic; same vector lands in same bucket") {
    val sig = vecs.select(col("vec_id"),
      Similarity.lshSignature(col("embedding"), 8).as("b"))
    val b1 = sig.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = sig.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
  }

  test("ivfTopK: exhaustive probe equals brute force; partial probe recalls most") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = embs.filter(col("vec_id") < 5)
    val c = embs.filter(col("vec_id") >= 5)
    val exact = Similarity.bruteForceTopK(q, c, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // nprobe == nlist -> every cell searched -> identical to brute force
    val full = Similarity.ivfTopK(q, c, k = 3, nlist = 16, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact)
    // partial probe: deterministic recall on this corpus, must stay useful
    val approx = Similarity.ivfTopK(q, c, k = 3, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.4, s"ivf recall $recall")
  }

  test("k-means IVF: exhaustive probe still equals brute force; recall holds") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = embs.filter(col("vec_id") < 5)
    val c = embs.filter(col("vec_id") >= 5)
    val exact = Similarity.bruteForceTopK(q, c, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Similarity.ivfTopK(q, c, k = 3, nlist = 8, nprobe = 8,
      kmeansIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact)
    val approx = Similarity.ivfTopK(q, c, k = 3, nlist = 8, nprobe = 3,
      kmeansIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.4, s"kmeans ivf recall $recall")
  }

  test("embeddingNearDupPairs surfaces a planted near-identical pair") {
    import spark.implicits._
    val planted = Seq(
      (0L, Array(1.0f, 0.01f, 0.0f, 0.02f)),
      (1L, Array(0.99f, 0.012f, 0.001f, 0.019f)), // ~same direction as 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(planted, threshold = 0.95, planes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._2 == 3L && p._1 == 2L))
  }

  test("lshPairs finds the close pair after bucket blocking") {
    // 1 plane -> 2 buckets -> near-identical vectors must collide
    val pairs = Similarity.lshPairs(vecs, planes = 1).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cosine")))
    val close = pairs.find(p => p._1 == 0L && p._2 == 1L)
    assert(close.nonEmpty && close.get._3 > 0.99)
  }

  test("lshTopKMulti with tables=1 reproduces lshTopK; more tables never lose recall") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = embs.filter(col("vec_id") < 5)
    val c = embs.filter(col("vec_id") >= 5)
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"))).toSet
    // table 0 uses planeOffset 0, so one table IS the single-table signature
    val single = keys(Similarity.lshTopK(q, c, k = 3, planes = 8))
    val multi1 = keys(Similarity.lshTopKMulti(q, c, k = 3, planes = 8, tables = 1))
    assert(multi1 == single)
    // recall vs exact top-k is monotone in the candidate union: anything
    // displacing a true top-k member from the retrieved set must beat it,
    // hence is itself a true top-k member
    val exact = keys(Similarity.bruteForceTopK(q, c, k = 3))
      .map(t => (t._1, t._2))
    def recall(s: Set[(Long, Long, Int)]) =
      (s.map(t => (t._1, t._2)) & exact).size.toDouble / exact.size
    val multi8 = keys(Similarity.lshTopKMulti(q, c, k = 3, planes = 8, tables = 8))
    assert(recall(multi8) >= recall(multi1),
      s"multi ${recall(multi8)} < single ${recall(multi1)}")
  }

  test("embeddingNearDupPairs equals the brute-force cosine pair set (differential)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val base = Array.fill(120)(Array.fill(16)(rnd.nextGaussian()))
    // 12 planted near-dups of the first vectors: tiny relative nudge
    val planted = (0 until 12).map { i =>
      val v = base(i).clone(); v(i % 16) += 0.05 * math.signum(v(i % 16)); v
    }
    val all = (base ++ planted).zipWithIndex.map { case (v, i) =>
      (i.toLong, v.map(_.toFloat))
    }
    val threshold = 0.95
    // driver-side brute force over all pairs, same 4dp rounding
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (k <- a.indices) {
        d += a(k).toDouble * b(k); na += a(k).toDouble * a(k); nb += b(k).toDouble * b(k)
      }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = (for {
      i <- all.indices; j <- all.indices if i < j
      c = cos(all(i)._2, all(j)._2) if c >= threshold
    } yield (all(i)._1, all(j)._1)).toSet
    val got = Dedup.embeddingNearDupPairs(
      all.toSeq.toDF("vec_id", "embedding"), threshold = threshold)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(want.size >= 12, s"degenerate corpus: ${want.size} true pairs")
  }

  test("lshPairsMulti with tables=1 equals lshPairs; multi finds planted pairs") {
    import spark.implicits._
    def pairKeys(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cosine"))).toSet
    val single = pairKeys(Similarity.lshPairs(vecs, planes = 4))
    val multi1 = pairKeys(Similarity.lshPairsMulti(vecs, planes = 4, tables = 1))
    assert(multi1 == single)
    // near-identical 64-dim pair: 16 tables x 8 planes must block it together
    val rnd = new scala.util.Random(3)
    val base = Array.fill(64)(rnd.nextGaussian().toFloat)
    val near = base.clone(); near(0) += 0.01f
    val far = Array.fill(64)(rnd.nextGaussian().toFloat)
    val planted = Seq((0L, base), (1L, near), (2L, far))
      .toDF("vec_id", "embedding")
    val got = pairKeys(Similarity.lshPairsMulti(planted, planes = 8, tables = 16))
      .map(t => (t._1, t._2))
    assert(got.contains((0L, 1L)), s"planted pair missed: $got")
  }

  test("planesFor: bounded occupancy, floor/ceiling clamps, monotone") {
    // floor: small corpora keep the recall-friendly minimum
    assert(Similarity.planesFor(0) == 8)
    assert(Similarity.planesFor(800) == 8)
    // occupancy contract: n / 2^planes <= targetPerBucket (above floor)
    for (n <- Seq(100000L, 1000000L, 100000000L)) {
      val p = Similarity.planesFor(n)
      assert(n.toDouble / (1L << p) <= 16.0, s"n=$n planes=$p")
    }
    // monotone in corpus size, and clamped at 24
    val ps = Seq(1000L, 100000L, 10000000L, 1000000000L, Long.MaxValue / 2)
      .map(Similarity.planesFor(_))
    assert(ps == ps.sorted)
    assert(ps.last == 24)
  }

  test("int8 quantization: known vector, exact scale/sum/saturation") {
    import spark.implicits._
    // m = 1.0; q = floor([127, -63.5, 31.75] + 0.5) = [127, -63, 32]
    val d = Seq((7L, Seq(1.0f, -0.5f, 0.25f))).toDF("vec_id", "embedding")
    val r = Similarity.quantizeInt8(d).collect().head
    assert(r.getAs[Double]("scale") == 1.0)
    assert(r.getAs[Long]("sum_q") == 127L - 63L + 32L)
    assert(r.getAs[Long]("n_max") == 1L)
    // all-zero vector: guard keeps q at 0, no NaN/null
    val z = Similarity.quantizeInt8(
      Seq((8L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")).collect().head
    assert(z.getAs[Long]("sum_q") == 0L && z.getAs[Long]("n_max") == 0L)
  }
}
