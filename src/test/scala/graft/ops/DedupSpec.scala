package graft.ops

import graft.SparkSuite

/** Dedup operators on a corpus with planted exact and near duplicates —
  * the semantic assertions the synthetic testdata (no true dups) can't
  * exercise. */
class DedupSpec extends SparkSuite {

  import org.apache.spark.sql.functions._

  private lazy val docs = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away " +
      "into the deep green forest while birds sing songs above the tall trees"
    val near = base.replace("lazy dog", "sleepy dog") // 1-token change
    val far = "completely different text about spark shuffles partitions " +
      "joins aggregates windows and the catalyst optimizer pipeline stages"
    Seq(
      (0L, base), (1L, base),         // exact dup pair
      (2L, near),                     // near-dup of 0/1
      (3L, far),
      (4L, "the " + base)             // shifted near-dup
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts, keeps min doc_id") {
    val r = Dedup.exact(docs).collect()
    assert(r.length == 4) // 5 docs, one exact-dup pair
    val dup = r.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keep_doc_id") == 0L)
  }

  test("fingerprint dedup normalizes whitespace and case") {
    import spark.implicits._
    val d = Seq((0L, "Hello  World"), (1L, "hello world"), (2L, "other"))
      .toDF("doc_id", "text")
    val r = Dedup.byFingerprint(d).collect()
    assert(r.length == 2)
    assert(r.find(_.getAs[Long]("n_copies") == 2).get.getAs[Long]("keep_doc_id") == 0L)
  }

  test("ngram jaccard finds the near-dup pairs and not the unrelated doc") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // exact dup -> jaccard 1.0
    assert(pairs.contains((0L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated
  }

  test("df cap drops stop-shingles: no pair via the common phrase, near-dups survive") {
    import spark.implicits._
    // 60 unrelated docs sharing ONE stop phrase (every doc starts with it),
    // plus a planted near-dup pair with substantial real overlap
    val stop = "breaking news update today"
    val unrelated = (0 until 60).map { i =>
      (i.toLong, s"$stop item$i alpha$i beta$i gamma$i delta$i epsilon$i")
    }
    val nearA = (100L, s"$stop spark shuffles partition joins aggregates windows catalyst")
    val nearB = (101L, s"$stop spark shuffles partition joins aggregates windows optimizer")
    val d = (unrelated :+ nearA :+ nearB).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(d, n = 3, threshold = 0.05, dfCap = 10)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // the stop-phrase group (df=62 > cap) is dropped BEFORE pair expansion:
    // unrelated docs share nothing else, so they produce no pair at all
    assert(pairs == Set((100L, 101L)), pairs)
    // uncapped, the same corpus would expand 62·61/2 pairs from that one
    // group — the quadratic shape the cap exists to prevent
    val uncapped = Dedup.ngramJaccardPairs(d, n = 3, threshold = 0.0)
      .count()
    assert(uncapped > 1000L)
  }

  test("minhash LSH surfaces near-dup candidates with high est_jaccard") {
    val pairs = Dedup.minhashLshPairs(docs, threshold = 0.5).collect()
    val keys = pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(keys.contains((0L, 1L)))
    val exact = pairs.find(r =>
      r.getAs[Long]("doc_a") == 0L && r.getAs[Long]("doc_b") == 1L).get
    assert(exact.getAs[Double]("est_jaccard") == 1.0)
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash signature is deterministic across runs") {
    def sigs() = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(sigs() == sigs())
  }

  test("identical docs share a signature; near-dups agree on most positions") {
    val s = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(s(0L) == s(1L))
    val agree02 = s(0L).zip(s(2L)).count { case (x, y) => x == y }
    assert(agree02 > 32, s"near-dup agreement $agree02/64")
  }

  test("simhash: near-identical docs within small hamming distance") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 12).collect()
    val keys = pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(keys.contains((0L, 1L))) // identical -> hamming 0
    val h01 = pairs.find(r =>
      r.getAs[Long]("doc_a") == 0L && r.getAs[Long]("doc_b") == 1L).get
    assert(h01.getAs[Long]("hamming") == 0L)
  }

  test("simhash multi-index banding is complete at exactly the requested radius") {
    import spark.implicits._
    // planted signatures around base 0L:
    //  - 3 flips landing in 3 DIFFERENT 16-bit bands (the radius-3 worst
    //    case: only one band left intact) -> MUST be found at radius 3
    //  - 4 flips at bits 0,16,32,48 — under the radius-3 4×16 layout they
    //    hit all 4 bands (no shared band, the pre-r3 blind spot); under
    //    the radius-4 5-band layout (widths 13,13,13,13,12) they touch
    //    only 4 of 5 bands, so the pair MUST be found at radius 4
    val threeFlips = (1L << 0) | (1L << 16) | (1L << 32)
    val fourFlips = (1L << 0) | (1L << 16) | (1L << 32) | (1L << 48)
    val sigs = Seq((0L, 0L), (1L, threeFlips), (2L, fourFlips))
      .toDF("doc_id", "simhash")
    def run(r: Int) = Dedup.simhashPairsFromSignatures(sigs, maxHamming = r)
      .collect().map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b"))).toSet
    val at3 = run(3)
    assert(at3.contains((0L, 1L)), s"worst-case radius-3 pair missed: $at3")
    assert(!at3.contains((0L, 2L))) // hamming 4 > 3: correctly excluded
    val at4 = run(4)
    assert(at4.contains((0L, 1L)))
    assert(at4.contains((0L, 2L)), s"radius-4 completeness violated: $at4")
    // radius 0 degenerates to exact-signature blocking: nothing matches
    assert(run(0) == Set.empty)
  }

  test("keepRepresentatives keeps cluster minima and untouched singletons") {
    import spark.implicits._
    // pairs chain 0-1-2 into one cluster; 3 pairs with 4; 9 is a singleton
    val d = (0L to 4L).map(i => (i, s"text$i")) :+ ((9L, "alone"))
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val kept = Dedup.keepRepresentatives(d.toDF("doc_id", "text"), pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 3L, 9L))
    // differential on a generated corpus: survivors = every cluster's
    // min + all unpaired docs, per the near-dup pairs the engine found
    val corpus = docs
    val p = Dedup.ngramJaccardPairs(corpus, n = 3, threshold = 0.5)
    val labels = Components.ofPairs(p).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = corpus.select("doc_id").collect().map(_.getLong(0))
      .filter(id => labels.get(id).forall(_ == id)).toSet
    val got = Dedup.keepRepresentatives(corpus, p)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  // shared brute-force reference: exact token-3-gram jaccard pair set at a
  // threshold, matching ngramJaccardPairs' rounding (4dp HALF_UP)
  private def bruteJaccard(corpus: Seq[(Long, String)], threshold: Double)
      : Map[(Long, Long), (Long, Double)] = {
    def grams(s: String): Set[String] =
      s.split(" ").toSeq.sliding(3).map(_.mkString(" ")).toSet
    (for {
      (i, ti) <- corpus; (j, tj) <- corpus if i < j
      inter = (grams(ti) & grams(tj)).size if inter > 0
      jac = BigDecimal(inter.toDouble /
        (grams(ti).size + grams(tj).size - inter))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jac >= threshold
    } yield (i, j) -> (inter.toLong, jac)).toMap
  }

  test("minhash-LSH near-dup pairs equal the exact jaccard pair set (differential)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    def doc(): Seq[String] = Seq.fill(40)(vocab(rnd.nextInt(vocab.size)))
    val bases = (0L until 20L).map(i => i -> doc())
    // near-dups of the first 10: one mid-token swapped in a 40-token doc
    // -> 3-gram jaccard ~ 0.85, above the 0.8 verify threshold
    val variants = (0L until 10L).map { i =>
      (100L + i) -> bases(i.toInt)._2.updated(20, "omega")
    }
    val corpus = (bases ++ variants).map { case (i, t) => (i, t.mkString(" ")) }
    val want = bruteJaccard(corpus, 0.8)
    val got = Dedup.minhashLshNearDupPairs(
      corpus.toDF("doc_id", "text"), n = 3, threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("n_common"), r.getAs[Double]("jaccard")))).toMap
    // full equality: banding found every qualifying pair (recall 1 on this
    // corpus) and the exact verify produced the true jaccard values
    assert(got == want, s"got=${got.keySet} want=${want.keySet}")
    assert(want.size >= 10, s"degenerate corpus: ${want.size} true pairs")
  }

  test("simhash near-dup output is a verified subset; identical docs always found") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val vocab = Vector("red", "blue", "green", "gold", "iron", "clay", "snow", "rain")
    def doc(): String = Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = (0L until 15L).map(i => i -> doc())
    val clones = (0L until 5L).map(i => (100L + i) -> bases(i.toInt)._2)
    val corpus = bases ++ clones
    val want = bruteJaccard(corpus, 0.9)
    val got = Dedup.simhashNearDupPairs(
      corpus.toDF("doc_id", "text"), n = 3, threshold = 0.9)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("n_common"), r.getAs[Double]("jaccard")))).toMap
    // exact verify: no false positives, true jaccard values on what's found
    assert(got.keySet.subsetOf(want.keySet), s"false positives: ${got.keySet -- want.keySet}")
    got.foreach { case (k, v) => assert(v == want(k), s"pair $k values") }
    // hamming-0 pairs (identical docs) are guaranteed by pigeonhole at any radius
    (0L until 5L).foreach { i =>
      assert(got.contains((i, 100L + i)), s"identical pair ($i,${100 + i}) missed")
    }
  }

  test("random corpora match a brute-force jaccard reference (differential)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val corpus = (0L until 40L).map(i => (i,
      Seq.fill(8 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    def grams(s: String): Set[String] =
      s.split(" ").toSeq.sliding(3).map(_.mkString(" ")).toSet
    val want = (for {
      (i, ti) <- corpus; (j, tj) <- corpus if i < j
      inter = (grams(ti) & grams(tj)).size if inter > 0
      jac = BigDecimal(inter.toDouble /
        (grams(ti).size + grams(tj).size - inter))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jac >= 0.01
    } yield (i, j) -> (inter.toLong, jac)).toMap
    val got = Dedup.ngramJaccardPairs(
      corpus.toDF("doc_id", "text"), n = 3, threshold = 0.01)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("n_common"), r.getAs[Double]("jaccard")))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (n, j)) =>
      assert(n == want(k)._1, s"pair $k n_common")
      assert(math.abs(j - want(k)._2) < 1e-9, s"pair $k jaccard")
    }
    assert(got.nonEmpty)
  }
}
