package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection by importance resampling (the DSIR recipe: score every
  * document by how much more likely its hashed-n-gram bag is under a
  * TARGET distribution than under the RAW corpus distribution, then keep
  * the top of that ranking — deterministically, or by Gumbel-top-k
  * weighted sampling without replacement). The selection step a
  * pretraining pipeline runs between dedup and tokenization when it
  * wants "more like this high-quality subset" out of a raw crawl.
  *
  * Everything is deterministic and engine-portable by construction —
  * the same md5-prefix idiom as `Sampling` (hash features, Gumbel
  * noise), so a SQL engine reproduces the selection bit-for-bit:
  *
  *  - feature = md5-hex-prefix bucket of each whitespace token
  *    (`B` = 4096 buckets; the paper's hashed n-gram generalization of
  *    a unigram LM, collision-tolerant by design);
  *  - per-bucket weight = log ((n_target+1)/(N_target+B)) −
  *    log ((n_raw+1)/(N_raw+B)) (add-one smoothing on both sides);
  *  - document importance = Σ weight(bucket(token)) over token
  *    OCCURRENCES, rounded at 4 dp BEFORE ranking (the BM25 rule: float
  *    association order must never flip a rank across engines);
  *  - Gumbel key = importance/temperature − ln(−ln u) with u drawn
  *    from the md5 of (salt, id) — top-k by key IS sampling without
  *    replacement proportional to softmax(importance/T) (the standard
  *    Gumbel-top-k identity), yet replayable from the salt alone.
  *
  * Scale shape: two corpus passes, both shuffle-light. Pass 1 builds
  * the bucket table — explode tokens, ONE (bucket, count, count-if-
  * target) aggregation with map-side partials over at most B=4096
  * groups, collected whole (an O(B) driver edge) so totals and the
  * weight broadcast never re-run it. Pass 2 scores — explode tokens, broadcast-join the ≤4096-row
  * weight table, per-doc sum. Selection is orderBy+limit (per-partition
  * top-k merged on the driver — never a global single-partition
  * window). At 100 TB nothing here holds state beyond B rows plus one
  * k-row result. */
object ImportanceSampling {

  /** Feature-space size: 3 hex chars = 4096 buckets. */
  val B = 4096

  // the corpus tokenization convention, by name — DSIR's feature space
  // must stay in sync with BM25/BudgetSample/the oracle SQL
  private def tokensOf(text: Column): Column = TextAnalysis.tokens(text)

  /** Hashed feature bucket of one token — the 3-char md5 prefix, kept
    * AS the hex string (both engines substring md5 identically; parsing
    * to int would add nothing). */
  def bucket(token: Column): Column = substring(md5(token), 1, 3)

  /** Per-bucket log-likelihood-ratio weight table (≤ B rows): target
    * distribution from the rows matching `targetCond`, raw from all of
    * `docs`. Buckets never seen in the corpus don't need rows — every
    * token scored in pass 2 came from this same corpus. */
  def bucketWeights(
      docs: DataFrame,
      targetCond: Column,
      textCol: String = "text"): DataFrame = {
    val tok = docs
      .select(explode(tokensOf(col(textCol))).as("token"),
        coalesce(targetCond, lit(false)).as("__t"))
      .select(bucket(col("token")).as("bucket"), col("__t"))
    // ONE corpus aggregate, collected whole (≤ B = 4096 rows — an O(B)
    // driver edge); totals and weights are then local arithmetic, so
    // neither a totals job nor the later broadcast re-runs the
    // explode+groupBy corpus pass. math.log is java.lang.Math.log,
    // the same function Spark's `log` expression evaluates — weights
    // are bit-identical to the previous in-plan form.
    val countRows = tok.groupBy("bucket")
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("n_tgt"))
      .collect()
    val nRaw = countRows.iterator.map(_.getLong(1)).sum
    val nTgt = countRows.iterator.map(_.getLong(2)).sum
    val weights = countRows.toSeq.map { r =>
      (r.getString(0),
        math.log((r.getLong(2) + 1).toDouble / (nTgt + B)) -
          math.log((r.getLong(1) + 1).toDouble / (nRaw + B)))
    }
    docs.sparkSession.createDataFrame(weights).toDF("bucket", "w")
  }

  /** Per-document importance: Σ over token occurrences of the bucket
    * weight, rounded at 4 dp. Output (idCol, importance). */
  def importanceScores(
      docs: DataFrame,
      targetCond: Column,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val w = bucketWeights(docs, targetCond, textCol)
    docs.select(col(idCol), explode(tokensOf(col(textCol))).as("token"))
      .select(col(idCol), bucket(col("token")).as("bucket"))
      .join(broadcast(w), "bucket")
      .groupBy(idCol)
      .agg(round(sum(col("w")), 4).as("importance"))
  }

  /** Deterministic selection: the k highest-importance documents
    * (ties broken by id — a total order, so any engine agrees). */
  def selectTopK(
      docs: DataFrame,
      targetCond: Column,
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    importanceScores(docs, targetCond, idCol, textCol)
      .orderBy(col("importance").desc, col(idCol).asc)
      .limit(k)

  /** Seeded uniform in (0,1) from the md5 of (salt, key): six hex
    * digits read positionally — ascii-decoded, NOT `conv`-parsed, so
    * the same arithmetic runs on any SQL engine — plus half an ulp so
    * u is never exactly 0 (ln(−ln 0) is undefined). */
  private def seededUniform(key: Column, salt: String): Column = {
    val h = md5(concat(lit(salt), key.cast("string")))
    def digit(i: Int): Column = {
      val c = ascii(substring(h, i, 1))
      c - when(c >= 97, 87).otherwise(48)
    }
    (1 to 6).map(i => digit(i) * lit(math.pow(16, -i)))
      .reduce(_ + _) + lit(0.5 * math.pow(16, -6))
  }

  /** Gumbel-top-k importance RESAMPLING: k documents sampled without
    * replacement with probability proportional to
    * softmax(importance / temperature), deterministic given `salt`.
    * Output (idCol, importance, gumbel_key) ordered by the noisy key. */
  def resampleGumbel(
      docs: DataFrame,
      targetCond: Column,
      k: Int,
      temperature: Double = 1.0,
      salt: String = "dsir",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(temperature > 0, s"temperature must be positive: $temperature")
    val scored = importanceScores(docs, targetCond, idCol, textCol)
    val g = -log(-log(seededUniform(col(idCol), salt)))
    scored
      .withColumn("gumbel_key",
        round(col("importance") / temperature + g, 4))
      .orderBy(col("gumbel_key").desc, col(idCol).asc)
      .limit(k)
  }
}
