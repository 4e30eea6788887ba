package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for training-data
  * pipelines. All decisions are pure functions of a KEY (doc id, url,
  * fingerprint), never of `rand()`:
  *
  *  - reproducible across runs, engines, and partitionings (Spark's
  *    `sample()` draws per-partition, so output changes whenever the
  *    physical layout does — useless for frozen eval splits);
  *  - stable under data growth: a document's split never changes when
  *    other documents are added, which is what keeps a held-out set
  *    uncontaminated across dataset versions;
  *  - embarrassingly parallel at 100 TB: a codegen'd filter on a hash
  *    prefix, no shuffle, no state.
  *
  * The uniform variate is the first 4 hex chars of md5(salt ‖ key) —
  * 65,536 buckets, so requested fractions are honored at 2⁻¹⁶
  * granularity. md5 lowercase-hex ordering is identical in every engine,
  * which is what makes these operators DuckDB-oracle-checkable (unlike
  * xxhash64, which exists only in Spark).
  */
object Sampling {

  /** 4-hex-digit bucket of md5(salt ‖ key), compared as a string. */
  private def bucket(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key)), 1, 4)

  /** Threshold hex string for a fraction; `"g"` sorts above every hex
    * digit so fraction ≥ 1.0 keeps everything. */
  def thresholdHex(fraction: Double): String =
    if (fraction >= 1.0) "g"
    else f"${(math.floor(fraction * 65536).toLong max 0L)}%04x"

  /** Bernoulli-by-hash sample: keep rows whose key-bucket falls below
    * `fraction`. Different `salt`s draw independent samples. */
  def hashSample(
      df: DataFrame,
      key: Column,
      fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(bucket(key, salt) < lit(thresholdHex(fraction)))

  /** Disjoint, exhaustive split assignment (train/val/test …): adds
    * `outCol` with the split name chosen by the key's bucket against the
    * cumulative fraction thresholds. Fractions must sum to 1.
    *
    * NULL keys are dropped, matching `hashSample`/`mixtureSample` — a
    * null key hashes to NULL, every threshold comparison is UNKNOWN,
    * and the when-chain's `otherwise` would silently dump every
    * null-key row into the LAST split (typically the held-out set).
    * One family-wide rule — mint keys upstream — beats three silent
    * per-operator behaviors. */
  def assignSplits(
      df: DataFrame,
      key: Column,
      splits: Seq[(String, Double)],
      salt: String = "split",
      outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $splits")
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val b = bucket(key, salt)
    // when-chain over cumulative thresholds; the last split is the
    // `otherwise` so rounding never drops a row
    val labeled = splits.init.zip(cum.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), c)) =>
        val cond = b < lit(thresholdHex(c))
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
      }
      .fold(lit(splits.head._1))(_.otherwise(splits.last._1))
    df.filter(key.isNotNull).withColumn(outCol, labeled)
  }

  /** Source-mixture sample — the "data mixing" step of a training
    * recipe: each source keeps its own Bernoulli fraction (weights like
    * {wiki → 1.0, crawl → 0.25}), sources absent from the map keep
    * `defaultFraction`. Same hash-thresholding as `hashSample`, so the
    * draw is reproducible, independent across salts, stable under data
    * growth, and a map-only codegen filter — mixing a 100 TB corpus is
    * one scan, no shuffle. A document's fate depends only on (salt, key,
    * its own source's weight): re-weighting one source never re-rolls
    * another's sample. */
  def mixtureSample(
      df: DataFrame,
      sourceCol: String,
      key: Column,
      weights: Map[String, Double],
      defaultFraction: Double = 0.0,
      salt: String = "mix"): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0) &&
      defaultFraction >= 0.0 && defaultFraction <= 1.0,
      s"fractions must be in [0,1]: $weights default=$defaultFraction")
    // when-chain in sorted-source order so the plan is deterministic
    val thresh = weights.toSeq.sortBy(_._1)
      .foldLeft(Option.empty[Column]) { case (acc, (src, f)) =>
        val cond = col(sourceCol) === src
        val hex = lit(thresholdHex(f))
        Some(acc.fold(when(cond, hex))(_.when(cond, hex)))
      }
      .fold(lit(thresholdHex(defaultFraction)): Column)(
        _.otherwise(thresholdHex(defaultFraction)))
    df.filter(bucket(key, salt) < thresh)
  }

  /** Exactly-k-per-stratum sample: rank rows within each stratum by
    * md5(key) (full digest — ties only on identical keys, broken by the
    * key itself) and keep `rank ≤ k`. One shuffle on the strata
    * columns; skewed strata are a bounded top-k per group, not a sort of
    * the whole stratum through one task (WindowExec sorts within
    * partitions after hash-partitioning on the strata key). */
  def stratifiedSample(
      df: DataFrame,
      strata: Seq[String],
      key: Column,
      k: Int,
      salt: String = ""): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(md5(concat(lit(salt), key)), key)
    // null keys dropped (the family rule — see assignSplits): a NULL
    // ordering key would sort FIRST and be deterministically preferred
    // into every stratum's sample
    df.filter(key.isNotNull)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
