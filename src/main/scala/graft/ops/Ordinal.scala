package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scalable global row-ordinal assignment — the replacement for the
  * classic `row_number() OVER (ORDER BY …)` anti-pattern, which funnels
  * the entire table through ONE partition (Spark literally warns
  * "Moving all data to a single partition").
  *
  * Plan shape instead: range-repartition on the order keys (parallel
  * sample + shuffle), count rows per partition (a #partitions-sized
  * driver collect — KB at 100 TB), then stamp
  * `row_id = partition_base + rank_within_partition` with a window
  * PARTITIONED by the range bucket. Every stage is distributed; the only
  * driver state is one long per partition. Same two-pass scheme as
  * RDD.zipWithIndex, kept in DataFrame land so the result remains a
  * Catalyst plan.
  */
object Ordinal {

  /** Stamped frame + total row count + a release() dropping the pinned
    * intermediate (call after the consuming action finishes). */
  final case class Stamped(df: DataFrame, total: Long, release: () => Unit)

  /** `df` plus a 0-based `idCol` dense ordinal in `ord` order, and the
    * total row count. `ord` must be a total (deterministic) ordering for
    * the ordinals to be reproducible across runs.
    *
    * The ranged intermediate is persisted: range partitioning samples its
    * bounds, so the count pass and the stamp pass must observe the SAME
    * physical layout. Caller owns unpersisting via the returned handle.
    */
  def stampWithCount(
      df: DataFrame,
      ord: Seq[Column],
      idCol: String = "row_id"): Stamped = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    // the nonce makes each stamp's cached plan CANONICALLY UNIQUE:
    // without it, stamping the same table directory twice (e.g. after an
    // append, while the superseded stamp is still pinned for live lazy
    // frames) canonicalizes to the SAME plan, and Spark's CacheManager
    // dedupes the second persist onto the first's entry — silently
    // serving the OLD snapshot's rows to the new stamp ("Asked to cache
    // already cached data"). A distinct literal defeats the dedupe; the
    // column is dropped from the returned frame.
    val nonce = java.util.UUID.randomUUID().toString
    val ranged = df
      .repartitionByRange(parts, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__stamp_nonce", lit(nonce))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = ranged.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val bases = counts.scanLeft(0L)(_ + _._2)
    val baseOf = counts.map(_._1).zip(bases).toMap
    val total = bases.lastOption.getOrElse(0L)
    // broadcast join on the tiny (pid → base) table: no assumptions about
    // partition-count fitting in a literal expression
    val baseDf = spark.createDataFrame(
      baseOf.toSeq.map { case (p, b) => (p, b) }).toDF("__pid", "__base")
    val w = Window.partitionBy("__pid").orderBy(ord: _*)
    val stamped = ranged
      .join(broadcast(baseDf), Seq("__pid"))
      .withColumn(idCol,
        col("__base") + row_number().over(w).cast("long") - 1L)
      .drop("__pid", "__base", "__stamp_nonce")
    Stamped(stamped, total, () => { ranged.unpersist(); () })
  }

  /** Fire-and-forget variant. The pinned intermediate stays cached for
    * the life of the returned plan — it CANNOT be released eagerly:
    * RangePartitioner's sample seed incorporates the RDD id, so a
    * recompute after unpersist draws different bounds and the stamped
    * ordinals silently change (caught by OrdinalSpec when tried).
    * Long-lived sessions issuing many stamps should prefer
    * `stampWithCount` and release after consuming; batch runners bound
    * the accumulation with `spark.catalog.clearCache()` between queries. */
  def stamp(df: DataFrame, ord: Seq[Column], idCol: String = "row_id"): DataFrame =
    stampWithCount(df, ord, idCol).df
}
