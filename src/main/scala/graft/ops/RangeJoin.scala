package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: pairs of rows with the same key whose times lie
  * within ±`band` of each other.
  *
  * A naive theta-join (`abs(l.t - r.t) <= band`) plans as a nested-loop
  * per key — quadratic in the hot keys. The scalable form buckets time
  * into band-width bins and equi-joins on (key, bin), with each left row
  * probing its own bin and the two adjacent ones; the exact predicate
  * then filters within the ~3-bucket candidate set. Shuffle key is
  * (key, bin) — bounded candidates per task, uniform distribution.
  */
object RangeJoin {

  /** Self range-join of an event table: for each (key, time) row the
    * number of OTHER rows of the same key within ±band ms. */
  def selfPairsWithinBand(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      idCol: String,
      band: Long): DataFrame = {
    val base = df.select(col(keyCol).as("k"), col(timeCol).as("t"),
      col(idCol).as("id"))
    val probe = base.withColumn("bin",
      explode(array((-1 to 1).map(d => expr(s"t div $band") + d): _*)))
    val build = base
      .withColumnRenamed("t", "rt").withColumnRenamed("id", "rid")
      .withColumn("bin", expr(s"rt div $band"))
    probe.join(build, Seq("k", "bin"))
      .filter(col("rid") =!= col("id") &&
        abs(col("rt") - col("t")) <= band)
      .select(col("k"), col("id"), col("rid"))
      .distinct()
  }
}
