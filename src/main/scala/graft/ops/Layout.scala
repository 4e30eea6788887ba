package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering — Z-order (Morton) interleaving for
  * multi-column data skipping: rows close in (x, y) key space land in
  * the same files, so per-file min/max statistics prune scans filtered
  * on EITHER key (a single-column sort only prunes its leading column).
  *
  * Scale design: the Morton code is a pure codegen'd bitwise expression
  * (shift/and/or terms — no UDF, no custom Expression needed), and
  * clustering is `repartitionByRange` + `sortWithinPartitions` on it —
  * one range-exchange whose sampling pass Spark already parallelizes.
  * At 100 TB this is the standard OPTIMIZE/z-order write pattern: the
  * expensive part is the one range shuffle, after which every file's
  * (x, y) bounding box is tight.
  *
  * The reference (SmartX-Team/connected-data-lake) relies on its
  * dataset's insertion order for locality (`scan_in_order(true)`,
  * crates/cdl-fs/src/lib.rs:256-258); this op generalizes that to
  * multi-key locality, Spark-first.
  */
object Layout {

  /** Morton (Z-order) code of the lower `bits` bits of two non-negative
    * integer keys: bit b of x lands at position 2b, bit b of y at 2b+1.
    * Keys are masked to `bits` (callers pick a width covering their key
    * domain; 16+16 covers the TPC-H part/supp keys through sf0.1). */
  def morton2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { b =>
      Seq(
        shiftleft(shiftrightunsigned(x.cast("long"), b).bitwiseAND(lit(1L)), 2 * b),
        shiftleft(shiftrightunsigned(y.cast("long"), b).bitwiseAND(lit(1L)), 2 * b + 1))
    }
    terms.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Cluster `df` into `numFiles` range partitions by the Morton code of
    * (xCol, yCol), sorted within each partition — the z-order write
    * layout. Each output partition (→ file) then carries a tight
    * min/max box over BOTH keys for stats-based skipping. */
  def clusterByZOrder(
      df: DataFrame,
      xCol: String,
      yCol: String,
      numFiles: Int,
      bits: Int = 16): DataFrame = {
    val z = morton2(col(xCol), col(yCol), bits).as("__zorder")
    df.withColumn("__zorder", z)
      .repartitionByRange(numFiles, col("__zorder"))
      .sortWithinPartitions("__zorder")
      .drop("__zorder")
  }
}
