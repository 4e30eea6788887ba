package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join: for each left row, attach the single right row
  * with the greatest `rightTime <= leftTime` for the same key (the
  * point-in-time join of market-data and feature-store pipelines; Spark
  * has no native operator for it).
  *
  * Built by composition — preference (a) of the custom-operator ladder:
  * tag both inputs, union them, and carry the latest right payload
  * forward with `last(_, ignoreNulls)` over a (key, time)-ordered window.
  * ONE shuffle on the key, sort within partitions, no range-join blowup:
  * cost is O(|L|+|R|) rows shuffled regardless of how many right rows
  * precede each left row — the plan a custom SparkPlan would produce,
  * without leaving Catalyst.
  */
object AsOf {

  /** @param rightTieBreak column of `right` used to order right rows that
    *   share (key, time) — the largest wins; pass a unique column for
    *   deterministic output. */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: Option[String] = None): DataFrame = {
    val lStruct = StructType(left.schema.fields)
    val rStruct = StructType(right.schema.fields)
    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__tag"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__l"),
      lit(null).cast(rStruct).as("__r"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__tag"),
      lit(null).cast(lStruct).as("__l"),
      struct(right.columns.toIndexedSeq.map(col): _*).as("__r"))
    val tie = rightTieBreak.map(c => col(s"__r.$c").asc_nulls_first)
      .getOrElse(col("__tag").asc)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__tag").asc, tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lCols = left.columns.map(c => col(s"__l.$c").as(c))
    val rCols = right.columns.map(c => col(s"__match.$c").as(c))
    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select((lCols ++ rCols).toIndexedSeq: _*)
  }
}
