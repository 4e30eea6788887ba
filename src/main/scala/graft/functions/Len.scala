package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, OctetLength}

/** The reference's single custom scalar UDF: `len(BINARY) -> BIGINT`, the
  * byte length of a binary payload (reference:
  * crates/cdl-fs/src/functions/len.rs:20-83, registered at
  * crates/cdl-fs/src/lib.rs:261).
  *
  * Spark-first design: we do NOT write a UDF. Spark's codegen'd
  * `OctetLength` expression already computes byte length of
  * BINARY/STRING; `len` is registered as a thin SQL alias so reference
  * queries (`SELECT len(data) FROM rootfs`) run unchanged while staying
  * inside whole-stage codegen. The reference returns Int64; OctetLength
  * returns Int32, so we wrap with a cast to keep the contract.
  */
object Len {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "len",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"len() takes 1 argument, got ${exprs.length}")
        org.apache.spark.sql.catalyst.expressions.Cast(
          OctetLength(exprs.head),
          org.apache.spark.sql.types.LongType)
      },
      "scala_udf")
  }
}
