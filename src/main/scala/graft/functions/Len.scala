package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Length, OctetLength}

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
  *
  * Registration is type-dispatched because Spark 4 ships its OWN `len`
  * builtin — the CHARACTER-length alias of `length` — and a blanket
  * octet-length override would silently change `len('héllo')` from 5 to
  * 6 for every user string query in the session. BINARY arguments keep
  * the reference's byte semantics (identical to the builtin's there);
  * everything else gets the builtin's character semantics. The child is
  * resolved by the time the registry builder runs (analysis is
  * bottom-up); a still-unresolved child keeps the reference's byte
  * semantics, the contract this alias exists for. */
object Len {
  /** The ONE builder — shared by the temp-function registration here
    * and the `GraftExtensions` injection, so the two paths cannot
    * drift. */
  private[graft] val builder: Seq[Expression] => Expression =
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, s"len() takes 1 argument, got ${exprs.length}")
      val e = exprs.head
      val bytes = e.resolved &&
        e.dataType == org.apache.spark.sql.types.BinaryType
      org.apache.spark.sql.catalyst.expressions.Cast(
        if (bytes || !e.resolved) OctetLength(e) else Length(e),
        org.apache.spark.sql.types.LongType)
    }

  def register(spark: SparkSession): Unit =
    // once-per-session guard (r16 verdict #8, see RegisterOnce): always
    // REPLACES — Spark 4's builtin `len` is INT character/byte length,
    // the engine's is BIGINT byte length, so a name-existence probe
    // would wrongly keep the builtin
    RegisterOnce(spark, "len") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "len", builder, "scala_udf")
    }
}
