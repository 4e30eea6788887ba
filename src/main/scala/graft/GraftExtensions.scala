package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, OctetLength}
import org.apache.spark.sql.types.LongType

import graft.functions.RabinFingerprint

/** Session extensions registering the engine's SQL functions at session
  * build time — `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) makes `len` and
  * `rabin_fingerprint` available cluster-wide without per-session
  * registration calls. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("len"),
      new ExpressionInfo(classOf[OctetLength].getName, "len"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"len() takes 1 argument, got ${exprs.length}")
        Cast(OctetLength(exprs.head), LongType)
      }))
    e.injectFunction((
      FunctionIdentifier("rabin_fingerprint"),
      new ExpressionInfo(classOf[RabinFingerprint].getName, "rabin_fingerprint"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"rabin_fingerprint() takes 1 argument, got ${exprs.length}")
        RabinFingerprint(exprs.head)
      }))
  }
}
