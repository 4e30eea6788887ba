package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, OctetLength}
import org.apache.spark.sql.types.LongType

import graft.functions.{CosineSimilarity, LshSignature, RabinFingerprint, VectorDot}

/** Session extensions registering the engine's SQL functions at session
  * build time — `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) makes `len`,
  * `rabin_fingerprint`, and the vector kernels (`vec_dot`, `cosine_sim`,
  * `lsh_signature`) available cluster-wide without per-session
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
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "vec_dot() takes 2 arguments")
        VectorDot(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "cosine_sim() takes 2 arguments")
        CosineSimilarity(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("lsh_signature"),
      new ExpressionInfo(classOf[LshSignature].getName, "lsh_signature"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "lsh_signature() takes (vec, planes)")
        val planes = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"lsh_signature planes must be an int literal, got $other")
        }
        LshSignature(exprs(0), planes)
      }))
  }
}
