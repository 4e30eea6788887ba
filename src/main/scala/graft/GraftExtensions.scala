package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, OctetLength}
import org.apache.spark.sql.types.LongType

import graft.functions.{CosineSimilarity, LshSignature, NearestCell, NearestCellsSoft, RabinFingerprint, VectorDot}

/** Session extensions registering the engine's SQL functions at session
  * build time — `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) makes `len`,
  * `rabin_fingerprint`, and the vector kernels (`vec_dot`, `cosine_sim`,
  * `lsh_signature`) available cluster-wide without per-session
  * registration calls. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    // the ONE len builder (Len.builder): BINARY keeps the reference's
    // byte semantics, strings keep Spark 4's builtin character
    // semantics — a blanket octet override would silently change
    // len('héllo') for every user query in the session
    e.injectFunction((
      FunctionIdentifier("len"),
      new ExpressionInfo(classOf[OctetLength].getName, "len"),
      graft.functions.Len.builder))
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
        // same 2-3 arg contract as the Vec.register path — the 3-arg
        // form builds table k of a multi-table LSH index and must not
        // be available on one registration path only
        require(exprs.length == 2 || exprs.length == 3,
          "lsh_signature() takes (vec, planes[, planeOffset])")
        val off =
          if (exprs.length == 3)
            graft.functions.FnArgs.intLit(exprs(2), "lsh_signature planeOffset")
          else 0
        LshSignature(exprs(0),
          graft.functions.FnArgs.intLit(exprs(1), "lsh_signature planes"), off)
      }))
    e.injectFunction((
      FunctionIdentifier("nearest_cell"),
      new ExpressionInfo(classOf[NearestCell].getName, "nearest_cell"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "nearest_cell() takes (vec, cells, centroids)")
        NearestCell(exprs(0),
          graft.functions.FnArgs.longArrayLit(exprs(1), "nearest_cell cells"),
          graft.functions.FnArgs.matrixLit(exprs(2), "nearest_cell centroids"))
      }))
    e.injectFunction((
      FunctionIdentifier("nearest_cells_soft"),
      new ExpressionInfo(classOf[NearestCellsSoft].getName, "nearest_cells_soft"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 4 || exprs.length == 5,
          "nearest_cells_soft() takes (vec, cells, centroids, band[, maxProbe])")
        val mp = if (exprs.length == 5)
          graft.functions.FnArgs.intLit(exprs(4), "nearest_cells_soft maxProbe")
        else 2
        NearestCellsSoft(exprs(0),
          graft.functions.FnArgs.longArrayLit(exprs(1), "nearest_cells_soft cells"),
          graft.functions.FnArgs.matrixLit(exprs(2), "nearest_cells_soft centroids"),
          graft.functions.FnArgs.doubleLit(exprs(3), "nearest_cells_soft band"), mp)
      }))
  }
}
