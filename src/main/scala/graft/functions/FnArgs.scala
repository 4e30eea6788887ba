package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}

/** Shared argument extraction for the SQL function builders — ONE
  * int-literal match instead of a copy per registration site (the
  * copies had already drifted: the extensions path rejected the 3-arg
  * `lsh_signature` form the temp-function path accepted). */
private[graft] object FnArgs {
  def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an int literal, got $other")
  }

  def longArrayLit(e: Expression, what: String): Array[Long] = e match {
    case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData,
        ArrayType(LongType, _)) => v.toLongArray()
    case other => throw new IllegalArgumentException(
      s"$what must be an ARRAY<BIGINT> literal, got $other")
  }

  def doubleLit(e: Expression, what: String): Double = e match {
    case Literal(v: Double, DoubleType) => v
    // SQL parses plain fractional literals (0.03) as DECIMAL and whole
    // ones (0) as INTEGER — accept every exact numeric literal form
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, IntegerType) => v.toDouble
    case Literal(v: Long, LongType) => v.toDouble
    case Literal(v: Float, org.apache.spark.sql.types.FloatType) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  def matrixLit(e: Expression, what: String): Array[Array[Double]] = e match {
    case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData,
        ArrayType(ArrayType(DoubleType, _), _)) =>
      (0 until v.numElements()).map(i =>
        v.getArray(i).toDoubleArray()).toArray
    case other => throw new IllegalArgumentException(
      s"$what must be an ARRAY<ARRAY<DOUBLE>> literal, got $other")
  }
}
