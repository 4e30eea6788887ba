package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

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
}
