package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native codegen vector arithmetic over `array<float|double>` embedding
  * columns.
  *
  * Spark's lambda route (`aggregate(zip_with(a, b, …))`) is evaluated
  * INTERPRETED — `HigherOrderFunction`s have no `doGenCode` — and a
  * cosine written that way expands the dot product three times (a·b, a·a,
  * b·b → six array traversals per pair, each through per-element lambda
  * closures). At ANN scale that's the hot loop of the whole engine, so
  * these expressions fuse it: ONE tight branch-free loop inside
  * whole-stage codegen, accumulating in double.
  *
  * Assumes dense vectors (no null elements) — the embedding contract.
  */
trait VectorBinaryBase extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT|DOUBLE> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  protected def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def elemAt(e: Expression, arr: ArrayData, i: Int): Double =
    if (isFloat(e)) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** Java source reading element `i` of `arr` as double. */
  protected def genGet(e: Expression, arr: String, i: String): String =
    if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** dot(a, b) = Σ aᵢ·bᵢ over min(len) elements, double accumulation. */
case class VectorDot(left: Expression, right: Expression) extends VectorBinaryBase {

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += elemAt(left, x, i) * elemAt(right, y, i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${genGet(left, a, i)} * ${genGet(right, b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = a·b / (‖a‖·‖b‖), all three accumulators in one loop. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryBase {

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = elemAt(left, x, i); val yv = elemAt(right, y, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${genGet(left, a, i)};
         |  double $yv = ${genGet(right, b, i)};
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level helpers. The helpers self-register on the
  * active session so operator code can stay session-free (one active
  * session per process, the repo's test/bench/verify shape). */
object Vec {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"vec_dot() takes 2 arguments")
        VectorDot(exprs(0), exprs(1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"cosine_sim() takes 2 arguments")
        CosineSimilarity(exprs(0), exprs(1))
      },
      "scala_udf")
  }

  private def ensure(): Unit = register(SparkSession.active)

  def dot(a: Column, b: Column): Column = { ensure(); call_function("vec_dot", a, b) }

  def cosine(a: Column, b: Column): Column = { ensure(); call_function("cosine_sim", a, b) }
}
