package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: Rabin-style polynomial rolling hash over the
  * UTF-8 bytes of a string — h = fold(h·31 + byte) mod 2³¹−1.
  *
  * A native Catalyst `Expression` with `doGenCode`, not a UDF: the loop
  * compiles straight into the whole-stage-codegen pipeline, so
  * fingerprinting a 100 TB corpus stays a single codegen'd scan with no
  * serialization boundary. (The normalized-md5 fingerprint in
  * TextAnalysis is the oracle-friendly variant; this one is the
  * cheap-per-byte streaming form.)
  */
case class RabinFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rabin_fingerprint requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rabin_fingerprint"

  private val Mod = RabinFingerprint.Mod

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xFF)) % Mod
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xFF)) % ${Mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RabinFingerprint {
  val Mod: Long = (1L << 31) - 1

  /** Plain-Scala reference implementation (test oracle). */
  def reference(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xFF)) % Mod)

  def register(spark: SparkSession): Unit =
    RegisterOnce(spark, "rabin_fingerprint") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rabin_fingerprint",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"rabin_fingerprint() takes 1 argument, got ${exprs.length}")
        RabinFingerprint(exprs.head)
      },
      "scala_udf")
    }
}
