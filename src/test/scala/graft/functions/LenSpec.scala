package graft.functions

import graft.SparkSuite

/** `len` must keep BOTH contracts at once: the reference's byte length
  * on BINARY payloads (crates/cdl-fs/src/functions/len.rs) AND Spark
  * 4's builtin character semantics on strings — a blanket byte override
  * would silently change `len('héllo')` for every user query in the
  * session. */
class LenSpec extends SparkSuite {

  test("byte semantics on BINARY, builtin char semantics on STRING") {
    Len.register(spark)
    val r = spark.sql(
      "SELECT len(cast('héllo' AS BINARY)) AS b, len('héllo') AS s")
      .collect().head
    assert(r.getLong(0) == 6L, "é is two UTF-8 bytes")
    assert(r.getLong(1) == 5L, "é is one character")
  }

  test("the extensions path uses the same builder (no drift possible)") {
    // GraftExtensions injects Len.builder by reference — assert the
    // shared-builder wiring rather than spinning a second session
    val e = Len.builder(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "héllo", org.apache.spark.sql.types.StringType)))
    // resolved string literal -> char semantics
    assert(e.eval(null) == 5L)
    val b = Len.builder(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "héllo".getBytes("UTF-8"), org.apache.spark.sql.types.BinaryType)))
    assert(b.eval(null) == 6L)
  }
}
