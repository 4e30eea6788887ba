package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RabinFingerprintSpec extends SparkSuite {

  test("expression matches the plain-Scala reference fold") {
    import spark.implicits._
    RabinFingerprint.register(spark)
    val texts = Seq("", "a", "hello rootfs", "the quick brown fox",
      "x" * 10000)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.selectExpr("id", "rabin_fingerprint(text) AS h")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == RabinFingerprint.reference(t), s"text #$i")
    }
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    RabinFingerprint.register(spark)
    val df = spark.read.parquet(s"$sf/documents.parquet")
    val withCodegen = df.selectExpr("doc_id", "rabin_fingerprint(text) AS h")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // force interpreted evaluation
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.selectExpr("doc_id", "rabin_fingerprint(text) AS h")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(withCodegen == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("multi-byte UTF-8 hashes bytes, not code points") {
    import spark.implicits._
    RabinFingerprint.register(spark)
    val texts = Seq("héllo", "日本語テキスト", "naïve – café", "🚀 emoji")
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .selectExpr("id", "rabin_fingerprint(text) AS h")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == RabinFingerprint.reference(t), s"text #$i")
      // the per-code-point fold (what the DuckDB oracle computes) must
      // DIFFER here — if it didn't, the oracle note about ASCII-only
      // agreement would be vacuous
      val perCodePoint = t.foldLeft(0L)((h, c) =>
        (h * 31 + c.toLong) % RabinFingerprint.Mod)
      assert(got(i.toLong) != perCodePoint, s"text #$i should be byte-wise")
    }
  }

  test("synthetic corpus is ASCII (precondition of the DuckDB oracle)") {
    // q_fingerprint_rolling's oracle folds code points; it matches the
    // byte-wise expression only while every document is pure ASCII.
    val nonAscii = spark.read.parquet(s"$sf/documents.parquet")
      .where("text RLIKE '[^\\\\x00-\\\\x7F]'").count()
    assert(nonAscii == 0L)
  }

  test("null input yields null, not a crash") {
    import spark.implicits._
    RabinFingerprint.register(spark)
    val df = Seq(Some("x"), None).toDF("text")
    val r = df.selectExpr("rabin_fingerprint(text) AS h").collect()
    assert(r.count(_.isNullAt(0)) == 1)
  }
}
