package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The fused codegen vector expressions must be bit-identical to the
  * declarative higher-order-function formulations they replaced (same
  * fold order, same hash constants) and to plain-Scala references. */
class VectorExprsSpec extends SparkSuite {

  private lazy val vecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 200).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2f - 1f)))
      .toDF("id", "v")
  }

  test("vec_dot and cosine_sim match plain-Scala double folds") {
    import spark.implicits._
    val rows = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = vecs.as("a").join(vecs.as("b"), col("a.id") + 1 === col("b.id"))
      .select(col("a.id").as("id"),
        Vec.dot(col("a.v"), col("b.v")).as("dot"),
        Vec.cosine(col("a.v"), col("b.v")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    got.foreach { case (id, dot, cos) =>
      val a = rows(id); val b = rows(id + 1)
      var d = 0.0; var na = 0.0; var nb = 0.0
      (0 until 64).foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        d += x * y; na += x * x; nb += y * y
      }
      assert(dot == d, s"dot id=$id")
      assert(cos == d / (math.sqrt(na) * math.sqrt(nb)), s"cos id=$id")
    }
  }

  test("lsh_signature equals the declarative HOF formulation it replaced") {
    val planes = 12
    // the original aggregate(zip_with(...)) form, kept here as the oracle
    def planeComponent(plane: Int, dim: org.apache.spark.sql.Column) = {
      val seed = lit(plane.toLong * 0x9e3779b97f4a7c15L)
      xxhash64(dim + seed).cast("double") / lit(Long.MaxValue.toDouble)
    }
    val declarative = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

    val r = vecs.select(col("id"),
      Vec.lshSignature(col("v"), planes).as("fused"),
      declarative.as("decl")).collect()
    r.foreach(row =>
      assert(row.getLong(1) == row.getLong(2), s"id=${row.getLong(0)}"))
    // signatures spread across buckets (planes are not degenerate)
    assert(r.map(_.getLong(1)).distinct.length > 10)
  }

  test("codegen and interpreted paths agree for all three expressions") {
    val exprsDf = vecs.select(
      Vec.dot(col("v"), col("v")).as("d"),
      Vec.cosine(col("v"), col("v")).as("c"),
      Vec.lshSignature(col("v"), 8).as("s"))
    val withCodegen = exprsDf.collect().map(r =>
      (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = exprsDf.collect().map(r =>
        (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(withCodegen == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("vec_code / cosine_code: scale-invariant int8 quantization, plain-Scala parity") {
    import spark.implicits._
    val rows = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = vecs.as("a").join(vecs.as("b"), col("a.id") + 1 === col("b.id"))
      .select(col("a.id").as("id"),
        Vec.code(col("b.v")).as("code"),
        Vec.cosineCode(col("a.v"), Vec.code(col("b.v"))).as("ccos"),
        Vec.cosine(col("a.v"), col("b.v")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1),
        r.getDouble(2), r.getDouble(3)))
    got.foreach { case (id, code, ccos, cos) =>
      val a = rows(id); val b = rows(id + 1)
      // reference quantization: floor(x*127/max|x| + 0.5)
      val m = b.map(x => math.abs(x.toDouble)).max
      val ref = b.map(x => math.floor(x.toDouble * 127.0 / m + 0.5).toByte)
      assert(code.toSeq == ref.toSeq, s"code id=$id")
      // reference cosine(a, code)
      var d = 0.0; var na = 0.0; var nb = 0.0
      (0 until 64).foreach { i =>
        val x = a(i).toDouble; val y = ref(i).toDouble
        d += x * y; na += x * x; nb += y * y
      }
      assert(ccos == d / (math.sqrt(na) * math.sqrt(nb)), s"ccos id=$id")
      // int8 rounding error bound: the coded cosine tracks the exact one
      assert(math.abs(ccos - cos) < 0.01, s"id=$id ccos=$ccos cos=$cos")
    }
    // codegen == interpreted for both new expressions
    val exprsDf = vecs.select(Vec.code(col("v")).as("q"),
      Vec.cosineCode(col("v"), Vec.code(col("v"))).as("c"))
    val withCodegen = exprsDf.collect()
      .map(r => (r.getAs[Array[Byte]](0).toSeq, r.getDouble(1))).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = exprsDf.collect()
        .map(r => (r.getAs[Array[Byte]](0).toSeq, r.getDouble(1))).toSeq
      assert(withCodegen == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // the zero vector encodes to all-zero bytes (no divide-by-zero)
    val z = Seq(Tuple1(Array(0.0, 0.0))).toDF("v")
      .select(Vec.code(col("v"))).collect()(0).getAs[Array[Byte]](0)
    assert(z.toSeq == Seq[Byte](0, 0))
  }

  test("null vectors yield null, mixed float/double element types work") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3.0, 4.0))),
      (None, Some(Array(1.0, 1.0)))).toDF("f", "d")
    val r = df.select(Vec.dot(col("f"), col("d")).as("x")).collect()
    assert(r(0).getDouble(0) == 11.0)
    assert(r(1).isNullAt(0))
  }

  test("nearest_cell equals the max(struct(cosine, cell)) argmax it replaced") {
    val rnd = new scala.util.Random(11)
    val cells = Array(3L, 7L, 20L, 41L)
    val cents = Array.fill(4)(Array.fill(64)(rnd.nextDouble() * 2 - 1))
    // declarative oracle: explode the centroid table, argmax by
    // max(struct(cos, cell)) — the exact shape assignCells used before
    import spark.implicits._
    val centDf = cells.zip(cents.map(_.toSeq)).toSeq.toDF("cell", "centroid")
    val oracle = vecs.join(broadcast(centDf))
      .groupBy("id")
      .agg(max(struct(Vec.cosine(col("v"), col("centroid")).as("c"),
        col("cell").as("cell"))).as("best"))
      .select(col("id"), col("best.cell").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = vecs.select(col("id"),
      Vec.nearestCell(col("v"), cells, cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused == oracle)

    // tie-break: two IDENTICAL centroids → the higher cell wins, the
    // max(struct(...)) rule
    val dup = Seq(Tuple1(Array(1.0, 0.0))).toDF("v")
      .select(Vec.nearestCell(col("v"),
        Array(5L, 9L), Array(Array(1.0, 0.0), Array(1.0, 0.0))))
      .collect()(0).getLong(0)
    assert(dup == 9L)

    // codegen == interpreted
    val exprsDf = vecs.select(Vec.nearestCell(col("v"), cells, cents).as("c"))
    val withCodegen = exprsDf.collect().map(_.getLong(0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(exprsDf.collect().map(_.getLong(0)).toSeq == withCodegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }

    // null vector → null
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val nullDf = spark.createDataFrame(
      java.util.Arrays.asList(Row(null)),
      StructType(Seq(StructField("v", ArrayType(DoubleType)))))
    assert(nullDf.select(Vec.nearestCell(col("v"), cells, cents))
      .collect()(0).isNullAt(0))
  }

  test("nearest_cell NaN cosine (zero vector / zero centroid) matches struct-max") {
    import spark.implicits._
    // A zero vector has NaN cosine against EVERY centroid; Spark's
    // max(struct(cos, cell)) puts NaN above all doubles, so the argmax
    // is the highest cell — never the Long.MinValue sentinel.
    val zeroVec = Seq(Tuple1(Array(0.0, 0.0))).toDF("v")
      .select(Vec.nearestCell(col("v"),
        Array(5L, 9L), Array(Array(1.0, 0.0), Array(0.0, 1.0))))
      .collect()(0).getLong(0)
    assert(zeroVec == 9L, s"zero vector must land in the highest cell, got $zeroVec")
    // A zero CENTROID is NaN for every input: it beats all real
    // cosines under the NaN-above-all ordering.
    val zeroCent = Seq(Tuple1(Array(1.0, 0.0))).toDF("v")
      .select(Vec.nearestCell(col("v"),
        Array(5L, 9L), Array(Array(0.0, 0.0), Array(1.0, 0.0))))
      .collect()(0).getLong(0)
    assert(zeroCent == 5L, s"NaN centroid sorts above cos=1, got $zeroCent")
    // and the declarative struct-max oracle agrees on the zero vector
    val centDf = Seq((5L, Seq(1.0, 0.0)), (9L, Seq(0.0, 1.0))).toDF("cell", "centroid")
    val oracle = Seq((1L, Array(0.0, 0.0))).toDF("id", "v")
      .join(broadcast(centDf))
      .groupBy("id")
      .agg(max(struct(Vec.cosine(col("v"), col("centroid")).as("c"),
        col("cell").as("cell"))).as("best"))
      .select(col("best.cell")).collect()(0).getLong(0)
    assert(oracle == zeroVec)
    // codegen path agrees with interpreted on the NaN case
    val df = Seq(Tuple1(Array(0.0, 0.0))).toDF("v")
      .select(Vec.nearestCell(col("v"),
        Array(5L, 9L), Array(Array(1.0, 0.0), Array(0.0, 1.0))).as("c"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(df.collect()(0).getLong(0) == 9L)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
