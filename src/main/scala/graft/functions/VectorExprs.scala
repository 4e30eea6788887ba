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

/** Random-hyperplane LSH signature: bit p = (v · plane_p) ≥ 0, planes
  * 0..n-1, packed into a long. Plane components are deterministic
  * pseudo-randoms — xxhash64(i + p·φ64, seed 42) scaled to [−1, 1] —
  * matching the declarative `aggregate(zip_with(…))` formulation this
  * expression replaces (same buckets, reproducible across runs), but as
  * ONE fused planes×dims loop inside whole-stage codegen instead of
  * `planes` interpreted lambda trees per row.
  *
  * `planeOffset` shifts the plane index range to planeOffset..
  * planeOffset+planes−1 — table t of a multi-table LSH index passes
  * offset t·planes, giving each table an independent deterministic
  * plane set (offset 0 reproduces the single-table signature). */
case class LshSignature(child: Expression, planes: Int, planeOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      if (planes >= 1 && planes <= 64) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"planes must be in [1,64], got $planes")
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_signature requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_signature"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sig = 0L
    var p = 0
    while (p < planes) {
      val seed = (p.toLong + planeOffset) * LshSignature.Golden
      var proj = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        proj += x * (LshSignature.hash(i.toLong + seed).toDouble / Long.MaxValue)
        i += 1
      }
      if (proj >= 0) sig |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val p = ctx.freshName("p")
      val i = ctx.freshName("i"); val sig = ctx.freshName("sig")
      val proj = ctx.freshName("proj"); val x = ctx.freshName("x")
      val get = if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      val hashCls = LshSignature.getClass.getName.stripSuffix("$")
      s"""
         |int $n = $arr.numElements();
         |long $sig = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $get;
         |    $proj += $x * ((double) $hashCls.hash((long) $i
         |      + ((long) $p + ${planeOffset}L) * ${LshSignature.Golden}L)
         |      / ${Long.MaxValue}L);
         |  }
         |  if ($proj >= 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSignature {
  val Golden: Long = 0x9e3779b97f4a7c15L
  /** Same bits as Spark's `xxhash64(longValue)` with the default seed —
    * XXH64 is the static hasher Spark's own codegen emits calls to. */
  def hash(v: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(v, 42L)
}

/** Int8 scalar-quantization code: byte i = floor(xᵢ·127/max|x| + 0.5) ∈
  * [−127, 127], packed one signed byte per dimension into BINARY — 8×
  * smaller than the double vector it encodes (4× vs float). Cosine is
  * scale-invariant, so the per-vector scale is deliberately NOT stored:
  * `cosine_code(q, vec_code(v)) ≈ cosine(q, v)` with no side data.
  * `floor(x + 0.5)` (not round) for the same cross-engine bit
  * determinism the quantizeInt8 aggregate pins; the all-zero vector
  * (max|x| = 0) encodes to all-zero bytes rather than dividing by zero. */
case class QuantizeCode(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_code requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "vec_code"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val a = math.abs(x); if (a > m) m = a
      i += 1
    }
    val out = new Array[Byte](n)
    if (m > 0.0) {
      i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = math.floor(x * 127.0 / m + 0.5).toByte
        i += 1
      }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val m = ctx.freshName("m"); val x = ctx.freshName("x")
      val out = ctx.freshName("out"); val a = ctx.freshName("a")
      val get = if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = $arr.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $a = java.lang.Math.abs($get);
         |  if ($a > $m) $m = $a;
         |}
         |byte[] $out = new byte[$n];
         |if ($m > 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $get;
         |    $out[$i] = (byte) java.lang.Math.floor($x * 127.0 / $m + 0.5);
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** cosine(q, decode(code)) — the IVF-PQ probe's scoring loop: the full-
  * precision query against a [[QuantizeCode]] byte code, one fused loop,
  * no materialized decode. The code's unknown scale cancels out of the
  * cosine, so the result equals cosine against the dequantized vector
  * exactly; vs the ORIGINAL vector it carries only the ±0.5/127
  * per-component rounding error (|Δcosine| ≲ 0.006 — re-rank recovers
  * exact order). An all-zero code (the zero vector's encoding) scores
  * NaN, same as exact cosine against a zero vector. */
case class CosineCodeSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), BinaryType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cosine_code requires (ARRAY<FLOAT|DOUBLE>, BINARY), got ${l.sql}, ${r.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_code"

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val code = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.numElements(), code.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = code(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.length);
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $get;
         |  double $yv = (double) $b[$i];
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
/** Map-only nearest-centroid assignment: argmax over a PLAN-EMBEDDED
  * centroid matrix, cosine per cell in one fused codegen loop. The
  * structural fix for the k-means assignment join: the previous shape
  * (broadcast join × k centroids → n·k exploded rows → vector-carrying
  * groupBy argmax) shuffles n·k rows — measured 1123 s at the 100×
  * SemDeDup soak where this expression's map-only pass needs none.
  * Ties on cosine pick the HIGHER cell, and a NaN cosine (zero vector
  * or zero centroid) sorts ABOVE every real cosine, bit-matching the
  * `max(struct(cosine, cell))` argmax it replaces (Spark's Double
  * ordering puts NaN above all values; same accumulation order as
  * CosineSimilarity, so assignments are identical).
  *
  * The matrix rides the serialized expression to every task (the same
  * bytes a broadcast would ship) — fine to k ~ 100k × d ~ 1k; beyond
  * that a two-level (coarse-then-fine) assignment is the deploy story,
  * not a bigger literal. */
case class NearestCell(
    child: Expression,
    cells: Array[Long],
    matrix: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      if (cells.length == matrix.length && cells.nonEmpty)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"nearest_cell: ${cells.length} cells vs ${matrix.length} centroids (need equal, non-zero)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_cell"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = Double.NegativeInfinity
    var bestCell = Long.MinValue
    var c = 0
    while (c < matrix.length) {
      val cent = matrix(c)
      val n = math.min(v.numElements(), cent.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val yv = cent(i)
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(nb))
      // Double.compare, not >/==: a NaN cosine (zero vector or zero
      // centroid) must sort ABOVE every real value with NaN == NaN on
      // ties, exactly Spark's struct-max ordering — plain > never
      // matches NaN and would leave bestCell at Long.MinValue.
      val cmp = java.lang.Double.compare(cos, best)
      if (cmp > 0 || (cmp == 0 && cells(c) > bestCell)) {
        best = cos; bestCell = cells(c)
      }
      c += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mat = ctx.addReferenceObj("nearestCellMatrix", matrix, "double[][]")
      val cls = ctx.addReferenceObj("nearestCellIds", cells, "long[]")
      val get = if (isFloat) s"(double) $v.getFloat" else s"$v.getDouble"
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val cent = ctx.freshName("cent")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val cos = ctx.freshName("cos")
      val best = ctx.freshName("best"); val bestCell = ctx.freshName("bestCell")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |double $best = Double.NEGATIVE_INFINITY;
         |long $bestCell = Long.MIN_VALUE;
         |for (int $c = 0; $c < $mat.length; $c++) {
         |  double[] $cent = $mat[$c];
         |  int $n = java.lang.Math.min($v.numElements(), $cent.length);
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = $get($i);
         |    double $yv = $cent[$i];
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  double $cos = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  int ${cos}Cmp = java.lang.Double.compare($cos, $best);
         |  if (${cos}Cmp > 0 || (${cos}Cmp == 0 && $cls[$c] > $bestCell)) {
         |    $best = $cos; $bestCell = $cls[$c];
         |  }
         |}
         |${ev.value} = $bestCell;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Soft top-`maxProbe` cell assignment for SemDeDup pair formation (r15
  * verdict #1): emits the vector's best cell, PLUS each next-best cell
  * whose cosine margin `best - cos_i <= band`, capped at `maxProbe` —
  * the vector then participates in pair generation in every probed
  * cell, recovering near-duplicate pairs that straddle a k-means cell
  * boundary (both members of a straddling cosine-≥τ pair sit near the
  * boundary, so both carry a small margin). maxProbe > 2 exists for
  * CORNER straddlers: measured at the 100× soak, top-2 plateaus at
  * 0.949 because a handful of pairs split where three cells meet and
  * the partner's cell is the vector's THIRD-nearest.
  *
  * Same argmax contract as [[NearestCell]] (identical accumulation
  * order, Double.compare ordering, ties → higher cell), so element 0 is
  * ALWAYS exactly NearestCell's answer — primary assignment semantics
  * are unchanged, the band only widens pair FORMATION. A NaN margin
  * (zero vector/centroid) stays single-celled. Map-only: the centroid
  * matrix rides the expression like NearestCell's. */
case class NearestCellsSoft(
    child: Expression,
    cells: Array[Long],
    matrix: Array[Array[Double]],
    band: Double,
    maxProbe: Int = 2)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      if (cells.length != matrix.length || cells.isEmpty)
        TypeCheckResult.TypeCheckFailure(
          s"nearest_cells_soft: ${cells.length} cells vs ${matrix.length} centroids (need equal, non-zero)")
      else if (maxProbe < 1 || maxProbe > 4)
        TypeCheckResult.TypeCheckFailure(
          s"nearest_cells_soft: maxProbe $maxProbe out of [1, 4]")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells_soft requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells_soft"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val k = math.min(maxProbe, matrix.length)
    val topCos = Array.fill(k)(Double.NegativeInfinity)
    val topCell = Array.fill(k)(Long.MinValue)
    var c = 0
    while (c < matrix.length) {
      val cent = matrix(c)
      val n = math.min(v.numElements(), cent.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val yv = cent(i)
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(nb))
      // insertion into the sorted top-k slots, NearestCell's ordering
      // (Double.compare so NaN sorts above reals; ties → higher cell)
      var slot = k
      while (slot > 0 && {
        val cmp = java.lang.Double.compare(cos, topCos(slot - 1))
        cmp > 0 || (cmp == 0 && cells(c) > topCell(slot - 1))
      }) slot -= 1
      if (slot < k) {
        var j = k - 1
        while (j > slot) {
          topCos(j) = topCos(j - 1); topCell(j) = topCell(j - 1); j -= 1
        }
        topCos(slot) = cos; topCell(slot) = cells(c)
      }
      c += 1
    }
    // emit the in-band prefix (cosines sorted desc, so once a slot
    // falls out of band every later slot is out too); a NaN margin
    // (zero vector) fails the <= and stays single-celled
    var m = 1
    while (m < k && topCos(0) - topCos(m) <= band) m += 1
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(topCell, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mat = ctx.addReferenceObj("nearestCellsMatrix", matrix, "double[][]")
      val cls = ctx.addReferenceObj("nearestCellsIds", cells, "long[]")
      val get = if (isFloat) s"(double) $v.getFloat" else s"$v.getDouble"
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val cent = ctx.freshName("cent")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val cos = ctx.freshName("cos")
      val tc = ctx.freshName("topCos"); val tl = ctx.freshName("topCell")
      val kk = ctx.freshName("k"); val slot = ctx.freshName("slot")
      val j = ctx.freshName("j"); val m = ctx.freshName("m")
      val cmp = ctx.freshName("cmp")
      s"""
         |final int $kk = java.lang.Math.min($maxProbe, $mat.length);
         |double[] $tc = new double[$kk];
         |long[] $tl = new long[$kk];
         |java.util.Arrays.fill($tc, Double.NEGATIVE_INFINITY);
         |java.util.Arrays.fill($tl, Long.MIN_VALUE);
         |for (int $c = 0; $c < $mat.length; $c++) {
         |  double[] $cent = $mat[$c];
         |  int $n = java.lang.Math.min($v.numElements(), $cent.length);
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double ${i}xv = $get($i);
         |    double ${i}yv = $cent[$i];
         |    $dot += ${i}xv * ${i}yv; $na += ${i}xv * ${i}xv; $nb += ${i}yv * ${i}yv;
         |  }
         |  double $cos = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  int $slot = $kk;
         |  while ($slot > 0) {
         |    int $cmp = java.lang.Double.compare($cos, $tc[$slot - 1]);
         |    if ($cmp > 0 || ($cmp == 0 && $cls[$c] > $tl[$slot - 1])) $slot--;
         |    else break;
         |  }
         |  if ($slot < $kk) {
         |    for (int $j = $kk - 1; $j > $slot; $j--) {
         |      $tc[$j] = $tc[$j - 1]; $tl[$j] = $tl[$j - 1];
         |    }
         |    $tc[$slot] = $cos; $tl[$slot] = $cls[$c];
         |  }
         |}
         |int $m = 1;
         |while ($m < $kk && $tc[0] - $tc[$m] <= ${band}D) $m++;
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($tl, $m));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Vec {

  // once-per-session guard (r16 verdict #8, see RegisterOnce): a name
  // probe would mis-fire in GraftExtensions sessions, which pre-inject
  // vec_dot but not vec_code/cosine_code
  def register(spark: SparkSession): Unit = RegisterOnce(spark, "vec") {
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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_code",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"vec_code() takes 1 argument")
        QuantizeCode(exprs(0))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_code",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"cosine_code() takes 2 arguments")
        CosineCodeSim(exprs(0), exprs(1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nearest_cell",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"nearest_cell() takes (vec, cells, centroids)")
        NearestCell(exprs(0),
          FnArgs.longArrayLit(exprs(1), "nearest_cell cells"),
          FnArgs.matrixLit(exprs(2), "nearest_cell centroids"))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nearest_cells_soft",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 4 || exprs.length == 5,
          s"nearest_cells_soft() takes (vec, cells, centroids, band[, maxProbe])")
        val mp = if (exprs.length == 5)
          FnArgs.intLit(exprs(4), "nearest_cells_soft maxProbe") else 2
        NearestCellsSoft(exprs(0),
          FnArgs.longArrayLit(exprs(1), "nearest_cells_soft cells"),
          FnArgs.matrixLit(exprs(2), "nearest_cells_soft centroids"),
          FnArgs.doubleLit(exprs(3), "nearest_cells_soft band"), mp)
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_signature",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 || exprs.length == 3,
          s"lsh_signature() takes (vec, planes[, planeOffset])")
        val off = if (exprs.length == 3)
          FnArgs.intLit(exprs(2), "lsh_signature planeOffset") else 0
        LshSignature(exprs(0), FnArgs.intLit(exprs(1), "lsh_signature planes"), off)
      },
      "scala_udf")
  }

  private def ensure(): Unit = register(SparkSession.active)

  def dot(a: Column, b: Column): Column = { ensure(); call_function("vec_dot", a, b) }

  def cosine(a: Column, b: Column): Column = { ensure(); call_function("cosine_sim", a, b) }

  def code(v: Column): Column = { ensure(); call_function("vec_code", v) }

  def cosineCode(q: Column, code: Column): Column =
    { ensure(); call_function("cosine_code", q, code) }

  def lshSignature(vec: Column, planes: Int, planeOffset: Int = 0): Column = {
    ensure()
    call_function("lsh_signature", vec,
      org.apache.spark.sql.functions.lit(planes),
      org.apache.spark.sql.functions.lit(planeOffset))
  }

  /** Map-only soft top-`maxProbe` cell ids (see NearestCellsSoft):
    * element 0 is always [[nearestCell]]'s answer; each next-best cell
    * joins while the cosine margin stays within `band`. */
  def nearestCellsSoft(
      vec: Column,
      cells: Array[Long],
      centroids: Array[Array[Double]],
      band: Double,
      maxProbe: Int = 2): Column = {
    ensure()
    call_function("nearest_cells_soft", vec,
      org.apache.spark.sql.functions.typedlit(cells.toSeq),
      org.apache.spark.sql.functions.typedlit(centroids.map(_.toSeq).toSeq),
      org.apache.spark.sql.functions.lit(band),
      org.apache.spark.sql.functions.lit(maxProbe))
  }

  /** Map-only nearest-centroid cell id (see NearestCell). `cells` and
    * `centroids` are parallel, embedded in the plan as literals. */
  def nearestCell(
      vec: Column,
      cells: Array[Long],
      centroids: Array[Array[Double]]): Column = {
    ensure()
    call_function("nearest_cell", vec,
      org.apache.spark.sql.functions.typedlit(cells.toSeq),
      org.apache.spark.sql.functions.typedlit(centroids.map(_.toSeq).toSeq))
  }
}
