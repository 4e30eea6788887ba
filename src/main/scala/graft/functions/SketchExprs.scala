package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen document-sketch expressions.
  *
  * MinHash, SimHash, and winnowing sketches are PER-DOCUMENT reductions
  * over a document's own gram/token hashes — there is nothing to shuffle.
  * The declarative formulations (explode → groupBy with 64 `min`/`sum`
  * aggregates, or posexplode → partitioned window minima) pay a full
  * exchange of every exploded hash plus per-aggregate expression trees;
  * these expressions compute the identical signature in ONE fused loop
  * per row inside whole-stage codegen, turning each sketch into a
  * map-only projection (cf. the same trap documented on VectorExprs —
  * `HigherOrderFunction`s and wide aggregates both fall out of the fast
  * path). At 100 TB that removes the largest shuffle of the dedup
  * pipeline: signatures are computed where the text is read, and only
  * (doc_id, signature) rows ever move.
  *
  * Reference semantics (fields/defaults):
  * SmartX-Team/connected-data-lake has no sketch ops — these extend the
  * engine for training-data pipelines (SURVEY §2.8). Values are pinned
  * by DedupSpec/TextAnalysisSpec and the DuckDB oracle gate.
  */
object SketchExprs {

  /** Register all sketch functions on `spark` (idempotent). */
  def register(spark: SparkSession): Unit = RegisterOnce(spark, "sketch") {
    def lit2Int(e: Expression, what: String): Int =
      FnArgs.intLit(e, what)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "minhash_sig() takes (hashes, numHashes)")
        MinHashSig(exprs(0), lit2Int(exprs(1), "minhash_sig numHashes"))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_sig",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "simhash_sig() takes (tokenHashes)")
        SimHashSig(exprs(0))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_minima",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "winnow_minima() takes (hashes, w)")
        WinnowMinima(exprs(0), lit2Int(exprs(1), "winnow_minima w"))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_hashes",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 4,
          "gram_hashes() takes (text, n, distinct, md5hex)")
        def lit2Bool(e: Expression, what: String): Boolean = e match {
          case Literal(v: Boolean, BooleanType) => v
          case other => throw new IllegalArgumentException(
            s"$what must be a boolean literal, got $other")
        }
        GramHashes(exprs(0), lit2Int(exprs(1), "gram_hashes n"),
          lit2Bool(exprs(2), "gram_hashes distinct"),
          lit2Bool(exprs(3), "gram_hashes md5hex"))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_set_counts",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "token_set_counts() takes (text, spec)")
        val spec = exprs(1) match {
          case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
            v.toString
          case other => throw new IllegalArgumentException(
            s"token_set_counts spec must be a string literal, got $other")
        }
        TokenSetCounts(exprs(0), spec)
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_eq_count",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "array_eq_count() takes 2 arrays")
        ArrayEqCount(exprs(0), exprs(1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_intersect_count",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "array_intersect_count() takes 2 arrays")
        ArrayIntersectCount(exprs(0), exprs(1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "bloom_might_contain() takes (value, bloomBytes)")
        val bytes = exprs(1) match {
          case Literal(v: Array[Byte], BinaryType) => v
          case other => throw new IllegalArgumentException(
            s"bloom bytes must be a binary literal, got $other")
        }
        BloomMightContain(exprs(0), bytes)
      },
      "scala_udf")
  }

  private def ensure(): Unit = register(SparkSession.active)

  def bloomMightContain(value: Column, bloomBytes: Array[Byte]): Column = {
    ensure()
    call_function("bloom_might_contain", value,
      org.apache.spark.sql.functions.lit(bloomBytes))
  }

  def minhashSig(hashes: Column, numHashes: Int): Column = {
    ensure()
    call_function("minhash_sig", hashes, org.apache.spark.sql.functions.lit(numHashes))
  }

  def simhashSig(tokenHashes: Column): Column = {
    ensure(); call_function("simhash_sig", tokenHashes)
  }

  def winnowMinima(hashes: Column, w: Int): Column = {
    ensure()
    call_function("winnow_minima", hashes, org.apache.spark.sql.functions.lit(w))
  }

  def arrayEqCount(a: Column, b: Column): Column = {
    ensure(); call_function("array_eq_count", a, b)
  }

  def arrayIntersectCount(a: Column, b: Column): Column = {
    ensure(); call_function("array_intersect_count", a, b)
  }

  def gramHashes(text: Column, n: Int, distinct: Boolean): Column = {
    ensure()
    call_function("gram_hashes", text,
      org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(distinct),
      org.apache.spark.sql.functions.lit(false))
  }

  def gramMd5(text: Column, n: Int, distinct: Boolean): Column = {
    ensure()
    call_function("gram_hashes", text,
      org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(distinct),
      org.apache.spark.sql.functions.lit(true))
  }

  /** `sets`: word sets, encoded for the registry as 'w,w,…|w,w,…'. */
  def tokenSetCounts(text: Column, sets: Seq[Seq[String]]): Column = {
    ensure()
    // empty sets/words would not round-trip through the spec encoding
    // (split drops trailing empties) and would misalign count positions
    require(sets.nonEmpty && sets.forall(_.nonEmpty),
      "token_set_counts requires non-empty word sets")
    require(sets.forall(_.forall(w =>
        w.nonEmpty && !w.contains(',') && !w.contains('|'))),
      "marker words must be non-empty and contain no ',' or '|'")
    call_function("token_set_counts", text,
      org.apache.spark.sql.functions.lit(sets.map(_.mkString(",")).mkString("|")))
  }
}

/** MinHash signature: each raw 64-bit gram hash x is first folded to
  * x' = pmod(x, p) ∈ [0, p), then for each permutation i the minimum of
  * h_i(x') = ((x'·a_i) mod p + b_i) mod p is kept
  * (p = 2³¹−1; x' ∈ [0, p) so x'·a_i < 2⁶² never overflows a long).
  * Output: array<long> of `numHashes` minima; NULL for an empty input
  * (a doc with no grams has no signature — callers filter, matching the
  * explode+groupBy formulation where such docs simply produce no row). */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      if (numHashes >= 1 && numHashes <= 512) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"numHashes must be in [1,512], got $numHashes")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<BIGINT>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  private lazy val as: Array[Long] = MinHashSig.coeffA(numHashes)
  private lazy val bs: Array[Long] = MinHashSig.coeffB(numHashes)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val out = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val p = MinHashSig.MersenneP
      val h = ((arr.getLong(i) % p) + p) % p
      var j = 0
      while (j < numHashes) {
        val v = ((h * as(j)) % p + bs(j)) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val aRef = ctx.addReferenceObj("mhA", as, "long[]")
      val bRef = ctx.addReferenceObj("mhB", bs, "long[]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val v = ctx.freshName("v"); val out = ctx.freshName("out")
      val p = MinHashSig.MersenneP
      s"""
         |int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$numHashes];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = (($arr.getLong($i) % ${p}L) + ${p}L) % ${p}L;
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $v = (($h * $aRef[$j]) % ${p}L + $bRef[$j]) % ${p}L;
         |      if ($v < $out[$j]) $out[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** 31-bit Mersenne prime: (p−1)² fits in a signed 64-bit long. */
  val MersenneP: Long = (1L << 31) - 1

  /** Deterministic permutation coefficients (splitmix64-ish, seeded — NOT
    * random at runtime so results are reproducible across runs/hosts). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def coeffA(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes)(i => (math.abs(mix(i.toLong * 2 + 1)) % MersenneP) max 1L)

  def coeffB(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes)(i => math.abs(mix(i.toLong * 2 + 2)) % MersenneP)
}

/** 64-bit SimHash over pre-hashed tokens: bit b of the signature is set
  * iff Σ_tokens (±1 by bit b of the token hash) > 0. NULL for an empty
  * input (mirrors the explode+groupBy formulation — see MinHashSig). */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires ARRAY<BIGINT>, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        cnt(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (cnt(b) > 0) sig |= (1L << b); b += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val b = ctx.freshName("b"); val h = ctx.freshName("h")
      val cnt = ctx.freshName("cnt"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $cnt = new int[64];
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $arr.getLong($i);
         |    for (int $b = 0; $b < 64; $b++) {
         |      $cnt[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |  long $sig = 0L;
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ($cnt[$b] > 0) $sig |= (1L << $b);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing sketch core: minima of each sliding window of `w`
  * consecutive gram hashes, de-duplicated and sorted ascending — the
  * MOSS document sketch, computed row-locally (windows never cross
  * documents, so the posexplode → partitioned-window formulation bought
  * a full shuffle for nothing). Elements may be BIGINT (production
  * xxhash64 grams) or STRING (md5-hex grams, oracle-portable) —
  * both orderings match `array_sort`'s (numeric / binary-lexicographic).
  * Fewer than `w` grams → empty array (no complete window; callers
  * filter, matching the positional `pos ≥ w−1` formulation). */
case class WinnowMinima(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | StringType, _) =>
      if (w >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"w must be >= 1, got $w")
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_minima requires ARRAY<BIGINT|STRING>, got ${other.sql}")
  }

  private def isString: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == StringType

  override def dataType: DataType =
    ArrayType(if (isString) StringType else LongType, containsNull = false)
  override def prettyName: String = "winnow_minima"

  /** Row-local winnow; public so generated code can call back into it —
    * the distinct+sort needs a TreeSet, which is not worth inlining as
    * Java source (the call stays inside the whole-stage-codegen stage). */
  def winnow(arr: ArrayData): ArrayData = {
    // sliding-window minimum via the monotonic deque: each index is
    // pushed and popped at most once, so the pass is O(n) where the
    // naive per-window rescan was O(n·w) — a w-fold cut in the per-row
    // hot loop this expression exists to optimize (w=50 is a typical
    // MOSS window). The deque holds indices of a non-decreasing value
    // run; the window's minimum VALUE is at its head, and the output
    // SET of minima is tie-break-independent.
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    // the deque is a primitive int ring (capacity w+1 — it never holds
    // more than w live indices): the ArrayDeque[Integer] variant boxed
    // every pushed index on the per-token hot path (r12 verdict watch
    // item — winnow cpu 1.96→3.88 core-s). Contents live at ring
    // positions head..head+size-1 (mod cap); head+size < 2·cap always,
    // so the wrap is a conditional subtract, not a division.
    val cap = w + 1
    val ring = new Array[Int](cap)
    var head = 0
    var size = 0
    @inline def wrap(x: Int): Int = if (x >= cap) x - cap else x
    if (isString) {
      val set = new java.util.TreeSet[UTF8String]()
      var i = 0
      while (i < n) {
        val v = arr.getUTF8String(i)
        while (size > 0 &&
          arr.getUTF8String(ring(wrap(head + size - 1))).compareTo(v) >= 0)
          size -= 1
        ring(wrap(head + size)) = i
        size += 1
        if (ring(head) <= i - w) { head = wrap(head + 1); size -= 1 }
        if (i >= w - 1) set.add(arr.getUTF8String(ring(head)))
        i += 1
      }
      new GenericArrayData(set.toArray.asInstanceOf[Array[Any]])
    } else {
      // collect every window minimum into a primitive buffer, then
      // sort + adjacent-dedupe — same output SET as the old
      // TreeSet[java.lang.Long] without a boxed node per insert
      val mins = new Array[Long](n - w + 1)
      var m = 0
      var i = 0
      while (i < n) {
        val v = arr.getLong(i)
        while (size > 0 && arr.getLong(ring(wrap(head + size - 1))) >= v)
          size -= 1
        ring(wrap(head + size)) = i
        size += 1
        if (ring(head) <= i - w) { head = wrap(head + 1); size -= 1 }
        if (i >= w - 1) { mins(m) = arr.getLong(ring(head)); m += 1 }
        i += 1
      }
      java.util.Arrays.sort(mins, 0, m)
      var k = 0
      var j = 0
      while (j < m) {
        if (j == 0 || mins(j) != mins(k - 1)) { mins(k) = mins(j); k += 1 }
        j += 1
      }
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOfRange(mins, 0, k))
    }
  }

  override def nullSafeEval(input: Any): Any =
    winnow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ref = ctx.addReferenceObj("winnowExpr", this,
        classOf[WinnowMinima].getName)
      s"${ev.value} = $ref.winnow($arr);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Membership probe of a LONG column against a serialized
  * `org.apache.spark.util.sketch.BloomFilter` — the incremental ngram
  * store's gram-existence sidecar (IncrementalDedup). NO FALSE
  * NEGATIVES: a `false` means the store definitively lacks the gram,
  * which is what lets the batch cycle drop never-seen grams from its
  * pruned store scans. The filter bytes ride the plan's reference
  * array (one copy per stage, broadcast with the task binary), and the
  * probe stays inside whole-stage codegen via the same object-callback
  * pattern as [[WinnowMinima]]. */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression {

  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires BIGINT, got ${other.sql}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  /** Public so generated code can call back into it. */
  def probe(v: Long): Boolean = bloom.mightContainLong(v)

  override def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("bloomExpr", this,
        classOf[BloomMightContain].getName)
      s"${ev.value} = $ref.probe($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed word n-grams of single-space-tokenized text, fused: the
  * declarative form — `transform(sequence(…), i -> concat_ws(" ",
  * slice(split(text, " "), i, n)))` then a per-gram hash — runs as
  * nested interpreted lambdas that SLICE a fresh token array and
  * CONCATENATE a fresh gram string per position (measured ~2.3 s for
  * ~300k grams at sf0.1, the dominant cost of every shingle-based op).
  * This expression exploits that a gram joined with single spaces is an
  * exact BYTE SUBSTRING of the original text (split on every space ⇒
  * adjacent tokens are separated by exactly one space), so each
  * xxhash64 gram hash is computed straight off the text's UTF-8 bytes —
  * zero per-gram allocation. Semantics mirror the declarative form
  * exactly: tokens = split(text, " ") with trailing empties kept,
  * gram positions 1..max(numTokens−n+1, 1), last-gram clamp, and
  * (optionally) first-occurrence distinct.
  *
  * `md5hex = true` emits lowercase-hex md5 strings instead of xxhash64
  * longs — the oracle-portable gram hash (DuckDB shares md5), used by
  * the winnowing gate query; distinct-by-hash equals distinct-by-gram
  * up to hash collisions (~(#grams)²/2⁶⁵ at xxhash64 width). */
case class GramHashes(child: Expression, n: Int, distinct: Boolean, md5hex: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (n >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"n must be >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires STRING, got ${other.sql}")
  }

  override def dataType: DataType =
    ArrayType(if (md5hex) StringType else LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  /** Row-local gram hashing; public so generated code calls back into it
    * (byte scanning + a dedup set are not worth inlining as Java source;
    * the call stays inside the whole-stage-codegen stage). */
  def grams(text: UTF8String): ArrayData = {
    val bytes = text.getBytes // one copy; grams are (start, len) views
    val len = bytes.length
    // token start offsets: a token begins at 0 and after every space
    var numToks = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) numToks += 1; i += 1 }
    val starts = new Array[Int](numToks + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(numToks) = len + 1 // sentinel: "start of one-past-last token"
    val nGrams = math.max(numToks - n + 1, 1)
    if (md5hex) {
      // the expression instance is SHARED across tasks (codegen binds it
      // once into the generated class's references), so the digest must
      // be per-thread — and getInstance per row would pay a synchronized
      // JCA provider lookup per document
      val md = GramHashes.Md5.get()
      val out = new Array[AnyRef](nGrams)
      val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
      var k = 0
      var g = 0
      while (g < nGrams) {
        val s = starts(g)
        val e = starts(math.min(g + n, numToks)) - 1 // end of last token in gram
        md.reset()
        md.update(bytes, s, e - s)
        val digest = md.digest()
        val hex = new Array[Byte](32)
        var d = 0
        while (d < 16) {
          hex(2 * d) = GramHashes.HexDigits((digest(d) >> 4) & 0xf)
          hex(2 * d + 1) = GramHashes.HexDigits(digest(d) & 0xf)
          d += 1
        }
        val hx = UTF8String.fromBytes(hex)
        if (seen == null || seen.add(hx)) { out(k) = hx; k += 1 }
        g += 1
      }
      new GenericArrayData(
        (if (k == nGrams) out else java.util.Arrays.copyOf(out, k))
          .asInstanceOf[Array[Any]])
    } else {
      val out = new Array[Long](nGrams)
      val seen = if (distinct) new java.util.HashSet[java.lang.Long]() else null
      var k = 0
      var g = 0
      while (g < nGrams) {
        val s = starts(g)
        val e = starts(math.min(g + n, numToks)) - 1
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + s,
            e - s, 42L)
        if (seen == null || seen.add(h)) { out(k) = h; k += 1 }
        g += 1
      }
      UnsafeArrayData.fromPrimitiveArray(
        if (k == nGrams) out else java.util.Arrays.copyOf(out, k))
    }
  }

  override def nullSafeEval(input: Any): Any =
    grams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val ref = ctx.addReferenceObj("gramExpr", this, classOf[GramHashes].getName)
      s"${ev.value} = $ref.grams($text);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHashes {
  private val HexDigits: Array[Byte] = "0123456789abcdef".getBytes
  private val Md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}

/** Counts of space-delimited tokens exactly equal to a word of each set
  * in `spec` ('w,w,…|w,w,…'), all sets in ONE tokenization pass over the
  * text bytes — output array<int>, one count per set. A profile deriving
  * several token-set signals (stopword ratio, per-language marker hits,
  * quality) builds the SAME expression for each and whole-stage
  * codegen's subexpression elimination computes it once per row; the
  * regex-per-set form it replaces paid one full text scan per set. */
case class TokenSetCounts(child: Expression, spec: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_set_counts requires STRING, got ${other.sql}")
  }

  @transient private lazy val sets: Array[Array[Array[Byte]]] =
    spec.split('|').map(_.split(',').filter(_.nonEmpty).map(_.getBytes("UTF-8")))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "token_set_counts"

  /** Public so generated code calls back into it (see WinnowMinima). */
  def counts(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    val out = new Array[Int](sets.length)
    var tokStart = 0
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' '.toByte) {
        val tokLen = i - tokStart
        if (tokLen > 0) {
          var s = 0
          while (s < sets.length) {
            val ws = sets(s)
            var wi = 0
            var hit = false
            while (!hit && wi < ws.length) {
              val w = ws(wi)
              if (w.length == tokLen) {
                var b = 0
                while (b < tokLen && w(b) == bytes(tokStart + b)) b += 1
                hit = b == tokLen
              }
              wi += 1
            }
            if (hit) out(s) += 1
            s += 1
          }
        }
        tokStart = i + 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(input: Any): Any =
    counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val ref = ctx.addReferenceObj("tscExpr", this, classOf[TokenSetCounts].getName)
      s"${ev.value} = $ref.counts($text);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of positions where two BIGINT arrays hold equal values
  * (over the shorter length) — the MinHash estimated-Jaccard numerator,
  * replacing the interpreted `size(filter(zip_with(…)))` chain. */
case class ArrayEqCount(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_eq_count requires two ARRAY<BIGINT> args, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_eq_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      // SQL equality: a NULL element never equals anything (incl. NULL),
      // matching the count of `a[i] = b[i] IS TRUE` positions
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
        c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** |distinct common elements| of two ARRAY<BIGINT> — semantics of
  * `size(array_intersect(a, b))` (dedup-verify's exact |A∩B|) as ONE
  * hash-probe pass instead of the interpreted intersection that
  * materializes the common-element ARRAY per row. Builds the set from
  * the SMALLER side; `remove` on probe counts each common value once
  * whatever the operands' multiplicities, exactly like array_intersect's
  * distinct output. Runs per CANDIDATE pair in the near-dup verifies —
  * the hot loop after blocking. */
case class ArrayIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_intersect_count requires two ARRAY<BIGINT> args, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (s, l) = if (x.numElements() <= y.numElements()) (x, y) else (y, x)
    val set = new java.util.HashSet[java.lang.Long](s.numElements() * 2)
    // array_intersect treats NULL as a value: it appears (once) in the
    // intersection iff present in BOTH operands
    var smallHasNull = false
    var i = 0
    while (i < s.numElements()) {
      if (s.isNullAt(i)) smallHasNull = true else set.add(s.getLong(i))
      i += 1
    }
    var c = 0
    i = 0
    while (i < l.numElements()) {
      if (l.isNullAt(i)) {
        if (smallHasNull) { c += 1; smallHasNull = false }
      } else if (set.remove(l.getLong(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s"); val l = ctx.freshName("l")
      val set = ctx.freshName("set"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val hasNull = ctx.freshName("hasNull")
      val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
      s"""
         |$ad $s = $a.numElements() <= $b.numElements() ? $a : $b;
         |$ad $l = $a.numElements() <= $b.numElements() ? $b : $a;
         |java.util.HashSet<Long> $set =
         |  new java.util.HashSet<Long>($s.numElements() * 2);
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $s.numElements(); $i++) {
         |  if ($s.isNullAt($i)) $hasNull = true;
         |  else $set.add($s.getLong($i));
         |}
         |int $c = 0;
         |for (int $i = 0; $i < $l.numElements(); $i++) {
         |  if ($l.isNullAt($i)) {
         |    if ($hasNull) { $c++; $hasNull = false; }
         |  } else if ($set.remove($l.getLong($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
