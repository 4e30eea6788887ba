package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Differential fuzz gate: deterministic randomly-generated relational
  * queries rendered from ONE tiny AST to BOTH the Spark DataFrame API
  * and DuckDB SQL, then hash-compared by the driver like every other
  * gate row. Hand-written gate queries cover each operator once; these
  * cover random COMPOSITIONS of filter × group × aggregate × having ×
  * sort, where planner bugs (pushdown through aggregates, pruning under
  * composed predicates) actually live.
  *
  * The grammar is deliberately engine-portable: BIGINT columns only,
  * integer literals, count/sum/min/max/avg-free (no fp), equality and
  * range predicates, GROUP BY + HAVING, total ORDER BY over the output.
  * Both renderings derive from the same seeded AST, so a mismatch is an
  * engine divergence, never a generator ambiguity.
  */
object FuzzQueries {

  // --- the AST ---------------------------------------------------------
  private final case class Pred(col: String, op: String, lit: Long)
  private final case class Agg(fn: String, col: String, alias: String)
  private final case class Q(
      table: String,          // single table, or "lineitem⋈orders"
      joined: Boolean,        // lineitem JOIN orders ON l_orderkey = o_orderkey
      preds: Seq[Pred],       // AND-ed
      groupBy: Seq[String],
      aggs: Seq[Agg],
      having: Option[(String, Long)]) // (alias, min value): alias >= v

  /** Integer-only column pools (values small enough that SUM over any
    * filtered subset stays far from Long overflow). */
  private val tables = Map(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "customer" -> Seq("c_custkey", "c_nationkey"))
  // value ranges per column keep predicates selective but never empty at
  // ANY scale factor: keys are dense from 0 and the SMALLEST corpus
  // (sf0.001) tops out at l/o_orderkey 1499, partkey 199, suppkey 9,
  // custkey 149, nationkey 24; quantity 1..50, linenumber 1..7
  private val ranges = Map(
    "l_orderkey" -> 1400L, "l_partkey" -> 190L, "l_suppkey" -> 9L,
    "l_linenumber" -> 7L, "l_quantity" -> 50L,
    "o_orderkey" -> 1400L, "o_custkey" -> 140L,
    "c_custkey" -> 140L, "c_nationkey" -> 24L)

  private def gen(seed: Int, joined: Boolean = false): Q = {
    val rnd = new scala.util.Random(seed)
    val table =
      if (joined) "lineitem" // join partner is fixed: orders on orderkey
      else tables.keys.toSeq.sorted.apply(rnd.nextInt(tables.size))
    val cols =
      if (joined) tables("lineitem") ++ Seq("o_custkey") // o_orderkey ≡ l_orderkey
      else tables(table)
    def pick(): String = cols(rnd.nextInt(cols.size))
    val preds = Seq.fill(1 + rnd.nextInt(2)) {
      val c = pick()
      val op = Seq("<", ">=", "=", "<>")(rnd.nextInt(4))
      // = / <> stay on LOW-cardinality columns so equality hits rows
      val c2 = if (op == "=" || op == "<>")
        cols.minBy(ranges(_)) else c
      val r = ranges(c2)
      val draw = math.abs(rnd.nextLong())
      // range predicates draw from the satisfiable half: `< tiny` and
      // `>= huge` generate structurally-empty results that pass the gate
      // while checking nothing
      val lit = op match {
        case "<"  => r / 2 + draw % (r - r / 2) + 1 // [r/2+1, r]
        case ">=" => 1 + draw % math.max(r / 2, 1)  // [1, r/2]
        case _    => 1 + draw % r
      }
      Pred(c2, op, lit)
    }.distinctBy(_.col) // two preds on one column can contradict (=2 AND =1)
    val nGroup = 1 + rnd.nextInt(2)
    val groupBy = rnd.shuffle(cols).take(nGroup)
    val aggTargets = cols.filterNot(groupBy.contains)
    val aggs = Agg("count", "*", "n") +: aggTargets.take(2).zipWithIndex.map {
      case (c, i) =>
        val fn = Seq("sum", "min", "max")(rnd.nextInt(3))
        Agg(fn, c, s"a$i")
    }
    val having = if (rnd.nextBoolean()) Some(("n", 1L + rnd.nextInt(3))) else None
    Q(table, joined, preds, groupBy, aggs, having)
  }

  // --- render to Spark -------------------------------------------------
  private def sparkOf(q: Q)(s: SparkSession, dir: String): DataFrame = {
    val base =
      if (q.joined)
        Queries.rd(s, dir, "lineitem").join(
          Queries.rd(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
      else Queries.rd(s, dir, q.table)
    val filtered = q.preds.foldLeft(base) { (df, p) =>
      val c = col(p.col)
      df.filter(p.op match {
        case "<"  => c < p.lit
        case ">=" => c >= p.lit
        case "="  => c === p.lit
        case "<>" => c =!= p.lit
      })
    }
    val aggCols = q.aggs.map {
      case Agg("count", "*", a) => count(lit(1)).as(a)
      case Agg("sum", c, a)     => sum(col(c)).cast("long").as(a)
      case Agg("min", c, a)     => min(col(c)).cast("long").as(a)
      case Agg("max", c, a)     => max(col(c)).cast("long").as(a)
      case other                => throw new MatchError(other)
    }
    val grouped = filtered.groupBy(q.groupBy.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val post = q.having match {
      case Some((a, v)) => grouped.filter(col(a) >= v)
      case None         => grouped
    }
    post.orderBy((q.groupBy ++ q.aggs.map(_.alias)).map(col): _*)
  }

  // --- render to DuckDB SQL --------------------------------------------
  private def sqlOf(q: Q): String = {
    val aggSql = q.aggs.map {
      case Agg("count", "*", a) => s"CAST(count(*) AS BIGINT) AS $a"
      case Agg(fn, c, a)        => s"CAST($fn($c) AS BIGINT) AS $a"
    }
    val where = q.preds
      .map(p => s"${p.col} ${p.op} ${p.lit}").mkString(" AND ")
    val having = q.having.map { case (a, v) => s"HAVING count(*) >= $v" }
      .getOrElse("")
    val order = (q.groupBy ++ q.aggs.map(_.alias)).mkString(", ")
    val from =
      if (q.joined) "lineitem JOIN orders ON l_orderkey = o_orderkey"
      else q.table
    s"""SELECT ${(q.groupBy ++ aggSql).mkString(", ")}
       |FROM $from
       |WHERE $where
       |GROUP BY ${q.groupBy.mkString(", ")}
       |$having
       |ORDER BY $order""".stripMargin
  }

  // --- V2 grammar: three-valued logic, outer joins, OR predicates ------
  // Spark↔DuckDB divergences live less in happy-path compositions than
  // in NULL semantics: UNKNOWN predicates, null-extended outer-join
  // rows, COUNT(col) vs COUNT(*), aggregates over all-null groups, and
  // null placement in ORDER BY. V2 queries derive NULLABLE columns with
  // NULLIF (`ncN = NULLIF(src % m, r)` — ~1/m of values null), left-join
  // a FILTERED orders side (so unmatched lineitems genuinely
  // null-extend), and draw CNF predicates — AND of OR-groups — mixing
  // range tests, IS [NOT] NULL, and nullable comparisons (whose UNKNOWN
  // rows must drop identically in both engines). Ordering pins NULLS
  // FIRST explicitly on BOTH renderings: Spark's ASC default is
  // nulls-first, DuckDB's is nulls-last, and the gate compares row
  // order.
  //
  // The v1 generator and its seeds are FROZEN — v2 is additive, so every
  // historical q_fuzz row keeps rendering byte-identically.
  private final case class NullCol(name: String, src: String, mod: Long, drop: Long)
  private sealed trait P2
  private final case class Cmp(c: String, op: String, lit: Long) extends P2
  private final case class NullTest(c: String, isNull: Boolean) extends P2
  private final case class Q2(
      table: String,
      custLimit: Option[Long],     // Some(L): lineitem ⟕ (orders WHERE o_custkey < L)
      nullables: Seq[NullCol],
      whereGroups: Seq[Seq[P2]],   // CNF: AND over groups, OR within
      groupBy: Seq[String],        // empty → scalar aggregate (always 1 row)
      aggs: Seq[Agg],
      having: Option[(String, Long)])

  /** Satisfiability discipline, v2 edition: every OR-group leads with a
    * WIDE arm (`col >= small` keeps ≥ half the table), so whatever the
    * other arm is — IS NULL, a nullable comparison — the group keeps
    * rows; the only bare AND conjuncts allowed are IS [NOT] NULL tests
    * whose both polarities are non-empty by construction (NULLIF drops
    * ~1/m; the filtered left join leaves both matched and unmatched
    * lineitems at every SF). HAVING count(*) >= 2 is drawn only when
    * grouping by a NULLIF column (≤ 6 groups over ≥ hundreds of rows —
    * groups that can't be singletons), never by a near-unique key. */
  /** The ONE wide-arm draw (the satisfiability anchor of every v2
    * OR-group) and the ONE NULLIF-column derivation — shared by the
    * generator families so their range arithmetic cannot drift apart.
    * Draw ORDER inside each is part of the frozen-seed contract: any
    * edit re-renders every v2 query (re-verify emptiness + oracles). */
  private def wideArm(rnd: scala.util.Random, cols: Seq[String]): P2 = {
    val c = cols(rnd.nextInt(cols.size))
    Cmp(c, ">=", 1 + math.abs(rnd.nextLong()) % math.max(ranges(c) / 2, 1))
  }

  private def deriveNullables(
      rnd: scala.util.Random, cols: Seq[String]): Seq[NullCol] =
    rnd.shuffle(cols).take(2).zipWithIndex.map { case (c, i) =>
      val m = 3L + rnd.nextInt(3)
      NullCol(s"nc$i", c, m, rnd.nextInt(m.toInt).toLong)
    }

  private def genNull(seed: Int): Q2 = {
    val rnd = new scala.util.Random(seed)
    val table = tables.keys.toSeq.sorted.apply(rnd.nextInt(tables.size))
    val cols = tables(table)
    val nullables = deriveNullables(rnd, cols)
    def wide(): P2 = wideArm(rnd, cols)
    def narrow(): P2 = rnd.nextInt(3) match {
      case 0 => NullTest(nullables.head.name, rnd.nextBoolean())
      case 1 => Cmp(nullables.head.name, ">=",
        rnd.nextInt((nullables.head.mod / 2).toInt + 1).toLong)
      case _ =>
        val c = cols(rnd.nextInt(cols.size))
        val r = ranges(c)
        Cmp(c, "<", r / 2 + 1 + math.abs(rnd.nextLong()) % (r - r / 2))
    }
    val whereGroups = Seq(Seq(wide(), narrow())) ++
      (if (rnd.nextBoolean()) Seq(Seq(NullTest(nullables.last.name, false)))
       else Nil)
    val groupBy = rnd.nextInt(4) match {
      case 0 => Seq(nullables.head.name)
      case 1 => Seq(cols(rnd.nextInt(cols.size)))
      case 2 => (Seq(nullables.head.name, cols(rnd.nextInt(cols.size)))).distinct
      case _ => Nil // scalar aggregate: 1 row whatever the filter keeps
    }
    val aggTarget = nullables.last.name
    val plain = cols.filterNot(groupBy.contains)
    val aggs = Seq(
      Agg("count", "*", "n"),
      Agg("count", aggTarget, "cn"), // skips nulls where n counts rows
      Agg(Seq("sum", "min", "max")(rnd.nextInt(3)),
        if (rnd.nextBoolean() || plain.isEmpty) aggTarget
        else plain(rnd.nextInt(plain.size)), "a0"))
    val having =
      if (groupBy == Seq(nullables.head.name) && rnd.nextBoolean())
        Some(("n", 2L))
      else None
    Q2(table, None, nullables, whereGroups, groupBy, aggs, having)
  }

  private def genLouter(seed: Int): Q2 = {
    val rnd = new scala.util.Random(seed)
    val lim = 20L + rnd.nextInt(120) // o_custkey < L: sub non-empty at sf0.001
    val cols = tables("lineitem")
    def wide(): P2 = wideArm(rnd, cols)
    def narrowOuter(): P2 = rnd.nextInt(3) match {
      case 0 => NullTest("o_custkey", rnd.nextBoolean())
      case 1 => Cmp("o_custkey", ">=", 1 + rnd.nextInt((lim / 2).toInt).toLong)
      case _ => Cmp("o_custkey", "<", 1 + rnd.nextInt(lim.toInt).toLong)
    }
    val whereGroups = Seq(Seq(wide(), narrowOuter())) ++
      // bare IS [NOT] NULL conjunct: both polarities non-empty — the
      // filtered join leaves matched AND unmatched lineitems at every SF
      (if (rnd.nextBoolean()) Seq(Seq(NullTest("o_custkey", rnd.nextBoolean())))
       else Nil)
    // no scalar branch here: the louter family exists to exercise
    // nullable GROUP BY keys and null-group ordering (the scalar shape
    // is covered by the null seeds and q_fuzz_empty_scalar)
    val groupBy = rnd.nextInt(3) match {
      case 0 => Seq("o_custkey") // NULLABLE group key: the null group rides
      case 1 => Seq("l_linenumber")
      case _ => Seq("o_custkey", "l_linenumber")
    }
    val aggs = Seq(
      Agg("count", "*", "n"),   // counts null-extended rows
      Agg("count", "o_custkey", "cn"), // skips them
      Agg(Seq("sum", "min", "max")(rnd.nextInt(3)),
        if (rnd.nextBoolean()) "l_quantity" else "o_custkey", "a0"))
    Q2("lineitem", Some(lim), Nil, whereGroups, groupBy, aggs, None)
  }

  /** DISTINCT × NULL interactions: COUNT(DISTINCT nc) skips nulls where
    * COUNT(*) counts rows, SUM(DISTINCT nc) collapses the value domain
    * (NULLIF keeps it < m, so sums are tiny and exact), and the two
    * engines must agree on both under the same CNF filters. Same
    * satisfiability discipline as genNull: the OR-group leads with a
    * wide arm, and DISTINCT aggregates target the NULLIF columns whose
    * both polarities are non-empty by construction. */
  private def genDistinct(seed: Int): Q2 = {
    val rnd = new scala.util.Random(seed)
    val table = tables.keys.toSeq.sorted.apply(rnd.nextInt(tables.size))
    val cols = tables(table)
    val nullables = deriveNullables(rnd, cols)
    val whereGroups =
      Seq(Seq(wideArm(rnd, cols), NullTest(nullables.head.name, rnd.nextBoolean())))
    val groupBy =
      if (rnd.nextBoolean()) Seq(cols(rnd.nextInt(cols.size))) else Nil
    val aggs = Seq(
      Agg("count", "*", "n"),
      Agg("cntd", nullables.last.name, "cd"),
      Agg("sumd", nullables.last.name, "sd"))
    Q2(table, None, nullables, whereGroups, groupBy, aggs, None)
  }

  private def sparkOfV2(q: Q2)(s: SparkSession, dir: String): DataFrame = {
    val joined = q.custLimit match {
      case Some(lim) =>
        Queries.rd(s, dir, "lineitem").join(
          Queries.rd(s, dir, "orders").select("o_orderkey", "o_custkey")
            .filter(col("o_custkey") < lim),
          col("l_orderkey") === col("o_orderkey"), "left")
      case None => Queries.rd(s, dir, q.table)
    }
    val base = q.nullables.foldLeft(joined) { (df, nc) =>
      df.withColumn(nc.name,
        when(col(nc.src) % nc.mod === nc.drop, lit(null).cast("long"))
          .otherwise(col(nc.src) % nc.mod))
    }
    def pred(p: P2): Column = p match {
      case Cmp(c, "<", v)     => col(c) < v
      case Cmp(c, ">=", v)    => col(c) >= v
      case Cmp(c, "=", v)     => col(c) === v
      case Cmp(c, "<>", v)    => col(c) =!= v
      case Cmp(_, op, _)      => throw new MatchError(op)
      case NullTest(c, true)  => col(c).isNull
      case NullTest(c, false) => col(c).isNotNull
    }
    val filtered = q.whereGroups.foldLeft(base) { (df, g) =>
      df.filter(g.map(pred).reduce(_ || _))
    }
    val aggCols = q.aggs.map {
      case Agg("count", "*", a) => count(lit(1)).as(a)
      case Agg("count", c, a)   => count(col(c)).as(a)
      case Agg("cntd", c, a)    => countDistinct(col(c)).as(a)
      case Agg("sumd", c, a)    => sum_distinct(col(c)).cast("long").as(a)
      case Agg("sum", c, a)     => sum(col(c)).cast("long").as(a)
      case Agg("min", c, a)     => min(col(c)).cast("long").as(a)
      case Agg("max", c, a)     => max(col(c)).cast("long").as(a)
      case other                => throw new MatchError(other)
    }
    val grouped =
      if (q.groupBy.isEmpty) filtered.agg(aggCols.head, aggCols.tail: _*)
      else filtered.groupBy(q.groupBy.map(col): _*)
        .agg(aggCols.head, aggCols.tail: _*)
    val post = q.having match {
      case Some((a, v)) => grouped.filter(col(a) >= v)
      case None         => grouped
    }
    // NULLS FIRST pinned on both renderings: Spark's ASC default agrees,
    // DuckDB's does not — and the gate compares row ORDER
    post.orderBy((q.groupBy ++ q.aggs.map(_.alias))
      .map(c => col(c).asc_nulls_first): _*)
  }

  private def sqlOfV2(q: Q2): String = {
    val baseFrom = q.custLimit match {
      case Some(lim) =>
        "lineitem LEFT JOIN (SELECT o_orderkey, o_custkey FROM orders " +
          s"WHERE o_custkey < $lim) sub ON l_orderkey = o_orderkey"
      case None => q.table
    }
    val from =
      if (q.nullables.isEmpty) baseFrom
      else {
        val ncs = q.nullables.map(nc =>
          s"NULLIF(${nc.src} % ${nc.mod}, ${nc.drop}) AS ${nc.name}")
          .mkString(", ")
        s"(SELECT *, $ncs FROM $baseFrom) t"
      }
    def p2(p: P2): String = p match {
      case Cmp(c, op, v)      => s"$c $op $v"
      case NullTest(c, true)  => s"$c IS NULL"
      case NullTest(c, false) => s"$c IS NOT NULL"
    }
    val where = q.whereGroups
      .map(g => "(" + g.map(p2).mkString(" OR ") + ")").mkString(" AND ")
    val aggSql = q.aggs.map {
      case Agg("count", "*", a) => s"CAST(count(*) AS BIGINT) AS $a"
      case Agg("cntd", c, a)    => s"CAST(count(DISTINCT $c) AS BIGINT) AS $a"
      case Agg("sumd", c, a)    => s"CAST(sum(DISTINCT $c) AS BIGINT) AS $a"
      case Agg(fn, c, a)        => s"CAST($fn($c) AS BIGINT) AS $a"
    }
    val groupClause =
      if (q.groupBy.isEmpty) "" else s"GROUP BY ${q.groupBy.mkString(", ")}"
    val havingClause =
      q.having.map { case (_, v) => s"HAVING count(*) >= $v" }.getOrElse("")
    val order = (q.groupBy ++ q.aggs.map(_.alias))
      .map(c => s"$c ASC NULLS FIRST").mkString(", ")
    s"""SELECT ${(q.groupBy ++ aggSql).mkString(", ")}
       |FROM $from
       |WHERE $where
       |$groupClause
       |$havingClause
       |ORDER BY $order""".stripMargin
  }

  // --- V3 grammar: window functions and set operations -----------------
  // Where v1/v2 fuzz filter×aggregate compositions and null semantics,
  // v3 reaches the two remaining operator families the hand-written gate
  // rows cover only at fixed shapes: ranking windows (partition
  // boundaries, frame-free ranking, ties) and two-arm set ops (bag vs
  // set semantics, positional column matching). Determinism discipline:
  // a row_number's OVER(ORDER BY) is always a per-table UNIQUE key, so
  // the assigned numbers are engine-independent; a rank's ties produce
  // deterministic rank VALUES whatever the engine's internal order; and
  // every final ORDER BY lists the full output row, so equal rows sort
  // equal and the gate's row-order hash is stable. Satisfiability: set
  // ops draw nested half-ranges on ONE column (armA ⊇ [r/2, r], armB =
  // [hi, r] with hi strictly inside), so UNION/INTERSECT keep armB's
  // rows and EXCEPT keeps the [r/2, hi) band — no draw can produce a
  // structurally-empty result.
  private val uniqueKey = Map(
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "orders" -> Seq("o_orderkey"),
    "customer" -> Seq("c_custkey"))
  private val partitionCols = Map(
    "lineitem" -> Seq("l_suppkey", "l_linenumber"),
    "orders" -> Seq("o_custkey"),
    "customer" -> Seq("c_nationkey"))

  private final case class QWin(
      table: String,
      part: String,        // PARTITION BY
      fn: String,          // row_number | rank
      ord: Seq[String],    // OVER(ORDER BY …) — unique key for row_number
      wide: Cmp,           // satisfiable filter under the window
      keep: Long)          // w <= keep

  private def genWindow(seed: Int): QWin = {
    val rnd = new scala.util.Random(seed)
    val table = tables.keys.toSeq.sorted.apply(rnd.nextInt(tables.size))
    val cols = tables(table)
    val part = partitionCols(table)(rnd.nextInt(partitionCols(table).size))
    // rank orders by a (possibly tied) non-key column when the table has
    // one outside the partition key; row_number always by the unique key
    val fn = if (rnd.nextBoolean()) "row_number" else "rank"
    val ord =
      if (fn == "row_number") uniqueKey(table)
      else {
        val cands = cols.filterNot(c =>
          c == part || uniqueKey(table).contains(c))
        if (cands.isEmpty) uniqueKey(table)
        else Seq(cands(rnd.nextInt(cands.size)))
      }
    val wide = wideArm(rnd, cols) match { case c: Cmp => c }
    QWin(table, part, fn, ord, wide, 2L + rnd.nextInt(3))
  }

  private def sparkOfWin(q: QWin)(s: SparkSession, dir: String): DataFrame = {
    val proj = (q.part +: q.ord).distinct
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(q.part)).orderBy(q.ord.map(col(_).asc): _*)
    val fnCol = q.fn match {
      case "row_number" => row_number()
      case _            => rank()
    }
    Queries.rd(s, dir, q.table)
      .filter(col(q.wide.c) >= q.wide.lit)
      .select(proj.map(col): _*)
      .withColumn("w", fnCol.over(w).cast("long"))
      .filter(col("w") <= q.keep)
      .orderBy((q.part +: "w" +: q.ord).distinct.map(col(_).asc): _*)
  }

  private def sqlOfWin(q: QWin): String = {
    val proj = (q.part +: q.ord).distinct.mkString(", ")
    val over =
      s"${q.fn}() OVER (PARTITION BY ${q.part} ORDER BY ${q.ord.mkString(" ASC, ")} ASC)"
    val order = (q.part +: "w" +: q.ord).distinct.map(c => s"$c ASC").mkString(", ")
    s"""SELECT $proj, w FROM (
       |  SELECT $proj, CAST($over AS BIGINT) AS w
       |  FROM ${q.table}
       |  WHERE ${q.wide.c} >= ${q.wide.lit}
       |) sub
       |WHERE w <= ${q.keep}
       |ORDER BY $order""".stripMargin
  }

  private final case class QSet(
      table: String,
      keyCol: String,      // the nested-range predicate column
      lo: Long, hi: Long,  // armA: key >= lo; armB: key >= hi (lo < hi)
      projCol: String,     // second projected column, mod-reduced
      mod: Long,
      op: String)          // union_all|union|intersect|intersect_all|except|except_all

  private def genSetOp(seed: Int): QSet = {
    val rnd = new scala.util.Random(seed)
    val table = tables.keys.toSeq.sorted.apply(rnd.nextInt(tables.size))
    val cols = tables(table)
    val keyCol = cols.maxBy(ranges) // widest range: the nesting has room
    val r = ranges(keyCol)
    val lo = r / 2
    val hi = lo + math.max((r - lo) / 2, 1)
    val others = cols.filterNot(_ == keyCol)
    val projCol = others(rnd.nextInt(others.size))
    val op = Seq("union_all", "union", "intersect", "intersect_all",
      "except", "except_all")(rnd.nextInt(6))
    QSet(table, keyCol, lo, hi, projCol, 3L + rnd.nextInt(4), op)
  }

  private def sparkOfSet(q: QSet)(s: SparkSession, dir: String): DataFrame = {
    def arm(bound: Long): DataFrame =
      Queries.rd(s, dir, q.table)
        .filter(col(q.keyCol) >= bound)
        // BIGINT on both projections: source columns are int32 in some
        // tables and the gate compares dtypes
        .select(col(q.keyCol).cast("long").as("k"),
          (col(q.projCol) % q.mod).cast("long").as("p"))
    val a = arm(q.lo); val b = arm(q.hi)
    val combined = q.op match {
      case "union_all"     => a.unionAll(b)
      case "union"         => a.unionAll(b).distinct()
      case "intersect"     => a.intersect(b)
      case "intersect_all" => a.intersectAll(b)
      case "except"        => a.except(b)
      case "except_all"    => a.exceptAll(b)
      case other           => throw new MatchError(other)
    }
    combined.orderBy(col("k").asc, col("p").asc)
  }

  private def sqlOfSet(q: QSet): String = {
    def arm(bound: Long): String =
      s"SELECT CAST(${q.keyCol} AS BIGINT) AS k, " +
        s"CAST(${q.projCol} % ${q.mod} AS BIGINT) AS p " +
        s"FROM ${q.table} WHERE ${q.keyCol} >= $bound"
    val opSql = q.op match {
      case "union_all"     => "UNION ALL"
      case "union"         => "UNION"
      case "intersect"     => "INTERSECT"
      case "intersect_all" => "INTERSECT ALL"
      case "except"        => "EXCEPT"
      case "except_all"    => "EXCEPT ALL"
    }
    s"""SELECT k, p FROM (
       |${arm(q.lo)}
       |$opSql
       |${arm(q.hi)}
       |) u
       |ORDER BY k ASC, p ASC""".stripMargin
  }

  // --- V4 grammar: subquery predicates and multi-level grouping --------
  // The two operator families the hand-written gate rows reach only at
  // fixed shapes: subquery predicates (IN / NOT IN / EXISTS / NOT
  // EXISTS / scalar-compare — Spark plans the DataFrame semi/anti-join
  // form while DuckDB runs the textual subquery through its own
  // decorrelation, so the differential crosses two genuinely different
  // planning paths) and multi-level grouping (ROLLUP/CUBE subtotal
  // rows). Satisfiability: the orders-side bound lives in [20, 69] —
  // o_custkey spans ≥140 at the SMALLEST corpus, so both `< bound` and
  // `>= bound` order sets are non-empty, which keeps every IN/EXISTS
  // polarity non-empty (orderkeys are dense and every order has
  // lineitems); the scalar floor is `count(*) % m + 1` ∈ [1, 25] under
  // quantity's 1..50. Determinism: grouped outputs order by the full
  // row; rollup keys are mod-reduced NON-NULL columns, so a NULL key
  // always means a subtotal row — no data/subtotal ambiguity — and
  // NULLS FIRST is pinned on both renderings.
  private final case class QSub(
      kind: String,  // in | not_in | exists | not_exists | scalar
      bound: Long,   // orders arm: o_custkey < bound
      wide: Cmp,     // satisfiable outer lineitem filter
      group: String, // outer group key
      mod: Long)     // scalar kind: quantity floor = count(*) % mod + 1

  private def genSub(seed: Int): QSub = {
    val rnd = new scala.util.Random(seed)
    val kind = Seq("in", "not_in", "exists", "not_exists", "scalar")(
      rnd.nextInt(5))
    val bound = 20L + rnd.nextInt(50)
    val wide = wideArm(rnd, tables("lineitem")) match { case c: Cmp => c }
    val group = Seq("l_linenumber", "l_suppkey")(rnd.nextInt(2))
    QSub(kind, bound, wide, group, 10L + rnd.nextInt(16))
  }

  private def sparkOfSub(q: QSub)(s: SparkSession, dir: String): DataFrame = {
    val li = Queries.rd(s, dir, "lineitem").filter(col(q.wide.c) >= q.wide.lit)
    val subOrders = Queries.rd(s, dir, "orders")
      .filter(col("o_custkey") < q.bound)
    val filtered = q.kind match {
      // IN and EXISTS are the same semi-join to Catalyst — the
      // differential lives on the DuckDB side, where the two forms
      // decorrelate differently
      case "in" | "exists" =>
        li.join(subOrders.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
      case "not_in" | "not_exists" =>
        // o_orderkey is non-null, so NOT IN has no three-valued trap
        // and the anti join is exact
        li.join(subOrders.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
      case _ =>
        val floor = subOrders
          .agg((count(lit(1)) % q.mod + 1).as("qfloor"))
        li.crossJoin(floor).filter(col("l_quantity") >= col("qfloor"))
    }
    filtered.groupBy(q.group)
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("long").as("s"))
      .orderBy(col(q.group).asc, col("n").asc, col("s").asc)
  }

  private def sqlOfSub(q: QSub): String = {
    val subPred = q.kind match {
      case "in" =>
        s"l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_custkey < ${q.bound})"
      case "not_in" =>
        s"l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_custkey < ${q.bound})"
      case "exists" =>
        s"EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_custkey < ${q.bound})"
      case "not_exists" =>
        s"NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_custkey < ${q.bound})"
      case _ =>
        s"l_quantity >= (SELECT count(*) % ${q.mod} + 1 FROM orders WHERE o_custkey < ${q.bound})"
    }
    s"""SELECT ${q.group}, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(l_quantity) AS BIGINT) AS s
       |FROM lineitem
       |WHERE ${q.wide.c} >= ${q.wide.lit} AND $subPred
       |GROUP BY ${q.group}
       |ORDER BY ${q.group} ASC, n ASC, s ASC""".stripMargin
  }

  private final case class QRoll(
      table: String,
      src1: String, m1: Long, // k1 = src1 % m1 (never NULL in data rows)
      src2: String, m2: Long, // k2 = src2 % m2
      op: String,             // rollup | cube
      wide: Cmp,
      aggCol: String)

  private def genRoll(seed: Int): QRoll = {
    val rnd = new scala.util.Random(seed)
    val table = tables.keys.toSeq.sorted.apply(rnd.nextInt(tables.size))
    val cols = tables(table)
    val src1 = cols(rnd.nextInt(cols.size))
    val src2 = cols.filterNot(_ == src1).apply(
      rnd.nextInt(cols.size - 1))
    val op = if (rnd.nextBoolean()) "rollup" else "cube"
    val wide = wideArm(rnd, cols) match { case c: Cmp => c }
    QRoll(table, src1, 2L + rnd.nextInt(3), src2, 3L + rnd.nextInt(3),
      op, wide, cols(rnd.nextInt(cols.size)))
  }

  private def sparkOfRoll(q: QRoll)(s: SparkSession, dir: String): DataFrame = {
    val base = Queries.rd(s, dir, q.table)
      .filter(col(q.wide.c) >= q.wide.lit)
      .withColumn("k1", (col(q.src1) % q.m1).cast("long"))
      .withColumn("k2", (col(q.src2) % q.m2).cast("long"))
    val grouped =
      if (q.op == "rollup") base.rollup("k1", "k2") else base.cube("k1", "k2")
    grouped
      .agg(count(lit(1)).as("n"),
        sum(col(q.aggCol)).cast("long").as("s"))
      .orderBy(col("k1").asc_nulls_first, col("k2").asc_nulls_first)
  }

  private def sqlOfRoll(q: QRoll): String = {
    val opSql = if (q.op == "rollup") "ROLLUP" else "CUBE"
    s"""SELECT k1, k2, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(${q.aggCol}) AS BIGINT) AS s
       |FROM (SELECT CAST(${q.src1} % ${q.m1} AS BIGINT) AS k1,
       |        CAST(${q.src2} % ${q.m2} AS BIGINT) AS k2, ${q.aggCol}
       |      FROM ${q.table} WHERE ${q.wide.c} >= ${q.wide.lit}) sub
       |GROUP BY $opSql (k1, k2)
       |ORDER BY k1 ASC NULLS FIRST, k2 ASC NULLS FIRST""".stripMargin
  }

  // --- V5 grammar: correlated scalar subqueries ------------------------
  // The decorrelation stressor: "rows above/below their GROUP's
  // aggregate". Spark renders the WINDOW form (partition aggregate +
  // filter — the idiomatic DataFrame shape), DuckDB the textual
  // correlated scalar subquery, so the compare crosses window
  // evaluation on one side and subquery decorrelation on the other.
  // Equality holds because the inner subquery carries the SAME wide
  // filter as the outer query — the correlated set IS the window
  // partition. Engine-portable arithmetic: avg is an exact-integer sum
  // divided once in double (identical IEEE result both sides);
  // min/max stay integral. Strict/non-strict comparisons are both
  // drawn; boundary rows (value == aggregate) resolve identically.
  private final case class QCorr(
      group: String,  // correlation key
      aggFn: String,  // avg | min | max over l_quantity
      cmp: String,    // > | <=
      wide: Cmp)

  private def genCorr(seed: Int): QCorr = {
    val rnd = new scala.util.Random(seed)
    val group = Seq("l_orderkey", "l_suppkey", "l_partkey")(rnd.nextInt(3))
    val aggFn = Seq("avg", "min", "max")(rnd.nextInt(3))
    // `> max(group)` is structurally empty — the one draw the
    // satisfiability discipline forbids; every other (fn, cmp) combo
    // keeps rows (`<= min` keeps exactly the group minima — the tie
    // shape; `<= max` keeps all — the boundary shape)
    val cmp =
      if (aggFn == "max") "<="
      else if (rnd.nextBoolean()) ">" else "<="
    val wide = wideArm(rnd, tables("lineitem")) match { case c: Cmp => c }
    QCorr(group, aggFn, cmp, wide)
  }

  private def sparkOfCorr(q: QCorr)(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(q.group)
    val aggCol = q.aggFn match {
      case "avg" => avg(col("l_quantity"))
      case "min" => min(col("l_quantity"))
      case "max" => max(col("l_quantity"))
    }
    val filtered = Queries.rd(s, dir, "lineitem")
      .filter(col(q.wide.c) >= q.wide.lit)
      .withColumn("__t", aggCol.over(w))
    val kept = q.cmp match {
      case ">" => filtered.filter(col("l_quantity") > col("__t"))
      case _   => filtered.filter(col("l_quantity") <= col("__t"))
    }
    kept.groupBy(q.group)
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("long").as("s"))
      .orderBy(col(q.group).asc, col("n").asc, col("s").asc)
  }

  private def sqlOfCorr(q: QCorr): String =
    s"""SELECT ${q.group}, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(l_quantity) AS BIGINT) AS s
       |FROM lineitem l
       |WHERE l.${q.wide.c} >= ${q.wide.lit} AND l.l_quantity ${q.cmp} (
       |  SELECT ${q.aggFn}(l2.l_quantity) FROM lineitem l2
       |  WHERE l2.${q.group} = l.${q.group}
       |    AND l2.${q.wide.c} >= ${q.wide.lit})
       |GROUP BY ${q.group}
       |ORDER BY ${q.group} ASC, n ASC, s ASC""".stripMargin

  /** Seeds are FIXED: the gate must be reproducible run-to-run and match
    * the oracle map below. Plain seeds fuzz one table; join seeds fuzz
    * lineitem ⋈ orders compositions (pushdown through the join, partial
    * aggregation above it); null seeds fuzz NULLIF-derived three-valued
    * logic; louter seeds fuzz LEFT JOIN null extension. */
  private val seeds = Seq(101, 202, 303, 404, 505)
  private val joinSeeds = Seq(611, 722, 833)
  private val nullSeeds = Seq(917, 1013, 1201, 1303)
  private val louterSeeds = Seq(1409, 1511, 1607)
  private val distinctSeeds = Seq(2003, 2111, 2207)
  // 3308: rank over a SECOND partition shape (seed-scanned so both rank
  // arms and all six set ops are drawn at least once); 4413: except_all
  private val winSeeds = Seq(3001, 3109, 3203, 3301, 3308)
  private val setSeeds = Seq(4001, 4099, 4201, 4303, 4409, 4413)
  // --- V6 grammar: cross-family compositions ---------------------------
  // The two families the earlier grammars never compose (r12 verdict
  // #5): ranking windows over a JOIN tree, and set operations whose
  // arms are GROUPED AGGREGATES. Determinism carries over from v3: the
  // window projection is ⊆ {partition col} ∪ OVER(ORDER BY) cols, so
  // any ordering tie is between rows identical in every projected
  // column and the assigned numbers cannot diverge between engines.
  // Satisfiability for the grouped set ops is per-op: the
  // value column is min(proj % m) for union/intersect draws (stable
  // across the nested ranges, so arms agree on most groups) and
  // count(*) for union_all/except draws (counts strictly shrink from
  // armA to armB wherever the [lo, hi) band holds rows, so the
  // difference is non-empty) — then seed-scanned by `main` at all
  // three SFs like every other family.
  private final case class QWinJoin(
      custLt: Long,        // orders side pre-filtered: o_custkey < L
      part: String,
      fn: String,          // row_number | rank
      ord: Seq[String],
      wide: Cmp,           // satisfiable lineitem filter
      keep: Long)

  private def genWinJoin(seed: Int): QWinJoin = {
    val rnd = new scala.util.Random(seed)
    val custLt = 40L + rnd.nextInt(100)
    val part = Seq("l_suppkey", "l_linenumber", "o_custkey")(rnd.nextInt(3))
    val fn = if (rnd.nextBoolean()) "row_number" else "rank"
    val ord =
      if (fn == "row_number") Seq("l_orderkey", "l_linenumber")
      else Seq(Seq("l_quantity", "l_partkey")(rnd.nextInt(2)))
    val wide = wideArm(rnd, tables("lineitem")) match { case c: Cmp => c }
    QWinJoin(custLt, part, fn, ord, wide, 2L + rnd.nextInt(3))
  }

  private def sparkOfWinJoin(q: QWinJoin)(
      s: SparkSession, dir: String): DataFrame = {
    val proj = (q.part +: q.ord).distinct
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(q.part)).orderBy(q.ord.map(col(_).asc): _*)
    val fnCol = if (q.fn == "row_number") row_number() else rank()
    Queries.rd(s, dir, "lineitem")
      .join(Queries.rd(s, dir, "orders")
        .filter(col("o_custkey") < q.custLt)
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col(q.wide.c) >= q.wide.lit)
      .select(proj.map(c => col(c).cast("long").as(c)): _*)
      .withColumn("w", fnCol.over(w).cast("long"))
      .filter(col("w") <= q.keep)
      .orderBy((q.part +: "w" +: q.ord).distinct.map(col(_).asc): _*)
  }

  private def sqlOfWinJoin(q: QWinJoin): String = {
    val proj = (q.part +: q.ord).distinct
      .map(c => s"CAST($c AS BIGINT) AS $c").mkString(", ")
    val over = s"${q.fn}() OVER (PARTITION BY ${q.part} " +
      s"ORDER BY ${q.ord.mkString(" ASC, ")} ASC)"
    val order = (q.part +: "w" +: q.ord).distinct
      .map(c => s"$c ASC").mkString(", ")
    s"""SELECT ${(q.part +: q.ord).distinct.mkString(", ")}, w FROM (
       |  SELECT $proj, CAST($over AS BIGINT) AS w
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_custkey < ${q.custLt} AND ${q.wide.c} >= ${q.wide.lit}
       |) sub
       |WHERE w <= ${q.keep}
       |ORDER BY $order""".stripMargin
  }

  private final case class QSetGrp(
      table: String,
      keyCol: String,      // nested-range filter column
      lo: Long, hi: Long,
      grpCol: String,      // LOW-cardinality group key
      projCol: String, mod: Long,
      op: String,
      useCount: Boolean)   // v = count(*) (else min(proj % mod))

  private def genSetGrp(seed: Int): QSetGrp = {
    val rnd = new scala.util.Random(seed)
    val table = tables.keys.toSeq.sorted.apply(rnd.nextInt(tables.size))
    val cols = tables(table)
    val keyCol = cols.maxBy(ranges)
    val r = ranges(keyCol)
    val lo = r / 2
    val hi = lo + math.max((r - lo) / 2, 1)
    val grpCol = cols.filterNot(_ == keyCol).minBy(ranges)
    val others = cols.filterNot(c => c == keyCol || c == grpCol)
    val projCol = if (others.isEmpty) grpCol else others(rnd.nextInt(others.size))
    val op = Seq("union_all", "union", "intersect", "intersect_all",
      "except", "except_all")(rnd.nextInt(6))
    val useCount = op == "union_all" || op == "except" || op == "except_all"
    QSetGrp(table, keyCol, lo, hi, grpCol, projCol, 3L + rnd.nextInt(4), op,
      useCount)
  }

  private def sparkOfSetGrp(q: QSetGrp)(
      s: SparkSession, dir: String): DataFrame = {
    def arm(bound: Long): DataFrame = {
      val v =
        if (q.useCount) count(lit(1)).as("v")
        else min(col(q.projCol) % q.mod).cast("long").as("v")
      Queries.rd(s, dir, q.table)
        .filter(col(q.keyCol) >= bound)
        .groupBy(col(q.grpCol).cast("long").as("g"))
        .agg(v)
    }
    val a = arm(q.lo); val b = arm(q.hi)
    val combined = q.op match {
      case "union_all"     => a.unionAll(b)
      case "union"         => a.unionAll(b).distinct()
      case "intersect"     => a.intersect(b)
      case "intersect_all" => a.intersectAll(b)
      case "except"        => a.except(b)
      case "except_all"    => a.exceptAll(b)
      case other           => throw new MatchError(other)
    }
    combined.orderBy(col("g").asc, col("v").asc)
  }

  private def sqlOfSetGrp(q: QSetGrp): String = {
    def arm(bound: Long): String = {
      val v =
        if (q.useCount) "CAST(count(*) AS BIGINT)"
        else s"CAST(min(${q.projCol} % ${q.mod}) AS BIGINT)"
      s"SELECT CAST(${q.grpCol} AS BIGINT) AS g, $v AS v " +
        s"FROM ${q.table} WHERE ${q.keyCol} >= $bound GROUP BY ${q.grpCol}"
    }
    val opSql = q.op match {
      case "union_all"     => "UNION ALL"
      case "union"         => "UNION"
      case "intersect"     => "INTERSECT"
      case "intersect_all" => "INTERSECT ALL"
      case "except"        => "EXCEPT"
      case "except_all"    => "EXCEPT ALL"
    }
    s"""SELECT g, v FROM (
       |${arm(q.lo)}
       |$opSql
       |${arm(q.hi)}
       |) u
       |ORDER BY g ASC, v ASC""".stripMargin
  }

  // v7 family 1 — JOIN OF TWO GROUPED SUBQUERIES (agg → join → agg):
  // each arm groups a DIFFERENT table by a shared-domain key modulo m,
  // the arms equi-join on the group id, and an optional cross-arm
  // comparison filters on the two aggregate values. No earlier family
  // joins AFTER aggregation (winjoin windows after a row-level join;
  // setgrp set-ops grouped arms of the SAME table).
  private final case class QAggJoin(
      lt: String, lk: String,   // left table + its key column
      rt: String, rk: String,   // right table + shared-domain key
      mod: Long,
      lo1: Long, lo2: Long,     // per-arm key filters
      lf: String, lproj: String, lmod: Long, // left agg shape
      rf: String, rproj: String, rmod: Long, // right agg shape
      cmp: Option[String])      // None | ">=" | "<" on (va, vb)

  private def genAggJoin(seed: Int): QAggJoin = {
    val rnd = new scala.util.Random(seed)
    // pair from seed PARITY, not a random draw: consecutive java
    // Random seeds correlate on the first boolean (all 10001–10008
    // drew true), which starved the lineitem pair of coverage
    val (lt, lk, rt, rk) =
      if (seed % 2 == 1) ("orders", "o_custkey", "customer", "c_custkey")
      else ("lineitem", "l_orderkey", "orders", "o_orderkey")
    val mod = 5L + rnd.nextInt(6)
    def lo(k: String) = ranges(k) / 4 + rnd.nextInt((ranges(k) / 4).toInt max 1)
    def aggShape(t: String): (String, String, Long) = {
      val fn = Seq("count", "min", "max")(rnd.nextInt(3))
      val cols = tables(t)
      (fn, cols(rnd.nextInt(cols.size)), 3L + rnd.nextInt(5))
    }
    val (lf, lp, lm) = aggShape(lt)
    val (rf, rp, rm) = aggShape(rt)
    val cmp = rnd.nextInt(3) match {
      case 0 => Some(">="); case 1 => Some("<"); case _ => None
    }
    QAggJoin(lt, lk, rt, rk, mod, lo(lk), lo(rk), lf, lp, lm, rf, rp, rm, cmp)
  }

  private def sparkOfAggJoin(q: QAggJoin)(
      s: SparkSession, dir: String): DataFrame = {
    def arm(t: String, k: String, lo: Long,
        fn: String, proj: String, pmod: Long, alias: String): DataFrame = {
      val v = fn match {
        case "count" => count(lit(1))
        case "min"   => min(col(proj) % pmod)
        case "max"   => max(col(proj) % pmod)
      }
      Queries.rd(s, dir, t)
        .filter(col(k) >= lo)
        .groupBy((col(k) % q.mod).cast("long").as("g"))
        .agg(v.cast("long").as(alias))
    }
    val a = arm(q.lt, q.lk, q.lo1, q.lf, q.lproj, q.lmod, "va")
    val b = arm(q.rt, q.rk, q.lo2, q.rf, q.rproj, q.rmod, "vb")
    val joined = a.join(b, Seq("g"))
    val filtered = q.cmp match {
      case Some(">=") => joined.filter(col("va") >= col("vb"))
      case Some("<")  => joined.filter(col("va") < col("vb"))
      case _          => joined
    }
    filtered.select("g", "va", "vb").orderBy(col("g").asc)
  }

  private def sqlOfAggJoin(q: QAggJoin): String = {
    def arm(t: String, k: String, lo: Long,
        fn: String, proj: String, pmod: Long, alias: String): String = {
      val v = fn match {
        case "count" => "count(*)"
        case "min"   => s"min($proj % $pmod)"
        case "max"   => s"max($proj % $pmod)"
      }
      s"SELECT CAST($k % ${q.mod} AS BIGINT) AS g, CAST($v AS BIGINT) AS $alias " +
        s"FROM $t WHERE $k >= $lo GROUP BY $k % ${q.mod}"
    }
    val where = q.cmp.map(c => s"\nWHERE a.va $c b.vb").getOrElse("")
    s"""SELECT a.g AS g, a.va AS va, b.vb AS vb FROM (
       |${arm(q.lt, q.lk, q.lo1, q.lf, q.lproj, q.lmod, "va")}
       |) a JOIN (
       |${arm(q.rt, q.rk, q.lo2, q.rf, q.rproj, q.rmod, "vb")}
       |) b ON a.g = b.g$where
       |ORDER BY g ASC""".stripMargin
  }

  // v7 family 2 — RANK GROUPS BY THEIR AGGREGATE (window AFTER
  // aggregation — the top-k-groups report shape): group, aggregate,
  // then rank the groups globally by the aggregate value. The win
  // family windows over raw rows; no family windows over a grouped
  // result. The global window runs over ≤ |groups| rows (bounded by the
  // group key's cardinality, not the corpus), and (v DESC, g ASC) is a
  // total order so rank is tie-free in both engines.
  private final case class QRankGrp(
      table: String, grpCol: String, keyCol: String, lo: Long,
      useCount: Boolean, projCol: String, pmod: Long, keep: Long)

  private def genRankGrp(seed: Int): QRankGrp = {
    val rnd = new scala.util.Random(seed)
    val table = tables.keys.toSeq.sorted.apply(rnd.nextInt(tables.size))
    val cols = tables(table)
    val keyCol = cols.maxBy(ranges)
    val lo = ranges(keyCol) / 3 + rnd.nextInt((ranges(keyCol) / 4).toInt max 1)
    val grpCol = cols.filterNot(_ == keyCol).minBy(ranges)
    val others = cols.filterNot(c => c == keyCol || c == grpCol)
    val projCol = if (others.isEmpty) grpCol else others(rnd.nextInt(others.size))
    QRankGrp(table, grpCol, keyCol, lo, rnd.nextBoolean(), projCol,
      3L + rnd.nextInt(4), 2L + rnd.nextInt(4))
  }

  private def sparkOfRankGrp(q: QRankGrp)(
      s: SparkSession, dir: String): DataFrame = {
    val v =
      if (q.useCount) count(lit(1))
      else min(col(q.projCol) % q.pmod)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v").desc, col("g").asc)
    Queries.rd(s, dir, q.table)
      .filter(col(q.keyCol) >= q.lo)
      .groupBy(col(q.grpCol).cast("long").as("g"))
      .agg(v.cast("long").as("v"))
      .withColumn("r", rank().over(w).cast("long"))
      .filter(col("r") <= q.keep)
      .orderBy(col("r").asc, col("g").asc)
  }

  private def sqlOfRankGrp(q: QRankGrp): String = {
    val v =
      if (q.useCount) "count(*)"
      else s"min(${q.projCol} % ${q.pmod})"
    s"""SELECT g, v, r FROM (
       |  SELECT g, v, CAST(rank() OVER (ORDER BY v DESC, g ASC) AS BIGINT) AS r
       |  FROM (SELECT CAST(${q.grpCol} AS BIGINT) AS g, CAST($v AS BIGINT) AS v
       |        FROM ${q.table} WHERE ${q.keyCol} >= ${q.lo}
       |        GROUP BY ${q.grpCol}) s
       |) t WHERE r <= ${q.keep}
       |ORDER BY r ASC, g ASC""".stripMargin
  }

  // v8 family 1 — GROUPS COMPARED TO THE MEAN OF GROUP AGGREGATES
  // (uncorrelated scalar subqueries OVER an aggregated result — the
  // "above/below average" report shape; the sub/corr families subquery
  // over RAW rows only). Mean comparison is INTEGER-EXACT: v·n ⋛ Σv
  // instead of v ⋛ avg(v), so no fp tie can diverge between engines.
  private final case class QAvgHaving(
      table: String, grpCol: String, keyCol: String, lo: Long,
      useCount: Boolean, projCol: String, pmod: Long, ge: Boolean)

  private def genAvgHaving(seed: Int): QAvgHaving = {
    val rnd = new scala.util.Random(seed)
    val table = tables.keys.toSeq.sorted.apply(rnd.nextInt(tables.size))
    val cols = tables(table)
    val keyCol = cols.maxBy(ranges)
    val lo = ranges(keyCol) / 4 + rnd.nextInt((ranges(keyCol) / 4).toInt max 1)
    val grpCol = cols.filterNot(_ == keyCol).minBy(ranges)
    val others = cols.filterNot(c => c == keyCol || c == grpCol)
    val projCol = if (others.isEmpty) grpCol else others(rnd.nextInt(others.size))
    QAvgHaving(table, grpCol, keyCol, lo, rnd.nextBoolean(), projCol,
      3L + rnd.nextInt(5), rnd.nextBoolean())
  }

  private def sparkOfAvgHaving(q: QAvgHaving)(
      s: SparkSession, dir: String): DataFrame = {
    val v =
      if (q.useCount) count(lit(1))
      else max(col(q.projCol) % q.pmod)
    val g = Queries.rd(s, dir, q.table)
      .filter(col(q.keyCol) >= q.lo)
      .groupBy(col(q.grpCol).cast("long").as("g"))
      .agg(v.cast("long").as("v"))
    // broadcast-scalar idiom: (n, Σv) is one row; the SQL rendering
    // uses genuine scalar subqueries — same semantics, and the
    // DIFFERENCE in plan shape is the differential point
    val stats = g.agg(count(lit(1)).cast("long").as("n"),
      sum(col("v")).cast("long").as("s"))
    val j = g.crossJoin(broadcast(stats))
    val f =
      if (q.ge) j.filter(col("v") * col("n") >= col("s"))
      else j.filter(col("v") * col("n") < col("s"))
    f.select("g", "v").orderBy(col("g").asc, col("v").asc)
  }

  private def sqlOfAvgHaving(q: QAvgHaving): String = {
    val v = if (q.useCount) "count(*)" else s"max(${q.projCol} % ${q.pmod})"
    val cmp = if (q.ge) ">=" else "<"
    s"""WITH grp AS (
       |  SELECT CAST(${q.grpCol} AS BIGINT) AS g, CAST($v AS BIGINT) AS v
       |  FROM ${q.table} WHERE ${q.keyCol} >= ${q.lo}
       |  GROUP BY ${q.grpCol})
       |SELECT g, v FROM grp
       |WHERE v * (SELECT count(*) FROM grp) $cmp (SELECT sum(v) FROM grp)
       |ORDER BY g ASC, v ASC""".stripMargin
  }

  // v8 family 2 — RUNNING FRAME OVER A GROUPED RESULT (cumulative sum
  // of group aggregates in group order — the cumulative-share report
  // shape): the win family frames over RAW rows, rankgrp ranks groups
  // frameless; no family runs an explicit ROWS frame over an aggregate.
  // The global window covers ≤ |groups| rows (group-key cardinality,
  // corpus-size-independent) and g is unique, so cum is a total order.
  private final case class QCumGrp(
      table: String, grpCol: String, keyCol: String, lo: Long,
      useCount: Boolean, projCol: String, pmod: Long)

  private def genCumGrp(seed: Int): QCumGrp = {
    val rnd = new scala.util.Random(seed)
    val table = tables.keys.toSeq.sorted.apply(rnd.nextInt(tables.size))
    val cols = tables(table)
    val keyCol = cols.maxBy(ranges)
    val lo = ranges(keyCol) / 3 + rnd.nextInt((ranges(keyCol) / 4).toInt max 1)
    val grpCol = cols.filterNot(_ == keyCol).minBy(ranges)
    val others = cols.filterNot(c => c == keyCol || c == grpCol)
    val projCol = if (others.isEmpty) grpCol else others(rnd.nextInt(others.size))
    QCumGrp(table, grpCol, keyCol, lo, rnd.nextBoolean(), projCol,
      3L + rnd.nextInt(4))
  }

  private def sparkOfCumGrp(q: QCumGrp)(
      s: SparkSession, dir: String): DataFrame = {
    val v =
      if (q.useCount) count(lit(1))
      else min(col(q.projCol) % q.pmod)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("g").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Queries.rd(s, dir, q.table)
      .filter(col(q.keyCol) >= q.lo)
      .groupBy(col(q.grpCol).cast("long").as("g"))
      .agg(v.cast("long").as("v"))
      .withColumn("cum", sum(col("v")).over(w).cast("long"))
      .orderBy(col("g").asc)
  }

  private def sqlOfCumGrp(q: QCumGrp): String = {
    val v = if (q.useCount) "count(*)" else s"min(${q.projCol} % ${q.pmod})"
    s"""SELECT g, v, CAST(sum(v) OVER (ORDER BY g ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |FROM (SELECT CAST(${q.grpCol} AS BIGINT) AS g, CAST($v AS BIGINT) AS v
       |      FROM ${q.table} WHERE ${q.keyCol} >= ${q.lo}
       |      GROUP BY ${q.grpCol}) s
       |ORDER BY g ASC""".stripMargin
  }

  // v9 family 1 — RUNNING FRAME OVER A SET-OP OVER GROUPED ARMS (the
  // first THREE-deep composition: group → set-op → window; the setgrp
  // family stops at the set-op, cumgrp frames over ONE grouped result).
  // Two arms of the SAME table under different key cutoffs aggregate to
  // (g, v) rows, combine via UNION ALL / INTERSECT / EXCEPT, and the
  // running sum frames over the combined result. The window covers
  // ≤ 2·|groups| rows (corpus-size-independent); UNION ALL can
  // duplicate (g, v) rows, so the output's total order includes `cum`
  // itself — equal rows carry distinct cumulative values.
  private final case class QWinSetGrp(
      table: String, grpCol: String, keyCol: String,
      lo1: Long, lo2: Long, op: String, useCount: Boolean,
      projCol: String, pmod: Long)

  private def genWinSetGrp(seed: Int): QWinSetGrp = {
    val rnd = new scala.util.Random(seed)
    val table = tables.keys.toSeq.sorted.apply(rnd.nextInt(tables.size))
    val cols = tables(table)
    val keyCol = cols.maxBy(ranges)
    val r = ranges(keyCol)
    val lo1 = r / 4 + rnd.nextInt((r / 4).toInt max 1)
    val lo2 = r / 3 + rnd.nextInt((r / 4).toInt max 1)
    val grpCol = cols.filterNot(_ == keyCol).minBy(ranges)
    val others = cols.filterNot(c => c == keyCol || c == grpCol)
    val projCol = if (others.isEmpty) grpCol else others(rnd.nextInt(others.size))
    val op = Seq("union_all", "intersect", "except")(rnd.nextInt(3))
    QWinSetGrp(table, grpCol, keyCol, lo1, lo2, op, rnd.nextBoolean(),
      projCol, 3L + rnd.nextInt(4))
  }

  private def sparkOfWinSetGrp(q: QWinSetGrp)(
      s: SparkSession, dir: String): DataFrame = {
    def arm(lo: Long): DataFrame = {
      val v =
        if (q.useCount) count(lit(1))
        else max(col(q.projCol) % q.pmod)
      Queries.rd(s, dir, q.table)
        .filter(col(q.keyCol) >= lo)
        .groupBy(col(q.grpCol).cast("long").as("g"))
        .agg(v.cast("long").as("v"))
    }
    val u = q.op match {
      case "union_all" => arm(q.lo1).unionAll(arm(q.lo2))
      case "intersect" => arm(q.lo1).intersect(arm(q.lo2))
      case _           => arm(q.lo1).except(arm(q.lo2))
    }
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("g").asc, col("v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    u.withColumn("cum", sum(col("v")).over(w).cast("long"))
      .orderBy(col("g").asc, col("v").asc, col("cum").asc)
  }

  private def sqlOfWinSetGrp(q: QWinSetGrp): String = {
    val v = if (q.useCount) "count(*)" else s"max(${q.projCol} % ${q.pmod})"
    val setSql = q.op match {
      case "union_all" => "UNION ALL"
      case "intersect" => "INTERSECT"
      case _           => "EXCEPT"
    }
    def arm(lo: Long) =
      s"""SELECT CAST(${q.grpCol} AS BIGINT) AS g, CAST($v AS BIGINT) AS v
         |  FROM ${q.table} WHERE ${q.keyCol} >= $lo GROUP BY ${q.grpCol}""".stripMargin
    s"""WITH u AS (
       |${arm(q.lo1)}
       |$setSql
       |${arm(q.lo2)})
       |SELECT g, v, CAST(sum(v) OVER (ORDER BY g ASC, v ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |FROM u
       |ORDER BY g ASC, v ASC, cum ASC""".stripMargin
  }

  // v9 family 2 — CORRELATED SCALAR AGAINST A WINDOWED DERIVED TABLE
  // (three-deep: window → correlated scalar → group-aggregate; the corr
  // family correlates against RAW rows only). Rows are ranked within
  // their group (rank(), tie-stable over a non-unique key, so r is
  // deterministic), each row keeps iff r·half ≤ the correlated
  // per-group max rank — "the top 1/half of every group by rank" — and
  // the survivors re-aggregate. The Spark rendering computes the
  // correlated scalar as a grouped join (the avghav discipline: the
  // PLAN-shape divergence is the differential point); the SQL is a
  // genuine correlated subquery over the windowed CTE.
  private final case class QCorrWin(
      table: String, grpCol: String, keyCol: String, lo: Long,
      dense: Boolean, half: Long)

  private def genCorrWin(seed: Int): QCorrWin = {
    val rnd = new scala.util.Random(seed)
    val table = tables.keys.toSeq.sorted.apply(rnd.nextInt(tables.size))
    val cols = tables(table)
    val keyCol = cols.maxBy(ranges)
    val lo = ranges(keyCol) / 4 + rnd.nextInt((ranges(keyCol) / 4).toInt max 1)
    val grpCol = cols.filterNot(_ == keyCol).minBy(ranges)
    QCorrWin(table, grpCol, keyCol, lo, rnd.nextBoolean(), 2L + rnd.nextInt(2))
  }

  private def sparkOfCorrWin(q: QCorrWin)(
      s: SparkSession, dir: String): DataFrame = {
    val wspec = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("k").asc)
    val rfn = if (q.dense) dense_rank() else rank()
    val ranked = Queries.rd(s, dir, q.table)
      .filter(col(q.keyCol) >= q.lo)
      .select(col(q.grpCol).cast("long").as("g"),
        col(q.keyCol).cast("long").as("k"))
      .withColumn("r", rfn.over(wspec).cast("long"))
    val mx = ranked.groupBy("g").agg(max(col("r")).as("__mr"))
    ranked.join(mx, Seq("g"))
      .filter(col("r") * q.half <= col("__mr"))
      .groupBy("g")
      .agg(count(lit(1)).cast("long").as("n"),
        max(col("r")).cast("long").as("top_r"))
      .orderBy(col("g").asc)
  }

  private def sqlOfCorrWin(q: QCorrWin): String = {
    val rfn = if (q.dense) "dense_rank()" else "rank()"
    s"""WITH w AS (
       |  SELECT CAST(${q.grpCol} AS BIGINT) AS g,
       |    CAST($rfn OVER (PARTITION BY ${q.grpCol}
       |      ORDER BY ${q.keyCol} ASC) AS BIGINT) AS r
       |  FROM ${q.table} WHERE ${q.keyCol} >= ${q.lo})
       |SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(max(r) AS BIGINT) AS top_r
       |FROM w x
       |WHERE x.r * ${q.half} <= (SELECT max(r) FROM w w2 WHERE w2.g = x.g)
       |GROUP BY g
       |ORDER BY g ASC""".stripMargin
  }

  // v4, seed-scanned: the five sub seeds draw all five subquery kinds
  // (scalar, not_exists, not_in, in, exists) across both group keys;
  // the four roll seeds draw both ops over all three tables
  private val subSeeds = Seq(5000, 5002, 5004, 5006, 5014)
  private val rollSeeds = Seq(6000, 6006, 6012, 6014)
  // v5, seed-scanned: all five legal (aggFn, cmp) shapes across all
  // three correlation keys (avg>/avg<=/min>/min<=/max<=)
  private val corrSeeds = Seq(7001, 7002, 7003, 7006, 7007)
  // v6, seed-scanned: winjoin covers both fns × all three partition
  // cols; setgrp covers both value shapes and ≥4 of the 6 ops across
  // ≥2 tables — all probed non-empty at the three SFs by `main`
  private val winJoinSeeds = Seq(8000, 8001, 8002, 8004)
  private val setGrpSeeds = Seq(9000, 9001, 9002, 9003, 9006)
  // v7, seed-scanned: aggjoin covers both table pairs (parity-forced),
  // all three agg fns, and all three cmp arms (>= / < / none — the <
  // arms came from the 10009+ scan, the low block drew none); rankgrp
  // covers all three tables and both value shapes — all probed
  // non-empty at the three SFs by `main`
  private val aggJoinSeeds = Seq(10001, 10002, 10004, 10007, 10011, 10012)
  private val rankGrpSeeds = Seq(11000, 11001, 11002, 11003)
  // v8, seed-scanned (below): avghaving covers all three tables, both
  // value shapes, and BOTH comparison arms (>= mean / < mean); cumgrp
  // covers all three tables and both value shapes — all probed
  // non-empty at the three SFs by `main`
  private val avgHavingSeeds = Seq(12000, 12001, 12002, 12003, 12006)
  private val cumGrpSeeds = Seq(13000, 13001, 13002, 13006, 13010)
  // v9, seed-scanned (main's probe): winsetgrp covers all three set ops,
  // all three tables, and both value shapes; corrwin covers all three
  // tables, both rank fns, and both halving factors — all probed
  // non-empty at the three SFs
  private val winSetGrpSeeds = Seq(14000, 14001, 14007, 14008, 14011, 14012)
  private val corrWinSeeds = Seq(15000, 15002, 15003, 15004, 15009, 15011)

  // --- V10 grammar (r14 verdict #7): the three dimensions the grammar
  // never drew — RANGE frames (every windowed family used ROWS or the
  // default), NULLS FIRST/LAST in window ORDER BY (nullable TIED order
  // keys, where RANGE's peer-group semantics and the null block's
  // placement both genuinely differ from ROWS/defaults), and EXISTS as
  // a HAVING predicate (Spark plans the grouped semi/anti join, DuckDB
  // decorrelates a HAVING-level subquery — two different planner paths).

  /** Family 1 — RANGE-framed running sum over a nullable, deliberately
    * TIED order expression. `peers` draws RANGE UNBOUNDED PRECEDING →
    * CURRENT ROW (the frame ends at the current PEER GROUP — on a tied
    * key every peer shares the sum, which ROWS would split) with all
    * four asc/desc × NULLS FIRST/LAST combinations over a NULLIF-made
    * nullable key; `offset` draws a value RANGE (k PRECEDING → CURRENT
    * ROW) over the non-null tied key, ASC (the variant where the frame
    * bound is arithmetic on the ORDER value, not a row count). The sum
    * is per-PEER-GROUP deterministic, so hashing is safe; the final
    * ORDER BY is the table's unique key. */
  private final case class QRangeWin(
      table: String, part: String, ordCol: String, mod: Long,
      variant: String, desc: Boolean, nullsFirst: Boolean, k: Long,
      valCol: String, wide: Cmp)

  private def genRangeWin(seed: Int): QRangeWin = {
    val rnd = new scala.util.Random(seed)
    val table = tables.keys.toSeq.sorted.apply(rnd.nextInt(tables.size))
    val cols = tables(table)
    val part = partitionCols(table)(rnd.nextInt(partitionCols(table).size))
    val rest = cols.filterNot(_ == part)
    val ordCol = rest(rnd.nextInt(rest.size))
    val valCands = rest.filterNot(_ == ordCol)
    val valCol = if (valCands.isEmpty) ordCol
      else valCands(rnd.nextInt(valCands.size))
    // seed parity for the same first-boolean reason as genHavingExists
    val variant = if (seed % 2 == 0) "peers" else "offset"
    QRangeWin(table, part, ordCol, 3L + rnd.nextInt(3), variant,
      desc = variant == "peers" && rnd.nextBoolean(),
      nullsFirst = rnd.nextBoolean(), k = 1L + rnd.nextInt(2),
      valCol, wideArm(rnd, cols) match { case c: Cmp => c })
  }

  private def sparkOfRangeWin(q: QRangeWin)(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = uniqueKey(q.table)
    val oRaw = (col(q.ordCol) % q.mod).cast("long")
    val o =
      if (q.variant == "peers")
        when(oRaw === 0, lit(null).cast("long")).otherwise(oRaw)
      else oRaw
    val base = Queries.rd(s, dir, q.table)
      .filter(col(q.wide.c) >= q.wide.lit)
      .select((Seq(col(q.part).cast("long").as("p")) ++
        keys.zipWithIndex.map { case (c, i) => col(c).cast("long").as(s"k$i") } ++
        Seq(o.as("o"), col(q.valCol).cast("long").as("v"))): _*)
    val sort = (q.desc, q.nullsFirst) match {
      case (false, false) => col("o").asc_nulls_last
      case (false, true)  => col("o").asc_nulls_first
      case (true, false)  => col("o").desc_nulls_last
      case (true, true)   => col("o").desc_nulls_first
    }
    val w0 = Window.partitionBy(col("p")).orderBy(sort)
    val w =
      if (q.variant == "peers")
        w0.rangeBetween(Window.unboundedPreceding, Window.currentRow)
      else w0.rangeBetween(-q.k, 0)
    base.withColumn("rs", sum(col("v")).over(w).cast("long"))
      .drop("v")
      .orderBy((col("p").asc +: keys.indices.map(i => col(s"k$i").asc)): _*)
  }

  private def sqlOfRangeWin(q: QRangeWin): String = {
    val keys = uniqueKey(q.table)
    val kSel = keys.zipWithIndex
      .map { case (c, i) => s"CAST($c AS BIGINT) AS k$i" }.mkString(", ")
    val oSql =
      if (q.variant == "peers") s"NULLIF(${q.ordCol} % ${q.mod}, 0)"
      else s"${q.ordCol} % ${q.mod}"
    val dir = if (q.desc) "DESC" else "ASC"
    val nf = if (q.nullsFirst) "NULLS FIRST" else "NULLS LAST"
    val frame =
      if (q.variant == "peers") "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
      else s"RANGE BETWEEN ${q.k} PRECEDING AND CURRENT ROW"
    val kOrd = keys.indices.map(i => s"k$i ASC").mkString(", ")
    s"""SELECT p, ${keys.indices.map(i => s"k$i").mkString(", ")}, o,
       |  CAST(SUM(v) OVER (PARTITION BY p ORDER BY o $dir $nf $frame) AS BIGINT) AS rs
       |FROM (
       |  SELECT CAST(${q.part} AS BIGINT) AS p, $kSel,
       |         CAST($oSql AS BIGINT) AS o, CAST(${q.valCol} AS BIGINT) AS v
       |  FROM ${q.table} WHERE ${q.wide.c} >= ${q.wide.lit}
       |) sub
       |ORDER BY p ASC, $kOrd""".stripMargin
  }

  /** Family 2 — EXISTS / NOT EXISTS under HAVING, correlated on the
    * GROUP BY key: Spark expresses it as a grouped left-semi/anti join,
    * DuckDB decorrelates the textual HAVING subquery. Satisfiability:
    * both inner predicates split a dense key range (nationkeys 0..24
    * against bounds ≤ 20; custkeys ≥ 140 against bounds ≤ 69), so both
    * polarities stay non-empty at every SF. */
  private final case class QHavingExists(
      outer: String, g: String, innerTable: String, innerKey: String,
      innerCol: String, bound: Long, negated: Boolean,
      aggCol: String, h: Long, wide: Cmp)

  private def genHavingExists(seed: Int): QHavingExists = {
    val rnd = new scala.util.Random(seed)
    // seed parity, not rnd.nextBoolean(): java.util.Random's FIRST
    // boolean is near-constant across sequential seeds (the LCG needs a
    // few steps to decorrelate), which silently collapses the outer-
    // shape dimension — measured: 20/20 sequential seeds drew lineitem
    val fromOrders = seed % 2 == 0
    val negated = (seed / 2) % 2 == 1 // seed bits for the same reason
    val h = 1L + rnd.nextInt(3)
    if (fromOrders)
      QHavingExists("orders", "o_custkey", "customer", "c_custkey",
        "c_nationkey", 5L + rnd.nextInt(16), negated, "o_orderkey", h,
        wideArm(rnd, tables("orders")) match { case c: Cmp => c })
    else
      QHavingExists("lineitem", "l_orderkey", "orders", "o_orderkey",
        "o_custkey", 20L + rnd.nextInt(50), negated, "l_quantity", h,
        wideArm(rnd, tables("lineitem")) match { case c: Cmp => c })
  }

  private def sparkOfHavingExists(q: QHavingExists)(s: SparkSession, dir: String): DataFrame = {
    val inner = Queries.rd(s, dir, q.innerTable)
      .filter(col(q.innerCol) >= q.bound)
      .select(col(q.innerKey).as(q.g))
    Queries.rd(s, dir, q.outer)
      .filter(col(q.wide.c) >= q.wide.lit)
      .groupBy(col(q.g))
      .agg(count(lit(1)).as("n"), sum(col(q.aggCol)).cast("long").as("a0"))
      .filter(col("n") >= q.h)
      .join(inner, Seq(q.g), if (q.negated) "left_anti" else "left_semi")
      .select(col(q.g).cast("long").as("g"), col("n"), col("a0"))
      .orderBy(col("g").asc)
  }

  private def sqlOfHavingExists(q: QHavingExists): String = {
    val not = if (q.negated) "NOT " else ""
    s"""SELECT CAST(${q.g} AS BIGINT) AS g, CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(${q.aggCol}) AS BIGINT) AS a0
       |FROM ${q.outer}
       |WHERE ${q.wide.c} >= ${q.wide.lit}
       |GROUP BY ${q.g}
       |HAVING count(*) >= ${q.h} AND ${not}EXISTS (
       |  SELECT 1 FROM ${q.innerTable}
       |  WHERE ${q.innerKey} = ${q.g} AND ${q.innerCol} >= ${q.bound})
       |ORDER BY g ASC""".stripMargin
  }

  // --- V11 grammar: ordered-set aggregates + windows over null-extended
  // rows (r15 verdict #4) --------------------------------------------

  /** Family 1 — percentile_cont / percentile_disc WITHIN GROUP: a
    * genuine cross-engine hazard the suite never probed — the engines
    * implement the SQL:2016 ordered-set aggregates independently
    * (interpolation arithmetic for cont, the cume_dist>=p pick for
    * disc). Hash-safety by construction: p is drawn from quarters
    * {0.25, 0.5, 0.75} over INTEGER values, so the cont interpolation
    * `a + frac(p·(n-1))·(b-a)` is an exact multiple of 0.25 in ieee754
    * and `pc*4` casts to BIGINT losslessly in both engines. */
  private final case class QPct(table: String, g: String, mod: Long,
      v: String, vmod: Long, p: Double, disc: Boolean, wide: Cmp)

  private def genPct(seed: Int): QPct = {
    val rnd = new scala.util.Random(seed)
    // table/p/disc from seed BITS (java.util.Random's first draws are
    // near-constant across sequential seeds — the frozen-seed lesson)
    val table = Seq("lineitem", "orders", "customer")(seed % 3)
    val cols = tables(table)
    val p = Seq(0.25, 0.5, 0.75)((seed / 3) % 3)
    val disc = (seed / 9) % 2 == 1
    val g = cols(rnd.nextInt(cols.size))
    val v = cols(rnd.nextInt(cols.size))
    QPct(table, g, 4L + rnd.nextInt(6), v, 11L + rnd.nextInt(89), p, disc,
      wideArm(rnd, cols) match { case c: Cmp => c })
  }

  private def sparkOfPct(q: QPct)(s: SparkSession, dir: String): DataFrame = {
    val fn = if (q.disc) "percentile_disc" else "percentile_cont"
    Queries.rd(s, dir, q.table)
      .filter(col(q.wide.c) >= q.wide.lit)
      .select((col(q.g) % q.mod).cast("long").as("g"),
        (col(q.v) % q.vmod).cast("long").as("v"))
      .groupBy("g")
      .agg(expr(s"$fn(${q.p}) WITHIN GROUP (ORDER BY v)").as("pc"),
        count(lit(1)).as("n"))
      .select(col("g"), (col("pc") * 4).cast("long").as("pc4"), col("n"))
      .orderBy(col("g").asc)
  }

  private def sqlOfPct(q: QPct): String = {
    val fn = if (q.disc) "percentile_disc" else "percentile_cont"
    s"""SELECT CAST(g AS BIGINT) AS g,
       |  CAST($fn(${q.p}) WITHIN GROUP (ORDER BY v) * 4 AS BIGINT) AS pc4,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM (
       |  SELECT ${q.g} % ${q.mod} AS g, ${q.v} % ${q.vmod} AS v
       |  FROM ${q.table} WHERE ${q.wide.c} >= ${q.wide.lit}
       |) sub
       |GROUP BY g
       |ORDER BY g ASC""".stripMargin
  }

  /** Family 2 — window functions over LEFT-JOIN null-extended rows: the
    * v2 louter family pinned null-extension under aggregates; this runs
    * RANK / running SUM over the null-extended frame, where the engines'
    * DEFAULT null placement differs (Spark: NULLS FIRST asc; DuckDB:
    * NULLS LAST) — placement is drawn explicitly, both combos.
    * Satisfiability: the inner side keeps only high-quantity lineitems
    * (bound 40..47 keeps ~20%, so ~35% of orders lose ALL items and
    * null-extend — verified non-empty in both match states at sf0.001
    * by the probe), while the outer keeps every order the wide arm
    * admits. Determinism: the synthetic lineitem DUPLICATES
    * (l_orderkey, l_linenumber) keys, so the output order is made total
    * over ALL projected columns — rows tied on every projected column
    * are interchangeable between engines (the cum-sum then assigns the
    * same multiset of prefix sums to identical rows), and rank is
    * tie-stable by definition. */
  private final case class QLjWin(m: Long, jCol: String, jMod: Long,
      desc: Boolean, nullsFirst: Boolean, cum: Boolean, bound: Long,
      wide: Cmp)

  private def genLjWin(seed: Int): QLjWin = {
    val rnd = new scala.util.Random(seed)
    // shape bits from the seed, not the generator's first draws
    val cum = seed % 2 == 1
    val desc = (seed / 2) % 2 == 1
    val nullsFirst = (seed / 4) % 2 == 1
    val jCands = Seq("l_partkey", "l_suppkey", "l_quantity")
    QLjWin(3L + rnd.nextInt(5), jCands(rnd.nextInt(jCands.size)),
      5L + rnd.nextInt(14), desc, nullsFirst, cum,
      40L + rnd.nextInt(8),
      wideArm(rnd, tables("orders")) match { case c: Cmp => c })
  }

  private def sparkOfLjWin(q: QLjWin)(s: SparkSession, dir: String): DataFrame = {
    val o = Queries.rd(s, dir, "orders")
      .filter(col(q.wide.c) >= q.wide.lit)
      .select(col("o_orderkey").cast("long").as("k0"),
        (col("o_custkey") % q.m).cast("long").as("p"))
    val l = Queries.rd(s, dir, "lineitem")
      .filter(col("l_quantity") >= q.bound)
      .select(col("l_orderkey").cast("long").as("k0"),
        col("l_linenumber").cast("long").as("k1"),
        (col(q.jCol) % q.jMod).cast("long").as("j"))
    val joined = o.join(l, Seq("k0"), "left")
    val jSort = (q.desc, q.nullsFirst) match {
      case (false, false) => col("j").asc_nulls_last
      case (false, true)  => col("j").asc_nulls_first
      case (true, false)  => col("j").desc_nulls_last
      case (true, true)   => col("j").desc_nulls_first
    }
    val win = org.apache.spark.sql.expressions.Window
    val metric =
      if (q.cum)
        sum(col("j")).over(win.partitionBy(col("p"))
          .orderBy(jSort, col("k0").asc, col("k1").asc_nulls_first)
          .rowsBetween(win.unboundedPreceding, win.currentRow))
      else rank().over(win.partitionBy(col("p")).orderBy(jSort))
    joined.withColumn("mt", metric.cast("long"))
      .select("p", "k0", "k1", "j", "mt")
      // TOTAL output order over every projected column: the synthetic
      // lineitem carries duplicate (l_orderkey, l_linenumber) keys, so
      // (p, k0, k1) alone leaves engine-dependent tie order — rows tied
      // on ALL five columns are interchangeable, so this compares equal
      .orderBy(col("p").asc, col("k0").asc, col("k1").asc_nulls_first,
        col("j").asc_nulls_first, col("mt").asc_nulls_first)
  }

  private def sqlOfLjWin(q: QLjWin): String = {
    val dir = if (q.desc) "DESC" else "ASC"
    val nf = if (q.nullsFirst) "NULLS FIRST" else "NULLS LAST"
    val metric =
      if (q.cum)
        s"""SUM(j) OVER (PARTITION BY p ORDER BY j $dir $nf,
           |    k0 ASC, k1 ASC NULLS FIRST
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin
      else s"RANK() OVER (PARTITION BY p ORDER BY j $dir $nf)"
    s"""SELECT p, k0, k1, j, CAST($metric AS BIGINT) AS mt
       |FROM (
       |  SELECT CAST(o.o_custkey % ${q.m} AS BIGINT) AS p,
       |         CAST(o.o_orderkey AS BIGINT) AS k0,
       |         CAST(l.l_linenumber AS BIGINT) AS k1,
       |         CAST(l.${q.jCol} % ${q.jMod} AS BIGINT) AS j
       |  FROM orders o
       |  LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= ${q.bound}) l
       |    ON o.o_orderkey = l.l_orderkey
       |  WHERE o.${q.wide.c} >= ${q.wide.lit}
       |) sub
       |ORDER BY p ASC, k0 ASC, k1 ASC NULLS FIRST,
       |  j ASC NULLS FIRST, mt ASC NULLS FIRST""".stripMargin
  }

  // ==== v12 (r17, r16 verdict #4): three dimensions the suite never
  // drew — aggregate FILTER clauses (engines implement the SQL:2003
  // clause independently; interaction with GROUP BY / HAVING untested),
  // UNNEST/explode differentials (DuckDB's select-list unnest vs
  // Spark's generator explode — NULL-array and empty-array rows must
  // vanish identically), and DISTINCT crossed with windows / set-op
  // arms (row-DISTINCT over window outputs; DISTINCT aggregates over a
  // UNION ALL arm). ====

  /** Family 1 — aggregate FILTER (WHERE …): cf counts a parity slice,
    * sf sums a threshold slice (NULL over an empty slice in BOTH
    * engines — the empty-filter contract rides every group), n anchors
    * the unfiltered count; the HAVING variant filters ON the filtered
    * aggregate, the interaction the verdict named. Integer-exact by
    * construction (count/sum over modular longs). */
  private final case class QFilt(table: String, g: String, mod: Long,
      v: String, vmod: Long, thr: Long, having: Boolean, wide: Cmp)

  private def genFilt(seed: Int): QFilt = {
    val rnd = new scala.util.Random(seed)
    val table = Seq("lineitem", "orders", "customer")(seed % 3)
    val having = (seed / 3) % 2 == 1
    val cols = tables(table)
    QFilt(table, cols(rnd.nextInt(cols.size)), 4L + rnd.nextInt(6),
      cols(rnd.nextInt(cols.size)), 11L + rnd.nextInt(60),
      2L + rnd.nextInt(8), having,
      wideArm(rnd, cols) match { case c: Cmp => c })
  }

  private def sparkOfFilt(q: QFilt)(s: SparkSession, dir: String): DataFrame = {
    val base = Queries.rd(s, dir, q.table)
      .filter(col(q.wide.c) >= q.wide.lit)
      .select((col(q.g) % q.mod).cast("long").as("g"),
        (col(q.v) % q.vmod).cast("long").as("v"))
      .groupBy("g")
      .agg(expr("count(*) FILTER (WHERE v % 2 = 0)").cast("long").as("cf"),
        expr(s"sum(v) FILTER (WHERE v >= ${q.thr})").cast("long").as("sf"),
        count(lit(1)).as("n"))
    (if (q.having) base.filter(col("cf") >= 1) else base)
      .orderBy(col("g").asc)
  }

  private def sqlOfFilt(q: QFilt): String = {
    val having =
      if (q.having) "\nHAVING count(*) FILTER (WHERE v % 2 = 0) >= 1" else ""
    s"""SELECT CAST(g AS BIGINT) AS g,
       |  CAST(count(*) FILTER (WHERE v % 2 = 0) AS BIGINT) AS cf,
       |  CAST(sum(v) FILTER (WHERE v >= ${q.thr}) AS BIGINT) AS sf,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM (
       |  SELECT ${q.g} % ${q.mod} AS g, ${q.v} % ${q.vmod} AS v
       |  FROM ${q.table} WHERE ${q.wide.c} >= ${q.wide.lit}
       |) sub
       |GROUP BY g$having
       |ORDER BY g ASC""".stripMargin
  }

  /** Family 2 — UNNEST vs explode: a per-row CASE builds a NULL array,
    * an EMPTY array, or a 2/3-element array whose values encode their
    * position (e·10 + i) — ordinality tested without WITH ORDINALITY
    * syntax (DuckDB lacks it). NULL and empty arrays must contribute
    * ZERO rows in both engines (explode and select-list unnest agree);
    * output totally ordered over (k, u). */
  private final case class QUnnest(table: String, k: String, mod: Long,
      b: String, e: String, emod: Long, three: Boolean, wide: Cmp)

  private def genUnnest(seed: Int): QUnnest = {
    val rnd = new scala.util.Random(seed)
    val table = Seq("lineitem", "orders", "customer")(seed % 3)
    val three = (seed / 3) % 2 == 1
    val cols = tables(table)
    QUnnest(table, cols(rnd.nextInt(cols.size)), 4L + rnd.nextInt(6),
      cols(rnd.nextInt(cols.size)), cols(rnd.nextInt(cols.size)),
      7L + rnd.nextInt(30), three,
      wideArm(rnd, cols) match { case c: Cmp => c })
  }

  private def sparkOfUnnest(q: QUnnest)(s: SparkSession, dir: String): DataFrame = {
    val n = if (q.three) 3 else 2
    Queries.rd(s, dir, q.table)
      .filter(col(q.wide.c) >= q.wide.lit)
      .select((col(q.k) % q.mod).cast("long").as("k"),
        (col(q.b) % 7).cast("long").as("b"),
        (col(q.e) % q.emod).cast("long").as("e"))
      .withColumn("arr",
        when(col("b") === 0, lit(null).cast("array<long>"))
          .when(col("b") === 1, array().cast("array<long>"))
          .otherwise(array((1 to n).map(i => col("e") * 10 + i): _*)))
      .select(col("k"), explode(col("arr")).as("u"))
      .orderBy(col("k").asc, col("u").asc)
  }

  private def sqlOfUnnest(q: QUnnest): String = {
    val n = if (q.three) 3 else 2
    val elems = (1 to n).map(i => s"e * 10 + $i").mkString("[", ", ", "]")
    s"""SELECT CAST(k AS BIGINT) AS k, CAST(u AS BIGINT) AS u
       |FROM (
       |  SELECT k, unnest(arr) AS u
       |  FROM (
       |    SELECT k,
       |      CASE WHEN b = 0 THEN CAST(NULL AS BIGINT[])
       |           WHEN b = 1 THEN CAST([] AS BIGINT[])
       |           ELSE $elems END AS arr
       |    FROM (
       |      SELECT ${q.k} % ${q.mod} AS k, ${q.b} % 7 AS b,
       |             ${q.e} % ${q.emod} AS e
       |      FROM ${q.table} WHERE ${q.wide.c} >= ${q.wide.lit}
       |    ) raw
       |  ) sub
       |) x
       |ORDER BY k ASC, u ASC""".stripMargin
  }

  /** Family 3 — DISTINCT crossed with windows and set-op arms. Even
    * seeds: row-DISTINCT over a window output (rank per value / total
    * per partition — collapses tied frames identically in both
    * engines; Spark rejects DISTINCT aggregates INSIDE a window frame,
    * so the row-DISTINCT form is the cross both support). Odd seeds:
    * COUNT(DISTINCT)/SUM(DISTINCT) over a two-table UNION ALL arm — the
    * dedup must happen AFTER the arms merge. */
  private final case class QWinDist(tableA: String, tableB: String,
      g: String, g2: String, mod: Long, v: String, v2: String, vmod: Long,
      rankVar: Boolean, union: Boolean, wide: Cmp, wide2: Cmp)

  private def genWinDist(seed: Int): QWinDist = {
    val rnd = new scala.util.Random(seed)
    val union = seed % 2 == 1
    val rankVar = (seed / 2) % 2 == 1
    val tableA = Seq("lineitem", "orders", "customer")((seed / 4) % 3)
    val tableB = Seq("orders", "customer", "lineitem")((seed / 4) % 3)
    val ca = tables(tableA); val cb = tables(tableB)
    QWinDist(tableA, tableB, ca(rnd.nextInt(ca.size)), cb(rnd.nextInt(cb.size)),
      3L + rnd.nextInt(5), ca(rnd.nextInt(ca.size)), cb(rnd.nextInt(cb.size)),
      9L + rnd.nextInt(40), rankVar, union,
      wideArm(rnd, ca) match { case c: Cmp => c },
      wideArm(rnd, cb) match { case c: Cmp => c })
  }

  private def sparkOfWinDist(q: QWinDist)(s: SparkSession, dir: String): DataFrame = {
    val baseA = Queries.rd(s, dir, q.tableA)
      .filter(col(q.wide.c) >= q.wide.lit)
      .select((col(q.g) % q.mod).cast("long").as("p"),
        (col(q.v) % q.vmod).cast("long").as("v"))
    if (q.union) {
      val baseB = Queries.rd(s, dir, q.tableB)
        .filter(col(q.wide2.c) >= q.wide2.lit)
        .select((col(q.g2) % q.mod).cast("long").as("p"),
          (col(q.v2) % q.vmod).cast("long").as("v"))
      baseA.unionByName(baseB)
        .groupBy(col("p").as("g"))
        .agg(countDistinct(col("v")).cast("long").as("cd"),
          sum_distinct(col("v")).cast("long").as("sd"))
        .orderBy(col("g").asc)
    } else {
      val win = org.apache.spark.sql.expressions.Window.partitionBy(col("p"))
      val mt =
        if (q.rankVar) rank().over(win.orderBy(col("v").asc))
        else sum(col("v")).over(win)
      baseA.withColumn("mt", mt.cast("long"))
        .select("p", "mt").distinct()
        .orderBy(col("p").asc, col("mt").asc)
    }
  }

  private def sqlOfWinDist(q: QWinDist): String =
    if (q.union)
      s"""SELECT CAST(p AS BIGINT) AS g,
         |  CAST(COUNT(DISTINCT v) AS BIGINT) AS cd,
         |  CAST(SUM(DISTINCT v) AS BIGINT) AS sd
         |FROM (
         |  SELECT ${q.g} % ${q.mod} AS p, ${q.v} % ${q.vmod} AS v
         |  FROM ${q.tableA} WHERE ${q.wide.c} >= ${q.wide.lit}
         |  UNION ALL
         |  SELECT ${q.g2} % ${q.mod} AS p, ${q.v2} % ${q.vmod} AS v
         |  FROM ${q.tableB} WHERE ${q.wide2.c} >= ${q.wide2.lit}
         |) u
         |GROUP BY p
         |ORDER BY g ASC""".stripMargin
    else {
      val metric =
        if (q.rankVar) "RANK() OVER (PARTITION BY p ORDER BY v ASC)"
        else "SUM(v) OVER (PARTITION BY p)"
      s"""SELECT DISTINCT CAST(p AS BIGINT) AS p,
         |  CAST($metric AS BIGINT) AS mt
         |FROM (
         |  SELECT ${q.g} % ${q.mod} AS p, ${q.v} % ${q.vmod} AS v
         |  FROM ${q.tableA} WHERE ${q.wide.c} >= ${q.wide.lit}
         |) sub
         |ORDER BY p ASC, mt ASC""".stripMargin
    }

  // v12, seed-scanned (main's probe): filt covers 3 tables × both
  // HAVING states; unnest covers 3 tables × 2/3-element arrays; windist
  // covers distinct-over-window (rank + partition-sum) and
  // distinct-agg-over-union shapes
  private val filtSeeds = Seq(20000, 20001, 20002, 20003)
  private val unnestSeeds = Seq(21000, 21001, 21002, 21003)
  private val winDistSeeds = Seq(22000, 22001, 22002, 22003)

  // ---------- v13 (r17 verdict #4): CTE reuse, VALUES derived
  // tables, GROUPING() over ROLLUP/CUBE — the three dimensions
  // engines plan independently: Spark reuses (or re-evaluates) a
  // twice-referenced subplan where DuckDB materializes the CTE;
  // literal-table type coercion differs per engine; and subtotal
  // disambiguation via GROUPING() is the shape the roll seeds
  // deliberately avoided with mod-reduced non-null keys ----------

  /** Family 1 — a WITH-clause CTE referenced TWICE. Even seeds: the
    * CTE joined against its own max-aggregate (keep groups at >= half
    * the max) — Spark sees one aggregate subtree under two parents
    * (exchange/subplan reuse); DuckDB materializes. Odd seeds: the CTE
    * self-joined on adjacent keys (g vs g+1) comparing sums. */
  private final case class QCte(table: String, k: String, mod: Long,
      v: String, vmod: Long, selfJoin: Boolean, wide: Cmp)

  private def genCte(seed: Int): QCte = {
    val rnd = new scala.util.Random(seed)
    val table = Seq("lineitem", "orders", "customer")(seed % 3)
    val cols = tables(table)
    QCte(table, cols(rnd.nextInt(cols.size)), 5L + rnd.nextInt(8),
      cols(rnd.nextInt(cols.size)), 17L + rnd.nextInt(40),
      seed % 2 == 1, wideArm(rnd, cols) match { case c: Cmp => c })
  }

  private def sparkOfCte(q: QCte)(s: SparkSession, dir: String): DataFrame = {
    // ONE DataFrame value referenced twice — the idiomatic Spark twin
    // of the CTE: the same logical subtree under two parents, letting
    // Catalyst reuse the exchange instead of rescanning
    val agg = Queries.rd(s, dir, q.table)
      .filter(col(q.wide.c) >= q.wide.lit)
      .select((col(q.k) % q.mod).cast("long").as("g"),
        (col(q.v) % q.vmod).cast("long").as("v"))
      .groupBy("g")
      .agg(sum("v").cast("long").as("s"), count(lit(1)).as("n"))
    if (q.selfJoin)
      agg.as("a").join(agg.as("b"),
          col("a.g") === col("b.g") + 1L)
        .select(col("a.g").as("g"), col("a.s").as("s"),
          col("b.s").as("prev_s"),
          (col("a.s") - col("b.s")).cast("long").as("delta"))
        .orderBy(col("g").asc)
    else
      agg.crossJoin(agg.agg(max("s").cast("long").as("smax")))
        .filter(col("s") * 2 >= col("smax"))
        .select(col("g"), col("s"), col("n"), col("smax"))
        .orderBy(col("g").asc)
  }

  private def sqlOfCte(q: QCte): String = {
    val cte =
      s"""WITH agg AS (
         |  SELECT ${q.k} % ${q.mod} AS g,
         |    CAST(sum(${q.v} % ${q.vmod}) AS BIGINT) AS s,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM ${q.table} WHERE ${q.wide.c} >= ${q.wide.lit}
         |  GROUP BY 1
         |)""".stripMargin
    if (q.selfJoin)
      s"""$cte
         |SELECT CAST(a.g AS BIGINT) AS g, a.s AS s, b.s AS prev_s,
         |  CAST(a.s - b.s AS BIGINT) AS delta
         |FROM agg a JOIN agg b ON a.g = b.g + 1
         |ORDER BY g ASC""".stripMargin
    else
      s"""$cte
         |SELECT CAST(g AS BIGINT) AS g, s, n, m.smax AS smax
         |FROM agg CROSS JOIN (SELECT CAST(max(s) AS BIGINT) AS smax FROM agg) m
         |WHERE s * 2 >= m.smax
         |ORDER BY g ASC""".stripMargin
  }

  /** Family 2 — a VALUES literal table joined (non-equi, banded)
    * against the corpus: literal-table type coercion and the
    * broadcastable tiny-side nested-loop join. The VALUES rows define
    * value bands; each corpus row lands in at most one band. */
  private final case class QVals(table: String, k: String, v: String,
      vmod: Long, base: Long, width: Long, nBands: Int, wide: Cmp)

  private def genVals(seed: Int): QVals = {
    val rnd = new scala.util.Random(seed)
    val table = Seq("lineitem", "orders", "customer")(seed % 3)
    val cols = tables(table)
    QVals(table, cols(rnd.nextInt(cols.size)), cols(rnd.nextInt(cols.size)),
      40L + rnd.nextInt(30), rnd.nextInt(4).toLong, 3L + rnd.nextInt(5),
      3 + (seed % 2), wideArm(rnd, cols) match { case c: Cmp => c })
  }

  private def bandsOf(q: QVals): Seq[(Long, Long)] =
    (0 until q.nBands).map(i => (i.toLong, q.base + i * q.width))

  private def sparkOfVals(q: QVals)(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = bandsOf(q).toDF("tag", "thr") // tiny local relation
    Queries.rd(s, dir, q.table)
      .filter(col(q.wide.c) >= q.wide.lit)
      .select((col(q.v) % q.vmod).cast("long").as("v"))
      .join(broadcast(bands),
        col("v") >= col("thr") && col("v") < col("thr") + q.width)
      .groupBy("tag")
      .agg(count(lit(1)).as("n"), sum("v").cast("long").as("s"))
      .select(col("tag").cast("long").as("tag"), col("n"), col("s"))
      .orderBy(col("tag").asc)
  }

  private def sqlOfVals(q: QVals): String = {
    val rows = bandsOf(q).map { case (t, thr) => s"($t, $thr)" }.mkString(", ")
    s"""SELECT CAST(bands.tag AS BIGINT) AS tag,
       |  CAST(count(*) AS BIGINT) AS n, CAST(sum(x.v) AS BIGINT) AS s
       |FROM (VALUES $rows) AS bands(tag, thr)
       |JOIN (
       |  SELECT ${q.v} % ${q.vmod} AS v
       |  FROM ${q.table} WHERE ${q.wide.c} >= ${q.wide.lit}
       |) x ON x.v >= bands.thr AND x.v < bands.thr + ${q.width}
       |GROUP BY bands.tag
       |ORDER BY tag ASC""".stripMargin
  }

  /** Family 3 — GROUPING() projected over ROLLUP/CUBE: subtotal rows
    * are disambiguated by the grouping flags, with NULL subtotal keys
    * CASE-mapped to -1 so the ordered compare never hits engine NULL
    * ordering. `gid` is computed as GROUPING(a)*2 + GROUPING(b) in
    * BOTH engines — deliberately NOT the engines' own GROUPING_ID()
    * whose bit order is implementation-defined. */
  private final case class QGrp(table: String, a: String, amod: Long,
      b: String, bmod: Long, v: String, vmod: Long, cube: Boolean,
      wide: Cmp)

  private def genGrp(seed: Int): QGrp = {
    val rnd = new scala.util.Random(seed)
    val table = Seq("lineitem", "orders", "customer")(seed % 3)
    val cols = tables(table)
    QGrp(table, cols(rnd.nextInt(cols.size)), 3L + rnd.nextInt(4),
      cols(rnd.nextInt(cols.size)), 2L + rnd.nextInt(3),
      cols(rnd.nextInt(cols.size)), 13L + rnd.nextInt(30),
      (seed / 3) % 2 == 1, wideArm(rnd, cols) match { case c: Cmp => c })
  }

  private def sparkOfGrp(q: QGrp)(s: SparkSession, dir: String): DataFrame = {
    val base = Queries.rd(s, dir, q.table)
      .filter(col(q.wide.c) >= q.wide.lit)
      .select((col(q.a) % q.amod).cast("long").as("a"),
        (col(q.b) % q.bmod).cast("long").as("b"),
        (col(q.v) % q.vmod).cast("long").as("v"))
    val sets = if (q.cube) base.cube("a", "b") else base.rollup("a", "b")
    // grouping() is only legal inside the aggregate — compute the
    // engine-neutral gid there, then derive the per-key subtotal flags
    // from its bits in the projection (gid = grouping(a)*2+grouping(b))
    sets.agg(sum("v").cast("long").as("sv"), count(lit(1)).as("n"),
        (grouping(col("a")) * 2 + grouping(col("b"))).cast("long").as("gid"))
      .select(
        when(col("gid") >= 2, lit(-1L)).otherwise(col("a")).as("ga"),
        when(col("gid") % 2 === 1, lit(-1L)).otherwise(col("b")).as("gb"),
        col("gid"), col("sv"), col("n"))
      .orderBy(col("gid").asc, col("ga").asc, col("gb").asc)
  }

  private def sqlOfGrp(q: QGrp): String = {
    val sets = if (q.cube) "CUBE(a, b)" else "ROLLUP(a, b)"
    s"""SELECT
       |  CAST(CASE WHEN GROUPING(a) = 1 THEN -1 ELSE a END AS BIGINT) AS ga,
       |  CAST(CASE WHEN GROUPING(b) = 1 THEN -1 ELSE b END AS BIGINT) AS gb,
       |  CAST(GROUPING(a) * 2 + GROUPING(b) AS BIGINT) AS gid,
       |  CAST(sum(v) AS BIGINT) AS sv, CAST(count(*) AS BIGINT) AS n
       |FROM (
       |  SELECT ${q.a} % ${q.amod} AS a, ${q.b} % ${q.bmod} AS b,
       |         ${q.v} % ${q.vmod} AS v
       |  FROM ${q.table} WHERE ${q.wide.c} >= ${q.wide.lit}
       |) sub
       |GROUP BY $sets
       |ORDER BY gid ASC, ga ASC, gb ASC""".stripMargin
  }

  // ---------- v14 (r18 verdict #6): datetime extract/trunc, CASE/
  // COALESCE coercion lattices, IN-list vs VALUES-join equivalence ----

  /** Family 1 — datetime truncation/extraction differentials over the
    * corpus date columns. Engine conventions are the hazard: week
    * numbering (both engines are ISO here — the gate pins that),
    * day-of-week origin (Spark's `dayofweek` is 1=Sunday; DuckDB's
    * `isodow` is 1=Monday — the Spark side renders the ISO convention
    * explicitly as (dayofweek+5)%7+1 so BOTH sides state the SAME
    * contract), and date_trunc's week anchor (Monday in both). Output
    * stays engine-exact: extracted units as BIGINT, truncations as
    * DATE (never raw timestamps — the TESTDATA nanos rule). */
  private final case class QDt(table: String, dateCol: String,
      unit: String, truncUnit: String, wide: Cmp)

  // the testdata lineitem carries only l_shipdate (TESTDATA.md schema —
  // no commit/receipt dates)
  private val dtDateCols = Map(
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"))

  private def genDt(seed: Int): QDt = {
    val rnd = new scala.util.Random(seed)
    val table = Seq("orders", "lineitem")(seed % 2)
    val dcols = dtDateCols(table)
    QDt(table, dcols(rnd.nextInt(dcols.size)),
      Seq("year", "quarter", "month", "week", "isodow")(rnd.nextInt(5)),
      Seq("year", "quarter", "month", "week")(rnd.nextInt(4)),
      wideArm(rnd, tables(table)) match { case c: Cmp => c })
  }

  private def sparkOfDt(q: QDt)(s: SparkSession, dir: String): DataFrame = {
    val d = col(q.dateCol)
    val u = (q.unit match {
      case "year"    => year(d)
      case "quarter" => quarter(d)
      case "month"   => month(d)
      case "week"    => weekofyear(d) // ISO week, like DuckDB's week
      case "isodow"  => (dayofweek(d) + lit(5)) % 7 + 1 // 1=Mon..7=Sun
    }).cast("long")
    Queries.rd(s, dir, q.table)
      .filter(col(q.wide.c) >= q.wide.lit)
      .groupBy(u.as("u"),
        date_trunc(q.truncUnit, d).cast("date").as("t"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("u").asc, col("t").asc)
  }

  private def sqlOfDt(q: QDt): String = {
    val u = q.unit match {
      case "isodow" => s"EXTRACT(isodow FROM ${q.dateCol})"
      case other    => s"EXTRACT($other FROM ${q.dateCol})"
    }
    s"""SELECT CAST($u AS BIGINT) AS u,
       |  CAST(date_trunc('${q.truncUnit}', ${q.dateCol}) AS DATE) AS t,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM ${q.table} WHERE ${q.wide.c} >= ${q.wide.lit}
       |GROUP BY 1, 2
       |ORDER BY u ASC, t ASC""".stripMargin
  }

  /** Family 2 — CASE/COALESCE type-coercion lattices: branches mix
    * BIGINT and a fractional literal, so each engine coerces through
    * ITS OWN lattice (Spark: long × double → double; DuckDB: BIGINT ×
    * DECIMAL → DECIMAL) — divergence in the lattice or in NULLIF/
    * COALESCE null propagation changes the grouped sums. Branch values
    * are integer-exact, so the final BIGINT cast is lossless in both
    * engines and the gate stays integer-exact. */
  private final case class QCase(table: String, b: String, bmod: Long,
      v: String, vmod: Long, t1: Long, t2: Long, nul: Long, wide: Cmp)

  private def genCase(seed: Int): QCase = {
    val rnd = new scala.util.Random(seed)
    val table = Seq("lineitem", "orders", "customer")(seed % 3)
    val cols = tables(table)
    val vmod = 11L + rnd.nextInt(20)
    QCase(table, cols(rnd.nextInt(cols.size)), 7L + rnd.nextInt(6),
      cols(rnd.nextInt(cols.size)), vmod,
      1L + rnd.nextInt(3), 4L + rnd.nextInt(3),
      rnd.nextInt(vmod.toInt).toLong,
      wideArm(rnd, cols) match { case c: Cmp => c })
  }

  private def sparkOfCase(q: QCase)(s: SparkSession, dir: String): DataFrame = {
    val base = Queries.rd(s, dir, q.table)
      .filter(col(q.wide.c) >= q.wide.lit)
      .select((col(q.b) % q.bmod).cast("long").as("b"),
        (col(q.v) % q.vmod).cast("long").as("v"))
    base.groupBy(
        // long/double/long branches -> double in Spark's lattice;
        // integer-exact values make the BIGINT cast lossless
        when(col("b") < q.t1, lit(1))
          .when(col("b") < q.t2, lit(2.0))
          .otherwise(lit(3)).cast("long").as("c1"))
      .agg(count(lit(1)).as("n"),
        // NULLIF + COALESCE null propagation (rendered as NULLIF in SQL)
        sum(coalesce(when(col("v") === q.nul, lit(null)).otherwise(col("v")),
          lit(-1L))).cast("long").as("s0"),
        // int × fractional-literal branches INSIDE the aggregate
        sum(when(col("v") % 2 === 0, col("v")).otherwise(lit(5.0)))
          .cast("long").as("s1"))
      .orderBy(col("c1").asc)
  }

  private def sqlOfCase(q: QCase): String =
    s"""SELECT
       |  CAST(CASE WHEN b < ${q.t1} THEN 1 WHEN b < ${q.t2} THEN 2.0
       |       ELSE 3 END AS BIGINT) AS c1,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(COALESCE(NULLIF(v, ${q.nul}), -1)) AS BIGINT) AS s0,
       |  CAST(sum(CASE WHEN v % 2 = 0 THEN v ELSE 5.0 END) AS BIGINT) AS s1
       |FROM (
       |  SELECT ${q.b} % ${q.bmod} AS b, ${q.v} % ${q.vmod} AS v
       |  FROM ${q.table} WHERE ${q.wide.c} >= ${q.wide.lit}
       |) sub
       |GROUP BY 1
       |ORDER BY c1 ASC""".stripMargin

  /** Family 3 — IN-list vs VALUES-join equivalence: the SAME membership
    * predicate planned two ways — a literal IN list (pushed predicate)
    * and a semi-join against a VALUES-derived relation (join operator).
    * Both arms ride one output with an arm tag, so any divergence
    * between the plans (inside either engine, or across them) breaks
    * the hash. */
  private final case class QInVal(table: String, c: String, cmod: Long,
      g: String, gmod: Long, members: Seq[Long], wide: Cmp)

  private def genInVal(seed: Int): QInVal = {
    val rnd = new scala.util.Random(seed)
    val table = Seq("lineitem", "orders", "customer")(seed % 3)
    val cols = tables(table)
    val cmod = 7L + rnd.nextInt(8)
    val members = rnd.shuffle((0L until cmod).toList)
      .take(2 + rnd.nextInt(3)).sorted
    QInVal(table, cols(rnd.nextInt(cols.size)), cmod,
      cols(rnd.nextInt(cols.size)), 3L + rnd.nextInt(4), members,
      wideArm(rnd, cols) match { case c: Cmp => c })
  }

  private def sparkOfInVal(q: QInVal)(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Queries.rd(s, dir, q.table)
      .filter(col(q.wide.c) >= q.wide.lit)
      .select((col(q.c) % q.cmod).cast("long").as("m"),
        (col(q.g) % q.gmod).cast("long").as("g"))
    val inArm = base.filter(col("m").isin(q.members: _*))
      .groupBy("g").agg(count(lit(1)).as("n"))
      .select(lit("in").as("arm"), col("g"), col("n"))
    val vjArm = base
      .join(broadcast(q.members.toDF("m")), Seq("m"), "left_semi")
      .groupBy("g").agg(count(lit(1)).as("n"))
      .select(lit("vj").as("arm"), col("g"), col("n"))
    inArm.unionByName(vjArm).orderBy(col("arm").asc, col("g").asc)
  }

  private def sqlOfInVal(q: QInVal): String = {
    val list = q.members.mkString(", ")
    val rows = q.members.map(v => s"($v)").mkString(", ")
    def sub =
      s"""  SELECT ${q.c} % ${q.cmod} AS m, ${q.g} % ${q.gmod} AS g
         |  FROM ${q.table} WHERE ${q.wide.c} >= ${q.wide.lit}""".stripMargin
    s"""SELECT 'in' AS arm, CAST(g AS BIGINT) AS g,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM (
       |$sub
       |) a WHERE m IN ($list) GROUP BY 2
       |UNION ALL
       |SELECT 'vj' AS arm, CAST(g AS BIGINT) AS g,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM (
       |$sub
       |) b WHERE m IN (SELECT v FROM (VALUES $rows) AS mem(v)) GROUP BY 2
       |ORDER BY arm ASC, g ASC""".stripMargin
  }

  // ---------- v15 (r19 verdict #6): LATERAL correlated derived tables,
  // integer division/modulo sign semantics, windowed aggregates over
  // BINARY keys with explicit casts --------------------------------

  /** Family 1 — LATERAL correlated derived tables: per-outer-row top-k
    * from the inner table (the classic lateral shape), one level deeper
    * than the v9 corrwin differential — Spark plans `lateralJoin` as a
    * LateralJoin operator, DuckDB decorrelates the comma-LATERAL into a
    * window; both must agree on the per-row cut. Determinism: the inner
    * ORDER BY always ends on a key unique WITHIN the correlation group
    * (l_linenumber within an order; o_orderkey within a customer), so
    * the LIMIT never cuts a tie arbitrarily. Inner values are cast
    * integer-exact BEFORE ordering/summing (l_quantity is an integral
    * double; Spark casts by truncation, DuckDB by rounding — exact
    * either way on integral values, stated here once). */
  private final case class QLat(pair: Int, k: Int, gmod: Long, wide: Cmp)

  private def genLat(seed: Int): QLat = {
    val rnd = new scala.util.Random(seed)
    val pair = seed % 2 // 0: orders⟶lineitem, 1: customer⟶orders
    val outerCols = if (pair == 0) tables("orders") else tables("customer")
    QLat(pair, 1 + rnd.nextInt(3), 3L + rnd.nextInt(5),
      wideArm(rnd, outerCols) match { case c: Cmp => c })
  }

  private def sparkOfLat(q: QLat)(s: SparkSession, dir: String): DataFrame = {
    if (q.pair == 0) {
      val outer = Queries.rd(s, dir, "orders")
        .filter(col(q.wide.c) >= q.wide.lit)
        .select("o_orderkey", "o_custkey")
      val inner = Queries.rd(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("iv"))
        .where(col("l_orderkey") === col("o_orderkey").outer())
        .orderBy(col("iv").desc, col("l_linenumber").asc)
        .limit(q.k)
        .select("iv")
      outer.lateralJoin(inner)
        .groupBy((col("o_custkey") % q.gmod).cast("long").as("g"))
        .agg(count(lit(1)).as("n"), sum("iv").cast("long").as("s"))
        .orderBy(col("g").asc)
    } else {
      val outer = Queries.rd(s, dir, "customer")
        .filter(col(q.wide.c) >= q.wide.lit)
        .select("c_custkey", "c_nationkey")
      val inner = Queries.rd(s, dir, "orders")
        .select(col("o_custkey"), (col("o_orderkey") % 97L).as("iv"),
          col("o_orderkey"))
        .where(col("o_custkey") === col("c_custkey").outer())
        .orderBy(col("o_orderkey").desc)
        .limit(q.k)
        .select("iv")
      outer.lateralJoin(inner)
        .groupBy((col("c_nationkey") % q.gmod).cast("long").as("g"))
        .agg(count(lit(1)).as("n"), sum("iv").cast("long").as("s"))
        .orderBy(col("g").asc)
    }
  }

  private def sqlOfLat(q: QLat): String =
    if (q.pair == 0)
      s"""SELECT CAST(o.o_custkey % ${q.gmod} AS BIGINT) AS g,
         |  CAST(count(*) AS BIGINT) AS n, CAST(sum(t.iv) AS BIGINT) AS s
         |FROM orders o, LATERAL (
         |  SELECT CAST(l_quantity AS BIGINT) AS iv
         |  FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
         |  ORDER BY CAST(l_quantity AS BIGINT) DESC, l_linenumber ASC
         |  LIMIT ${q.k}
         |) t
         |WHERE o.${q.wide.c} >= ${q.wide.lit}
         |GROUP BY 1
         |ORDER BY g ASC""".stripMargin
    else
      s"""SELECT CAST(c.c_nationkey % ${q.gmod} AS BIGINT) AS g,
         |  CAST(count(*) AS BIGINT) AS n, CAST(sum(t.iv) AS BIGINT) AS s
         |FROM customer c, LATERAL (
         |  SELECT o_orderkey % 97 AS iv
         |  FROM orders o WHERE o.o_custkey = c.c_custkey
         |  ORDER BY o_orderkey DESC
         |  LIMIT ${q.k}
         |) t
         |WHERE c.${q.wide.c} >= ${q.wide.lit}
         |GROUP BY 1
         |ORDER BY g ASC""".stripMargin

  /** Family 2 — integer division/modulo SIGN semantics: signed
    * dividends AND divisors through truncating division, C-style
    * modulo, and floor-modulo. The conventions are the hazard — and
    * both sides render the SAME stated contract explicitly (the v14
    * isodow discipline): truncation toward zero is Spark's `div`,
    * rendered in DuckDB as trunc(a / b) (double division is exact at
    * these magnitudes, |a| < 2^11); `%` takes the dividend's sign in
    * BOTH engines (C-style — pinned operator-to-operator); floor-mod
    * is Spark's `pmod` over abs(b), rendered in DuckDB by the closed
    * form ((a % n) + n) % n. The abs() is a measured lesson (first
    * render, seed 30001): with a NEGATIVE modulus Spark's pmod is
    * `r < 0 ? r + n : r` — NOT the closed form, which re-mods the
    * shifted remainder — so the two diverge there (e.g. pmod(1039-row
    * sums vs -134); the floor-mod arm therefore pins the
    * positive-modulus domain, pmod's intended one, while trunc-div
    * and C-mod still sweep all four (±a, ±b) quadrants. */
  private final case class QIdiv(table: String, a: String, amod: Long,
      ashift: Long, b: String, bmod: Long, g: String, gmod: Long, wide: Cmp)

  private def genIdiv(seed: Int): QIdiv = {
    val rnd = new scala.util.Random(seed)
    val table = Seq("lineitem", "orders", "customer")(seed % 3)
    val cols = tables(table)
    val amod = 100L + rnd.nextInt(900)
    QIdiv(table, cols(rnd.nextInt(cols.size)), amod, amod / 2,
      cols(rnd.nextInt(cols.size)), 4L + rnd.nextInt(5),
      cols(rnd.nextInt(cols.size)), 3L + rnd.nextInt(4),
      wideArm(rnd, cols) match { case c: Cmp => c })
  }

  private def sparkOfIdiv(q: QIdiv)(s: SparkSession, dir: String): DataFrame = {
    val base = Queries.rd(s, dir, q.table)
      .filter(col(q.wide.c) >= q.wide.lit)
      .select(
        (col(q.a).cast("long") % q.amod - q.ashift).as("a"),
        // nonzero divisor, sign flipped by parity: ±1..±bmod
        (when(col(q.b).cast("long") % 2 === 0, lit(1)).otherwise(lit(-1)) *
          (col(q.b).cast("long") % q.bmod + q.bmod) % q.bmod
          ).as("b0"),
        (col(q.g).cast("long") % q.gmod).as("g"))
      .withColumn("b", when(col("b0") === 0, lit(1)).otherwise(col("b0")))
    base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(expr("a div b")).cast("long").as("dt"),
        sum(col("a") % col("b")).cast("long").as("m"),
        sum(pmod(col("a"), abs(col("b")))).cast("long").as("fm"))
      .orderBy(col("g").asc)
  }

  private def sqlOfIdiv(q: QIdiv): String =
    s"""SELECT CAST(g AS BIGINT) AS g, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CAST(trunc(CAST(a AS DOUBLE) / b) AS BIGINT)) AS BIGINT) AS dt,
       |  CAST(sum(a % b) AS BIGINT) AS m,
       |  CAST(sum(((a % abs(b)) + abs(b)) % abs(b)) AS BIGINT) AS fm
       |FROM (
       |  SELECT a, CASE WHEN b0 = 0 THEN 1 ELSE b0 END AS b, g FROM (
       |    SELECT ${q.a} % ${q.amod} - ${q.ashift} AS a,
       |      (CASE WHEN ${q.b} % 2 = 0 THEN 1 ELSE -1 END) *
       |        ((${q.b} % ${q.bmod} + ${q.bmod}) % ${q.bmod}) AS b0,
       |      ${q.g} % ${q.gmod} AS g
       |    FROM ${q.table} WHERE ${q.wide.c} >= ${q.wide.lit}
       |  ) s0
       |) sub
       |GROUP BY 1
       |ORDER BY g ASC""".stripMargin

  /** Family 3 — windowed row_number over a BINARY sort key with
    * explicit casts: the key is unhex(md5-prefix) — a BLOB both
    * engines compare as unsigned lexicographic bytes — with the null
    * position PINNED explicitly on both renderings (Spark's ASC
    * default is nulls-first, DuckDB's nulls-last: the v2 lesson, now
    * on a binary column). The surviving rn ≤ k rows carry the key back
    * as upper(hex(...)) so the gate hashes the ORDER itself, not just
    * the cut. */
  private final case class QBinWin(pm: Long, k: Int, hlen: Int,
      desc: Boolean, fm: Long, fv: Long)

  private def genBinWin(seed: Int): QBinWin = {
    val rnd = new scala.util.Random(seed)
    QBinWin(4L + rnd.nextInt(8), 2 + rnd.nextInt(3),
      Seq(6, 8, 10)(rnd.nextInt(3)), seed % 2 == 1,
      5L + rnd.nextInt(5), rnd.nextInt(5).toLong)
  }

  private def sparkOfBinWin(q: QBinWin)(s: SparkSession, dir: String): DataFrame = {
    val bk = unhex(substring(md5(col("text")), 1, q.hlen))
    val ord =
      if (q.desc) Seq(col("bk").desc_nulls_last, col("doc_id").asc)
      else Seq(col("bk").asc_nulls_first, col("doc_id").asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("p").orderBy(ord: _*)
    Queries.rd(s, dir, "documents")
      .filter(col("doc_id") % q.fm =!= q.fv)
      .select(col("doc_id"), (col("doc_id") % q.pm).cast("long").as("p"),
        bk.as("bk"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= q.k)
      .select(col("p"), col("rn"), col("doc_id"),
        coalesce(upper(hex(col("bk"))), lit("~null~")).as("h"))
      .orderBy(col("p").asc, col("rn").asc)
  }

  private def sqlOfBinWin(q: QBinWin): String = {
    val dir = if (q.desc) "DESC NULLS LAST" else "ASC NULLS FIRST"
    s"""SELECT CAST(p AS BIGINT) AS p, CAST(rn AS BIGINT) AS rn,
       |  CAST(doc_id AS BIGINT) AS doc_id,
       |  COALESCE(upper(hex(bk)), '~null~') AS h
       |FROM (
       |  SELECT doc_id, doc_id % ${q.pm} AS p,
       |    unhex(substring(md5(text), 1, ${q.hlen})) AS bk,
       |    row_number() OVER (
       |      PARTITION BY doc_id % ${q.pm}
       |      ORDER BY unhex(substring(md5(text), 1, ${q.hlen})) $dir,
       |        doc_id ASC) AS rn
       |  FROM documents WHERE doc_id % ${q.fm} <> ${q.fv}
       |) sub
       |WHERE rn <= ${q.k}
       |ORDER BY p ASC, rn ASC""".stripMargin
  }

  // v14, seed-scanned (main's probe): dt covers both date tables ×
  // {year,quarter,month,week,isodow} extraction × four trunc anchors;
  // case covers the three tables with distinct NULLIF pivots; inval
  // covers 2-4 member lists over the three tables
  private val dtSeeds = Seq(26000, 26001, 26002, 26003)
  private val caseSeeds = Seq(27000, 27001, 27002, 27003)
  private val inValSeeds = Seq(28000, 28001, 28002, 28003)
  // v15, seed-scanned: lat covers both pairs × k 1-3; idiv covers the
  // three tables with all four (±a, ±b) quadrants by construction;
  // binwin covers asc/desc with both null positions pinned
  private val latSeeds = Seq(29000, 29001, 29002, 29003)
  private val idivSeeds = Seq(30000, 30001, 30002, 30003)
  private val binWinSeeds = Seq(31000, 31001, 31002, 31003)

  // v13, seed-scanned (main's probe): cte covers both reuse shapes ×
  // the three tables; vals covers 3- and 4-band literal tables; grp
  // covers ROLLUP and CUBE with subtotal keys disambiguated via
  // GROUPING() flags
  private val cteSeeds = Seq(23000, 23001, 23002, 23003)
  private val valsSeeds = Seq(24000, 24001, 24002, 24003)
  private val grpSeeds = Seq(25000, 25001, 25002, 25003)

  // v11, seed-scanned (main's probe): pct covers cont|disc × quarters ×
  // the three tables; ljwin covers rank|cumsum × asc/desc ×
  // nulls-first/last — both match states of the null-extension verified
  // non-empty at sf0.001
  private val pctSeeds = Seq(18000, 18001, 18004, 18008, 18011, 18013)
  private val ljWinSeeds = Seq(19000, 19001, 19002, 19003, 19005, 19006)

  // v10, seed-scanned (main's probe): rangewin covers both variants
  // (peers ×4 asc/desc×nulls-first/last combos at 16000/16004/16006/
  // 16024; offset k=1/2 at 16003/16007/16011), all three tables;
  // havexists covers both outer shapes × both polarities — probed
  // non-empty at the three SFs
  private val rangeWinSeeds = Seq(16000, 16003, 16004, 16006, 16007, 16011, 16024)
  private val havingExistsSeeds = Seq(17000, 17001, 17002, 17003, 17004, 17007)

  /** SELECT DISTINCT over nullable derived columns — row-level DISTINCT
    * treats NULLs as equal (one NULL row survives per key shape) in
    * both engines, and the null group must ORDER identically. The
    * aggregate-DISTINCT seeds above cannot reach this shape (they
    * collapse to one row per group); this pins it deterministically. */
  private def distinctRows(s: SparkSession, dir: String): DataFrame =
    Queries.rd(s, dir, "lineitem")
      .select(
        when(col("l_partkey") % 4 === 0, lit(null).cast("long"))
          .otherwise(col("l_partkey") % 4).as("nc0"),
        when(col("l_suppkey") % 3 === 1, lit(null).cast("long"))
          .otherwise(col("l_suppkey") % 3).as("nc1"))
      .distinct()
      .orderBy(col("nc0").asc_nulls_first, col("nc1").asc_nulls_first)

  private val distinctRowsSql =
    """SELECT DISTINCT NULLIF(l_partkey % 4, 0) AS nc0,
      |                NULLIF(l_suppkey % 3, 1) AS nc1
      |FROM lineitem
      |ORDER BY nc0 ASC NULLS FIRST, nc1 ASC NULLS FIRST""".stripMargin

  /** Aggregates over ZERO input rows — the one shape the satisfiable-
    * range discipline forbids the generators from drawing, exercised
    * deterministically: a scalar aggregate always returns exactly one
    * row, where COUNT must be 0 and MIN/SUM must be NULL in BOTH
    * engines. */
  private def emptyScalar(s: SparkSession, dir: String): DataFrame =
    Queries.rd(s, dir, "lineitem")
      .filter(col("l_quantity") < 0) // quantities are 1..50: empty input
      .agg(count(lit(1)).as("n"),
        min(col("l_quantity")).cast("long").as("mn"),
        sum(col("l_quantity")).cast("long").as("sm"))

  private val emptyScalarSql =
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |       CAST(min(l_quantity) AS BIGINT) AS mn,
      |       CAST(sum(l_quantity) AS BIGINT) AS sm
      |FROM lineitem
      |WHERE l_quantity < 0""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    seeds.map(sd => s"q_fuzz_$sd" -> (sparkOf(gen(sd)) _)).toMap ++
      joinSeeds.map(sd => s"q_fuzz_join_$sd" ->
        (sparkOf(gen(sd, joined = true)) _)).toMap ++
      nullSeeds.map(sd => s"q_fuzz_null_$sd" ->
        (sparkOfV2(genNull(sd)) _)).toMap ++
      louterSeeds.map(sd => s"q_fuzz_louter_$sd" ->
        (sparkOfV2(genLouter(sd)) _)).toMap ++
      distinctSeeds.map(sd => s"q_fuzz_distinct_$sd" ->
        (sparkOfV2(genDistinct(sd)) _)).toMap ++
      winSeeds.map(sd => s"q_fuzz_win_$sd" ->
        (sparkOfWin(genWindow(sd)) _)).toMap ++
      setSeeds.map(sd => s"q_fuzz_set_$sd" ->
        (sparkOfSet(genSetOp(sd)) _)).toMap ++
      subSeeds.map(sd => s"q_fuzz_sub_$sd" ->
        (sparkOfSub(genSub(sd)) _)).toMap ++
      rollSeeds.map(sd => s"q_fuzz_roll_$sd" ->
        (sparkOfRoll(genRoll(sd)) _)).toMap ++
      corrSeeds.map(sd => s"q_fuzz_corr_$sd" ->
        (sparkOfCorr(genCorr(sd)) _)).toMap ++
      winJoinSeeds.map(sd => s"q_fuzz_winjoin_$sd" ->
        (sparkOfWinJoin(genWinJoin(sd)) _)).toMap ++
      setGrpSeeds.map(sd => s"q_fuzz_setgrp_$sd" ->
        (sparkOfSetGrp(genSetGrp(sd)) _)).toMap ++
      aggJoinSeeds.map(sd => s"q_fuzz_aggjoin_$sd" ->
        (sparkOfAggJoin(genAggJoin(sd)) _)).toMap ++
      rankGrpSeeds.map(sd => s"q_fuzz_rankgrp_$sd" ->
        (sparkOfRankGrp(genRankGrp(sd)) _)).toMap ++
      avgHavingSeeds.map(sd => s"q_fuzz_avghav_$sd" ->
        (sparkOfAvgHaving(genAvgHaving(sd)) _)).toMap ++
      cumGrpSeeds.map(sd => s"q_fuzz_cumgrp_$sd" ->
        (sparkOfCumGrp(genCumGrp(sd)) _)).toMap ++
      winSetGrpSeeds.map(sd => s"q_fuzz_winsetgrp_$sd" ->
        (sparkOfWinSetGrp(genWinSetGrp(sd)) _)).toMap ++
      corrWinSeeds.map(sd => s"q_fuzz_corrwin_$sd" ->
        (sparkOfCorrWin(genCorrWin(sd)) _)).toMap ++
      rangeWinSeeds.map(sd => s"q_fuzz_rangewin_$sd" ->
        (sparkOfRangeWin(genRangeWin(sd)) _)).toMap ++
      havingExistsSeeds.map(sd => s"q_fuzz_havexists_$sd" ->
        (sparkOfHavingExists(genHavingExists(sd)) _)).toMap ++
      pctSeeds.map(sd => s"q_fuzz_pct_$sd" ->
        (sparkOfPct(genPct(sd)) _)).toMap ++
      ljWinSeeds.map(sd => s"q_fuzz_ljwin_$sd" ->
        (sparkOfLjWin(genLjWin(sd)) _)).toMap ++
      filtSeeds.map(sd => s"q_fuzz_filt_$sd" ->
        (sparkOfFilt(genFilt(sd)) _)).toMap ++
      unnestSeeds.map(sd => s"q_fuzz_unnest_$sd" ->
        (sparkOfUnnest(genUnnest(sd)) _)).toMap ++
      winDistSeeds.map(sd => s"q_fuzz_windist_$sd" ->
        (sparkOfWinDist(genWinDist(sd)) _)).toMap ++
      cteSeeds.map(sd => s"q_fuzz_cte_$sd" ->
        (sparkOfCte(genCte(sd)) _)).toMap ++
      valsSeeds.map(sd => s"q_fuzz_vals_$sd" ->
        (sparkOfVals(genVals(sd)) _)).toMap ++
      grpSeeds.map(sd => s"q_fuzz_grp_$sd" ->
        (sparkOfGrp(genGrp(sd)) _)).toMap ++
      dtSeeds.map(sd => s"q_fuzz_dt_$sd" ->
        (sparkOfDt(genDt(sd)) _)).toMap ++
      caseSeeds.map(sd => s"q_fuzz_case_$sd" ->
        (sparkOfCase(genCase(sd)) _)).toMap ++
      inValSeeds.map(sd => s"q_fuzz_inval_$sd" ->
        (sparkOfInVal(genInVal(sd)) _)).toMap ++
      latSeeds.map(sd => s"q_fuzz_lat_$sd" ->
        (sparkOfLat(genLat(sd)) _)).toMap ++
      idivSeeds.map(sd => s"q_fuzz_idiv_$sd" ->
        (sparkOfIdiv(genIdiv(sd)) _)).toMap ++
      binWinSeeds.map(sd => s"q_fuzz_binwin_$sd" ->
        (sparkOfBinWin(genBinWin(sd)) _)).toMap +
      ("q_fuzz_empty_scalar" -> (emptyScalar _)) +
      ("q_fuzz_distinct_rows" -> (distinctRows _))

  val oracleSql: Map[String, String] =
    seeds.map(sd => s"q_fuzz_$sd" -> sqlOf(gen(sd))).toMap ++
      joinSeeds.map(sd => s"q_fuzz_join_$sd" ->
        sqlOf(gen(sd, joined = true))).toMap ++
      nullSeeds.map(sd => s"q_fuzz_null_$sd" -> sqlOfV2(genNull(sd))).toMap ++
      louterSeeds.map(sd => s"q_fuzz_louter_$sd" ->
        sqlOfV2(genLouter(sd))).toMap ++
      distinctSeeds.map(sd => s"q_fuzz_distinct_$sd" ->
        sqlOfV2(genDistinct(sd))).toMap ++
      winSeeds.map(sd => s"q_fuzz_win_$sd" -> sqlOfWin(genWindow(sd))).toMap ++
      setSeeds.map(sd => s"q_fuzz_set_$sd" -> sqlOfSet(genSetOp(sd))).toMap ++
      subSeeds.map(sd => s"q_fuzz_sub_$sd" -> sqlOfSub(genSub(sd))).toMap ++
      rollSeeds.map(sd => s"q_fuzz_roll_$sd" -> sqlOfRoll(genRoll(sd))).toMap ++
      corrSeeds.map(sd => s"q_fuzz_corr_$sd" -> sqlOfCorr(genCorr(sd))).toMap ++
      winJoinSeeds.map(sd => s"q_fuzz_winjoin_$sd" ->
        sqlOfWinJoin(genWinJoin(sd))).toMap ++
      setGrpSeeds.map(sd => s"q_fuzz_setgrp_$sd" ->
        sqlOfSetGrp(genSetGrp(sd))).toMap ++
      aggJoinSeeds.map(sd => s"q_fuzz_aggjoin_$sd" ->
        sqlOfAggJoin(genAggJoin(sd))).toMap ++
      rankGrpSeeds.map(sd => s"q_fuzz_rankgrp_$sd" ->
        sqlOfRankGrp(genRankGrp(sd))).toMap ++
      avgHavingSeeds.map(sd => s"q_fuzz_avghav_$sd" ->
        sqlOfAvgHaving(genAvgHaving(sd))).toMap ++
      cumGrpSeeds.map(sd => s"q_fuzz_cumgrp_$sd" ->
        sqlOfCumGrp(genCumGrp(sd))).toMap ++
      winSetGrpSeeds.map(sd => s"q_fuzz_winsetgrp_$sd" ->
        sqlOfWinSetGrp(genWinSetGrp(sd))).toMap ++
      corrWinSeeds.map(sd => s"q_fuzz_corrwin_$sd" ->
        sqlOfCorrWin(genCorrWin(sd))).toMap ++
      rangeWinSeeds.map(sd => s"q_fuzz_rangewin_$sd" ->
        sqlOfRangeWin(genRangeWin(sd))).toMap ++
      havingExistsSeeds.map(sd => s"q_fuzz_havexists_$sd" ->
        sqlOfHavingExists(genHavingExists(sd))).toMap ++
      pctSeeds.map(sd => s"q_fuzz_pct_$sd" -> sqlOfPct(genPct(sd))).toMap ++
      ljWinSeeds.map(sd => s"q_fuzz_ljwin_$sd" ->
        sqlOfLjWin(genLjWin(sd))).toMap ++
      filtSeeds.map(sd => s"q_fuzz_filt_$sd" -> sqlOfFilt(genFilt(sd))).toMap ++
      unnestSeeds.map(sd => s"q_fuzz_unnest_$sd" ->
        sqlOfUnnest(genUnnest(sd))).toMap ++
      winDistSeeds.map(sd => s"q_fuzz_windist_$sd" ->
        sqlOfWinDist(genWinDist(sd))).toMap ++
      cteSeeds.map(sd => s"q_fuzz_cte_$sd" -> sqlOfCte(genCte(sd))).toMap ++
      valsSeeds.map(sd => s"q_fuzz_vals_$sd" -> sqlOfVals(genVals(sd))).toMap ++
      grpSeeds.map(sd => s"q_fuzz_grp_$sd" -> sqlOfGrp(genGrp(sd))).toMap ++
      dtSeeds.map(sd => s"q_fuzz_dt_$sd" -> sqlOfDt(genDt(sd))).toMap ++
      caseSeeds.map(sd => s"q_fuzz_case_$sd" -> sqlOfCase(genCase(sd))).toMap ++
      inValSeeds.map(sd => s"q_fuzz_inval_$sd" ->
        sqlOfInVal(genInVal(sd))).toMap ++
      latSeeds.map(sd => s"q_fuzz_lat_$sd" -> sqlOfLat(genLat(sd))).toMap ++
      idivSeeds.map(sd => s"q_fuzz_idiv_$sd" ->
        sqlOfIdiv(genIdiv(sd))).toMap ++
      binWinSeeds.map(sd => s"q_fuzz_binwin_$sd" ->
        sqlOfBinWin(genBinWin(sd))).toMap +
      ("q_fuzz_empty_scalar" -> emptyScalarSql) +
      ("q_fuzz_distinct_rows" -> distinctRowsSql)

  /** Non-emptiness probe over every fuzz query at the three test SFs —
    * the check the gate contract demands after ANY grammar edit: a
    * structurally-empty result passes the hash compare while checking
    * nothing. `runMain graft.FuzzQueries [sfDirs...]`. The
    * empty-scalar query is exempt by design (scalar aggregates return
    * one row regardless; emptiness of the INPUT is its entire point). */
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for ((name, sql) <- oracleSql.toSeq.sortBy(_._1)
         if name.contains("null") || name.contains("louter") ||
           name.contains("distinct") || name.contains("aggjoin") ||
           name.contains("rankgrp") || name.contains("avghav") ||
           name.contains("cumgrp") || name.contains("rangewin") ||
           name.contains("havexists") || name.contains("pct") ||
           name.contains("ljwin") || name.contains("filt") ||
           name.contains("unnest") || name.contains("windist"))
      println(s"-- $name\n${sql.replaceAll("\n+", "\n")}")
    var empty = 0
    for (dir <- dirs; (name, fn) <- queries.toSeq.sortBy(_._1)) {
      val n = fn(spark, dir).count()
      val flag = if (n == 0 && name != "q_fuzz_empty_scalar") { empty += 1; "  <-- EMPTY" } else ""
      println(f"$dir%-26s $name%-24s $n%8d$flag")
    }
    println(if (empty == 0) "all fuzz queries non-empty"
      else s"$empty EMPTY fuzz results — adjust seeds or grammar")
    spark.stop()
    if (empty > 0) sys.exit(1)
  }
}
