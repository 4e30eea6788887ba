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

  /** Seeds are FIXED: the gate must be reproducible run-to-run and match
    * the oracle map below. Plain seeds fuzz one table; join seeds fuzz
    * lineitem ⋈ orders compositions (pushdown through the join, partial
    * aggregation above it). */
  private val seeds = Seq(101, 202, 303, 404, 505)
  private val joinSeeds = Seq(611, 722, 833)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    seeds.map(sd => s"q_fuzz_$sd" -> (sparkOf(gen(sd)) _)).toMap ++
      joinSeeds.map(sd => s"q_fuzz_join_$sd" ->
        (sparkOf(gen(sd, joined = true)) _)).toMap

  val oracleSql: Map[String, String] =
    seeds.map(sd => s"q_fuzz_$sd" -> sqlOf(gen(sd))).toMap ++
      joinSeeds.map(sd => s"q_fuzz_join_$sd" ->
        sqlOf(gen(sd, joined = true))).toMap
}
