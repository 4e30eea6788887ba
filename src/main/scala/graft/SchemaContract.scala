package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Corpus-drift preflight: assert every testdata table's columns resolve
  * to types the queries can dispatch, and name the table/column when one
  * does not.
  *
  * Why this exists: the driver regenerates the test corpus between
  * rounds, and a re-encode (events.ts TIMESTAMP(NANOS)→TIMESTAMP_NTZ in
  * r10) silently broke every event query for a full round — each died
  * deep inside its own plan with an unhelpful cast error. This probe
  * turns that failure mode into one loud, early, named report.
  *
  * The contract is deliberately a SET per column — dispatchability, not
  * an exact schema pin: key columns may arrive int32 or int64 (queries
  * cast at the comparison sites), the events timestamp may arrive as
  * nanos-long, TIMESTAMP, or TIMESTAMP_NTZ (`Queries.tsMsExpr`
  * dispatches all three), embeddings may be float or double (the vector
  * expressions accept both). Anything OUTSIDE the set — a stringified
  * timestamp, a decimal-encoded price — is drift no dispatch handles,
  * and the right failure is immediate and named. Extra columns are
  * allowed (additive drift breaks nothing). */
object SchemaContract {

  private val integral: Set[DataType] = Set(IntegerType, LongType)
  private val fractional: Set[DataType] = Set(DoubleType)
  private val text: Set[DataType] = Set(StringType)
  private val time: Set[DataType] =
    Set(TimestampType, TimestampNTZType, DateType)
  private val eventTs: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)
  private val vector: Set[DataType] =
    Set(true, false).flatMap(n =>
      Set(ArrayType(FloatType, n), ArrayType(DoubleType, n)): Set[DataType])

  val contract: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map("r_regionkey" -> integral, "r_name" -> text),
    "nation" -> Map("n_nationkey" -> integral, "n_name" -> text,
      "n_regionkey" -> integral),
    "customer" -> Map("c_custkey" -> integral, "c_name" -> text,
      "c_nationkey" -> integral, "c_acctbal" -> fractional,
      "c_mktsegment" -> text),
    "supplier" -> Map("s_suppkey" -> integral, "s_name" -> text,
      "s_nationkey" -> integral, "s_acctbal" -> fractional),
    "part" -> Map("p_partkey" -> integral, "p_name" -> text,
      "p_brand" -> text, "p_type" -> text, "p_size" -> integral,
      "p_retailprice" -> fractional),
    "orders" -> Map("o_orderkey" -> integral, "o_custkey" -> integral,
      "o_orderstatus" -> text, "o_totalprice" -> fractional,
      "o_orderdate" -> time, "o_orderpriority" -> text),
    "lineitem" -> Map("l_orderkey" -> integral, "l_partkey" -> integral,
      "l_suppkey" -> integral, "l_linenumber" -> integral,
      "l_quantity" -> fractional, "l_extendedprice" -> fractional,
      "l_discount" -> fractional, "l_tax" -> fractional,
      "l_returnflag" -> text, "l_linestatus" -> text,
      "l_shipdate" -> time),
    "events" -> Map("event_id" -> integral, "ts" -> eventTs,
      "user_id" -> integral, "event_type" -> text,
      "value" -> fractional, "props" -> text),
    "documents" -> Map("doc_id" -> integral, "text" -> text,
      "lang" -> text, "source" -> text, "n_chars" -> integral),
    "embeddings" -> Map("vec_id" -> integral, "embedding" -> vector,
      "label" -> integral))

  /** All contract violations under `sfDir`, each naming the table, the
    * column, and what was found — empty means the corpus is
    * dispatchable. An unreadable table is itself a violation. */
  def violations(spark: SparkSession, sfDir: String): Seq[String] =
    contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema =
        try Right(Queries.rd(spark, sfDir, table).schema)
        catch { case e: Exception => Left(e.getMessage) }
      schema match {
        case Left(err) => Seq(s"$table: unreadable ($err)")
        case Right(s) =>
          val byName = s.fields.map(f => f.name -> f.dataType).toMap
          cols.toSeq.sortBy(_._1).flatMap { case (c, allowed) =>
            byName.get(c) match {
              case None => Some(s"$table.$c: MISSING " +
                s"(table has ${s.fieldNames.mkString(", ")})")
              case Some(t) if !allowed.contains(t) =>
                Some(s"$table.$c: got ${t.sql}, dispatchable types are " +
                  allowed.toSeq.map(_.sql).sorted.mkString("{", ", ", "}"))
              case _ => None
            }
          }
      }
    }

  /** Report violations to stderr, loudly, and return them. Deliberately
    * does NOT throw: Verify/Bench run a hundred queries whose other
    * tables may be fine — zeroing the whole round over one drifted
    * column is the r10 failure with the sign flipped. The named report
    * is the point. */
  def report(spark: SparkSession, sfDir: String): Seq[String] = {
    val v = violations(spark, sfDir)
    if (v.nonEmpty) {
      System.err.println(
        s"[preflight] SCHEMA CONTRACT VIOLATIONS in $sfDir — dependent " +
          "queries will fail; the corpus drifted from what the queries " +
          "dispatch:")
      v.foreach(x => System.err.println(s"[preflight]   $x"))
    }
    v
  }
}
