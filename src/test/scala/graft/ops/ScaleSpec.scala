package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSuite {

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")
  private lazy val customer = spark.read.parquet(s"$sf/customer.parquet")

  test("saltedJoin equals the plain inner join") {
    val plain = orders.join(customer,
      orders("o_custkey") === customer("c_custkey"))
      .select("o_orderkey", "c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val salted = Scale.saltedJoin(
      orders.withColumnRenamed("o_custkey", "custkey"),
      customer.withColumnRenamed("c_custkey", "custkey"),
      Seq("custkey"))
      .select("o_orderkey", "custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("byte-identical hot-key rows spread over multiple salt values") {
    // the degenerate skew shape: one hot key whose rows are ALL
    // byte-identical. A row-hash-only salt collapses them into a single
    // salt bucket (the straggler survives); mixing the input partition
    // id spreads them across the partitions that carry the key.
    import spark.implicits._
    val hot = Seq.fill(512)((42L, "same-payload")).toDF("key", "payload")
      .repartition(8)
    val salts = hot.withColumn("__salt", Scale.saltOf(hot, 8))
      .select("__salt").distinct().count()
    assert(salts >= 2, s"identical rows collapsed into $salts salt bucket(s)")
  }

  test("heavyHitters finds the true top values per group") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val got = Scale.heavyHitters(li, "l_returnflag", "l_suppkey", k = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // brute-force oracle
    val want = li.groupBy("l_returnflag", "l_suppkey").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex
          .map { case ((f, s, n), i) => (f, s, n, i + 1) }
      }.toSet
    assert(got.toSet == want)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Scale.writeBucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders", "o_custkey", 8)
      Scale.writeBucketed(customer.select("c_custkey", "c_name"),
        "b_customer", "c_custkey", 8)
      val joined = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() ==
        orders.join(customer, orders("o_custkey") === customer("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
