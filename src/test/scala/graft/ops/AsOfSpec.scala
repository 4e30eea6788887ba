package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSuite {

  import spark.implicits._

  test("backward as-of: latest at-or-before match, null when none") {
    val l = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (2L, 15L, "e3"))
      .toDF("k", "t", "ev")
    val r = Seq((1L, 5L, "a"), (1L, 20L, "b"), (2L, 99L, "z"))
      .toDF("rk", "rt", "v")
    val got = AsOf.joinBackward(l, r, "k", "rk", "t", "rt")
      .select("ev", "v").collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(got("e1") == Some("a"))   // 5 <= 10
    assert(got("e2") == Some("b"))   // equality is inclusive
    assert(got("e3") == None)        // right row is in the future
  }

  test("tie on right time resolved by tiebreak column (largest wins)") {
    val l = Seq((1L, 10L, "e")).toDF("k", "t", "ev")
    val r = Seq((1L, 10L, 1L, "lo"), (1L, 10L, 7L, "hi"))
      .toDF("rk", "rt", "id", "v")
    val got = AsOf.joinBackward(l, r, "k", "rk", "t", "rt",
      rightTieBreak = Some("id")).select("v").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("hi"))
  }

  test("matches a naive range-join + argmax on real data") {
    val l = graft.Queries.events(spark, sf)
      .select("event_id", "user_id", "ts_ms")
      .filter(col("event_id") < 200) // deterministic subset (limit isn't)
    val r = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_custkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ot"))
      .agg(max("o_orderkey").as("o_orderkey"))
    val fast = AsOf.joinBackward(l, r, "user_id", "o_custkey", "ts_ms", "ot")
      .select("event_id", "o_orderkey").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    // naive: theta-join all at-or-before rows, keep argmax by (ot, orderkey)
    val naive = l.join(r,
      l("user_id") === r("o_custkey") && r("ot") <= l("ts_ms"), "left")
      .groupBy("event_id")
      .agg(max(struct(col("ot"), col("o_orderkey"))).as("m"))
      .select(col("event_id"), col("m.o_orderkey"))
      .collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(fast == naive)
    assert(fast.nonEmpty)
  }
}
