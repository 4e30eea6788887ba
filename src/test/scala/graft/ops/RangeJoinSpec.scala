package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSuite {

  import spark.implicits._

  test("banded plan equals the naive theta-join") {
    val df = graft.Queries.events(spark, sf)
      .select("user_id", "ts_ms", "event_id")
      .filter(col("event_id") < 300)
    val fast = RangeJoin
      .selfPairsWithinBand(df, "user_id", "ts_ms", "event_id", 120000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = df.toDF("k", "t", "id")
    val b = df.toDF("k2", "rt", "rid")
    val naive = a.join(b, a("k") === b("k2") &&
        a("id") =!= b("rid") && abs(b("rt") - a("t")) <= 120000L)
      .select("k", "id", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast == naive)
    assert(fast.nonEmpty)
  }

  test("band boundary is inclusive; outside the band excluded") {
    val df = Seq((1L, 0L, 1L), (1L, 60000L, 2L), (1L, 60001L, 3L))
      .toDF("user_id", "ts_ms", "event_id")
    val pairs = RangeJoin
      .selfPairsWithinBand(df, "user_id", "ts_ms", "event_id", 60000L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains((1L, 2L)))   // exactly band apart -> included
    assert(!pairs.contains((1L, 3L)))  // band+1 -> excluded
    assert(pairs.contains((2L, 3L)))   // 1ms apart
  }
}
