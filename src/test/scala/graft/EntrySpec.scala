package graft

/** The driver's smoke contract: entry() returns rows on sf0.001, and
  * every declared query key resolves and runs there. */
class EntrySpec extends SparkSuite {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries run and return rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf).count()
        spark.catalog.clearCache()
        if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows: $empty")
  }
}
