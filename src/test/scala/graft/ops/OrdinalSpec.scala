package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed two-pass ordinal must agree exactly with the
  * single-partition `row_number() OVER (ORDER BY …)` it replaces. */
class OrdinalSpec extends SparkSuite {

  private lazy val df = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (0 until 5000).map(i => (rnd.nextInt(1000), rnd.nextLong(), s"v$i"))
      .toDF("k", "salt", "v")
  }

  test("stamp equals the global window ordinal on a total order") {
    val ord = Seq(col("k"), col("salt"), col("v"))
    val got = Ordinal.stamp(df, ord)
      .select("k", "salt", "v", "row_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)) -> r.getLong(3))
      .toMap
    val want = df
      .withColumn("row_id",
        row_number().over(Window.orderBy(col("k"), col("salt"), col("v")))
          .cast("long") - 1)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(got == want)
  }

  test("stampWithCount reports the exact total and a dense 0-based range") {
    val st = Ordinal.stampWithCount(df, Seq(col("salt"), col("v")))
    try {
      assert(st.total == 5000L)
      val ids = st.df.select("row_id").collect().map(_.getLong(0)).sorted
      assert(ids.head == 0L && ids.last == 4999L && ids.length == 5000)
      assert(ids.toSet.size == 5000) // dense, no gaps or dups
    } finally st.release()
  }

  test("empty input stamps to empty with total 0") {
    val empty = df.filter(lit(false))
    val st = Ordinal.stampWithCount(empty, Seq(col("v")))
    try {
      assert(st.total == 0L)
      assert(st.df.count() == 0L)
    } finally st.release()
  }

  test("deterministic across invocations") {
    val ord = Seq(col("salt"), col("v"))
    def ids() = Ordinal.stamp(df, ord).select("v", "row_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ids() == ids())
  }
}
