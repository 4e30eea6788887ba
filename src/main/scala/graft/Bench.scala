package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Each query is forced through a `noop` sink — a plain count() lets
  * Catalyst prune every computed column and would time the parquet
  * row-count path instead of the operator. local[32] to match the
  * driver's bench spec.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen + parquet footer caches, so the first
    // timed query isn't charged for session startup
    try SparkEntry.queries("q_topk_orders")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // untimed setup: one-time index builds — the timed queries measure
    // the product paths (persistent stamp + stats-pruned filter; IVF
    // partition-pruned probe), not index construction
    try Queries.prepareRandomAccess(spark, sfDir)
    catch { case _: Throwable => () }
    try Queries.prepareIvfIndex(spark, sfDir)
    catch { case _: Throwable => () }
    def timeOne(name: String,
        fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators persist reusable intermediates (signature tables);
      // drop them so queries are measured independently
      spark.catalog.clearCache()
      dt
    }
    // single-shot per query: exactly what the grading driver measures.
    // (Best-of-N de-noising was removed — it masked real regressions and
    // made the private numbers incomparable to the driver's.)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> timeOne(name, fn)
    }
    // host-contention calibration: a FIXED pure-codegen workload whose
    // cost is independent of this library (sum over a 2e8 range). Its
    // solo-host time is recorded in BASELINE.md §2; a run reporting k×
    // that time ran on a host ~k× contended, scaling the total the same
    // way — making totals comparable across runs/hosts.
    val calib = {
      val t0 = System.nanoTime()
      spark.range(200000000L)
        .agg(org.apache.spark.sql.functions.sum("id")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"calibration_sec":$calib,"sf":"$sfDir"}""")
    spark.stop()
  }
}
