package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: run one named query with full error output.
  * Usage: runMain graft.Debug <queryName> [sfDir] */
object Debug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.show(20, truncate = false)
    println(s"rows = ${df.count()}")
    if (args.contains("--explain")) df.explain("formatted")
    spark.stop()
  }
}
