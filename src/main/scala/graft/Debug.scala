package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: run one named query with full error output.
  * Usage: runMain graft.Debug <queryName> [sfDir] */
object Debug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val repeat = args.indexOf("--repeat") match {
      case -1 => 0
      case i  => args(i + 1).toInt
    }
    if (repeat > 0) {
      // bench-shaped repetitions (noop sink, cache cleared between runs)
      // for chasing run-to-run variance of one query; cpu printed too —
      // the wall/cpu split is Bench's contention-vs-regression
      // discriminator and a quiet pin needs both
      def cpuNanos: Long = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        .getProcessCpuTime
      (1 to repeat).foreach { k =>
        val cpu0 = cpuNanos
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"run $k: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          f"cpu ${(cpuNanos - cpu0) / 1e9}%.1f core-s")
        spark.catalog.clearCache()
        System.gc()
      }
    } else {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.show(20, truncate = false)
      println(s"rows = ${df.count()}")
      if (args.contains("--explain")) df.explain("formatted")
    }
    spark.stop()
  }
}
