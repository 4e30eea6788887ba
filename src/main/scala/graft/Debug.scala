package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: run one named query with full error output.
  * Usage: runMain graft.Debug <queryName> [sfDir] */
object Debug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B experiment knob: GRAFT_DEBUG_CONF="k=v;k2=v2" extra session conf
    sys.env.get("GRAFT_DEBUG_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val repeat = args.indexOf("--repeat") match {
      case -1 => 0
      case i  => args(i + 1).toInt
    }
    // --profile: attach a listener and attribute the query's wall clock
    // to its constituent Spark jobs (no UI in the sandbox — this is the
    // optimization guide's "look at the stages" step). Each job line
    // carries duration, task count, and the first line of its callsite
    // so driver-side gaps (planning, checkpoint setup, FS calls) show up
    // as the difference between the job sum and the wall clock.
    if (args.contains("--profile")) {
      import org.apache.spark.scheduler._
      final case class JobRow(id: Int, start: Long, var end: Long,
        var nTasks: Int, site: String, var stages: Int)
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
      val stageCpu = new java.util.concurrent.ConcurrentLinkedQueue[
        (Int, Double, Int, String)]()
      val listener = new SparkListener {
        override def onJobStart(e: SparkListenerJobStart): Unit = {
          val site = e.stageInfos.map(_.name.takeWhile(_ != '\n'))
            .distinct.mkString(" | ")
          jobs.put(e.jobId, JobRow(e.jobId, e.time, e.time,
            e.stageInfos.map(_.numTasks).sum, site, e.stageIds.size))
        }
        override def onJobEnd(e: SparkListenerJobEnd): Unit = {
          val r = jobs.get(e.jobId); if (r != null) r.end = e.time
        }
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          val m = e.stageInfo.taskMetrics
          if (m != null) stageCpu.add((e.stageInfo.stageId,
            m.executorCpuTime / 1e9, e.stageInfo.numTasks,
            e.stageInfo.name.takeWhile(_ != '\n')))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val runs = math.max(1, repeat)
      (1 to runs).foreach { k =>
        jobs.clear()
        stageCpu.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        import scala.jdk.CollectionConverters._
        val rows = jobs.values.asScala.toSeq.sortBy(_.start)
        val jobSum = rows.map(r => (r.end - r.start) / 1e3).sum
        println(f"== run $k: wall $wall%.2f s, ${rows.size} jobs, " +
          f"job-sum $jobSum%.2f s, driver-gap ${wall - jobSum}%.2f s")
        rows.foreach { r =>
          println(f"  job ${r.id}%3d ${(r.end - r.start) / 1e3}%6.2f s " +
            f"stages=${r.stages}%2d tasks=${r.nTasks}%4d  ${r.site}")
        }
        import scala.jdk.CollectionConverters._
        val byCpu = stageCpu.asScala.toSeq.sortBy(-_._2)
        println(f"  -- stage CPU total ${byCpu.map(_._2).sum}%.1f core-s; top:")
        byCpu.take(12).foreach { case (sid, cpu, nt, nm) =>
          println(f"  stage $sid%4d cpu $cpu%6.1f core-s tasks=$nt%4d  $nm")
        }
        spark.catalog.clearCache()
        System.gc()
      }
      spark.stop()
      return
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
    } else if (args.contains("--plan")) {
      // plan-only: build the frame (store gates still run their cycles
      // eagerly) and print the formatted physical plan — the shape the
      // plans/r{N} evidence files capture
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    } else {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.show(20, truncate = false)
      println(s"rows = ${df.count()}")
      if (args.contains("--explain")) df.explain("formatted")
    }
    spark.stop()
  }
}
