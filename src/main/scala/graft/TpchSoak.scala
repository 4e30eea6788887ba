package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TPC-H scale soak (r14 verdict #6): the dedup family has measured
  * 1×/10×/100× curves; this gives the RELATIONAL suite the same — all
  * 22 queries over a `factor`× key-shifted corpus, wall + shuffle bytes
  * per query, so "the TPC-H plans scale" is a measured curve instead of
  * a design note. Usage: `runMain graft.TpchSoak [sfDir] [factor]`; run
  * at 1 and 10 and compare per-query (BASELINE.md records the curve).
  *
  * Corpus discipline (the Soak token-bijection's relational analogue):
  * copy `i` shifts every JOIN KEY by a per-family stride (orderkeys
  * +i·10⁷, part/custkeys +i·10⁶, suppkeys +i·10⁵) and leaves every
  * other column — dates, prices, flags, names — unchanged. Joins then
  * stay strictly WITHIN a copy (strides exceed any key range), so join
  * fan-out, selectivities, and per-key group sizes are preserved
  * exactly and true result mass scales linearly — the shape a real 10×
  * warehouse has. The nation/region dims are shared across copies
  * (their keys are not shifted), exactly like a real warehouse where
  * dimensions grow slower than facts. Naive replication without the
  * shift would instead multiply join MATCHES quadratically.
  */
object TpchSoak {

  private final class ShuffleMeter extends SparkListener {
    val writeBytes = new java.util.concurrent.atomic.AtomicLong
    val readBytes = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        writeBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        readBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        ()
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val strides: Map[String, Map[String, Long]] = Map(
      "lineitem" -> Map("l_orderkey" -> 10000000L, "l_partkey" -> 1000000L,
        "l_suppkey" -> 100000L),
      "orders" -> Map("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L),
      "customer" -> Map("c_custkey" -> 1000000L),
      "supplier" -> Map("s_suppkey" -> 100000L),
      "part" -> Map("p_partkey" -> 1000000L))

    val tmp = java.nio.file.Files.createTempDirectory("tpch_soak_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      org.apache.hadoop.fs.FileUtil.fullyDelete(tmp.toFile)
      ()
    }))
    for ((t, sh) <- strides) {
      val base = Queries.rd(spark, sfDir, t)
      // the within-copy join invariant REQUIRES every stride to exceed
      // its key's actual range — a larger SF silently violating it
      // would multiply cross-copy join matches (the exact corruption
      // the header warns about) and report a wrong curve; fail loudly
      val maxAggs = sh.keys.toSeq.map(c => max(col(c).cast("long")).as(c))
      val maxes = base.agg(maxAggs.head, maxAggs.tail: _*).collect().head
      sh.keys.toSeq.zipWithIndex.foreach { case (c, i) =>
        require(maxes.getLong(i) < sh(c),
          s"$t.$c max ${maxes.getLong(i)} >= stride ${sh(c)} — raise the " +
            "stride for this corpus or copies will share key ranges")
      }
      val scaled = (0 until factor).map { i =>
        sh.foldLeft(base) { case (df, (c, stride)) =>
          df.withColumn(c, col(c) + lit(i.toLong * stride))
        }
      }.reduce(_ unionAll _)
      scaled.write.parquet(s"$tmp/$t.parquet")
    }
    // shared dims: re-materialized once so every table reads from the
    // same storage tier as the scaled facts
    for (t <- Seq("nation", "region"))
      Queries.rd(spark, sfDir, t).write.parquet(s"$tmp/$t.parquet")
    val rows = spark.read.parquet(s"$tmp/lineitem.parquet").count()
    println(s"corpus: lineitem=$rows (factor $factor)")

    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val results = Tpch.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      spark.catalog.clearCache()
      System.gc()
      val w0 = meter.writeBytes.get; val r0 = meter.readBytes.get
      val t0 = System.nanoTime()
      val n = fn(spark, tmp.toString).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // settle the async listener bus before sampling (Soak discipline)
      var last = -1L; var stable = 0
      val deadline = System.currentTimeMillis() + 30000L
      while (stable < 3 && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        val now = meter.writeBytes.get + meter.readBytes.get
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      val wMB = (meter.writeBytes.get - w0) / 1e6
      val rMB = (meter.readBytes.get - r0) / 1e6
      println(f"$name: sec=$sec%.2f rows=$n shuffle_write_mb=$wMB%.1f " +
        f"shuffle_read_mb=$rMB%.1f")
      (name, sec, n, wMB, rMB)
    }
    val json = results.map { case (name, sec, n, w, r) =>
      s"""{"q":"$name","sec":${f"$sec%.2f"},"rows":$n,""" +
        s""""shuffle_write_mb":${f"$w%.1f"},"shuffle_read_mb":${f"$r%.1f"}}"""
    }.mkString("[", ",", "]")
    println(s"""{"tpch_soak":{"sf":"$sfDir","factor":$factor,"queries":$json}}""")
    spark.stop()
  }
}
