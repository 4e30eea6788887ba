package graft.streaming

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Streaming results must agree with their batch equivalents on the same
  * input (the one-batch case of the incremental plan). */
class EventStreamsSpec extends SparkSuite {

  // stage the sf0.001 events parquet into a stream-source directory
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("evstream").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/events.parquet")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("ts_ms is session-timezone independent (NTZ branch has no zone cast)") {
    // a non-UTC caller outside Bench/Verify must get the same epoch ms —
    // the old `unix_millis(cast(ts as timestamp))` NTZ arm shifted by the
    // session offset and silently diverged from the DuckDB oracle
    val utc = graft.Queries.events(spark, sf)
      .select("event_id", "ts_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
      val seoul = graft.Queries.events(spark, sf)
        .select("event_id", "ts_ms").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(seoul == utc)
      assert(utc.nonEmpty)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("windowed aggregation matches the batch computation") {
    val stream = EventStreams.read(spark, streamDir)
    EventStreams.runToMemory(
      EventStreams.hourlyByType(stream), "hourly", outputMode = "complete")
    val got = spark.table("hourly")
      .select("event_type", "hour_ms", "n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val want = Queries.batchHourly(spark, streamDir)
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("state carries across triggers: two-batch arrival equals one-batch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evstream2").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val all = spark.read.parquet(s"$sf/events.parquet")
    // the file stream source lists top-level files only — stage each
    // batch's part files flat into the source dir
    def stage(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val tmp = Files.createTempDirectory("evbatch").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      import scala.jdk.CollectionConverters._
      Files.list(java.nio.file.Paths.get(tmp)).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .foreach(p => Files.move(p,
          java.nio.file.Paths.get(dir, s"$tag-${p.getFileName}")))
    }
    // batch 1: first half by event_id
    stage(all.filter(col("event_id") < 500), "b1")

    val stream = EventStreams.read(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts_ms"))
      .as[EventStreams.Event]
    val q = EventStreams.sessionize(stream).writeStream
      .outputMode("update").format("memory").queryName("sessions2").start()
    q.processAllAvailable()
    // batch 2 arrives while the query runs
    stage(all.filter(col("event_id") >= 500), "b2")
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions2")
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.Queries.qSessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == want)
  }

  test("a late cross-trigger straggler never rewinds the session clock") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evlate").toString
    def stage(events: Seq[(Long, Long, Long)], tag: String): Unit = {
      val tmp = Files.createTempDirectory("evlateb").toString
      events.toDF("event_id", "user_id", "ts_ms")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      import scala.jdk.CollectionConverters._
      Files.list(java.nio.file.Paths.get(tmp)).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .foreach(p => Files.move(p,
          java.nio.file.Paths.get(dir, s"$tag-${p.getFileName}")))
    }
    // trigger 1: t=1000s. trigger 2: a straggler at t=10s — it must
    // JOIN the open session without dragging lastTs back, or trigger
    // 3's t=1900s (a 900 s real gap) would read as a 1890 s gap and
    // open a phantom second session the batch twin never sees.
    stage(Seq((1L, 7L, 1000000L)), "b1")
    val stream = spark.readStream
      .schema("event_id BIGINT, user_id BIGINT, ts_ms BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .as[EventStreams.Event]
    val q = EventStreams.sessionize(stream).writeStream
      .outputMode("update").format("memory").queryName("late_sessions").start()
    q.processAllAvailable()
    stage(Seq((2L, 7L, 10000L)), "b2")
    q.processAllAvailable()
    stage(Seq((3L, 7L, 1900000L)), "b3")
    q.processAllAvailable()
    q.stop()
    val last = spark.table("late_sessions")
      .groupBy("user_id")
      .agg(max("n_sessions").as("ns"), max("n_events").as("ne"))
      .collect().head
    assert(last.getLong(1) == 1L, s"phantom session: $last")
    assert(last.getLong(2) == 3L, s"straggler dropped: $last")
  }

  test("streaming dedup drops within-horizon duplicates, first arrival wins") {
    val dir = Files.createTempDirectory("evdedup").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val all = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_id") < 200)
    // duplicate every event: the staged source carries each event twice
    all.write.mode("overwrite").parquet(dir)
    all.write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() == 400)

    val stream = EventStreams.read(spark, dir)
    EventStreams.runToMemory(
      EventStreams.dedupStream(stream).select("event_id"), "deduped")
    val ids = spark.table("deduped").collect().map(_.getLong(0))
    assert(ids.length == 200) // each id exactly once
    assert(ids.toSet == (0L until 200L).toSet)
  }

  test("stateful sessionization matches the batch window computation") {
    import spark.implicits._
    val stream = EventStreams.read(spark, streamDir)
      .select(col("event_id"), col("user_id"), col("ts_ms"))
      .as[EventStreams.Event]
    val out = EventStreams.sessionize(stream)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("sessions").start()
    q.processAllAvailable()
    q.stop()
    // one input batch -> last update per user is the final total
    val got = spark.table("sessions")
      .groupBy("user_id")
      .agg(max("n_sessions").as("n_sessions"), max("n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val want = graft.Queries.qSessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("evictAfter bounds state across many triggers; totals stay exact (r13)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evevict").toString
    def stage(events: Seq[(Long, Long, Long)], tag: String): Unit = {
      val tmp = Files.createTempDirectory("evevictb").toString
      events.toDF("event_id", "user_id", "ts_ms")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      import scala.jdk.CollectionConverters._
      Files.list(java.nio.file.Paths.get(tmp)).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .foreach(p => Files.move(p,
          java.nio.file.Paths.get(dir, s"$tag-${p.getFileName}")))
    }
    // one short-lived CONTINUOUS-trigger query per epoch over a SHARED
    // checkpoint. ProcessingTimeTimeout makes the stateful operator
    // request a batch unconditionally (FlatMapGroupsWithStateExec.
    // shouldRunAnotherBatch is `true` for that timeout kind), so a
    // Trigger.AvailableNow drive NEVER terminates and a
    // processAllAvailable drive busy-loops — the production cadence is
    // a real trigger interval, sampled until the epoch's state drains.
    // Each epoch's query is stopped and restarted, which ALSO exercises
    // state + timer persistence across restarts.
    val triggers = 20
    val cohort = 5 // users per epoch; each user lives in EXACTLY one
    val perUser = 4 // events per user, 1 s apart — one session each
    val ckpt = Files.createTempDirectory("evevict_ck").toString
    // foreachBatch, not the memory sink: the memory sink cannot recover
    // from a checkpoint, and each epoch here IS a checkpoint recovery
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]
    var maxState = 0L
    (0 until triggers).foreach { t =>
      stage(cohortEvents(t, cohort, perUser), s"t$t")
      val stream = spark.readStream
        .schema("event_id BIGINT, user_id BIGINT, ts_ms BIGINT")
        .parquet(dir)
        .as[EventStreams.Event]
      val q = EventStreams.sessionize(stream,
        evictAfter = Some("300 milliseconds"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(
          "50 milliseconds"))
        .foreachBatch { (df: org.apache.spark.sql.Dataset[EventStreams.UserSessions], _: Long) =>
          df.collect().foreach(u =>
            emitted.add((u.user_id, u.n_sessions, u.n_events)))
        }.start()
      // run until the epoch's state drains to zero: the cohort's data
      // batch arms 5 timers, the 300 ms eviction fires them, numRows
      // returns to 0 — the bounded-store property, observed directly
      val deadline = System.currentTimeMillis() + 60000L
      var drained = false
      var epochMax = 0L
      while (!drained && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty) {
          val rows = p.stateOperators.head.numRowsTotal
          epochMax = math.max(epochMax, rows)
          maxState = math.max(maxState, rows)
          // drained only after the epoch's data was seen (epochMax
          // moved past zero) and the evictions emptied the store
          drained = rows == 0 && epochMax > 0
        }
      }
      q.stop()
      assert(drained, s"epoch $t: state never drained (max $epochMax)")
    }
    // 100 distinct users flowed through; live state never held more
    // than the in-flight cohort (+ stragglers caught pre-eviction)
    assert(maxState > 0 && maxState <= 4L * cohort,
      s"state rows reached $maxState for ${triggers * cohort} users — " +
        "eviction is not bounding the store")
    // totals exact for EVERY user despite eviction: one session,
    // perUser events — the final (possibly timeout-emitted) row wins
    import scala.jdk.CollectionConverters._
    val got = emitted.asScala.toSeq.groupBy(_._1).map { case (u, rows) =>
      (u, rows.map(_._2).max, rows.map(_._3).max)
    }.toSeq
    assert(got.size == triggers * cohort)
    assert(got.forall { case (_, ns, ne) => ns == 1L && ne == perUser.toLong },
      s"bad totals: ${got.filterNot { case (_, ns, ne) => ns == 1L && ne == perUser.toLong }.take(5).mkString(",")}")
  }

  /** Trigger t's cohort: users t*1000+u, each with `perUser` events 1 s
    * apart starting at a per-trigger epoch — every user's events form
    * exactly one session and arrive within one trigger. */
  private def cohortEvents(
      t: Int, cohort: Int, perUser: Int): Seq[(Long, Long, Long)] =
    for {
      u <- 0 until cohort
      i <- 0 until perUser
    } yield (
      (t.toLong * 100000L) + u * 100L + i,
      t.toLong * 1000L + u,
      1000000000L + t * 3600000L + i * 1000L)
}

private object Queries {
  /** Batch twin of hourlyByType over the staged copy — the SAME
    * [[graft.Queries.tsMsExpr]] dispatch the stream reader uses. */
  def batchHourly(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val raw = s.read.parquet(dir)
    raw
      .withColumn("ts_ms", graft.Queries.tsMsExpr(raw.schema("ts").dataType))
      .groupBy(col("event_type"),
        (col("ts_ms") - (col("ts_ms") % 3600000L)).as("hour_ms"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
  }
}
