package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` stream table.
  *
  * The reference has no streaming queries (SURVEY §2.3 "explicitly
  * absent") — this module is the Spark-first extension for the continuous
  * half of a training-data pipeline: the same windowed aggregations and
  * sessionization the batch queries compute, expressed as incremental
  * plans with watermark-bounded state. State size is bounded by
  * (watermark horizon × key cardinality), independent of total stream
  * length — the property that matters when the stream is unbounded.
  */
object EventStreams {

  /** Fallback schema when the source dir is still empty at stream open:
    * `ts` as raw nanos (TIMESTAMP(NANOS) files read as long). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open a file-based event stream: one new parquet file per trigger.
    * Streaming needs the schema up front, and the generator has shipped
    * `ts` as both TIMESTAMP(NANOS)→long and TIMESTAMP(_NTZ) across
    * refreshes — infer from files already present, fall back to
    * [[rawSchema]] for a dir that starts empty. `ts_ms` is exact integer
    * epoch-ms either way — the shared [[graft.Queries.tsMsExpr]]
    * dispatch, zone-independent in every branch. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = scala.util.Try(spark.read.parquet(dir).schema).toOption
      .filter(_.fieldNames.contains("ts")).getOrElse(rawSchema)
    spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts_ms", graft.Queries.tsMsExpr(schema("ts").dataType))
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
  }

  /** Tumbling-window counts/sums per event type with a 10-minute
    * watermark: the incremental form of the batch q_events_hourly. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(unix_millis(col("window.start")).as("hour_ms"),
        col("event_type"), col("n"), col("sum_value"))

  final case class Event(event_id: Long, user_id: Long, ts_ms: Long)
  final case class SessionState(lastTsMs: Long, nSessions: Long, nEvents: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Stateful sessionization with mapGroupsWithState: the incremental form
    * of the batch q_sessionize (30-minute gap splits a session). Emits the
    * running per-user totals each trigger; state is one small record per
    * user. */
  def sessionize(events: Dataset[Event]): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts_ms, e.event_id))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val newSession = st.lastTsMs == Long.MinValue ||
              e.ts_ms - st.lastTsMs > 1800000L
            st = SessionState(e.ts_ms,
              st.nSessions + (if (newSession) 1 else 0), st.nEvents + 1)
          }
          state.update(st)
          UserSessions(userId, st.nSessions, st.nEvents)
      }
  }

  /** Streaming exact dedup — the incremental twin of `Dedup.exact`: the
    * FIRST arrival of each key passes, later duplicates are dropped.
    * `dropDuplicatesWithinWatermark` bounds state to the watermark
    * horizon × arrival rate (keys older than the horizon are evicted),
    * so an unbounded stream never grows unbounded state — the property
    * a plain `dropDuplicates` on a stream lacks. */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String] = Seq("event_id"),
      horizon: String = "10 minutes"): DataFrame =
    events
      .withWatermark("event_time", horizon)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Drive a stream to a named in-memory sink and wait for all input —
    * the local test/demo harness (complete mode for aggregations). */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "append"): Unit = {
    val q = df.writeStream.outputMode(outputMode)
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }
}
