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
    * `ts` as raw nanos (TIMESTAMP(NANOS) files read as long — the
    * encoding the CURRENT corpus ships). A stream opened on an empty
    * dir that will be fed TIMESTAMP_NTZ files instead must pass its own
    * schema: the streaming engine pins the schema at open, and a
    * type-mismatched file fails the micro-batch loudly (never a silent
    * 1000× ts_ms skew — the dispatch below is per-TYPE). */
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
    * user.
    *
    * Ordering contract: events are sorted WITHIN each trigger, and an
    * event arriving in a LATER trigger with an older timestamp joins the
    * already-open session (counted, never advancing — or rewinding —
    * the session clock). The clock is monotone: a late straggler must
    * not drag `lastTsMs` backwards, or the next in-order event would
    * measure its gap against the straggler and open a phantom session
    * the batch twin (which sorts globally) never sees.
    *
    * State bound: state is one small record per user EVER seen —
    * unbounded on an open-ended key space. Pass `evictAfter` (e.g.
    * "2 hours", several times the session gap) to evict idle users
    * with a final totals emission; a user reappearing after eviction
    * starts fresh totals, and consumers that need lifetime totals
    * aggregate the emissions downstream. Eviction uses
    * ProcessingTimeTimeout, which makes the stateful operator request
    * another micro-batch unconditionally (to fire timeouts) — pair it
    * with a real trigger interval in production. Do NOT drive an
    * evicting query with Trigger.AvailableNow (it never terminates:
    * the pending-timer batches count as work) or processAllAvailable
    * (busy-loops); the default (no eviction) keeps those drives
    * (tests, backfills) working. */
  def sessionize(
      events: Dataset[Event],
      evictAfter: Option[String] = None): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    val timeoutKind = evictAfter
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout)
      .getOrElse(GroupStateTimeout.NoTimeout)
    events.groupByKey(_.user_id)
      .mapGroupsWithState(timeoutKind) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            UserSessions(userId, st.nSessions, st.nEvents)
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts_ms, e.event_id))
            var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
            sorted.foreach { e =>
              if (st.lastTsMs == Long.MinValue || e.ts_ms >= st.lastTsMs) {
                val newSession = st.lastTsMs == Long.MinValue ||
                  e.ts_ms - st.lastTsMs > 1800000L
                st = SessionState(e.ts_ms,
                  st.nSessions + (if (newSession) 1 else 0), st.nEvents + 1)
              } else {
                // late arrival: joins the open session; clock stays put
                st = st.copy(nEvents = st.nEvents + 1)
              }
            }
            state.update(st)
            evictAfter.foreach(state.setTimeoutDuration)
            UserSessions(userId, st.nSessions, st.nEvents)
          }
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
    // stop even when a micro-batch fails: a dangling query keeps the
    // memory-sink name registered and wedges the next run under it
    try q.processAllAvailable() finally q.stop()
  }
}
