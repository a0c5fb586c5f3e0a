package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming wiring for the engine's time-window operators.
  *
  * The batch keys win_tumbling / win_sliding / win_session
  * (graft.ops.QueriesWindows) use exactly these transforms; under
  * `readStream` the same logical plan runs incrementally with
  * watermark-driven state eviction. That symmetry — one definition,
  * batch-verified by the DuckDB oracle, stream-executed with state —
  * is the Spark-native design (there is no streaming surface in the
  * reference; SURVEY.md §2B "Streaming" documents these as [X] keys).
  */
object StreamingOps {

  /** Tumbling-window aggregate with late-data watermark. Works on a
    * batch OR streaming DataFrame with (ts: timestamp, value: double).
    */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark)
              else events
    src.groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("n_events"), col("sum_value"))
  }

  /** Sliding-window aggregate (1h window every 15m by default). */
  def slidingCounts(events: DataFrame, windowLen: String = "1 hour",
                    slide: String = "15 minutes",
                    watermark: String = "10 minutes"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark)
              else events
    src.groupBy(window(col("ts"), windowLen, slide))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("n_events"))
  }

  /** Streaming exact dedup with custom state and BOUNDED retention
    * (flatMapGroupsWithState — the KeyValueGroupedDataset custom-state
    * surface): per user, emit each event id once while the group's
    * state is alive; an EVENT-TIME TIMEOUT evicts the whole id set
    * once the watermark passes the group's last activity plus
    * `retentionMs`. That is the standard bounded-state dedup contract
    * (same as `dropDuplicatesWithinWatermark`): exact within the
    * retention horizon, state size O(active keys × ids per horizon)
    * instead of O(all ids ever) — the difference between a state store
    * that survives a year of stream and one that eats the cluster.
    */
  def streamingDedup(events: DataFrame, watermark: String = "10 minutes",
                     retentionMs: Long = 30L * 60 * 1000): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val src = if (events.isStreaming) events.withWatermark("ts", watermark)
              else events
    // ts must pass through UNTOUCHED: casting it would mint a new
    // column without the watermark tag and fail the event-time-timeout
    // analysis check
    src.select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[Array[Long]]) =>
          if (state.hasTimedOut) {
            state.remove() // watermark passed last activity + retention
            Iterator.empty
          } else {
            val seen = scala.collection.mutable.LinkedHashSet(
              state.getOption.getOrElse(Array.empty[Long]).toSeq: _*)
            var maxTs = Long.MinValue
            val out = rows.filter { case (_, eid, t) =>
              maxTs = math.max(maxTs, t.getTime)
              seen.add(eid)
            }.toVector
            state.update(seen.toArray)
            // must stay above the current watermark or Spark rejects it
            state.setTimeoutTimestamp(
              math.max(maxTs + retentionMs, state.getCurrentWatermarkMs() + 1))
            out.iterator.map { case (u, e, _) => (u, e) }
          }
      }
      .toDF("user_id", "event_id")
  }

  /** Session windows per key with a gap timeout. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark)
              else events
    src.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("sess_start"),
        col("n_events"))
  }
}
