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

  /** Streaming exact dedup with custom state: per key, emit each
    * event id once across all micro-batches
    * (flatMapGroupsWithState — the KeyValueGroupedDataset custom-state
    * surface). At scale, state lives in the state store partitioned by
    * key; a production variant would add a timeout to bound state.
    */
  def streamingDedup(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("event_id").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, Long)], state: GroupState[Array[Long]]) =>
          val seen = scala.collection.mutable.LinkedHashSet(
            state.getOption.getOrElse(Array.empty[Long]).toSeq: _*)
          val out = rows.filter { case (_, eid) => seen.add(eid) }.toVector
          state.update(seen.toArray)
          out.iterator
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
