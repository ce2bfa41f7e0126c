package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming aggregation beyond the reference's file-arrival
  * micro-batches: watermarked tumbling-window aggregates and a stateful
  * sessionizer via `flatMapGroupsWithState` — the Structured Streaming
  * surface a telemetry pipeline needs once inputs become true streams
  * rather than dropped files.
  */
object EventAggregator {

  /** Watermarked tumbling-window counts/means per (window, Event). Late
    * rows beyond `watermark` are dropped; output is append-mode ready. */
  def windowedMetrics(events: DataFrame, window_ : String = "1 minute",
                      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("Timestamp", watermark)
      .groupBy(window(col("Timestamp"), window_), col("Event"))
      .agg(count(lit(1)).as("n"), avg(col("Value")).as("avg_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("Event"), col("n"), col("avg_value"))

  /** Watermarked streaming exact dedup — ingest-time deduplication for a
    * training-data stream, keyed on e.g. a content hash: a row whose keys
    * were already seen within the watermark horizon is dropped.
    * `dropDuplicatesWithinWatermark` bounds the dedup state by the
    * watermark (plain `dropDuplicates` on a stream grows state forever);
    * the tradeoff is that a duplicate arriving after its original's state
    * expired is re-emitted — at 100 TB/day unbounded state is the bigger
    * hazard, and downstream batch dedup catches stragglers. */
  def dedupStream(events: DataFrame, watermarkCol: String, delay: String,
                  keys: Seq[String]): DataFrame =
    events.withWatermark(watermarkCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-static interval enrichment — the reference's step-1 (landing
    * stream) → step-2 (accounting join) seam as ONE continuous flow: each
    * micro-batch of the metric stream joins the static accounting table by
    * jid equality + `[start, end)` containment, exactly
    * [[graft.operators.IntervalJoin]]'s batch semantics (it IS the same
    * operator — stream-static inner joins are stateless, so the batch plan
    * applies per micro-batch with no state store and no watermark;
    * EventAggregatorSpec pins streaming ≡ batch on the same rows). With
    * the broadcast default every micro-batch probes the accounting build
    * side map-side: the metric stream itself never shuffles, which is the
    * posture that survives a 100 TB/day stream. Compose with
    * [[Compactor]]'s landing-dir source for the continuous flavor of the
    * reference's file-dropping step-1 → step-2 handoff. */
  def enrichWithAccounting(metricStream: DataFrame, accounting: DataFrame,
                           broadcastAccounting: Boolean = true): DataFrame =
    graft.operators.IntervalJoin(metricStream, accounting, broadcastAccounting)

  case class HostEvent(host: String, ts: java.sql.Timestamp, value: Double)
  case class HostSession(host: String, nEvents: Long, first: java.sql.Timestamp,
                         last: java.sql.Timestamp, meanValue: Double)
  /** Internal session accumulator (public: the state Encoder's generated
    * code constructs it reflectively from another package). */
  case class SessionState(n: Long, sum: Double,
                          first: java.sql.Timestamp, last: java.sql.Timestamp)

  /** Stateful sessionization: one open session per host, closed (emitted)
    * once the event-time watermark passes the session's last event +
    * `gapMs` — the custom-state shape (`flatMapGroupsWithState`) a pipeline
    * uses when windows can't express the semantics. Event-time timeouts
    * keep the operator deterministic and replayable (processing-time
    * timeouts would tie session boundaries to wall clock). Input must
    * carry a watermark on `ts`. */
  def sessionize(events: Dataset[HostEvent], gapMs: Long,
                 watermarkDelay: String = "0 seconds"): Dataset[HostSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.host)
      .flatMapGroupsWithState[SessionState, HostSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (host: String, rows: Iterator[HostEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(HostSession(host, s.n, s.first, s.last, s.sum / s.n))
          } else {
            // drop events below the watermark: Spark does NOT pre-filter
            // late rows for flatMapGroupsWithState, and merging a straggler
            // older than the open session would make replay diverge from
            // live arrival. Within the watermark, determinism holds.
            val wm = state.getCurrentWatermarkMs()
            // materializes one (host, micro-batch) group to sort it — bounded
            // by per-host per-trigger volume, not the stream. A pathological
            // hot host could make this buffer large; cap exposure upstream
            // with trigger sizing (maxFilesPerTrigger / maxOffsetsPerTrigger)
            // or pre-aggregate per (host, second) before sessionizing.
            val sorted = rows.toSeq.filter(_.ts.getTime >= wm).sortBy(_.ts.getTime)
            if (sorted.isEmpty) Iterator.empty
            else {
              // fold events in time order, CLOSING the open session whenever
              // the gap is exceeded inside the batch — a replayed backlog
              // must yield the same sessions as live arrival
              var closed = List.empty[HostSession]
              var open = state.getOption
              sorted.foreach { e =>
                open match {
                  case Some(s) if e.ts.getTime - s.last.getTime > gapMs =>
                    closed ::= HostSession(host, s.n, s.first, s.last, s.sum / s.n)
                    open = Some(SessionState(1L, e.value, e.ts, e.ts))
                  case Some(s) =>
                    open = Some(SessionState(s.n + 1, s.sum + e.value,
                      if (e.ts.before(s.first)) e.ts else s.first,
                      if (e.ts.after(s.last)) e.ts else s.last))
                  case None =>
                    open = Some(SessionState(1L, e.value, e.ts, e.ts))
                }
              }
              val next = open.get
              state.update(next)
              // a late straggler can put last+gap behind the watermark,
              // which setTimeoutTimestamp rejects — clamp just past it
              state.setTimeoutTimestamp(
                math.max(next.last.getTime + gapMs, state.getCurrentWatermarkMs() + 1))
              closed.reverseIterator
            }
          }
      }
  }
}
