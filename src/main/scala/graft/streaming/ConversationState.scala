package graft.streaming

import graft.model.ChangeEvent
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Custom streaming state over the change stream: per-conversation running
 * aggregates maintained with `flatMapGroupsWithState` — the
 * KeyValueGroupedDataset state surface the engine uses where windowed
 * aggregation can't express the semantics (arbitrary per-key state machines).
 *
 * Reference analogue: the per-shard checkpointed processing state of the CDC
 * reader (reference: otsstreamreader/.../core/RecordProcessor.java:115-126 —
 * per-shard skipCount/iterator state carried across batches); here the state
 * key is the conversation and the state survives in the streaming state
 * store across micro-batches (spilled/checkpointed by Spark, sized by key
 * cardinality not event count — 10^8 conversations is state-store routine).
 *
 * Emits one update row per conversation per micro-batch in which it saw
 * events: cumulative event count, max LSN (the per-key replication
 * watermark), last event time, and the count of LSN regressions observed
 * (out-of-order deliveries — a data-quality signal the flat windowed aggs
 * cannot produce because it depends on arrival order relative to state).
 */
object ConversationState {

  final case class ConvState(events: Long, maxLsn: Long, lastTsMicros: Long,
      regressions: Long)

  final case class ConvUpdate(conv_id: String, events: Long, max_lsn: Long,
      last_ts_micros: Long, lsn_regressions: Long)

  /** Track per-conversation state on a STREAMING Dataset[ChangeEvent]; use
    * with `writeStream.outputMode("update")`. */
  def track(events: Dataset[ChangeEvent]): Dataset[ConvUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvState, ConvUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (convId: String, it: Iterator[ChangeEvent], state: GroupState[ConvState]) =>
          var s = state.getOption.getOrElse(ConvState(0L, -1L, Long.MinValue, 0L))
          var saw = false
          it.foreach { e =>
            saw = true
            // full microsecond precision: getTime carries only millis; the
            // Timestamp's nanos field holds the sub-second component
            val micros = Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
            s = ConvState(
              events = s.events + 1,
              maxLsn = math.max(s.maxLsn, e.lsn),
              lastTsMicros = math.max(s.lastTsMicros, micros),
              regressions = s.regressions + (if (e.lsn < s.maxLsn) 1 else 0))
          }
          if (saw) {
            state.update(s)
            Iterator(ConvUpdate(convId, s.events, s.maxLsn, s.lastTsMicros, s.regressions))
          } else Iterator.empty
      }
  }
}
