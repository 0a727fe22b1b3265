package graft.oracle

import graft.model.ChangeEvent

/**
 * In-memory reference reducer (FIXTURES.md §1): the trusted, test-only oracle
 * the distributed engine must match. Plain Scala fold — group by
 * (conv_id, turn_idx), keep the event with max (ts, lsn); if the winner is a
 * delete the key is absent from the final state.
 *
 * Mirrors the monotone-replay safety rule of the reference's CDC reader
 * (skipCount/TRIM_HORIZON replay, reference: otsstreamreader/.../core/
 * RecordProcessor.java:206-228): re-delivered or out-of-order events never
 * override a newer (ts, lsn) winner.
 */
object OracleReducer {

  private def newer(a: ChangeEvent, b: ChangeEvent): Boolean = {
    val c = a.ts.compareTo(b.ts)
    if (c != 0) c > 0 else a.lsn > b.lsn
  }

  /** Final state, sorted by (conv_id, turn_idx). */
  def reduce(events: Seq[ChangeEvent]): Seq[ChangeEvent] =
    events
      .groupBy(e => (e.conv_id, e.turn_idx))
      .map { case (_, es) => es.reduce((a, b) => if (newer(a, b)) a else b) }
      .filter(_.op != "D")
      .toSeq
      .sortBy(e => (e.conv_id, e.turn_idx))
}
