package graft.cdc

import graft.table.SnapTable
import org.apache.spark.sql.SparkSession

/**
 * Incremental table-to-table replication — the engine's rebuild of the
 * reference's core job shape (move data from system A to system B,
 * reference: core/src/main/java/com/alibaba/datax/core/Engine.java job flow,
 * reader -> writer), except CHANGE-BASED instead of full-copy: the source
 * snapshot table acts as a CDC source via `readChangesSince`, and the
 * destination's own manifest lsn statistics ARE the consumer watermark, so
 * sync needs no side-channel state at all.
 *
 * Properties that matter at 10^10-event scale:
 *  - per sync round, IO is O(changed files) on the source (footer-stats
 *    pruning skips every file entirely below the watermark) and O(touched
 *    buckets) on the destination (the normal MERGE path);
 *  - restart-safe with no extra bookkeeping: the watermark is derived from
 *    the destination's committed manifest, and the destination's atomic
 *    epoch commit makes a replayed round idempotent;
 *  - a no-change round is metadata-only (two manifest reads, no scan, no
 *    empty commit);
 *  - deletes propagate (tombstones are retained change states and flow
 *    through the merge as ordinary LWW losers/winners);
 *  - schema evolution propagates (the destination merge aligns schemas the
 *    same way ingest does).
 */
object Sync {

  final case class SyncResult(fromLsn: Long, toLsn: Long, rowsApplied: Long,
      result: String)

  /**
   * Apply to `dest` every change state `source` holds beyond what `dest`
   * has already applied. Returns the watermark movement and rows applied;
   * `result` = "committed" | "no_change".
   */
  def sync(spark: SparkSession, source: SnapTable, dest: SnapTable,
      opts: PipelineOptions = PipelineOptions()): SyncResult = {
    val from = dest.maxAppliedLsn(spark)
    requireAboveTombstoneHorizon(source, from)
    val srcHigh = source.maxAppliedLsn(spark)
    if (srcHigh <= from) return SyncResult(from, from, 0L, "no_change")
    val changes = source.readChangesSince(spark, from)
    val rec = CdcPipeline.applyBatch(dest, changes, dest.committedEpoch + 1, opts)
    SyncResult(from, srcHigh, rec.rowsApplied, rec.result)
  }

  final case class JdbcSyncResult(fromLsn: Long, toLsn: Long, upserts: Long,
      deletes: Long, result: String)

  /**
   * Incremental lake→RDBMS fan-out: apply the source table's change states
   * beyond the stored watermark to a JDBC serving table — the reference's
   * core reader→rdbms-writer job (reference: plugin-rdbms-util/.../writer/
   * CommonRdbmsWriter.java startWrite flow), made change-based. The resume
   * watermark lives IN the target database (`stateTable`), so target rows
   * and their watermark share one consistency domain; it advances only
   * AFTER the change apply completes, and because [[graft.sources.
   * JdbcWrite.applyChanges]] is idempotent (delete+insert of per-key
   * states), a crash between apply and advance replays harmlessly:
   * at-least-once delivery, exactly-once effect. Per round, source IO is
   * O(changed files) via footer-stat pruning; rows shipped are the LWW
   * reduction of the changes (late extra states of one key collapse before
   * they reach the database).
   */
  def toJdbc(spark: SparkSession, source: SnapTable,
      connect: () => java.sql.Connection, targetTable: String,
      stateTable: String = "graft_sync_state",
      batchSize: Int = 1024): JdbcSyncResult = {
    val from = withConn(connect) { c =>
      ensureStateTable(c, stateTable)
      ensureTargetTable(c, targetTable,
        org.apache.spark.sql.types.StructType(
          source.snapshot().schema.fields.filterNot(_.name == "op")),
        graft.model.Schemas.mergeKeys)
      readWatermark(c, stateTable, targetTable)
    }
    requireAboveTombstoneHorizon(source, from)
    val srcHigh = source.maxAppliedLsn(spark)
    if (srcHigh <= from) return JdbcSyncResult(from, from, 0L, 0L, "no_change")
    // one state per key: a key changed twice since the watermark must reach
    // the target once, as its latest state
    val states = Dedup.lww(source.readChangesSince(spark, from))
    val (ups, dels) = graft.sources.JdbcWrite.applyChanges(
      states, connect, targetTable, graft.model.Schemas.mergeKeys,
      batchSize = batchSize)
    withConn(connect)(writeWatermark(_, stateTable, targetTable, srcHigh))
    JdbcSyncResult(from, srcHigh, ups, dels, "committed")
  }

  /** Fail fast when a resuming consumer's watermark has been OUTRUN by
    * tombstone expiry on the source (RetentionPolicy.tombstoneLsnLag): the
    * deletes between `from` and the horizon are physically gone, so resuming
    * would silently keep deleted rows in the target forever. A fresh
    * consumer (`from < 0`) is safe — it reads full current state, in which
    * expired-delete keys are simply absent. Recovery is a full resync:
    * empty the target (and its watermark row) and run the sync again. */
  private def requireAboveTombstoneHorizon(source: SnapTable, from: Long): Unit = {
    val horizon = source.tombstoneHorizonLsn
    if (from >= 0 && from < horizon - 1)
      throw new IllegalStateException(
        s"consumer watermark $from is below the source's tombstone-expiry " +
          s"horizon $horizon: deletes in ($from, $horizon) may be physically " +
          "gone. Full-resync the target (truncate it and delete its watermark " +
          "row), or size RetentionPolicy.tombstoneLsnLag above the maximum " +
          "consumer staleness.")
  }

  private def withConn[A](connect: () => java.sql.Connection)
      (f: java.sql.Connection => A): A = {
    val c = connect()
    try f(c) finally c.close()
  }

  /** Bootstrap convenience: create the serving table from the source
    * schema (merge keys as PRIMARY KEY) when it doesn't exist, with an
    * ANSI-ish type mapping (verified on Derby; production targets with
    * dialect-specific types should pre-create the table — the sync then
    * binds by column name and never alters it). */
  private def ensureTargetTable(c: java.sql.Connection, table: String,
      schema: org.apache.spark.sql.types.StructType, keyCols: Seq[String]): Unit = {
    import org.apache.spark.sql.types._
    try { c.createStatement().executeQuery(s"SELECT 1 FROM $table WHERE 1=0"); return }
    catch { case _: java.sql.SQLException => () } // missing -> create below
    def sqlType(dt: DataType): String = dt match {
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case DoubleType => "DOUBLE"
      case FloatType => "REAL"
      case ShortType | ByteType => "SMALLINT"
      case BooleanType => "BOOLEAN"
      case TimestampType => "TIMESTAMP"
      case DateType => "DATE"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case BinaryType => "BLOB"
      case _ => "VARCHAR(32672)" // Derby's max; transcripts are text-heavy
    }
    val cols = schema.fields.map { f =>
      val nn = if (keyCols.contains(f.name)) " NOT NULL" else ""
      s"${f.name} ${sqlType(f.dataType)}$nn"
    }
    c.createStatement().execute(
      s"CREATE TABLE $table (${cols.mkString(", ")}, " +
        s"PRIMARY KEY (${keyCols.mkString(", ")}))")
  }

  private def ensureStateTable(c: java.sql.Connection, stateTable: String): Unit =
    try c.createStatement().execute(
      s"CREATE TABLE $stateTable (tgt VARCHAR(128) PRIMARY KEY, lsn BIGINT)")
    catch { case _: java.sql.SQLException => () } // already exists

  private def readWatermark(c: java.sql.Connection, stateTable: String,
      target: String): Long = {
    val st = c.prepareStatement(s"SELECT lsn FROM $stateTable WHERE tgt = ?")
    st.setString(1, target)
    val rs = st.executeQuery()
    if (rs.next()) rs.getLong(1) else -1L
  }

  private def writeWatermark(c: java.sql.Connection, stateTable: String,
      target: String, lsn: Long): Unit = {
    val up = c.prepareStatement(s"UPDATE $stateTable SET lsn = ? WHERE tgt = ?")
    up.setLong(1, lsn); up.setString(2, target)
    if (up.executeUpdate() == 0) {
      val ins = c.prepareStatement(s"INSERT INTO $stateTable (tgt, lsn) VALUES (?, ?)")
      ins.setString(1, target); ins.setLong(2, lsn)
      ins.executeUpdate()
    }
  }
}
