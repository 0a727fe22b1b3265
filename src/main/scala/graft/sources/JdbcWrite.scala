package graft.sources

import org.apache.spark.sql.{DataFrame, Row}

import java.sql.{Connection, PreparedStatement, SQLException}

/**
 * JDBC sink parity: writeMode templates, batched PreparedStatement writes
 * with transaction-per-batch and row-by-row dirty replay on batch failure —
 * the reference's CommonRdbmsWriter behavior (reference:
 * plugin-rdbms-util/.../writer/CommonRdbmsWriter.java:262-398; writeMode
 * template builder WriterUtil.java:111-168), rebuilt for `foreachPartition`.
 *
 * Scale shape: one connection + one prepared statement per Spark partition,
 * `batchSize` rows per executeBatch (the reference defaults 2048) — on a
 * 1000-executor cluster, write parallelism = partition count, which the
 * caller sizes with `repartition(n)` against the DB's connection budget
 * (the reference's channel count, JobContainer.java:416-486).
 */
object JdbcWrite {

  sealed trait WriteMode
  /** Plain INSERT — duplicate keys error (and replay to dirty). */
  case object Insert extends WriteMode
  /** MySQL REPLACE INTO — delete-then-insert upsert. */
  case object Replace extends WriteMode
  /** MySQL INSERT ... ON DUPLICATE KEY UPDATE — in-place upsert. This is the
    * reference's `update` mode; on the lakehouse side its semantics are the
    * snapshot table's MERGE (graft.table.SnapTable). */
  case object Update extends WriteMode

  def parseMode(s: String): WriteMode = s.toLowerCase match {
    case "insert" => Insert
    case "replace" => Replace
    case "update" => Update
    case other => throw new IllegalArgumentException(s"writeMode '$other'")
  }

  /** Render the write template for a mode (MySQL dialect, as the reference's
    * mysql writer; `?` placeholders in column order). */
  def template(mode: WriteMode, table: String, cols: Seq[String]): String = {
    require(cols.nonEmpty, "no columns")
    val colList = cols.mkString(", ")
    val qs = cols.map(_ => "?").mkString(", ")
    mode match {
      case Insert => s"INSERT INTO $table ($colList) VALUES ($qs)"
      case Replace => s"REPLACE INTO $table ($colList) VALUES ($qs)"
      case Update =>
        val updates = cols.map(c => s"$c = VALUES($c)").mkString(", ")
        s"INSERT INTO $table ($colList) VALUES ($qs) ON DUPLICATE KEY UPDATE $updates"
    }
  }

  /** Result of one partition's write. */
  final case class PartitionResult(written: Long, dirty: Long)

  /**
   * Write one partition's rows: buffer to `batchSize`, executeBatch inside a
   * transaction; if the batch fails, roll back and replay row-by-row,
   * routing the failing rows to `onDirty` (the reference's dirty-record
   * replay, CommonRdbmsWriter.java:344-398).
   */
  def writePartition(conn: Connection, sql: String, rows: Iterator[Row],
      batchSize: Int = 2048, onDirty: (Row, SQLException) => Unit = (_, _) => ())
      : PartitionResult = {
    val priorAutoCommit = conn.getAutoCommit
    conn.setAutoCommit(false)
    val st = conn.prepareStatement(sql)
    var written = 0L
    var dirty = 0L
    val buf = new scala.collection.mutable.ArrayBuffer[Row](batchSize)

    def bind(r: Row): Unit = {
      var i = 0
      while (i < r.length) {
        if (r.isNullAt(i)) st.setObject(i + 1, null) else st.setObject(i + 1, r.get(i))
        i += 1
      }
    }

    def flush(): Unit = {
      if (buf.isEmpty) return
      try {
        buf.foreach { r => bind(r); st.addBatch() }
        st.executeBatch()
        conn.commit()
        written += buf.size
      } catch {
        case _: SQLException =>
          conn.rollback()
          st.clearBatch()
          // row-by-row replay: good rows commit, offenders go to dirty
          buf.foreach { r =>
            try {
              bind(r); st.executeUpdate(); conn.commit(); written += 1
            } catch {
              case e: SQLException =>
                conn.rollback(); dirty += 1; onDirty(r, e)
            }
          }
      }
      buf.clear()
    }

    try {
      rows.foreach { r =>
        buf += r
        if (buf.size >= batchSize) flush()
      }
      flush()
    } finally {
      st.close()
      conn.setAutoCommit(priorAutoCommit) // leave the connection clean
    }
    PartitionResult(written, dirty)
  }

  /**
   * Distributed write: one connection per partition via `connect`. Returns
   * (written, dirty) totals. `connect` must be serializable-safe (a
   * function creating the connection ON THE EXECUTOR — driver connections
   * never serialize).
   *
   * Delivery semantics are AT-LEAST-ONCE, exactly like the reference's
   * channel replay after a task failover: a Spark task retry or speculative
   * duplicate re-runs its whole partition's side-effecting writes. Under
   * `Insert` mode the re-applied rows surface as key violations (routed to
   * dirty by the row-by-row replay); `Replace`/`Update` upserts are
   * retry-IDEMPOTENT and are the modes to use when the target has a
   * primary key. Exactly-once needs a transactional target with an epoch
   * guard — that is the snapshot table's MERGE path, not raw JDBC. The
   * returned totals are deterministic under retries: each partition's
   * (written, dirty) counts come back through a `collect` (a retried task's
   * result REPLACES its predecessor's), not through accumulators (which
   * double-count every re-run). Callers on clusters with speculation
   * enabled should disable it for Insert-mode jobs
   * (`spark.speculation=false`) — a speculative duplicate racing the
   * original is the one case where even upsert modes can interleave.
   */
  def write(df: DataFrame, connect: () => Connection, mode: WriteMode, table: String,
      batchSize: Int = 2048, preSql: Seq[String] = Nil, postSql: Seq[String] = Nil): (Long, Long) = {
    val cols = df.columns.toSeq
    val sql = template(mode, table, cols)
    // pre/postSql run ONCE per job on a driver-side connection, around the
    // distributed writes (reference: WriterUtil.executeSqls — e.g. a
    // truncate/DELETE before load, an index rebuild or audit insert after)
    if (preSql.nonEmpty) runSqls(connect, preSql)
    val results = df.rdd.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val conn = connect()
        val res = try writePartition(conn, sql, rows, batchSize) finally conn.close()
        Iterator.single((res.written, res.dirty))
      }
    }.collect()
    if (postSql.nonEmpty) runSqls(connect, postSql)
    (results.map(_._1).sum, results.map(_._2).sum)
  }

  /**
   * Staged "load" write — the reference adswriter's default mode rebuilt
   * on JDBC: fill a freshly-created transit table in parallel, then
   * publish into the serving table with ONE atomic driver-side
   * transaction, then drop the transit table (reference: AdsWriter.java
   * load-mode job flow — temp ODPS table via TableMetaHelper, parallel
   * block upload, single `LOAD DATA FROM ... [OVERWRITE]` submit+wait,
   * AdsHelper.java:204-290). The serving table never sees partial data:
   * readers observe the old contents until the publish commit, and any
   * failure before it (including constraint violations the transit table
   * deliberately accepted) rolls back to exactly the prior state.
   *
   * Retry shape: each partition fills the transit table under a SINGLE
   * transaction (commit at partition end), so a failed task's rows vanish
   * with its rollback and the retry re-fills from nothing — the block-id
   * overwrite analogue. As with Insert mode, speculative duplicates are
   * the one hole (two attempts both committing): disable speculation for
   * load-mode jobs (`spark.speculation=false`).
   *
   * Returns rows published. `stagingDdl` comes from the dialect
   * ([[JdbcDialect.stagingDdl]]); `staging` defaults to the reference's
   * `<table>_<millis><rand>` transit-name pattern
   * (TableMetaHelper.java:82-85).
   */
  def stagedLoad(df: DataFrame, connect: () => Connection, table: String,
      overwrite: Boolean, stagingDdl: (String, String) => String,
      batchSize: Int = 2048, staging: String = ""): Long = {
    val cols = df.columns.toSeq
    val stg =
      if (staging.nonEmpty) staging
      else s"${table}_dx_${System.currentTimeMillis()}${1000 + scala.util.Random.nextInt(1000)}"
    runSqls(connect, Seq(stagingDdl(stg, table)))
    try {
      val sql = template(Insert, stg, cols)
      val counts = df.rdd.mapPartitions { rows =>
        if (rows.isEmpty) Iterator.empty
        else {
          val conn = connect()
          try {
            conn.setAutoCommit(false)
            val st = conn.prepareStatement(sql)
            var n = 0L; var pending = 0
            rows.foreach { r =>
              var i = 0
              while (i < r.length) {
                if (r.isNullAt(i)) st.setObject(i + 1, null) else st.setObject(i + 1, r.get(i))
                i += 1
              }
              st.addBatch(); n += 1; pending += 1
              if (pending >= batchSize) { st.executeBatch(); pending = 0 }
            }
            if (pending > 0) st.executeBatch()
            conn.commit() // the partition's one commit — all rows or none
            st.close()
            Iterator.single(n)
          } finally conn.close()
        }
      }.collect()
      // atomic publish: truncate-if-overwrite + INSERT..SELECT in one txn
      val conn = connect()
      try {
        conn.setAutoCommit(false)
        val st = conn.createStatement()
        try {
          if (overwrite) st.executeUpdate(s"DELETE FROM $table")
          val colList = cols.mkString(", ")
          st.executeUpdate(s"INSERT INTO $table ($colList) SELECT $colList FROM $stg")
          conn.commit()
        } catch {
          case e: Exception => conn.rollback(); throw e
        } finally st.close()
      } finally conn.close()
      counts.sum
    } finally {
      // transit table always goes away, published or not
      try runSqls(connect, Seq(s"DROP TABLE $stg"))
      catch { case _: Exception => () }
    }
  }

  /**
   * Apply LWW change STATES (one row per key, `opCol` = U/D) to a JDBC
   * table as DELETE-by-key + (op != 'D') INSERT — the portable replace
   * shape every dialect supports, where the reference leans on MySQL
   * `REPLACE INTO` (reference: plugin-rdbms-util/.../writer/WriterUtil
   * .java:71-122 writeMode templates). Within a batch chunk all deletes
   * execute before all inserts, which is safe exactly because each key
   * appears at most once in a change-state frame. Idempotent: re-applying
   * the same states converges to the same table, so task retry and
   * crash-replay give at-least-once delivery with exactly-once effect.
   * Returns (upserts, deletes).
   */
  def applyChanges(df: DataFrame, connect: () => Connection, table: String,
      keyCols: Seq[String], opCol: String = "op",
      batchSize: Int = 1024): (Long, Long) = {
    val cols = df.columns.toSeq
    val dataCols = cols.filterNot(_ == opCol)
    val keyIdx = keyCols.map(cols.indexOf)
    val dataIdx = dataCols.map(cols.indexOf)
    val opIdx = cols.indexOf(opCol)
    require(keyIdx.forall(_ >= 0) && opIdx >= 0,
      s"applyChanges needs $keyCols and '$opCol' in ${cols.mkString(",")}")
    val delSql = s"DELETE FROM $table WHERE " +
      keyCols.map(k => s"$k = ?").mkString(" AND ")
    val insSql = template(Insert, table, dataCols)
    val results = df.rdd.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val conn = connect()
        try {
          conn.setAutoCommit(false)
          val del = conn.prepareStatement(delSql)
          val ins = conn.prepareStatement(insSql)
          var ups = 0L; var dels = 0L; var pending = 0
          def flush(): Unit = if (pending > 0) {
            del.executeBatch(); ins.executeBatch(); conn.commit(); pending = 0
          }
          rows.foreach { r =>
            keyIdx.zipWithIndex.foreach { case (ci, pi) =>
              del.setObject(pi + 1, r.get(ci))
            }
            del.addBatch()
            if (r.getString(opIdx) == "D") dels += 1
            else {
              dataIdx.zipWithIndex.foreach { case (ci, pi) =>
                if (r.isNullAt(ci)) ins.setObject(pi + 1, null)
                else ins.setObject(pi + 1, r.get(ci))
              }
              ins.addBatch(); ups += 1
            }
            pending += 1
            if (pending >= batchSize) flush()
          }
          flush()
          Iterator.single((ups, dels))
        } finally conn.close()
      }
    }.collect()
    (results.map(_._1).sum, results.map(_._2).sum)
  }

  /** Execute statements sequentially on one fresh connection. */
  def runSqls(connect: () => Connection, sqls: Seq[String]): Unit = {
    val conn = connect()
    try {
      val st = conn.createStatement()
      try sqls.foreach(st.execute) finally st.close()
    } finally conn.close()
  }
}
