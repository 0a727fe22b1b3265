package graft

import graft.cdc.{CdcPipeline, PipelineOptions, Sync}
import graft.model.{ChangeEvent, Schemas}
import graft.table.SnapTable
import org.apache.spark.sql.functions._

/** Incremental table->table replication over the change feed. */
class SyncSpec extends SparkSpec {
  import spark.implicits._

  private def ev(i: Int, lsn: Long, op: String) = ChangeEvent(s"c$i", 1, "user",
    s"v$lsn", null, new java.sql.Timestamp(1000L + lsn), lsn, op)

  private def state(t: SnapTable): Set[(String, String)] =
    t.read(spark).select("conv_id", "text").as[(String, String)].collect().toSet

  test("bootstrap sync replicates full state including deletes") {
    val src = SnapTable.create(spark, tmpDir("src"), Schemas.payloadV2, numBuckets = 8)
    CdcPipeline.applyBatch(src, (1 to 40).map(i => ev(i, 100 + i, "I")).toDF(), 0)
    CdcPipeline.applyBatch(src,
      (Seq(ev(3, 201, "D")) ++ (4 to 10).map(i => ev(i, 200 + i, "U"))).toDF(), 1)
    val dst = SnapTable.create(spark, tmpDir("dst"), Schemas.payloadV2, numBuckets = 8)
    val r = Sync.sync(spark, src, dst)
    assert(r.result == "committed" && r.fromLsn == -1L)
    assert(state(dst) == state(src))
    assert(!dst.read(spark).select("conv_id").as[String].collect().contains("c3"))
  }

  test("incremental sync applies only new changes; no-change round is metadata-only") {
    val src = SnapTable.create(spark, tmpDir("src"), Schemas.payloadV2, numBuckets = 8)
    CdcPipeline.applyBatch(src, (1 to 40).map(i => ev(i, 100 + i, "I")).toDF(), 0)
    val dst = SnapTable.create(spark, tmpDir("dst"), Schemas.payloadV2, numBuckets = 8)
    Sync.sync(spark, src, dst)
    val v1 = dst.currentVersion

    // advance the source: one update, one delete
    CdcPipeline.applyBatch(src, Seq(ev(5, 201, "U"), ev(7, 202, "D")).toDF(), 1)
    val r2 = Sync.sync(spark, src, dst)
    assert(r2.result == "committed" && r2.fromLsn == 140L && r2.toLsn == 202L)
    assert(state(dst) == state(src))
    assert(dst.currentVersion == v1 + 1)

    // nothing new: watermark comparison short-circuits, no commit happens
    val r3 = Sync.sync(spark, src, dst)
    assert(r3.result == "no_change" && r3.rowsApplied == 0L)
    assert(dst.currentVersion == v1 + 1)
  }

  test("sync from a merge-on-read source folds multi-state keys to LWW winners") {
    val src = SnapTable.create(spark, tmpDir("src"), Schemas.payloadV2, numBuckets = 8)
    val mor = PipelineOptions(mergeMode = "mor")
    CdcPipeline.applyBatch(src, (1 to 30).map(i => ev(i, 100 + i, "I")).toDF(), 0, mor)
    CdcPipeline.applyBatch(src, (1 to 10).map(i => ev(i, 200 + i, "U")).toDF(), 1, mor)
    assert(src.deltaFileCount > 0) // base+delta states coexist on disk
    val dst = SnapTable.create(spark, tmpDir("dst"), Schemas.payloadV2, numBuckets = 8)
    val r = Sync.sync(spark, src, dst)
    assert(r.result == "committed")
    assert(state(dst) == state(src))
    // stale base states lost the LWW reduce: exactly one row per live key
    assert(dst.read(spark).groupBy("conv_id", "turn_idx").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("sync fails fast when the watermark fell below the tombstone horizon") {
    val src = SnapTable.create(spark, tmpDir("src"), Schemas.payloadV2, numBuckets = 8)
    CdcPipeline.applyBatch(src, (1 to 20).map(i => ev(i, 100 + i, "I")).toDF(), 0)
    val dst = SnapTable.create(spark, tmpDir("dst"), Schemas.payloadV2, numBuckets = 8)
    Sync.sync(spark, src, dst) // dst watermark = 120
    // the consumer goes dark; meanwhile the source deletes keys and a
    // retention round physically expires those tombstones
    CdcPipeline.applyBatch(src,
      (Seq(ev(3, 201, "D"), ev(4, 202, "D")) ++
        (5 to 12).map(i => ev(i, 200 + i, "U"))).toDF(), 1)
    assert(src.expireTombstones(spark, lsnWatermark = 300L) == 2L)
    assert(src.tombstoneHorizonLsn == 300L)
    // resuming from 120 < horizon-1 would silently keep c3/c4 in dst forever
    val e = intercept[IllegalStateException] { Sync.sync(spark, src, dst) }
    assert(e.getMessage.contains("tombstone"), s"got: ${e.getMessage}")
    // a FRESH consumer is fine: full state has the expired-delete keys absent
    val dst2 = SnapTable.create(spark, tmpDir("dst2"), Schemas.payloadV2, numBuckets = 8)
    assert(Sync.sync(spark, src, dst2).result == "committed")
    assert(state(dst2) == state(src))
    // and so is a consumer at/above horizon-1 (nothing it needs was expired)
    assert(!dst2.read(spark).select("conv_id").as[String].collect().contains("c3"))
  }

  test("schema evolution propagates through sync") {
    val src = SnapTable.create(spark, tmpDir("src"), Schemas.payloadV1, numBuckets = 8)
    CdcPipeline.applyBatch(src,
      (1 to 20).map(i => ev(i, 100 + i, "I")).toDF().drop("tool"), 0)
    val dst = SnapTable.create(spark, tmpDir("dst"), Schemas.payloadV1, numBuckets = 8)
    Sync.sync(spark, src, dst)
    // source evolves: tool column appears
    CdcPipeline.applyBatch(src,
      Seq(ev(1, 201, "U")).toDF().withColumn("tool", lit("search")), 1)
    val r = Sync.sync(spark, src, dst)
    assert(r.result == "committed")
    assert(dst.read(spark).columns.contains("tool"))
    assert(dst.read(spark).filter(col("conv_id") === "c1").select("tool")
      .as[String].head() == "search")
    assert(state(dst) == state(src))
  }

  // ---- lake -> RDBMS fan-out (embedded Derby) ------------------------------

  private def derbyConnect(db: String): () => java.sql.Connection =
    () => java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$db;create=true")

  private def createServing(connect: () => java.sql.Connection, table: String): Unit = {
    val c = connect()
    try c.createStatement().execute(
      s"CREATE TABLE $table (conv_id VARCHAR(64) NOT NULL, turn_idx INT NOT NULL, " +
        "role VARCHAR(16), text VARCHAR(256), tool VARCHAR(64), ts TIMESTAMP, " +
        s"lsn BIGINT, PRIMARY KEY (conv_id, turn_idx))")
    finally c.close()
  }

  private def servingState(connect: () => java.sql.Connection,
      table: String): Set[(String, String)] = {
    val c = connect()
    try {
      val rs = c.createStatement().executeQuery(s"SELECT conv_id, text FROM $table")
      val b = Set.newBuilder[(String, String)]
      while (rs.next()) b += ((rs.getString(1), rs.getString(2)))
      b.result()
    } finally c.close()
  }

  test("jdbc fan-out: bootstrap, incremental, deletes, no-change, crash-replay") {
    val src = SnapTable.create(spark, tmpDir("jsrc"), Schemas.payloadV2, numBuckets = 8)
    CdcPipeline.applyBatch(src, (1 to 40).map(i => ev(i, 100 + i, "I")).toDF(), 0)
    val connect = derbyConnect("jsyncdb")
    createServing(connect, "serving")

    val r1 = Sync.toJdbc(spark, src, connect, "serving")
    assert(r1.result == "committed" && r1.fromLsn == -1L && r1.toLsn == 140L)
    assert(r1.upserts == 40 && r1.deletes == 0)
    assert(servingState(connect, "serving") == state(src))

    // incremental: one update, one delete — only the delta ships
    CdcPipeline.applyBatch(src, Seq(ev(5, 201, "U"), ev(7, 202, "D")).toDF(), 1)
    val r2 = Sync.toJdbc(spark, src, connect, "serving")
    assert(r2.result == "committed" && r2.fromLsn == 140L)
    assert(r2.upserts == 1 && r2.deletes == 1, s"got $r2")
    assert(servingState(connect, "serving") == state(src))

    // nothing new: the in-DB watermark short-circuits before any scan
    assert(Sync.toJdbc(spark, src, connect, "serving").result == "no_change")

    // crash between apply and watermark advance: rewinding the watermark
    // simulates it — the replay re-applies the same states and converges
    val c = connect()
    c.createStatement().execute(
      "UPDATE graft_sync_state SET lsn = 140 WHERE tgt = 'serving'")
    c.close()
    val r4 = Sync.toJdbc(spark, src, connect, "serving")
    assert(r4.result == "committed" && r4.upserts == 1 && r4.deletes == 1)
    assert(servingState(connect, "serving") == state(src))
  }

  test("jdbc fan-out ships one LATEST state per key from a mor source") {
    val src = SnapTable.create(spark, tmpDir("jsrc-mor"), Schemas.payloadV2, numBuckets = 8)
    val mor = PipelineOptions(mergeMode = "mor")
    CdcPipeline.applyBatch(src, (1 to 30).map(i => ev(i, 100 + i, "I")).toDF(), 0, mor)
    CdcPipeline.applyBatch(src, (1 to 10).map(i => ev(i, 200 + i, "U")).toDF(), 1, mor)
    assert(src.deltaFileCount > 0) // 40 change states live on disk for 30 keys
    val connect = derbyConnect("jsyncmordb")
    createServing(connect, "serving_mor")
    val r = Sync.toJdbc(spark, src, connect, "serving_mor")
    // the LWW pre-reduce collapses the 40 states to 30 latest ones — the
    // database never sees a stale intermediate
    assert(r.upserts == 30 && r.deletes == 0, s"got $r")
    assert(servingState(connect, "serving_mor") == state(src))
  }
}
