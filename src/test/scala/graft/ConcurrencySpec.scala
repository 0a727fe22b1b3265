package graft

import graft.cdc.CdcPipeline
import graft.model.{ChangeEvent, Schemas}
import graft.table.{MergeResult, SnapTable}
import org.apache.spark.sql.functions._

/** Optimistic concurrency: competing writers conflict on the snapshot
  * claim, lose exactly once, and retry against the new current state. */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def ev(i: Int, lsn: Long) = ChangeEvent(s"c$i", 1, "user", s"v$lsn", null,
    new java.sql.Timestamp(1000L + lsn), lsn, "U")

  test("conflicting commit retries against the competing writer's snapshot") {
    val root = tmpDir("table")
    val t1 = SnapTable.create(spark, root, Schemas.payloadV2, numBuckets = 8)
    CdcPipeline.applyBatch(t1, (1 to 20).map(i => ev(i, 100 + i)).toDF(), 0)
    val t2 = SnapTable.load(spark, root)
    // t2 steals t1's target version inside t1's commit window
    var fired = false
    t1.beforeCommitHook = () => if (!fired) {
      fired = true
      assert(t2.merge(Seq(ev(21, 201)).toDF(), epoch = 1)
        .isInstanceOf[MergeResult.Committed])
    }
    try {
      val r = t1.merge(Seq(ev(22, 301)).toDF(), epoch = 2)
      assert(r.isInstanceOf[MergeResult.Committed])
    } finally t1.beforeCommitHook = () => ()
    // both writers' rows are present; versions are linear
    val texts = t1.read(spark).select("conv_id", "text").as[(String, String)]
      .collect().toMap
    assert(texts("c21") == "v201" && texts("c22") == "v301")
    assert(t1.currentVersion == 3)
    assert(t1.snapshot().parent == 2)
  }

  test("two writers racing the SAME epoch resolve to one commit, one skip") {
    val root = tmpDir("table")
    val t1 = SnapTable.create(spark, root, Schemas.payloadV2, numBuckets = 8)
    CdcPipeline.applyBatch(t1, (1 to 20).map(i => ev(i, 100 + i)).toDF(), 0)
    val t2 = SnapTable.load(spark, root)
    var fired = false
    t1.beforeCommitHook = () => if (!fired) {
      fired = true
      t2.merge(Seq(ev(5, 201)).toDF(), epoch = 1) // the same epoch, delivered twice
    }
    val r = try t1.merge(Seq(ev(5, 201)).toDF(), epoch = 1)
    finally t1.beforeCommitHook = () => ()
    // t1 lost the race, retried, saw its epoch already applied -> skip
    assert(r == MergeResult.SkippedEpoch)
    assert(t1.currentVersion == 2)
    assert(t1.read(spark).filter(col("conv_id") === "c5")
      .select("text").as[String].collect().toSeq == Seq("v201"))
  }

  test("aborted attempts leave no orphan data directories") {
    val root = tmpDir("table")
    val t1 = SnapTable.create(spark, root, Schemas.payloadV2, numBuckets = 8)
    CdcPipeline.applyBatch(t1, (1 to 20).map(i => ev(i, 100 + i)).toDF(), 0)
    val t2 = SnapTable.load(spark, root)
    var fired = false
    t1.beforeCommitHook = () => if (!fired) {
      fired = true; t2.merge(Seq(ev(21, 201)).toDF(), epoch = 1): Unit
    }
    try t1.merge(Seq(ev(22, 301)).toDF(), epoch = 2)
    finally t1.beforeCommitHook = () => ()
    val dataDirs = new java.io.File(s"$root/data").listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    val referenced = t1.history.flatMap(v => t1.snapshot(v).files)
      .map(_.path.split("/")(1)).toSet
    assert(dataDirs == referenced,
      s"orphan commit dirs: ${dataDirs.diff(referenced)}")
  }
}
