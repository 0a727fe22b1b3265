package graft.table

import graft.SparkSpec
import graft.cdc.CdcPipeline
import graft.model.{ChangeEvent, Schemas}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/**
 * The commit-claim primitive itself: the snapshot file must be claimed by
 * an ATOMIC exclusive create, because local/POSIX rename silently
 * overwrites an existing destination — a rename-based claim would let two
 * racing writers both "commit" the same version (losing the first
 * writer's manifest). These tests race the raw claim on the local FS, the
 * exact filesystem family where rename gives no exclusivity.
 */
class CommitClaimSpec extends SparkSpec {
  import spark.implicits._

  private def ev(i: Int, lsn: Long) = ChangeEvent(s"c$i", 1, "user", s"v$lsn", null,
    new java.sql.Timestamp(1000L + lsn), lsn, "U")

  test("N threads racing tryCommit on one version: exactly one claim wins") {
    val root = tmpDir("claim")
    val t = SnapTable.create(spark, root, Schemas.payloadV2, numBuckets = 4)
    val base = t.snapshot()
    val n = 8
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val results = (0 until n).map { i =>
      pool.submit(new java.util.concurrent.Callable[(Int, Boolean)] {
        def call(): (Int, Boolean) = {
          start.await()
          // distinct content per writer so the surviving manifest identifies
          // its author
          (i, t.tryCommit(base.copy(version = 1L,
            props = base.props + ("writer" -> i.toString))))
        }
      })
    }
    start.countDown()
    val outcomes = results.map(_.get(30, TimeUnit.SECONDS))
    pool.shutdown()
    val winners = outcomes.filter(_._2)
    assert(winners.size == 1, s"claims won: $winners")
    // the committed manifest is whole and is the winner's
    assert(t.snapshot(1L).props("writer") == winners.head._1.toString)
    assert(t.currentVersion == 1L)
  }

  test("a torn ahead-of-pointer manifest is invisible to readers") {
    val root = tmpDir("torn")
    val t = SnapTable.create(spark, root, Schemas.payloadV2, numBuckets = 4)
    CdcPipeline.applyBatch(t, (1 to 10).map(i => ev(i, 100 + i)).toDF(), 0)
    assert(t.currentVersion == 1L)
    // simulate a writer that claimed version 2 and died mid-write
    Files.write(Paths.get(root, "meta", "snap-00000002.json"),
      """{"version":2,"paren""".getBytes(StandardCharsets.UTF_8))
    assert(t.currentVersion == 1L)
    assert(t.read(spark).count() == 10)
    // and a later whole commit (version 3 — 2 stays claimed by the corpse)
    // is visible again; skipping the torn file never rolls back past it
    t.commit(t.snapshot(1L).copy(version = 3L, parent = 1L))
    assert(t.currentVersion == 3L)
  }

  test("a stale torn claim is skipped (version burned), a fresh one honored") {
    val root = tmpDir("reclaim")
    val t = SnapTable.create(spark, root, Schemas.payloadV2, numBuckets = 4)
    CdcPipeline.applyBatch(t, (1 to 10).map(i => ev(i, 100 + i)).toDF(), 0)
    val base = t.snapshot()
    // a crashed writer left a torn claim on version 2
    val torn = Paths.get(root, "meta", "snap-00000002.json")
    Files.write(torn, """{"version":2,"paren""".getBytes(StandardCharsets.UTF_8))
    // within the grace window the claim is honored (it could be a LIVE
    // writer between claim and close) — the commit loses the race as usual
    assert(!t.tryCommit(base.copy(version = 2L)))
    // past the grace window a direct claim on the slot STILL loses (the
    // claim path never deletes — two racing recoveries could otherwise
    // destroy each other's fresh claim); recovery is version allocation
    // skipping the corpse: the next commit burns 2 and lands on 3
    val prev = SnapTable.tornManifestGraceMs
    SnapTable.tornManifestGraceMs = 0L
    try {
      assert(!t.tryCommit(base.copy(version = 2L)))
      assert(t.merge(Seq(ev(11, 201)).toDF(), epoch = 1)
        .isInstanceOf[MergeResult.Committed])
    } finally SnapTable.tornManifestGraceMs = prev
    assert(t.currentVersion == 3L)
    assert(t.read(spark).count() == 11)
    // the corpse persists (retention GCs it) and stays invisible to readers
    assert(Files.exists(torn))
    assert(t.history.contains(2L))
    // another corpse on the NEXT version must not wedge ingest either
    Files.write(Paths.get(root, "meta", "snap-00000004.json"),
      """{"version":4,"paren""".getBytes(StandardCharsets.UTF_8))
    SnapTable.tornManifestGraceMs = 0L
    try assert(t.merge(Seq(ev(12, 301)).toDF(), epoch = 2)
      .isInstanceOf[MergeResult.Committed])
    finally SnapTable.tornManifestGraceMs = prev
    assert(t.currentVersion == 5L)
    assert(t.read(spark).count() == 12)
    // the audit read skips the torn claims instead of crashing
    assert(t.readVersionHistory(spark).count() >= 12)
  }

  test("expireSnapshots skips torn manifests instead of crashing") {
    val root = tmpDir("expiretorn")
    val t = SnapTable.create(spark, root, Schemas.payloadV2, numBuckets = 4)
    for (e <- 0 to 2)
      CdcPipeline.applyBatch(t, (1 to 5).map(i => ev(i, 100 * (e + 1) + i)).toDF(), e)
    // a torn corpse ABOVE the pointer and inside what keepLast would retain
    Files.write(Paths.get(root, "meta", "snap-00000009.json"),
      """{"version":9,"paren""".getBytes(StandardCharsets.UTF_8))
    val prev = SnapTable.tornManifestGraceMs
    SnapTable.tornManifestGraceMs = 0L
    val (snapsDeleted, _) =
      try t.expireSnapshots(keepLast = 1)
      finally { SnapTable.tornManifestGraceMs = prev }
    assert(snapsDeleted >= 2, "parseable old snapshots expired")
    assert(!Files.exists(Paths.get(root, "meta", "snap-00000009.json")),
      "stale torn manifest reclaimed during retention")
    assert(t.currentVersion == 3L)
    assert(t.read(spark).count() == 5)
  }

  test("a commit landing off the current chain is reported ORPHANED, not committed") {
    val root = tmpDir("orphan")
    val t = SnapTable.create(spark, root, Schemas.payloadV2, numBuckets = 4)
    CdcPipeline.applyBatch(t, (1 to 10).map(i => ev(i, 100 + i)).toDF(), 0)
    assert(t.currentVersion == 1L)
    // Scenario (the documented stalled-past-grace boundary): writer A is
    // about to commit version 2, but it stalled so long that a concurrent
    // writer B, seeing A's claim torn past the grace window, SKIPPED v2 and
    // committed v3 with parent 1. A's late close then swaps the pointer to
    // a version no longer on the chain. The beforeCommitHook seam plays B:
    // it lands v3 (parent 1) right before A's tryCommit(2).
    val prevHook = t.beforeCommitHook
    t.beforeCommitHook = () =>
      t.commit(t.snapshot(1L).copy(version = 3L, parent = 1L,
        props = t.snapshot(1L).props + ("writer" -> "B")))
    val r =
      try CdcPipeline.applyBatch(t, Seq(ev(11, 201)).toDF(), epoch = 1)
      finally t.beforeCommitHook = prevHook
    // the lineage record says ORPHANED — a silent "committed" here would
    // hide that the epoch's rows are unreachable from the current snapshot
    assert(r.result == "orphaned", s"lineage result: ${r.result}")
    assert(t.currentVersion == 3L)
    assert(!t.onCurrentChain(2L) && t.onCurrentChain(3L) && t.onCurrentChain(1L))
    // readers see B's chain: A's epoch-1 row never became visible
    assert(t.read(spark).count() == 10)
    // and the persisted lineage carries the orphan marker for operators
    val lin = CdcPipeline.readLineage(spark, t).filter(_.epoch == 1L)
    assert(lin.exists(_.result == "orphaned"))
  }

  test("an orphaned compact recomputes against the current chain (deltas still fold)") {
    val root = tmpDir("orphan-compact")
    val t = SnapTable.create(spark, root, Schemas.payloadV2, numBuckets = 4)
    val opts = graft.cdc.PipelineOptions(mergeMode = "mor",
      morCompactDeltasPerBucket = Int.MaxValue)
    CdcPipeline.applyBatch(t, (1 to 10).map(i => ev(i, 100 + i)).toDF(), 0, opts)
    CdcPipeline.applyBatch(t, (1 to 10).map(i => ev(i, 200 + i)).toDF(), 1, opts)
    assert(t.deltaFileCount > 0)
    val preState = t.read(spark).select("text").as[String].collect().sorted.toSeq
    // first compact attempt orphans (concurrent writer B skips its slot and
    // commits ahead with a different parent, like the merge orphan test);
    // the retry must land the fold on B's chain
    val prevHook = t.beforeCommitHook
    var fired = false
    t.beforeCommitHook = () => if (!fired) {
      fired = true
      val cur = t.currentVersion
      t.commit(t.snapshot(cur).copy(version = cur + 2, parent = cur,
        props = t.snapshot(cur).props + ("writer" -> "B")))
    }
    val buckets = try t.compact(spark) finally t.beforeCommitHook = prevHook
    assert(buckets > 0, "retried compact reported no folded buckets")
    assert(t.deltaFileCount == 0, "current chain still has deltas")
    assert(t.read(spark).select("text").as[String].collect().sorted.toSeq == preState)
  }

  test("pre-stamp tables re-stamp without a rewrite (stampBucketFn)") {
    val root = tmpDir("prestamp")
    val t = SnapTable.create(spark, root, Schemas.payloadV2, numBuckets = 4)
    CdcPipeline.applyBatch(t, (1 to 10).map(i => ev(i, 100 + i)).toDF(), 0)
    // rewrite the manifest as if a pre-stamp build (no bucketFn prop) wrote it
    val p = Paths.get(root, "meta", "snap-00000001.json")
    val cleaned = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .replace("\"graft.bucketFn\":\"2\",", "")
      .replace(",\"graft.bucketFn\":\"2\"", "")
    assert(!cleaned.contains("graft.bucketFn"))
    Files.write(p, cleaned.getBytes(StandardCharsets.UTF_8))
    val t2 = SnapTable.load(spark, root)
    val e = intercept[IllegalArgumentException] {
      t2.merge(Seq(ev(11, 201)).toDF(), epoch = 1)
    }
    assert(e.getMessage.contains("stampBucketFn"), s"got: ${e.getMessage}")
    // the operator knows this layout is already hash-v2: props-only re-stamp
    t2.stampBucketFn()
    assert(t2.merge(Seq(ev(11, 201)).toDF(), epoch = 1)
      .isInstanceOf[MergeResult.Committed])
    assert(t2.read(spark).count() == 11)
  }

  test("merge refuses a table laid out by an older bucket-hash version") {
    val root = tmpDir("bucketfn")
    val t = SnapTable.create(spark, root, Schemas.payloadV2, numBuckets = 4)
    CdcPipeline.applyBatch(t, (1 to 10).map(i => ev(i, 100 + i)).toDF(), 0)
    // rewrite the manifest as if an older build (hash v1) had laid it out
    val p = Paths.get(root, "meta", "snap-00000001.json")
    val doctored = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .replace("\"graft.bucketFn\":\"2\"", "\"graft.bucketFn\":\"1\"")
    Files.write(p, doctored.getBytes(StandardCharsets.UTF_8))
    val t2 = SnapTable.load(spark, root)
    val e = intercept[IllegalArgumentException] {
      t2.merge(Seq(ev(11, 201)).toDF(), epoch = 1)
    }
    assert(e.getMessage.contains("rebucket"))
    intercept[IllegalArgumentException] { t2.readKey(spark, "c1", 1L) }
    // rebucket rewrites every row under the current hash and re-stamps
    t2.rebucket(spark, 4)
    assert(t2.snapshot().props(SnapTable.PropBucketFn)
      == SnapTable.BucketFnVersion.toString)
    assert(t2.merge(Seq(ev(11, 201)).toDF(), epoch = 1)
      .isInstanceOf[MergeResult.Committed])
    assert(t2.read(spark).count() == 11)
  }
}
