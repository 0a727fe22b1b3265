package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.Serialization

import java.nio.charset.StandardCharsets

/** One committed table state: an immutable list of data files + schema. */
final case class Snapshot(
    version: Long,
    parent: Long,
    numBuckets: Int,
    currentSchemaV: Int,
    schemaVersions: Map[String, String], // schemaV -> DDL
    files: Seq[DataFileEntry],
    props: Map[String, String],
    rows: Long) {
  def schema: StructType = StructType.fromDDL(schemaVersions(currentSchemaV.toString))
  def lastEpoch: Long = props.get(SnapTable.PropLastEpoch).map(_.toLong).getOrElse(-1L)
}

/** `kind` = "base" (fully merged) or "delta" (merge-on-read overlay written
  * without rewriting its bucket; reduced away at read/compaction).
  * `minLsn`/`maxLsn` are parquet footer column statistics captured at
  * manifest time — the pruning index for incremental (`readChangesSince`)
  * consumers; None when footer stats were unavailable (file must then be
  * assumed to overlap any range). */
final case class DataFileEntry(path: String, bucket: Int, schemaV: Int, rows: Long,
    kind: String = "base", minLsn: Option[Long] = None, maxLsn: Option[Long] = None)

/** Write-time derived column: computed from each WINNING row exactly once
  * over the row's lifetime — stored rows keep their persisted value
  * (coalesce short-circuits in codegen), and losing duplicate/superseded
  * change events are never evaluated at all. The static `dataType` keeps
  * schema evolution deterministic (the column joins the target schema
  * before any plan binds). `expr` may reference the group's prelude
  * columns (see [[Derived]]). */
final case class DerivedColumn(name: String, dataType: DataType,
    expr: org.apache.spark.sql.Column)

/** A group of derived columns with optional shared PRELUDE expressions.
  * Codegen subexpression elimination does not look inside conditional
  * branches, so N derived columns that each embed the same expensive
  * subtree under their coalesce would evaluate it N times; a prelude names
  * the subtree once, gated on the rows that actually need deriving, and
  * the column exprs read from it (the prelude column lives in its own
  * projection — CollapseProject keeps non-cheap multi-referenced
  * expressions un-inlined — and never reaches disk). */
final case class Derived(prelude: Seq[(String, org.apache.spark.sql.Column)],
    cols: Seq[DerivedColumn]) {
  def isEmpty: Boolean = cols.isEmpty
}
object Derived {
  val none: Derived = Derived(Nil, Nil)
  def apply(cols: DerivedColumn*): Derived = Derived(Nil, cols.toSeq)
}

sealed trait MergeResult
object MergeResult {
  /** epoch already committed — replay skipped (exactly-once). */
  case object SkippedEpoch extends MergeResult
  /** `orphaned`: the claim succeeded but the version is NOT on the current
    * snapshot chain — a writer stalled past the torn-manifest grace window
    * had its version number skipped by a concurrent writer, and its
    * eventually-closed manifest hangs off a dead branch. The epoch's data is
    * unreachable from the current snapshot; lineage records it as
    * `orphaned` (never a silent `committed`) so operators can detect the
    * pause-induced loss and replay. */
  final case class Committed(version: Long, rowsWritten: Long, bucketsRewritten: Int,
      schemaEvolved: Boolean, orphaned: Boolean = false) extends MergeResult
}

/**
 * Iceberg-style snapshot table: parquet data files + JSON snapshot manifests
 * + an atomically-swapped current-version pointer. Built from scratch (no
 * Iceberg jar in this environment) but with the same guarantees the north
 * star asks of Iceberg:
 *
 *  - **Snapshot isolation / atomic commit** — a commit is: write the data
 *    files, write `meta/snap-<v>.json`, atomically swap `meta/_current`.
 *    Readers resolve the pointer once and only ever see a fully committed
 *    file list. (Reference analogue: HdfsWriter's temp-dir + rename two-phase
 *    commit, reference: hdfswriter/.../HdfsWriter.java:190-191, 288-321, and
 *    OdpsWriter's disjoint block-id commit, odpswriter/.../OdpsWriter.java:
 *    158-160.)
 *  - **Exactly-once upsert** — `merge(batch, epoch)` records the epoch in the
 *    snapshot properties *in the same commit* as the data; a replayed epoch
 *    (<= lastEpoch) is a no-op. (Reference analogue: shard checkpoint
 *    `(shardIterator, skipCount, version)`, otsstreamreader/.../model/
 *    ShardCheckpoint.java:8-118.)
 *  - **Schema evolution** — new nullable columns and numeric widening are
 *    merged into the table schema at merge time; old files keep their
 *    physical schema and are aligned lazily at read (per-file-group schema
 *    versions), exactly like Iceberg's lazy evolution. No data rewrite.
 *  - **MERGE INTO semantics** — last-writer-wins by (ts, lsn) between stored
 *    rows and the incoming batch; `op='D'` winners become tombstones
 *    (retained, filtered at read) so a delete can never be undone by a late
 *    out-of-order update — the monotone-merge rule of SURVEY.md §7.4.
 *
 * Scale design: data files are hash-bucketed on the merge key (`numBuckets`,
 * thousands in production). A merge rewrites ONLY the buckets the batch
 * touches (copy-on-write at bucket granularity), and the bucket column is
 * both the shuffle key and the file layout, so merge shuffle and file IO are
 * proportional to the touched fraction, not table size.
 */
final class SnapTable private (val root: String, fs: FileSystem) {
  import SnapTable._

  private implicit val fmts: Formats = Serialization.formats(NoTypeHints)

  // ---- metadata IO --------------------------------------------------------

  private def metaDir = new Path(root, "meta")
  private def snapPath(v: Long) = new Path(metaDir, f"snap-$v%08d.json")
  private def currentPtr = new Path(metaDir, "_current")

  private def writeString(p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def readString(p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Current version: max of the pointer file and the max committed
    * snapshot. The reconciliation covers BOTH failure windows: a crash
    * between pointer delete and rename (pointer missing), and two
    * overlapping writers swapping the pointer out of order (pointer stale
    * behind an already-committed snapshot). Snapshot files AHEAD of the
    * pointer are parse-validated before counting: the exclusive-create
    * commit claim (see [[tryCommit]]) writes the manifest through the
    * claiming stream, so a writer that crashes mid-write leaves a torn
    * `snap-*.json` — readers must skip it (the pointer is only ever swapped
    * after a complete manifest close, so everything at or below the pointer
    * is always whole). */
  def currentVersion: Long = {
    val ptr = if (fs.exists(currentPtr)) readString(currentPtr).trim.toLong else 0L
    val snaps = Option(fs.globStatus(new Path(metaDir, "snap-*.json"))).getOrElse(Array())
    val ahead = snaps
      .map(_.getPath.getName.stripPrefix("snap-").stripSuffix(".json").toLong)
      .filter(_ > ptr).sorted(Ordering[Long].reverse)
    ahead.find(v =>
      try { snapshot(v); true } catch { case scala.util.control.NonFatal(_) => false }
    ).getOrElse(ptr)
  }

  def snapshot(version: Long = currentVersion): Snapshot =
    Serialization.read[Snapshot](readString(snapPath(version)))

  def history: Seq[Long] =
    Option(fs.globStatus(new Path(metaDir, "snap-*.json"))).getOrElse(Array())
      .map(_.getPath.getName.stripPrefix("snap-").stripSuffix(".json").toLong).sorted.toSeq

  private[table] def commit(s: Snapshot): Unit =
    require(tryCommit(s), s"snapshot ${s.version} already exists (concurrent writer)")

  /** Attempt to commit; returns false when another writer claimed this
    * version first (optimistic concurrency — the caller re-reads the new
    * current snapshot and retries its operation against it, Iceberg-style).
    *
    * The claim is an ATOMIC EXCLUSIVE CREATE of the snapshot file itself,
    * so two writers can never both think they own a version. Rename was
    * deliberately rejected as the claim primitive: HDFS rename-to-existing
    * fails, but Hadoop's local filesystems delegate to POSIX rename, which
    * silently overwrites — two racing writers would both "win" and the
    * first manifest would be lost. Exclusive create is atomic on both: the
    * HDFS NameNode serializes `create(overwrite=false)`, and for `file://`
    * we bypass the (check-then-act) local FS wrapper and claim via
    * O_CREAT|O_EXCL (`Files.newOutputStream(CREATE_NEW)`). A crash between
    * claim and close leaves a torn manifest; [[currentVersion]]
    * parse-validates ahead-of-pointer snapshots, so readers never see it.
    */
  private[table] def tryCommit(s: Snapshot): Boolean = {
    val p = snapPath(s.version)
    val out = exclusiveCreate(p) match {
      case Some(o) => o
      case None =>
        // version already claimed — by a live concurrent writer (its
        // manifest will be parseable shortly) or by a crashed one (a torn
        // file). Either way the claim path NEVER deletes or re-takes the
        // slot: the caller's retry recomputes its target via [[nextVersion]],
        // which advances past torn-past-grace claims, so a crashed writer
        // just burns one version number. (An in-claim reclaim-by-delete was
        // rejected: two racing reclaimers can both parse-check the same old
        // corpse and then one deletes the OTHER's freshly re-created claim —
        // check-then-delete is not atomic — silently losing its commit.)
        return false
    }
    // a write/close failure must not leave a half-written claim either:
    // delete the claimed file before rethrowing so the next attempt (ours
    // after backoff, or another writer's) can claim the version cleanly
    try {
      out.write(Serialization.write(s).getBytes(StandardCharsets.UTF_8))
      out.close()
    } catch {
      case t: Throwable =>
        try out.close() catch { case _: Throwable => () }
        try fs.delete(p, false) catch { case _: Throwable => () }
        throw t
    }
    val tmp = new Path(metaDir, s"_current.tmp-${s.version}")
    writeString(tmp, s.version.toString)
    // HDFS rename is atomic; the delete+rename window is covered by the
    // max-snapshot fallback in currentVersion.
    if (fs.exists(currentPtr)) fs.delete(currentPtr, false)
    require(fs.rename(tmp, currentPtr), s"failed to swap $currentPtr")
    true
  }

  /** True if `p` is a TORN manifest (unparseable JSON) older than
    * [[SnapTable.tornManifestGraceMs]] — a crashed writer's corpse. A
    * parseable file is a legitimate commit; a young unparseable file may be
    * a live writer between claim and close (the grace window is the
    * correctness boundary: a writer slower than it could otherwise be
    * skipped over and lose its commit). */
  private def tornPastGrace(p: Path): Boolean = {
    val st = try fs.getFileStatus(p) catch { case _: java.io.IOException => return false }
    val parseable =
      try { Serialization.read[Snapshot](readString(p)); true }
      catch { case scala.util.control.NonFatal(_) => false }
    if (parseable) return false
    System.currentTimeMillis() - st.getModificationTime >= SnapTable.tornManifestGraceMs
  }

  /** Delete `p` if [[tornPastGrace]]; retention-path GC only — the commit
    * claim path never deletes (see [[tryCommit]]). Safe there: writers
    * allocate versions via [[nextVersion]], which only targets a number
    * below an existing claim file after that file is already gone. */
  private def reclaimTorn(p: Path): Boolean =
    tornPastGrace(p) &&
      (try fs.delete(p, false) catch { case _: java.io.IOException => false })

  /** Next commit target: the first version past `cur` whose slot is either
    * free or held by a torn-past-grace corpse (skipped — the crashed writer
    * permanently burns that number; `parent` records real lineage, so gaps
    * are harmless). A YOUNG unparseable claim is NOT skipped: targeting it
    * loses the exclusive-create race and the retry loop effectively waits
    * for the claimant to finish (new current snapshot) or die (grace). */
  private def nextVersion(cur: Long): Long = {
    var v = cur + 1
    while (fs.exists(snapPath(v)) && tornPastGrace(snapPath(v))) v += 1
    v
  }

  /** True when `version` is the current version or one of its ancestors
    * (parent-pointer walk from [[currentVersion]] down). A freshly
    * tryCommit-ed version that is NOT on the chain was ORPHANED: this
    * writer stalled past [[SnapTable.tornManifestGraceMs]] between claim
    * and manifest close, a concurrent writer's [[nextVersion]] skipped the
    * (then-torn) slot and committed ahead with a different parent, and this
    * writer's late close now hangs off a dead branch. Cost: zero extra
    * reads in the normal case (current == version after our own pointer
    * swap); the walk only runs when someone committed past us. */
  private[table] def onCurrentChain(version: Long): Boolean = {
    var v = currentVersion
    while (v > version) v = snapshot(v).parent
    v == version
  }

  /** Atomic create-if-absent of `p`; None when the version is already
    * claimed. Local schemes go through java.nio `CREATE_NEW` (O_EXCL)
    * because RawLocalFileSystem's `create(overwrite=false)` is a
    * non-atomic exists-check; everything else uses the filesystem's own
    * exclusive create (atomic on HDFS). */
  private def exclusiveCreate(p: Path): Option[java.io.OutputStream] = {
    val raw = fs match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }
    raw match {
      case _: org.apache.hadoop.fs.RawLocalFileSystem =>
        try Some(java.nio.file.Files.newOutputStream(
          java.nio.file.Paths.get(p.toUri.getPath),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE))
        catch { case _: java.nio.file.FileAlreadyExistsException => None }
      case _ =>
        try Some(fs.create(p, false))
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => None
          case _: java.io.IOException if fs.exists(p) => None
        }
    }
  }

  // ---- read path ----------------------------------------------------------

  /** Bucket assignment hashes CANONICALLY-CAST key columns (integral keys
    * always as long) so the bucket of a key is invariant under merge-key
    * type widening — rows written before an int->long evolution land in the
    * same bucket as rows after it. */
  private[graft] def bucketExpr(numBuckets: Int) =
    pmod(xxhash64(graft.model.Schemas.mergeKeyCanonicalTypes
      .map { case (n, t) => col(n).cast(t) }: _*), lit(numBuckets)).cast("int")

  /** Refuse hash-dependent operations on a table laid out by a DIFFERENT
    * bucket-function version than this build computes: merging with a
    * changed hash silently strands stored rows in buckets the touched-set
    * no longer matches (duplicate keys across buckets, stale point reads).
    * The layout's hash version is stamped in the snapshot props at create
    * time and updated by [[rebucket]] — the one operation that can migrate
    * a legacy table (it rewrites every row under the current hash). Tables
    * created before the stamp existed default to version 1 (pre-canonical-
    * cast hashing) and must be rebucketed before any merge. */
  private def requireBucketFn(snap: Snapshot): Unit = {
    val stored = snap.props.get(PropBucketFn)
    if (!stored.contains(BucketFnVersion.toString)) {
      val detail = stored match {
        case Some(v) =>
          s"was bucketed with hash version $v but this build uses $BucketFnVersion" +
            " — run rebucket() to migrate the layout (full rewrite) before merging"
        case None =>
          "predates the bucket-hash stamp, so its layout hash version is " +
            s"unknown (this build uses $BucketFnVersion). If the table was " +
            "created by a recent pre-stamp build its layout is already " +
            s"version $BucketFnVersion and stampBucketFn() (a props-only " +
            "commit, no data rewrite) is enough; a genuinely old version-1 " +
            "layout needs rebucket() (full rewrite)."
      }
      throw new IllegalArgumentException(s"table at $root $detail")
    }
  }

  /** Re-stamp the layout's bucket-hash version WITHOUT rewriting data — the
    * migration for tables created by pre-stamp builds whose physical layout
    * already matches `version` (the caller asserts that; a wrong stamp
    * silently strands keys across buckets, which is exactly what
    * [[requireBucketFn]] exists to prevent — when in doubt, rebucket()). */
  def stampBucketFn(version: Int = SnapTable.BucketFnVersion): Unit = {
    val snap = snapshot()
    commit(snap.copy(version = nextVersion(snap.version), parent = snap.version,
      props = snap.props + (PropBucketFn -> version.toString)))
  }

  private[graft] def numBuckets: Int = snapshot().numBuckets

  /** Read the given files, aligning every physical schema generation to the
    * target schema (missing columns -> null, widened types -> cast). */
  private def readAligned(spark: SparkSession, snap: Snapshot,
      files: Seq[DataFileEntry], target: StructType): DataFrame = {
    if (files.isEmpty) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], target)
    val bySchema = files.groupBy(_.schemaV)
    bySchema.map { case (sv, fe) =>
      val physical = StructType.fromDDL(snap.schemaVersions(sv.toString))
      val df = spark.read.schema(physical).parquet(fe.map(f => s"$root/${f.path}"): _*)
      SchemaEvolution.align(df, target)
    }.reduce(_ unionByName _)
  }

  /** Current winner rows (tombstones retained, envelope retained). For a
    * pure-base table this is a plain scan; when merge-on-read deltas exist,
    * the per-key LWW reduce runs at read time (same `max_by (ts, lsn)` the
    * CoW merge applies at write time, so both modes expose identical
    * state). */
  def readRaw(spark: SparkSession): DataFrame = {
    val snap = snapshot()
    val all = readAligned(spark, snap, snap.files, snap.schema)
    if (!snap.files.exists(_.kind == "delta")) all else lwwReduce(all, snap.schema)
  }

  /** LWW winners of a raw (possibly multi-version) frame. */
  private def lwwReduce(df: DataFrame, target: StructType): DataFrame = {
    val dataCols = target.fields.map(_.name).toSeq
    df.groupBy(Schemas.keyCols.map(col): _*)
      .agg(graft.functions.LwwWinner.lwwWinner(
        struct(dataCols.map(col): _*), col("ts"), col("lsn")).as("w"))
      .select(dataCols.map(n => col(s"w.$n").as(n)): _*)
  }

  /** User-facing state: tombstones dropped. */
  def read(spark: SparkSession): DataFrame = readRaw(spark).filter(col("op") =!= "D").drop("op")

  /** Time travel. */
  def readVersion(spark: SparkSession, version: Long): DataFrame = {
    val snap = snapshot(version)
    val all = readAligned(spark, snap, snap.files, snap.schema)
    val reduced = if (!snap.files.exists(_.kind == "delta")) all
      else lwwReduce(all, snap.schema)
    reduced.filter(col("op") =!= "D").drop("op")
  }

  /**
   * Multi-version read: every retained (key, lsn) state across ALL snapshot
   * versions — the per-key change history at per-epoch-winner granularity,
   * with `first_version` = the table version where that state first became
   * visible. The reference's CDC reader has the same dual output: single-
   * version latest-state vs cell-level multi-version history (reference:
   * otsstreamreader/.../core/MultiVerModeRecordSender.java vs
   * SingleVerAndUpOnlyModeRecordSender.java).
   *
   * Scan cost is O(DISTINCT files), not O(versions x files): data files are
   * immutable and a removed path is never re-listed, so each file is read
   * exactly once, tagged with the earliest version whose manifest lists it;
   * a row's `first_version` is then the min over its containing files (CoW
   * rewrites copy surviving rows forward into later-added files). Manifest
   * resolution is still O(versions) driver-side reads.
   */
  def readVersionHistory(spark: SparkSession): DataFrame = {
    // skip torn claims from crashed writers (they were never committed
    // versions; retention GCs them past the grace window)
    val snaps = history.filter(_ > 0).sorted.flatMap { v =>
      try Seq((v, snapshot(v)))
      catch { case scala.util.control.NonFatal(_) => Nil }
    }
    require(snaps.nonEmpty, "table has no committed data versions")
    // the schema lattice only adds nullable columns / widens, so the newest
    // retained schema is the union the old per-version unionByName produced
    val target = snaps.last._2.schema
    // physical-schema dictionary merged across retained snapshots (a very
    // old file's schemaV entry may predate the newest manifest)
    val ddlByV = snaps.map(_._2.schemaVersions).reduce(_ ++ _)
    val firstListed = scala.collection.mutable.LinkedHashMap.empty[String, (DataFileEntry, Long)]
    for ((v, s) <- snaps; f <- s.files if !firstListed.contains(f.path))
      firstListed(f.path) = (f, v)
    val all = firstListed.values.toSeq.groupBy { case (f, v) => (f.schemaV, v) }
      .toSeq.map { case ((sv, vAdd), fs) =>
        val physical = StructType.fromDDL(ddlByV(sv.toString))
        val df = spark.read.schema(physical)
          .parquet(fs.map { case (f, _) => s"$root/${f.path}" }: _*)
        SchemaEvolution.align(df, target).withColumn("__v", lit(vAdd))
      }.reduce(_ unionByName _)
    val dataCols = target.fields.map(_.name).toSeq
    // rows for one (key, lsn) are identical across copies (files are
    // immutable); keep the newest copy + the first version seen
    all.groupBy((Schemas.keyCols :+ "lsn").map(col): _*)
      .agg(min(col("__v")).as("first_version"),
        max_by(struct(dataCols.map(col): _*), col("__v")).as("w"))
      .select(col("first_version") +: dataCols.map(n => col(s"w.$n").as(n)): _*)
  }

  def committedEpoch: Long = if (currentVersion == 0) -1L else snapshot().lastEpoch

  // ---- MERGE --------------------------------------------------------------

  /**
   * LWW MERGE of a change batch (envelope columns required: ts, lsn, op).
   * Equivalent Iceberg SQL (SURVEY.md §3.3):
   *   MERGE INTO t USING batch s ON t.conv_id=s.conv_id AND t.turn_idx=s.turn_idx
   *   WHEN MATCHED AND (s.ts, s.lsn) > (t.ts, t.lsn) THEN UPDATE SET *
   *   WHEN NOT MATCHED THEN INSERT *        -- deletes become tombstones
   */
  def merge(batch: DataFrame, epoch: Long): MergeResult = merge(batch, epoch, None)

  /** Variant with a precomputed touched-bucket set (the pipeline derives it
    * in the same aggregation pass as its lineage accounting, saving a scan)
    * and optional write-time [[DerivedColumn]]s, computed on winner rows
    * AFTER the reduce: deriving per change event does ~10x the evals (the
    * bench stream folds 10.5M events to 861k winners), and even carrying
    * the columns as nulls through the reduce costs more than recomputing
    * them (three UnsafeRow slots on every shuffled+sorted row ≈ 5s/epoch at
    * 10M events vs ~1s to re-derive a rewritten bucket's winners), so the
    * reduce runs on the bare envelope and the derivation projects onto its
    * output. That trade inverts at steady state — when the rewritten
    * buckets' surviving rows outnumber the batch, re-deriving every
    * survivor (a full textStats pass over its text) dominates — so a
    * caller that knows the batch size (the pipeline counts it in its
    * accounting pass) passes `batchRowsHint` and the merge carries STORED
    * rows' persisted derived values through the reduce instead whenever
    * storedRewriteRows > batchRows. */
  def merge(batch: DataFrame, epoch: Long, knownTouched: Option[Set[Int]],
      derived: Derived = Derived.none,
      batchRowsHint: Option[Long] = None): MergeResult =
    retryingCommit(mergeAttempt(batch, epoch, knownTouched, derived, batchRowsHint))

  /**
   * Run one optimistic attempt of `op` per loop iteration; an attempt
   * returns None when another writer claimed its target version first, in
   * which case the operation is recomputed against the NEW current
   * snapshot (Iceberg's optimistic-concurrency loop). The epoch guard is
   * re-evaluated inside each attempt, so two ingest jobs racing the same
   * epoch resolve to exactly one Committed and one SkippedEpoch.
   */
  private def retryingCommit(op: => Option[MergeResult]): MergeResult = {
    var attempt = 0
    while (attempt < MaxCommitAttempts) {
      op match {
        case Some(r) => return r
        case None =>
          attempt += 1
          Thread.sleep(50L * attempt)
      }
    }
    throw new IllegalStateException(
      s"commit conflicted $MaxCommitAttempts times — giving up (livelocked writers?)")
  }

  private val MaxCommitAttempts = 5

  /** Run `body` (a job containing the LWW reduce) with the
    * ObjectHashAggregate sort-fallback threshold raised to
    * [[SnapTable.LwwFallbackThreshold]], restoring the session value after.
    * Scoped per-job rather than session-wide: the raised threshold removes
    * the sort-based safety valve (each LwwBuffer pins a full UnsafeRow in
    * an unspillable map), which is safe HERE because the reduce runs on
    * bucket-partitioned winners — keys per task are bounded by bucket
    * sizing (rebucket keeps buckets task-sized as the table grows) — but
    * would be an OOM hazard for arbitrary session aggregations. */
  private def withLwwAggConf[T](spark: SparkSession)(body: => T): T = {
    val k = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    // Serialized per SESSION: the threshold lives in the session-global SQL
    // conf, so two interleaved merge writes could save each other's raised
    // value as "previous" and leave the 4M threshold set permanently
    // (A-set, B-set-saving-4M, A-restore, B-restore-4M). One lock per
    // session makes set/body/restore atomic; merges on DIFFERENT sessions
    // (separate confs) still run concurrently. Residual, documented: an
    // unrelated aggregation on the same session DURING a merge write sees
    // the raised threshold for that bounded window — callers running mixed
    // workloads should give ingest its own `spark.newSession()`.
    SnapTable.lwwConfLock(spark).synchronized {
      val prev = spark.conf.getOption(k)
      spark.conf.set(k, SnapTable.LwwFallbackThreshold.toString)
      try body
      finally prev match {
        case Some(v) => spark.conf.set(k, v)
        case None => spark.conf.unset(k)
      }
    }
  }

  /** Test seam: runs right before an attempt's commit (lets a test inject
    * a competing writer into the conflict window). */
  private[graft] var beforeCommitHook: () => Unit = () => ()

  private def mergeAttempt(batch: DataFrame, epoch: Long, knownTouched: Option[Set[Int]],
      derived: Derived, batchRowsHint: Option[Long]): Option[MergeResult] = {
    val spark = batch.sparkSession
    val debug = sys.env.contains("GRAFT_DEBUG_TIMING")
    var tMark = System.nanoTime()
    def mark(phase: String): Unit = if (debug) {
      val now = System.nanoTime()
      System.err.println(f"[merge-timing] $phase: ${(now - tMark) / 1e9}%.2fs")
      tMark = now
    }
    val snap = snapshot()
    requireBucketFn(snap)
    if (epoch <= snap.lastEpoch) return Some(MergeResult.SkippedEpoch)

    // 1. schema evolution (driver-side, before any executor plan binds —
    //    SURVEY.md §7.4 risk 4).
    val tableSchema = snap.schema
    val target = SnapTable.withDerived(
      SchemaEvolution.merge(tableSchema, batch.schema), derived)
    val evolved = target.toDDL != tableSchema.toDDL
    val schemaVersions =
      if (evolved) snap.schemaVersions + ((snap.currentSchemaV + 1).toString -> target.toDDL)
      else snap.schemaVersions
    val newSchemaV = if (evolved) snap.currentSchemaV + 1 else snap.currentSchemaV

    val reduceSchema = SnapTable.withoutDerived(target, derived)
    val alignedBare = SchemaEvolution.align(batch, reduceSchema)
      .withColumn(BucketCol, bucketExpr(snap.numBuckets))

    // 2. copy-on-write only the touched buckets.
    val touched = knownTouched.getOrElse(
      alignedBare.select(BucketCol).distinct().collect().map(_.getInt(0)).toSet)
    mark("touched-buckets")
    val (rewrite, keep) = snap.files.partition(f => touched(f.bucket))

    // Two regimes for derived columns (measured both ways, see merge's
    // doc): replay/backfill (batch >> stored) reduces the BARE envelope
    // and re-derives winners — extra null slots on every shuffled change
    // event cost more than re-deriving the few survivors. Steady state
    // (stored >> batch) carries the STORED rows' persisted values through
    // the reduce — applyDerived's gated coalesce then recomputes only the
    // winners whose values are null (fresh rows, pre-enrichment files) —
    // because a survivor's textStats pass costs far more than the wider
    // rows. The caller's batch-size hint (counted in the pipeline's
    // accounting pass — no extra scan) picks the regime per epoch.
    val storedDerivedCols = derived.cols.map(_.name).filter(tableSchema.fieldNames.contains)
    val carryStored = storedDerivedCols.nonEmpty &&
      batchRowsHint.exists(b => rewrite.map(_.rows).sum > b)
    val carrySchema =
      if (carryStored) storedDerivedCols.foldLeft(reduceSchema)((s, n) => s.add(target(n)))
      else reduceSchema
    val aligned =
      if (carryStored) SchemaEvolution.align(batch, carrySchema)
        .withColumn(BucketCol, bucketExpr(snap.numBuckets))
      else alignedBare
    val old = readAligned(spark, snap, rewrite, carrySchema)
      .withColumn(BucketCol, bucketExpr(snap.numBuckets))

    // 3+4. LWW winners among stored rows + batch, in ONE shuffle that is
    //    also the file layout: repartition by bucket first — __bucket is a
    //    grouping column, so HashPartitioning(__bucket) already satisfies
    //    the aggregation's ClusteredDistribution and no second exchange is
    //    inserted between the reduce and the bucketed write.
    val unioned = old.unionByName(aligned)
    val winners = SnapTable.lwwWinners(unioned, carrySchema, math.max(1, touched.size))
    val newVersion = nextVersion(snap.version)
    val commitRel = SnapTable.commitDir(newVersion)
    withLwwAggConf(spark) {
      SnapTable.applyDerived(winners, derived)
        .write.mode("overwrite").partitionBy(BucketCol).parquet(s"$root/$commitRel")
    }
    mark("merge-write")

    // 5. manifest the written files (rows counted from parquet footers).
    val written = listBucketFiles(spark, s"$root/$commitRel", commitRel, newSchemaV)
    mark("manifest-files")
    val newRows = written.map(_.rows).sum + keep.map(_.rows).sum
    beforeCommitHook()
    val committed = tryCommit(Snapshot(
      version = newVersion,
      parent = snap.version,
      numBuckets = snap.numBuckets,
      currentSchemaV = newSchemaV,
      schemaVersions = schemaVersions,
      files = keep ++ written,
      props = snap.props + (PropLastEpoch -> epoch.toString),
      rows = newRows))
    if (!committed) {
      // another writer owns this version: discard our files, recompute
      // against the new current snapshot
      fs.delete(new Path(root, commitRel), true)
      return None
    }
    Some(MergeResult.Committed(newVersion, written.map(_.rows).sum, touched.size, evolved,
      orphaned = !onCurrentChain(newVersion)))
  }

  /** Above this many files per commit, footer row-counts are read on the
    * EXECUTORS (one task per slice of the file list) instead of
    * driver-threads — the manifest step stays O(files / cluster) at
    * thousands-of-buckets scale instead of serializing on the driver. */
  private val DriverManifestMax = 256

  private def listBucketFiles(spark: SparkSession, abs: String, rel: String,
      schemaV: Int, kind: String = "base"): Seq[DataFileEntry] = {
    val stats = Option(fs.globStatus(new Path(abs, s"$BucketCol=*/part-*")))
      .getOrElse(Array()).toSeq
    val named = stats.map { st =>
      val bucket = st.getPath.getParent.getName.stripPrefix(s"$BucketCol=").toInt
      (st.getPath.toString, bucket, st.getPath.getName)
    }
    val counted: Seq[(String, Int, String, SnapTable.FooterStats)] =
      if (named.size <= DriverManifestMax || spark == null) {
        // footer reads are independent -> parallel on the driver
        import scala.collection.parallel.CollectionConverters._
        named.par.map { case (p, b, n) => (p, b, n, SnapTable.footerStats(p, fs.getConf)) }
          .seq.toSeq
      } else {
        val slices = math.min(named.size, spark.sparkContext.defaultParallelism * 2)
        // ship the session's Hadoop conf (spark.hadoop.* — object-store
        // credentials, endpoints) to the executor-side footer readers; a bare
        // new Configuration() there would read the wrong filesystem config
        val serConf = new org.apache.spark.util.SerializableConfiguration(
          spark.sessionState.newHadoopConf())
        spark.sparkContext.parallelize(named, slices).map { case (p, b, n) =>
          (p, b, n, SnapTable.footerStats(p, serConf.value))
        }.collect().toSeq
      }
    counted.map { case (_, bucket, name, st) =>
      DataFileEntry(s"$rel/$BucketCol=$bucket/$name", bucket, schemaV, st.rows, kind,
        st.minLsn, st.maxLsn)
    }
  }

  // ---- pruned read paths ----------------------------------------------------

  /** Bucket of one concrete key (same canonical-cast hash the layout uses),
    * resolved with one driver-local expression eval. */
  private def bucketOf(spark: SparkSession, convId: String, turnIdx: Long,
      buckets: Int): Int =
    spark.range(1).select(pmod(xxhash64(
      graft.model.Schemas.mergeKeyCanonicalTypes.map {
        case ("conv_id", t) => lit(convId).cast(t)
        case (_, t) => lit(turnIdx).cast(t)
      }: _*), lit(buckets)).cast("int")).head().getInt(0)

  /**
   * Point lookup: prune to the single bucket of the key before scanning —
   * IO is O(table/numBuckets), the KV-get path (reference analogue: OTS/
   * HBase row gets). Works in both merge modes (deltas of that bucket are
   * reduced in-path).
   */
  def readKey(spark: SparkSession, convId: String, turnIdx: Long): DataFrame = {
    val snap = snapshot()
    requireBucketFn(snap)
    val b = bucketOf(spark, convId, turnIdx, snap.numBuckets)
    val files = snap.files.filter(_.bucket == b)
    val raw = readAligned(spark, snap, files, snap.schema)
      .filter(col("conv_id") === convId && col("turn_idx") === turnIdx)
    val reduced = if (files.exists(_.kind == "delta")) lwwReduce(raw, snap.schema) else raw
    reduced.filter(col("op") =!= "D").drop("op")
  }

  /** Files that can contain rows with lsn > the watermark (footer-stats
    * pruning; files without stats are conservatively included). */
  private[table] def filesWithLsnAbove(snap: Snapshot, lsnExclusive: Long): Seq[DataFileEntry] =
    snap.files.filter(_.maxLsn.forall(_ > lsnExclusive))

  /**
   * Incremental consumption: every retained change state with
   * `lsn > lsnExclusive` (tombstones INCLUDED — a downstream MERGE needs
   * the deletes), pruned to the files whose footer lsn range overlaps.
   * This is the table acting as a CDC SOURCE for downstream sync: a
   * consumer remembers the max lsn it applied and polls with it. CoW
   * rewrites copy old rows into new files, but the row-level lsn filter
   * still excludes them — consumers see each change exactly once.
   */
  def readChangesSince(spark: SparkSession, lsnExclusive: Long): DataFrame = {
    val snap = snapshot()
    readAligned(spark, snap, filesWithLsnAbove(snap, lsnExclusive), snap.schema)
      .filter(col("lsn") > lsnExclusive)
  }

  /** Highest change lsn this table has applied — the natural resume
    * watermark for an incremental consumer syncing FROM this table (or for
    * deciding that a sync INTO this table has nothing to do). Metadata-only
    * when every manifest entry carries footer stats; falls back to a scan
    * for stat-less files. -1 on an empty table. */
  def maxAppliedLsn(spark: SparkSession): Long = {
    val snap = snapshot()
    if (snap.files.isEmpty) -1L
    else if (snap.files.forall(_.maxLsn.nonEmpty)) snap.files.flatMap(_.maxLsn).max
    else {
      val r = readAligned(spark, snap, snap.files, snap.schema)
        .agg(max(col("lsn"))).head()
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }
  }

  // ---- maintenance ----------------------------------------------------------

  /**
   * Retain the most recent `keepLast` snapshots (always including the
   * current one); delete older snapshot manifests and any data file no
   * retained snapshot references — the time-travel-horizon GC every
   * snapshot table needs (Iceberg's expire_snapshots analogue). Returns
   * (snapshotsDeleted, dataFilesDeleted).
   */
  def expireSnapshots(keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val parsed: Map[Long, Option[Snapshot]] = history.map(v => v ->
      (try Some(snapshot(v)) catch { case scala.util.control.NonFatal(_) => None })).toMap
    // a TORN manifest (crashed writer mid-commit) is invisible to retention
    // accounting — it was never a committed version — and, once past the
    // grace window, is reclaimed here like tryCommit would
    parsed.collect { case (v, None) => v }.foreach(v => reclaimTorn(snapPath(v)): Unit)
    val versions = history.filter(v => parsed.get(v).exists(_.isDefined)).sorted
    val (expire, retain) = versions.splitAt(math.max(0, versions.size - keepLast))
    if (expire.isEmpty) return (0, 0)
    val referenced = retain.flatMap(parsed(_)).flatMap(_.files.map(_.path)).toSet
    val doomed = expire.flatMap(parsed(_)).flatMap(_.files.map(_.path)).toSet -- referenced
    def dirOf(rel: String) = rel.split("/").take(2).mkString("/")
    // a commit dir no retained snapshot reaches is removed WHOLE (it also
    // holds untracked writer artifacts — _SUCCESS, checksums — that would
    // otherwise accrete one dir per expired epoch forever); doomed files
    // inside still-referenced dirs (CoW keeps carrying old commits' files
    // forward) are deleted individually
    val retainedDirs = referenced.map(dirOf)
    val (inDeadDirs, inLiveDirs) = doomed.partition(f => !retainedDirs(dirOf(f)))
    inLiveDirs.foreach(rel => fs.delete(new Path(root, rel), false))
    inDeadDirs.map(dirOf).foreach(d => fs.delete(new Path(root, d), true))
    expire.foreach(v => fs.delete(snapPath(v), false))
    (expire.size, doomed.size)
  }

  /**
   * Merge-on-read upsert: write the batch's own LWW winners as DELTA files
   * (bucketed like the base layout) WITHOUT reading or rewriting any stored
   * data — commit IO is O(batch), independent of table size or touched
   * fraction. The per-key reduce against stored rows is deferred to read
   * time ([[readRaw]]) and to [[compact]].
   *
   * This is the steady-state CDC answer to copy-on-write's degenerate case:
   * when every epoch touches most buckets (uniform update traffic), CoW
   * rewrites the whole table per epoch; MoR amortizes that into periodic
   * compactions. Iceberg's MoR delete/overlay files are the same trade.
   * Exactly-once and schema evolution behave identically to [[merge]] (the
   * epoch rides the same atomic commit).
   */
  def mergeDelta(batch: DataFrame, epoch: Long,
      derived: Derived = Derived.none): MergeResult =
    retryingCommit(mergeDeltaAttempt(batch, epoch, derived))

  private def mergeDeltaAttempt(batch: DataFrame, epoch: Long,
      derived: Derived): Option[MergeResult] = {
    val snap = snapshot()
    requireBucketFn(snap)
    if (epoch <= snap.lastEpoch) return Some(MergeResult.SkippedEpoch)
    val tableSchema = snap.schema
    val target = SnapTable.withDerived(
      SchemaEvolution.merge(tableSchema, batch.schema), derived)
    val evolved = target.toDDL != tableSchema.toDDL
    val schemaVersions =
      if (evolved) snap.schemaVersions + ((snap.currentSchemaV + 1).toString -> target.toDDL)
      else snap.schemaVersions
    val newSchemaV = if (evolved) snap.currentSchemaV + 1 else snap.currentSchemaV

    val reduceSchema = SnapTable.withoutDerived(target, derived)
    val aligned = SchemaEvolution.align(batch, reduceSchema)
      .withColumn(BucketCol, bucketExpr(snap.numBuckets))
    // batch-local LWW (dedupes duplicate delivery inside the epoch) in one
    // bucket-aligned shuffle over the bare envelope (derived columns are
    // projected onto the winners below); stored rows are NOT read —
    // cross-epoch reduce happens at read/compaction
    val winners = SnapTable.lwwWinners(aligned, reduceSchema,
      math.max(1, snap.numBuckets / 4))

    val newVersion = nextVersion(snap.version)
    val commitRel = SnapTable.commitDir(newVersion)
    withLwwAggConf(batch.sparkSession) {
      SnapTable.applyDerived(winners, derived)
        .write.mode("overwrite").partitionBy(BucketCol).parquet(s"$root/$commitRel")
    }
    val written = listBucketFiles(spark = batch.sparkSession, s"$root/$commitRel",
      commitRel, newSchemaV, kind = "delta")
    beforeCommitHook()
    val committed = tryCommit(Snapshot(
      version = newVersion,
      parent = snap.version,
      numBuckets = snap.numBuckets,
      currentSchemaV = newSchemaV,
      schemaVersions = schemaVersions,
      files = snap.files ++ written,
      props = snap.props + (PropLastEpoch -> epoch.toString),
      rows = snap.rows + written.map(_.rows).sum))
    if (!committed) { fs.delete(new Path(root, commitRel), true); return None }
    Some(MergeResult.Committed(newVersion, written.map(_.rows).sum,
      written.map(_.bucket).distinct.size, evolved,
      orphaned = !onCurrentChain(newVersion)))
  }

  /** Number of delta files currently outstanding (compaction-policy input). */
  def deltaFileCount: Int = snapshot().files.count(_.kind == "delta")

  /**
   * Fold all merge-on-read deltas into base files: LWW-reduce the buckets
   * that have deltas and rewrite them as fresh base file groups (buckets
   * with no deltas are untouched). Read cost returns to one scan; the
   * operation is the CoW merge with an empty batch, scheduled by policy
   * instead of per-epoch.
   */
  def compact(spark: SparkSession): Long = {
    // an ORPHANED compact (stalled past the claim grace; a concurrent
    // writer committed ahead on a different parent) rewrote buckets onto a
    // dead branch — the live chain's deltas still stand, so recompute
    // against the current chain rather than report buckets that never
    // landed. Bounded: orphaning needs a >grace-window stall, so repeats
    // mean something is pathologically wrong with this process.
    @annotation.tailrec
    def go(attempt: Int): Long =
      retryingCommit(compactAttempt(spark)) match {
        case MergeResult.Committed(v, _, buckets, _, orphaned) =>
          if (!orphaned) buckets.toLong
          else if (attempt >= 3) {
            System.err.println(s"[snaptable] compact version $v ORPHANED " +
              "3x — giving up; deltas remain and the next policy compaction retries")
            0L
          } else {
            System.err.println(s"[snaptable] compact version $v ORPHANED " +
              "(stalled past claim grace) — recomputing against the current chain")
            go(attempt + 1)
          }
        case MergeResult.SkippedEpoch => 0L
      }
    go(1)
  }

  private def compactAttempt(spark: SparkSession): Option[MergeResult] = {
    val snap = snapshot()
    requireBucketFn(snap)
    val dirty = snap.files.filter(_.kind == "delta").map(_.bucket).toSet
    if (dirty.isEmpty) return Some(MergeResult.SkippedEpoch)
    val (rewrite, keep) = snap.files.partition(f => dirty(f.bucket))
    val target = snap.schema
    val winners = SnapTable.lwwWinners(
      readAligned(spark, snap, rewrite, target)
        .withColumn(BucketCol, bucketExpr(snap.numBuckets)),
      target, math.max(1, dirty.size))
    val newVersion = nextVersion(snap.version)
    val commitRel = SnapTable.commitDir(newVersion)
    // compaction is the read-optimization pass: cluster rows by merge key
    // within each bucket file so parquet row-group min/max stats line up
    // with key ranges — point lookups (readKey) skip row groups, and
    // key-adjacent text compresses better. Ingest never pays this sort.
    withLwwAggConf(spark) {
      winners
        .sortWithinPartitions((BucketCol +: Schemas.keyCols).map(col): _*)
        .write.mode("overwrite").partitionBy(BucketCol).parquet(s"$root/$commitRel")
    }
    val written = listBucketFiles(spark, s"$root/$commitRel", commitRel, snap.currentSchemaV)
    beforeCommitHook()
    val committed = tryCommit(snap.copy(version = newVersion, parent = snap.version,
      files = keep ++ written, rows = keep.map(_.rows).sum + written.map(_.rows).sum))
    if (!committed) { fs.delete(new Path(root, commitRel), true); return None }
    // bucketsRewritten carries the FILE count here (compact's caller-facing
    // "filesRewritten" metric)
    Some(MergeResult.Committed(newVersion, written.map(_.rows).sum, rewrite.size, false,
      orphaned = !onCurrentChain(newVersion)))
  }

  /**
   * Layout evolution: rewrite the table into `newBuckets` hash buckets —
   * the operation that keeps bucket ≈ task-sized as a table grows 100x
   * (Iceberg's partition-spec evolution analogue; unlike schema evolution
   * this IS a full rewrite, scheduled like a compaction). Outstanding
   * deltas fold in on the way through; history stays time-travelable
   * (older snapshots keep the old layout — bucket pruning always uses the
   * snapshot's own numBuckets). Note for incremental consumers: the
   * rewritten files carry the table's max lsn, so the next
   * [[readChangesSince]] poll scans them all once (its row-level lsn
   * filter still yields only true changes — a one-time IO spike, not a
   * correctness issue).
   */
  def rebucket(spark: SparkSession, newBuckets: Int): Unit = {
    require(newBuckets >= 1, "need at least one bucket")
    // an ORPHANED rebucket landed the new layout on a dead branch — the
    // live chain still has the OLD layout and stamp, so silently returning
    // would leave the caller believing a migration that never happened.
    // Recompute against the current chain; if it keeps orphaning, fail
    // loudly — an explicit migration must not no-op.
    @annotation.tailrec
    def go(attempt: Int): Unit =
      retryingCommit(rebucketAttempt(spark, newBuckets)) match {
        case MergeResult.Committed(v, _, _, _, true) =>
          if (attempt >= 3)
            throw new IllegalStateException(s"rebucket version $v orphaned " +
              "3x (writer repeatedly stalled past the claim grace window) — " +
              "layout NOT migrated")
          System.err.println(s"[snaptable] rebucket version $v ORPHANED " +
            "(stalled past claim grace) — recomputing against the current chain")
          go(attempt + 1)
        case _ => ()
      }
    go(1)
  }

  private def rebucketAttempt(spark: SparkSession, newBuckets: Int): Option[MergeResult] = {
    val snap = snapshot()
    val target = snap.schema
    val all = readAligned(spark, snap, snap.files, target)
      .withColumn(BucketCol, bucketExpr(newBuckets))
    val winners = SnapTable.lwwWinners(all, target, newBuckets)
    val newVersion = nextVersion(snap.version)
    val commitRel = SnapTable.commitDir(newVersion)
    withLwwAggConf(spark) {
      winners
        .sortWithinPartitions((BucketCol +: Schemas.keyCols).map(col): _*)
        .write.mode("overwrite").partitionBy(BucketCol).parquet(s"$root/$commitRel")
    }
    val written = listBucketFiles(spark, s"$root/$commitRel", commitRel, snap.currentSchemaV)
    beforeCommitHook()
    // stamps the CURRENT hash version: rebucket rewrites every row under
    // this build's bucketExpr, so it is the migration path for tables laid
    // out by an older hash
    val committed = tryCommit(snap.copy(version = newVersion, parent = snap.version,
      numBuckets = newBuckets, files = written, rows = written.map(_.rows).sum,
      props = snap.props + (PropBucketFn -> BucketFnVersion.toString)))
    if (!committed) { fs.delete(new Path(root, commitRel), true); return None }
    Some(MergeResult.Committed(newVersion, written.map(_.rows).sum, newBuckets, false,
      orphaned = !onCurrentChain(newVersion)))
  }

  /** Drop tombstones older than `lsnWatermark` by rewriting their buckets —
    * the compaction that bounds tombstone retention. Outstanding
    * merge-on-read deltas are compacted first so the rewrite sees (and
    * keeps) only winner rows. */
  def expireTombstones(spark: SparkSession, lsnWatermark: Long): Long = {
    compact(spark)
    val snap = snapshot()
    requireBucketFn(snap)
    val target = snap.schema
    val all = readAligned(spark, snap, snap.files, target)
    val expired = all.filter(col("op") === "D" && col("lsn") < lsnWatermark)
    val n = expired.count()
    if (n == 0) return 0
    val buckets = expired.select(bucketExpr(snap.numBuckets).as(BucketCol))
      .distinct().collect().map(_.getInt(0)).toSet
    val (rewrite, keep) = snap.files.partition(f => buckets(f.bucket))
    val kept = readAligned(spark, snap, rewrite, target)
      .filter(!(col("op") === "D" && col("lsn") < lsnWatermark))
      .withColumn(BucketCol, bucketExpr(snap.numBuckets))
    val newVersion = nextVersion(snap.version)
    val commitRel = SnapTable.commitDir(newVersion)
    kept.repartition(math.max(1, buckets.size), col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(s"$root/$commitRel")
    val written = listBucketFiles(spark, s"$root/$commitRel", commitRel, snap.currentSchemaV)
    // stamp the horizon IN the same commit that drops the tombstones, so a
    // resuming consumer can detect (and refuse) a watermark the expiry has
    // outrun — see [[tombstoneHorizonLsn]]
    val horizon = math.max(lsnWatermark,
      snap.props.get(PropTombstoneHorizon).map(_.toLong).getOrElse(-1L))
    commit(snap.copy(version = newVersion, parent = snap.version,
      files = keep ++ written, rows = written.map(_.rows).sum + keep.map(_.rows).sum,
      props = snap.props + (PropTombstoneHorizon -> horizon.toString)))
    n
  }

  /** The lsn watermark below which delete tombstones have been physically
    * expired (-1 = never expired, every tombstone retained). An incremental
    * consumer that last applied lsn `from` still sees every change it needs
    * iff `from >= horizon - 1`; below that, deletes it never applied are
    * GONE and the consumer must full-resync — [[graft.cdc.Sync]] enforces
    * this fail-fast instead of silently keeping deleted rows forever. */
  def tombstoneHorizonLsn: Long =
    snapshot().props.get(SnapTable.PropTombstoneHorizon).map(_.toLong).getOrElse(-1L)
}

object SnapTable {
  val BucketCol = "__bucket"
  val PropLastEpoch = "graft.lastEpoch"
  /** Manifest property recording which bucket-hash version laid out the
    * data files; see [[SnapTable.requireBucketFn]]. Version history:
    * 1 = raw-typed xxhash64 (int turn_idx hashed as int);
    * 2 = canonically-cast xxhash64 (integral keys hashed as long). */
  val PropBucketFn = "graft.bucketFn"
  val BucketFnVersion = 2
  /** Manifest property recording the lsn watermark below which delete
    * tombstones have been PHYSICALLY expired ([[SnapTable.expireTombstones]]).
    * Incremental consumers resuming from a watermark below this horizon can
    * never be delivered the expired deletes — sync paths must fail fast and
    * full-resync instead of silently keeping deleted rows. */
  val PropTombstoneHorizon = "graft.tombstoneHorizonLsn"
  /** How old an UNPARSEABLE snapshot manifest must be before a commit
    * attempt reclaims its version (deletes it and takes the claim). Covers
    * the hard-crash window of the exclusive-create commit protocol: a
    * writer that died between claim and close leaves a torn file that
    * would otherwise own its version forever. Large enough that a live
    * writer's claim-to-close window (milliseconds — one small JSON write)
    * can never be mistaken for a corpse; mutable for tests only. */
  @volatile private[table] var tornManifestGraceMs: Long = 60000L
  /** Per-job raised ObjectHashAggregate fallback threshold for the merge
    * reduce (see `withLwwAggConf`): keys per task there are winners per
    * touched bucket, kept task-sized by layout (rebucket), so removing the
    * sort fallback up to 4M keys cannot pin unbounded memory. */
  val LwwFallbackThreshold = 4194304

  /** One lock object per SparkSession for `withLwwAggConf` (weak keys: a
    * dropped session's lock is collectable). */
  private val lwwConfLocks =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Object]())
  private def lwwConfLock(spark: SparkSession): Object =
    lwwConfLocks.synchronized {
      var l = lwwConfLocks.get(spark)
      if (l == null) { l = new Object; lwwConfLocks.put(spark, l) }
      l
    }

  /**
   * Per-key LWW winners of a frame that carries [[BucketCol]], reduced in
   * ONE shuffle that doubles as the file layout: the explicit repartition
   * on the bucket column is a grouping column of the aggregation, so
   * `HashPartitioning(__bucket)` satisfies the aggregation's
   * ClusteredDistribution (bucket is a pure function of the merge keys —
   * rows of one key can never land in two partitions) and Catalyst inserts
   * no second exchange between the reduce and the partitionBy write.
   * `PlanQualitySpec` pins the single-exchange plan.
   */
  private[graft] def lwwWinners(df: DataFrame, target: StructType,
      numParts: Int): DataFrame = {
    val dataCols = target.fields.map(_.name)
    // native lww_winner instead of max_by: max_by's struct buffer is not
    // hash-aggregatable, which planned the whole reduce as a SortAggregate
    // (every change event sorted by key); the typed-imperative aggregate
    // keeps one (ts, lsn, row) state per key in ObjectHashAggregate's hash
    // map — one probe + compare per event, no sort
    df.repartition(numParts, col(BucketCol))
      .groupBy((graft.model.Schemas.mergeKeys :+ BucketCol).map(col): _*)
      .agg(graft.functions.LwwWinner.lwwWinner(
        struct(dataCols.toIndexedSeq.map(col): _*), col("ts"), col("lsn")).as("w"))
      .select((col(BucketCol) +: dataCols.map(n => col(s"w.$n").as(n))).toIndexedSeq: _*)
  }

  /** Data directory for one commit ATTEMPT: version-prefixed for humans,
    * uniquely suffixed so two writers optimistically targeting the same
    * version never share a directory — the loser's write and its conflict
    * cleanup can only ever touch its own files. */
  private[table] def commitDir(version: Long): String =
    f"data/c$version%08d-${java.util.UUID.randomUUID().toString.take(8)}"

  /** Extend a merge target schema with derived columns not already present. */
  private[table] def withDerived(target: StructType, derived: Derived): StructType =
    derived.cols.foldLeft(target)((s, d) =>
      if (s.fieldNames.contains(d.name)) s
      else s.add(StructField(d.name, d.dataType, nullable = true)))

  /** Drop derived columns from the schema the replay-regime LWW reduce
    * runs over — they are pure functions of the winner row, and when the
    * batch dominates the stored side, carrying them (even as nulls:
    * UnsafeRow slots are fixed-width) through the shuffle of every change
    * event costs more than re-deriving the rewritten buckets' winners
    * afterwards. The steady-state regime (stored >> batch) instead reduces
    * under mergeAttempt's carrySchema so survivors keep stored values. */
  private[table] def withoutDerived(target: StructType, derived: Derived): StructType =
    if (derived.isEmpty) target
    else {
      val names = derived.cols.map(_.name).toSet
      StructType(target.fields.filterNot(f => names(f.name)))
    }

  /** Project derived columns onto winner rows: the shared prelude runs
    * once per row needing derivation, the generators read from it. Columns
    * already present (e.g. a compaction input) keep non-null stored values
    * via a gated coalesce; absent columns are computed outright. */
  private[graft] def applyDerived(winners: DataFrame, derived: Derived): DataFrame =
    if (derived.isEmpty) winners
    else {
      val present = derived.cols.filter(d => winners.columns.contains(d.name))
      val gate = present.map(d => col(d.name).isNull)
        .reduceOption(_ || _).getOrElse(lit(true))
      val withPrelude = derived.prelude.foldLeft(winners) { case (df, (n, c)) =>
        df.withColumn(n, when(gate, c))
      }
      val filled = derived.cols.foldLeft(withPrelude)((df, d) =>
        df.withColumn(d.name,
          if (winners.columns.contains(d.name))
            coalesce(col(d.name), d.expr.cast(d.dataType))
          else d.expr.cast(d.dataType)))
      if (derived.prelude.isEmpty) filled else filled.drop(derived.prelude.map(_._1): _*)
    }

  final case class FooterStats(rows: Long, minLsn: Option[Long], maxLsn: Option[Long])

  /** Parquet footer stats (metadata-only read): row count + lsn column
    * min/max from the row-group statistics. Runs on the driver for narrow
    * commits, on executors for wide ones. */
  private[table] def footerStats(path: String, conf: Configuration): FooterStats = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(path), conf))
    try {
      val rows = r.getRecordCount
      val lsnStats = r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala
        .filter(_.getPath.toDotString == "lsn").map(_.getStatistics))
      val bounds =
        if (lsnStats.isEmpty || lsnStats.exists(s => s == null || !s.hasNonNullValue)) None
        else Some((
          lsnStats.map(_.genericGetMin.asInstanceOf[Number].longValue()).min,
          lsnStats.map(_.genericGetMax.asInstanceOf[Number].longValue()).max))
      FooterStats(rows, bounds.map(_._1), bounds.map(_._2))
    } finally r.close()
  }

  /** Key columns for merge/bucketing (fixed for the transcript table). */
  object Schemas {
    val keyCols: Seq[String] = graft.model.Schemas.mergeKeys
  }

  private def filesystem(root: String, spark: SparkSession): FileSystem =
    new Path(root).getFileSystem(
      if (spark == null) new Configuration() else spark.sessionState.newHadoopConf())

  def create(spark: SparkSession, root: String, schema: StructType,
      numBuckets: Int = 32): SnapTable = {
    val fs = filesystem(root, spark)
    val t = new SnapTable(root, fs)
    fs.mkdirs(new Path(root, "meta"))
    require(!fs.exists(new Path(new Path(root, "meta"), "snap-00000000.json")),
      s"table already exists at $root")
    val envelope = StructType(schema.fields ++
      Seq("ts" -> TimestampType, "lsn" -> LongType, "op" -> StringType)
        .filterNot { case (n, _) => schema.fieldNames.contains(n) }
        .map { case (n, t0) => StructField(n, t0) })
    t.commit(Snapshot(0L, -1L, numBuckets, 1,
      Map("1" -> envelope.toDDL), Seq.empty,
      Map(PropBucketFn -> BucketFnVersion.toString), 0L))
    t
  }

  def load(spark: SparkSession, root: String): SnapTable =
    new SnapTable(root, filesystem(root, spark))

  /** Whether a table exists at `root`, checked through the root's OWN
    * Hadoop filesystem — `java.io.File` probes only work on `file://`
    * paths and would silently report "absent" for any other scheme,
    * sending callers down the create path over live data. */
  def exists(spark: SparkSession, root: String): Boolean =
    filesystem(root, spark).exists(
      new Path(new Path(root, "meta"), "snap-00000000.json"))
}
