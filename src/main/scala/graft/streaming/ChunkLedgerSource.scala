package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * Streaming MANIFEST source for an append-only, chunk-per-directory
 * changelog (`<root>/chunk=00000/...parquet`): each micro-batch emits one
 * row per data FILE of the newly-arrived chunk directories — (chunk, path,
 * bytes) — and the pipeline reads the listed files itself.
 *
 * Why this exists: Spark's built-in file streaming source re-lists the
 * whole tree every trigger and holds every seen file in a driver-side map —
 * at 10^6+ changelog files the listing and the map dominate trigger
 * latency. Here the OFFSET is the last consumed chunk-directory name, so a
 * trigger costs one listing of the top-level chunk dirs (O(chunks), not
 * O(files)) plus one listing of only the NEW chunks, and there is no
 * seen-file state at all. This is the Spark-native shape of the
 * reference's stream-reader master planning shards and handing each worker
 * a bounded range (reference: otsstreamreader/.../core/
 * OTSStreamReaderMasterProxy.java:78-107).
 *
 * Contract: chunk directory names under the root are lexicographically
 * monotone in arrival order (zero-padded, as the generator writes them),
 * a chunk is immutable once its `_SUCCESS` marker exists, and only marked
 * chunks are admitted — a writer mid-chunk is simply not visible yet.
 *
 * Exactly-once composes the usual way: the checkpointed chunk offset gives
 * at-least-once manifest delivery, and the snapshot table's epoch guard
 * makes the replayed merge a no-op.
 */
class ChunkLedgerSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChunkLedgerSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    // properties arrive with the caller's original key case
    val opts = new CaseInsensitiveStringMap(properties)
    new ChunkLedgerTable(opts.get("path"),
      Option(opts.get("maxChunksPerTrigger")).map(_.toInt).getOrElse(1))
  }
}

object ChunkLedgerSource {
  val schema: StructType = new StructType()
    .add("chunk", StringType).add("path", StringType).add("bytes", LongType)
}

private[streaming] class ChunkLedgerTable(root: String, maxChunksPerTrigger: Int)
    extends Table with SupportsRead {
  require(root != null, "ChunkLedgerSource needs a 'path' option")
  override def name(): String = s"chunk_ledger($root)"
  override def schema(): StructType = ChunkLedgerSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ChunkLedgerSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ChunkLedgerStream(root, maxChunksPerTrigger)
      }
    }
}

/** Offset = name of the last fully-consumed chunk directory ("" = none). */
private[streaming] case class ChunkOffset(lastChunk: String) extends Offset {
  override def json: String =
    s"""{"lastChunk":"${lastChunk.replace("\\", "\\\\").replace("\"", "\\\"")}"}"""
}

private[streaming] class ChunkLedgerStream(root: String, maxChunksPerTrigger: Int)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def fs = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    new Path(root).getFileSystem(conf)
  }

  /** Committed (complete, `_SUCCESS`-marked) chunk dir names, sorted. One
    * top-level listing — O(chunks) driver work per call. */
  private def completeChunks(): Seq[String] = {
    val f = fs
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) return Nil
    f.listStatus(rootPath).filter(_.isDirectory).map(_.getPath)
      .filter(p => f.exists(new Path(p, "_SUCCESS")))
      .map(_.getName).sorted.toSeq
  }

  /** Pinned end for Trigger.AvailableNow: everything present at prepare
    * time is drained (across as many rate-limited batches as needed) and
    * nothing admitted past it. */
  @volatile private var availableNowTarget: Option[String] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(completeChunks().lastOption.getOrElse(""))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def initialOffset(): Offset = ChunkOffset("")

  override def deserializeOffset(json: String): Offset = {
    // minimal parse of the single-field object this class itself writes
    val m = """\{"lastChunk":"(.*)"\}""".r
    json match {
      case m(v) => ChunkOffset(v.replace("\\\"", "\"").replace("\\\\", "\\"))
      case other => throw new IllegalArgumentException(s"bad ChunkOffset json: $other")
    }
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is used")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[ChunkOffset].lastChunk
    val fresh = completeChunks().filter(_ > from)
    val capped = availableNowTarget match {
      case Some(target) => fresh.filter(_ <= target)
      case None => fresh
    }
    // admission = the source's own chunk cap INTERSECTED with whatever cap
    // the engine passed in `limit` — Trigger.AvailableNow and future rate
    // configs hand composite ReadLimits here, and ignoring them would
    // silently over-admit the day a maxOffsets/maxFiles knob is set
    val chunkCapped = capped.take(math.max(1, maxChunksPerTrigger))
    val admitted = maxFilesOf(limit) match {
      case None => chunkCapped
      case Some(cap) =>
        // whole chunks are the offset granularity: admit chunks while the
        // cumulative data-file count stays within the cap, but always at
        // least one chunk so a cap below the smallest chunk cannot stall
        // the stream forever (same first-file guarantee as the built-in
        // file source)
        val f = fs
        var files = 0L
        chunkCapped.takeWhile { c =>
          val n = f.listStatus(new Path(new Path(root), c))
            .count(s => s.isFile && !s.getPath.getName.startsWith("_")).toLong
          files += n
          files <= cap || files == n
        }
    }
    if (admitted.isEmpty) start else ChunkOffset(admitted.last)
  }

  /** Tightest file/row cap carried by `limit`, if any. This source's rows
    * ARE data files (one manifest row per file), so ReadMaxRows and
    * ReadMaxFiles bound the same quantity; ReadMinRows is a floor, not a
    * cap, and ReadAllAvailable is unbounded. */
  private def maxFilesOf(limit: ReadLimit): Option[Long] = limit match {
    case f: ReadMaxFiles => Some(f.maxFiles().toLong)
    case r: ReadMaxRows => Some(r.maxRows())
    case c: CompositeReadLimit =>
      c.getReadLimits.toSeq.flatMap(maxFilesOf).minOption
    case _ => None
  }

  override def reportLatestOffset(): Offset =
    ChunkOffset(completeChunks().lastOption.getOrElse(""))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[ChunkOffset].lastChunk
    val to = end.asInstanceOf[ChunkOffset].lastChunk
    val f = fs
    completeChunks().filter(c => c > from && c <= to).map { c =>
      val files = f.listStatus(new Path(new Path(root), c))
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
        .map(s => (s.getPath.toString, s.getLen))
      ChunkPartition(c, files): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = ChunkReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[streaming] case class ChunkPartition(chunk: String,
    files: Array[(String, Long)]) extends InputPartition

private[streaming] object ChunkReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChunkPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.files.length }
      override def get(): InternalRow = {
        val (path, bytes) = p.files(i)
        InternalRow(UTF8String.fromString(p.chunk), UTF8String.fromString(path),
          bytes)
      }
      override def close(): Unit = ()
    }
  }
}
