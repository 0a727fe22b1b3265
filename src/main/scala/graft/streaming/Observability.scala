package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

/**
 * Streaming observability parity (SURVEY.md §2.6). The reference aggregates
 * per-task counters into a Communication tree and prints a job report
 * (reference: core/.../statistics/communication/CommunicationTool.java:16-50,
 * PerfTrace/JobContainer.java:575-647). Spark-native form: a
 * StreamingQueryListener capturing per-batch `StreamingQueryProgress`
 * (inputRowsPerSecond, batchDuration, rows) to JSONL — alongside the table's
 * own per-epoch lineage records.
 */
final class ProgressListener(outDir: String) extends StreamingQueryListener {

  val progress = new ConcurrentLinkedQueue[String]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    progress.add(e.progress.json)
    val p = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve(f"progress-${e.progress.batchId}%08d.json"),
      e.progress.json.getBytes(StandardCharsets.UTF_8))
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}

/**
 * Watermarked event-time aggregation over the change stream — the standard
 * Structured Streaming shape (readStream -> withWatermark -> windowed
 * groupBy) for monitoring change-rate per operation type. Late events beyond
 * the watermark are dropped from the AGGREGATE only; the merge path is
 * unaffected (its correctness never depends on the watermark — LWW ordering
 * is monotone, SURVEY.md §7.4 risk 2).
 */
object StreamAggregates {

  /** events per (1-hour event-time window, op), append-mode capable. */
  def changeRates(stream: DataFrame, watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("op"))
      .agg(count(lit(1)).as("n"), min("lsn").as("min_lsn"), max("lsn").as("max_lsn"))
      .select(unix_micros(col("window.start")).as("window_start_us"), col("op"),
        col("n"), col("min_lsn"), col("max_lsn"))

  /** Batch-mode equivalent for conformance checks. */
  def changeRatesBatch(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour"), col("op"))
      .agg(count(lit(1)).as("n"), min("lsn").as("min_lsn"), max("lsn").as("max_lsn"))
      .select(unix_micros(col("window.start")).as("window_start_us"), col("op"),
        col("n"), col("min_lsn"), col("max_lsn"))
}
