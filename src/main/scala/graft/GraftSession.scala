package graft

import org.apache.spark.sql.SparkSession

/**
 * Session factory with the engine's standard tuning. Local mode is a sandbox
 * stand-in for a multi-executor cluster: everything here (AQE, shuffle
 * partition sizing, broadcast threshold) is what we would set cluster-side.
 */
object GraftSession {

  def builder(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      // Match local parallelism, not the 200 default (sized up on a real
      // cluster to ~2-3x total cores; AQE coalesces the excess).
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // ObjectHashAggregate (the typed-imperative lww_winner reduce) keeps
      // one full row per key in an UNSPILLABLE hash map; this threshold is
      // its only memory guard. 262144 keys x ~1-2 KB transcript row ≈
      // 256-512 MB per task — inside a standard 4-core/8GB executor slot —
      // and far above the 128 default that would sort immediately. The
      // merge hot path additionally raises it per-job (SnapTable scopes
      // LwwFallbackThreshold around its reduce, where bucket sizing bounds
      // keys per task); everything else keeps this graceful fallback.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")

  def get(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
