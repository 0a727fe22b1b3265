package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed in partition-batched decode/feature stages.
 *
 * The actual media decode is STUBBED (no image/audio libraries in this
 * container): [[StubDecoder]] is a deterministic fake standing in for a
 * JNI/pandas decoder. Everything around it — the schema, the per-partition
 * batch shape, the partition sizing, the feature layout — is the real Spark
 * plumbing a production decoder would drop into.
 */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("payload", BinaryType)))

  final case class MediaRow(media_id: Long, kind: String, mime: String,
      width: Integer, height: Integer, duration_ms: java.lang.Long, payload: Array[Byte])

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      byte_mean: Double, byte_entropy: Double, feature: Array[Float])

  /**
   * ======== STUB ========
   * Deterministic fake decoder: derives a 16-dim "feature" from byte
   * statistics. A real deployment replaces this object with an actual
   * decoder (e.g. JNI image lib / `mapInPandas` with PIL on PySpark) — the
   * call site, batching, and output schema stay identical.
   */
  object StubDecoder {
    def decode(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Long](16)
      var i = 0
      while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1; i += 1 }
      val n = math.max(1, payload.length).toFloat
      hist.map(_ / n)
    }
  }

  private def entropy(payload: Array[Byte]): Double = {
    if (payload.isEmpty) return 0.0
    val counts = new Array[Long](256)
    payload.foreach(b => counts(b & 0xff) += 1)
    val n = payload.length.toDouble
    -counts.filter(_ > 0).map { c => val p = c / n; p * math.log(p) / math.log(2) }.sum
  }

  /**
   * Feature extraction: one pass per partition, decoder invoked per row but
   * amortized per partition (connection/model setup happens once per
   * partition, the pattern a real model/codec needs). Partition sizing is
   * the caller's lever: `repartition(n)` so each partition's payload bytes
   * fit executor memory.
   */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder setup would go here (model load, codec init)
      rows.map { r =>
        val payload = if (r.payload == null) Array.empty[Byte] else r.payload
        MediaFeatures(r.media_id, r.kind, payload.length.toLong,
          if (payload.isEmpty) 0.0 else payload.map(_ & 0xff).sum.toDouble / payload.length,
          entropy(payload),
          StubDecoder.decode(payload))
      }
    }
  }

  /** Deterministic synthetic media table derived from a text frame (test
    * fixture: payload = utf-8 bytes standing in for real media bytes). */
  def syntheticMedia(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.select(
      col(idCol).as("media_id").cast("long"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      lit("application/octet-stream").as("mime"),
      (pmod(col(idCol), lit(64)) * 16 + 16).cast("int").as("width"),
      (pmod(col(idCol), lit(48)) * 16 + 16).cast("int").as("height"),
      (pmod(col(idCol), lit(60)) * 1000).cast("long").as("duration_ms"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Frame-sample stand-in: split payload into `frames` equal byte windows
    * (the batch/window shape of video frame sampling). */
  def frameSample(spark: SparkSession, media: DataFrame, frames: Int): DataFrame =
    media.select(col("media_id"),
      posexplode(expr(
        s"""transform(sequence(0, $frames - 1), f ->
           |  substring(payload, f * greatest(int(length(payload) / $frames), 1) + 1,
           |            greatest(int(length(payload) / $frames), 1)))""".stripMargin))
        .as(Seq("frame_idx", "frame_bytes")))
      .withColumn("frame_hash", md5(col("frame_bytes")))
}
