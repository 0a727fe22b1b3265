package graft.sources

import graft.functions.DataXTransforms
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Typed file-source parity layer: the reference's unstructured-storage
 * readers project raw delimited lines through a user `column` list of
 * `{index|value, type, format}` entries with nullFormat and per-column date
 * formats (reference: plugin-unstructured-storage-util/.../reader/
 * ColumnEntry.java:1-63, consumed at UnstructuredStorageReaderUtil.java:
 * 343-492; one-task-per-file split TxtFileReader.java:213-234).
 *
 * Spark-native form: `spark.read.csv` (file splits, compression codecs, and
 * parallelism are built-in — the reference's one-task-per-file split is
 * subsumed by Spark's size-based file splitting) + a Catalyst projection
 * built from the column specs. Cast failures yield null cells that compose
 * with the dirty sideband ([[graft.cdc.Dirty]]), mirroring the reference's
 * dirty-record routing on cast errors.
 */
object TypedFileSource {

  /** One output column: either a source field by `index`, or a `value`
    * constant (the reference's const-column support). */
  final case class ColumnSpec(
      index: Option[Int] = None,
      value: Option[String] = None,
      `type`: String = "string",
      format: Option[String] = None,
      name: Option[String] = None)

  final case class CsvConfig(
      fieldDelimiter: String = ",",
      encoding: String = "UTF-8",
      nullFormat: Option[String] = None,
      skipHeader: Boolean = false,
      compression: Option[String] = None) // gzip/bzip2/... auto-detected by ext

  private def castTo(c: Column, typ: String, format: Option[String]): Column =
    typ.toLowerCase match {
      case "string" => c
      case "long" | "int" | "bigint" => DataXTransforms.checkedLong(c)
      case "double" | "decimal" => c.try_cast("double")
      case "bool" | "boolean" => c.try_cast("boolean")
      case "bytes" | "binary" => encode(c, "UTF-8")
      case "date" | "datetime" | "timestamp" => format match {
        case Some(f) => try_to_timestamp(c, lit(f))
        case None => DataXTransforms.castLadderTimestamp(c)
      }
      case other => throw new IllegalArgumentException(s"column type '$other'")
    }

  /** Typed `column`-list projection over an already-loaded frame (shared by
    * the CSV and ORC paths — the reference routes both through the same
    * ColumnEntry projection, DFSUtil.java:292-364 for ORC). */
  private def project(raw: DataFrame, columns: Seq[ColumnSpec],
      nullFormat: Option[String]): DataFrame = {
    val srcCols = raw.columns
    val projected = columns.zipWithIndex.map { case (spec, i) =>
      val base: Column = (spec.index, spec.value) match {
        case (Some(idx), _) =>
          require(idx >= 0 && idx < srcCols.length,
            s"column index $idx out of range (${srcCols.length} fields)")
          col(srcCols(idx))
        case (None, Some(v)) => lit(v)
        case _ => throw new IllegalArgumentException(
          s"column $i needs either index or value")
      }
      val nulled = nullFormat match {
        case Some(nf) => when(base === nf, lit(null).cast("string")).otherwise(base)
        case None => base
      }
      castTo(nulled, spec.`type`, spec.format).as(spec.name.getOrElse(s"col$i"))
    }
    raw.select(projected: _*)
  }

  /** Read CSV file(s) and project through the column specs. */
  def readCsv(spark: SparkSession, paths: Seq[String], columns: Seq[ColumnSpec],
      cfg: CsvConfig = CsvConfig()): DataFrame = {
    val raw = spark.read
      .option("sep", cfg.fieldDelimiter)
      .option("encoding", cfg.encoding)
      .option("header", cfg.skipHeader.toString)
      .option("inferSchema", "false")
      .csv(paths: _*)
    project(raw, columns, cfg.nullFormat)
  }

  /** Read ORC file(s) through the same typed projection (reference:
    * hdfsreader/.../DFSUtil.java:292-364 — ORC rows routed through the
    * identical ColumnEntry list as text). An empty column list reads the
    * file's own schema unchanged. */
  def readOrc(spark: SparkSession, paths: Seq[String],
      columns: Seq[ColumnSpec] = Nil): DataFrame = {
    val raw = spark.read.orc(paths: _*)
    if (columns.isEmpty) raw else project(raw, columns, None)
  }
}

/**
 * Writer parity: the reference's text/hdfs writers support writeMode
 * append / nonConflict / truncate, write into a job-scoped temp dir and
 * rename at post() — a two-phase commit (reference: hdfswriter/.../
 * HdfsWriter.java:149-187, 288-321; TxtFileWriter.java:1-342). Spark's
 * FileOutputCommitter provides the same staging+rename; writeModes map to
 * SaveModes.
 */
object TypedFileSink {

  final case class WriteConfig(
      fieldDelimiter: String = ",",
      nullFormat: String = "\\N",
      dateFormat: String = "yyyy-MM-dd HH:mm:ss",
      compression: Option[String] = None,
      writeMode: String = "append") // append | nonConflict | truncate

  def writeCsv(df: DataFrame, path: String, cfg: WriteConfig = WriteConfig()): Unit = {
    val mode = cfg.writeMode match {
      case "append" => "append"
      case "nonConflict" => "errorifexists"
      case "truncate" => "overwrite"
      case other => throw new IllegalArgumentException(s"writeMode '$other'")
    }
    // stringify timestamps with the configured format (the reference casts
    // every cell to its text form before writing)
    val out = df.select(df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType | DateType =>
          date_format(col(f.name), cfg.dateFormat).as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)
    val w = out.write
      .option("sep", cfg.fieldDelimiter)
      .option("nullValue", cfg.nullFormat)
      .mode(mode)
    cfg.compression.fold(w)(c => w.option("compression", c)).csv(path)
  }

  /** ORC sink with the same writeMode trio (reference: hdfswriter ORC write
    * via OrcSerde, HdfsHelper.java:362-478; staging+rename commit is Spark's
    * FileOutputCommitter). Values keep their types — ORC is self-describing,
    * so no text stringification. */
  def writeOrc(df: DataFrame, path: String, cfg: WriteConfig = WriteConfig()): Unit = {
    val mode = cfg.writeMode match {
      case "append" => "append"
      case "nonConflict" => "errorifexists"
      case "truncate" => "overwrite"
      case other => throw new IllegalArgumentException(s"writeMode '$other'")
    }
    val w = df.write.mode(mode)
    cfg.compression.fold(w)(c => w.option("compression", c)).orc(path)
  }
}
