package graft.sources

import graft.functions.DataXTransforms
import org.apache.hadoop.fs.Path
import org.apache.hadoop.hive.ql.io.RCFileInputFormat
import org.apache.hadoop.hive.serde2.columnar.BytesRefArrayWritable
import org.apache.hadoop.io.{LongWritable, Text, Writable}
import org.apache.hadoop.mapred.SequenceFileInputFormat
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets.UTF_8

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

  /** Parquet through the same projection (reference hdfsreader PARQUET branch,
    * DFSUtil.java:367-422). */
  def readParquet(spark: SparkSession, paths: Seq[String],
      columns: Seq[ColumnSpec] = Nil): DataFrame = {
    val raw = spark.read.parquet(paths: _*)
    if (columns.isEmpty) raw else project(raw, columns, None)
  }

  /** Classify magic bytes into a file format tag. Exposed for tests.
    * Reference: hdfsreader/.../DFSUtil.java:524-695 (checkHdfsFileType —
    * ORC postscript probe, SEQ/RC header probe, CSV fallthrough). */
  private[graft] def detectMagic(head: Array[Byte], n: Int): String = {
    def is(s: String): Boolean = {
      val m = s.getBytes(UTF_8)
      n >= m.length && m.indices.forall(i => head(i) == m(i))
    }
    if (is("ORC")) "orc"
    else if (is("PAR1")) "parquet"
    else if (is("RCF")) "rc" // modern RCFile magic; pre-0.9 RC files carry a
    // SEQ v6 header and will sniff as "seq" — readSeq fails fast on those.
    else if (is("SEQ")) "seq"
    else if (n >= 2 && (head(0) & 0xff) == 0x1f && (head(1) & 0xff) == 0x8b) "gzip"
    else if (is("BZh")) "bzip2"
    else if (is("PK")) "zip"
    else "text"
  }

  /** Sniff the on-disk format of `path` (a file, or a directory whose first
    * data file is probed) from its leading magic bytes — the reference
    * auto-detects ORC/SEQ/RC/CSV when the job omits `fileType`
    * (DFSUtil.java:524-695). Runs one driver-side 4-byte read; at 100 TB the
    * cost is a single FS open, not a scan. */
  def sniffFormat(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val file =
      if (st.isDirectory) {
        val kids = fs.listStatus(p).filter { s =>
          val nm = s.getPath.getName
          s.isFile && s.getLen > 0 && !nm.startsWith("_") && !nm.startsWith(".")
        }
        require(kids.nonEmpty, s"no data files to sniff under $path")
        kids.minBy(_.getPath.getName).getPath
      } else p
    val head = new Array[Byte](4)
    val in = fs.open(file)
    val n =
      try {
        var off = 0
        var r = 0
        while (off < head.length && { r = in.read(head, off, head.length - off); r > 0 }) off += r
        off
      } finally in.close()
    detectMagic(head, n)
  }

  /** Parse a dataset of raw delimited lines through the typed projection —
    * the shared tail of the SEQ / compressed-text paths. */
  private def parseLines(spark: SparkSession, lines: Dataset[String],
      columns: Seq[ColumnSpec], cfg: CsvConfig): DataFrame = {
    val raw = spark.read
      .option("sep", cfg.fieldDelimiter)
      .option("inferSchema", "false")
      .csv(lines)
    project(raw, columns, cfg.nullFormat)
  }

  /** Read Hadoop SequenceFile(s) whose values are delimited text lines
    * (reference: hdfsreader/.../DFSUtil.java:214-242, sequenceFileStartRead —
    * value `Text` split by fieldDelimiter; keys ignored). Splittable: Spark
    * plans one task per SEQ block range, so this scales like any file scan. */
  def readSeq(spark: SparkSession, paths: Seq[String], columns: Seq[ColumnSpec],
      cfg: CsvConfig = CsvConfig()): DataFrame = {
    import spark.implicits._
    val lines = spark.createDataset(
      spark.sparkContext
        .hadoopFile(paths.mkString(","),
          classOf[SequenceFileInputFormat[Writable, Text]],
          classOf[Writable], classOf[Text])
        // Text buffers are reused by the record reader; materialize per record.
        .map(_._2.toString))
    parseLines(spark, lines, columns, cfg)
  }

  /** Read RCFile(s) — Hive's columnar container the reference reads via
    * RCFileRecordReader (DFSUtil.java:245-290, rcFileStartRead). Cells arrive
    * as raw bytes per column; the typed projection then applies. `columns`
    * must be non-empty (RC carries no column names, only positions). */
  def readRc(spark: SparkSession, paths: Seq[String], columns: Seq[ColumnSpec],
      cfg: CsvConfig = CsvConfig()): DataFrame = {
    require(columns.exists(_.index.isDefined),
      "RC read needs at least one index-addressed column spec")
    import spark.implicits._
    val width = columns.flatMap(_.index).max + 1
    val cells: Dataset[Seq[String]] = spark.createDataset(
      spark.sparkContext
        .hadoopFile(paths.mkString(","),
          classOf[RCFileInputFormat[LongWritable, BytesRefArrayWritable]],
          classOf[LongWritable], classOf[BytesRefArrayWritable])
        .map { case (_, row) =>
          (0 until math.min(width, row.size())).toSeq.map { i =>
            val br = row.get(i)
            new String(br.getData, br.getStart, br.getLength, UTF_8)
          }: Seq[String]
        })
    val raw = cells.select(
      (0 until width).map(i => element_at(col("value"), i + 1).as(s"_c$i")): _*)
    project(raw, columns, cfg.nullFormat)
  }

  /** Read compressed delimited text where the codec is known but the file
    * extension doesn't advertise it (the reference decodes by configured
    * `compress`, not extension: plugin-unstructured-storage-util/.../
    * UnstructuredStorageReaderUtil.java:120-213). gzip/zip/bzip2 are
    * non-splittable, so one-file-one-task is the correct parallel unit at any
    * scale; each file streams through the codec without full materialization
    * of the decompressed text. Zip archives read every entry. */
  def readCompressedCsv(spark: SparkSession, paths: Seq[String],
      columns: Seq[ColumnSpec], codec: String,
      cfg: CsvConfig = CsvConfig()): DataFrame = {
    import spark.implicits._
    val encoding = cfg.encoding
    val bin = spark.read.format("binaryFile").load(paths: _*)
      .select("content").as[Array[Byte]]
    val lines = bin.flatMap { bytes =>
      val raw = new java.io.ByteArrayInputStream(bytes)
      codec match {
        case "gzip" =>
          scala.io.Source.fromInputStream(
            new java.util.zip.GZIPInputStream(raw), encoding).getLines()
        case "bzip2" =>
          scala.io.Source.fromInputStream(
            new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(raw),
            encoding).getLines()
        case "zip" =>
          // one reader per entry, so entries without trailing newlines
          // can't merge lines across entry boundaries
          val z = new org.apache.commons.compress.archivers.zip.ZipArchiveInputStream(raw)
          Iterator.continually(z.getNextEntry).takeWhile(_ != null).flatMap { _ =>
            val r = new java.io.BufferedReader(new java.io.InputStreamReader(z, encoding))
            Iterator.continually(r.readLine()).takeWhile(_ != null)
          }
        case other => throw new IllegalArgumentException(s"codec '$other'")
      }
    }
    parseLines(spark, lines, columns, cfg)
  }

  /** Format-agnostic read: sniff the magic bytes, then dispatch — the
    * reference's behavior when a path's `fileType` is unset or wrong
    * (DFSUtil.java:524-695 logs and re-routes on mismatch). */
  def readAuto(spark: SparkSession, paths: Seq[String],
      columns: Seq[ColumnSpec] = Nil,
      cfg: CsvConfig = CsvConfig()): DataFrame =
    sniffFormat(spark, paths.head) match {
      case "orc" => readOrc(spark, paths, columns)
      case "parquet" => readParquet(spark, paths, columns)
      case "seq" => readSeq(spark, paths, columns, cfg)
      case "rc" => readRc(spark, paths, columns, cfg)
      case c @ ("gzip" | "bzip2" | "zip") => readCompressedCsv(spark, paths, columns, c, cfg)
      case _ => readCsv(spark, paths, columns, cfg)
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
    // every cell to its text form before writing) — including TIMESTAMP_NTZ,
    // which parquet sources produce for non-UTC-adjusted logical timestamps
    // and which would otherwise fall through to the CSV writer's ISO default
    val out = df.select(df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType | TimestampNTZType | DateType =>
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
