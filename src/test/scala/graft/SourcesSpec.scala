package graft

import graft.sources.{TypedFileSink, TypedFileSource}
import graft.sources.TypedFileSource.{ColumnSpec, CsvConfig}
import graft.sources.TypedFileSink.WriteConfig
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv round-trip with typed projection, const columns, nullFormat") {
    val out = tmpDir("csv") + "/t"
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate").cast("timestamp").as("o_orderdate"))
      .orderBy("o_orderkey")
    TypedFileSink.writeCsv(src, out, WriteConfig(fieldDelimiter = "|",
      nullFormat = "\\N", writeMode = "truncate"))

    val back = TypedFileSource.readCsv(spark, Seq(out), Seq(
      ColumnSpec(index = Some(0), `type` = "long", name = Some("o_orderkey")),
      ColumnSpec(index = Some(1), `type` = "string", name = Some("o_orderstatus")),
      ColumnSpec(index = Some(2), `type` = "double", name = Some("o_totalprice")),
      ColumnSpec(index = Some(3), `type` = "datetime",
        format = Some("yyyy-MM-dd HH:mm:ss"), name = Some("o_orderdate")),
      ColumnSpec(value = Some("batch-7"), `type` = "string", name = Some("job_tag"))),
      CsvConfig(fieldDelimiter = "|", nullFormat = Some("\\N")))

    assert(back.count() == src.count())
    assert(back.select("job_tag").distinct().as[String].collect().toSeq == Seq("batch-7"))
    val a = src.as[(Long, String, Double, java.sql.Timestamp)].collect().toSeq.sortBy(_._1)
    val b = back.select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .as[(Long, String, Double, java.sql.Timestamp)].collect().toSeq.sortBy(_._1)
    assert(a == b)
  }

  test("orc round-trip with typed projection (DFSUtil ORC parity)") {
    val out = tmpDir("orc") + "/t"
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    TypedFileSink.writeOrc(src, out, WriteConfig(writeMode = "truncate"))
    // full-schema read (no projection list)
    val full = TypedFileSource.readOrc(spark, Seq(out))
    assert(full.count() == src.count())
    // typed projection: reorder + const column, like the reference's
    // ColumnEntry list over ORC rows
    val back = TypedFileSource.readOrc(spark, Seq(out), Seq(
      ColumnSpec(index = Some(2), `type` = "double", name = Some("price")),
      ColumnSpec(index = Some(0), `type` = "long", name = Some("key")),
      ColumnSpec(value = Some("orcjob"), `type` = "string", name = Some("tag"))))
    assert(back.columns.toSeq == Seq("price", "key", "tag"))
    val a = src.select("o_totalprice", "o_orderkey").as[(Double, Long)]
      .collect().toSeq.sortBy(_._2)
    val b = back.select("price", "key").as[(Double, Long)].collect().toSeq.sortBy(_._2)
    assert(a == b)
    assert(back.select("tag").distinct().as[String].collect().toSeq == Seq("orcjob"))
    // writeMode nonConflict applies to ORC too
    intercept[Exception] {
      TypedFileSink.writeOrc(src, out, WriteConfig(writeMode = "nonConflict"))
    }
  }

  test("writeMode nonConflict fails on existing dir; truncate overwrites") {
    val out = tmpDir("csv2") + "/t"
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    TypedFileSink.writeCsv(df, out, WriteConfig(writeMode = "truncate"))
    intercept[Exception] {
      TypedFileSink.writeCsv(df, out, WriteConfig(writeMode = "nonConflict"))
    }
    TypedFileSink.writeCsv(df.filter(col("k") === 1), out, WriteConfig(writeMode = "truncate"))
    assert(spark.read.csv(out).count() == 1)
  }

  test("bad cells become null (dirty-routable), not job failures") {
    val dir = tmpDir("csv3")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/x.csv"),
      "1,foo,2024-01-01\nnotanumber,bar,alsonotadate\n")
    val df = TypedFileSource.readCsv(spark, Seq(s"$dir/x.csv"), Seq(
      ColumnSpec(index = Some(0), `type` = "long", name = Some("k")),
      ColumnSpec(index = Some(1), `type` = "string", name = Some("s")),
      ColumnSpec(index = Some(2), `type` = "date", name = Some("d"))))
    val rows = df.orderBy(col("s")).collect() // "bar" (bad row) sorts first
    assert(rows.length == 2)
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(2))   // cast failures -> null
    assert(!rows(1).isNullAt(0) && !rows(1).isNullAt(2)) // "1,foo,2024-01-01"
  }
}
