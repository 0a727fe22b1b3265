package graft.job

import graft.sources.{JdbcDialect, JdbcSplit, JdbcWrite}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.json4s._

import java.sql.DriverManager

/**
 * JDBC reader/writer lanes for the job-JSON layer — the reference's
 * bread-and-butter job shape (`mysqlreader` → anything → `mysqlwriter`;
 * reference: plugin-rdbms-util/.../reader/CommonRdbmsReader.java job/task
 * flow and writer/CommonRdbmsWriter.java startWrite). Parameter shape
 * mirrors the reference's:
 *
 * {{{
 * "reader": {"name": "mysqlreader", "parameter": {
 *   "username": "u", "password": "p",
 *   "connection": [{"jdbcUrl": ["jdbc:..."], "table": ["t_[00-03]"]}],
 *   "column": ["id", "name"], "splitPk": "id", "where": "x > 0",
 *   "querySql": ["SELECT ..."], "fetchSize": 1000}}
 * "writer": {"name": "mysqlwriter", "parameter": {
 *   "username": "u", "password": "p", "writeMode": "insert|replace|update",
 *   "connection": [{"jdbcUrl": "jdbc:...", "table": ["t"]}],
 *   "column": [...], "preSql": [...], "postSql": [...], "batchSize": 2048}}
 * }}}
 *
 * The dialect (quoting, fetch-size semantics, URL session params) resolves
 * from the jdbcUrl; `splitPk` plans predicate partitions through the
 * dialect's MIN/MAX probe (integer or radix-128 string slices, `IS NULL`
 * slice included) so `spark.read.jdbc` reads every slice in parallel.
 */
object JdbcLane {

  private implicit val formats: Formats = DefaultFormats

  /** jdbcUrl appears as a string (writer) or an array (reader). */
  private def firstString(v: JValue): String = v match {
    case JArray(x :: _) => x.extract[String]
    case other => other.extract[String]
  }

  private def connection(param: JValue): JValue = (param \ "connection") match {
    case JArray(c :: _) => c
    case other => other
  }

  private def credentials(param: JValue): (String, String) = (
    (param \ "username").extractOpt[String].getOrElse("app"),
    (param \ "password").extractOpt[String].getOrElse("app"))

  def read(spark: SparkSession, param: JValue, channels: Int): DataFrame = {
    val conn = connection(param)
    val rawUrl = firstString(conn \ "jdbcUrl")
    val dialect = JdbcDialect.of(rawUrl)
    val url = dialect.readerUrl(rawUrl)
    val (user, pass) = credentials(param)
    val props = JdbcDialect.readerProps(dialect, user, pass,
      (param \ "fetchSize").extractOpt[Int])

    val querySqls = (param \ "querySql").extractOpt[List[String]].getOrElse(Nil)
    if (querySqls.nonEmpty) {
      // querySql mode: user SQL verbatim, one scan per statement
      return JdbcSplit.querySqlSlices(querySqls)
        .map(q => spark.read.jdbc(url, s"($q) graft_q", props))
        .reduce(_ unionByName _)
    }

    val tables = ((conn \ "table") match {
      case JArray(ts) => ts.map(_.extract[String])
      case JString(s) => List(s)
      case JNothing | JNull => Nil
      case other => List(other.extract[String])
    }).flatMap(JdbcSplit.expandTables)
    require(tables.nonEmpty, "jdbc reader needs connection.table or querySql")
    val where = (param \ "where").extractOpt[String].filter(_.trim.nonEmpty)
    val splitPk = (param \ "splitPk").extractOpt[String].filter(_.trim.nonEmpty)
    val slicesTotal = JdbcSplit.adviceSliceCount(
      math.max(1, channels), tableMode = tables.size > 1)
    val perTable = math.max(1, slicesTotal / tables.size)

    def readTable(table: String): DataFrame = splitPk match {
      case None =>
        val df = spark.read.jdbc(url, table, props)
        where.map(df.filter).getOrElse(df)
      case Some(pk) =>
        val preds = planSlices(url, user, pass, dialect, pk, table, where, perTable)
          .map(p => where.map(w => s"($p) AND ($w)").getOrElse(p))
        spark.read.jdbc(url, table, preds.toArray, props)
    }

    val df = tables.map(readTable).reduce(_ unionByName _)
    (param \ "column").extractOpt[List[String]].getOrElse(List("*")) match {
      case List("*") | Nil => df
      case cols => df.select(cols.map(col): _*)
    }
  }

  /** The dialect's MIN/MAX probe → integer or radix-128 string slices
    * (reference SingleTableSplitUtil.splitSingleTable). An empty or
    * all-NULL-pk table degrades to one unsplit slice. */
  private def planSlices(url: String, user: String, pass: String,
      dialect: JdbcDialect, pk: String, table: String,
      where: Option[String], slices: Int): Seq[String] = {
    val c = DriverManager.getConnection(url, user, pass)
    try {
      val rs = c.createStatement().executeQuery(dialect.pkRangeSql(pk, table, where))
      rs.next()
      (rs.getObject(1), rs.getObject(2)) match {
        case (null, _) | (_, null) => Seq("1=1")
        case (mn: Number, mx: Number) =>
          JdbcSplit.integerSlices(pk, BigInt(mn.longValue()), BigInt(mx.longValue()),
            slices).map(_.toSql)
        case (mn, mx) =>
          JdbcSplit.stringSlices(pk, mn.toString, mx.toString, slices).map(_.toSql)
      }
    } finally c.close()
  }

  /** Reference preCheck analogue for the writer side (WriterUtil
    * preCheckPrePareSQL / DBUtil connectivity probes): parse the config
    * eagerly (a bad writeMode fails HERE, not mid-load), connect, and
    * probe target-table visibility with a zero-row select. No data moves. */
  def preCheckWrite(param: JValue): Seq[String] =
    try {
      val conn0 = connection(param)
      val rawUrl = firstString(conn0 \ "jdbcUrl")
      val dialect = JdbcDialect.of(rawUrl)
      val (user, pass) = credentials(param)
      JdbcWrite.parseMode((param \ "writeMode").extractOpt[String].getOrElse("insert"))
      val table = firstString(conn0 \ "table")
      val c = DriverManager.getConnection(dialect.writerUrl(rawUrl), user, pass)
      try c.createStatement().executeQuery(s"SELECT * FROM $table WHERE 1=0")
      finally c.close()
      Nil
    } catch { case e: Throwable => Seq(e.getMessage) }

  /** Returns (written, dirty). */
  def write(df: DataFrame, param: JValue): (Long, Long) = {
    val conn = connection(param)
    val rawUrl = firstString(conn \ "jdbcUrl")
    val dialect = JdbcDialect.of(rawUrl)
    val url = dialect.writerUrl(rawUrl)
    val (user, pass) = credentials(param)
    val table = firstString(conn \ "table")
    val mode = JdbcWrite.parseMode(
      (param \ "writeMode").extractOpt[String].getOrElse("insert"))
    val selected = (param \ "column").extractOpt[List[String]].getOrElse(Nil) match {
      case Nil | List("*") => df
      case cols => df.select(cols.map(col): _*)
    }
    val connect = () => DriverManager.getConnection(url, user, pass)
    JdbcWrite.write(selected, connect, mode, table,
      batchSize = (param \ "batchSize").extractOpt[Int].getOrElse(2048),
      preSql = (param \ "preSql").extractOpt[List[String]].getOrElse(Nil),
      postSql = (param \ "postSql").extractOpt[List[String]].getOrElse(Nil))
  }
}
