package graft.sources

/**
 * Per-database dialect layer for the JDBC reader/writer family — the
 * behaviors the reference hard-wires per DataBaseType (reference:
 * plugin-rdbms-util/.../util/DataBaseType.java:36-170 URL suffix + identifier
 * quoting; DBUtil.java:699-720 session config; mysqlreader/.../
 * MysqlReader.java:29-35 forced streaming fetch size;
 * SingleTableSplitUtil.java:280-389 min/max range SQL + Oracle SAMPLE()
 * split), expressed as one small trait so `JdbcSplit`'s planner and
 * `JdbcWrite`'s templates stay dialect-free.
 *
 * Everything here is STRING/PROPERTY generation — fully unit-testable with
 * no database. Derby is the dialect exercised end-to-end in this sandbox;
 * MySQL/Oracle/SQLServer/PostgreSQL generate the same SQL the reference
 * emits and are covered by generated-SQL tests.
 */
sealed trait JdbcDialect {
  def name: String

  /** Quote an identifier (MySQL backticks, SQLServer brackets, ANSI double
    * quotes for Derby/Postgres; Oracle passes through like the reference). */
  def quoteColumn(c: String): String = c
  def quoteTable(t: String): String = quoteColumn(t)

  /** Effective reader fetch size. MySQL OVERRIDES any configured value with
    * Integer.MIN_VALUE — the MySQL driver's row-streaming mode, without
    * which the whole result set buffers in executor memory (reference
    * ignores user fetchSize with a warning, MysqlReader.java:29-35). */
  def readerFetchSize(configured: Option[Int]): Int = configured.getOrElse(32)

  /** Reader/writer JDBC URL with the dialect's required parameters
    * appended (reference: appendJDBCSuffixForReader/Writer). */
  def readerUrl(url: String): String = url
  def writerUrl(url: String): String = url

  protected final def appendParams(url: String, suffix: String): String =
    if (suffix.isEmpty) url
    else if (url.contains("?")) s"$url&$suffix" else s"$url?$suffix"

  /** Statements to run on each fresh connection before any work — user
    * session config plus dialect defaults (reference: DRDS always sets
    * `set transaction policy 4`; Oracle/MySQL run the user list). */
  def sessionSqls(userSession: Seq[String]): Seq[String] = userSession

  /** MIN/MAX range probe for integer/string splitPk (reference:
    * SingleTableSplitUtil.getPkRangeSQL). */
  final def pkRangeSql(pk: String, table: String, where: Option[String]): String = {
    val base = s"SELECT MIN(${quoteColumn(pk)}),MAX(${quoteColumn(pk)}) FROM ${quoteTable(table)}"
    where match {
      case Some(w) => s"$base WHERE ($w AND ${quoteColumn(pk)} IS NOT NULL)"
      case None => base
    }
  }

  /** Sampled-split SQL returning `adviceNum` ascending quantile points of
    * the split key, for DBs where MIN/MAX slicing skews (Oracle's
    * SAMPLE(percent) path, reference SingleTableSplitUtil.java:294-327).
    * None = dialect has no sampling path (use MIN/MAX range slicing); the
    * returned points feed [[JdbcSplit.sampledSlices]]. */
  def sampledSplitSql(pk: String, table: String, where: Option[String],
      percent: Double, adviceNum: Int): Option[String] = None

  /** DDL cloning `source`'s column shape into an empty transit table for
    * the staged-load write path (reference adswriter: a temp ODPS table is
    * created from the ADS table's meta, TableMetaHelper.java:31-49).
    * Constraints deliberately do NOT copy — the transit table must accept
    * whatever the serving table would reject, so the single publish
    * transaction is where violations surface (and roll back atomically). */
  def stagingDdl(staging: String, source: String): String =
    s"CREATE TABLE ${quoteTable(staging)} AS SELECT * FROM ${quoteTable(source)} WHERE 1=0"
}

object JdbcDialect {

  case object MySql extends JdbcDialect {
    val name = "mysql"
    override def quoteColumn(c: String): String = "`" + c.replace("`", "``") + "`"
    override def readerFetchSize(configured: Option[Int]): Int = Integer.MIN_VALUE
    override def readerUrl(url: String): String = appendParams(url,
      "yearIsDateType=false&zeroDateTimeBehavior=convertToNull" +
        "&tinyInt1isBit=false&rewriteBatchedStatements=true")
    override def writerUrl(url: String): String = appendParams(url,
      "yearIsDateType=false&zeroDateTimeBehavior=convertToNull" +
        "&rewriteBatchedStatements=true&tinyInt1isBit=false")
  }

  /** DRDS (distributed MySQL) — MySQL on the wire, but every session MUST
    * run `set transaction policy 4` before any work (the reference forces
    * it unconditionally, DBUtil.java:712 dealWithSessionConfig). */
  case object Drds extends JdbcDialect {
    val name = "drds"
    override def quoteColumn(c: String): String = "`" + c.replace("`", "``") + "`"
    override def readerFetchSize(configured: Option[Int]): Int = Integer.MIN_VALUE
    override def readerUrl(url: String): String = MySql.readerUrl(url)
    override def writerUrl(url: String): String = MySql.writerUrl(url)
    override def sessionSqls(userSession: Seq[String]): Seq[String] =
      "set transaction policy 4" +: userSession
  }

  case object Oracle extends JdbcDialect {
    val name = "oracle"
    override def sampledSplitSql(pk: String, table: String, where: Option[String],
        percent: Double, adviceNum: Int): Option[String] = {
      val whereSql = where match {
        case Some(w) => s" WHERE ($pk IS NOT NULL) AND ($w) "
        case None => s" WHERE ($pk IS NOT NULL) "
      }
      Some(s"SELECT * FROM ( SELECT $pk FROM $table SAMPLE ($percent)$whereSql" +
        s"ORDER BY DBMS_RANDOM.VALUE) WHERE ROWNUM <= $adviceNum ORDER by $pk ASC")
    }
  }

  case object SqlServer extends JdbcDialect {
    val name = "sqlserver"
    override def quoteColumn(c: String): String = s"[$c]"
  }

  /** Postgres/Derby pass identifiers through like the reference does for
    * every non-MySQL/SQLServer family (DataBaseType.quoteColumnName): ANSI
    * double-quoting would make unquoted-created (case-folded) identifiers
    * unresolvable. */
  case object PostgreSql extends JdbcDialect { val name = "postgresql" }

  /** Derby — the dialect this sandbox runs end-to-end. */
  case object Derby extends JdbcDialect {
    val name = "derby"
    // Derby's CTAS form is `... WITH NO DATA` (a WHERE would be rejected)
    override def stagingDdl(staging: String, source: String): String =
      s"CREATE TABLE ${quoteTable(staging)} AS SELECT * FROM ${quoteTable(source)} WITH NO DATA"
  }

  /** Plain ANSI fallback (the reference's RDBMS generic type). */
  case object Generic extends JdbcDialect { val name = "rdbms" }

  private val byName: Map[String, JdbcDialect] =
    Seq(MySql, Drds, Oracle, SqlServer, PostgreSql, Derby, Generic)
      .map(d => d.name -> d).toMap

  /** Resolve from an explicit name or a jdbc:<subprotocol>: URL. */
  def of(nameOrUrl: String): JdbcDialect = {
    val s = nameOrUrl.trim.toLowerCase
    byName.get(s).getOrElse {
      if (s.startsWith("jdbc:")) {
        val sub = s.stripPrefix("jdbc:").takeWhile(_ != ':')
        byName.getOrElse(if (sub == "microsoft") "sqlserver" else sub, Generic)
      } else Generic
    }
  }

  /** Connection properties for `spark.read.jdbc` carrying the dialect's
    * effective fetch size (Spark passes `fetchsize` through to
    * `Statement.setFetchSize` per partition). */
  def readerProps(dialect: JdbcDialect, user: String, password: String,
      configuredFetchSize: Option[Int] = None,
      userSession: Seq[String] = Nil): java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p.setProperty("fetchsize", dialect.readerFetchSize(configuredFetchSize).toString)
    // Spark's JDBC source runs `sessionInitStatement` on each partition's
    // fresh connection before its scan query — exactly the reference's
    // per-connection session config (DBUtil.dealWithSessionConfig). The
    // dialect contributes its mandatory statements (DRDS's transaction
    // policy) ahead of the user's list.
    val session = dialect.sessionSqls(userSession)
    if (session.nonEmpty) p.setProperty("sessionInitStatement", session.mkString("; "))
    p
  }
}
