package graft

import graft.sources.{JdbcSplit, JdbcWrite}
import org.scalatest.funsuite.AnyFunSuite

import java.sql.{Connection, DriverManager}
import scala.util.Random

/**
 * JDBC split-planner property tests (pure logic, DB-free) plus a REAL
 * spark.read.jdbc / writePartition round-trip against embedded Derby (the
 * only JDBC engine in this sandbox).
 */
class JdbcSpec extends SparkSpec {

  // ---- splitBigInt properties ----------------------------------------------

  test("integer split covers the range exactly: no gap, no overlap, balanced") {
    val rnd = new Random(7)
    for (_ <- 1 to 200) {
      val min = BigInt(rnd.nextInt(1000) - 500)
      val span = BigInt(rnd.nextInt(100000) + 1)
      val max = min + span - 1
      val slices = rnd.nextInt(64) + 1
      val b = JdbcSplit.splitBigInt(min, max, slices)
      assert(b.head == min && b.last == max)
      assert(b == b.sorted && b.distinct == b, s"boundaries not strictly ascending: $b")
      // range i = [b(i), b(i+1)) except last = [b(n-1), max]; sizes differ <= 1
      val sizes = b.sliding(2).zipWithIndex.map { case (Seq(lo, hi), i) =>
        if (i == b.size - 2) hi - lo + 1 else hi - lo
      }.toSeq
      assert(sizes.sum == span, s"sizes $sizes must sum to $span")
      assert(sizes.max - sizes.min <= 1, s"unbalanced: $sizes")
      // deterministic
      assert(JdbcSplit.splitBigInt(min, max, slices) == b)
    }
  }

  test("integer slices partition every value exactly once, nulls routed to the null slice") {
    val slices = JdbcSplit.integerSlices("pk", BigInt(-10), BigInt(1000), 7)
    def matches(v: Option[BigInt]): Seq[JdbcSplit.Slice] = slices.filter { s =>
      v match {
        case None => s.isNullSlice
        case Some(x) =>
          !s.isNullSlice &&
            s.lo.forall(l => x >= BigInt(l)) &&
            s.hi.forall(h => if (s.hiInclusive) x <= BigInt(h) else x < BigInt(h))
      }
    }
    for (v <- -10 to 1000)
      assert(matches(Some(BigInt(v))).size == 1, s"value $v must match exactly one slice")
    assert(matches(None).size == 1)
    assert(slices.count(_.isNullSlice) == 1)
    assert(slices.last.toSql == "pk IS NULL")
  }

  test("string radix-128 embedding is order-preserving and invertible") {
    val rnd = new Random(11)
    val strs = Seq("", "a", "ab", "abc", "b", "zz", "A1", "~~~") ++
      (1 to 100).map(_ => rnd.alphanumeric.take(rnd.nextInt(8)).mkString)
    val len = strs.map(_.length).max
    val pairs = strs.map(s => (s, JdbcSplit.stringToBig(s, len)))
    for (Seq((s1, v1), (s2, v2)) <- pairs.sortBy(_._1).sliding(2))
      assert(v1 <= v2, s"'$s1' < '$s2' but $v1 > $v2")
    for ((s, v) <- pairs)
      assert(JdbcSplit.bigToString(v, len) == s, s"round-trip failed for '$s'")
  }

  test("string slices partition random strings in-range exactly once") {
    val rnd = new Random(13)
    val minS = "aaa"
    val maxS = "zzzzz"
    val slices = JdbcSplit.stringSlices("name", minS, maxS, 9)
    assert(slices.count(!_.isNullSlice) >= 2)
    def hits(x: String): Int = slices.count { s =>
      !s.isNullSlice &&
        s.lo.forall(l => x >= l) &&
        s.hi.forall(h => if (s.hiInclusive) x <= h else x < h)
    }
    val samples = Seq(minS, maxS, "mmm", "aab", "zzzzy") ++
      (1 to 300).map { _ =>
        val n = rnd.nextInt(5) + 1
        (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      }.filter(s => s >= minS && s <= maxS)
    samples.foreach(s => assert(hits(s) == 1, s"'$s' matched ${hits(s)} slices"))
  }

  test("sampled split covers below, between and above the quantile points") {
    val slices = JdbcSplit.sampledSlices("pk", Seq("10", "20", "30"), quoted = false)
    assert(slices.map(_.toSql) == Seq(
      "pk < 10", "pk >= 10 AND pk < 20", "pk >= 20 AND pk < 30", "pk >= 30", "pk IS NULL"))
  }

  test("shard-table pattern expansion and table-mode slice multiplier") {
    assert(JdbcSplit.expandTables("orders_[00-03]") ==
      Seq("orders_00", "orders_01", "orders_02", "orders_03"))
    assert(JdbcSplit.expandTables("orders_[8-11]_x") ==
      Seq("orders_8_x", "orders_9_x", "orders_10_x", "orders_11_x"))
    assert(JdbcSplit.expandTables("plain_table") == Seq("plain_table"))
    assert(JdbcSplit.adviceSliceCount(4, tableMode = true) == 20)
    assert(JdbcSplit.adviceSliceCount(4, tableMode = false) == 4)
  }

  test("writeMode templates match the reference's insert/replace/update SQL") {
    val cols = Seq("id", "name")
    assert(JdbcWrite.template(JdbcWrite.Insert, "t", cols) ==
      "INSERT INTO t (id, name) VALUES (?, ?)")
    assert(JdbcWrite.template(JdbcWrite.Replace, "t", cols) ==
      "REPLACE INTO t (id, name) VALUES (?, ?)")
    assert(JdbcWrite.template(JdbcWrite.Update, "t", cols) ==
      "INSERT INTO t (id, name) VALUES (?, ?) " +
        "ON DUPLICATE KEY UPDATE id = VALUES(id), name = VALUES(name)")
    assert(JdbcWrite.parseMode("REPLACE") == JdbcWrite.Replace)
  }

  // ---- embedded-Derby round trips ------------------------------------------

  private def derby(db: String): Connection =
    DriverManager.getConnection(s"jdbc:derby:memory:$db;create=true")

  test("spark.read.jdbc with planned predicates reads every row exactly once") {
    val conn = derby("readdb")
    val st = conn.createStatement()
    st.execute("CREATE TABLE people (pk INT, name VARCHAR(32))")
    val ins = conn.prepareStatement("INSERT INTO people VALUES (?, ?)")
    val rnd = new Random(3)
    val n = 1000
    for (i <- 1 to n) {
      if (i % 97 == 0) ins.setNull(1, java.sql.Types.INTEGER) else ins.setInt(1, rnd.nextInt(100000))
      ins.setString(2, s"name$i"); ins.executeUpdate()
    }
    conn.close()

    val props = new java.util.Properties()
    val url = "jdbc:derby:memory:readdb"
    // split plan from the real MIN/MAX, like the reference's SELECT MIN(pk),MAX(pk)
    val c2 = derby("readdb")
    val rs = c2.createStatement().executeQuery("SELECT MIN(pk), MAX(pk) FROM people")
    rs.next()
    val (mn, mx) = (BigInt(rs.getInt(1)), BigInt(rs.getInt(2)))
    c2.close()
    val preds = JdbcSplit.integerSlices("pk", mn, mx, 8).map(_.toSql).toArray
    val df = spark.read.jdbc(url, "people", preds, props)
    assert(df.rdd.getNumPartitions == preds.length, "one partition per slice")
    assert(df.count() == n, "every row read exactly once (incl. NULL pk slice)")
  }

  test("batched write commits good batches and replays offenders to dirty") {
    val conn = derby("writedb")
    conn.createStatement().execute(
      "CREATE TABLE sink (pk INT PRIMARY KEY, name VARCHAR(32))")
    import org.apache.spark.sql.Row
    // 50 unique + 3 duplicate-pk offenders scattered across batches
    val rows = ((1 to 50).map(i => Row(i, s"n$i")) ++
      Seq(Row(5, "dup"), Row(17, "dup"), Row(42, "dup"))).iterator
    var dirty = List.empty[Int]
    val res = JdbcWrite.writePartition(conn,
      "INSERT INTO sink (pk, name) VALUES (?, ?)", rows, batchSize = 16,
      onDirty = (r, _) => dirty ::= r.getInt(0))
    assert(res.written == 50 && res.dirty == 3, s"got $res")
    assert(dirty.toSet == Set(5, 17, 42))
    val rs = conn.createStatement().executeQuery("SELECT COUNT(*) FROM sink")
    rs.next()
    assert(rs.getInt(1) == 50)
    conn.close()
  }

  test("preSql truncates the target and postSql runs after the load") {
    import spark.implicits._
    val conn = derby("prepostdb")
    val st = conn.createStatement()
    st.execute("CREATE TABLE tgt (pk INT, v VARCHAR(16))")
    st.execute("CREATE TABLE audit (n INT)")
    st.execute("INSERT INTO tgt VALUES (999, 'stale')") // preSql must clear it
    conn.close()
    val df = (1 to 20).map(i => (i, s"v$i")).toDF("pk", "v").repartition(2)
    val connect = () => DriverManager.getConnection("jdbc:derby:memory:prepostdb")
    val (written, dirtyN) = JdbcWrite.write(df, connect, JdbcWrite.Insert, "tgt",
      preSql = Seq("DELETE FROM tgt"),
      postSql = Seq("INSERT INTO audit SELECT COUNT(*) FROM tgt"))
    assert(written == 20 && dirtyN == 0)
    val c2 = connect()
    val r1 = c2.createStatement().executeQuery("SELECT COUNT(*) FROM tgt WHERE pk = 999")
    r1.next(); assert(r1.getInt(1) == 0, "preSql did not clear the stale row")
    val r2 = c2.createStatement().executeQuery("SELECT n FROM audit")
    r2.next(); assert(r2.getInt(1) == 20, "postSql audit did not see the loaded rows")
    c2.close()
  }
}
