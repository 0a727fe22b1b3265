package graft

import graft.sources.{KvSink, KvSplit}
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.ConcurrentHashMap

/** Region-aware / page / PK-range split planners + KV sink write modes. */
class KvSpec extends SparkSpec {
  import KvSplit._

  test("region-aware range split clips the user range to region boundaries") {
    val regions = Seq("", "g", "n", "t") // 4 regions: (-inf,g) [g,n) [n,t) [t,+inf)
    // full scan: one slice per region
    assert(regionAwareSlices(KeyRange(None, None), regions) == Seq(
      KeyRange(None, Some("g")), KeyRange(Some("g"), Some("n")),
      KeyRange(Some("n"), Some("t")), KeyRange(Some("t"), None)))
    // user range inside the middle regions
    assert(regionAwareSlices(KeyRange(Some("h"), Some("p")), regions) == Seq(
      KeyRange(Some("h"), Some("n")), KeyRange(Some("n"), Some("p"))))
    // user range entirely within one region
    assert(regionAwareSlices(KeyRange(Some("ga"), Some("gb")), regions) == Seq(
      KeyRange(Some("ga"), Some("gb"))))
    // coverage: every key falls in exactly one slice
    val slices = regionAwareSlices(KeyRange(Some("b"), Some("x")), regions)
    for (k <- Seq("b", "c", "g", "m", "n", "s", "t", "w"))
      assert(slices.count(_.contains(k)) == 1, s"key $k")
    assert(slices.forall(s => !s.contains("a") && !s.contains("x")))
  }

  test("page split covers the collection exactly with balanced skip/limit") {
    assert(pageSlices(10, 3) == Seq(Page(0, 4), Page(4, 3), Page(7, 3)))
    assert(pageSlices(2, 5) == Seq(Page(0, 1), Page(1, 1)))
    assert(pageSlices(0, 4) == Seq(Page(0, 0)))
    val pages = pageSlices(1000003, 16)
    assert(pages.map(_.limit).sum == 1000003)
    assert(pages.head.skip == 0)
    pages.sliding(2).foreach { case Seq(a, b) => assert(a.skip + a.limit == b.skip) }
  }

  test("PK-range slices are contiguous half-open ranges") {
    val rs = pkRangeSlices(BigInt(0), BigInt(99), 4)
    assert(rs.size == 4)
    assert(rs.head.start.contains("0"))
    assert(rs.last.end.contains("100")) // half-open: max + 1
    rs.sliding(2).foreach { case Seq(a, b) => assert(a.end == b.start) }
  }

  // ---- KV sink -------------------------------------------------------------

  private def store(name: String): ConcurrentHashMap[String, String] =
    KvSpecStore.store(name)

  test("kv write modes: set/add/replace/append/prepend semantics") {
    import spark.implicits._
    val df = Seq((1, "a", "x1"), (2, "b", "x2")).toDF("id", "sub", "v")
    // factory closure captures only the store NAME (serializes to executors)
    val mk = (n: String) => () => KvSpecStore.client(n)

    // set: unconditional upsert, key = id-sub
    store("set").put("1-a", "old")
    val (w1, s1) = KvSink.write(df, Seq("id", "sub"), Seq("v"), KvSink.Set, mk("set"))
    assert((w1, s1) == (2L, 0L))
    assert(store("set").get("1-a") == "x1" && store("set").get("2-b") == "x2")

    // add: only absent keys written
    store("add").put("1-a", "keepme")
    val (w2, s2) = KvSink.write(df, Seq("id", "sub"), Seq("v"), KvSink.Add, mk("add"))
    assert((w2, s2) == (1L, 1L))
    assert(store("add").get("1-a") == "keepme" && store("add").get("2-b") == "x2")

    // replace: only present keys overwritten
    store("rep").put("2-b", "old")
    val (w3, s3) = KvSink.write(df, Seq("id", "sub"), Seq("v"),
      KvSink.ReplaceExisting, mk("rep"))
    assert((w3, s3) == (1L, 1L))
    assert(store("rep").get("2-b") == "x2" && !store("rep").containsKey("1-a"))

    // append / prepend concatenate around the existing value
    store("app").put("1-a", "pre:")
    KvSink.write(df, Seq("id", "sub"), Seq("v"), KvSink.Append, mk("app"))
    assert(store("app").get("1-a") == "pre:x1")
    store("ppd").put("1-a", ":post")
    KvSink.write(df, Seq("id", "sub"), Seq("v"), KvSink.Prepend, mk("ppd"))
    assert(store("ppd").get("1-a") == "x1:post")

    assert(KvSink.parseMode("APPEND") == KvSink.Append)
  }
}

/** Executor-visible in-memory stores (local-mode: same JVM). */
object KvSpecStore {
  val stores = new ConcurrentHashMap[String, ConcurrentHashMap[String, String]]()

  def store(name: String): ConcurrentHashMap[String, String] =
    stores.computeIfAbsent(name, _ => new ConcurrentHashMap[String, String]())

  def client(name: String): KvSink.KvClient = new KvSink.KvClient {
    private val m = store(name)
    def get(key: String): Option[String] = Option(m.get(key))
    def put(key: String, value: String): Unit = m.put(key, value)
    def close(): Unit = ()
  }
}
