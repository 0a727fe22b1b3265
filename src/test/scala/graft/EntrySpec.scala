package graft

/** Driver-contract smoke: every queries entry runs at sf0.001; entries with
  * an oracle share its column names; entry() returns rows. */
class EntrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracleSql without queries entry: $missing")
  }

  // queries that legitimately return few/zero rows at tiny scale
  private val mayBeEmpty = Set("q_anti_join")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if name != "q_cdc_pipeline") {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
