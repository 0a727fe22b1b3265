package graft

import graft.gen.{ChangeStreamGen, GenConfig}
import graft.model.Schemas
import graft.streaming.{ProgressListener, StreamAggregates}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class StreamingObservabilitySpec extends SparkSpec {

  private val cfg = GenConfig(numEvents = 8000, numConvs = 100, chunks = 4)

  test("watermarked windowed aggregation over the change stream matches batch") {
    val log = tmpDir("obs-log")
    ChangeStreamGen.writeChangelog(spark, cfg, log)

    val listener = new ProgressListener(tmpDir("obs-progress"))
    spark.streams.addListener(listener)
    try {
      val stream = spark.readStream.schema(Schemas.envelope)
        .option("maxFilesPerTrigger", 2)
        .option("recursiveFileLookup", "true").parquet(log)
      val q = StreamAggregates.changeRates(stream)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("change_rates")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val batch = spark.read.schema(Schemas.envelope)
        .option("recursiveFileLookup", "true").parquet(log)
      val expected = StreamAggregates.changeRatesBatch(batch)
        .collect().map(_.toSeq).toSet
      val got = spark.table("change_rates").collect().map(_.toSeq).toSet
      // append mode emits only windows closed by the watermark; every emitted
      // window must match the batch aggregate exactly, and most windows close
      assert(got.nonEmpty)
      assert(got.subsetOf(expected),
        s"streamed windows diverge from batch: ${got.diff(expected).take(3)}")
      assert(got.size >= expected.size / 2, s"${got.size} of ${expected.size} windows closed")

      // progress listener captured per-batch metrics (numInputRows etc.)
      assert(!listener.progress.isEmpty)
      assert(listener.progress.peek().contains("numInputRows"))
    } finally spark.streams.removeListener(listener)
  }

  test("flatMapGroupsWithState tracks per-conversation state across micro-batches") {
    import spark.implicits._
    import graft.model.ChangeEvent
    import graft.streaming.ConversationState
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val q = ConversationState.track(input.toDS())
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("conv_state")
      .start()
    def ev(conv: String, lsn: Long, tsSec: Long) =
      ChangeEvent(conv, 1, "user", "x", null, new java.sql.Timestamp(tsSec * 1000), lsn, "U")
    try {
      // batch 1: two conversations, in order
      input.addData(ev("a", 1, 100), ev("a", 2, 200), ev("b", 10, 100))
      q.processAllAvailable()
      // batch 2: conversation a receives an OUT-OF-ORDER lsn (regression)
      input.addData(ev("a", 0, 300), ev("b", 11, 150))
      q.processAllAvailable()
      val rows = spark.table("conv_state")
        .select("conv_id", "events", "max_lsn", "lsn_regressions")
        .as[(String, Long, Long, Long)].collect().toSeq
      // latest update per conversation carries the CUMULATIVE state
      val latest = rows.groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2) }
      assert(latest("a") == ("a", 3L, 2L, 1L), s"got ${latest("a")}")
      assert(latest("b") == ("b", 2L, 11L, 0L), s"got ${latest("b")}")
    } finally q.stop()
  }
}
