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
}
