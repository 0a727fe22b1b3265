package graft

import graft.cdc.{CdcPipeline, PipelineOptions}
import graft.gen.{ChangeStreamGen, GenConfig}
import graft.model.Schemas
import graft.table.SnapTable
import org.apache.spark.sql.SparkSession

/**
 * Benchmark main. Two sections, one JSON line out:
 *
 *  1. headline operator queries on SPARK_GRAFT_SF_DIR (per-query seconds);
 *  2. the north-rule metric: sustained change-events/sec applied end-to-end
 *     (changelog tail -> dirty gate -> LWW dedup -> snapshot MERGE) on a
 *     deterministic transcript replay, measured at TWO parallelism levels
 *     (local[8] vs local[32] — the sandbox stand-in for N vs 4N executors)
 *     on the SAME pre-generated input, with scaling efficiency
 *     = (thr32/thr8)/4 reported alongside.
 */
object Bench {

  private val headline = Seq(
    "q1_agg", "q_filter_project", "q_join_broadcast", "q_join_shuffle",
    "q_window_topk", "q_cdc_lww", "q_cdc_lww_salted", "q_event_window",
    "q_dedup_exact", "q_minhash_lsh", "q_simhash", "q_token_count",
    "q_quality", "q_lang_id", "q_fingerprint", "q_ann_topk", "q_ann_lsh",
    "q_embedding_neardup", "q_dx_filter", "q_cast_ladder")

  private def newSession(cores: Int): SparkSession = {
    val s = GraftSession.builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full CDC replay; returns (events applied, elapsed sec). */
  private def cdcRun(cores: Int, logDir: String, totalEvents: Long): (Long, Double) = {
    val spark = newSession(cores)
    val work = java.nio.file.Files.createTempDirectory(s"bench-cdc-$cores").toString
    val table = SnapTable.create(spark, s"$work/table", Schemas.payloadV2, numBuckets = 32)
    val t0 = System.nanoTime()
    val rec = CdcPipeline.replayBatch(spark, logDir, table)
    val sec = (System.nanoTime() - t0) / 1e9
    val applied = rec.rowsIn
    spark.stop()
    // a stopped session leaves the SparkContext cleared; next builder call
    // creates a fresh one with the new master
    (applied, sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS",
      if (sfDir.contains("0.1")) "2000000" else "200000").toLong

    // ---- section 1: headline queries --------------------------------------
    var spark = newSession(cpus)
    val queries = SparkEntry.queries
    val results = headline.filter(queries.contains).map { name =>
      val t0 = System.nanoTime()
      val n = try queries(name)(spark, sfDir).count() catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, sec, n)
    }

    // ---- section 2: CDC throughput at two parallelism levels --------------
    val logDir = java.nio.file.Files.createTempDirectory("bench-log").toString + "/log"
    val cfg = GenConfig(numEvents = benchEvents, numConvs = (benchEvents / 500).toInt.max(100),
      chunks = 8)
    val tGen0 = System.nanoTime()
    ChangeStreamGen.writeChangelog(spark, cfg, logDir)
    val genSec = (System.nanoTime() - tGen0) / 1e9
    spark.stop()

    val (n8, s8) = cdcRun(8, logDir, benchEvents)
    val (n32, s32) = cdcRun(32, logDir, benchEvents)
    val thr8 = n8 / s8
    val thr32 = n32 / s32
    val eff = (thr32 / thr8) / 4.0

    val qs = results.map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val cdc = f"""{"events":$n32,"gen_sec":$genSec%.2f,""" +
      f""""local8_sec":$s8%.2f,"local8_events_per_sec":$thr8%.0f,""" +
      f""""local32_sec":$s32%.2f,"local32_events_per_sec":$thr32%.0f,""" +
      f""""scaling_efficiency_8_to_32":$eff%.3f}"""
    println(f"""{"metric":"cdc_events_per_sec_local32","value":$thr32%.0f,""" +
      f""""unit":"events/sec","total_query_sec":$total%.2f,"queries":$qs,""" +
      s""""cdc":$cdc,"sf":"$sfDir"}""")
  }
}
