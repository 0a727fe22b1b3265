package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic transcript change-stream generator (FIXTURES.md §1).
 *
 * Mirrors the reference's synthetic source idea (streamreader value/random
 * column spec, reference: streamreader/src/main/java/.../StreamReader.java:
 * 241-332 and the shipped smoke job core/src/main/job/job.json:1-52) but is a
 * pure function of (seed, id): every cell is derived from `xxhash64(id, seed,
 * salt)`, so the same config yields the same bytes on any cluster size, and
 * generation is fully distributed (expressions over `spark.range` — no
 * driver-side loops, scales to 10^10 ids).
 *
 * Properties generated:
 *  - zipf-ish hot keys: `hotMass` of events land on `hotFrac` of conversations;
 *  - exact duplicate delivery (same lsn re-emitted) with prob `pDup`;
 *  - bounded out-of-order delivery within `oooWindow` positions;
 *  - deletes with prob `pDelete`;
 *  - schema evolution: events at id >= evolveFrac*n carry a `tool` column and
 *    occasionally a turn_idx beyond int16 (widening check); chunk files before
 *    the evolution point physically lack the `tool` column;
 *  - event time `ts` is jittered vs lsn so LWW-by-(ts,lsn) differs from
 *    last-arrival.
 */
final case class GenConfig(
    seed: Long = 42L,
    numEvents: Long = 100000L,
    numConvs: Int = 1000,
    turnsPerConv: Int = 40,
    hotFrac: Double = 0.01,
    hotMass: Double = 0.30,
    pDup: Double = 0.05,
    pDelete: Double = 0.02,
    oooWindow: Int = 1000,
    evolveFrac: Double = 0.6,
    chunks: Int = 10,
    /** Shift lsn/ts/text-revision by this base so a SECOND generated
      * changelog reads as a strictly-later tail of the same stream (its
      * events update the same conversation keys with higher lsns) —
      * delivery positions and key assignment stay in [0, numEvents) so
      * chunking and skew shape are unchanged. */
    lsnOffset: Long = 0L) {
  def evolvePoint: Long = (numEvents * evolveFrac).toLong
}

object ChangeStreamGen {

  /** All change events (base + duplicate deliveries) with their delivery
    * position. Columns: envelope ++ (pos). Pure function of (cfg, id). */
  def events(spark: SparkSession, cfg: GenConfig): DataFrame = {
    val n = cfg.numEvents
    def h(salt: Int) = xxhash64(col("id"), lit(cfg.seed), lit(salt))
    def hmod(salt: Int, m: Long) = pmod(h(salt), lit(m))

    val numHot = math.max(1, (cfg.numConvs * cfg.hotFrac).toInt)
    val hotPerMille = (cfg.hotMass * 1000).toLong
    val delPerMille = (cfg.pDelete * 1000).toLong

    val base = spark.range(n)
      .withColumn("conv_id",
        when(hmod(1, 1000) < hotPerMille,
          concat(lit("conv-"), format_string("%06d", hmod(2, numHot))))
          .otherwise(concat(lit("conv-"), format_string("%06d", hmod(3, cfg.numConvs)))))
      // After the evolution point a small fraction of turns exceeds int16
      // (the type-widening probe of FIXTURES.md).
      .withColumn("turn_idx",
        (hmod(4, cfg.turnsPerConv) +
          when(col("id") >= cfg.evolvePoint && hmod(5, 50) === 0, lit(40000))
            .otherwise(lit(0))).cast("int"))
      .withColumn("role",
        element_at(array(lit("user"), lit("assistant"), lit("tool"), lit("system")),
          (hmod(6, 4) + 1).cast("int")))
      .withColumn("ts",
        (lit(1704067200L) + col("id") + lit(cfg.lsnOffset) +
          hmod(7, 2L * cfg.oooWindow) - cfg.oooWindow)
          .cast("timestamp"))
      .withColumn("tool",
        when(col("id") >= cfg.evolvePoint && col("role") === "tool",
          concat(lit("tool_"), hmod(8, 16))).otherwise(lit(null).cast("string")))
      .withColumn("op",
        when(hmod(9, 1000) < delPerMille, lit("D"))
          .otherwise(when(hmod(10, 3) === 0, lit("I")).otherwise(lit("U"))))
      .withColumn("text",
        concat(col("conv_id"), lit("/t"), col("turn_idx"), lit(" rev"),
          col("id") + cfg.lsnOffset, lit(" "), sentence(h(11))))
      .withColumn("lsn", col("id") + cfg.lsnOffset)

    // Exact duplicate re-delivery: the duplicate carries the SAME lsn and
    // payload, only its delivery position is pushed later.
    val dupPerMille = (cfg.pDup * 1000).toLong
    val dups = base.filter(hmod(12, 1000) < dupPerMille)
      .withColumn("pos", col("id") + hmod(13, cfg.oooWindow) + cfg.oooWindow / 2)
    val firsts = base.withColumn("pos",
      col("id") + hmod(14, cfg.oooWindow) - cfg.oooWindow / 2)

    firsts.unionByName(dups)
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn", "op", "pos")
  }

  /** Deterministic pseudo-sentence from a hash (small vocab, 8-16 words). */
  private def sentence(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val vocab = Seq("spark", "merge", "batch", "stream", "offset", "shard", "turn",
      "agent", "reply", "plan", "tool", "call", "state", "key", "row", "scan")
    val words = (0 until 16).map { i =>
      val w = element_at(array(vocab.map(lit): _*),
        (pmod(shiftright(h, i * 4) + i, lit(16)) + 1).cast("int"))
      when(pmod(shiftright(h, i), lit(2)) === 0 || lit(i < 8), concat(w, lit(" "))).otherwise(lit(""))
    }
    trim(concat(words: _*))
  }

  /**
   * Write the changelog as `chunk=c` parquet directories in delivery order:
   * chunk c holds delivery positions [c*sz, (c+1)*sz). Chunks whose position
   * range ends before the evolution point are written WITHOUT the `tool`
   * column — real file-level schema evolution, as a binlog tail would see it.
   *
   * Returns the chunk directories in delivery order (streaming feeds them to
   * `readStream` with `maxFilesPerTrigger`, batch replay unions them).
   */
  def writeChangelog(spark: SparkSession, cfg: GenConfig, outDir: String): Seq[String] = {
    val ev = events(spark, cfg).cache()
    try {
      val w = cfg.oooWindow
      // Delivery positions span [-w/2, numEvents + 1.5w); cover it all.
      val total = cfg.numEvents + 2L * w
      val sz = math.max(1L, total / cfg.chunks + 1)
      (0 until cfg.chunks).map { c =>
        val lo = c * sz - w / 2
        val hi = lo + sz
        val slice = ev.filter(col("pos") >= lo && col("pos") < hi)
        // pos >= id - w/2, so max id in this chunk < hi + w/2: safe to drop
        // the `tool` column only if no evolved event can land here.
        val preEvolve = hi + w / 2 <= cfg.evolvePoint
        val cols = if (preEvolve) Seq("conv_id", "turn_idx", "role", "text", "ts", "lsn", "op")
                   else Seq("conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn", "op")
        val dir = f"$outDir/chunk=$c%05d"
        // ~50k events per file so a batch replay has enough input splits to
        // feed every core of a wide executor pool
        val files = math.max(1, (sz / 50000L).toInt)
        slice.select(cols.map(col): _*).repartition(files)
          .write.mode("overwrite").parquet(dir)
        dir
      }
    } finally ev.unpersist()
  }
}
