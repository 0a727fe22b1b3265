package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** errorLimit config (reference: core/.../util/ErrorRecordChecker.java:18-83;
  * default job example core/src/main/job/job.json:7-10). */
final case class ErrorLimit(record: Option[Long] = Some(0L), percentage: Option[Double] = None)

final class DirtyLimitExceeded(msg: String) extends RuntimeException(msg)

final case class DirtySplit(clean: DataFrame, dirty: DataFrame) {
  /** Enforce the reference's error-limit gate: absolute record limit and/or
    * percentage of total. Triggers one action over each side. */
  def enforce(limit: ErrorLimit): DirtyStats = {
    val nDirty = dirty.count()
    val nClean = clean.count()
    val total = nDirty + nClean
    limit.record.foreach { r =>
      if (nDirty > r) throw new DirtyLimitExceeded(
        s"dirty records $nDirty exceed errorLimit.record=$r")
    }
    limit.percentage.foreach { p =>
      if (total > 0 && nDirty.toDouble / total > p) throw new DirtyLimitExceeded(
        f"dirty ratio ${nDirty.toDouble / total}%.4f exceeds errorLimit.percentage=$p")
    }
    DirtyStats(nClean, nDirty)
  }
}

final case class DirtyStats(clean: Long, dirty: Long)

/**
 * Dirty-record sideband (SURVEY.md §2.5). Every validation failure routes the
 * offending row (plus the failed rule) to a quarantine frame instead of
 * failing the job — the Spark-native form of the reference's
 * TaskPluginCollector dirty channel (reference: common/.../plugin/
 * TaskPluginCollector.java; sampled logging core/.../statistics/plugin/task/
 * StdoutPluginCollector.java).
 *
 * Implemented as a single projected rule-failure column evaluated once per
 * row inside whole-stage codegen; the split is two cheap filters over the
 * same scan (Catalyst reuses the pushed-down scan for both sides).
 */
object Dirty {

  /** A named validation rule: null-check, castability, domain check… */
  final case class Rule(name: String, pred: Column)

  /** Standard rules for the change-event envelope. */
  def envelopeRules: Seq[Rule] = Seq(
    Rule("conv_id_null", col("conv_id").isNotNull && length(col("conv_id")) > 0),
    Rule("turn_idx_null", col("turn_idx").isNotNull),
    Rule("ts_null", col("ts").isNotNull),
    Rule("lsn_null", col("lsn").isNotNull),
    Rule("op_domain", col("op").isin("I", "U", "D")))

  /** Split a frame into (clean, dirty-with-reason). */
  def split(df: DataFrame, rules: Seq[Rule]): DirtySplit = {
    val reason = rules.foldLeft(lit(null).cast("string")) { (acc, r) =>
      coalesce(acc, when(!coalesce(r.pred, lit(false)), lit(r.name)))
    }
    val tagged = df.withColumn("__dirty_reason", reason)
    DirtySplit(
      clean = tagged.filter(col("__dirty_reason").isNull).drop("__dirty_reason"),
      dirty = tagged.filter(col("__dirty_reason").isNotNull))
  }
}
