package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** errorLimit config (reference: core/.../util/ErrorRecordChecker.java:18-83;
  * default job example core/src/main/job/job.json:7-10). */
final case class ErrorLimit(record: Option[Long] = Some(0L), percentage: Option[Double] = None)

final class DirtyLimitExceeded(msg: String) extends RuntimeException(msg)

final case class DirtyStats(clean: Long, dirty: Long, byReason: Map[String, Long]) {
  /** Enforce the reference's error-limit gate. */
  def enforce(limit: ErrorLimit): DirtyStats = {
    limit.record.foreach { r =>
      if (dirty > r) throw new DirtyLimitExceeded(
        s"dirty records $dirty exceed errorLimit.record=$r ($byReason)")
    }
    limit.percentage.foreach { p =>
      val total = clean + dirty
      if (total > 0 && dirty.toDouble / total > p) throw new DirtyLimitExceeded(
        f"dirty ratio ${dirty.toDouble / total}%.4f exceeds errorLimit.percentage=$p")
    }
    this
  }
}

final case class DirtySplit(tagged: DataFrame) {
  def clean: DataFrame = tagged.filter(col(Dirty.ReasonCol).isNull).drop(Dirty.ReasonCol)
  def dirty: DataFrame = tagged.filter(col(Dirty.ReasonCol).isNotNull)

  /** One aggregation pass over the tagged frame. */
  def stats(): DirtyStats = {
    val rows = tagged.groupBy(col(Dirty.ReasonCol)).agg(count(lit(1)).as("n")).collect()
    val byReason = rows.filterNot(_.isNullAt(0)).map(r => r.getString(0) -> r.getLong(1)).toMap
    val clean = rows.filter(_.isNullAt(0)).map(_.getLong(1)).sum
    DirtyStats(clean, byReason.values.sum, byReason)
  }

  def enforce(limit: ErrorLimit): DirtyStats = stats().enforce(limit)
}

/**
 * Dirty-record sideband (SURVEY.md §2.5). Every validation failure routes the
 * offending row (plus the failed rule name) to a quarantine frame instead of
 * failing the job — the Spark-native form of the reference's
 * TaskPluginCollector dirty channel (reference: common/.../plugin/
 * TaskPluginCollector.java; sampled logging core/.../statistics/plugin/task/
 * StdoutPluginCollector.java).
 *
 * The rule-failure column is evaluated once per row inside whole-stage
 * codegen; clean/dirty are two cheap filters over the same scan.
 */
object Dirty {

  val ReasonCol = "__dirty_reason"

  /** A named validation rule: null-check, castability, domain check… */
  final case class Rule(name: String, pred: Column)

  /** Standard rules for the change-event envelope. */
  def envelopeRules: Seq[Rule] = Seq(
    Rule("conv_id_null", col("conv_id").isNotNull && length(col("conv_id")) > 0),
    Rule("turn_idx_null", col("turn_idx").isNotNull),
    Rule("ts_null", col("ts").isNotNull),
    Rule("lsn_null", col("lsn").isNotNull),
    Rule("op_domain", col("op").isin("I", "U", "D")))

  /** First failing rule name, else null. */
  def reason(rules: Seq[Rule]): Column =
    rules.foldLeft(lit(null).cast("string")) { (acc, r) =>
      coalesce(acc, when(!coalesce(r.pred, lit(false)), lit(r.name)))
    }

  /** Tag a frame with the failed-rule column. */
  def split(df: DataFrame, rules: Seq[Rule]): DirtySplit =
    DirtySplit(df.withColumn(ReasonCol, reason(rules)))
}
