package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Catalyst-driven schema merge (SURVEY.md §4.4). The reference handles
 * source/dest schema mismatch only via user-configured column lists and makes
 * column-count mismatch a hard error (reference: plugin-rdbms-util/.../writer/
 * CommonRdbmsWriter.java:275-285); the north star upgrades this to automatic
 * merge: new nullable columns are added, numeric/temporal types widen along a
 * fixed lattice, anything else is a conflict.
 */
object SchemaEvolution {

  /** Widening lattice rank; types within a family widen upward only. */
  private val integralRank: Map[DataType, Int] =
    Map(ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)
  private val fractionalRank: Map[DataType, Int] = Map(FloatType -> 0, DoubleType -> 1)

  /** Least common widened type, or None if incompatible. */
  def widen(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case _ if a == b => Some(a)
    case _ if integralRank.contains(a) && integralRank.contains(b) =>
      Some(if (integralRank(a) >= integralRank(b)) a else b)
    case _ if fractionalRank.contains(a) && fractionalRank.contains(b) =>
      Some(if (fractionalRank(a) >= fractionalRank(b)) a else b)
    // integral -> double is safe enough for ingest (DataX routes all
    // NUMERIC/DECIMAL through strings for the same reason, reference:
    // common/.../element/DoubleColumn.java:12-66).
    case _ if integralRank.contains(a) && fractionalRank.contains(b) => Some(DoubleType)
    case _ if fractionalRank.contains(a) && integralRank.contains(b) => Some(DoubleType)
    case (d1: DecimalType, d2: DecimalType) =>
      val scale = math.max(d1.scale, d2.scale)
      val intDigits = math.max(d1.precision - d1.scale, d2.precision - d2.scale)
      Some(DecimalType(math.min(38, intDigits + scale), scale))
    case (DateType, TimestampType) | (TimestampType, DateType) => Some(TimestampType)
    case _ => None
  }

  /** Merge an incoming batch schema into the table schema: table column
    * order is preserved, new batch columns append (nullable). */
  def merge(table: StructType, batch: StructType): StructType = {
    val batchByName = batch.fields.map(f => f.name -> f).toMap
    val mergedExisting = table.fields.map { tf =>
      batchByName.get(tf.name) match {
        case None => tf
        case Some(bf) =>
          val w = widen(tf.dataType, bf.dataType).getOrElse(throw new IllegalArgumentException(
            s"incompatible schema evolution for column '${tf.name}': " +
              s"${tf.dataType.simpleString} vs ${bf.dataType.simpleString}"))
          tf.copy(dataType = w, nullable = tf.nullable || bf.nullable)
      }
    }
    val newCols = batch.fields.filterNot(f => table.fieldNames.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(mergedExisting ++ newCols)
  }

  /** Project a frame onto a target schema: missing columns become typed
    * nulls, present columns are cast to the (widened) target type. */
  def align(df: DataFrame, target: StructType): DataFrame = {
    val have = df.schema.fieldNames.toSet
    df.select(target.fields.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }
}
