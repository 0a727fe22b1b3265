package graft.functions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Cosine similarity of two float-array embeddings as ONE native expression.
 *
 * The composed-Column formulation (`Σ a[i]*b[i] / (sqrt(Σ a[i]^2) * ...)`)
 * expands to ~200 expression nodes; when the similarity filter is pushed
 * into a nested-loop join condition, the generated predicate exceeds the
 * JIT/codegen budget and Spark silently falls back to per-node interpreted
 * eval — measured 65s for a 2M-pair join. Here the whole computation is a
 * single expression whose eval is one tight loop over both arrays (~2s for
 * the same join), from interpreted AND generated code paths.
 *
 * Sum order matches the term-by-term left-to-right Column formulation and
 * the DuckDB oracle (`list_cosine_similarity` over DOUBLE lists), so results
 * are bit-identical.
 */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  /** Only array<float> — an array<double> input would silently read garbage
    * through ArrayData.getFloat, so reject it at analysis time. */
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"CosineSim requires array<float> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSim.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CosineSim {

  /** dot/(|a||b|) in double, accumulating left-to-right. Zero-norm input is
    * defined as similarity 0.0 (not NaN). */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineSim(a: Column, b: Column): Column =
    GraftExprBridge.column(CosineSim(GraftExprBridge.expression(a), GraftExprBridge.expression(b)))
}
