package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen cosine similarity over two double-array columns — the
  * ANN hot path (brute-force top-k, IVF ranking, SemDeDup verification
  * evaluate it |corpus|·|queries| times). Reads `ArrayData` elements in
  * place: no per-row primitive-array copy (the `Array[Double]` ScalaUDF
  * it replaces converts both sides every call), no UDF boundary — the
  * dot/norm loop inlines into whole-stage codegen via a static call.
  * Index-aligned sequential accumulation, identical float order to the
  * UDF and to DuckDB's `list_cosine_similarity` — so every oracle holds.
  * Null ARRAYS propagate null (standard binary-expression semantics);
  * a null ELEMENT throws — parquet vectors carry containsNull=true in
  * their schema even when no null is present, so the type check accepts
  * them, and the loud per-element check below keeps the failure mode
  * identical to the replaced UDF (which NPE'd on unboxing) instead of
  * silently reading 0.0 out of UnsafeArrayData. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(DoubleType, containsNull = false) ||
        left.dataType == ArrayType(DoubleType, containsNull = true)) {
      if (right.dataType.isInstanceOf[ArrayType] &&
          right.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"cosine_sim right side must be array<double>, got ${right.dataType}")
    } else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim left side must be array<double>, got ${left.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.CosineSim.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Called from generated code: sequential dot/norm accumulation.
    * Fails loudly on a null element — never reads it as 0.0. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_cosine_sim: null element at index $i — embedding vectors " +
            "must be dense; impute or filter null components upstream")
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column-level entry point (what [[graft.ops.Similarity.cosine]] wraps). */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
