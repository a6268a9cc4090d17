package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen bigram-bucket walk for the Kneser-Ney tier
  * ([[graft.ops.TextOps.knBigramWalk]]): per document, the sequence of
  * adjacent word-bucket pairs, each pair PACKED into one long
  * (`bv · buckets + bw` — both in [0, buckets), so the pack is
  * lossless and the unpack is integer division/modulo in pure
  * expressions). Replaces the ScalaUDF on the corpus-wide tokenize
  * pass of `knPerplexity` / `knTargetPerplexity` — the per-row result
  * is a primitive long array (`UnsafeArrayData`), no tuple-encoder
  * boundary.
  *
  * Values are the SAME walk as the kernel (`knBigramWalk` stays the
  * single definition, called by both this expression and the streaming
  * scorer), so batch, stream, and the DuckDB oracle can never drift.
  * Null text → empty array (matches the UDF), hence `nullable=false`. */
case class KnBigramsExpr(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets >= 2, s"buckets must be >= 2, got $buckets")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kn_bigrams requires a string child, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kn_bigrams"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    KnBigramsExpr.compute(
      if (v == null) null else v.asInstanceOf[UTF8String], buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.plans.KnBigramsExpr.compute(
            ${c.isNull} ? null : ${c.value}, $buckets);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): KnBigramsExpr =
    copy(child = newChild)
}

object KnBigramsExpr {

  /** Called from generated code: the shared walk, already packed —
    * no boxed tuple array between the walk and the unsafe array. */
  def compute(s: UTF8String, buckets: Int): ArrayData = {
    val packed = graft.ops.TextOps.knBigramWalkPacked(
      if (s == null) null else s.toString, buckets)
    if (packed.isEmpty) new GenericArrayData(Array.empty[Long])
    else UnsafeArrayData.fromPrimitiveArray(packed)
  }

  def apply(c: Column, buckets: Int): Column =
    GraftColumnBridge.column(
      KnBigramsExpr(GraftColumnBridge.expression(c), buckets))
}
