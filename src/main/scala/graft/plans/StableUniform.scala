package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen uniform-in-[0,1): FNV-1a of the key string through the
  * murmur3 fmix64 finalizer, top 53 bits — the engine-reproducible
  * random-but-stable membership draw behind every sampling, split,
  * quota, Gumbel-resample and bootstrap path
  * ([[graft.ops.Sampling.stableUniform]]). Same arithmetic as the
  * ScalaUDF it replaces (and as the DuckDB oracle's HUGEINT mod-2⁶⁴
  * replay), inlined into whole-stage codegen — these draws run once per
  * corpus row on 100 TB scans. Null keys propagate null (the callers
  * always build the key from non-null seed:id concat). */
case class StableUniformExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_stable_uniform requires a string child, got ${child.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_stable_uniform"

  override protected def nullSafeEval(input: Any): Any =
    StableUniformExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.StableUniformExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): StableUniformExpr =
    copy(child = newChild)
}

object StableUniformExpr {
  /** Called from generated code: FNV-1a → fmix64 → top-53-bit uniform. */
  def compute(s: UTF8String): Double = {
    var h = Fnv64.hash(s)
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 33); h *= 0xc4ceb9fe1a85ec53L
    h ^= (h >>> 33)
    (h >>> 11).toDouble / (1L << 53).toDouble
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(StableUniformExpr(GraftColumnBridge.expression(c)))
}
