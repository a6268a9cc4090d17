package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen splitmix64 finalizer ([[graft.kernels.DetRng.mix]])
  * over a long column. The sketch tier needs it because FNV-1a's HIGH
  * bits are weakly avalanched on short keys (the multiply carries
  * entropy upward slowly), so HLL registers cut from the top byte of a
  * raw FNV hash collapse onto a handful of values; the finalizer's
  * xor-shift/multiply chain avalanches every bit. Bit-exactly
  * replayable in DuckDB via `StochOracle.mixSql` (the same HUGEINT
  * wrap-multiply chain the DetRng uniform oracles already use). */
case class Mix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mix64 requires a long child, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_mix64"

  override protected def nullSafeEval(v: Any): Any =
    graft.kernels.DetRng.mix(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.kernels.DetRng.mix($c)")

  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
}

object Mix64 {
  def apply(c: Column): Column =
    GraftColumnBridge.column(Mix64(GraftColumnBridge.expression(c)))
}
