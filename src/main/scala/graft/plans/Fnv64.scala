package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's deterministic FNV-1a 64
  * hash (the workhorse key behind fingerprints, dedup, shard routing and
  * stable sampling — [[graft.ops.TextOps.fnv64]]): a `doGenCode` static
  * call that stays inside whole-stage codegen, replacing the ScalaUDF
  * wrapper (udf boundary = per-row converter + closure dispatch outside
  * codegen).
  *
  * Semantics are IDENTICAL to the UDF it replaces, including the quirk
  * the gate depends on: null input hashes to the FNV offset basis (the
  * empty-string hash), not null — so `nullable = false` and every
  * existing oracle replay holds bit-for-bit. Hashing walks UTF-16 code
  * units (`String.charAt`), matching both the Scala kernel walkers and
  * the DuckDB oracle's per-codepoint fold on BMP text. */
case class Fnv64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fnv64 requires a string child, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_fnv64"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) Fnv64.NullHash else Fnv64.hash(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? ${Fnv64.NullHash}L
          : graft.plans.Fnv64.hash(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Fnv64 =
    copy(child = newChild)
}

object Fnv64 {
  /** FNV-1a offset basis — what the replaced UDF returned for null. */
  val NullHash: Long = 0xcbf29ce484222325L

  /** Called from generated code: FNV-1a over UTF-16 code units. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < str.length) {
      h ^= str.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Column-level entry point (what [[graft.ops.TextOps.fnvHash]] wraps). */
  def apply(c: Column): Column =
    GraftColumnBridge.column(Fnv64(GraftColumnBridge.expression(c)))
}
