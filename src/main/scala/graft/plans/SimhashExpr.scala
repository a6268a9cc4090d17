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

/** Native codegen 64-bit SimHash (cites reference dedup behavior per
  * `graft.ops.Dedup.simhash`): sign-sum of per-token FNV-1a bits over
  * whitespace tokens of normalized text. Replaces the ScalaUDF on the
  * corpus-wide signature pass — the last per-document string UDF on the
  * dedup tier — keeping the scan inside whole-stage codegen.
  *
  * Semantics IDENTICAL to the replaced UDF, bit-for-bit (the DuckDB
  * oracle mirrors the same fold): null text normalizes to "" and ""
  * splits (Java `split(" ", -1)`) to one empty token whose FNV hash is
  * the offset basis — so `nullable = false` and the null/empty
  * signature is the offset basis' sign pattern, exactly as before. */
case class SimhashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires a string child, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    SimhashExpr.compute(if (v == null) null else v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = graft.plans.SimhashExpr.compute(
          ${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

object SimhashExpr {

  /** Called from generated code — the exact loop of the replaced UDF. */
  def compute(s: UTF8String): Long = {
    val text = if (s == null) null else s.toString
    val norm =
      if (text == null) ""
      // precompiled pattern — String.replaceAll re-compiles per document
      else graft.ops.TextOps.WsRe.matcher(text.trim.toLowerCase).replaceAll(" ")
    val toks = norm.split(" ", -1)
    val votes = new Array[Int](64)
    var ti = 0
    while (ti < toks.length) {
      val h = graft.ops.TextOps.fnv64(toks(ti))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      ti += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(SimhashExpr(GraftColumnBridge.expression(c)))
}
