package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the fused text → MinHash signature —
  * the hottest scalar kernel of the near-dup tier
  * ([[graft.ops.Dedup.minhashSigFromText]]): normalize, roll the n-char
  * FNV shingle hash, and maintain all k running (a·h + b) mod p minima
  * in ONE pass, emitted as a `doGenCode` static call so the whole scan →
  * signature pipeline stays inside whole-stage codegen (the ScalaUDF it
  * replaces paid a per-row converter for the String argument and boxed
  * the Array[Long] return through the row encoder).
  *
  * Semantics are IDENTICAL to the UDF bit-for-bit — same
  * trim/toLowerCase/whitespace-collapse normalization (String ops, so
  * locale behavior is unchanged), same UTF-16 code-unit FNV walk, same
  * distinct-shingle guard, and null text → all-Long.MaxValue sentinel
  * signature (`nullable = false`), so every minhash oracle replay
  * holds unchanged. The (a, b) permutation parameters are embedded as
  * codegen reference objects. */
case class MinhashSigExpr(child: Expression, n: Int, k: Int, seed: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires a string child, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val params: (Array[Long], Array[Long]) =
    graft.ops.Dedup.minhashParams(k, seed)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    MinhashSigExpr.compute(
      if (v == null) null else v.asInstanceOf[UTF8String],
      n, k, params._1, params._2)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val asRef = ctx.addReferenceObj("minhashAs", params._1, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", params._2, "long[]")
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.plans.MinhashSigExpr.compute(
            ${c.isNull} ? null : ${c.value}, $n, $k, $asRef, $bsRef);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

object MinhashSigExpr {
  private val P = 2147483647L

  /** Called from generated code. Null/absent text → the all-MaxValue
    * sentinel signature (matches the replaced UDF). */
  def compute(s: UTF8String, n: Int, k: Int,
      as: Array[Long], bs: Array[Long]): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    if (s != null) {
      // identical normalization chain to the UDF (String semantics)
      val norm = s.toString.trim.toLowerCase.replaceAll("\\s+", " ")
      val seen = new java.util.HashSet[Long]()
      var i = 0
      val last = math.max(norm.length - n, 0)
      while (i <= last) {
        var h = 0xcbf29ce484222325L
        var j = i
        val end = math.min(i + n, norm.length)
        while (j < end) { h ^= norm.charAt(j); h *= 1099511628211L; j += 1 }
        val m = ((h % P) + P) % P
        if (seen.add(m)) {
          var t = 0
          while (t < k) {
            val v = (as(t) * m + bs(t)) % P
            if (v < mins(t)) mins(t) = v
            t += 1
          }
        }
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Column-level entry point. */
  def apply(text: Column, n: Int, k: Int, seed: Int): Column =
    GraftColumnBridge.column(
      MinhashSigExpr(GraftColumnBridge.expression(text), n, k, seed))
}
