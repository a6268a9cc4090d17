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
    * sentinel signature (matches the replaced UDF).
    *
    * r12 CPU-kernel tuning, all value-identical (guide §1.2 step 2):
    * the whitespace-collapse pattern is precompiled (String.replaceAll
    * re-compiled it per document); the distinct-shingle guard is a
    * primitive open-addressing table (java.util.HashSet boxed one Long
    * per distinct shingle); and the k-permutation inner loop reduces
    * `(a·m + b) mod P` by the Mersenne identity (P = 2³¹−1, so
    * x ≡ (x >> 31) + (x & P), twice, then one conditional subtract —
    * exactly the hardware `%` result for any x < 2⁶², and
    * a·m + b < P² + P < 2⁶²). */
  def compute(s: UTF8String, n: Int, k: Int,
      as: Array[Long], bs: Array[Long]): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    if (s != null) {
      // identical normalization chain to the UDF (String semantics)
      val norm = graft.ops.TextOps.WsRe
        .matcher(s.toString.trim.toLowerCase).replaceAll(" ")
      val last = math.max(norm.length - n, 0)
      // distinct-shingle set: values are in [0, P), so -1 marks empty.
      // Sized to ≥ 2× the max insert count (`last + 1` positions) — load
      // factor ≤ 0.5, probes can't cycle. Docs past 4M chars fall back
      // to the boxed set rather than pre-allocate a big table: the table
      // is sized by POSITION count, not distinct count, so the cap bounds
      // the worst-case allocation at 8M longs = 64 MiB per concurrent
      // task (r12 advisor: the old 16M-char cap allowed 256 MiB spikes).
      val useOpen = last + 1 <= (1 << 22)
      var bits = 4
      while (useOpen && (1 << bits) < (last + 1) * 2) bits += 1
      val mask = (1 << bits) - 1
      val table = if (useOpen) {
        val t = new Array[Long](1 << bits)
        java.util.Arrays.fill(t, -1L)
        t
      } else null
      val boxed = if (useOpen) null else new java.util.HashSet[Long]()
      var i = 0
      while (i <= last) {
        var h = 0xcbf29ce484222325L
        var j = i
        val end = math.min(i + n, norm.length)
        while (j < end) { h ^= norm.charAt(j); h *= 1099511628211L; j += 1 }
        val m = ((h % P) + P) % P
        var fresh = false
        if (useOpen) {
          var idx = ((m * 0x9E3779B97F4A7C15L) >>> 40).toInt & mask
          var probing = true
          while (probing) {
            val cur = table(idx)
            if (cur == -1L) { table(idx) = m; fresh = true; probing = false }
            else if (cur == m) probing = false
            else idx = (idx + 1) & mask
          }
        } else fresh = boxed.add(m)
        if (fresh) {
          var t = 0
          while (t < k) {
            var v = as(t) * m + bs(t)
            v = (v >> 31) + (v & P)
            v = (v >> 31) + (v & P)
            if (v >= P) v -= P
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
