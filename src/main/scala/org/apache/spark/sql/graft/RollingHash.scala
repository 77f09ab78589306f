package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over Unicode code points:
  * `acc ← (acc · 31 + codepoint) mod 1_000_000_007`, acc₀ = 0.
  *
  * The document-fingerprinting primitive for incremental backup and
  * dedup: 8 bytes per document, codegen'd, order-sensitive (unlike a
  * bag-of-words hash) yet cheap to compute incrementally. Defined over
  * code points (not UTF-8 bytes) so an external oracle can reproduce
  * it from standard SQL string functions.
  */
object RollingHash {
  val Mult = 31L
  val Mod = 1000000007L

  /** JVM kernel shared by interpreted eval and generated code. */
  def compute(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * Mult + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}

case class RollingHashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(v: Any): Any =
    RollingHash.compute(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.RollingHash.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

object RollingHashFunctions {
  /** rolling_hash(text) — codegen'd polynomial fingerprint. */
  def rollingHash(c: Column): Column =
    ExpressionUtils.column(RollingHashExpr(ExpressionUtils.expression(c)))
}
