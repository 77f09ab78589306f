package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a single narrow expression.
  *
  * The declarative signature pipeline (explode shingles → shuffle on
  * doc_id → min-aggregate per hash) moves every (doc, shingle) pair
  * through an exchange — at 100 TB that shuffle dwarfs the actual
  * hashing. This expression computes the whole signature in one pass
  * over the document INSIDE whole-stage codegen: signatures become a
  * map-only projection, and the first exchange in a dedup pipeline is
  * the (much smaller) LSH band join.
  *
  * Hash family is bit-exact with the declarative path —
  * `hash(shingle, lit(i))` is murmur3 `hashInt(i, hashString(shingle,
  * 42))`, and the string part is i-independent so each distinct
  * shingle is hashed once and only the cheap int-mix runs per hash
  * function. Parity with the explode→groupBy plan is spec-proven.
  */
object MinHashSig {

  /** JVM kernel: the signature as a plain int array, or null when the
    * doc has fewer than `k` tokens (mirrors the declarative path,
    * where such docs produce no shingle rows at all). */
  def signature(text: String, k: Int, numHashes: Int): Array[Int] = {
    val toks = text.trim.replaceAll("\\s+", " ")
      .toLowerCase(java.util.Locale.ROOT).split(" ")
    if (toks.length < k) return null
    val bases = toks.sliding(k).map(_.mkString(" ")).toArray.distinct.map { sh =>
      val u = UTF8String.fromString(sh)
      Murmur3_x86_32.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42)
    }
    Array.tabulate(numHashes) { i =>
      var m = Int.MaxValue
      var s = 0
      while (s < bases.length) {
        val h = Murmur3_x86_32.hashInt(i, bases(s))
        if (h < m) m = h
        s += 1
      }
      m
    }
  }

  /** Codegen entry point (called from generated Java). */
  def compute(text: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val sig = signature(text.toString, k, numHashes)
    if (sig == null) null else new GenericArrayData(sig)
  }
}

case class MinHashSigExpr(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true // < k tokens → null
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(v: Any): Any =
    MinHashSig.compute(v.asInstanceOf[UTF8String], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graft.MinHashSig.compute($c, $k, $numHashes);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigFunctions {
  /** minhash_sig(text) — codegen'd k-shingle MinHash signature. */
  def minhashSig(c: Column, k: Int, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSigExpr(ExpressionUtils.expression(c), k, numHashes))
}
