package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE compression ratio of a string's UTF-8 bytes:
  * compressed_len / raw_len (raw headers, no zlib/gzip wrapper).
  *
  * The Gopher/MassiveText-family repetitiveness signal no builtin
  * covers: template spam, looping generations, and boilerplate
  * compress far below natural prose (~0.2 vs ~0.6 at paragraph
  * length), catching long-range repetition that token/bigram fractions
  * (TextAnalysis.repetition) miss. Implemented as a native Catalyst
  * expression — a Scala UDF here would box every row and fall out of
  * whole-stage codegen; this stays a static call inside the generated
  * loop. Empty input → 1.0 (nothing to compress).
  *
  * Note: the exact ratio is zlib-implementation-defined (JVM Deflater,
  * level 6). Spark-side fleet runs are deterministic (one JVM zlib
  * everywhere); external engines may differ in the last few bytes, so
  * queries over it are rows-only / threshold-gated, never value-hashed.
  */
object DeflateRatio {
  /** JVM kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / raw.length
    } finally d.end()
  }
}

case class DeflateRatioExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override protected def nullSafeEval(v: Any): Any =
    DeflateRatio.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.DeflateRatio.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatioExpr =
    copy(child = newChild)
}

object DeflateRatioFunctions {
  /** deflate_ratio(text) — codegen'd compression-ratio quality signal. */
  def deflateRatio(c: Column): Column =
    ExpressionUtils.column(DeflateRatioExpr(ExpressionUtils.expression(c)))
}
