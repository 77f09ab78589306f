package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, LongType}

/** Packed random-hyperplane LSH signature as a single narrow
  * expression (the vector twin of [[MinHashSigExpr]]).
  *
  * The typed-Dataset formulation deserializes every row to
  * `(Long, Array[Float])` through an Encoder, runs the kernel, and
  * re-serializes — per-row object churn that whole-stage codegen
  * cannot fuse across. This expression reads the float array straight
  * out of the columnar/unsafe row inside generated code: signatures
  * become part of whatever projection pipeline the plan already runs
  * (bit-exact parity with the typed path is spec-proven; the sign
  * table is memoized once per (planes, dim) shape per JVM).
  */
object HyperplaneSig {

  /** Codegen entry point (called from generated Java). Walks the
    * ArrayData directly — no Array[Float] materialization — but
    * accumulates in the same left-to-right double order as
    * [[graft.operators.Similarity.hyperplaneBits]], so results are
    * bit-identical. */
  def compute(e: ArrayData, planes: Int): Long = {
    val n = e.numElements()
    val signs = graft.operators.Similarity.planeSigns(planes, n)
    var bits = 0L
    var p = 0
    while (p < planes) {
      val sp = signs(p)
      var s = 0.0
      var i = 0
      while (i < n) {
        s += (if (sp(i) == 1) e.getFloat(i).toDouble else -e.getFloat(i).toDouble)
        i += 1
      }
      if (s > 0) bits |= 1L << p
      p += 1
    }
    bits
  }
}

case class HyperplaneSigExpr(child: Expression, planes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(v: Any): Any =
    HyperplaneSig.compute(v.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.HyperplaneSig.compute($c, $planes)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
}

object HyperplaneSigFunctions {
  /** hyperplane_sig(embedding) — codegen'd packed sign-bit signature. */
  def hyperplaneSig(c: Column, planes: Int): Column =
    ExpressionUtils.column(HyperplaneSigExpr(ExpressionUtils.expression(c), planes))
}
