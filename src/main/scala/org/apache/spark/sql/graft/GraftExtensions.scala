package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point (SURVEY §1 `plans/`): registers
  * the graft vector expressions as SQL functions so `spark.sql(...)`
  * users get them too:
  *
  *   spark.sql("SELECT float_vec_cosine(a.embedding, b.embedding) ...")
  *
  * Activate either via
  *   `--conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  * or programmatically on an existing session with
  *   `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => TopKPerKeyRule)
    // post-pushdown (pre-CBO): swap wrapped graft V1 scans for
    // stats-bearing LogicalRelations so small masked/mapped/temporal
    // store tables and bounded change feeds broadcast in SQL joins
    ext.injectPreCBORule(_ => V1StatsRelationRule)
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectPlannerStrategy(_ => GraftMergeStrategy)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "java_udf")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("float_vec_dot",
      info("float_vec_dot", "float_vec_dot(a, b) - double-precision dot product of two float arrays"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))),
    ("float_vec_norm",
      info("float_vec_norm", "float_vec_norm(a) - double-precision L2 norm of a float array"),
      (args: Seq[Expression]) => FloatVecNorm(args(0))),
    ("float_vec_cosine",
      info("float_vec_cosine", "float_vec_cosine(a, b) - double-precision cosine similarity"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.Divide(
          FloatVecDot(args(0), args(1)),
          org.apache.spark.sql.catalyst.expressions.Multiply(
            FloatVecNorm(args(0)), FloatVecNorm(args(1))))),
    ("rolling_hash",
      info("rolling_hash", "rolling_hash(str) - polynomial rolling hash over code points"),
      (args: Seq[Expression]) => RollingHashExpr(args(0))),
    ("deflate_ratio",
      info("deflate_ratio", "deflate_ratio(str) - DEFLATE compression ratio of the UTF-8 bytes"),
      (args: Seq[Expression]) => DeflateRatioExpr(args(0))),
    ("hyperplane_sig",
      info("hyperplane_sig", "hyperplane_sig(vec, planes) - packed sign-bit random-hyperplane LSH signature"),
      (args: Seq[Expression]) => HyperplaneSigExpr(args(0),
        intLiteral(args(1), "hyperplane_sig", "planes"))),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(text, k, numHashes) - MinHash signature over word k-shingles"),
      (args: Seq[Expression]) => MinHashSigExpr(args(0),
        intLiteral(args(1), "minhash_sig", "k"),
        intLiteral(args(2), "minhash_sig", "numHashes"))))

  private def intLiteral(e: Expression, fn: String, arg: String): Int =
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    }

  /** Register into an already-running session (tests, spark-shell).
    * Idempotent: safe to call once per query construction. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(TopKPerKeyRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKPerKeyRule
    }
    // "User Provided Optimizers" runs AFTER V2 scan pushdown, so the
    // V1ScanWrapper is visible here — same placement as the pre-CBO
    // injection on the extensions path
    if (!spark.experimental.extraOptimizations.contains(V1StatsRelationRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ V1StatsRelationRule
    }
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    if (!spark.experimental.extraStrategies.contains(GraftMergeStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftMergeStrategy
    }
  }
}
