package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

/** Shared column-expression helpers.
  *
  * Float discipline (SURVEY §4): money math goes through tight DECIMAL
  * types so sums are exact and order-independent — identical on any
  * engine and any partitioning — then is cast to DOUBLE and rounded at
  * the output boundary. Everything here is built from
  * `org.apache.spark.sql.functions` (whole-stage-codegen'd); no UDFs.
  */
object Fx {
  /** Money amounts: ≤ 2 decimal places, < 10^10. */
  def decM(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Rates (discount/tax): ≤ 2 decimal places, < 100. */
  def decR(c: Column): Column = c.cast(DecimalType(4, 2))
  /** Measurements (events.value): ≤ 4 decimal places. */
  def decV(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Exact decimal sum rendered as a rounded double. */
  def moneySum(c: Column): Column = round(sum(decM(c)).cast(DoubleType), 2)
  /** Exact decimal mean rendered as a rounded double (sum/count, never
    * engine-native AVG, whose accumulation order is engine-defined). */
  def moneyAvg(c: Column): Column =
    round(sum(decM(c)).cast(DoubleType) / count(lit(1)), 4)

  /** revenue term: extendedprice * (1 - discount), exact decimal. */
  def revenue(price: Column, discount: Column): Column =
    decM(price) * (lit(1).cast(DecimalType(4, 2)) - decR(discount))

  /** Canonical string rendering for row fingerprints. Numeric columns
    * must be passed through decM/decR first so both Spark and any
    * oracle render identical digits (doubles stringify differently
    * across engines; decimals do not).
    */
  def canonical(cols: Column*): Column = concat_ws("|", cols.map(_.cast(StringType)): _*)

  /** Per-row content fingerprint — the incremental-backup primitive.
    * md5 where an external oracle must reproduce it; callers that only
    * need Spark-internal hashing should prefer [[fastFingerprint]].
    */
  def fingerprint(cols: Column*): Column = md5(canonical(cols: _*))

  /** xxhash64 row fingerprint — codegen'd, 8 bytes, for Spark-internal
    * change detection at 100 TB (no hex-string materialization). */
  def fastFingerprint(cols: Column*): Column = xxhash64(cols: _*)

  /** Order-independent aggregate hash of a group of 64-bit
    * fingerprints: XOR-combine. Scales to any group size (no collect,
    * no sort) — the manifest primitive for 100 TB backup validation. */
  def xorAgg(fp: Column): Column = bit_xor(fp)

  // ---- text ----

  /** Whitespace-normalized, lowercased text. */
  def normText(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokens of normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Word k-shingles (k consecutive tokens joined by a space),
    * distinct. Built with higher-order functions → stays inside
    * whole-stage codegen. */
  def shingles(toks: Column, k: Int): Column = {
    val sh = transform(sequence(lit(0), size(toks) - k),
      i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*))
    // Guard: sequence(0, n) with n < 0 counts DOWN in Spark, so short
    // docs must short-circuit to an empty shingle set.
    array_distinct(when(size(toks) >= k, sh).otherwise(array().cast("array<string>")))
  }

  // ---- vectors (Array[Float] embedding columns) ----

  /** Element-wise dot product accumulated in double, left-to-right.
    * Backed by the codegen'd [[FloatVecDot]] Catalyst expression; the
    * interpreted HOF equivalent (`aggregate(zip_with(...))`) computes
    * the identical value ~20× slower. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.vecDot(a, b)

  /** L2 norm accumulated in double — codegen'd FloatVecNorm. */
  def l2norm(a: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.vecNorm(a)

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))
}
