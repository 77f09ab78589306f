package graft

import org.apache.spark.sql.graft.GraftExtensions
import graft.operators.AsofJoin

class AsofAndExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin attaches latest right row at-or-before left time, per key") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 20L, 150L))
      .toDF("id", "k", "t")
    val right = Seq((11L, 10L, 100L), (12L, 10L, 200L), (13L, 20L, 160L))
      .toDF("rid", "k", "rt")
    val out = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("rid", "rt"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out(1L).contains(11L)) // equal timestamp → inclusive match
    assert(out(2L).contains(12L)) // latest of two candidates
    assert(out(3L).isEmpty)       // right row is after left time → no match
  }

  test("asofJoin forward direction attaches earliest right at-or-after, per key") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 20L, 150L))
      .toDF("id", "k", "t")
    val right = Seq((11L, 10L, 100L), (12L, 10L, 200L), (13L, 20L, 140L))
      .toDF("rid", "k", "rt")
    val out = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("rid"),
        forward = true)
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out(1L).contains(11L)) // equal timestamp → inclusive
    assert(out(2L).isEmpty)       // nothing at-or-after 205
    assert(out(3L).isEmpty)       // right row is BEFORE left time in forward mode
  }

  test("asofJoinNearest picks the closer side, breaks ties backward, bounds by tolerance") {
    import org.apache.spark.sql.functions.lit
    val left = Seq(
      (1L, 10L, 100L), // backward 90 (d=10) vs forward 150 (d=50) → backward
      (2L, 10L, 145L), // backward 90 (d=55) vs forward 150 (d=5)  → forward
      (3L, 10L, 120L), // equidistant 90/150 (d=30)                → tie → backward
      (4L, 20L, 100L), // forward-only side
      (5L, 30L, 100L)  // no right rows at all
    ).toDF("id", "k", "t")
    val right = Seq((11L, 10L, 90L), (12L, 10L, 150L), (21L, 20L, 130L))
      .toDF("rid", "k", "rt")
    def run(tol: Option[org.apache.spark.sql.Column]) =
      AsofJoin.asofJoinNearest(left, right, "k", "t", "rt", Seq("rid"), tol)
        .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val out = run(None)
    assert(out(1L).contains(11L))
    assert(out(2L).contains(12L))
    assert(out(3L).contains(11L)) // tie → backward
    assert(out(4L).contains(21L))
    assert(out(5L).isEmpty)
    // tolerance 20 keeps only distances ≤ 20: rows 1 (10) and 2 (5)
    val tight = run(Some(lit(20L)))
    assert(tight(1L).contains(11L) && tight(2L).contains(12L))
    assert(tight(3L).isEmpty && tight(4L).isEmpty && tight(5L).isEmpty)
  }

  test("asofJoin tolerance nulls out matches that are too far away") {
    import org.apache.spark.sql.functions.lit
    val left = Seq((1L, 10L, 100L), (2L, 10L, 500L)).toDF("id", "k", "t")
    val right = Seq((11L, 10L, 90L)).toDF("rid", "k", "rt")
    val out = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("rid"),
        tolerance = Some(lit(50L)))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out(1L).contains(11L)) // 10 away: within tolerance
    assert(out(2L).isEmpty)       // 410 away: match nulled out
  }

  test("SQL functions registered via GraftExtensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT float_vec_dot(a, a) AS d, float_vec_norm(a) AS n,
        |  float_vec_cosine(a, a) AS c
        |FROM (SELECT CAST(array(3.0, 4.0) AS ARRAY<FLOAT>) AS a)""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 25.0)
    assert(r.getDouble(1) == 5.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("rolling_hash matches the hand-computed polynomial") {
    GraftExtensions.register(spark)
    val h = spark.sql("SELECT rolling_hash('ab')").collect().head.getLong(0)
    assert(h == (97L * 31 + 98) % 1000000007L) // ((0*31+97)*31+98) % p
    // empty string → 0; stability across rows
    assert(spark.sql("SELECT rolling_hash('')").collect().head.getLong(0) == 0L)
  }

  test("minhash_sig SQL function matches the typed MinHashSig kernel") {
    GraftExtensions.register(spark)
    val txt = "the quick brown fox jumps over the lazy dog"
    val viaSql = spark.sql(s"SELECT minhash_sig('$txt', 3, 16)")
      .collect().head.getSeq[Int](0)
    val direct = org.apache.spark.sql.graft.MinHashSig.signature(txt, 3, 16)
    assert(viaSql == direct.toSeq)
    // < k tokens → null, same as the kernel's contract
    assert(spark.sql("SELECT minhash_sig('one two', 3, 16)").collect().head.isNullAt(0))
  }
}
