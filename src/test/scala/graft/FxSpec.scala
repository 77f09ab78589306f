package graft

import org.apache.spark.sql.functions._
import graft.functions.Fx

class FxSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: normal, short, and exact-length docs") {
    val df = Seq("a b c d", "a b", "a b c", "").toDF("text")
      .select(Fx.shingles(Fx.tokens(col("text")), 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1) == Seq())
    assert(rows(2) == Seq("a b c"))
  }

  test("shingles are distinct") {
    val sh = Seq("x y x y x y x y").toDF("text")
      .select(Fx.shingles(Fx.tokens(col("text")), 2).as("sh"))
      .collect().head.getSeq[String](0)
    assert(sh.sorted == Seq("x y", "y x"))
  }

  test("fingerprint is stable and sensitive") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "a"), (1L, "b"))
      .toDF("k", "v").select(Fx.fingerprint(col("k"), col("v")).as("fp"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2) && fps(0) != fps(3))
  }

  test("decimal money rendering keeps two digits") {
    val s = Seq(1.5).toDF("x").select(Fx.decM(col("x")).cast("string")).collect().head.getString(0)
    assert(s == "1.50")
  }

  test("cosine of identical vectors is 1") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val c = df.select(Fx.cosine(col("a"), col("b"))).collect().head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
    assert(df.select(Fx.cosine(col("a"), col("b"))).collect().head.getDouble(0) == 0.0)
  }

  test("xorAgg is order-independent") {
    val a = Seq(1L, 2L, 3L).toDF("x").agg(Fx.xorAgg(col("x"))).collect().head.getLong(0)
    val b = Seq(3L, 1L, 2L).toDF("x").agg(Fx.xorAgg(col("x"))).collect().head.getLong(0)
    assert(a == b)
  }
}
