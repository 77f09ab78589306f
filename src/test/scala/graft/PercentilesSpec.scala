package graft

import org.apache.spark.sql.functions._
import graft.operators.Percentiles

class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq("p0" -> 0.0, "p37" -> 0.37, "p50" -> 0.5, "p90" -> 0.9, "p100" -> 1.0)

  private def referenceAgg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g").agg(
      count(lit(1)).as("n"),
      qs.map { case (name, q) => expr(s"percentile(v, $q)").as(name) }: _*)

  private def check(df: org.apache.spark.sql.DataFrame): Unit = {
    val got = Percentiles.exactQuantiles(df, "g", "v", qs)
      .collect().map(r => r.getString(0) -> r).toMap
    val want = referenceAgg(df).collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == want.keySet)
    for (g <- want.keySet) {
      assert(got(g).getLong(1) == want(g).getLong(1), s"n mismatch for group $g")
      qs.indices.foreach { i =>
        val e = want(g).getDouble(2 + i)
        val a = got(g).getDouble(2 + i)
        assert(math.abs(a - e) <= 1e-9 * math.max(1.0, math.abs(e)),
          s"group $g ${qs(i)._1}: got $a want $e")
      }
    }
  }

  test("matches built-in percentile() on random data with duplicates") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 5000).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      // quantized values → plenty of exact duplicates
      (g, math.floor(rnd.nextDouble() * 500) / 10.0)
    }.toDF("g", "v")
    check(df)
  }

  test("degenerate groups: single row, all-equal values, two rows") {
    val df = (Seq(("solo", 42.5)) ++
      Seq.fill(1000)(("flat", 7.0)) ++
      Seq(("pair", 1.0), ("pair", 2.0))).toDF("g", "v")
    check(df)
  }

  test("nulls are ignored, skewed distribution still exact") {
    val rnd = new scala.util.Random(23)
    val vals = (1 to 3000).map { i =>
      // heavy-tailed: most mass near 0, long tail — stresses the
      // equi-width histogram's uneven bucket occupancy
      ("skew", Option(math.pow(rnd.nextDouble(), 8) * 1e6))
    } ++ Seq.fill(50)(("skew", None: Option[Double]))
    val df = vals.toDF("g", "v")
    check(df.filter(col("v").isNotNull)) // reference over non-null
    // and the operator itself ignores nulls:
    val withNulls = Percentiles.exactQuantiles(df, "g", "v", Seq("p50" -> 0.5))
      .collect().head
    val ref = referenceAgg(df.filter(col("v").isNotNull)).collect().head
    assert(withNulls.getLong(1) == ref.getLong(1))
    assert(math.abs(withNulls.getDouble(2) - ref.getDouble(4)) <= 1e-6)
  }

  test("precomputed stats (manifest sidecar) replace pass 1 — same result, one scan fewer") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 4000).map(i => (s"g${i % 3}", rnd.nextDouble() * 100)).toDF("g", "v")
    val stats = graft.operators.Snapshot.valueStats(df, "g", "v")
    val direct = Percentiles.exactQuantiles(df, "g", "v", qs)
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    val boot = Percentiles.exactQuantiles(df, "g", "v", qs, Some(stats))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(direct == boot)
    // the fact table is referenced once per remaining pass: 3 direct, 2 bootstrapped
    def factScans(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.length
    val statsMat = stats.cache()
    statsMat.count()
    try {
      assert(factScans(Percentiles.exactQuantiles(df, "g", "v", qs, Some(statsMat)))
        < factScans(Percentiles.exactQuantiles(df, "g", "v", qs)))
    } finally { statsMat.unpersist(); () }
  }
}
