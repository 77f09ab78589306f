package graft

import org.apache.spark.sql.functions._
import graft.functions.Fx
import graft.operators.Snapshot

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "s", "v")
  private def current = Seq(
    (1L, "a", 10.0), (2L, "b", 25.0), (4L, "d", 40.0)).toDF("k", "s", "v")

  test("incrementalNew finds only rows with new keys") {
    val out = Snapshot.incrementalNew(current, base, "k").collect()
    assert(out.map(_.getLong(0)).toSet == Set(4L))
  }

  test("incrementalChanged finds only content changes on shared keys") {
    val out = Snapshot.incrementalChanged(current, base, "k",
      df => Fx.fingerprint(df("s"), df("v"))).collect()
    assert(out.map(_.getLong(0)).toSet == Set(2L))
  }

  test("mergeUpsert(base, delta) reconstructs current ∪ untouched base") {
    val delta = Snapshot.incrementalNew(current, base, "k")
      .unionByName(Snapshot.incrementalChanged(current, base, "k",
        df => Fx.fingerprint(df("s"), df("v"))))
    val merged = Snapshot.mergeUpsert(base, delta, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    // key 3 deleted upstream stays (backup semantics: no implicit delete)
    assert(merged == Set((1L, "a", 10.0), (2L, "b", 25.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("mergeUpsert tolerates schema evolution with an explicit fill policy") {
    // delta gained a column the base never had, and dropped one it had
    val baseEvo = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
    val deltaEvo = Seq((2L, "B", true), (3L, "c", false)).toDF("k", "s", "flag")

    val merged = Snapshot.mergeUpsert(baseEvo, deltaEvo, "k")
    assert(merged.columns.toSet == Set("k", "s", "flag", "v"))
    val rows = merged.collect().map(r =>
      r.getLong(0) -> ((r.getString(1), Option(r.get(merged.columns.indexOf("flag"))),
        Option(r.get(merged.columns.indexOf("v")))))).toMap
    assert(rows(1L) == (("a", None, Some(10.0))))   // base survivor: no flag yet
    assert(rows(2L) == (("B", Some(true), None)))   // delta winner: no v anymore
    assert(rows(3L) == (("c", Some(false), None)))

    // null-fill policy gives evolution-introduced nulls a default
    val filled = Snapshot.mergeUpsert(baseEvo, deltaEvo, "k",
      fill = Map("flag" -> false, "v" -> -1.0))
    val f = filled.collect().map(r =>
      r.getLong(0) -> ((r.getBoolean(filled.columns.indexOf("flag")),
        r.getDouble(filled.columns.indexOf("v"))))).toMap
    assert(f(1L) == ((false, 10.0)) && f(2L) == ((true, -1.0)))
  }

  test("retainLatest keeps n newest per key") {
    val df = Seq((1L, 1), (1L, 2), (1L, 3), (2L, 1)).toDF("k", "ver")
    val out = Snapshot.retainLatest(df, "k", Seq(col("ver").desc), 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(out == Set((1L, 3), (1L, 2), (2L, 1)))
  }

  test("updateManifest(manifest(base), delta) == manifest(base after delta)") {
    val fp = (df: org.apache.spark.sql.DataFrame) => Fx.fingerprint(df("k"), df("v"))
    val base = Seq(
      ("p1", 1L, "a"), ("p1", 5L, "b"),
      ("p2", 2L, "c"), ("p2", 6L, "d"), ("p2", 9L, "e")).toDF("part", "k", "v")
    val added = Seq(("p1", 7L, "f"), ("p3", 10L, "g")).toDF("part", "k", "v")
    val removed = Seq(("p2", 6L, "d")).toDF("part", "k", "v") // not at a bound
    val after = Seq(
      ("p1", 1L, "a"), ("p1", 5L, "b"), ("p1", 7L, "f"),
      ("p2", 2L, "c"), ("p2", 9L, "e"),
      ("p3", 10L, "g")).toDF("part", "k", "v")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1).toList
    val incremental = Snapshot.updateManifest(
      Snapshot.manifest(base, Seq("part"), col("k"), fp(base)),
      added, removed, Seq("part"), col("k"), fp)
    val rescan = Snapshot.manifest(after, Seq("part"), col("k"), fp(after))
    assert(canon(incremental) == canon(rescan))
  }

  test("updateManifest drops a partition whose rows are all removed") {
    val fp = (df: org.apache.spark.sql.DataFrame) => Fx.fingerprint(df("k"), df("v"))
    val base = Seq(("p1", 1L, "a"), ("p2", 2L, "b")).toDF("part", "k", "v")
    val removed = Seq(("p2", 2L, "b")).toDF("part", "k", "v")
    val empty = base.filter(col("k") < 0)
    val out = Snapshot.updateManifest(
      Snapshot.manifest(base, Seq("part"), col("k"), fp(base)),
      empty, removed, Seq("part"), col("k"), fp)
    assert(out.select("part").collect().map(_.getString(0)).toList == List("p1"))
  }

  test("validateManifests classifies from manifests alone — no data rescan") {
    val fp = (df: org.apache.spark.sql.DataFrame) => Fx.fingerprint(df("k"), df("v"))
    val src = Seq(
      ("p1", 1L, "a"), ("p1", 2L, "b"),
      ("p2", 3L, "c"), ("p2", 7L, "h"),
      ("p3", 4L, "d"),
      ("p4", 5L, "e")).toDF("part", "k", "v")
    // target: p1 identical; p2 lost a row; p3 value-corrupted (same
    // count, different content hash); p4 missing entirely; p5 extra
    val dst = Seq(
      ("p1", 1L, "a"), ("p1", 2L, "b"),
      ("p2", 3L, "c"),
      ("p3", 4L, "DAMAGED"),
      ("p5", 6L, "x")).toDF("part", "k", "v")
    val out = Snapshot.validateManifests(
      Snapshot.manifest(src, Seq("part"), col("k"), fp(src)),
      Snapshot.manifest(dst, Seq("part"), col("k"), fp(dst)),
      Seq("part"))
      .collect().map(r => r.getString(0) -> r.getAs[String]("status")).toMap
    assert(out == Map(
      "p1" -> "ok",
      "p2" -> "row_count_mismatch",
      "p3" -> "content_mismatch",
      "p4" -> "missing_in_target",
      "p5" -> "missing_in_source"))
  }

  test("validateCopy classifies every damage class per partition") {
    val src = Seq(
      ("p1", 1L, "a"), ("p1", 2L, "b"),   // intact in target
      ("p2", 3L, "c"), ("p2", 4L, "d"),   // row lost in target
      ("p3", 5L, "e"),                    // value corrupted in target
      ("p4", 6L, "f")                     // partition missing in target
    ).toDF("part", "k", "v")
    val dst = Seq(
      ("p1", 1L, "a"), ("p1", 2L, "b"),
      ("p2", 3L, "c"),
      ("p3", 5L, "X"),
      ("p5", 7L, "g")                     // partition missing in source
    ).toDF("part", "k", "v")
    val fp = (df: org.apache.spark.sql.DataFrame) => Fx.fingerprint(df("k"), df("v"))
    val out = Snapshot.validateCopy(src, dst, Seq("part"), col("k"), fp)
      .collect().map(r => (r.getString(0), r.getString(3))).toMap
    assert(out == Map(
      "p1" -> "ok",
      "p2" -> "row_count_mismatch",
      "p3" -> "content_mismatch",
      "p4" -> "missing_in_target",
      "p5" -> "missing_in_source"))
  }

  test("hll sketches: union of per-group sketches equals the whole-table sketch") {
    import org.apache.spark.sql.functions._
    val df = (1L to 2000L).map(i => (i % 7, i % 311)).toDF("g", "k")
    // the merge identity that makes per-partition manifest sketches
    // sound: estimate(union(parts)) == estimate(sketch(whole))
    val parts = df.groupBy("g").agg(hll_sketch_agg(col("k")).as("sk"))
    val merged = parts.agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head().getLong(0)
    val direct = df.agg(hll_sketch_estimate(hll_sketch_agg(col("k")))).head().getLong(0)
    assert(merged == direct)
    assert(math.abs(merged - 311.0) / 311.0 < 0.05, s"estimate $merged vs exact 311")
  }

  test("gfsRetention keeps 7 dailies, week-lasts, month-lasts — and drops the rest") {
    import java.time.LocalDate
    // daily catalog 2024-01-01 .. 2024-03-15 (75 snapshots)
    val days = Iterator.iterate(LocalDate.parse("2024-01-01"))(_.plusDays(1))
      .takeWhile(!_.isAfter(LocalDate.parse("2024-03-15")))
      .map(d => Tuple1(java.sql.Date.valueOf(d))).toSeq
    val out = Snapshot.gfsRetention(days.toDF("snap_date"), 7, 4, 12)
      .collect()
      .map(r => r.getDate(0).toString ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(out.size == 75)
    // dailies: the newest 7 calendar days
    val dailies = out.filter(_._2._1).keys.toSet
    assert(dailies == (9 to 15).map(d => f"2024-03-$d%02d").toSet, s"dailies: $dailies")
    // weeklies: last snapshot of the 4 newest ISO (Monday-start) weeks
    val weeklies = out.filter(_._2._2).keys.toSet
    assert(weeklies == Set("2024-03-15", "2024-03-10", "2024-03-03", "2024-02-25"),
      s"weeklies: $weeklies")
    // monthlies: last snapshot of each month (12 covers all 3)
    val monthlies = out.filter(_._2._3).keys.toSet
    assert(monthlies == Set("2024-03-15", "2024-02-29", "2024-01-31"), s"monthlies: $monthlies")
    // keep = the union of tiers; an uncovered mid-month day is dropped
    assert(!out("2024-01-15")._4)
    assert(out.count(_._2._4) == (dailies ++ weeklies ++ monthlies).size)
  }

  test("gfsRetention invariants hold on a randomized sparse catalog") {
    import java.time.LocalDate
    val rnd = new scala.util.Random(7)
    // ~40% of days over 5 months survive — gaps everywhere
    val days = Iterator.iterate(LocalDate.parse("2024-01-01"))(_.plusDays(1))
      .takeWhile(!_.isAfter(LocalDate.parse("2024-05-20")))
      .filter(_ => rnd.nextDouble() < 0.4)
      .map(d => Tuple1(java.sql.Date.valueOf(d))).toSeq
    val rows = Snapshot.gfsRetention(days.toDF("snap_date"), 7, 4, 12).collect()
      .map(r => (r.getDate(0).toLocalDate,
        r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
    assert(rows.length == days.length)
    // tier counts: min(N, available) exactly
    assert(rows.count(_._2) == math.min(7, days.length))
    val weeks = rows.map(r => r._1.`with`(java.time.DayOfWeek.MONDAY)).distinct
    assert(rows.count(_._3) == math.min(4, weeks.length))
    val months = rows.map(_._1.withDayOfMonth(1)).distinct
    assert(rows.count(_._4) == math.min(12, months.length))
    // keep is exactly the tier disjunction; newest snapshot always kept
    assert(rows.forall(r => r._5 == (r._2 || r._3 || r._4)))
    val newest = rows.maxBy(_._1.toEpochDay)
    assert(newest._2 && newest._3 && newest._4)
  }
}
