package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{ConcurrentWriteConflictException, ManifestStore, SnapshotStore, VersionConflictException}

/** Optimistic-concurrency commit protocol (SURVEY §2 snapshot domain —
  * the Delta/Iceberg multi-writer contract): CAS version publication
  * plus rebase-and-retry, proven with REAL interleaved threads on BOTH
  * store layouts. The invariant under test everywhere: two concurrent
  * writers never corrupt or silently lose a version — one commits and
  * the other rebases, or fails loudly. */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def rows(ks: Seq[Int], tag: String) =
    ks.map(k => (k.toLong, s"$tag-$k")).toDF("k", "v")

  private def contents(df: DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet

  /** Run both thunks concurrently (latch-aligned start), return their
    * outcomes. */
  private def race[A](a: () => A, b: () => A): (Either[Throwable, A], Either[Throwable, A]) = {
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    def submit(f: () => A) = pool.submit { () =>
      start.await()
      try Right(f()) catch { case t: Throwable => Left(t) }
    }
    val (fa, fb) = (submit(a), submit(b))
    start.countDown()
    val out = (fa.get(120, TimeUnit.SECONDS), fb.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    out
  }

  // --- raw CAS: same explicit target version, exactly one winner ---

  private def rawRaceAssert(merge: DataFrame => Unit, read: () => DataFrame,
      versions: () => Seq[Long]): Unit = {
    val dA = rows(Seq(1, 2), "A")
    val dB = rows(Seq(3, 4), "B")
    val (ra, rb) = race(() => merge(dA), () => merge(dB))
    val losses = Seq(ra, rb).count {
      case Left(_: VersionConflictException) => true
      case Left(t) => fail(s"loser must throw VersionConflictException, got $t")
      case Right(_) => false
    }
    assert(losses == 1, s"exactly one writer must lose the CAS race, got $losses")
    assert(versions() == Seq(1L, 2L))
    // the winner's version is INTACT: base rows plus exactly one delta
    val got = contents(read())
    val base = contents(rows(1 to 20, "base"))
    val winA = base.filterNot(r => Set(1L, 2L)(r._1)) ++ contents(dA)
    val winB = base.filterNot(r => Set(3L, 4L)(r._1)) ++ contents(dB)
    assert(got == winA || got == winB, "surviving version must be exactly one writer's commit")
  }

  test("CAS publish: two mergeDeltas racing the same version — one wins, one conflicts (linked)") {
    val base = java.nio.file.Files.createTempDirectory("graft-cas-man").toString
    val st = new ManifestStore(spark, base, "k")
    st.write(rows(1 to 20, "base"), 1L, numFiles = 4)
    rawRaceAssert(d => st.mergeDelta(1L, 2L, d): Unit, () => st.read(2L), () => st.versions())
    // loser left no leftovers: the version dir holds ONLY the winner's commit
    assert(st.validate(2L).filter(col("status") =!= "ok").count() == 0)
  }

  test("CAS publish: two mergeDeltas racing the same version — one wins, one conflicts (snapshot)") {
    val base = java.nio.file.Files.createTempDirectory("graft-cas-snap").toString
    val st = new SnapshotStore(spark, base, "k")
    st.writeRangePartitioned(rows(1 to 20, "base"), 1L, 4)
    rawRaceAssert(d => st.mergeDelta(1L, 2L, d): Unit, () => st.read(2L), () => st.versions())
  }

  // --- mergeAtTip: disjoint keys commute (rebase), overlap aborts ---

  test("mergeAtTip: concurrent disjoint-key merges both commit — loser rebases to the new tip (linked)") {
    val base = java.nio.file.Files.createTempDirectory("graft-oc-man").toString
    val st = new ManifestStore(spark, base, "k")
    st.write(rows(1 to 40, "base"), 1L, numFiles = 4)
    val dA = rows(Seq(2, 4), "A")
    val dB = rows(Seq(7, 41), "B") // update 7, insert 41 — disjoint from A
    val (ra, rb) = race(() => st.mergeAtTip(dA), () => st.mergeAtTip(dB))
    assert(Seq(ra, rb).forall(_.isRight), s"both disjoint writers must commit: $ra / $rb")
    assert(Set(ra, rb).map(_.toOption.get) == Set(2L, 3L), "commits serialize as v2 then v3")
    val want = contents(rows(1 to 40, "base"))
      .filterNot(r => Set(2L, 4L, 7L)(r._1)) ++ contents(dA) ++ contents(dB)
    assert(contents(st.read(3L)) == want, "final state carries BOTH commits")
  }

  test("mergeAtTip: concurrent disjoint-key merges both commit — loser rebases to the new tip (snapshot)") {
    val base = java.nio.file.Files.createTempDirectory("graft-oc-snap").toString
    val st = new SnapshotStore(spark, base, "k")
    st.writeRangePartitioned(rows(1 to 40, "base"), 1L, 4)
    val dA = rows(Seq(2, 4), "A")
    val dB = rows(Seq(7, 41), "B")
    val (ra, rb) = race(() => st.mergeAtTip(dA), () => st.mergeAtTip(dB))
    assert(Seq(ra, rb).forall(_.isRight), s"both disjoint writers must commit: $ra / $rb")
    assert(Set(ra, rb).map(_.toOption.get) == Set(2L, 3L))
    val want = contents(rows(1 to 40, "base"))
      .filterNot(r => Set(2L, 4L, 7L)(r._1)) ++ contents(dA) ++ contents(dB)
    assert(contents(st.read(3L)) == want)
  }

  test("mergeAtTip: overlapping keys abort loudly instead of silently picking a winner") {
    val base = java.nio.file.Files.createTempDirectory("graft-oc-clash").toString
    val st = new ManifestStore(spark, base, "k")
    st.write(rows(1 to 40, "base"), 1L, numFiles = 4)
    // serialize the conflict deterministically: A lands first, then B —
    // whose delta was DERIVED from v1 (readVersion) — must lose the
    // commit, re-diff v1..v2, find key 5 changed by A, and abort
    assert(st.mergeAtTip(rows(Seq(5, 6), "A")) == 2L)
    intercept[ConcurrentWriteConflictException] {
      st.mergeAtTip(rows(Seq(5, 9), "B"), readVersion = Some(1L))
    }
    // A's commit is untouched by B's aborted attempt
    assert(st.versions() == Seq(1L, 2L))
    assert(contents(st.read(2L)) ==
      contents(rows(1 to 40, "base")).filterNot(r => Set(5L, 6L)(r._1)) ++
        contents(rows(Seq(5, 6), "A")))
  }

  test("mergeAtTip: overlapping keys abort loudly (snapshot layout)") {
    val base = java.nio.file.Files.createTempDirectory("graft-oc-clash-sn").toString
    val st = new SnapshotStore(spark, base, "k")
    st.writeRangePartitioned(rows(1 to 40, "base"), 1L, 4)
    assert(st.mergeAtTip(rows(Seq(5, 6), "A")) == 2L)
    intercept[ConcurrentWriteConflictException] {
      st.mergeAtTip(rows(Seq(5, 9), "B"), readVersion = Some(1L))
    }
    assert(st.versions() == Seq(1L, 2L))
  }

  test("two concurrent writeStream queries on one table serialize through the commit CAS") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files.createTempDirectory("graft_oc_stream").toString
    val cat = "occat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[org.apache.spark.sql.graft.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES('key'='k', 'layout'='linked')")
    implicit val sqlCtx = spark.sqlContext
    val inA = MemoryStream[(Long, String)]
    val inB = MemoryStream[(Long, String)]
    val qA = inA.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", s"$root/_ckptA").toTable(s"$cat.t")
    val qB = inB.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", s"$root/_ckptB").toTable(s"$cat.t")
    try {
      inA.addData((1L, "a1"), (2L, "a2"))
      inB.addData((10L, "b1"), (11L, "b2"))
      // both queries' micro-batch threads race the same tip; the loser
      // rebases through mergeAtTip — both epochs must land
      val (ra, rb) = race(() => { qA.processAllAvailable(); 0 },
        () => { qB.processAllAvailable(); 0 })
      assert(ra.isRight && rb.isRight, s"streams must not fail: $ra / $rb")
      val got = spark.sql(s"SELECT * FROM $cat.t").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "a1"), (2L, "a2"), (10L, "b1"), (11L, "b2")))
      val vs = new ManifestStore(spark, s"$root/t", "k").versions()
      assert(vs == Seq(1L, 2L, 3L), s"two epochs serialize as v2, v3: $vs")
    } finally { qA.stop(); qB.stop() }
  }

  test("mergeAtTip: 8 concurrent disjoint-block writers all commit — contiguous versions, every delta applied") {
    // randomized-interleaving stress: 8 threads each upsert a DISJOINT
    // key block against the same initial tip. Whatever order the
    // scheduler produces, optimistic concurrency must serialize them
    // as v2..v9 with NO lost update and NO corrupted version.
    val base = java.nio.file.Files.createTempDirectory("graft-oc-many").toString
    val st = new ManifestStore(spark, base, "k")
    st.write(rows(1 to 800, "base"), 1L, numFiles = 8)
    val pool = Executors.newFixedThreadPool(8)
    val start = new CountDownLatch(1)
    val futures = (0 until 8).map { i =>
      pool.submit { () =>
        start.await()
        // block i updates keys [i*100+1, i*100+20]
        val ks = (i * 100 + 1) to (i * 100 + 20)
        try Right(st.mergeAtTip(rows(ks, s"w$i"), maxRetries = 16))
        catch { case t: Throwable => Left(t) }
      }
    }
    start.countDown()
    val outs = futures.map(_.get(300, TimeUnit.SECONDS))
    assert(outs.forall(_.isRight), s"all disjoint writers must commit: $outs")
    assert(outs.map(_.toOption.get).toSet == (2L to 9L).toSet,
      "commits must serialize as v2..v9 with no gap or duplicate")
    pool.shutdown()
    val got = contents(st.read(9L))
    val want = (0 until 8).foldLeft(contents(rows(1 to 800, "base"))) { (acc, i) =>
      val ks = ((i * 100 + 1) to (i * 100 + 20)).map(_.toLong).toSet
      acc.filterNot(r => ks(r._1)) ++ contents(rows((i * 100 + 1) to (i * 100 + 20), s"w$i"))
    }
    assert(got == want, "final state must carry every writer's block")
    // every version in the chain validates — no racer corrupted history
    assert(st.validate(9L).filter(col("status") =!= "ok").count() == 0)
  }

  test("mergeAtTip: deleteKeys participate in the conflict check") {
    val base = java.nio.file.Files.createTempDirectory("graft-oc-del").toString
    val st = new ManifestStore(spark, base, "k")
    st.write(rows(1 to 30, "base"), 1L, numFiles = 4)
    val dA = rows(Seq(3), "A")
    val delB = Seq(3L).toDF("k") // B deletes the key A updates
    val (ra, rb) = race(
      () => st.mergeAtTip(dA),
      () => st.mergeAtTip(rows(Seq(25), "B"), deleteKeys = Some(delB)))
    val conflicts = Seq(ra, rb).count {
      case Left(_: ConcurrentWriteConflictException) => true
      case Left(t) => fail(s"unexpected failure: $t")
      case Right(_) => false
    }
    // either the two never raced (both landed: last one saw the other's
    // commit only at CAS time and key 3 overlaps → conflict), or one
    // aborted — what may NOT happen is a silent lost update
    if (conflicts == 0) {
      // both committed without overlap observed only if they serialized
      // BEFORE either read its tip — then key 3's final state is the
      // later commit's, which is a legal serial history
      val vs = st.versions()
      assert(vs == Seq(1L, 2L, 3L))
    } else {
      assert(conflicts == 1, "at most one writer aborts")
      assert(st.versions() == Seq(1L, 2L))
    }
  }
}
