package graft

import graft.operators.{ManifestStore, SnapshotStore}

/** The VERSION-LOG CHECKPOINT: one `_history.json` sidecar serves
  * history / TIMESTAMP-AS-OF / commitBytes with O(1) file opens on a
  * several-hundred-version chain, maintained incrementally at publish
  * and provably equal to the rebuilt-from-listing truth. */
class VersionCheckpointSpec extends SparkSpec {
  import spark.implicits._

  /** The O(1)-opens device: move EVERY per-version `_commit_ts`
    * sidecar aside. A resolution that still opened them would fall
    * back to `_SUCCESS` mtimes (≈ now, far past the backdated chain)
    * and answer WRONGLY — so a correct answer proves the checkpoint
    * (one file) served it. */
  private def hideSidecars(base: String, name: String): Seq[java.io.File] = {
    val dirs = new java.io.File(base).listFiles()
      .filter(_.getName.startsWith("v="))
    dirs.flatMap { d =>
      val f = new java.io.File(d, name)
      if (f.exists()) {
        val bak = new java.io.File(d, name + ".bak")
        assert(f.renameTo(bak)); Some(bak)
      } else None
    }.toSeq
  }

  private def restoreSidecars(hidden: Seq[java.io.File]): Unit =
    hidden.foreach(b => assert(
      b.renameTo(new java.io.File(b.getParent, b.getName.stripSuffix(".bak")))))

  test("snapshot: 300-version chain — TIMESTAMP AS OF opens O(1) files; rebuild parity") {
    val base = java.nio.file.Files.createTempDirectory("graft_vck_sn").toString + "/t"
    val st = new SnapshotStore(spark, base, "k")
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    (1 to 300).foreach(v => st.write(df, v, commitTs = Some(1000L * v)))
    // publish maintained the checkpoint incrementally: present, and
    // complete without any heal
    assert(new java.io.File(base, "_history.json").exists())
    val served = st.history().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val spot = served.find(_._1 == 150L).get
    assert(served.size == 300 && spot._2 == 150000L && spot._4 == 2L, spot)
    // O(1)-opens proof: with every _commit_ts hidden, resolution must
    // still answer from the single checkpoint file
    val hidden = hideSidecars(base, "_commit_ts")
    assert(hidden.size == 300)
    assert(st.versionAsOf(150000L) == Some(150L))
    assert(st.versionAsOf(150999L) == Some(150L))
    assert(st.versionAsOf(999L).isEmpty)
    assert(st.readAsOfResolved(250000L)._1 == 250L)
    assert(st.commitBytes(37L) == st.commitBytes(38L)) // identical commits, from ckpt
    restoreSidecars(hidden)
    // FALLBACK-TO-LISTING PARITY: delete the checkpoint — the rebuild
    // from dirs must reproduce the served answers bit-for-bit and
    // re-materialize the checkpoint
    assert(new java.io.File(base, "_history.json").delete())
    assert(st.versionAsOf(150000L) == Some(150L))
    val rebuilt = st.history().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rebuilt == served, "rebuilt history diverged from the checkpoint")
    assert(new java.io.File(base, "_history.json").exists(), "heal did not rewrite")
  }

  test("linked: checkpoint serves history/as-of/commitBytes; heals after loss; prune invalidates") {
    val base = java.nio.file.Files.createTempDirectory("graft_vck_lk").toString + "/t"
    val st = new ManifestStore(spark, base, "k")
    st.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), 1L, 1, commitTs = Some(1000L))
    (2 to 40).foreach(v => st.mergeDelta(v - 1L, v.toLong,
      Seq((v.toLong, s"v$v")).toDF("k", "v"), commitTs = Some(1000L * v)): Unit)
    val served = st.history().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(served.size == 40)
    val bytesServed = (1L to 40L).map(st.commitBytes)
    // hide the per-version _commit_ts files inside _manifests/v=*
    val dirs = new java.io.File(s"$base/_manifests").listFiles()
      .filter(_.getName.startsWith("v="))
    val hidden = dirs.flatMap { d =>
      val f = new java.io.File(d, "_commit_ts")
      val bak = new java.io.File(d, "_commit_ts.bak")
      if (f.exists()) { assert(f.renameTo(bak)); Some(bak) } else None
    }.toSeq
    assert(hidden.size == 40)
    assert(st.versionAsOf(20000L) == Some(20L))
    assert(st.readAsOf(20000L).count() == 20L) // v20 holds keys 1,2 + 3..20
    hidden.foreach(b => assert(
      b.renameTo(new java.io.File(b.getParent, "_commit_ts"))))
    // parity after checkpoint loss
    assert(new java.io.File(base, "_history.json").delete())
    assert(st.history().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet == served)
    assert((1L to 40L).map(st.commitBytes) == bytesServed)
    // prune: dropped versions leave the checkpoint; the first
    // survivor's bytes recompute as counting WHOLE
    st.prune(keep = (21L to 40L)): Unit
    val after = st.history().collect().map(_.getLong(0)).toSet
    assert(after == (21L to 40L).toSet)
    assert(st.commitBytes(21L) > bytesServed(20),
      "first surviving commit must now count whole")
  }
}
