package graft.operators

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table CONSISTENT snapshots — the lake-level savepoint a
  * whole-schema backup needs: restoring `orders` from Tuesday and
  * `lineitem` from Wednesday silently breaks referential integrity,
  * so the unit of backup must be the TABLE GROUP, not the table.
  *
  * Layout: `basePath/<table>/v=N/` per table plus a
  * `basePath/_commits/N` marker written LAST. `versions()` lists only
  * marker'd versions, so a crash after some tables published leaves
  * an invisible partial version (same guarantee [[SnapshotStore]]
  * gives one table, lifted to the group); a retry simply overwrites
  * the partial dirs. Readers always see a closed, mutually-consistent
  * set of tables.
  *
  * Each table write goes through the same atomic tmp-dir-rename as
  * [[SnapshotStore.write]]; per-table version dirs stay plain parquet
  * so every single-table operator (diff, manifest, validateCopy,
  * zone-mapped reads via a per-table store) composes unchanged. */
class LakeSnapshot(spark: SparkSession, basePath: String) {

  private def fs =
    new Path(basePath).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableDir(table: String, version: Long) = s"$basePath/$table/v=$version"
  private def marker(version: Long) = new Path(s"$basePath/_commits/$version")

  /** Publish one consistent version of the whole table group. The
    * commit marker goes down only after EVERY table landed, and goes
    * down ATOMICALLY (tmp + rename): a direct create/write/close could
    * crash mid-write and leave a visible truncated marker, making
    * `versions()` report the group committed while `tablesOf()` /
    * `restoreAll()` throw — the inverse of this class's guarantee. A
    * crash now leaves only a dot-prefixed tmp file, which `versions()`
    * never lists. */
  def write(tables: Map[String, DataFrame], version: Long): Unit = {
    require(tables.nonEmpty, "empty table group")
    // ',' is the marker's table-name separator; a name containing it
    // would silently corrupt the encoding
    require(tables.keys.forall(n => n.nonEmpty && !n.contains(",")),
      s"table names must be non-empty and ','-free: ${tables.keys.mkString("[", ", ", "]")}")
    tables.foreach { case (name, df) =>
      val tmp = new Path(s"$basePath/$name/.tmp-v=$version-${java.util.UUID.randomUUID()}")
      df.write.mode("overwrite").parquet(tmp.toString)
      val dest = new Path(tableDir(name, version))
      if (fs.exists(dest)) fs.delete(dest, true)
      if (!fs.rename(tmp, dest))
        throw new java.io.IOException(s"lake snapshot publish failed: $tmp -> $dest")
    }
    fs.mkdirs(marker(version).getParent)
    val tmp = new Path(s"$basePath/_commits/.tmp-$version-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.writeUTF(tables.keys.toSeq.sorted.mkString(",")) finally out.close()
    if (fs.exists(marker(version))) fs.delete(marker(version), false)
    if (!fs.rename(tmp, marker(version)))
      throw new java.io.IOException(s"lake snapshot commit failed: $tmp -> ${marker(version)}")
  }

  /** Committed group versions only (marker present). Only all-digit
    * names count — crash-leftover `.tmp-` markers and stray files must
    * never surface as versions (or crash the listing via `.toLong`). */
  def versions(): Seq[Long] = {
    val dir = new Path(s"$basePath/_commits")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.forall(_.isDigit))
      .map(_.toLong).sorted
  }

  /** The tables recorded in a committed version's marker. */
  def tablesOf(version: Long): Seq[String] = {
    val in = fs.open(marker(version))
    try in.readUTF().split(",").toSeq finally in.close()
  }

  def read(table: String, version: Long): DataFrame = {
    require(versions().contains(version), s"version $version is not committed")
    spark.read.parquet(tableDir(table, version))
  }

  /** Restore the WHOLE group at one version — the only restore shape
    * that cannot mix table states. */
  def restoreAll(version: Long): Map[String, DataFrame] =
    tablesOf(version).map(t => t -> read(t, version)).toMap

  /** Post-restore referential-integrity check across the group:
    * [[DataQuality.orphans]] over relationships named as
    * (label, childTable, fkCol, parentTable, pkCol). */
  def validate(version: Long,
      rels: Seq[(String, String, String, String, String)]): DataFrame = {
    val ts = restoreAll(version)
    DataQuality.orphans(rels.map { case (label, child, fk, parent, pk) =>
      (label, ts(child), fk, ts(parent), pk)
    })
  }
}
