package org.apache.spark.sql.graft

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.SnapshotStore

/** SQL time travel over [[graft.operators.SnapshotStore]] lineages —
  * the `VERSION AS OF` / `TIMESTAMP AS OF` surface a lake engine
  * exposes (the Delta/Iceberg UX), wired through Spark's OWN DataSource
  * V2 time-travel hooks instead of a bespoke reader:
  *
  * {{{
  *   spark.sql.catalog.snap       = org.apache.spark.sql.graft.SnapshotCatalog
  *   spark.sql.catalog.snap.root  = /lake/snapshots
  *
  *   SELECT * FROM snap.orders                                -- latest version
  *   SELECT * FROM snap.orders VERSION AS OF 42               -- explicit version
  *   SELECT * FROM snap.orders TIMESTAMP AS OF '2026-08-01'   -- commit-ts resolve
  * }}}
  *
  * Each table name resolves to `<root>/<namespace...>/<name>`, a
  * SnapshotStore base (`v=<n>` version dirs + `_commit_ts` sidecars).
  * Resolution is METADATA-ONLY (a version listing + KB sidecars);
  * the table Spark plans against is a plain [[ParquetTable]] over the
  * resolved version directory, so the whole native read stack applies
  * unchanged — vectorized decode, filter pushdown, column pruning,
  * partition coalescing. `TIMESTAMP AS OF` arrives in MICROSECONDS
  * (the DSv2 contract); SnapshotStore commit timestamps are millis.
  * Read-only by design: writes go through the store API, whose
  * tmp+rename publish is the atomicity story — a catalog write path
  * would bypass it.
  */
class SnapshotCatalog extends TableCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"SnapshotCatalog '$name' requires spark.sql.catalog.$name.root=<lake root>"))
  }

  override def name(): String = catalogName

  private def spark = SparkSession.active

  private def storePath(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(s"$root/", "/", "")

  // keyCol is irrelevant to the read-side metadata calls used here
  private def storeFor(ident: Identifier) =
    new SnapshotStore(spark, storePath(ident), keyCol = "")

  private def tableFor(ident: Identifier, version: Long): Table = {
    val path = s"${storePath(ident)}/v=$version"
    // mergeSchema: a CoW-evolved version may carry pre-evolution files
    // whose footers lack the added columns — the union schema is the
    // version's true schema
    val opts = new CaseInsensitiveStringMap(
      java.util.Map.of("path", path, "mergeSchema", "true"))
    ParquetTable(s"$catalogName.${ident.name()}@v$version", spark, opts,
      Seq(path), None, classOf[ParquetFileFormat])
  }

  private def versionsOf(ident: Identifier): Seq[Long] = {
    val vs = try storeFor(ident).versions() catch { case _: Exception => Seq.empty[Long] }
    if (vs.isEmpty) throw new NoSuchTableException(ident)
    vs
  }

  override def loadTable(ident: Identifier): Table =
    tableFor(ident, versionsOf(ident).max)

  /** `VERSION AS OF <v>` */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"snapshot versions are numeric, got '$version'")
    }
    if (!versionsOf(ident).contains(v)) throw new NoSuchTableException(ident)
    tableFor(ident, v)
  }

  /** `TIMESTAMP AS OF <ts>` — micros in, commit-millis resolved. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    versionsOf(ident) // existence gate with the standard error
    storeFor(ident).versionAsOf(Math.floorDiv(timestampMicros, 1000L)) match {
      case Some(v) => tableFor(ident, v)
      case None => throw new NoSuchTableException(ident)
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    try { versionsOf(ident); true } catch { case _: NoSuchTableException => false }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = new org.apache.hadoop.fs.Path(
      (namespace.toSeq).mkString(s"$root/", "/", ""))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(base).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(n => n.startsWith(".") || n.startsWith("_"))
      .map(Identifier.of(namespace, _))
  }

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"SnapshotCatalog is read-only ($op): write through the SnapshotStore API, " +
        "whose tmp+rename publish carries the atomicity contract")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    readOnly("createTable")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("alterTable")
  override def dropTable(ident: Identifier): Boolean = readOnly("dropTable")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("renameTable")
}
