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
  * Each table name resolves to `<root>/<namespace...>/<name>` — either
  * a SnapshotStore base (`v=<n>` version dirs + `_commit_ts` sidecars)
  * or a LINKED ManifestStore base (`_manifests/` + shared `files/`
  * pool), auto-detected; a linked version plans over its
  * manifest-resolved pool file list, so shared files are read in
  * place and the store's zero-copy property carries into SQL.
  * Resolution is METADATA-ONLY (a version listing + KB sidecars);
  * the table Spark plans against is a plain [[ParquetTable]] over the
  * resolved version directory, so the whole native read stack applies
  * unchanged — vectorized decode, filter pushdown, column pruning,
  * partition coalescing. `TIMESTAMP AS OF` arrives in MICROSECONDS
  * (the DSv2 contract); SnapshotStore commit timestamps are millis.
  * Read-only by design: writes go through the store API, whose
  * tmp+rename publish is the atomicity story — a catalog write path
  * would bypass it.
  *
  * One documented divergence: an EVOLVED SnapshotStore version whose
  * `_schema.json` carries a non-null fill policy (`graft.fill`
  * metadata) reads pre-evolution rows as NULL here, where
  * `SnapshotStore.read` applies the fill — SQL sees the files'
  * truth, the store API sees the policy view. Linked (ManifestStore)
  * versions have no fill policy, so their SQL and API reads agree
  * exactly.
  */
class SnapshotCatalog extends TableCatalog with SupportsNamespaces {

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

  /** A linked (manifest-over-shared-pool) lineage carries its versions
    * under `_manifests/`; a snapshot lineage as `v=<n>` data dirs. */
  private def isLinked(ident: Identifier): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"${storePath(ident)}/_manifests")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def linkedFor(ident: Identifier) =
    new graft.operators.ManifestStore(spark, storePath(ident), keyCol = "")

  private def tableFor(ident: Identifier, linked: Boolean, version: Long): Table = {
    val base = storePath(ident)
    // paths: a snapshot version is its data dir; a LINKED version is
    // the manifest-resolved pool file list (shared files read in place
    // — the zero-copy property carries straight into SQL). Schema: the
    // evolved union sidecar when present (old pool files then yield
    // null for columns they predate), else mergeSchema infers across
    // footers.
    val (paths, evolved) =
      if (linked) {
        val st = linkedFor(ident)
        (st.manifest(version).select("file").collect()
          .map(r => s"$base/files/${r.getString(0)}").toSeq,
          st.evolvedSchema(version))
      } else
        (Seq(s"$base/v=$version"), storeFor(ident).evolvedSchema(version))
    val opts = new CaseInsensitiveStringMap(
      java.util.Map.of("path", paths.head, "mergeSchema", "true"))
    ParquetTable(s"$catalogName.${ident.name()}@v$version", spark, opts,
      paths, evolved, classOf[ParquetFileFormat])
  }

  /** One metadata resolution per loadTable: layout sniff + version
    * listing, threaded to every downstream step (each exists/list is
    * a remote round trip on an object store). An absent or empty
    * store maps to the standard NoSuchTableException; genuine storage
    * errors (permissions, corruption, timeouts) PROPAGATE — reporting
    * them as "table not found" would send the operator debugging the
    * wrong problem. */
  private def resolve(ident: Identifier): (Boolean, Seq[Long]) = {
    val linked = isLinked(ident)
    val vs = if (linked) linkedFor(ident).versions() else storeFor(ident).versions()
    if (vs.isEmpty) throw new NoSuchTableException(ident)
    (linked, vs)
  }

  override def loadTable(ident: Identifier): Table = {
    val (linked, vs) = resolve(ident)
    tableFor(ident, linked, vs.max)
  }

  /** `VERSION AS OF <v>` */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"snapshot versions are numeric, got '$version'")
    }
    val (linked, vs) = resolve(ident)
    if (!vs.contains(v)) throw new NoSuchTableException(ident)
    tableFor(ident, linked, v)
  }

  /** `TIMESTAMP AS OF <ts>` — micros in, commit-millis resolved. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val (linked, _) = resolve(ident)
    val ms = Math.floorDiv(timestampMicros, 1000L)
    val resolved =
      if (linked) linkedFor(ident).versionAsOf(ms)
      else storeFor(ident).versionAsOf(ms)
    resolved match {
      case Some(v) => tableFor(ident, linked, v)
      case None => throw new NoSuchTableException(ident)
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    try { resolve(ident); true } catch { case _: NoSuchTableException => false }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = new org.apache.hadoop.fs.Path(
      (namespace.toSeq).mkString(s"$root/", "/", ""))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(base).filter(_.isDirectory).map(_.getPath)
      .filterNot(p => p.getName.startsWith(".") || p.getName.startsWith("_"))
      .filter(isStoreDir) // a namespace dir is not a table
      .map(p => Identifier.of(namespace, p.getName))
  }

  // ---- SupportsNamespaces: a namespace is a directory level of the
  // lake root that is not itself a store (no version layout inside) —
  // SHOW NAMESPACES / USE work; mutation is read-only like tables.

  private def isStoreDir(p: org.apache.hadoop.fs.Path): Boolean = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(p, "_manifests")) ||
      fs.listStatus(p).exists(st =>
        st.isDirectory && st.getPath.getName.startsWith("v="))
  }

  private def dirOf(namespace: Array[String]): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      (namespace.toSeq).foldLeft(root)((a, n) => s"$a/$n"))

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val base = dirOf(namespace)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(base).filter(_.isDirectory).map(_.getPath)
      .filterNot(p => p.getName.startsWith(".") || p.getName.startsWith("_"))
      .filterNot(isStoreDir)
      .map(p => namespace :+ p.getName)
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    if (namespace.isEmpty) true
    else {
      val p = dirOf(namespace)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(p) && fs.getFileStatus(p).isDirectory && !isStoreDir(p)
    }
  }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    java.util.Map.of(SupportsNamespaces.PROP_LOCATION, dirOf(namespace).toString)
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = readOnly("createNamespace")
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = readOnly("alterNamespace")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    readOnly("dropNamespace")

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
