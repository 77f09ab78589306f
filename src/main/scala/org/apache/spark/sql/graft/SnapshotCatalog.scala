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
  *
  * An evolved version's fill policy (`graft.fill` field metadata in
  * its `_schema.json`) PROJECTS into the scan as Spark's own
  * existence-default column metadata (`EXISTS_DEFAULT`): files that
  * predate the column read the recorded default straight out of the
  * parquet reader — still metadata-only, and the SQL read agrees with
  * the store API's fill view (rewritten files materialize fills at
  * write time, so no stored null survives in a filled column).
  *
  * DML: `DELETE FROM <cat>.<store> WHERE <pred>` (and `TRUNCATE
  * TABLE`, which rides the same hook) maps onto the
  * store's own `deleteWhere` via the DSv2 row-level delete hook
  * ([[SupportsDelete]]) — it PUBLISHES A NEW VERSION through the
  * store's tmp+rename discipline (time travel still reads the old
  * one), driving the key-ordered rewrite with the key column the
  * store recorded in `_store.json` at first publish. Version- and
  * timestamp-pinned reads stay immutable (no delete hook), and every
  * other mutation (CREATE/ALTER/DROP/INSERT) remains rejected: those
  * go through the store API, whose publish protocol carries the
  * atomicity contract a catalog write path would bypass.
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

  /** `graft.fill` field metadata → the SQL literal Spark's
    * existence-default machinery evaluates at scan time. CAST keeps
    * the parsed literal exactly the column's type (the default must
    * be constant-foldable; a cast of a literal is). */
  private def fillLiteral(f: org.apache.spark.sql.types.StructField): Option[String] = {
    import org.apache.spark.sql.types._
    if (!f.metadata.contains("graft.fill")) None
    else Some(f.dataType match {
      case StringType =>
        val esc = f.metadata.getString("graft.fill")
          .replace("\\", "\\\\").replace("'", "\\'")
        s"'$esc'"
      case DoubleType | FloatType =>
        s"CAST('${f.metadata.getDouble("graft.fill")}' AS ${f.dataType.sql})"
      case BooleanType => f.metadata.getBoolean("graft.fill").toString
      case dt => s"CAST(${f.metadata.getLong("graft.fill")} AS ${dt.sql})"
    })
  }

  /** Project each recorded fill into Spark's own default-column
    * metadata, so the parquet reader itself yields the fill for files
    * that predate the column — metadata-only, no post-scan project. */
  private def projectFills(sc: StructType): StructType =
    StructType(sc.fields.map { f =>
      fillLiteral(f) match {
        case Some(sql) =>
          f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString("EXISTS_DEFAULT", sql)
            .putString("CURRENT_DEFAULT", sql).build())
        case None => f
      }
    })

  private def tableFor(ident: Identifier, linked: Boolean, version: Long): Table = {
    val base = storePath(ident)
    // paths: a snapshot version is its data dir; a LINKED version is
    // the manifest-resolved pool file list (shared files read in place
    // — the zero-copy property carries straight into SQL). Schema: the
    // evolved union sidecar when present (with fills projected as
    // existence defaults — old pool files then yield the FILL for
    // columns they predate, null absent a policy), else mergeSchema
    // infers across footers.
    val (paths, evolved) =
      if (linked) {
        val st = linkedFor(ident)
        (st.manifest(version).select("file").collect()
          .map(r => s"$base/files/${r.getString(0)}").toSeq,
          st.evolvedSchema(version).map(projectFills))
      } else
        (Seq(s"$base/v=$version"), storeFor(ident).evolvedSchema(version).map(projectFills))
    // a linked version whose manifest lists ZERO pool files (an
    // all-row deleteWhere / mergeDelta) plans an EMPTY scan over the
    // recorded schema — absent that record there is nothing to infer
    // a schema from, and the honest answer is a descriptive error
    if (paths.isEmpty) {
      val sc = evolved.getOrElse(throw new IllegalStateException(
        s"$catalogName.${ident.name()} version $version references no data files " +
          "and records no schema sidecar — cannot plan a scan"))
      val opts = new CaseInsensitiveStringMap(java.util.Map.of("mergeSchema", "true"))
      ParquetTable(s"$catalogName.${ident.name()}@v$version", spark, opts,
        Nil, Some(sc), classOf[ParquetFileFormat])
    } else {
      val opts = new CaseInsensitiveStringMap(
        java.util.Map.of("path", paths.head, "mergeSchema", "true"))
      ParquetTable(s"$catalogName.${ident.name()}@v$version", spark, opts,
        paths, evolved, classOf[ParquetFileFormat])
    }
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

  /** `SELECT * FROM <cat>.<store>.history` — the DESCRIBE-HISTORY
    * surface as an Iceberg-style metadata table: when `<ns>.history`
    * does not resolve as a store itself but `<ns>` does, serve the
    * store's own `history()` frame (version, commit_ts, n_files,
    * n_rows; metadata-only) through a [[LocalScan]]. Tried only as a
    * FALLBACK, so a genuine store named `history` always wins. */
  private def historyFallback(ident: Identifier): Option[Table] = {
    if (ident.name() != "history" || ident.namespace().isEmpty) return None
    val parent = Identifier.of(ident.namespace().dropRight(1), ident.namespace().last)
    try {
      val df =
        if (isLinked(parent)) linkedFor(parent).history()
        else {
          val st = storeFor(parent)
          if (st.versions().isEmpty) return None
          st.history()
        }
      Some(new HistoryTable(
        (parent.namespace() :+ parent.name()).mkString(".") + ".history", df))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  override def loadTable(ident: Identifier): Table = {
    val (linked, vs) = try resolve(ident) catch {
      case e: NoSuchTableException =>
        return historyFallback(ident).getOrElse(throw e)
    }
    val tip = vs.max
    // a DML hook recovers the key column the store recorded at first
    // publish — the metadata that lets SQL drive a key-ordered rewrite
    def storedKey(verb: String): String = {
      val base = storePath(ident)
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.operators.SnapshotStore.readStoredKeyCol(fs, base)
        .getOrElse(throw new UnsupportedOperationException(
          s"$verb needs the store's key column: $base/_store.json is absent " +
            s"(published by a pre-metadata build?) — $verb through the store API"))
    }
    // only the TIP load carries the DML hooks: history is immutable,
    // and a delete/merge appends version tip+1 through the store API
    new SnapshotTable(
      tableFor(ident, linked, tip).asInstanceOf[ParquetTable],
      Some { pred =>
        val key = storedKey("DELETE")
        if (linked)
          new graft.operators.ManifestStore(spark, storePath(ident), key)
            .deleteWhere(tip, tip + 1, pred): Unit
        else
          new SnapshotStore(spark, storePath(ident), key)
            .deleteWhere(tip, tip + 1, pred): Unit
      },
      Some(StoreMergeHook(
        () => storedKey("MERGE"),
        (delta, deleteKeys) => {
          val key = storedKey("MERGE")
          if (linked)
            new graft.operators.ManifestStore(spark, storePath(ident), key)
              .mergeDelta(tip, tip + 1, delta, deleteKeys): Unit
          else
            new SnapshotStore(spark, storePath(ident), key)
              .mergeDelta(tip, tip + 1, delta, deleteKeys): Unit
        },
        () => {
          val key = storedKey("INSERT")
          if (linked)
            new graft.operators.ManifestStore(spark, storePath(ident), key).read(tip)
          else new SnapshotStore(spark, storePath(ident), key).read(tip)
        })))
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
        "whose tmp+rename publish carries the atomicity contract " +
        "(row-level DELETE FROM is the one supported SQL mutation)")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    readOnly("createTable")

  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  /** `ALTER TABLE cat.store ADD COLUMN c <type> [DEFAULT v]` — SQL
    * schema evolution onto the stores' OWN sidecar machinery: an
    * EMPTY wider mergeDelta publishes version tip+1 where no row
    * moves (linked stores carry every file by reference — zero data
    * I/O; snapshot stores copy forward, their layout's contract), the
    * union schema lands in `_schema.json`, and the DEFAULT records as
    * the `graft.fill` every read path (store API and catalog scans
    * via EXISTS_DEFAULT projection) already honors. Only top-level
    * ADD COLUMN translates; anything else keeps the read-only refusal
    * (drops/renames/retypes would rewrite 100 TB or corrupt old
    * files' meaning). History stays immutable: old versions read with
    * their own schema. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (changes.isEmpty || !changes.forall(_.isInstanceOf[TableChange.AddColumn]))
      readOnly("alterTable (only ADD COLUMN is supported)")
    val adds = changes.map(_.asInstanceOf[TableChange.AddColumn])
    adds.foreach { a =>
      if (a.fieldNames().length != 1) throw new UnsupportedOperationException(
        s"ALTER TABLE ADD COLUMN: nested column '${a.fieldNames().mkString(".")}' " +
          "is not supported — stores evolve flat columns")
      if (!a.isNullable && a.defaultValue() == null)
        throw new UnsupportedOperationException(
          s"ALTER TABLE ADD COLUMN: NOT NULL column '${a.fieldNames()(0)}' needs " +
            "a DEFAULT — files that predate the column must read something")
    }
    val (linked, vs) = resolve(ident)
    val tip = vs.max
    val base = storePath(ident)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val key = graft.operators.SnapshotStore.readStoredKeyCol(fs, base)
      .getOrElse(throw new UnsupportedOperationException(
        s"ALTER needs the store's key column: $base/_store.json is absent — " +
          "evolve through the store API's mergeDelta"))
    import org.apache.spark.sql.functions.lit
    val cur =
      if (linked) new graft.operators.ManifestStore(spark, base, key).read(tip)
      else new SnapshotStore(spark, base, key).read(tip)
    var delta = cur.limit(0)
    val fills = scala.collection.mutable.Map.empty[String, Any]
    adds.foreach { a =>
      val colName = a.fieldNames()(0)
      delta = delta.withColumn(colName, lit(null).cast(a.dataType()))
      Option(a.defaultValue()).foreach { dv =>
        import org.apache.spark.sql.types._
        fills(colName) = a.dataType() match {
          case StringType => dv.getValue.value().toString
          case DoubleType | FloatType =>
            dv.getValue.value().asInstanceOf[Number].doubleValue()
          case BooleanType => dv.getValue.value().asInstanceOf[Boolean]
          case _ => dv.getValue.value().asInstanceOf[Number].longValue()
        }
      }
    }
    if (linked)
      new graft.operators.ManifestStore(spark, base, key)
        .mergeDelta(tip, tip + 1, delta, fill = fills.toMap): Unit
    else new SnapshotStore(spark, base, key)
      .mergeDelta(tip, tip + 1, delta, fill = fills.toMap): Unit
    loadTable(ident)
  }
  override def dropTable(ident: Identifier): Boolean = readOnly("dropTable")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("renameTable")
}

/** Metadata table serving a small eagerly-computed frame (the
  * `<store>.history` surface) through Spark's own [[LocalScan]] —
  * plans as a LocalTableScan, no files, no partitions. The frame is
  * |versions|-sized by construction. */
private[graft] class HistoryTable(tableName: String,
    df: org.apache.spark.sql.DataFrame) extends Table with SupportsRead {
  private val collected: Array[org.apache.spark.sql.catalyst.InternalRow] = {
    val rows = df.queryExecution.executedPlan.executeCollect()
    rows.map(_.copy())
  }
  override def name(): String = tableName
  override def schema(): StructType = df.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    new org.apache.spark.sql.connector.read.ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.LocalScan {
          override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] = collected
          override def readSchema(): StructType = df.schema
          override def description(): String = tableName
        }
    }
}

/** The DML contract [[GraftMergeStrategy]] and the INSERT write path
  * execute against: the store's recorded key column (resolved lazily —
  * one sidecar read), a runner that lands (delta, deleteKeys) as a new
  * tip version through the store's own `mergeDelta`, and a tip reader
  * (INSERT's key-collision check + OVERWRITE's delete set). */
private[graft] case class StoreMergeHook(
    keyCol: () => String,
    run: (org.apache.spark.sql.DataFrame,
      Option[org.apache.spark.sql.DataFrame]) => Unit,
    tip: () => org.apache.spark.sql.DataFrame)

/** The table SnapshotCatalog serves: reads delegate verbatim to the
  * resolved [[ParquetTable]] (full native scan stack), and — on tip
  * loads only — DSv2 row-level DELETE translates the pushed filters
  * to a store predicate and runs the store's own `deleteWhere`
  * (publishing a new version; history stays readable). A filter the
  * translator can't express makes `canDeleteWhere` answer false, so
  * Spark raises the standard "cannot delete" analysis error instead
  * of a silent partial delete. `MERGE INTO` rides [[StoreMergeHook]]
  * via [[GraftMergeStrategy]] (registered by [[GraftExtensions]]). */
private[graft] class SnapshotTable(delegate: ParquetTable,
    onDelete: Option[org.apache.spark.sql.Column => Unit],
    val onMerge: Option[StoreMergeHook] = None)
    extends Table with SupportsRead with SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  import org.apache.spark.sql.sources._

  override def name(): String = delegate.name
  override def schema(): StructType = delegate.schema
  override def partitioning(): Array[Transform] = delegate.partitioning
  override def properties(): util.Map[String, String] = delegate.properties
  override def capabilities(): util.Set[TableCapability] = {
    // tip loads advertise the V1 write fallback so SQL INSERT
    // [OVERWRITE] resolves; pinned loads stay read-only (no hook →
    // no capability → Spark's standard "does not support" error)
    val caps = new util.HashSet[TableCapability](delegate.capabilities())
    if (onMerge.isDefined) caps.add(TableCapability.V1_BATCH_WRITE)
    if (onMerge.isDefined) caps.add(TableCapability.TRUNCATE)
    caps
  }
  override def columns(): Array[Column] = delegate.columns()
  override def newScanBuilder(options: CaseInsensitiveStringMap) =
    delegate.newScanBuilder(options)

  /** SQL `INSERT INTO` / `INSERT OVERWRITE` land through the store's
    * own `mergeDelta` via Spark's V1 write fallback (one plain
    * DataFrame handoff — the row set is the query result; no
    * per-partition commit protocol needed for a store whose publish is
    * already tmp+rename atomic). INSERT INTO is append-only SQL: the
    * store's key is a unique identity, so a key collision — with
    * existing rows or inside the batch — would silently REPLACE where
    * SQL would duplicate; both refuse loudly. INSERT OVERWRITE is the
    * full replacement: the delta plus a delete set of every surviving
    * old key publishes ONE new version (history immutable). */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var overwrite = false
      override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
        overwrite = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame,
                  overwriteFlag: Boolean): Unit =
                runInsert(data, overwrite || overwriteFlag)
            }
        }
    }

  private def runInsert(data: org.apache.spark.sql.DataFrame,
      overwrite: Boolean): Unit = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val hook = onMerge.getOrElse(throw new UnsupportedOperationException(
      "INSERT is only supported on the table tip — a version- or " +
        "timestamp-pinned read is immutable history"))
    val key = hook.keyCol()
    // an INSERT batch with duplicate keys would make the store's
    // key-upsert keep ONE row where SQL keeps both — refuse
    val batchDup = data.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).limit(1).count() > 0
    if (batchDup) throw new UnsupportedOperationException(
      s"INSERT through SnapshotCatalog: the batch carries duplicate '$key' " +
        "values — the store's key is a unique identity, so duplicates would " +
        "collapse where SQL semantics would keep both rows")
    if (overwrite) {
      // full replacement in ONE published version: new rows upsert,
      // surviving old keys (not re-inserted) delete
      val oldKeys = hook.tip().select(col(key))
        .join(data.select(col(key)), Seq(key), "left_anti")
      hook.run(data, Some(oldKeys))
    } else {
      val collides = data.select(col(key))
        .join(hook.tip().select(col(key)), Seq(key), "left_semi")
        .limit(1).count() > 0
      if (collides) throw new UnsupportedOperationException(
        s"INSERT through SnapshotCatalog: a '$key' value already exists in " +
          "the table — the store's key is a unique identity, so this INSERT " +
          "would silently replace a row SQL semantics would duplicate; use " +
          "MERGE INTO (upsert) or UPDATE instead")
      hook.run(data, None)
    }
  }

  private def toColumn(f: Filter): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit}
    f match {
      case EqualTo(a, v) => col(a) === lit(v)
      case EqualNullSafe(a, v) => col(a) <=> lit(v)
      case GreaterThan(a, v) => col(a) > lit(v)
      case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
      case LessThan(a, v) => col(a) < lit(v)
      case LessThanOrEqual(a, v) => col(a) <= lit(v)
      case In(a, vs) => col(a).isin(vs.toIndexedSeq: _*)
      case IsNull(a) => col(a).isNull
      case IsNotNull(a) => col(a).isNotNull
      case And(l, r) => toColumn(l) && toColumn(r)
      case Or(l, r) => toColumn(l) || toColumn(r)
      case Not(c) => !toColumn(c)
      case StringStartsWith(a, v) => col(a).startsWith(v)
      case StringEndsWith(a, v) => col(a).endsWith(v)
      case StringContains(a, v) => col(a).contains(v)
      case _: AlwaysTrue => lit(true)
      case _: AlwaysFalse => lit(false)
      case other => throw new UnsupportedOperationException(
        s"DELETE predicate not translatable: $other")
    }
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    onDelete.isDefined &&
      scala.util.Try(filters.foreach(toColumn)).isSuccess

  override def deleteWhere(filters: Array[Filter]): Unit = {
    import org.apache.spark.sql.functions.lit
    val deleter = onDelete.getOrElse(throw new UnsupportedOperationException(
      "DELETE is only supported on the table tip — a version- or " +
        "timestamp-pinned read is immutable history"))
    deleter(filters.map(toColumn).reduceOption(_ && _).getOrElse(lit(true)))
  }
}
