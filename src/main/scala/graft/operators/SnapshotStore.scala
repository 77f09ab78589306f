package graft.operators

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Fx

/** Versioned snapshot store — the reference's snapshot/backup workflow
  * end-to-end (SURVEY §2 group 2): write full snapshots, list
  * versions, read/restore any version, classify row-level changes
  * between versions (CDC), and prune old versions under a retention
  * policy.
  *
  * Layout: `basePath/v=<version>/part-*.parquet`. Each version is an
  * immutable full snapshot; `diff` derives incrementals on demand, so
  * restore is always a single-version read (no log replay). At 100 TB
  * per snapshot, `diff` is one equi-join shuffle on the business key;
  * `changeType` comparison rides on 8-byte xxhash64 fingerprints, not
  * row-by-row column compares.
  */
object SnapshotStore {
  /** One column-level change between two snapshot versions. */
  case class SchemaChange(column: String, change: String,
      fromType: Option[String], toType: Option[String])

  /** A union-schema field for an evolution-introduced column, with its
    * fill default (when given) recorded as `graft.fill` field metadata
    * — shared by both store layouts' mergeDelta. */
  private[graft] def fieldWithFill(f: org.apache.spark.sql.types.StructField,
      fill: Option[Any]): org.apache.spark.sql.types.StructField = {
    val md = fill.map { v =>
      val b = new org.apache.spark.sql.types.MetadataBuilder()
      v match {
        case s: String => b.putString("graft.fill", s)
        case d: Double => b.putDouble("graft.fill", d)
        case fl: Float => b.putDouble("graft.fill", fl.toDouble)
        case bo: Boolean => b.putBoolean("graft.fill", bo)
        case n: Number => b.putLong("graft.fill", n.longValue())
        case other => throw new IllegalArgumentException(
          s"unsupported fill value for '${f.name}': $other")
      }
      b.build()
    }.getOrElse(org.apache.spark.sql.types.Metadata.empty)
    org.apache.spark.sql.types.StructField(f.name, f.dataType,
      nullable = true, metadata = md)
  }

  /** The fill defaults an evolved schema records, typed for
    * `na.fill` — shared by both layouts' read paths. */
  private[graft] def fillValues(
      sc: org.apache.spark.sql.types.StructType): Map[String, Any] = {
    import org.apache.spark.sql.types._
    sc.fields.iterator.flatMap { f =>
      if (!f.metadata.contains("graft.fill")) Iterator.empty
      else Iterator.single(f.name -> (f.dataType match {
        case StringType => f.metadata.getString("graft.fill"): Any
        case DoubleType | FloatType => f.metadata.getDouble("graft.fill")
        case BooleanType => f.metadata.getBoolean("graft.fill")
        case _ => f.metadata.getLong("graft.fill")
      }))
    }.toMap
  }

  // ---- COLUMN MAPPING (metadata-only RENAME COLUMN) ----
  // Delta's column-mapping idea on the existing `_schema.json`
  // sidecar: each field may carry `graft.physical` metadata naming the
  // column as STORED in the parquet files. A rename is then one
  // metadata commit — the logical name changes, the physical name
  // pins to whatever the bytes already answer to — and every read
  // resolves physical → logical with a zero-cost alias projection.
  // New files land under PHYSICAL names so a version's file set stays
  // name-uniform; a full rewrite (compact, plain write) materializes
  // logical names and drops the mapping — folding it exactly like a
  // DV mask folds.

  /** The field's PHYSICAL (stored) name: `graft.physical` when a
    * metadata-only rename mapped it, else the logical name. */
  private[graft] def physicalName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains("graft.physical")) f.metadata.getString("graft.physical")
    else f.name

  /** The schema under PHYSICAL names — what `spark.read.schema` must
    * be handed so parquet's by-name resolution finds the bytes. */
  private[graft] def physicalSchema(
      sc: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(sc.fields.map(f => f.copy(name = physicalName(f))))

  /** Whether any field carries a logical→physical rename mapping —
    * public for the SQL catalog (package org.apache.spark.sql.graft),
    * which must route mapped versions through the store's own read. */
  def hasMapping(sc: org.apache.spark.sql.types.StructType): Boolean =
    sc.fields.exists(f => physicalName(f) != f.name)

  /** Physical-named frame → logical names (alias projection only). */
  private[graft] def toLogical(df: org.apache.spark.sql.DataFrame,
      sc: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    sc.fields.foldLeft(df)((d, f) =>
      if (physicalName(f) != f.name) d.withColumnRenamed(physicalName(f), f.name) else d)

  /** Logical-named frame → physical names, for LANDING new files on a
    * mapped store (keeps the file set name-uniform). */
  private[graft] def toPhysical(df: org.apache.spark.sql.DataFrame,
      sc: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    sc.fields.foldLeft(df)((d, f) =>
      if (physicalName(f) != f.name) d.withColumnRenamed(f.name, physicalName(f)) else d)

  /** Stored name of logical `column` under `sc` (identity without a
    * mapping) — the stats/zone-map/bloom lookup translation. */
  private[graft] def physicalOf(sc: Option[org.apache.spark.sql.types.StructType],
      column: String): String =
    sc.flatMap(_.fields.find(_.name == column)).map(physicalName).getOrElse(column)

  /** Field with the logical name `to` whose physical name pins to the
    * stored bytes: a renamed-once field keeps its ORIGINAL physical
    * name through later renames. */
  private[graft] def renamedField(f: org.apache.spark.sql.types.StructField,
      to: String): org.apache.spark.sql.types.StructField = {
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(f.metadata).putString("graft.physical", physicalName(f)).build()
    f.copy(name = to, metadata = md)
  }

  // ---- TEMPORAL PARTITION TRANSFORMS ----
  // `PARTITIONED BY days(ts)` / `months(ts)` — Iceberg's hidden
  // partitioning re-expressed on this layout's one-tuple-per-file
  // invariant: the sidecar records the TRANSFORM spec, every landing
  // derives an identity column (`ts__day` / `ts__month`, a DATE) the
  // existing machinery clusters, stats, prunes and drops on; the SQL
  // catalog hides the derived column from SELECT *.

  /** One PARTITIONED BY entry: `raw` as recorded in `_partition.json`,
    * the `source` data column, the landed identity column `name`, and
    * the transform kind (None = plain identity column). */
  case class PartSpec(raw: String, source: String, name: String,
      transform: Option[String])

  private val TransformRe = "^(days|months|years|hours)\\(([^()]+)\\)$".r

  def parsePartitionSpec(raw: String): PartSpec = raw.trim match {
    case TransformRe(kind, c) =>
      val suffix = kind match {
        case "days" => "__day"
        case "months" => "__month"
        case "years" => "__year"
        case _ => "__hour"
      }
      PartSpec(raw.trim, c.trim, c.trim + suffix, Some(kind))
    case plain => PartSpec(plain, plain, plain, None)
  }

  /** The derived identity value for a transform spec — a DATE (day /
    * first-of-month / first-of-year) or hour-truncated TIMESTAMP,
    * exact under min==max per-file stats. */
  def deriveColumn(sp: PartSpec): org.apache.spark.sql.Column = sp.transform match {
    case Some("days") => org.apache.spark.sql.functions.to_date(
      org.apache.spark.sql.functions.col(sp.source))
    case Some("months") => org.apache.spark.sql.functions.trunc(
      org.apache.spark.sql.functions.col(sp.source), "month")
    case Some("years") => org.apache.spark.sql.functions.trunc(
      org.apache.spark.sql.functions.col(sp.source), "year")
    case Some("hours") => org.apache.spark.sql.functions.date_trunc("hour",
      org.apache.spark.sql.functions.col(sp.source))
    case other => throw new IllegalArgumentException(s"not a transform: $other")
  }

  /** Materialize every derived partition column on a landing frame.
    * ALWAYS recomputed from the source (a pure function of it):
    * schema-alignment steps may have introduced the column as null,
    * and a stale or null derived value landing would silently break
    * the one-tuple-per-file pruning contract. No-op for identity
    * specs. */
  def derivePartitionCols(df: org.apache.spark.sql.DataFrame,
      specs: Seq[PartSpec]): org.apache.spark.sql.DataFrame =
    specs.filter(_.transform.isDefined).foldLeft(df)((d, sp) =>
      d.withColumn(sp.name, deriveColumn(sp)))

  // ---- TYPE WIDENING ----

  /** Legal METADATA-ONLY type widenings — Delta's type-widening idea:
    * parquet's vectorized reader decodes the stored narrow physical
    * type into the wider logical one (spec-verified on this Spark), so
    * publishing a sidecar with the wider type re-types every read with
    * ZERO rewrites. The integral chain, float→double, and
    * integral→decimal with enough precision to hold every value. */
  def canWiden(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (ByteType | ShortType | IntegerType, d: DecimalType) =>
        d.scale == 0 && d.precision >= 10
      case (LongType, d: DecimalType) => d.scale == 0 && d.precision >= 20
      case _ => false
    }
  }

  // ---- VERSION-LOG CHECKPOINT ----
  // One consolidated `_history.json` sidecar at the store base holding
  // (version, commit_ts, n_files, n_rows, bytes_added) per retained
  // version — maintained incrementally at publish, SELF-HEALING on
  // read. It is a CACHE of derived truth (every entry is rebuildable
  // from the version dirs/manifests), so a missed update — crash
  // between publish and checkpoint write, concurrent publisher losing
  // the checkpoint race, an external/older writer — costs one rebuild
  // of the missing entries, never a wrong answer. history(),
  // versionAsOf/readAsOf, commitBytes and the change feed's
  // timestamp/byte resolution all serve from it: O(1) file opens on a
  // warm checkpoint instead of O(versions) per-version sidecar reads.

  private[operators] case class HistoryEntry(
      commitTs: Long, nFiles: Long, nRows: Long, bytes: Long,
      op: String = "unknown", opParams: String = "",
      metrics: Map[String, Long] = Map.empty)

  /** Canonical (sorted-key) JSON object for a metrics map — metric
    * names are fixed identifiers, values are counts. */
  private def metricsJson(m: Map[String, Long]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s""""${jesc(k)}": $v""" }
      .mkString("{", ", ", "}")

  private def parseMetrics(body: String): Map[String, Long] =
    "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*(-?\\d+)".r.findAllMatchIn(body)
      .map(m => junesc(m.group(1)) -> m.group(2).toLong).toMap


  /** Minimal JSON string escape/unescape for the checkpoint's
    * operation fields (verbs are fixed identifiers; params may carry
    * predicate SQL with quotes/backslashes). */
  private def jesc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
  private def junesc(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => b += '"'; i += 2
          case '\\' => b += '\\'; i += 2
          case 'n' => b += '\n'; i += 2
          case 'r' => b += '\r'; i += 2
          case 't' => b += '\t'; i += 2
          case 'u' if i + 5 < s.length + 1 && i + 6 <= s.length =>
            b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case o => b += o; i += 2
        }
      } else { b += c; i += 1 }
    }
    b.toString
  }

  private[operators] def readHistoryCkpt(fs: org.apache.hadoop.fs.FileSystem,
      basePath: String): Map[Long, HistoryEntry] = {
    val p = new org.apache.hadoop.fs.Path(basePath, "_history.json")
    try {
      if (!fs.exists(p)) Map.empty
      else {
        val in = fs.open(p)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        // op/params/metrics are OPTIONAL so a pre-upgrade checkpoint
        // still parses — its entries report operation "unknown" and
        // empty metrics honestly
        ("\\{\\s*\"v\"\\s*:\\s*(-?\\d+)\\s*,\\s*\"ts\"\\s*:\\s*(-?\\d+)\\s*,\\s*" +
          "\"f\"\\s*:\\s*(-?\\d+)\\s*,\\s*\"r\"\\s*:\\s*(-?\\d+)\\s*,\\s*" +
          "\"b\"\\s*:\\s*(-?\\d+)" +
          "(?:\\s*,\\s*\"op\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"" +
          "\\s*,\\s*\"p\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\")?" +
          "(?:\\s*,\\s*\"m\"\\s*:\\s*\\{([^}]*)\\})?\\s*\\}").r
          .findAllMatchIn(txt).map(m => m.group(1).toLong -> HistoryEntry(
            m.group(2).toLong, m.group(3).toLong, m.group(4).toLong,
            m.group(5).toLong,
            Option(m.group(6)).map(junesc).getOrElse("unknown"),
            Option(m.group(7)).map(junesc).getOrElse(""),
            Option(m.group(8)).map(parseMetrics).getOrElse(Map.empty))).toMap
      }
    } catch { case scala.util.control.NonFatal(_) => Map.empty } // derived: rebuild
  }

  /** Per-version OPERATION sidecar (`_op.json` inside the version /
    * manifest dir): the commit's verb + parameters, written into the
    * tmp dir BEFORE publish so it lands atomically with the version.
    * The checkpoint caches it; the self-heal rebuild re-reads it, so
    * "what did commit 37 DO" survives checkpoint invalidation.
    * Absent (pre-upgrade commits) → ("unknown", ""). */
  private[operators] def writeOpSidecar(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, op: String, params: String,
      metrics: Map[String, Long] = Map.empty): Unit =
    try {
      val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_op.json"), true)
      // metrics — Delta's operationMetrics: the row/file counts the
      // verb ALREADY materialized while executing (numInsertedRows,
      // numUpdatedRows, numDeletedRows, numAddedFiles,
      // numRemovedFiles), recorded, never recomputed from history
      try out.write(
        (s"""{"op": "${jesc(op)}", "params": "${jesc(params)}"""" +
          s""", "metrics": ${metricsJson(metrics)}}""").getBytes("UTF-8"))
      finally out.close()
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Render a predicate for the operation-parameters stamp —
    * best-effort, bounded (an audit label, not a replayable plan). */
  private[operators] def predSql(c: org.apache.spark.sql.Column): String =
    c.toString.take(200)

  private[operators] def readOpSidecar(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): (String, String, Map[String, Long]) =
    try {
      val p = new org.apache.hadoop.fs.Path(dir, "_op.json")
      if (!fs.exists(p)) ("unknown", "", Map.empty)
      else {
        val in = fs.open(p)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        // metrics object optional: pre-metrics sidecars still parse
        ("\\{\\s*\"op\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"\\s*,\\s*" +
          "\"params\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"" +
          "(?:\\s*,\\s*\"metrics\"\\s*:\\s*\\{([^}]*)\\})?\\s*\\}").r
          .findFirstMatchIn(txt)
          .map(m => (junesc(m.group(1)), junesc(m.group(2)),
            Option(m.group(3)).map(parseMetrics).getOrElse(Map.empty[String, Long])))
          .getOrElse(("unknown", "", Map.empty))
      }
    } catch { case scala.util.control.NonFatal(_) => ("unknown", "", Map.empty) }

  /** Best-effort atomic rewrite (tmp + rename): a crash or a lost
    * concurrent-rename race leaves a stale/absent checkpoint, which
    * the self-heal path rebuilds — never corrupt answers. */
  private[operators] def writeHistoryCkpt(fs: org.apache.hadoop.fs.FileSystem,
      basePath: String, entries: Map[Long, HistoryEntry]): Unit =
    try {
      val body = entries.toSeq.sortBy(_._1).map { case (v, e) =>
        s"""{"v": $v, "ts": ${e.commitTs}, "f": ${e.nFiles}, "r": ${e.nRows}, """ +
          s""""b": ${e.bytes}, "op": "${jesc(e.op)}", "p": "${jesc(e.opParams)}", """ +
          s""""m": ${metricsJson(e.metrics)}}"""
      }.mkString("{\"history\": [", ", ", "]}")
      val tmp = new org.apache.hadoop.fs.Path(basePath,
        s".tmp-hist-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      val dest = new org.apache.hadoop.fs.Path(basePath, "_history.json")
      fs.delete(dest, false): Unit
      if (!fs.rename(tmp, dest)) fs.delete(tmp, false): Unit
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Parse the `_store.json` sidecar's keyCol — shared by both store
    * layouts and the SQL catalog (which lives under Spark's package
    * root, hence public; a minimal fixed-shape parse — the sidecar is
    * written by this library only). */
  def readStoredKeyCol(fs: org.apache.hadoop.fs.FileSystem,
      basePath: String): Option[String] = readStoredField(fs, basePath, "keyCol")

  /** The `_store.json` sidecar's optional pool override — present only
    * on a shallow clone ([[ManifestStore.cloneTo]]), pointing at the
    * pool OWNER's shared file pool. */
  def readStoredPool(fs: org.apache.hadoop.fs.FileSystem,
      basePath: String): Option[String] = readStoredField(fs, basePath, "pool")

  private def readStoredField(fs: org.apache.hadoop.fs.FileSystem,
      basePath: String, field: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(basePath, "_store.json")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      ("\"" + field + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r.findFirstMatchIn(txt)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
    }
  }

  /** Declared partition columns, recorded in a `_partition.json`
    * sidecar at the store base by the first partitioned write — the
    * table-layout contract BOTH store layouts share (Delta/Iceberg's
    * `partitionColumns` in the table metadata). Empty = unpartitioned.
    */
  def readStoredPartitionBy(fs: org.apache.hadoop.fs.FileSystem,
      basePath: String): Seq[String] = {
    val (hist, cur) = readPartitionSpecHistory(fs, basePath)
    if (hist.isEmpty) Seq.empty else hist(cur)
  }

  /** The FULL partition-spec history — Iceberg's partition-spec
    * evolution: `_partition.json` is a VERSIONED list of specs (spec
    * id = list index) plus the CURRENT id new landings use. Returns
    * (history, currentId); (empty, 0) for an unpartitioned store.
    *
    * v2 format: `{"specs": [["days(ts)"], ["months(ts)"]], "current": 1}`.
    * The v1 format (`{"partitionBy": [...]}` — every store written
    * before evolution existed) reads as a single spec id 0, so every
    * pre-evolution file belongs to spec 0 by construction and absent
    * per-file spec ids decode as 0 honestly. */
  def readPartitionSpecHistory(fs: org.apache.hadoop.fs.FileSystem,
      basePath: String): (Seq[Seq[String]], Int) = {
    val p = new org.apache.hadoop.fs.Path(basePath, "_partition.json")
    if (!fs.exists(p)) return (Seq.empty, 0)
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def strs(s: String): Seq[String] =
      "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(s)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
    if (!txt.contains("\"specs\"")) {
      val cols = strs(txt.dropWhile(_ != '[').takeWhile(_ != ']'))
      (if (cols.isEmpty) Seq.empty else Seq(cols), 0)
    } else {
      // the specs value is a depth-2 array: walk to the outer ']' by
      // bracket depth, then each inner [...] is one spec's columns
      val start = txt.indexOf('[', txt.indexOf("\"specs\""))
      var i = start; var depth = 0
      while (i < txt.length && (depth != 0 || i == start)) {
        if (txt(i) == '[') depth += 1 else if (txt(i) == ']') depth -= 1
        i += 1
      }
      val block = txt.substring(start + 1, i - 1)
      val specs = "\\[[^\\]]*\\]".r.findAllIn(block).map(strs).toSeq
      val cur = "\"current\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt)
        .map(_.group(1).toInt).getOrElse(0)
      (specs, math.min(math.max(cur, 0), math.max(specs.size - 1, 0)))
    }
  }

  private def writePartitionSpecsV2(fs: org.apache.hadoop.fs.FileSystem,
      basePath: String, hist: Seq[Seq[String]], current: Int): Unit = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val specs = hist.map(_.map(c => "\"" + esc(c) + "\"").mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
    val out = fs.create(new org.apache.hadoop.fs.Path(basePath, "_partition.json"), true)
    try out.write(s"""{"specs": $specs, "current": $current}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** EVOLVE the partition spec — `ALTER TABLE ... SET PARTITION SPEC`
    * as ONE metadata write: the new spec appends to the history (or
    * re-activates an identical earlier one) and becomes CURRENT; NOT
    * ONE data byte moves. Files already landed keep pruning through
    * the spec they were written under (their per-file spec id);
    * landings from here on cluster, stat and prune under the new one.
    * The classic retention-axis fix — `days(ts)` → `months(ts)` —
    * costs a sidecar write instead of a 100 TB rewrite. Returns the
    * (possibly reused) spec id now current. */
  /** Conservative per-file overlap test of a [lo, hi] SOURCE-column
    * range against a file's derived-tuple stats [minD, maxD] under
    * spec `sp`: a derived value v covers the source interval
    * [v, next(v)) (day/month/year/hour granule), so the file overlaps
    * iff next(maxD) > lo AND minD <= hi. NULL stats keep the file —
    * pruning never guesses. */
  private[operators] def sourceRangeOverlap(sp: PartSpec,
      minD: org.apache.spark.sql.Column, maxD: org.apache.spark.sql.Column,
      lo: Any, hi: Any): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val next = sp.transform match {
      case Some("days") => date_add(maxD.cast("date"), 1).cast("timestamp")
      case Some("months") => add_months(maxD.cast("date"), 1).cast("timestamp")
      case Some("years") => add_months(maxD.cast("date"), 12).cast("timestamp")
      case _ => maxD.cast("timestamp") + expr("INTERVAL 1 HOUR")
    }
    coalesce(next > lit(lo).cast("timestamp") &&
      minD.cast("timestamp") <= lit(hi).cast("timestamp"), lit(true))
  }

  def evolvePartitionSpec(fs: org.apache.hadoop.fs.FileSystem,
      basePath: String, cols: Seq[String]): Int = {
    require(cols.nonEmpty, "evolvePartitionSpec: no partition columns")
    val (hist, cur) = readPartitionSpecHistory(fs, basePath)
    require(hist.nonEmpty,
      s"store at $basePath is not partitioned — declare a first spec with " +
        "writePartitioned before evolving it")
    cols.foreach(parsePartitionSpec) // fail fast on an unparseable spec
    if (hist(cur) == cols) return cur // idempotent
    val id = hist.indexOf(cols) match {
      case -1 => hist.size
      case i => i
    }
    writePartitionSpecsV2(fs, basePath,
      if (id == hist.size) hist :+ cols else hist, id)
    id
  }

  /** Declared CHECK constraints, recorded in a `_constraints.json`
    * sidecar at the store base — (name, boolean SQL expression) pairs
    * every landing validates new rows against (Delta's CHECK
    * constraint contract: a row violates when the expression evaluates
    * FALSE; a NULL result PASSES, per the SQL standard — declare
    * `c IS NOT NULL` explicitly for NOT NULL semantics). Write-time
    * guards: pinned history is never re-judged. */
  def readConstraints(fs: org.apache.hadoop.fs.FileSystem,
      basePath: String): Seq[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(basePath, "_constraints.json")
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      ("\\{\\s*\"name\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"\\s*,\\s*" +
        "\"expr\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"\\s*\\}").r
        .findAllMatchIn(txt).map { m =>
          def un(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")
          (un(m.group(1)), un(m.group(2)))
        }.toSeq
    }
  }

  def writeConstraints(fs: org.apache.hadoop.fs.FileSystem,
      basePath: String, all: Seq[(String, String)]): Unit = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    fs.mkdirs(new org.apache.hadoop.fs.Path(basePath))
    val out = fs.create(
      new org.apache.hadoop.fs.Path(basePath, "_constraints.json"), true)
    try out.write(all.map { case (n, e) =>
      s"""{"name": "${esc(n)}", "expr": "${esc(e)}"}"""
    }.mkString("{\"constraints\": [", ", ", "]}").getBytes("UTF-8"))
    finally out.close()
  }

  /** Declared hash-bucket layout, recorded in a `_bucket.json` sidecar
    * at the store base by the first bucketed write — (column, bucket
    * count). The layout contract behind STORAGE-PARTITIONED JOINS:
    * every file of a bucketed version holds exactly the rows with
    * `pmod(murmur3(col), n) == id(file)` (Spark's own bucket-id
    * function and file-name convention), so the SQL catalog can serve
    * the version as a bucketed relation whose scan reports
    * HashPartitioning — and a store⋈store join on the bucket column
    * shuffles NEITHER side. None = unbucketed. */
  def readStoredBucketBy(fs: org.apache.hadoop.fs.FileSystem,
      basePath: String): Option[(String, Int)] = {
    val p = new org.apache.hadoop.fs.Path(basePath, "_bucket.json")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      for {
        c <- "\"col\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r.findFirstMatchIn(txt)
          .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
        n <- "\"n\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toInt)
      } yield (c, n)
    }
  }

  /** Persist the bucket declaration — [[writeStoredPartitionBy]]'s
    * contract (idempotent; redeclaration must match while versions
    * exist). */
  def writeStoredBucketBy(fs: org.apache.hadoop.fs.FileSystem,
      basePath: String, col: String, n: Int,
      canRedeclare: Boolean = false): Unit = {
    require(n > 0, s"bucket count must be positive, got $n")
    val existing = readStoredBucketBy(fs, basePath)
    if (existing.isDefined && !(canRedeclare && !existing.contains((col, n)))) {
      require(existing.contains((col, n)),
        s"store at $basePath is already bucketed as $existing; cannot redeclare " +
          s"as ($col, $n)")
    } else {
      fs.mkdirs(new org.apache.hadoop.fs.Path(basePath))
      val esc = col.replace("\\", "\\\\").replace("\"", "\\\"")
      val out = fs.create(new org.apache.hadoop.fs.Path(basePath, "_bucket.json"), true)
      try out.write(s"""{"col": "$esc", "n": $n}""".getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** The bucket id a data file's NAME declares, per Spark's bucketed
    * file-name convention (`..._00003.ext`) — the write paths name
    * bucketed files this way ON PURPOSE so `FileSourceScanExec` can
    * serve them as a bucketed scan; every OTHER landing verb's names
    * (plain `part-...`, pool `<uuid>-part-000NN.parquet`) contain no
    * `_<digits>` suffix, so a version holding ANY non-bucketed file
    * fails the gate and falls back to the plain scan route honestly. */
  private val bucketedFileName = """.*_(\d+)(?:\..*)?$""".r
  def bucketIdOf(fileName: String): Option[Int] = fileName match {
    // Spark's BucketingUtils.getBucketId pattern, verbatim — the scan
    // executor parses names with the SAME regex, so the gate and the
    // reader can never disagree
    case bucketedFileName(id) => Some(id.toInt)
    case _ => None
  }

  /** Persist the partition-column declaration. Idempotent; a SECOND
    * declaration must match the first — silently re-partitioning a
    * table under existing versions would break every reader's pruning
    * contract. `canRedeclare` (the stores pass `versions().isEmpty`)
    * permits a DIFFERENT declaration while the store holds no
    * committed version: a first partitioned write whose validation
    * rejected the data may have left the sidecar behind, and refusing
    * a corrected redeclaration then would wedge the empty store
    * permanently. */
  def writeStoredPartitionBy(fs: org.apache.hadoop.fs.FileSystem,
      basePath: String, cols: Seq[String],
      canRedeclare: Boolean = false): Unit = {
    require(cols.nonEmpty, "partitionBy needs at least one column")
    val existing = readStoredPartitionBy(fs, basePath)
    if (existing.nonEmpty && !(canRedeclare && existing != cols)) {
      require(existing == cols,
        s"store at $basePath is already partitioned by $existing; cannot redeclare as $cols")
    } else {
      fs.mkdirs(new org.apache.hadoop.fs.Path(basePath))
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      val out = fs.create(new org.apache.hadoop.fs.Path(basePath, "_partition.json"), true)
      try out.write(cols.map(c => "\"" + esc(c) + "\"")
        .mkString("{\"partitionBy\": [", ", ", "]}").getBytes("UTF-8"))
      finally out.close()
    }
  }
}

/** Shared Morton-interleave column builder — the multi-column
  * clustering key behind [[SnapshotStore.writeZOrdered]] and
  * [[ManifestStore.writeZOrdered]]. */
private[operators] object ZOrder {
  import org.apache.spark.sql.Column

  /** Order-preserving 16-bit-per-dimension Z (Morton) interleave over
    * 1..4 columns: one tiny bounds aggregate, then 16·k OR'd shift
    * terms — all inside whole-stage codegen. Temporal types route
    * through a timestamp cast (date/ntz have no direct double cast).
    */
  def zColumn(df: DataFrame, zCols: Seq[String]): Column = {
    require(zCols.nonEmpty && zCols.size <= 4, "z-order over 1..4 columns (16 bits each)")
    val asD = zCols.map { c =>
      import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
      df.schema(c).dataType match {
        case DateType | TimestampType | TimestampNTZType =>
          col(c).cast("timestamp").cast("double")
        case _ => col(c).cast("double")
      }
    }
    val bounds = df.agg(
      struct(asD.zipWithIndex.flatMap { case (c, i) =>
        Seq(min(c).as(s"lo$i"), max(c).as(s"hi$i")) }: _*).as("b")).head().getStruct(0)
    val buckets = asD.zipWithIndex.map { case (c, i) =>
      if (bounds.isNullAt(i * 2) || bounds.isNullAt(i * 2 + 1)) lit(0L)
      else {
        val (lo, hi) = (bounds.getDouble(i * 2), bounds.getDouble(i * 2 + 1))
        if (hi <= lo) lit(0L)
        else least(greatest(
          floor((c - lit(lo)) / lit(hi - lo) * 65536.0).cast("long"), lit(0L)), lit(65535L))
      }
    }
    val k = buckets.size
    (for (i <- 0 until k; j <- 0 until 16) yield
      shiftleft(shiftright(buckets(i), j).bitwiseAND(lit(1L)), j * k + i))
      .reduce((a, b) => a.bitwiseOR(b))
  }
}

class SnapshotStore(spark: SparkSession, basePath: String, keyCol: String) {

  private def dir(version: Long): String = s"$basePath/v=$version"

  private def fs = new Path(basePath).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Atomic snapshot publish: write to a temp sibling, then a single
    * rename onto `v=<version>` once the write (and its `_SUCCESS`
    * marker) completed. A crash mid-write leaves only a `.tmp-` dir,
    * which `versions()` never lists, so readers can never observe a
    * partial snapshot as a valid version.
    *
    * `commitTs` (epoch millis, default now) is recorded in a
    * `_commit_ts` sidecar INSIDE the tmp dir, so it publishes
    * atomically with the data — the timestamp [[readAsOf]] resolves
    * against. Pass it explicitly to backdate reproducible stores
    * (tests, replays); production writers take the default. */
  def write(df: DataFrame, version: Long, commitTs: Option[Long] = None): Unit =
    write(df, version, commitTs, None)

  /** [[write]] that additionally STAGES a zone map over `zmCols`
    * inside the tmp dir, so version + map publish in one rename —
    * the landing [[writeRangePartitioned]]/[[writeZOrdered]] use. */
  private def write(df: DataFrame, version: Long, commitTs: Option[Long],
      zmCols: Option[Seq[String]]): Unit = {
    ensureStoreMeta()
    val tmp = new Path(s"$basePath/.tmp-v=$version-${java.util.UUID.randomUUID()}")
    enforceConstraints(df, "write")
    // a partitioned store splits ANY landing one-tuple-per-file (the
    // caller's row arrangement is preserved within each tuple); an
    // unpartitioned store lands the frame's files verbatim
    val names = landFlat(df, tmp)
    writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
    // a PARTITIONED store's version must always carry its zone map
    // (the partition verbs' contract) — a plain full-replace write on
    // one stages the partition stats even when the caller asked for
    // no extra zmCols
    val effectiveZm = zmCols.orElse(
      Option(storedPartitionBy()).filter(_.nonEmpty))
    effectiveZm.foreach { cols =>
      zmNewStats(names.toSeq.sorted.map(n => new Path(tmp, n).toString),
          (cols ++ storedPartitionBy()).distinct.filterNot(_ == keyCol))
        .foreach(stageZoneMap(tmp, version, _))
    }
    // numOutputRows is the history row's own n_rows (footer-counted
    // at noteCommit) — recording it again here would be a recompute
    casPublish(tmp, version, "write",
      metrics = Map("numFiles" -> names.size.toLong))
  }

  private def writeCommitTs(versionDir: Path, ts: Long): Unit = {
    val out = fs.create(new Path(versionDir, "_commit_ts"), true)
    try out.writeUTF(ts.toString) finally out.close()
  }

  /** Persist the store's construction contract (the key column) in a
    * `_store.json` sidecar at the base — so a METADATA-ONLY consumer
    * (SnapshotCatalog's SQL `DELETE FROM`, which must drive a
    * key-ordered rewrite) can recover it without the caller
    * re-supplying what the store was built with. Idempotent, written
    * on first publish; advisory (the store API itself never reads
    * it back). */
  private def ensureStoreMeta(): Unit =
    if (keyCol.nonEmpty) {
      val p = new Path(basePath, "_store.json")
      if (!fs.exists(p)) {
        fs.mkdirs(new Path(basePath))
        val esc = keyCol.replace("\\", "\\\\").replace("\"", "\\\"")
        val out = fs.create(p, true)
        try out.write(s"""{"keyCol": "$esc"}""".getBytes("UTF-8")) finally out.close()
      }
    }

  /** The key column recorded by [[ensureStoreMeta]], when present. */
  def storedKeyCol(): Option[String] = SnapshotStore.readStoredKeyCol(fs, basePath)

  /** DEEP CLONE to a new table at `dstBase`, this layout's way: each
    * version is a self-contained directory, so the clone's version 1
    * is a byte-copy of the source version dir — data files, zone map,
    * schema sidecar carry verbatim under the same basenames, no
    * parquet decode — plus a fresh `_store.json`. O(version bytes) by
    * construction; the zero-copy shallow clone is the linked layout's
    * [[ManifestStore.cloneTo]]. Same tmp+rename publish discipline as
    * [[write]]: a crash leaves only a `.tmp-` dir at the target. */
  def cloneTo(dstBase: String, fromVersion: Long,
      commitTs: Option[Long] = None): SnapshotStore = {
    require(keyCol.nonEmpty, "cloneTo needs the source's key column")
    require(versions().contains(fromVersion), s"version $fromVersion does not exist")
    val conf = spark.sparkContext.hadoopConfiguration
    val dfs = new Path(dstBase).getFileSystem(conf)
    val dst = new SnapshotStore(spark, dstBase, keyCol)
    require(dst.versions().isEmpty, s"clone target $dstBase already has versions")
    dfs.mkdirs(new Path(dstBase))
    val tmp = new Path(s"$dstBase/.tmp-v=1-${java.util.UUID.randomUUID()}")
    org.apache.hadoop.fs.FileUtil.copy(fs, new Path(dir(fromVersion)), dfs, tmp,
      false, conf)
    // the zone map stores ABSOLUTE file URIs (readWhere opens them):
    // re-home each entry onto the clone's v=1 by basename, or pruned
    // reads on the clone would open the SOURCE's files
    if (fs.exists(new Path(zmapDir(fromVersion), "_SUCCESS"))) {
      spark.read.parquet(zmapDir(fromVersion)).withColumn("file",
          concat(lit(s"$dstBase/v=1/"), element_at(split(col("file"), "/"), -1)))
        .coalesce(1).write.mode("overwrite")
        .parquet(new Path(tmp, "_zonemap").toString)
    }
    commitTs.foreach { ts =>
      val out = dfs.create(new Path(tmp, "_commit_ts"), true)
      try out.writeUTF(ts.toString) finally out.close()
    }
    dst.ensureStoreMeta()
    val dest = new Path(s"$dstBase/v=1")
    if (!dfs.rename(tmp, dest))
      throw new java.io.IOException(s"clone publish failed: rename $tmp -> $dest")
    dst
  }

  /** When `version` was committed (epoch millis): the `_commit_ts`
    * sidecar when present, else the `_SUCCESS` marker's filesystem
    * mtime (pre-sidecar stores stay resolvable — mtime is exactly the
    * publish rename time on a store that was never copied). */
  def commitTimestamp(version: Long): Long =
    SnapshotStore.readHistoryCkpt(fs, basePath).get(version).map(_.commitTs)
      .getOrElse(commitTimestampRaw(version))

  private def commitTimestampRaw(version: Long): Long = {
    val sidecar = new Path(dir(version), "_commit_ts")
    if (fs.exists(sidecar)) {
      val in = fs.open(sidecar)
      try in.readUTF().toLong finally in.close()
    } else fs.getFileStatus(new Path(dir(version), "_SUCCESS")).getModificationTime
  }

  /** The newest version committed at or before `ts`, if any. Resolves
    * by commit timestamp, not version id order, so out-of-order
    * backfills still answer "what was live at ts" correctly. */
  def versionAsOf(ts: Long): Option[Long] = {
    // served from the version-log checkpoint: ONE sidecar read on the
    // warm path, not O(versions) per-version opens
    val committed = historyEntries().map { case (v, e) => v -> e.commitTs }
      .filter(_._2 <= ts)
    if (committed.isEmpty) None
    else Some(committed.maxBy { case (v, t) => (t, v) }._1)
  }

  /** Time-travel read — the "restore yesterday 14:00" UX every backup
    * tool exposes: read the newest version committed at or before
    * `ts`. Metadata-only resolution (version listing + KB sidecars),
    * then a plain single-version read. */
  def readAsOf(ts: Long): DataFrame = readAsOfResolved(ts)._2

  /** [[readAsOf]] returning the resolved version id alongside. */
  def readAsOfResolved(ts: Long): (Long, DataFrame) = versionAsOf(ts) match {
    case Some(v) => (v, read(v))
    case None => throw new IllegalArgumentException(
      s"no version committed at or before $ts" + (versions().headOption.map(v =>
        s" (earliest is v=$v at ${commitTimestamp(v)})").getOrElse(" (store is empty)")))
  }

  /** Timestamp-resolved [[restoreAndValidate]]: restore the snapshot
    * live at `ts` to `targetPath` and validate the copy. */
  def restoreAndValidateAsOf(ts: Long, targetPath: String,
      partCols: Seq[String], fp: DataFrame => Column): DataFrame =
    restoreAndValidate(readAsOfResolved(ts)._1, targetPath, partCols, fp)

  /** [[write]] with a data-skipping layout: rows range-partitioned by
    * the business key into ~`numFiles` files, sorted within each, plus
    * a zone map (per-file key min/max) built after publish. Each file
    * then owns a disjoint key range, so a keyed restore or diff reads
    * only the overlapping files ([[readKeyRange]]) instead of scanning
    * the whole snapshot — at 100 TB the difference between "restore
    * one partition" costing one file-set and costing the lake.
    * `repartitionByRange` is one shuffle at write time, paid once per
    * snapshot; the in-file sort additionally tightens parquet
    * row-group stats for predicate pushdown within a file. */
  def writeRangePartitioned(df: DataFrame, version: Long, numFiles: Int,
      statsCols: Seq[String] = Nil, commitTs: Option[Long] = None): Unit = {
    write(df.repartitionByRange(numFiles, col(keyCol)).sortWithinPartitions(keyCol),
      version, commitTs, Some(statsCols))
  }

  /** [[write]] with a HASH-BUCKETED layout — the co-location contract
    * behind STORAGE-PARTITIONED JOINS: rows land in exactly `buckets`
    * files, file `i` holding the rows with `pmod(murmur3(key), buckets)
    * == i` (Spark's own bucket function — `repartition(n, col)` IS
    * HashPartitioning, the same partitionIdExpression bucketed tables
    * use), key-sorted within, each file named with Spark's bucketed
    * suffix (`..._0000i.parquet`). The SQL catalog then serves the
    * version as a bucketed relation whose scan reports
    * `HashPartitioning(key, buckets)` — two stores bucketed to the
    * same count join on the key with ZERO Exchange on either side
    * (and zero Sort: one file per bucket, pre-sorted), the plan
    * `ScaleJoins.colocatedJoin` proves outside the catalog. At 100 TB
    * this is the difference between a store⋈store fact join shuffling
    * both sides and shuffling neither. The declaration persists in
    * `_bucket.json`; verbs that land non-bucketed files (mergeDelta,
    * compact) simply fail the read gate and the version serves through
    * the plain route — re-bucket with a fresh [[writeBucketed]]. */
  def writeBucketed(df: DataFrame, version: Long, buckets: Int,
      statsCols: Seq[String] = Nil, commitTs: Option[Long] = None): Unit = {
    require(buckets > 0, s"writeBucketed: bucket count must be positive, got $buckets")
    require(storedPartitionBy().isEmpty,
      "writeBucketed: this store declares partition columns — bucket and " +
        "partition layouts are exclusive per store")
    requireFreeVersion(version)
    ensureStoreMeta()
    SnapshotStore.writeStoredBucketBy(fs, basePath, keyCol, buckets,
      canRedeclare = versions().isEmpty)
    enforceConstraints(df, "writeBucketed")
    val tmp = new Path(s"$basePath/.tmp-v=$version-${java.util.UUID.randomUUID()}")
    df.repartition(buckets, col(keyCol)).sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(tmp.toString)
    // the writer names files part-<partitionId>-<uuid>...: the leading
    // number IS the bucket id (partition i of an explicit repartition).
    // Re-name to Spark's bucketed convention so FileSourceScanExec
    // (and the catalog gate) can parse the id back out of the name.
    val names = fs.listStatus(tmp).map(_.getPath)
      .filter(_.getName.startsWith("part-")).map { p =>
        val b = p.getName.stripPrefix("part-").takeWhile(_.isDigit).toInt
        require(b < buckets, s"writeBucketed: task id $b >= $buckets in ${p.getName}")
        val (stem, ext) = p.getName.span(_ != '.')
        val renamed = f"${stem}_$b%05d$ext"
        if (!fs.rename(p, new Path(tmp, renamed)))
          throw new java.io.IOException(s"bucketed landing rename failed for $p")
        renamed
      }.toSeq
    writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
    if (statsCols.nonEmpty)
      zmNewStats(names.sorted.map(n => new Path(tmp, n).toString),
          statsCols.distinct.filterNot(_ == keyCol))
        .foreach(stageZoneMap(tmp, version, _))
    casPublish(tmp, version, "writeBucketed", s"$buckets buckets by $keyCol")
  }

  /** Publish `version` as an EMPTY table of `schema` — SQL `CREATE
    * TABLE`'s landing for this layout. The version dir holds one
    * schema-carrying footer-only parquet file (Spark forces a single
    * write task for an empty frame, exactly so the schema survives)
    * plus an empty zone map, so the first [[mergeDelta]]
    * (INSERT/CTAS) finds the zone map it requires, rewrites nothing,
    * and lands the initial rows as version+1. The declared schema
    * must carry the store's key column. */
  def createEmpty(schema: org.apache.spark.sql.types.StructType, version: Long = 1L,
      commitTs: Option[Long] = None): Unit = {
    requireFreeVersion(version)
    require(schema.fieldNames.contains(keyCol),
      s"createEmpty: declared schema ${schema.fieldNames.mkString("(", ",", ")")} " +
        s"lacks the store key column '$keyCol'")
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    // a pre-declared partition spec (CREATE TABLE ... PARTITIONED BY)
    // seeds the zone map with the partition stats columns, so the
    // first INSERT's mergeDelta records them for its new files
    writeRangePartitioned(empty, version, 1,
      statsCols = storedPartitionBy(), commitTs = commitTs)
  }

  /** [[write]] with a MULTI-column clustering layout: rows ordered by
    * the Z-order (Morton) interleave of `zCols`, range-partitioned into
    * ~`numFiles` files, plus a zone map carrying per-file min/max for
    * EVERY clustered column. Where [[writeRangePartitioned]] makes one
    * column's ranges disjoint per file (perfect pruning on the key,
    * none on anything else), Z-ordering makes every clustered column
    * LOCALLY narrow in every file — a restore filtered on ANY of the
    * clustered dimensions skips most files ([[readWhere]] /
    * [[readWhereAll]]), the hierarchical-zone-map layout Delta/Iceberg
    * users reach for on 100 TB fact tables queried by more than one
    * dimension.
    *
    * The z-value is LAYOUT ONLY: each column is scaled to a 16-bit
    * bucket by its global min/max (one tiny aggregate), buckets are
    * bit-interleaved, and rows sort by the interleave. Pruning
    * correctness never depends on the z-math — the zone map records the
    * TRUE per-file min/max of each column, and [[readWhere]] filters
    * exactly. A degenerate z-value only costs skipping efficiency.
    * Columns must be numeric/temporal (bucketing needs an order-
    * preserving cast to double); nulls bucket to 0 and never prune
    * wrongly (zone-map rule: null bounds keep the file). */
  def writeZOrdered(df: DataFrame, version: Long, numFiles: Int,
      zCols: Seq[String], commitTs: Option[Long] = None): Unit = {
    val pcs = storedPartitionBy()
    val overlap = zCols.filter(pcs.contains)
    require(overlap.isEmpty,
      s"writeZOrdered: ${overlap.mkString(", ")} are partition columns — constant " +
        "within every file already; z-order the finer dimensions instead")
    // partitioned: OPTIMIZE ZORDER BY — range split over (tuple, z),
    // landFlat's hive stage keeps one tuple per file, each partition's
    // files cover contiguous z ranges (see ManifestStore.writeZOrdered)
    val zc = ZOrder.zColumn(df, zCols)
    val arranged =
      if (pcs.isEmpty)
        df.withColumn("__z", zc)
          .repartitionByRange(numFiles, col("__z")).sortWithinPartitions("__z")
          .drop("__z")
      else
        df.withColumn("__z", zc)
          .repartitionByRange(numFiles, (pcs.map(col) :+ col("__z")): _*)
          .sortWithinPartitions((pcs.map(col) :+ col("__z")): _*)
          .drop("__z")
    write(arranged, version, commitTs,
      Some((zCols ++ pcs).filterNot(_ == keyCol).distinct))
  }

  /** Restore under a CONJUNCTION of range predicates: rows of `version`
    * satisfying every `(column, lo, hi)`. Files are pruned by the
    * INTERSECTION of each predicate's zone-map survivor set (a file
    * must overlap every range to contain a qualifying row) — on a
    * z-ordered layout each dimension independently eliminates files,
    * so the conjunction reads the small corner both predicates carve
    * out. Falls back per-column to "no pruning" when stats are absent;
    * result always equals the full-scan filter. */
  def readWhereAll(version: Long, preds: Seq[(String, Any, Any)]): DataFrame = {
    require(preds.nonEmpty, "readWhereAll needs at least one predicate")
    val filter = preds.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi) }.reduce(_ && _)
    // a DERIVED temporal column may be hidden by the version's evolved
    // read schema even though the files carry it (CREATE TABLE chains
    // pin the declared columns): recompute it from its source for the
    // residual filter, then drop the synthesized copy
    val specs = storedPartitionSpecs().filter(_.transform.isDefined)
    def filteredOver(df: DataFrame): DataFrame = {
      val synth = preds.map(_._1).distinct
        .filterNot(df.columns.contains)
        .flatMap(c => specs.find(_.name == c))
      val derived = synth.foldLeft(df)((d, sp) =>
        d.withColumn(sp.name, SnapshotStore.deriveColumn(sp)))
      synth.map(_.name).foldLeft(derived.filter(filter))(_ drop _)
    }
    val survivorSets = preds.flatMap { case (c, lo, hi) => prunedFilesBy(version, c, lo, hi) }
    if (survivorSets.isEmpty) filteredOver(read(version))
    else {
      val files = survivorSets.map(_.toSet).reduce(_ intersect _)
      if (files.isEmpty) emptyRead(version)
      else filteredOver(readDataFiles(version, files.toSeq))
    }
  }


  private def colstatsDir(v: Long) = new Path(dir(v), "_colstats")

  /** ANALYZE — per-column statistics of `version`, persisted as a
    * `_colstats` sidecar inside the version dir (the
    * post-publish companion of the zone map: versions stay immutable,
    * sidecars are derived metadata). Default NDV is
    * approx_count_distinct (HLL — ONE fused pass over every column,
    * no expand, the 100 TB mode); `exactNdv` runs one count_distinct
    * job per column instead (exact, k extra passes — the fused
    * multi-distinct EXPAND would multiply the stream k-fold, the
    * q_approx_gate lesson). min/max land as strings so the stats
    * frame has one uniform schema across column types. */
  def analyzeColumns(version: Long, cols: Seq[String] = Nil,
      exactNdv: Boolean = false): DataFrame = {
    val df = read(version)
    val supported: org.apache.spark.sql.types.DataType => Boolean = {
      case _: org.apache.spark.sql.types.NumericType => true
      case org.apache.spark.sql.types.StringType => true
      case org.apache.spark.sql.types.DateType => true
      case org.apache.spark.sql.types.TimestampType => true
      case org.apache.spark.sql.types.BooleanType => true
      case _ => false
    }
    val target =
      if (cols.nonEmpty) cols
      else df.schema.fields.filter(f => supported(f.dataType)).map(_.name).toSeq
    val missing = target.filterNot(df.columns.contains)
    require(missing.isEmpty, s"analyzeColumns: not in the schema: ${missing.mkString(", ")}")
    val aggs = target.flatMap { c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")) ++
      (if (exactNdv) Nil else Seq(approx_count_distinct(col(c)).as(s"__ndv_$c")))
    } :+ count(lit(1)).as("__rows")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val nRows = row.getAs[Long]("__rows")
    val ndvs: Map[String, Long] =
      if (!exactNdv) target.map(c => c -> row.getAs[Long](s"__ndv_$c")).toMap
      else target.map(c =>
        c -> df.agg(count_distinct(col(c)).as("d")).head().getLong(0)).toMap
    val out = target.map { c =>
      (c, nRows, nRows - row.getAs[Long](s"__cnt_$c"), ndvs(c),
        Option(row.getAs[String](s"__min_$c")).orNull,
        Option(row.getAs[String](s"__max_$c")).orNull)
    }
    val stats = spark.createDataFrame(out)
      .toDF("col_name", "n_rows", "n_nulls", "ndv", "min_str", "max_str")
    stats.coalesce(1).write.mode("overwrite").parquet(colstatsDir(version).toString)
    stats
  }

  /** The stats [[analyzeColumns]] stored for `version`, if any. */
  def columnStats(version: Long): Option[DataFrame] =
    if (!fs.exists(new Path(colstatsDir(version), "_SUCCESS"))) None
    else Some(spark.read.parquet(colstatsDir(version).toString))

  private def bloomDir(v: Long, column: String) =
    new Path(dir(v), s"_bloom_$column")

  /** BLOOM FILTER INDEX — [[ManifestStore.buildBloomIndex]]'s
    * dir-per-version twin: one filter per data file over `column`
    * (string-uniform), sized by each file's parquet footer row count,
    * persisted as a `_bloom_<col>` sidecar inside the version dir. */
  def buildBloomIndex(version: Long, column: String, fpp: Double = 0.01): Unit = {
    val parts = fs.listStatus(new Path(dir(version))).map(_.getPath)
      .filter(_.getName.startsWith("part-")).toSeq
    require(parts.nonEmpty, s"buildBloomIndex: version $version has no files")
    val conf = spark.sparkContext.hadoopConfiguration
    val expected = parts.map { p =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try p.getName -> math.max(r.getRecordCount, 1L) finally r.close()
    }.toMap
    // RAW scan, deliberately unmasked: a DV-masked row left in the
    // filter is only a possible false positive (the probe re-filters
    // on the MASKED read), and input_file_name() needs a single-source
    // plan the masked anti-join cannot provide
    val sc0 = evolvedSchema(version)
    val raw0 = sc0.map(x => spark.read.schema(SnapshotStore.physicalSchema(x))
        .parquet(parts.map(_.toString): _*))
      .getOrElse(spark.read.parquet(parts.map(_.toString): _*))
    val raw = sc0.map(SnapshotStore.toLogical(raw0, _)).getOrElse(raw0)
    require(raw.columns.contains(column), s"buildBloomIndex: no column '$column'")
    import org.apache.spark.sql.Encoders
    val pairs = raw.select(
        element_at(split(input_file_name(), "/"), -1).as("__f"),
        col(column).cast("string").as("__v"))
      .as(Encoders.tuple(Encoders.STRING, Encoders.STRING))
    val fppLocal = fpp
    val blooms = pairs.groupByKey(_._1)(Encoders.STRING)
      .mapGroups { (f, it) =>
        val bf = org.apache.spark.util.sketch.BloomFilter.create(
          expected.getOrElse(f, 1000L), fppLocal)
        it.foreach { case (_, v) => if (v != null) bf.putString(v) }
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        (f, bos.toByteArray)
      }(Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .toDF("file", "bloom")
    blooms.coalesce(1).write.mode("overwrite")
      .parquet(bloomDir(version, column).toString)
  }

  /** The stored per-file Bloom filters for `column`, when built. */
  def bloomIndex(version: Long, column: String)
      : Option[Map[String, org.apache.spark.util.sketch.BloomFilter]] = {
    val p = bloomDir(version, column)
    if (!fs.exists(new Path(p, "_SUCCESS"))) None
    else Some(spark.read.parquet(p.toString).collect().map { r =>
      r.getString(0) -> org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
    }.toMap)
  }

  /** Point lookup on a bloom-indexed column — see
    * [[ManifestStore.readWhereEquals]]: files the index rules out
    * never open; files it does not cover always open (stale-safe);
    * exact re-filter on top. Returns (frame, filesOpened). */
  def readWhereEquals(version: Long, column: String, value: Any)
      : (DataFrame, Int) = {
    val pred = col(column) === lit(value)
    val parts = fs.listStatus(new Path(dir(version))).map(_.getPath)
      .filter(_.getName.startsWith("part-")).toSeq
    bloomIndex(version, column) match {
      case None => (readDataFiles(version, parts.map(_.toString)).filter(pred),
        parts.size)
      case Some(idx) =>
        val v = String.valueOf(value)
        val hit = parts.filter(p => idx.get(p.getName).forall(_.mightContainString(v)))
        val base =
          if (hit.isEmpty) emptyRead(version)
          else readDataFiles(version, hit.map(_.toString))
        (base.filter(pred), hit.length)
    }
  }

  /** `_zonemap` starts with '_' so Spark's file listing hides it from
    * plain `read(version)` scans — the zone map rides inside the
    * version dir without polluting it. */
  private def zmapDir(version: Long): String = s"${dir(version)}/_zonemap"

  /** (Re)build the per-file zone map of a committed version: one scan
    * of the stat'd columns only (pruned read), output |files| tiny
    * rows. Beyond the key, `statsCols` get min/max columns too
    * (`min_<c>`/`max_<c>`), so restores filtered on a NON-key column
    * can still skip files ([[readWhere]]) — worthwhile exactly when
    * the column correlates with the key order (timestamps vs
    * monotonically assigned ids, the common lake case). */
  def buildZoneMap(version: Long, statsCols: Seq[String] = Nil): Unit = {
    val aggs = Seq(
      min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"),
      count(lit(1)).as("n_rows")) ++
      statsCols.filterNot(_ == keyCol).flatMap(c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    read(version)
      .select((input_file_name().as("file") +: col(keyCol) +:
        statsCols.filterNot(_ == keyCol).map(col)): _*)
      .groupBy("file")
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1).write.mode("overwrite").parquet(zmapDir(version))
  }

  /** The version's zone map, if one was built. */
  def zoneMap(version: Long): Option[DataFrame] =
    if (fs.exists(new Path(zmapDir(version), "_SUCCESS")))
      Some(spark.read.parquet(zmapDir(version)))
    else None

  /** Files whose stats range for `column` overlaps [lo, hi] — None
    * when the version has no zone map or no stats for that column.
    * The overlap test runs typed through Catalyst (`lit(lo)` adopts
    * the column's native ordering). A null stats bound (all-null file
    * column) keeps the file — never prune on missing information. */
  def prunedFilesBy(version: Long, column: String, lo: Any, hi: Any): Option[Seq[String]] = {
    // zone-map stats describe the STORED (physical) columns — a
    // metadata-only rename translates the lookup, not the sidecar
    val phys = if (column == keyCol) column
      else SnapshotStore.physicalOf(evolvedSchema(version), column)
    val (minC, maxC) =
      if (column == keyCol) ("min_key", "max_key") else (s"min_$phys", s"max_$phys")
    zoneMap(version)
      .filter(zm => zm.columns.contains(minC) && zm.columns.contains(maxC))
      .map(_.filter(!(col(maxC) < lit(lo) || col(minC) > lit(hi)) ||
          col(minC).isNull || col(maxC).isNull)
        .select("file").collect().map(_.getString(0)).toSeq)
  }

  /** Files whose key range overlaps [lo, hi] — see [[prunedFilesBy]]. */
  def prunedFiles(version: Long, lo: Any, hi: Any): Option[Seq[String]] =
    prunedFilesBy(version, keyCol, lo, hi)


  /** [[ManifestStore.emptyRead]]'s dir-per-version twin: a zero-row
    * frame in the version's logical schema without standing up a scan
    * over the version's files. */
  private def emptyRead(version: Long): DataFrame =
    evolvedSchema(version) match {
      case Some(sc) => spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), sc)
      case None =>
        val parts = dataFiles(version)
        if (parts.isEmpty) read(version).limit(0)
        else spark.read.parquet(parts.head.toString).limit(0)
    }

  /** Restore filtered on ANY stats-mapped column: rows of `version`
    * with `column` in [lo, hi], reading only zone-map-overlapping
    * files when stats exist (falls back to a full scan + filter —
    * same result, no skip). */
  def readWhere(version: Long, column: String, lo: Any, hi: Any): DataFrame = {
    val pred = col(column) >= lit(lo) && col(column) <= lit(hi)
    prunedFilesBy(version, column, lo, hi) match {
      case Some(files) if files.isEmpty =>
        // provably no overlapping file: an empty frame, no scan planned
        emptyRead(version)
      case Some(files) => readDataFiles(version, files).filter(pred)
      case None => read(version).filter(pred)
    }
  }

  /** Keyed restore: rows of `version` with key in [lo, hi] — see
    * [[readWhere]]. */
  def readKeyRange(version: Long, lo: Any, hi: Any): DataFrame =
    readWhere(version, keyCol, lo, hi)

  /** Declared partition COLUMN NAMES — for a temporal transform spec
    * (`days(ts)` / `months(ts)`) this is the DERIVED identity column
    * (`ts__day` / `ts__month`) every landing materializes and all
    * pruning/drop machinery keys on. Empty on an unpartitioned store. */
  def storedPartitionBy(): Seq[String] = storedPartitionSpecs().map(_.name)

  /** The raw PARTITIONED BY declaration as recorded in the sidecar
    * (identity names and transform specs). */
  def storedPartitionSpecs(): Seq[SnapshotStore.PartSpec] =
    SnapshotStore.readStoredPartitionBy(fs, basePath)
      .map(SnapshotStore.parsePartitionSpec)

  private def deriveParts(df: DataFrame): DataFrame =
    SnapshotStore.derivePartitionCols(df, storedPartitionSpecs())

  /** Declared CHECK constraints ([[SnapshotStore.readConstraints]]). */
  def constraints(): Seq[(String, String)] =
    SnapshotStore.readConstraints(fs, basePath)

  /** ADD CONSTRAINT — Delta's contract: the TIP is scanned ONCE for
    * existing violations (fail = nothing recorded), then every later
    * landing validates its new rows. Write-time only: pinned history
    * is never re-judged. */
  def addConstraint(name: String, exprSql: String): Unit = {
    require(name.matches("[A-Za-z0-9_]+"),
      s"constraint name must be [A-Za-z0-9_]+, got '$name'")
    val cur = constraints()
    require(!cur.exists(_._1 == name), s"constraint '$name' already exists")
    latestVersion().foreach { v =>
      val bad = read(v).filter(coalesce(expr(exprSql), lit(true)) === lit(false))
        .limit(1).count()
      if (bad > 0) throw new ConstraintViolationException(
        s"ADD CONSTRAINT '$name': existing rows of version $v violate ($exprSql)")
    }
    SnapshotStore.writeConstraints(fs, basePath, cur :+ ((name, exprSql)))
  }

  def dropConstraint(name: String): Unit = {
    val cur = constraints()
    require(cur.exists(_._1 == name),
      s"no constraint named '$name' (have: ${cur.map(_._1).mkString(", ")})")
    SnapshotStore.writeConstraints(fs, basePath, cur.filterNot(_._1 == name))
  }

  /** Validate `df` against every declared constraint — one short-
    * circuiting probe job per constraint (first violating row lands in
    * the error as JSON). Runs BEFORE any landing I/O, so a rejected
    * commit publishes nothing. A deliberate extra pass over the
    * incoming rows: an inline raise_error filter would be free but can
    * fire spuriously under Catalyst filter reordering (the assert_true
    * pushdown hazard) — correctness wins. */
  private def enforceConstraints(df: DataFrame, what: String): Unit =
    constraints().foreach { case (n, e) =>
      val hit = df.filter(coalesce(expr(e), lit(true)) === lit(false))
        .select(to_json(struct(df.columns.map(col): _*)).as("row"))
        .limit(1).collect()
      if (hit.nonEmpty) throw new ConstraintViolationException(
        s"CHECK constraint '$n' (($e)) rejected $what: ${hit.head.getString(0)}")
    }

  /** A schema verb may not orphan a constraint: renaming/dropping a
    * column a CHECK expression references would leave the guard
    * unevaluable (or silently wrong). Refuse until it is dropped. */
  private def requireNoConstraintOn(colName: String, op: String): Unit =
    constraints().find(c =>
        ("""\b""" + java.util.regex.Pattern.quote(colName) + """\b""").r
          .findFirstIn(c._2).isDefined)
      .foreach { case (n, e) => throw new UnsupportedOperationException(
        s"$op '$colName': CHECK constraint '$n' (($e)) references it — " +
          s"drop the constraint first") }

  /** Physical arrangement every landing goes through —
    * [[ManifestStore]]'s twin: key-range + key-sort when
    * unpartitioned; partition-tuple clustering (≤ `numFiles` files per
    * tuple via a key-hash salt, key-sorted within) when partitioned,
    * so [[landFlat]]'s hive split keeps one partition tuple per file
    * and the zone map records exact (min==max) partition stats. */
  private def arrange(df: DataFrame, numFiles: Int): DataFrame =
    storedPartitionBy() match {
      case Seq() =>
        df.repartitionByRange(numFiles, col(keyCol)).sortWithinPartitions(keyCol)
      case pcs =>
        val d = deriveParts(df) // temporal transforms land derived identity cols
        val exprs = pcs.map(col) :+ pmod(hash(col(keyCol)), lit(math.max(numFiles, 1)))
        d.repartition(exprs: _*)
          .sortWithinPartitions((pcs :+ keyCol).map(col): _*)
    }

  /** Land `df`'s part files FLAT into `tmp` (the version dir under
    * construction) and return their names. Partitioned stores stage
    * hive-style on duplicated `__gp_<col>` directory columns (the
    * originals stay in the data — files remain self-contained) and the
    * leaves move flat under fresh `part-…` names, so the version dir
    * keeps the layout every reader/lister of this store assumes. */
  private def landFlat(df0: DataFrame, tmp: Path): Set[String] = {
    val pcs = storedPartitionBy()
    if (pcs.isEmpty) {
      df0.write.mode("overwrite").parquet(tmp.toString)
      fs.listStatus(tmp).map(_.getPath.getName).filter(_.startsWith("part-")).toSet
    } else {
      val df = deriveParts(df0)
      val stage = new Path(s"$basePath/.tmp-stage-${java.util.UUID.randomUUID()}")
      val dup = pcs.foldLeft(df)((d, c) => d.withColumn(s"__gp_$c", col(c)))
      dup.write.mode("overwrite")
        .partitionBy(pcs.map("__gp_" + _): _*).parquet(stage.toString)
      fs.mkdirs(tmp)
      val it = fs.listFiles(stage, true)
      val parts = Iterator.continually(it).takeWhile(_.hasNext).map(_.next().getPath)
        .filter(_.getName.startsWith("part-")).toIndexedSeq
      val names = parts.map { p =>
        val name = s"part-${java.util.UUID.randomUUID().toString.take(12)}-${p.getName.take(10)}.parquet"
        if (!fs.rename(p, new Path(tmp, name)))
          throw new java.io.IOException(s"partitioned landing rename failed for $p")
        name
      }
      fs.delete(stage, true)
      // an EMPTY frame writes no partition dirs at all — land its
      // schema-carrying footer-only file flat instead (createEmpty's
      // contract: a zero-row version must still declare its schema)
      val schemaNames =
        if (names.nonEmpty) Set.empty[String]
        else {
          val flat = new Path(s"$basePath/.tmp-stage-${java.util.UUID.randomUUID()}")
          df.limit(0).write.mode("overwrite").parquet(flat.toString)
          val moved = fs.listStatus(flat).map(_.getPath)
            .filter(_.getName.startsWith("part-")).map { p =>
              if (!fs.rename(p, new Path(tmp, p.getName)))
                throw new java.io.IOException(s"empty landing rename failed for $p")
              p.getName
            }.toSet
          fs.delete(flat, true)
          moved
        }
      fs.create(new Path(tmp, "_SUCCESS"), true).close()
      names.toSet ++ schemaNames
    }
  }

  /** First write of a PARTITIONED table on this layout —
    * [[ManifestStore.writePartitioned]]'s dir-per-version twin:
    * declares `partCols`, lands one-partition-tuple-per-file, and
    * builds a zone map whose partition-column stats are exact
    * (min==max), so partition predicates prune exactly through the
    * existing [[readWhere]]/[[prunedFilesBy]] machinery. `statsCols`
    * adds further zone-mapped columns beyond the partition spec. */
  def writePartitioned(df: DataFrame, version: Long, partCols: Seq[String],
      filesPerPartition: Int = 1, statsCols: Seq[String] = Nil,
      commitTs: Option[Long] = None): Unit = {
    requireFreeVersion(version)
    require(partCols.nonEmpty, "writePartitioned: no partition columns")
    require(!partCols.contains(keyCol),
      s"writePartitioned: '$keyCol' is the store key — zone-map key envelopes " +
        "already prune it; partition on a coarser dimension")
    val specs = partCols.map(SnapshotStore.parsePartitionSpec)
    val missing = specs.map(_.source).filterNot(df.columns.contains)
    require(missing.isEmpty, s"writePartitioned: not in the frame: ${missing.mkString(", ")}")
    specs.filter(_.transform.isDefined).map(_.name).filter(df.columns.contains)
      .foreach(n => throw new IllegalArgumentException(
        s"writePartitioned: derived partition column name '$n' collides with a " +
          "data column"))
    ensureStoreMeta()
    SnapshotStore.writeStoredPartitionBy(fs, basePath, partCols,
      canRedeclare = versions().isEmpty)
    enforceConstraints(df, "writePartitioned")
    val tmp = new Path(s"$basePath/.tmp-v=$version-${java.util.UUID.randomUUID()}")
    val names = landFlat(arrange(df, filesPerPartition), tmp)
    require(names.nonEmpty, "writePartitioned: empty input frame")
    writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
    zmNewStats(names.toSeq.sorted.map(n => new Path(tmp, n).toString),
        (statsCols ++ specs.map(_.name)).distinct.filterNot(_ == keyCol))
      .foreach(stageZoneMap(tmp, version, _))
    casPublish(tmp, version, "writePartitioned")
  }

  /** Zone-map rows with the partition tuple as plain value columns
    * (min==max per the layout invariant, asserted). */
  private def partitionEntries(zm: DataFrame, pcs: Seq[String]): DataFrame = {
    val absent = pcs.filterNot(c => zm.columns.contains(s"min_$c"))
    require(absent.isEmpty,
      s"version records no stats for partition column(s) ${absent.mkString(", ")} — " +
        "it predates the CURRENT partition spec; compact to rewrite under it, " +
        "or read through readSourceRange")
    val straddlers = zm.filter(
        pcs.map(c => !(col(s"min_$c") <=> col(s"max_$c"))).reduce(_ || _))
      .limit(1).count()
    require(straddlers == 0L,
      "partitioned-store invariant violated: a version file spans more than one " +
        "partition tuple (was data landed outside the store's own write paths?)")
    zm.select(zm.columns.map(col) ++ pcs.map(c => col(s"min_$c").as(c)): _*)
  }

  private def requirePartitionedZm(op: String, version: Long): (Seq[String], DataFrame) = {
    val pcs = storedPartitionBy()
    require(pcs.nonEmpty,
      s"$op needs a partitioned store — declare partition columns with writePartitioned")
    val zm = zoneMap(version).getOrElse(throw new IllegalStateException(
      s"$op needs version $version's zone map (writePartitioned builds it)"))
    (pcs, zm)
  }

  /** SHOW PARTITIONS, metadata-only — [[ManifestStore.partitions]]'s
    * twin off the zone map (physical row counts; DV-masked rows still
    * count until folded). */
  def partitions(version: Long): DataFrame = {
    val (pcs, zm) = requirePartitionedZm("partitions", version)
    requireUniformSpec(zm, "partitions")
    partitionEntries(zm, pcs)
      .groupBy(pcs.map(col): _*)
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("n_rows"))
  }

  /** DYNAMIC PARTITION OVERWRITE — [[ManifestStore.replaceWhere]]'s
    * twin: partitions present in `data` are replaced wholesale;
    * untouched partitions carry as byte-copies (this layout's carry
    * contract — the zero-copy carry is the linked layout's). Returns
    * (filesCarried, filesReplaced, filesNew). */
  def replaceWhere(fromVersion: Long, toVersion: Long, data: DataFrame,
      filesPerPartition: Int = 1, commitTs: Option[Long] = None): (Int, Int, Int) = {
    val (pcs, zm0) = requirePartitionedZm("replaceWhere", fromVersion)
    requireFreeVersion(toVersion)
    requireUniformSpec(zm0, "replaceWhere")
    enforceConstraints(data, "replaceWhere")
    val zm = zm0.materialize()
    val data2 = deriveParts(data)
    val touched = data2.select(pcs.map(col): _*).distinct().materialize()
    // NULL-SAFE anti-join (<=>): a null partition tuple in `data` must
    // replace the existing null-tuple files like any other value — a
    // plain column-list join never matches nulls, which would KEEP the
    // old null-partition files AND land the new rows (duplication)
    val pe = partitionEntries(zm, pcs)
    val sharedNames = pe.join(touched,
        pcs.map(c => pe(c) <=> touched(c)).reduce(_ && _), "left_anti")
      .select("file").collect()
      .map(f => { val p = f.getString(0); p.substring(p.lastIndexOf('/') + 1) }).toSet
    val allParts = fs.listStatus(new Path(dir(fromVersion))).map(_.getPath)
      .filter(_.getName.startsWith("part-")).toSeq
    val tmp = new Path(s"$basePath/.tmp-v=$toVersion-${java.util.UUID.randomUUID()}")
    val newNames = landFlat(arrange(evolvedSchema(fromVersion)
      .map(SnapshotStore.toPhysical(data2, _)).getOrElse(data2), filesPerPartition), tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val carriedParts = allParts.filter(p => sharedNames(p.getName))
    carriedParts.foreach { p =>
      org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, new Path(tmp, p.getName), false, conf)
    }
    carryDvInto(fromVersion, tmp, carriedParts.map(_.getName).toSet)
    writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
    evolvedSchema(fromVersion).foreach { sc =>
      val out = fs.create(new Path(tmp, "_schema.json"), true)
      try out.write(sc.json.getBytes("UTF-8")) finally out.close()
    }
    // zone map: carried entries re-home; only the new files scan —
    // staged INSIDE tmp so version + map publish in one rename
    val zmStatsCols = zm.columns.toSeq
      .filter(c => c.startsWith("min_") && c != "min_key").map(_.drop(4))
    val carried = zm
      .filter(regexp_extract(col("file"), "[^/]+$", 0).isin(sharedNames.toSeq: _*))
      .withColumn("file",
        regexp_replace(col("file"), s"/v=$fromVersion/", s"/v=$toVersion/"))
    val withNew = zmNewStats(
        newNames.toSeq.sorted.map(n => new Path(tmp, n).toString), zmStatsCols)
      .fold(carried)(carried.unionByName(_, allowMissingColumns = true))
    stageZoneMap(tmp, toVersion, withNew)
    casPublish(tmp, toVersion, "replaceWhere")
    (carriedParts.length, allParts.length - carriedParts.length, newNames.size)
  }

  /** Partition drop — [[ManifestStore.dropPartitions]]'s twin. On this
    * layout the survivors byte-copy into the new version dir (the
    * dir-per-version carry contract); the METADATA-ONLY drop is the
    * linked layout's. Null predicate rows are kept. Returns
    * (filesCarried, filesDropped, physicalRowsDropped). */
  def dropPartitions(fromVersion: Long, toVersion: Long, pred: Column,
      commitTs: Option[Long] = None): (Int, Int, Long) = {
    val (pcs, zm0) = requirePartitionedZm("dropPartitions", fromVersion)
    requireFreeVersion(toVersion)
    requireUniformSpec(zm0, "dropPartitions")
    val zm = zm0.materialize()
    val dropped = partitionEntries(zm, pcs).filter(coalesce(pred, lit(false)))
      .select(regexp_extract(col("file"), "[^/]+$", 0).as("name"), col("n_rows"))
      .materialize()
    val droppedNames = dropped.select("name").collect().map(_.getString(0)).toSet
    val rowsDropped = dropped.agg(coalesce(sum("n_rows"), lit(0L))).head().getLong(0)
    val allParts = fs.listStatus(new Path(dir(fromVersion))).map(_.getPath)
      .filter(_.getName.startsWith("part-")).toSeq
    val survivors = allParts.filterNot(p => droppedNames(p.getName))
    val tmp = new Path(s"$basePath/.tmp-v=$toVersion-${java.util.UUID.randomUUID()}")
    fs.mkdirs(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    survivors.foreach { p =>
      org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, new Path(tmp, p.getName), false, conf)
    }
    carryDvInto(fromVersion, tmp, survivors.map(_.getName).toSet)
    writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
    // dropping every partition legitimately empties the table: record
    // the schema sidecar so the zero-file version still plans
    val schema =
      if (survivors.isEmpty)
        evolvedSchema(fromVersion).orElse(Some(read(fromVersion).schema))
      else evolvedSchema(fromVersion)
    schema.foreach { sc =>
      val out = fs.create(new Path(tmp, "_schema.json"), true)
      try out.write(sc.json.getBytes("UTF-8")) finally out.close()
    }
    fs.create(new Path(tmp, "_SUCCESS"), true).close()
    stageZoneMap(tmp, toVersion,
      zm.filter(!regexp_extract(col("file"), "[^/]+$", 0).isin(droppedNames.toSeq: _*))
        .withColumn("file",
          regexp_replace(col("file"), s"/v=$fromVersion/", s"/v=$toVersion/")))
    casPublish(tmp, toVersion, "dropPartitions")
    (survivors.length, droppedNames.size, rowsDropped)
  }

  /** Per-file stat columns the version's zone map records (physical
    * names) — what scoped rewrites must reproduce for new entries. */
  private def zmStatsColsOf(zm: DataFrame): Seq[String] =
    zm.columns.toSeq.filter(c => c.startsWith("min_") && c != "min_key").map(_.drop(4))

  /** Names of the version's files inside the partitions `pred`
    * selects — evaluated on the zone map's min==max partition tuples,
    * metadata only. */
  private def matchedPartitionFiles(zm: DataFrame, pcs: Seq[String],
      pred: Column): Set[String] =
    partitionEntries(zm, pcs).filter(coalesce(pred, lit(false)))
      .select(regexp_extract(col("file"), "[^/]+$", 0).as("name"))
      .collect().map(_.getString(0)).toSet

  /** Shared landing for the scoped maintenance verbs: byte-copy
    * `carried` into a tmp dir, land `rewrite` (physical-named, hive
    * split one-tuple-per-file), carry the DV for carried files, stage
    * carried+new zone-map rows, CAS-publish. Returns new file names. */
  private def publishScopedRewrite(fromVersion: Long, toVersion: Long,
      carried: Seq[Path], rewrite: DataFrame, zm: DataFrame,
      commitTs: Option[Long], op: String, opParams: String): Set[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = new Path(s"$basePath/.tmp-v=$toVersion-${java.util.UUID.randomUUID()}")
    fs.mkdirs(tmp)
    carried.foreach { p =>
      org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, new Path(tmp, p.getName), false, conf)
    }
    val sc = evolvedSchema(fromVersion)
    val newNames = landFlat(
      sc.map(SnapshotStore.toPhysical(rewrite, _)).getOrElse(rewrite), tmp)
    carryDvInto(fromVersion, tmp, carried.map(_.getName).toSet)
    writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
    sc.foreach { x =>
      val out = fs.create(new Path(tmp, "_schema.json"), true)
      try out.write(x.json.getBytes("UTF-8")) finally out.close()
    }
    fs.create(new Path(tmp, "_SUCCESS"), true).close()
    val carriedNames = carried.map(_.getName).toSet
    val droppedNames = zm
      .select(regexp_extract(col("file"), "[^/]+$", 0).as("name"))
      .collect().map(_.getString(0)).filterNot(carriedNames).toSet
    stageCarriedZoneMap(tmp, fromVersion, toVersion, droppedNames,
      extra = zmNewStats(newNames.toSeq.sorted.map(n => new Path(tmp, n).toString),
        zmStatsColsOf(zm)))
    casPublish(tmp, toVersion, op, opParams, metrics = Map(
      "numAddedFiles" -> newNames.size.toLong,
      "numRemovedFiles" -> droppedNames.size.toLong))
    newNames
  }

  /** PARTITION-SCOPED compaction — Delta's `OPTIMIZE t WHERE part=x`
    * on this layout: fragments under `minBytes` INSIDE the partitions
    * `pred` selects fold into consolidated files; every other file
    * byte-carries under its own basename (the layout's carry
    * contract — names+sizes bit-identical, spec-pinned). Published as
    * a NEW version; history intact. Returns (filesCarried,
    * filesRewritten). */
  def compactWhere(fromVersion: Long, toVersion: Long, pred: Column,
      minBytes: Long = 8L << 20, commitTs: Option[Long] = None): (Int, Int) = {
    val (pcs, zm0) = requirePartitionedZm("compactWhere", fromVersion)
    requireFreeVersion(toVersion)
    val zm = zm0.materialize()
    val matched = matchedPartitionFiles(zm, pcs, pred)
    val allParts = fs.listStatus(new Path(dir(fromVersion)))
      .filter(_.getPath.getName.startsWith("part-")).toSeq
    val small = allParts
      .filter(f => matched(f.getPath.getName) && f.getLen < minBytes)
      .map(_.getPath)
    if (small.size <= 1) { // nothing to fold inside the scope
      restoreVersion(fromVersion, toVersion, commitTs,
        op = "compact", opParams = SnapshotStore.predSql(pred))
      return (allParts.size, 0)
    }
    val smallNames = small.map(_.getName).toSet
    val carried = allParts.map(_.getPath).filterNot(p => smallNames(p.getName))
    // masked read: the fold retires DV entries for rewritten files.
    // Repartition on the partition tuple so each scoped tuple folds to
    // ONE file (landFlat's hive split is per task per tuple — without
    // the shuffle, N input fragments land as N output fragments)
    val folded0 = readDataFiles(fromVersion, small.map(_.toString))
    val folded = SnapshotStore.derivePartitionCols(folded0,
        storedPartitionSpecs().filter(sp =>
          sp.transform.isDefined && !folded0.columns.contains(sp.name)))
      .repartition(pcs.map(col): _*)
    val newNames = publishScopedRewrite(fromVersion, toVersion, carried,
      folded, zm, commitTs, "compact", SnapshotStore.predSql(pred))
    (carried.size, newNames.size)
  }

  /** PARTITION-SCOPED Z-ORDER — re-cluster ONLY the partitions `pred`
    * selects on `zCols`' Morton order; everything else byte-carries.
    * Content-invariant (rows move between files, never change).
    * Returns (filesCarried, filesRewritten). */
  def zorderWhere(fromVersion: Long, toVersion: Long, pred: Column,
      zCols: Seq[String], numFiles: Int = 4,
      commitTs: Option[Long] = None): (Int, Int) = {
    val (pcs, zm0) = requirePartitionedZm("zorderWhere", fromVersion)
    requireFreeVersion(toVersion)
    require(zCols.nonEmpty, "zorderWhere: no z columns")
    val overlap = zCols.filter(pcs.contains)
    require(overlap.isEmpty,
      s"zorderWhere: ${overlap.mkString(", ")} are partition columns — constant " +
        "within every file already; z-order the finer dimensions instead")
    val zm = zm0.materialize()
    val matched = matchedPartitionFiles(zm, pcs, pred)
    val allParts = fs.listStatus(new Path(dir(fromVersion))).map(_.getPath)
      .filter(_.getName.startsWith("part-")).toSeq
    if (matched.isEmpty) {
      restoreVersion(fromVersion, toVersion, commitTs,
        op = "zorder", opParams = SnapshotStore.predSql(pred))
      return (allParts.size, 0)
    }
    val (touched, carried) = allParts.partition(p => matched(p.getName))
    val rows0 = readDataFiles(fromVersion, touched.map(_.toString))
    // a CREATE TABLE chain's evolved schema may hide a derived
    // temporal column the range split needs — recompute it (pure
    // function of its source; landFlat re-derives identically)
    val rows = SnapshotStore.derivePartitionCols(rows0,
      storedPartitionSpecs().filter(sp =>
        sp.transform.isDefined && !rows0.columns.contains(sp.name)))
    val zc = ZOrder.zColumn(rows, zCols)
    val arranged = rows.withColumn("__z", zc)
      .repartitionByRange(numFiles, (pcs.map(col) :+ col("__z")): _*)
      .sortWithinPartitions((pcs.map(col) :+ col("__z")): _*)
      .drop("__z")
    val newNames = publishScopedRewrite(fromVersion, toVersion, carried,
      arranged, zm, commitTs, "zorder", SnapshotStore.predSql(pred))
    (carried.size, newNames.size)
  }

  /** PARTITION-SCOPED DV fold — [[foldDv]] restricted to the masked
    * files inside `pred`'s partitions: those rewrite (masked rows drop
    * for good); every other file byte-carries WITH its mask intact.
    * Returns (filesCarried, filesRewritten, rowsDropped). */
  def foldDvWhere(fromVersion: Long, toVersion: Long, pred: Column,
      commitTs: Option[Long] = None): (Int, Int, Long) = {
    val (pcs, zm0) = requirePartitionedZm("foldDvWhere", fromVersion)
    requireFreeVersion(toVersion)
    val zm = zm0.materialize()
    val allParts = fs.listStatus(new Path(dir(fromVersion))).map(_.getPath)
      .filter(_.getName.startsWith("part-")).toSeq
    dvFrame(fromVersion) match {
      case None =>
        restoreVersion(fromVersion, toVersion, commitTs,
          op = "foldDv", opParams = SnapshotStore.predSql(pred))
        (allParts.size, 0, 0L)
      case Some(dv0) =>
        val dv = dv0.materialize()
        val matched = matchedPartitionFiles(zm, pcs, pred)
        val masked = dv.select("file").distinct().collect().map(_.getString(0))
          .filter(matched).toSet
        if (masked.isEmpty) {
          restoreVersion(fromVersion, toVersion, commitTs,
            op = "foldDv", opParams = SnapshotStore.predSql(pred))
          return (allParts.size, 0, 0L)
        }
        val nDropped = dv.filter(col("file").isin(masked.toSeq: _*)).count()
        val (touched, carried) = allParts.partition(p => masked(p.getName))
        val survivors = readDataFiles(fromVersion, touched.map(_.toString))
        val newNames = publishScopedRewrite(fromVersion, toVersion, carried,
          survivors, zm, commitTs, "foldDv", SnapshotStore.predSql(pred))
        (carried.size, newNames.size, nDropped)
    }
  }

  /** Delta-driven restore read: rows of `version` whose key appears in
    * `keys` (a one-column frame of key values, e.g. a CDC delta's
    * keys). Stacks every pruning layer this store has, coarsest
    * first — the 100 TB read path for "give me these N keys out of a
    * snapshot":
    *
    *  1. FILE level: zone map limits the scan to files overlapping the
    *     delta's [min, max] key envelope ([[readKeyRange]]);
    *  2. ROW level: a Bloom filter of the delta keys, applied inside
    *     the scan's codegen, drops ~all non-matching rows BEFORE the
    *     join shuffle (BloomPrune — exchange carries ~|matches|, not
    *     |file subset|);
    *  3. EXACT: the semi-join removes Bloom false positives.
    *
    * Result is identical to `read(version).join(keys, semi)`
    * (spec-proven); only the cost differs. */
  def readForKeys(version: Long, keys: DataFrame,
      expectedItems: Long = 4L * 1000 * 1000, fpp: Double = 0.03): DataFrame = {
    val keyName = keys.columns.head
    val bounds = keys.agg(min(col(keyName)).as("lo"), max(col(keyName)).as("hi")).head()
    if (bounds.isNullAt(0)) return emptyRead(version)
    val ranged = readKeyRange(version, bounds.get(0), bounds.get(1))
    val pruned = org.apache.spark.sql.graft.BloomPrune.prune(
      ranged, col(keyCol), keys, col(keyName), expectedItems, fpp)
    pruned.join(keys.select(col(keyName).as(keyCol)).distinct(), Seq(keyCol), "left_semi")
  }

  /** Committed versions only: a `v=N` directory counts only if its
    * `_SUCCESS` marker exists (guards against partial dirs created by
    * external writers or pre-atomic layouts). */
  def versions(): Seq[Long] = {
    val base = new Path(basePath)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.drop(2).toLong }
      .filter(v => fs.exists(new Path(dir(v), "_SUCCESS")))
      .sorted
  }

  /** Pre-check half of the commit CAS ([[CommitProtocol]]): refuse a
    * commit whose target version already exists before doing the
    * work; the authoritative check is the token verify at publish. */
  private def requireFreeVersion(v: Long): Unit =
    if (versions().contains(v))
      throw new VersionConflictException(
        s"$basePath: version $v already exists")

  /** CAS publication of a fully-built version dir — the layout's
    * [[CommitProtocol]] hookup. Exactly one concurrent publisher of
    * `toVersion` wins; the rest throw [[VersionConflictException]]
    * with their leftovers removed. */
  private def casPublish(tmp: Path, toVersion: Long, what: String,
      opParams: String = "", statsFrom: Option[Long] = None,
      metrics: Map[String, Long] = Map.empty): Unit = {
    // the operation stamp lands atomically WITH the version (inside
    // the tmp dir, before the CAS rename) — DESCRIBE HISTORY's verb
    // and the verb's own row/file counts (operationMetrics)
    SnapshotStore.writeOpSidecar(fs, tmp, what, opParams, metrics)
    val token = CommitProtocol.writeToken(fs, tmp)
    CommitProtocol.publish(fs, tmp, new Path(dir(toVersion)), token,
      s"$what to v$toVersion on $basePath")
    noteCommit(toVersion, what, opParams, statsFrom, metrics)
  }

  /** OPTIMISTIC-CONCURRENCY merge — [[ManifestStore.mergeAtTip]]'s
    * dir-per-version twin: attempt `mergeDelta(tip, tip+1, …)`; on a
    * lost commit race, re-diff against the new tip — commits touching
    * DISJOINT key sets commute, so rebase and retry; overlapping keys
    * abort with [[ConcurrentWriteConflictException]] (retrying would
    * silently drop one writer's update). Returns the published
    * version. */
  def mergeAtTip(delta: DataFrame, deleteKeys: Option[DataFrame] = None,
      numNewFiles: Int = 4, commitTs: Option[Long] = None,
      maxRetries: Int = 5, readVersion: Option[Long] = None): Long = {
    val delK = deleteKeys.map(df => df.select(df.columns.head).toDF(keyCol))
    val mine = delK.foldLeft(delta.select(keyCol))(_ unionByName _)
      .distinct().materialize()
    // the conflict check runs against the version the delta was DERIVED
    // from (Delta's OptimisticTransaction.readVersion): pass it when the
    // delta was computed from an earlier read; default = current tip
    var base = readVersion.orElse(latestVersion()).getOrElse(
      throw new IllegalStateException(
        s"mergeAtTip on $basePath: store has no committed versions"))
    var attempt = 0
    while (true) {
      try {
        mergeDelta(base, base + 1, delta, deleteKeys, numNewFiles, commitTs)
        return base + 1
      } catch {
        case e: VersionConflictException =>
          attempt += 1
          if (attempt > maxRetries) throw e
          val tip = latestVersion().getOrElse(base)
          if (tip > base) {
            val theirs = diff(base, tip).select(keyCol)
            if (mine.join(theirs, Seq(keyCol), "left_semi").limit(1).count() > 0)
              throw new ConcurrentWriteConflictException(
                s"mergeAtTip on $basePath: concurrent commit(s) v${base + 1}..v$tip " +
                  "changed keys this merge also touches — rebasing would drop one " +
                  "writer's update; re-read the tip and re-derive the delta")
            base = tip
          }
      }
    }
    -1L // unreachable: the loop returns or throws
  }

  private def dvPath(version: Long) = new Path(dir(version), "_dv")

  /** The version's DELETION VECTOR — (file basename, row position)
    * pairs masked out of every semantic read, when a merge-on-read
    * [[deleteWhere]] published one. Lives inside the version dir
    * (underscore-prefixed, like `_zonemap`), so it publishes
    * atomically with the version. */
  def dvFrame(version: Long): Option[DataFrame] =
    if (!fs.exists(new Path(dvPath(version), "_SUCCESS"))) None
    else Some(spark.read.parquet(dvPath(version).toString))

  /** Rows `version` SERVES after its deletion-vector mask — the
    * PLANNING statistic behind the masked-route relation's
    * `sizeInBytes` (a small DV-masked dimension table must still
    * broadcast in SQL joins). Metadata-only: the row total comes from
    * the version-log checkpoint (O(1) warm) and the mask size from
    * the DV sidecar's parquet FOOTER record counts (the mask is
    * metadata-sized by the auto policies) — no data pages, no job. */
  def visibleRowsOf(version: Long): Long =
    math.max(0L, rowCountOf(version) - dvRowCount(version))

  /** Stored (pre-mask) row total, checkpoint-served. */
  def rowCountOf(version: Long): Long =
    historyEntries().find(_._1 == version).map(_._2.nRows).getOrElse(0L)

  /** Mask entry count from the DV parquet footers — driver-side, one
    * footer open per DV part file (the DV lands coalesce(1)). */
  def dvRowCount(version: Long): Long = {
    val p = dvPath(version)
    if (!fs.exists(new Path(p, "_SUCCESS"))) 0L
    else {
      val conf = spark.sparkContext.hadoopConfiguration
      fs.listStatus(p)
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
        .map { f =>
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf))
          try r.getRecordCount finally r.close()
        }.sum
    }
  }

  /** Read `paths` (files or the version dir) with (file, position)
    * captured as regular columns `__f`/`__p` and the version's DV
    * applied — the masked-scan building block under every semantic
    * read and rewrite. Positions come from the parquet reader's own
    * `_metadata.row_index`; the DV broadcasts (kept metadata-sized by
    * deleteWhere's auto policy), so no shuffle lands on the data. */
  private def maskedScanWithPos(version: Long, paths: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType]): DataFrame = {
    // the scan asks for PHYSICAL names (what the bytes answer to under
    // a metadata-only rename) and projects to logical after the mask —
    // the column-mapping read contract, a zero-cost alias projection
    val raw = schema.map(x =>
        spark.read.schema(SnapshotStore.physicalSchema(x)).parquet(paths: _*))
      .getOrElse(spark.read.parquet(paths: _*))
    val withPos = raw.select(col("*"),
      element_at(split(col("_metadata.file_path"), "/"), -1).as("__f"),
      col("_metadata.row_index").as("__p"))
    val masked0 = dvFrame(version).map(d =>
      withPos.join(broadcast(d.toDF("__f", "__p")), Seq("__f", "__p"), "left_anti"))
      .getOrElse(withPos)
    schema.map(SnapshotStore.toLogical(masked0, _)).getOrElse(masked0)
  }

  private def masked(version: Long, paths: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType]): DataFrame =
    if (dvFrame(version).isEmpty)
      schema.map(x => SnapshotStore.toLogical(
          spark.read.schema(SnapshotStore.physicalSchema(x)).parquet(paths: _*), x))
        .getOrElse(spark.read.parquet(paths: _*))
    else maskedScanWithPos(version, paths, schema).drop("__f", "__p")

  /** Write the surviving DV entries (those naming files in `keep` —
    * byte-carried under the same basename) into the tmp dir BEFORE
    * publish, so the mask lands atomically with the version. A
    * rewritten file materialized its survivors; its entries drop. */
  private def carryDvInto(fromVersion: Long, tmp: Path,
      keep: Set[String]): Unit =
    dvFrame(fromVersion).foreach { dv =>
      val kept = dv.filter(col("file").isin(keep.toSeq: _*)).materialize()
      if (kept.limit(1).count() > 0)
        kept.coalesce(1).write.mode("overwrite")
          .parquet(new Path(tmp, "_dv").toString)
    }

  def read(version: Long): DataFrame = recomputeDerived(evolvedSchema(version) match {
    case Some(sc) => applyFills(masked(version, Seq(dir(version)), Some(sc)), sc)
    case None => masked(version, Seq(dir(version)), None)
  })

  /** Commit history — the `DESCRIBE HISTORY` surface (ManifestStore
    * .history's twin for this layout): one row per version with its
    * commit timestamp and file/row totals. Metadata-only — an FS
    * listing plus each file's parquet FOOTER record count, no data
    * pages read; |versions| rows. Served in SQL as the
    * `<cat>.<store>.history` metadata table. */
  def history(): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    historyEntries().map { case (v, e) =>
        (v, e.commitTs, e.nFiles, e.nRows, e.op, e.opParams, e.metrics) }
      .toDF("version", "commit_ts", "n_files", "n_rows",
        "operation", "operation_params", "operation_metrics")
  }

  /** Per-version (version, bytes_added, n_rows, operation) ascending —
    * ONE checkpoint read serves every version (the change feed's
    * size-estimate input; calling [[commitBytes]] per version would
    * re-read the checkpoint |versions| times). */
  def commitStats(): Seq[(Long, Long, Long, String)] =
    historyEntries().map { case (v, e) => (v, e.bytes, e.nRows, e.op) }

  /** One version's checkpoint row REBUILT from its dir — the
    * self-heal / publish-time unit: commit ts from the sidecar (or
    * the `_SUCCESS` mtime for pre-sidecar dirs), file/row counts from
    * one listing + the files' parquet footers (driver-only, no job),
    * bytes = what the commit ADDED (new basenames vs predecessor). */
  private def computeHistoryEntry(v: Long): SnapshotStore.HistoryEntry = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = fs.listStatus(new Path(dir(v)))
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
        && !f.getPath.getName.startsWith("."))
    val rows = files.map { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf))
      try r.getRecordCount finally r.close()
    }.sum
    val (op, params, metrics) = SnapshotStore.readOpSidecar(fs, new Path(dir(v)))
    SnapshotStore.HistoryEntry(commitTimestampRaw(v), files.length.toLong, rows,
      commitBytesRaw(v), op, params, metrics)
  }

  /** The VERSION-LOG CHECKPOINT, served and self-healed: retained
    * versions ascending with their consolidated stats. Warm path =
    * ONE `_history.json` read, O(1) file opens regardless of the
    * version count; entries missing from the checkpoint (crash,
    * concurrent publisher, external writer, invalidation) rebuild
    * from the dirs and the checkpoint rewrites. */
  private def historyEntries(): Seq[(Long, SnapshotStore.HistoryEntry)] = {
    val vs = versions()
    val ckpt = SnapshotStore.readHistoryCkpt(fs, basePath)
    val live = ckpt.filter { case (v, _) => vs.contains(v) }
    val missing = vs.filterNot(live.contains)
    if (missing.isEmpty) vs.map(v => v -> live(v))
    else {
      val merged = live ++ missing.map(v => v -> computeHistoryEntry(v))
      SnapshotStore.writeHistoryCkpt(fs, basePath, merged)
      vs.map(v => v -> merged(v))
    }
  }

  /** Incremental checkpoint maintenance — one entry appended per
    * publish. Best-effort: the checkpoint is derived, so losing this
    * write (crash, a concurrent publisher's rewrite racing ours)
    * self-heals on the next read. */
  private def noteCommit(v: Long, op: String = "unknown",
      opParams: String = "", statsFrom: Option[Long] = None,
      metrics: Map[String, Long] = Map.empty): Unit =
    try {
      val ckpt = SnapshotStore.readHistoryCkpt(fs, basePath)
      // STATS-CARRY commits (renameColumn / widenColumn /
      // restoreVersion) share the source version's file CONTENT, so
      // counts/rows reuse its checkpoint entry instead of re-opening
      // every data file's footer — O(1), not O(N files). Bytes are NOT
      // carried: on this layout a carry verb may still physically land
      // files under new basenames (restoreVersion copies the whole
      // dir), so bytes come from the two-listing basename diff —
      // rename/widen (same basenames) stay 0, restore reports what it
      // actually copied, and byte-paced change-feed admission never
      // treats a large restore commit as free. Falls back to the full
      // rebuild when the source entry is cold (self-heal covers it
      // either way).
      val entry = statsFrom.flatMap(ckpt.get) match {
        case Some(prev) => prev.copy(commitTs = commitTimestampRaw(v),
          bytes = commitBytesRaw(v), op = op, opParams = opParams,
          metrics = metrics)
        case None => computeHistoryEntry(v)
      }
      SnapshotStore.writeHistoryCkpt(fs, basePath, ckpt + (v -> entry))
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Drop the checkpoint wholesale — used by verbs that change
    * EXISTING versions' stats (compact swaps a version's files in
    * place; prune changes which commit counts "whole" for bytes):
    * the next read rebuilds from truth. */
  private def invalidateHistoryCkpt(): Unit =
    try fs.delete(new Path(basePath, "_history.json"), false): Unit
    catch { case scala.util.control.NonFatal(_) => () }

  private def schemaSidecar(version: Long) = new Path(dir(version), "_schema.json")

  /** The version's EVOLVED read schema, when a [[mergeDelta]] schema
    * evolution recorded one: the union of every column the version's
    * files collectively hold (old carried files simply lack the newer
    * columns — the parquet reader yields null there), with each
    * evolution-introduced column's fill default riding in its field
    * metadata (`graft.fill`). The `_schema.json` name starts with '_'
    * so file listings hide it from data scans, like `_zonemap`. */
  def evolvedSchema(version: Long): Option[org.apache.spark.sql.types.StructType] = {
    val p = schemaSidecar(version)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(org.apache.spark.sql.types.DataType.fromJson(txt)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    }
  }

  /** Fill defaults recorded in an evolved schema's field metadata,
    * typed for `na.fill`. Applied uniformly at READ time, so a row
    * reads identically whether its file was rewritten by the evolving
    * merge or byte-carried from before the column existed — the only
    * policy a copy-on-write merge can honor without rewriting every
    * untouched file. (Like [[Snapshot.mergeUpsert]]'s `fill`, a null
    * EXPLICITLY stored in a delta row for the new column also reads
    * as the default.) */
  private def applyFills(df: DataFrame,
      sc: org.apache.spark.sql.types.StructType): DataFrame = {
    val fills = SnapshotStore.fillValues(sc)
    if (fills.isEmpty) df else df.na.fill(fills)
  }

  /** Read specific data files of a version through its evolved schema
    * (if any) — the shared reader under every pruned-file path, so a
    * zone-map-pruned restore sees the same columns a full read does. */
  private def readDataFiles(version: Long, files: Seq[String]): DataFrame =
    recomputeDerived(evolvedSchema(version) match {
      case Some(sc) => applyFills(masked(version, files, Some(sc)), sc)
      case None => masked(version, files, None)
    })

  /** The version's data file paths — a metadata-only listing. File
    * identity is the incremental-maintenance contract: [[mergeDelta]]
    * byte-copies untouched files under the SAME basename, so a
    * basename present in two versions holds bit-identical rows —
    * what [[Similarity.updateIvfpqIndex]]-style consumers key on to
    * carry derived artifacts forward without rescanning. */
  def dataFiles(version: Long): Seq[Path] =
    fs.listStatus(new Path(dir(version))).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("part-"))

  def latestVersion(): Option[Long] = versions().lastOption

  /** Bytes a commit ADDED: sizes of the part files whose basename is
    * NEW vs the retained predecessor (byte-carried files share their
    * basename — [[mergeDelta]]'s identity contract). Metadata-only;
    * the change feed's byte-based admission control paces on it. */
  def commitBytes(version: Long): Long =
    SnapshotStore.readHistoryCkpt(fs, basePath).get(version).map(_.bytes)
      .getOrElse(commitBytesRaw(version))

  private def commitBytesRaw(version: Long): Long = {
    val prev = versions().filter(_ < version).lastOption
    val old = prev.map(p => dataFiles(p).map(_.getName).toSet)
      .getOrElse(Set.empty[String])
    dataFiles(version).filterNot(p => old(p.getName))
      .map(p => fs.getFileStatus(p).getLen).sum
  }

  def latest(): DataFrame = latestVersion() match {
    case Some(v) => read(v)
    case None => throw new IllegalStateException(
      s"snapshot store at $basePath has no committed versions")
  }

  /** Restore = read the chosen version (full snapshots make restore a
    * plain scan; callers re-write it wherever it needs to land). */
  def restore(version: Long): DataFrame = read(version)

  /** The reference's full backup→restore→verify loop in one call:
    * copy `version` to `targetPath`, then validate the copy with one
    * manifest join (per-partition counts + XOR content hashes — the
    * shuffle carries |partitions| rows, not |table|). Returns the
    * per-partition status report; a run is healthy iff every status
    * is "ok". `fp` must be an md5-hex fingerprint over the columns
    * that define row content. */
  def restoreAndValidate(version: Long, targetPath: String,
      partCols: Seq[String], fp: DataFrame => Column): DataFrame = {
    val src = read(version)
    src.write.mode("overwrite").parquet(targetPath)
    val dst = spark.read.parquet(targetPath)
    Snapshot.validateCopy(src, dst, partCols, col(keyCol), fp)
  }

  /** Copy-on-write merge — publish `toVersion` by merging an upsert
    * `delta` (full-schema rows, replace-by-key) and optional
    * `deleteKeys` into a range-partitioned `fromVersion`, REWRITING
    * ONLY the files whose key range the delta actually touches.
    * Untouched files are copied byte-identical (same basename) into the
    * new version dir and their zone-map rows carry over with just the
    * path prefix remapped — no rescan. At 100 TB this is the difference
    * between "daily merge rewrites the lake" and "daily merge rewrites
    * the 0.1% of files the delta's keys land in": a full
    * [[Snapshot.mergeUpsert]]+write costs O(|base|) I/O every day,
    * this costs O(|touched files| + |delta|).
    *
    * Mechanics:
    *  1. touched = files whose zone-map [min,max] contains any
    *     upserted/deleted key — ONE pass over the (small) key set
    *     range-joined against the broadcast zone map;
    *  2. rewritten content = touched files' rows minus replaced/deleted
    *     keys, plus the delta upserts (minus deletes) — delta keys
    *     landing outside every existing file range (appends) are
    *     written here too;
    *  3. publish: Spark writes the rewritten subset to a `.tmp-` dir,
    *     untouched files are byte-copied in, one atomic rename makes
    *     it `v=<toVersion>` (crash mid-copy leaves only an unlisted
    *     `.tmp-` dir — same guarantee as [[write]]);
    *  4. zone map: untouched rows carried over (path remapped), ONLY
    *     the new files are scanned for stats — incremental maintenance
    *     in O(|rewritten|).
    *
    * SCHEMA EVOLUTION ([[Snapshot.mergeUpsert]]'s `allowMissingColumns`
    * semantics, CoW-shaped): a column the delta ADDS joins the
    * version's schema — carried files are NOT rewritten; the evolved
    * union schema persists as a `_schema.json` sidecar and every read
    * path supplies it, so old files yield null (or the recorded `fill`
    * default) for the new column. A column the delta DROPS keeps its
    * stored values on survivor rows and reads null on delta rows. A
    * same-name column with a DIFFERENT type fails fast — silent
    * coercion at 100 TB is a corrupted lake. `fill` keys must be
    * columns this delta introduces; defaults apply uniformly at read
    * time (see [[applyFills]]).
    *
    * Returns (filesCopied, filesRewritten). */
  def mergeDelta(fromVersion: Long, toVersion: Long, delta: DataFrame,
      deleteKeys: Option[DataFrame] = None, numNewFiles: Int = 4,
      commitTs: Option[Long] = None,
      fill: Map[String, Any] = Map.empty): (Int, Int) = {
    ensureStoreMeta()
    val baseSchema = evolvedSchema(fromVersion)
      .getOrElse(spark.read.parquet(dir(fromVersion)).schema)
    val baseNames = baseSchema.fieldNames.toSet
    delta.schema.fields.filter(f => baseNames(f.name)).foreach { f =>
      val bt = baseSchema(f.name).dataType
      // simpleString comparison ignores nullability flags (an
      // array<float> whose containsNull differs is the same type)
      require(bt.simpleString == f.dataType.simpleString,
        s"mergeDelta: column '${f.name}' type changed ${bt.simpleString} -> " +
          s"${f.dataType.simpleString}; evolving a column's TYPE needs an explicit rewrite")
    }
    val newFields = delta.schema.fields.filterNot(f => baseNames(f.name))
    val basePhys = baseSchema.fields.map(SnapshotStore.physicalName).toSet
    newFields.foreach(f => require(!basePhys(f.name),
      s"mergeDelta: new column '${f.name}' collides with a stored PHYSICAL " +
        "column name (a prior RENAME maps it) - old bytes would answer to two " +
        "logical columns; compact first to fold the mapping"))
    require(fill.keySet.subsetOf(newFields.map(_.name).toSet),
      s"fill keys ${fill.keySet} must be columns this delta introduces " +
        s"(${newFields.map(_.name).toSet})")
    val unionSchema = org.apache.spark.sql.types.StructType(
      baseSchema.fields ++ newFields.map(f =>
        SnapshotStore.fieldWithFill(f, fill.get(f.name))))
    val evolved = newFields.nonEmpty || evolvedSchema(fromVersion).isDefined
    // align any frame to the union schema: present columns pass
    // through, absent ones read null (old files / dropped delta cols)
    def align(df: DataFrame): DataFrame = {
      val have = df.columns.toSet
      df.select(unionSchema.fields.toIndexedSeq.map(f =>
        if (have(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)): _*)
    }
    val zm = zoneMap(fromVersion).getOrElse(throw new IllegalStateException(
      s"mergeDelta needs a zone map on version $fromVersion (use writeRangePartitioned)"))
      .materialize()
    val statsCols = zm.columns.toSeq
      .filter(c => c.startsWith("min_") && c != "min_key").map(_.drop(4))
    val delK = deleteKeys.map(df => df.select(df.columns.head).toDF(keyCol))
    // every key the merge touches: upserted + deleted, deduped; the
    // __del flag (delete wins over a same-key upsert, matching the
    // upserts' left_anti below) drives operationMetrics' updated vs
    // deleted split without a second look at the caller's frames
    val touchKeys = delK.foldLeft(
        delta.select(col(keyCol)).withColumn("__del", lit(false)))(
        (acc, del) => acc.unionByName(del.withColumn("__del", lit(true))))
      .groupBy(keyCol).agg(max(col("__del")).as("__del")).materialize()
    // file is touched iff its key envelope contains a touched key: the
    // zone map is |files| rows — broadcast it into a range join over
    // the key set, one narrow pass, collect only file paths
    val touched = touchKeys.join(broadcast(zm),
        col(keyCol) >= col("min_key") && col(keyCol) <= col("max_key"))
      .select("file").distinct().collect().map(_.getString(0)).toSet
    val srcDir = new Path(dir(fromVersion))
    val allParts = fs.listStatus(srcDir).map(_.getPath)
      .filter(_.getName.startsWith("part-"))
    // zone-map paths are input_file_name URIs; compare by basename
    val touchedNames = touched.map(p => p.substring(p.lastIndexOf('/') + 1))
    val (touchedParts, untouchedParts) = allParts.partition(p => touchedNames(p.getName))
    // operationMetrics, computed without touching the user's delta
    // pipeline again: the matched (updated|deleted) counts come from
    // ONE key-column-pruned pass over the touched files (the rewrite
    // below re-reads them in full twice — range-sampling + shuffle —
    // so the narrow count is a small fraction of work already paid);
    // the upsert count reads off the checkpointed key frame.
    val (nMatched, nMatchedDel) =
      if (touchedParts.isEmpty) (0L, 0L)
      else {
        val r = maskedScanWithPos(fromVersion,
            touchedParts.map(_.toString).toIndexedSeq, Some(unionSchema))
          .select(col(keyCol)).join(touchKeys, Seq(keyCol))
          .agg(count(lit(1)).as("m"),
            coalesce(sum(when(col("__del"), 1L)), lit(0L)).as("d")).head()
        (r.getLong(0), r.getLong(1))
      }
    val nUpserts = touchKeys.filter(col("__del") === false).count()
    val survivors =
      if (touchedParts.isEmpty) align(delta.limit(0))
      else maskedScanWithPos(fromVersion,
          touchedParts.map(_.toString).toIndexedSeq, Some(unionSchema))
        .drop("__f", "__p") // masked: DV-deleted rows must not resurrect
        .join(touchKeys, Seq(keyCol), "left_anti")
    val upserts = align(
      delK.foldLeft(delta)((d, del) => d.join(del, Seq(keyCol), "left_anti")))
    enforceConstraints(upserts, "mergeDelta")
    // fills MATERIALIZE into rewritten files (an explicit null in a
    // delta row for a filled column lands as the default): stored
    // rows then need no read-time rewrite, so a plain SQL scan with
    // the schema's existence defaults (SnapshotCatalog) reads the
    // same values the store API does; carried pre-evolution files
    // stay covered by the read-time fill / existence default.
    val rewritten = applyFills(survivors.unionByName(upserts), unionSchema)
    // publish: spark writes the rewritten files (+_SUCCESS) to tmp
    // (partition-aware arrangement on a partitioned store), untouched
    // bytes copy in beside them, one rename goes live
    val tmp = new Path(s"$basePath/.tmp-v=$toVersion-${java.util.UUID.randomUUID()}")
    // mapped stores land new files under PHYSICAL names (name-uniform
    // with the byte-carried files; a no-op without a mapping)
    val newNames = landFlat(
      arrange(SnapshotStore.toPhysical(rewritten, unionSchema), numNewFiles), tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    untouchedParts.foreach { p =>
      org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, new Path(tmp, p.getName), false, conf)
    }
    carryDvInto(fromVersion, tmp, untouchedParts.map(_.getName).toSet)
    writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
    if (evolved) {
      // the evolved union schema publishes atomically WITH the version
      // (inside tmp before the rename) — a version dir can never hold
      // mixed-schema files without the sidecar naming their union
      val out = fs.create(new Path(tmp, "_schema.json"), true)
      try out.write(unionSchema.json.getBytes("UTF-8")) finally out.close()
    }
    // incremental zone map: untouched rows carry over with the version
    // prefix remapped; only the new files are scanned — staged inside
    // tmp so version + map publish in one rename
    val carried = zm.filter(!col("file").isin(touched.toSeq: _*))
      .withColumn("file",
        regexp_replace(col("file"), s"/v=$fromVersion/", s"/v=$toVersion/"))
    val withNew = zmNewStats(
        newNames.toSeq.sorted.map(n => new Path(tmp, n).toString), statsCols)
      .fold(carried)(carried.unionByName(_, allowMissingColumns = true))
    stageZoneMap(tmp, toVersion, withNew)
    // Delta's MERGE operationMetrics: matched = touched-file rows
    // whose key the merge addressed (updated + deleted), split by the
    // __del flag; inserted = upsert keys minus the updated ones
    // (keys are store-unique)
    casPublish(tmp, toVersion, "mergeDelta", metrics = Map(
      "numTargetRowsInserted" -> math.max(0L, nUpserts - (nMatched - nMatchedDel)),
      "numTargetRowsUpdated" -> (nMatched - nMatchedDel),
      "numTargetRowsDeleted" -> nMatchedDel,
      "numTargetFilesAdded" -> newNames.size.toLong,
      "numTargetFilesRemoved" -> touchedParts.length.toLong))
    (untouchedParts.length, newNames.size)
  }

  /** Schema-evolution DROP COLUMN — the sidecar-narrowing twin of
    * [[mergeDelta]]'s column ADD: publish `toVersion` whose recorded
    * `_schema.json` EXCLUDES `cols`, with every data file byte-copied
    * under the same basename (this layout's carry contract — no
    * parquet decode/encode). The narrowed sidecar hides the columns at
    * read time (the evolved-schema reader projects only recorded
    * fields; stored bytes for the dropped column are simply never
    * read), while pinned reads of prior versions keep seeing them —
    * exactly Delta/Iceberg's metadata-only drop. Zone-map rows carry
    * over with any dropped stats column's min/max removed. The key
    * column is the store's identity and cannot drop. */
  def dropColumns(fromVersion: Long, toVersion: Long, cols: Seq[String],
      commitTs: Option[Long] = None): Unit = {
    ensureStoreMeta()
    require(versions().contains(fromVersion), s"version $fromVersion does not exist")
    requireFreeVersion(toVersion)
    require(!cols.contains(keyCol),
      s"dropColumns: '$keyCol' is the store's key column — its identity, not droppable")
    cols.foreach(requireNoConstraintOn(_, "dropColumns"))
    cols.filter(c => storedPartitionBy().contains(c)
        || storedPartitionSpecs().exists(_.source == c)).foreach(c =>
      throw new UnsupportedOperationException(
        s"dropColumns '$c': it is a declared partition column (or a transform's " +
          "source) — the table's physical layout keys on it"))
    val cur = evolvedSchema(fromVersion)
      .getOrElse(spark.read.parquet(dir(fromVersion)).schema)
    val missing = cols.filterNot(cur.fieldNames.contains)
    require(missing.isEmpty, s"dropColumns: not in the schema: ${missing.mkString(", ")}")
    require(cur.fields.length > cols.size, "dropColumns: cannot drop every column")
    val newSchema = org.apache.spark.sql.types.StructType(
      cur.fields.filterNot(f => cols.contains(f.name)))
    val tmp = new Path(s"$basePath/.tmp-v=$toVersion-${java.util.UUID.randomUUID()}")
    fs.mkdirs(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    fs.listStatus(new Path(dir(fromVersion))).map(_.getPath)
      .filter(_.getName.startsWith("part-"))
      .foreach { p =>
        org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, new Path(tmp, p.getName), false, conf)
      }
    // every file byte-carries under its basename → the DV carries whole
    dvFrame(fromVersion).foreach(_.coalesce(1).write.mode("overwrite")
      .parquet(new Path(tmp, "_dv").toString))
    writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
    val out = fs.create(new Path(tmp, "_schema.json"), true)
    try out.write(newSchema.json.getBytes("UTF-8")) finally out.close()
    fs.create(new Path(tmp, "_SUCCESS"), true).close()
    zoneMap(fromVersion).foreach { zm =>
      val keep = zm.columns.toSeq.filterNot(c =>
        cols.exists(dc => c == s"min_$dc" || c == s"max_$dc"))
      stageZoneMap(tmp, toVersion,
        zm.select(keep.map(col): _*)
          .withColumn("file",
            regexp_replace(col("file"), s"/v=$fromVersion/", s"/v=$toVersion/")))
    }
    casPublish(tmp, toVersion, "dropColumns")
  }

  /** Schema-evolution RENAME COLUMN. Parquet resolves columns BY NAME
    * (this store writes no field ids), so a rename cannot be
    * metadata-only — old bytes answer to the old name — and Delta
    * draws the same line (rename requires column-mapping mode or a
    * rewrite). The honest translation is a ONE-TIME copy-on-write
    * rewrite of the tip into `toVersion` under the new name: pinned
    * history keeps the old name untouched, fills materialize in the
    * rewrite (so no sidecar is needed after it), and the zone map
    * rebuilds with any renamed stats column followed. The key column
    * is recorded store identity (`_store.json`) and cannot rename. */
  /** METADATA-ONLY TYPE WIDENING — [[ManifestStore.widenColumn]]'s
    * dir-per-version twin: data files byte-copy under the same
    * basenames (this layout's carry contract, no parquet decode), the
    * DV and zone map carry verbatim, and only the `_schema.json`
    * sidecar re-types `column` to the wider `newType`
    * ([[SnapshotStore.canWiden]]). Pinned history keeps the narrow
    * type; key/partition columns refuse; non-widening changes keep
    * refusing. */
  def widenColumn(fromVersion: Long, toVersion: Long, column: String,
      newType: org.apache.spark.sql.types.DataType,
      commitTs: Option[Long] = None): Unit = {
    ensureStoreMeta()
    require(versions().contains(fromVersion), s"version $fromVersion does not exist")
    requireFreeVersion(toVersion)
    require(column != keyCol,
      s"widenColumn: '$keyCol' is the store's key column — its zone-map envelope " +
        "stats are typed; widening the identity is a store-level migration")
    require(!storedPartitionBy().contains(column)
        && !storedPartitionSpecs().exists(_.source == column),
      s"widenColumn '$column': it is a declared partition column (or a " +
        "transform's source) — its min==max stats are typed in the zone map")
    val cur = evolvedSchema(fromVersion)
      .getOrElse(spark.read.parquet(dir(fromVersion)).schema)
    val f = cur.fields.find(_.name == column).getOrElse(
      throw new IllegalArgumentException(s"widenColumn: no column '$column'"))
    require(SnapshotStore.canWiden(f.dataType, newType),
      s"widenColumn: ${f.dataType.simpleString} -> ${newType.simpleString} is not " +
        "a supported widening (integral chain, float->double, integral->decimal) " +
        "— any other type change would corrupt old files' meaning")
    val newSchema = org.apache.spark.sql.types.StructType(
      cur.fields.map(x => if (x.name == column) x.copy(dataType = newType) else x))
    val tmp = new Path(s"$basePath/.tmp-v=$toVersion-${java.util.UUID.randomUUID()}")
    fs.mkdirs(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    fs.listStatus(new Path(dir(fromVersion))).map(_.getPath)
      .filter(_.getName.startsWith("part-"))
      .foreach { p =>
        org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, new Path(tmp, p.getName), false, conf)
      }
    dvFrame(fromVersion).foreach(_.coalesce(1).write.mode("overwrite")
      .parquet(new Path(tmp, "_dv").toString))
    writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
    val out = fs.create(new Path(tmp, "_schema.json"), true)
    try out.write(newSchema.json.getBytes("UTF-8")) finally out.close()
    fs.create(new Path(tmp, "_SUCCESS"), true).close()
    stageCarriedZoneMap(tmp, fromVersion, toVersion, Set.empty)
    casPublish(tmp, toVersion, "widenColumn",
      s"$column -> ${newType.simpleString}", statsFrom = Some(fromVersion))
  }

  def renameColumn(fromVersion: Long, toVersion: Long, from: String, to: String,
      numFiles: Int = 4, commitTs: Option[Long] = None): Unit = {
    ensureStoreMeta()
    require(versions().contains(fromVersion), s"version $fromVersion does not exist")
    requireFreeVersion(toVersion)
    require(from != keyCol,
      s"renameColumn: '$keyCol' is the store's recorded key column — renaming the " +
        "identity is a store-level migration, not schema evolution")
    requireNoConstraintOn(from, "renameColumn")
    require(!storedPartitionBy().contains(from)
        && !storedPartitionSpecs().exists(_.source == from),
      s"renameColumn '$from': it is a declared partition column (or a transform's " +
        "source) — the table's physical layout keys on it")
    val cur = evolvedSchema(fromVersion)
      .getOrElse(spark.read.parquet(dir(fromVersion)).schema)
    require(cur.fieldNames.contains(from), s"renameColumn: no column '$from'")
    require(!cur.fieldNames.contains(to), s"renameColumn: '$to' already exists")
    val otherPhys = cur.fields.filterNot(_.name == from)
      .map(SnapshotStore.physicalName).toSet
    require(!otherPhys.contains(to),
      s"renameColumn: '$to' is a stored PHYSICAL column name (a prior rename maps " +
        "it) — old bytes would answer to two logical columns; compact first to " +
        "fold the mapping")
    val newSchema = org.apache.spark.sql.types.StructType(cur.fields.map(f =>
      if (f.name == from) SnapshotStore.renamedField(f, to) else f))
    // METADATA-ONLY rename (column mapping): files byte-carry under the
    // same basename — this layout's carry contract, no parquet decode —
    // the DV and zone map carry verbatim (their entries describe the
    // stored, physical columns), and only the `_schema.json` sidecar
    // changes: the field takes the new LOGICAL name while
    // `graft.physical` pins the stored one. Folds at the next full
    // rewrite (compact / plain write), like a DV mask.
    val tmp = new Path(s"$basePath/.tmp-v=$toVersion-${java.util.UUID.randomUUID()}")
    fs.mkdirs(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    fs.listStatus(new Path(dir(fromVersion))).map(_.getPath)
      .filter(_.getName.startsWith("part-"))
      .foreach { p =>
        org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, new Path(tmp, p.getName), false, conf)
      }
    dvFrame(fromVersion).foreach(_.coalesce(1).write.mode("overwrite")
      .parquet(new Path(tmp, "_dv").toString))
    writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
    val out = fs.create(new Path(tmp, "_schema.json"), true)
    try out.write(newSchema.json.getBytes("UTF-8")) finally out.close()
    fs.create(new Path(tmp, "_SUCCESS"), true).close()
    stageCarriedZoneMap(tmp, fromVersion, toVersion, Set.empty)
    casPublish(tmp, toVersion, "renameColumn",
      s"$from -> $to", statsFrom = Some(fromVersion))
  }

  /** Row-level change classification between two versions:
    * `insert` (key only in `to`), `delete` (key only in `from`),
    * `update` (key in both, content fingerprint differs).
    * Unchanged rows are not emitted.
    *
    * Schema-evolution aware: fingerprints cover the COMMON non-key
    * columns of the two versions, so adding or dropping a column does
    * not flag every row as updated (it would, if each side hashed its
    * own full row). Column-level changes are reported separately by
    * [[schemaDiff]]. */
  /** Predicate delete (the GDPR erasure primitive): copy-on-write
    * rewrite of `fromVersion` into `toVersion` with every row matching
    * `pred` removed. Only the files that actually CONTAIN a matching
    * row are rewritten; every other file carries over by copy — the
    * cost scales with the predicate's file footprint, not the snapshot
    * size. The match scan is one narrow pass (Catalyst prunes to the
    * predicate's columns and pushes the filter to the parquet scan);
    * `pruneHint = (statsColumn, lo, hi)` additionally restricts that
    * scan to the zone-map files overlapping the range, so a delete
    * keyed by a clustered column (time, tenant, user-id band) never
    * reads the rest of a 100 TB snapshot at all.
    *
    * Null semantics: a row where `pred` is NULL is KEPT (only rows
    * that provably match are erased) — the keep-filter is
    * `!coalesce(pred, false)`, because `filter(!pred)` alone would
    * silently DROP null-evaluating rows, which is data loss, not
    * deletion. Returns (filesCarried, filesRewritten, rowsDeleted).
    *
    * This erases rows from the NEW version only — prior versions still
    * hold them (they are immutable snapshots); full-history erasure =
    * deleteWhere on the tip + [[prune]] of the old versions, or the
    * chunk-repository twin [[ChunkStore.redact]]. */
  def deleteWhere(fromVersion: Long, toVersion: Long, pred: Column,
      numNewFiles: Int = 4, commitTs: Option[Long] = None,
      pruneHint: Option[(String, Any, Any)] = None,
      mode: String = "auto"): (Int, Int, Long) = {
    require(Set("auto", "cow", "dv")(mode),
      s"deleteWhere mode must be auto|cow|dv, got '$mode'")
    ensureStoreMeta()
    require(versions().contains(fromVersion), s"version $fromVersion does not exist")
    requireFreeVersion(toVersion)
    val unionSchema = evolvedSchema(fromVersion)
      .getOrElse(spark.read.parquet(dir(fromVersion)).schema)
    val matches = coalesce(pred, lit(false))
    val allParts = fs.listStatus(new Path(dir(fromVersion))).map(_.getPath)
      .filter(_.getName.startsWith("part-")).toSeq
    def base(p: String) = p.substring(p.lastIndexOf('/') + 1)
    val candidates = pruneHint.flatMap { case (c, lo, hi) =>
      prunedFilesBy(fromVersion, c, lo, hi).map { files =>
        val names = files.map(base).toSet
        allParts.filter(p => names(p.getName))
      }
    }.getOrElse(allParts)
    // which candidate rows match, and where. The match side filters on
    // the BARE predicate: `filter` keeps only TRUE rows (nulls drop),
    // identical to coalesce(pred,false), and the untranslatable
    // coalesce wrapper would block parquet filter pushdown on this —
    // the one scan whose pushdown matters. The scan is DV-masked, so
    // an already-deleted row can never re-match.
    val matchRows =
      if (candidates.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("file",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("pos",
              org.apache.spark.sql.types.LongType))))
      else maskedScanWithPos(fromVersion, candidates.map(_.toString), Some(unionSchema))
        .filter(pred)
        .select(col("__f").as("file"), col("__p").as("pos")).materialize()
    val matchStats = matchRows.groupBy("file").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val deleted = matchStats.values.sum
    val (touchedParts, untouchedParts) =
      allParts.partition(p => matchStats.contains(p.getName))
    // strategy (ManifestStore.deleteWhere's twin): merge-on-read when
    // the match is sparse relative to the files it touches — a point
    // delete then costs one byte-copy pass plus a metadata-sized mask
    // instead of decoding and re-encoding every touched file — and
    // copy-on-write when dense
    val touchedPhys = touchedParts.map { p =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          p, spark.sparkContext.hadoopConfiguration))
      try r.getRecordCount finally r.close()
    }.sum
    val useDv = deleted > 0 &&
      (mode == "dv" || (mode == "auto" && deleted * 5 <= touchedPhys))
    val conf = spark.sparkContext.hadoopConfiguration
    if (useDv) {
      val tmp = new Path(s"$basePath/.tmp-v=$toVersion-${java.util.UUID.randomUUID()}")
      fs.mkdirs(tmp)
      allParts.foreach { p =>
        org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, new Path(tmp, p.getName), false, conf)
      }
      val merged = dvFrame(fromVersion).map(_.unionByName(matchRows)).getOrElse(matchRows)
      merged.coalesce(1).write.mode("overwrite")
        .parquet(new Path(tmp, "_dv").toString)
      fs.create(new Path(tmp, "_SUCCESS"), true).close()
      writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
      if (evolvedSchema(fromVersion).isDefined) {
        val out = fs.create(new Path(tmp, "_schema.json"), true)
        try out.write(unionSchema.json.getBytes("UTF-8")) finally out.close()
      }
      // no file changed identity: the zone map carries verbatim (its
      // envelopes stay CONSERVATIVE over masked rows — pruning may
      // open a file whose matches are all masked, never skip a live row)
      stageCarriedZoneMap(tmp, fromVersion, toVersion, Set.empty)
      casPublish(tmp, toVersion, "deleteWhere", SnapshotStore.predSql(pred),
        metrics = Map("numDeletedRows" -> deleted,
          "numAddedFiles" -> 0L, "numRemovedFiles" -> 0L,
          "numDeletionVectorsUpdated" -> matchStats.size.toLong))
      return (allParts.length, 0, deleted)
    }
    val tmp = new Path(s"$basePath/.tmp-v=$toVersion-${java.util.UUID.randomUUID()}")
    val rewritten =
      if (touchedParts.isEmpty)
        spark.read.schema(unionSchema).parquet(dir(fromVersion)).limit(0)
      else arrange(applyFills(
          maskedScanWithPos(fromVersion, touchedParts.map(_.toString), Some(unionSchema))
            .drop("__f", "__p") // masked: DV-deleted rows must not resurrect
            .filter(!matches), unionSchema), // fills materialize on rewrite (see mergeDelta)
        numNewFiles)
    val newNames = landFlat(SnapshotStore.toPhysical(rewritten, unionSchema), tmp)
    untouchedParts.foreach { p =>
      org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, new Path(tmp, p.getName), false, conf)
    }
    carryDvInto(fromVersion, tmp, untouchedParts.map(_.getName).toSet)
    writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
    if (evolvedSchema(fromVersion).isDefined) {
      val out = fs.create(new Path(tmp, "_schema.json"), true)
      try out.write(unionSchema.json.getBytes("UTF-8")) finally out.close()
    }
    // zone map: untouched rows carry with the version remapped, only
    // the rewritten files rescan (same incremental shape as
    // mergeDelta) — staged inside tmp
    zoneMap(fromVersion).foreach { zm =>
      val statsCols = zm.columns.toSeq
        .filter(c => c.startsWith("min_") && c != "min_key").map(_.drop(4))
      val touchedNames = touchedParts.map(_.getName).toSet
      val carried = zm
        .filter(!regexp_extract(col("file"), "[^/]+$", 0)
          .isin(touchedNames.toSeq: _*))
        .withColumn("file",
          regexp_replace(col("file"), s"/v=$fromVersion/", s"/v=$toVersion/"))
      val withNew = zmNewStats(
          newNames.toSeq.sorted.map(n => new Path(tmp, n).toString), statsCols)
        .fold(carried)(carried.unionByName(_, allowMissingColumns = true))
      stageZoneMap(tmp, toVersion, withNew)
    }
    casPublish(tmp, toVersion, "deleteWhere", SnapshotStore.predSql(pred),
      metrics = Map("numDeletedRows" -> deleted,
        "numAddedFiles" -> newNames.size.toLong,
        "numRemovedFiles" -> touchedParts.length.toLong))
    (untouchedParts.length, newNames.size, deleted)
  }

  /** MERGE-ON-READ MERGE — [[ManifestStore.mergeDeltaMor]]'s
    * dir-per-version twin: superseded rows mask into the deletion
    * vector, the delta lands as NEW files beside byte-copied
    * originals (no parquet decode/encode of any existing file).
    * Same-schema only; constraints gate the delta. Returns
    * (filesNew, rowsMasked). */
  def mergeDeltaMor(fromVersion: Long, toVersion: Long, delta: DataFrame,
      deleteKeys: Option[DataFrame] = None, numNewFiles: Int = 2,
      commitTs: Option[Long] = None): (Int, Long) = {
    ensureStoreMeta()
    require(versions().contains(fromVersion), s"version $fromVersion does not exist")
    requireFreeVersion(toVersion)
    val unionSchema = evolvedSchema(fromVersion)
      .getOrElse(spark.read.parquet(dir(fromVersion)).schema)
    require(delta.schema.fieldNames.sorted.sameElements(unionSchema.fieldNames.sorted),
      s"mergeDeltaMor is same-schema only — an evolving merge takes mergeDelta's " +
        "copy-on-write path")
    val delK = deleteKeys.map(df => df.select(df.columns.head).toDF(keyCol))
    val touchKeys = delK.foldLeft(delta.select(keyCol))(_ unionByName _)
      .distinct().materialize()
    val allParts = fs.listStatus(new Path(dir(fromVersion))).map(_.getPath)
      .filter(_.getName.startsWith("part-")).toSeq
    val matchRows = maskedScanWithPos(fromVersion, allParts.map(_.toString),
        Some(unionSchema))
      .join(touchKeys, Seq(keyCol), "left_semi")
      .select(col("__f").as("file"), col("__p").as("pos")).materialize()
    val upserts = delK.foldLeft(delta)((d, del) =>
      d.join(del, Seq(keyCol), "left_anti"))
    enforceConstraints(upserts, "mergeDeltaMor")
    val tmp = new Path(s"$basePath/.tmp-v=$toVersion-${java.util.UUID.randomUUID()}")
    val newNames = landFlat(
      arrange(SnapshotStore.toPhysical(upserts, unionSchema), numNewFiles), tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    allParts.foreach { p =>
      org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, new Path(tmp, p.getName), false, conf)
    }
    val nMasked = matchRows.count()
    val mask = dvFrame(fromVersion).map(_.unionByName(matchRows)).getOrElse(matchRows)
      .materialize()
    if (mask.limit(1).count() > 0)
      mask.select("file", "pos").coalesce(1).write.mode("overwrite")
        .parquet(new Path(tmp, "_dv").toString)
    writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
    evolvedSchema(fromVersion).foreach { x =>
      val out = fs.create(new Path(tmp, "_schema.json"), true)
      try out.write(x.json.getBytes("UTF-8")) finally out.close()
    }
    fs.create(new Path(tmp, "_SUCCESS"), true).close()
    zoneMap(fromVersion).foreach { zm =>
      val zmStatsCols = zm.columns.toSeq
        .filter(c => c.startsWith("min_") && c != "min_key").map(_.drop(4))
      val carried = zm.withColumn("file",
        regexp_replace(col("file"), s"/v=$fromVersion/", s"/v=$toVersion/"))
      val withNew = zmNewStats(
          newNames.toSeq.sorted.map(n => new Path(tmp, n).toString), zmStatsCols)
        .fold(carried)(carried.unionByName(_, allowMissingColumns = true))
      stageZoneMap(tmp, toVersion, withNew)
    }
    casPublish(tmp, toVersion, "mergeDeltaMor", metrics = Map(
      "numTargetRowsMasked" -> nMasked,
      "numTargetFilesAdded" -> newNames.size.toLong,
      "numTargetFilesRemoved" -> 0L))
    (newNames.size, nMasked)
  }

  /** Predicate UPDATE with a MERGE-ON-READ path —
    * [[ManifestStore.updateWhere]]'s dir-per-version twin: `mor`
    * masks the matched rows' old positions and lands their updated
    * copies as NEW files beside the byte-copied originals (no parquet
    * decode/encode of any existing file — this layout's cheapest
    * possible update); `cow` rewrites the touched files; `auto` picks
    * mor when sparse. SET may not touch the key column. Returns
    * (filesShared, filesNew, rowsUpdated). */
  def updateWhere(fromVersion: Long, toVersion: Long, pred: Column,
      set: Map[String, Column], numNewFiles: Int = 2,
      commitTs: Option[Long] = None, mode: String = "auto"): (Int, Int, Long) = {
    require(Set("auto", "cow", "mor")(mode),
      s"updateWhere mode must be auto|cow|mor, got '$mode'")
    require(set.nonEmpty, "updateWhere: empty SET")
    require(!set.contains(keyCol),
      s"updateWhere: SET may not touch the key column '$keyCol' — a key change " +
        "is a delete+insert, route it through mergeDelta")
    ensureStoreMeta()
    require(versions().contains(fromVersion), s"version $fromVersion does not exist")
    requireFreeVersion(toVersion)
    val unionSchema = evolvedSchema(fromVersion)
      .getOrElse(spark.read.parquet(dir(fromVersion)).schema)
    val missing = set.keys.filterNot(unionSchema.fieldNames.contains)
    require(missing.isEmpty, s"updateWhere: not in the schema: ${missing.mkString(", ")}")
    val allParts = fs.listStatus(new Path(dir(fromVersion))).map(_.getPath)
      .filter(_.getName.startsWith("part-")).toSeq
    val matched = maskedScanWithPos(fromVersion, allParts.map(_.toString),
        Some(unionSchema))
      .filter(coalesce(pred, lit(false))).materialize()
    val matchRows = matched.select(col("__f").as("file"), col("__p").as("pos"))
    val matching = matchRows.groupBy("file").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val conf = spark.sparkContext.hadoopConfiguration
    def sidecars(tmp: Path, dv: Option[DataFrame]): Unit = {
      dv.foreach(_.coalesce(1).write.mode("overwrite")
        .parquet(new Path(tmp, "_dv").toString))
      writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
      if (evolvedSchema(fromVersion).isDefined) {
        val out = fs.create(new Path(tmp, "_schema.json"), true)
        try out.write(unionSchema.json.getBytes("UTF-8")) finally out.close()
      }
      fs.create(new Path(tmp, "_SUCCESS"), true).close()
    }
    def applySet(df: DataFrame): DataFrame =
      set.foldLeft(df) { case (d, (c, v)) => d.withColumn(c, v) }
    if (matching.isEmpty) {
      val tmp = new Path(s"$basePath/.tmp-v=$toVersion-${java.util.UUID.randomUUID()}")
      fs.mkdirs(tmp)
      allParts.foreach { p =>
        org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, new Path(tmp, p.getName), false, conf)
      }
      sidecars(tmp, dvFrame(fromVersion))
      stageCarriedZoneMap(tmp, fromVersion, toVersion, Set.empty)
      casPublish(tmp, toVersion, "updateWhere",
        s"SET ${set.keys.toSeq.sorted.mkString(",")} WHERE ${SnapshotStore.predSql(pred)}",
        metrics = Map("numUpdatedRows" -> 0L,
          "numAddedFiles" -> 0L, "numRemovedFiles" -> 0L))
      return (allParts.length, 0, 0L)
    }
    val nMatched = matching.values.sum
    val touchedPhys = allParts.filter(p => matching.contains(p.getName)).map { p =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try r.getRecordCount finally r.close()
    }.sum
    val useMor = mode == "mor" ||
      (mode == "auto" && nMatched * 5 <= touchedPhys)
    val zm = zoneMap(fromVersion)
    val zmStatsCols = zm.map(_.columns.toSeq
      .filter(c => c.startsWith("min_") && c != "min_key").map(_.drop(4)))
      .getOrElse(Nil)
    def statsOf(newFiles: Seq[String]): Option[DataFrame] =
      zmNewStats(newFiles, zmStatsCols) // spec-evolution-aware stats
    if (useMor) {
      val updated = applySet(matched).drop("__f", "__p")
      enforceConstraints(updated, "updateWhere")
      val tmp = new Path(s"$basePath/.tmp-v=$toVersion-${java.util.UUID.randomUUID()}")
      val newNames = landFlat(
        arrange(SnapshotStore.toPhysical(updated, unionSchema), numNewFiles), tmp)
      allParts.foreach { p =>
        org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, new Path(tmp, p.getName), false, conf)
      }
      val mask = dvFrame(fromVersion).map(_.unionByName(matchRows)).getOrElse(matchRows)
        .select("file", "pos").materialize()
      sidecars(tmp, Some(mask))
      zm.foreach { z =>
        val carried = z.withColumn("file",
          regexp_replace(col("file"), s"/v=$fromVersion/", s"/v=$toVersion/"))
        val withNew = statsOf(newNames.toSeq.sorted.map(n => new Path(tmp, n).toString))
          .fold(carried)(carried.unionByName(_, allowMissingColumns = true))
        stageZoneMap(tmp, toVersion, withNew)
      }
      casPublish(tmp, toVersion, "updateWhere",
        s"SET ${set.keys.toSeq.sorted.mkString(",")} WHERE ${SnapshotStore.predSql(pred)}",
        metrics = Map("numUpdatedRows" -> nMatched,
          "numAddedFiles" -> newNames.size.toLong, "numRemovedFiles" -> 0L))
      (allParts.length, newNames.size, nMatched)
    } else {
      val (touchedParts, untouchedParts) =
        allParts.partition(p => matching.contains(p.getName))
      val touched = maskedScanWithPos(fromVersion,
        touchedParts.map(_.toString), Some(unionSchema)).drop("__f", "__p")
      val rewritten = applySet(touched.filter(coalesce(pred, lit(false))))
        .unionByName(touched.filter(!coalesce(pred, lit(false))))
      enforceConstraints(rewritten, "updateWhere")
      val tmp = new Path(s"$basePath/.tmp-v=$toVersion-${java.util.UUID.randomUUID()}")
      val newNames = landFlat(
        arrange(SnapshotStore.toPhysical(rewritten, unionSchema), numNewFiles), tmp)
      untouchedParts.foreach { p =>
        org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, new Path(tmp, p.getName), false, conf)
      }
      carryDvInto(fromVersion, tmp, untouchedParts.map(_.getName).toSet)
      writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
      if (evolvedSchema(fromVersion).isDefined) {
        val out = fs.create(new Path(tmp, "_schema.json"), true)
        try out.write(unionSchema.json.getBytes("UTF-8")) finally out.close()
      }
      zm.foreach { z =>
        val touchedNames = touchedParts.map(_.getName).toSet
        val carried = z.filter(!regexp_extract(col("file"), "[^/]+$", 0)
            .isin(touchedNames.toSeq: _*))
          .withColumn("file",
            regexp_replace(col("file"), s"/v=$fromVersion/", s"/v=$toVersion/"))
        val withNew = statsOf(newNames.toSeq.sorted.map(n => new Path(tmp, n).toString))
          .fold(carried)(carried.unionByName(_, allowMissingColumns = true))
        stageZoneMap(tmp, toVersion, withNew)
      }
      casPublish(tmp, toVersion, "updateWhere",
        s"SET ${set.keys.toSeq.sorted.mkString(",")} WHERE ${SnapshotStore.predSql(pred)}",
        metrics = Map("numUpdatedRows" -> nMatched,
          "numAddedFiles" -> newNames.size.toLong,
          "numRemovedFiles" -> touchedParts.length.toLong))
      (untouchedParts.length, newNames.size, nMatched)
    }
  }

  /** FOLD the deletion vector ([[ManifestStore.foldDv]]'s twin):
    * rewrite only the masked files, byte-copy the rest, publish with
    * no `_dv`. Returns (filesCarried, filesRewritten, rowsDropped). */
  def foldDv(fromVersion: Long, toVersion: Long, numNewFiles: Int = 2,
      commitTs: Option[Long] = None): (Int, Int, Long) = {
    requireFreeVersion(toVersion)
    val conf = spark.sparkContext.hadoopConfiguration
    val allParts = fs.listStatus(new Path(dir(fromVersion))).map(_.getPath)
      .filter(_.getName.startsWith("part-")).toSeq
    dvFrame(fromVersion) match {
      case None =>
        val tmp = new Path(s"$basePath/.tmp-v=$toVersion-${java.util.UUID.randomUUID()}")
        fs.mkdirs(tmp)
        allParts.foreach { p =>
          org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, new Path(tmp, p.getName), false, conf)
        }
        fs.create(new Path(tmp, "_SUCCESS"), true).close()
        writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
        evolvedSchema(fromVersion).foreach { sc =>
          val out = fs.create(new Path(tmp, "_schema.json"), true)
          try out.write(sc.json.getBytes("UTF-8")) finally out.close()
        }
        stageCarriedZoneMap(tmp, fromVersion, toVersion, Set.empty)
        casPublish(tmp, toVersion, "foldDv")
        (allParts.length, 0, 0L)
      case Some(dv) =>
        val masked = dv.select("file").distinct().collect().map(_.getString(0)).toSet
        val nDropped = dv.count()
        val (touched, untouched) = allParts.partition(p => masked(p.getName))
        val sc = evolvedSchema(fromVersion)
        val tmp = new Path(s"$basePath/.tmp-v=$toVersion-${java.util.UUID.randomUUID()}")
        val folded0 = maskedScanWithPos(fromVersion, touched.map(_.toString),
            sc.orElse(None)).drop("__f", "__p")
        sc.map(SnapshotStore.toPhysical(folded0, _)).getOrElse(folded0)
          .repartitionByRange(numNewFiles, col(keyCol)).sortWithinPartitions(keyCol)
          .write.mode("overwrite").parquet(tmp.toString)
        val newN = fs.listStatus(tmp).count(_.getPath.getName.startsWith("part-"))
        untouched.foreach { p =>
          org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, new Path(tmp, p.getName), false, conf)
        }
        writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
        sc.foreach { x =>
          val out = fs.create(new Path(tmp, "_schema.json"), true)
          try out.write(x.json.getBytes("UTF-8")) finally out.close()
        }
        // zone map rebuilds with one narrow stats scan over the staged
        // files (file names changed for the rewritten minority; a
        // carry+rescan hybrid buys little at fold cadence); the fold
        // leaves no DV, so the raw scan equals the semantic read
        zoneMap(fromVersion).foreach { zm =>
          val statsCols = zm.columns.toSeq
            .filter(c => c.startsWith("min_") && c != "min_key").map(_.drop(4))
          val staged = fs.listStatus(tmp).map(_.getPath)
            .filter(_.getName.startsWith("part-")).map(_.toString)
            .sorted.toIndexedSeq
          zmNewStats(staged, statsCols).foreach(stageZoneMap(tmp, toVersion, _))
        }
        casPublish(tmp, toVersion, "foldDv")
        (untouched.length, newN, nDropped)
    }
  }

  /** Stage `rows` as `tmp/_zonemap` BEFORE [[casPublish]], re-homing
    * any file path recorded under the tmp dir name to the final `v=N`
    * dir: the version and its zone map then go live in ONE rename, so
    * a crash between publish and map-write can no longer leave a live
    * partitioned version whose readers ([[requirePartitionedZm]],
    * pruning) throw until repaired. */
  private def stageZoneMap(tmp: Path, toVersion: Long, rows: DataFrame): Unit =
    rows.withColumn("file",
        regexp_replace(col("file"),
          java.util.regex.Pattern.quote(s"/${tmp.getName}/"), s"/v=$toVersion/"))
      .coalesce(1).write.mode("overwrite")
      .parquet(new Path(tmp, "_zonemap").toString)

  /** Per-file zone-map stats for NEW files still inside a
    * not-yet-published tmp dir — one narrow scan of key + stats
    * columns (the incremental half every maintenance verb pairs with
    * carried-by-reference entries). */
  private def zmNewStats(paths: Seq[String],
      statsCols0: Seq[String]): Option[DataFrame] =
    if (paths.isEmpty) None
    else {
      // partition-spec evolution: new files ALSO stat the CURRENT
      // spec's derived column (their prune axis) and stamp which spec
      // they landed under; never-evolved stores keep their exact zone
      // map schema (absent spec_id ≡ spec 0)
      val (hist, cur) = specHistory
      val statsCols =
        if (hist.size <= 1) statsCols0
        else (statsCols0 ++ storedPartitionBy().filterNot(_ == keyCol)).distinct
      val aggs = Seq(
        min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"),
        count(lit(1)).as("n_rows")) ++
        statsCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
      val df = spark.read.parquet(paths: _*)
        .select((input_file_name().as("file") +: col(keyCol) +: statsCols.map(col)): _*)
        .groupBy("file").agg(aggs.head, aggs.tail: _*)
      Some(if (hist.size <= 1) df else df.withColumn("spec_id", lit(cur)))
    }

  /** The `_partition.json` spec history + current id (see
    * [[SnapshotStore.readPartitionSpecHistory]]). */
  private def specHistory: (Seq[Seq[String]], Int) =
    SnapshotStore.readPartitionSpecHistory(fs, basePath)

  /** A zone-map row's spec id (absent column ≡ spec 0 — pre-evolution
    * files all belong to the original spec by construction). */
  private def specIdCol(zm: DataFrame): org.apache.spark.sql.Column =
    if (zm.columns.contains("spec_id")) coalesce(col("spec_id"), lit(0))
    else lit(0)

  /** EVOLVE this store's partition spec (metadata-only —
    * [[SnapshotStore.evolvePartitionSpec]]); returns the new current
    * spec id. */
  def evolvePartitionSpec(cols: Seq[String]): Int = {
    val priorDerived = specHistory._1.flatten
      .map(SnapshotStore.parsePartitionSpec)
      .filter(_.transform.isDefined).map(_.name).toSet
    cols.map(SnapshotStore.parsePartitionSpec).filter(_.transform.isDefined)
      .foreach { sp =>
        latestVersion().foreach { v =>
          require(priorDerived(sp.name) ||
              !spark.read.parquet(dir(v)).columns.contains(sp.name),
            s"evolvePartitionSpec: derived column name '${sp.name}' collides " +
              "with a data column")
        }
      }
    SnapshotStore.evolvePartitionSpec(fs, basePath, cols)
  }

  /** Post-evolution reads RECOMPUTE every historical spec's derived
    * column from its source — [[ManifestStore.recomputeDerived]]'s
    * twin (mixed-spec files physically carry different derived
    * columns; recomputation keeps diffs/compaction content-invariant).
    * No-op for never-evolved stores. */
  private def recomputeDerived(df: DataFrame): DataFrame = {
    val (hist, _) = specHistory
    if (hist.size <= 1) df
    else hist.flatten.distinct.map(SnapshotStore.parsePartitionSpec)
      .filter(sp => sp.transform.isDefined && df.columns.contains(sp.source))
      .foldLeft(df)((d, sp) => d.withColumn(sp.name, SnapshotStore.deriveColumn(sp)))
  }

  /** SOURCE-column time-range read over an EVOLVED partition spec —
    * [[ManifestStore.readSourceRange]]'s zone-map twin: every file
    * prunes through the spec IT was written under, by translating its
    * derived tuple to the covered source interval. */
  def readSourceRange(version: Long, source: String, lo: Any, hi: Any): DataFrame = {
    val (hist, _) = specHistory
    val zm = zoneMap(version).getOrElse(
      return read(version).filter(
        col(source).cast("timestamp") >= lit(lo).cast("timestamp") &&
        col(source).cast("timestamp") <= lit(hi).cast("timestamp")))
    val sid = specIdCol(zm)
    val specs = hist.map(_.map(SnapshotStore.parsePartitionSpec))
    val conds = specs.zipWithIndex.map { case (sps, id) =>
      sps.find(sp => sp.transform.isDefined && sp.source == source &&
          zm.columns.contains(s"min_${sp.name}")) match {
        case Some(sp) => sid === id && SnapshotStore.sourceRangeOverlap(sp,
          col(s"min_${sp.name}"), col(s"max_${sp.name}"), lo, hi)
        case None => sid === id // this spec cannot bound the source: keep
      }
    }
    val cond = if (conds.isEmpty) lit(true) else conds.reduce(_ || _)
    val hit = zm.filter(cond).select("file").collect().map(_.getString(0))
    val base = if (hit.isEmpty) emptyRead(version)
      else readDataFiles(version, hit.toIndexedSeq)
    base.filter(col(source).cast("timestamp") >= lit(lo).cast("timestamp") &&
      col(source).cast("timestamp") <= lit(hi).cast("timestamp"))
  }

  /** Refuse a whole-partition verb on a version holding files written
    * under an earlier spec — [[ManifestStore.requireUniformSpec]]'s
    * twin (a month predicate does not select exact day files). */
  private def requireUniformSpec(zm: DataFrame, op: String): Unit = {
    val (hist, cur) = specHistory
    if (hist.size <= 1) return
    val foreign = zm.filter(specIdCol(zm) =!= cur).limit(1).count()
    require(foreign == 0L,
      s"$op: this version still holds files written under an earlier partition " +
        s"spec (current spec id $cur) — a predicate over the current spec cannot " +
        "select them whole-file-exactly; compact/rewrite them first, or read " +
        "through readSourceRange")
  }

  /** Carry-only staging: the from-version's map rows (re-homed,
    * optionally pruned) land inside tmp pre-publish. */
  private def stageCarriedZoneMap(tmp: Path, fromVersion: Long, toVersion: Long,
      dropped: Set[String], extra: Option[DataFrame] = None): Unit =
    zoneMap(fromVersion).foreach { zm =>
      val carried = zm
        .filter(!regexp_extract(col("file"), "[^/]+$", 0).isin(dropped.toSeq: _*))
        .withColumn("file",
          regexp_replace(col("file"), s"/v=$fromVersion/", s"/v=$toVersion/"))
      stageZoneMap(tmp, toVersion, extra.fold(carried)(carried.unionByName(_, allowMissingColumns = true)))
    }

  /** RESTORE — Delta's `RESTORE TABLE t TO VERSION AS OF v` on this
    * layout: byte-copy `fromVersion`'s dir (data + `_dv` + schema
    * sidecar) as a NEW version with a fresh commit timestamp; the zone
    * map carries with its version prefix remapped. History intact —
    * a restore is a commit, not a rewrite of the past. */
  def restoreVersion(fromVersion: Long, toVersion: Long,
      commitTs: Option[Long] = None, op: String = "restoreVersion",
      opParams: String = ""): Unit = {
    require(versions().contains(fromVersion), s"version $fromVersion does not exist")
    requireFreeVersion(toVersion)
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = new Path(s"$basePath/.tmp-v=$toVersion-${java.util.UUID.randomUUID()}")
    org.apache.hadoop.fs.FileUtil.copy(fs, new Path(dir(fromVersion)), fs, tmp,
      false, conf)
    // the copy carried the SOURCE's commit ts and zone map: re-stamp
    // the restore's own commit time; re-home the zone map below
    fs.delete(new Path(tmp, "_zonemap"), true): Unit
    writeCommitTs(tmp, commitTs.getOrElse(System.currentTimeMillis()))
    stageCarriedZoneMap(tmp, fromVersion, toVersion, Set.empty)
    casPublish(tmp, toVersion, op,
      if (opParams.isEmpty) s"of v$fromVersion" else opParams,
      statsFrom = Some(fromVersion))
  }

  def diff(fromVersion: Long, toVersion: Long): DataFrame =
    diffFrames(read(fromVersion), read(toVersion))

  /** [[diff]] in Delta's CDF shape — [[ManifestStore.diffCdf]]'s
    * dir-per-version twin: an updated key emits `update_preimage`
    * (old values) and `update_postimage` (new values) rows; inserts
    * and deletes are unchanged. The pre-image re-reads the from-side
    * for the updated keys only — on this layout the diff already
    * scans both versions in full, so the extra pass is bounded by the
    * update set, not the snapshot. */
  def diffCdf(fromVersion: Long, toVersion: Long): DataFrame =
    diffCdfFrom(diff(fromVersion, toVersion), read(fromVersion))

  /** [[diffCdf]] restricted to keys in [lo, hi] — [[diffKeyRange]]'s
    * CDF-shaped sibling: the diff AND the preimage/delete-value
    * re-reads are zone-map-pruned to the range (a key in range has
    * its old row in a range-overlapping file by definition). */
  def diffCdfKeyRange(fromVersion: Long, toVersion: Long, lo: Any, hi: Any): DataFrame =
    diffCdfFrom(diffKeyRange(fromVersion, toVersion, lo, hi),
      readKeyRange(fromVersion, lo, hi))

  private def diffCdfFrom(d0: DataFrame, fromSide: DataFrame): DataFrame = {
    // the plain diff is consumed three times below (update keys,
    // delete keys, post-image rows) — materialize it once instead of
    // re-running the fingerprint full-outer join per consumer; lazy,
    // so building the frame fires no jobs until a consumer executes
    val d = d0.materialize(eager = false)
    // Delta's CDF delete rows carry the DELETED row's values (the
    // pre-image) — this layout's plain diff emits key-only deletes,
    // so the old rows re-read keys-bounded from the from-side. ONE
    // pass serves both the update pre-images and the delete rows
    // (diff keys are unique, so the inner join ≡ the two semi-joins
    // it replaces row-for-row): the from-side was scanned twice here.
    val oldKeys = d.filter(col("change_type").isin("update", "delete"))
      .select(col(keyCol), col("change_type").as("__ct"))
    val oldRows = fromSide.join(oldKeys, Seq(keyCol))
      .withColumn("change_type",
        when(col("__ct") === "update", lit("update_preimage"))
          .otherwise(lit("delete")))
      .drop("__ct")
    d.filter(col("change_type") =!= "delete")
      .withColumn("change_type",
        when(col("change_type") === "update", lit("update_postimage"))
          .otherwise(col("change_type")))
      .unionByName(oldRows, allowMissingColumns = true)
  }

  /** [[diff]] restricted to keys in [lo, hi]: both sides read through
    * the zone map ([[readKeyRange]]), so diffing one key range of a
    * 100 TB snapshot pair costs only the overlapping files on each
    * side. Semantically identical to `diff(...).filter(key in range)`
    * (spec-proven) because a key outside the range can never pair with
    * one inside it. */
  def diffKeyRange(fromVersion: Long, toVersion: Long, lo: Any, hi: Any): DataFrame =
    diffFrames(readKeyRange(fromVersion, lo, hi), readKeyRange(toVersion, lo, hi))

  private def diffFrames(from: DataFrame, to: DataFrame): DataFrame = {
    val common = (from.columns.toSet intersect to.columns.toSet - keyCol).toSeq.sorted
    val fp: DataFrame => Column = df => Fx.fastFingerprint(common.map(df(_)): _*)
    val f = from.select(col(keyCol).as("__k"), fp(from).as("__fp_from"))
    val t = to.withColumn("__fp_to", fp(to))
    val joined = t.join(f, t(keyCol) === f("__k"), "full_outer")
    joined
      .withColumn("change_type",
        when(col("__k").isNull, lit("insert"))
          .when(col(keyCol).isNull, lit("delete"))
          .when(col("__fp_to") =!= col("__fp_from"), lit("update")))
      .filter(col("change_type").isNotNull)
      .withColumn(keyCol, coalesce(col(keyCol), col("__k")))
      .drop("__k", "__fp_from", "__fp_to")
  }

  /** Column-level schema changes between two versions: columns added,
    * removed, or re-typed. Metadata-only (two parquet footers), no
    * data scan — the check a backup pipeline runs BEFORE diffing, so
    * an unexpected evolution fails fast instead of surfacing as a
    * million-row "update" storm. */
  def schemaDiff(fromVersion: Long, toVersion: Long): Seq[SnapshotStore.SchemaChange] = {
    val from = read(fromVersion).schema.map(f => f.name -> f.dataType.sql).toMap
    val to = read(toVersion).schema.map(f => f.name -> f.dataType.sql).toMap
    val added = (to.keySet -- from.keySet).toSeq.sorted
      .map(c => SnapshotStore.SchemaChange(c, "added", None, Some(to(c))))
    val removed = (from.keySet -- to.keySet).toSeq.sorted
      .map(c => SnapshotStore.SchemaChange(c, "removed", Some(from(c)), None))
    val retyped = (from.keySet intersect to.keySet).toSeq.sorted
      .filter(c => from(c) != to(c))
      .map(c => SnapshotStore.SchemaChange(c, "type_changed", Some(from(c)), Some(to(c))))
    added ++ removed ++ retyped
  }

  /** Small-file compaction: rewrite a committed version's files into
    * ~`targetBytes` outputs. Long-running incremental backup stores
    * accumulate small files (one per micro-batch / delta merge), and at
    * 100 TB the scan-planning and NameNode/listing cost of millions of
    * tiny files dominates reads — compaction is routine maintenance,
    * same as the reference's storage-level housekeeping.
    *
    * The rewrite is a narrow `coalesce` (no shuffle — adjacent input
    * partitions concatenate) published with a three-step swap: write to
    * a temp sibling, move the live dir aside, move temp in, drop the
    * old dir. A crash before the final step leaves either the original
    * version live or (worst case, between the two renames) the
    * `.old-` dir intact for manual recovery — data is never lost, and
    * `versions()` never lists a partial dir. Returns (filesBefore,
    * filesAfter); a no-op when the version is already compact. */
  def compact(version: Long, targetBytes: Long = 128L << 20): (Int, Int) = {
    val dest = new Path(dir(version))
    require(fs.exists(new Path(dest, "_SUCCESS")),
      s"compact: version $version is not a committed snapshot")
    val dataFiles = fs.listStatus(dest).filter(_.getPath.getName.startsWith("part-"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (nOut >= dataFiles.length) return (dataFiles.length, dataFiles.length)
    // remember the zone map's stat'd columns so the rebuild keeps
    // them. The recorded names are PHYSICAL; compact FOLDS any column
    // mapping (the rewrite materializes logical names), so the
    // rebuilt map stats under the logical names.
    val preSc = evolvedSchema(version)
    val zmapStatsCols = zoneMap(version).map(_.columns.toSeq
      .filter(c => c.startsWith("min_") && c != "min_key").map(_.drop(4))
      .map(p => preSc.flatMap(_.fields.find(f =>
        SnapshotStore.physicalName(f) == p)).map(_.name).getOrElse(p)))
    val tmp = new Path(s"$basePath/.tmp-compact-v=$version-${java.util.UUID.randomUUID()}")
    read(version).coalesce(nOut).write.parquet(tmp.toString)
    // compaction rewrites the layout, not the version's identity: the
    // original commit time carries over so readAsOf keeps resolving it
    writeCommitTs(tmp, commitTimestamp(version))
    // the rebuilt zone map stages with the rewritten files (the
    // compacted layout folds any DV, so the raw scan is the semantic
    // read) — the swap below then publishes data + map together
    zmapStatsCols.foreach { cols =>
      val staged = fs.listStatus(tmp).map(_.getPath)
        .filter(_.getName.startsWith("part-")).map(_.toString)
        .sorted.toIndexedSeq
      zmNewStats(staged, cols).foreach(stageZoneMap(tmp, version, _))
    }
    val old = new Path(s"$basePath/.old-v=$version-${java.util.UUID.randomUUID()}")
    if (!fs.rename(dest, old))
      throw new java.io.IOException(s"compact: move-aside failed: $dest -> $old")
    if (!fs.rename(tmp, dest)) {
      fs.rename(old, dest) // roll back to the original version
      throw new java.io.IOException(s"compact: publish failed: $tmp -> $dest")
    }
    fs.delete(old, true)
    // compact swapped this version's files in place: its checkpoint
    // row (and the successor's bytes-added diff) are stale
    invalidateHistoryCkpt()
    val after = fs.listStatus(dest).count(_.getPath.getName.startsWith("part-"))
    (dataFiles.length, after)
  }

  /** Store-level size/row report from METADATA ONLY — zone-map rows
    * (file count, row count, key envelope) plus filesystem byte sizes:
    * the capacity-planning view of a 100 TB store answered without
    * scanning a single data row. Falls back to counting files when a
    * version has no zone map (rows then report -1, honestly unknown).
    */
  def stats(version: Long): (Long, Long, Long) = {
    val dataFiles = fs.listStatus(new Path(dir(version)))
      .filter(_.getPath.getName.startsWith("part-"))
    val bytes = dataFiles.map(_.getLen).sum
    zoneMap(version) match {
      case Some(zm) =>
        val rows = zm.agg(sum(col("n_rows"))).head().getLong(0)
        (dataFiles.length.toLong, rows, bytes)
      case None => (dataFiles.length.toLong, -1L, bytes)
    }
  }

  /** Garbage-collect crash leftovers: `.tmp-` dirs (writes/merges/
    * compactions that never published) and `.old-` dirs (compact
    * move-asides whose final delete didn't run), once they are older
    * than `ttlMs` — the TTL keeps an IN-FLIGHT writer's tmp dir safe.
    * Committed `v=` dirs are never touched; this is the routine
    * maintenance that keeps a long-running store's listing cost flat.
    * Returns the deleted paths. */
  def vacuum(ttlMs: Long = 24L * 3600 * 1000): Seq[String] =
    vacuumCandidates(ttlMs).map { p => fs.delete(p, true); p.toString }

  /** [[vacuum]]'s DRY RUN: the paths a vacuum would delete right now,
    * nothing touched — what an operator checks before trusting a TTL. */
  def vacuumDryRun(ttlMs: Long = 24L * 3600 * 1000): Seq[String] =
    vacuumCandidates(ttlMs).map(_.toString)

  private def vacuumCandidates(ttlMs: Long): Seq[Path] = {
    val base = new Path(basePath)
    if (!fs.exists(base)) return Seq.empty
    val now = System.currentTimeMillis()
    fs.listStatus(base).toSeq
      .filter { st =>
        val n = st.getPath.getName
        (n.startsWith(".tmp-") || n.startsWith(".old-")) &&
          now - st.getModificationTime > ttlMs
      }
      .map(_.getPath)
  }

  /** AUTO-MAINTENANCE hook — [[ManifestStore.maybeCompact]]'s twin on
    * this layout: when the tip holds more than `maxFiles` data files,
    * fold it IN PLACE ([[compact]] — this layout's maintenance verb
    * rewrites the version dir, identity preserved). Returns the tip
    * when it ran. */
  def maybeCompact(maxFiles: Int,
      targetBytes: Long = 128L << 20): Option[Long] = {
    val vs = versions()
    if (vs.isEmpty) return None
    val tip = vs.max
    val n = dataFiles(tip).count(_.getName.startsWith("part-"))
    if (n <= maxFiles) None
    else { compact(tip, targetBytes): Unit; Some(tip) }
  }

  /** AUTO-RETENTION hook — prune to the newest `maxVersions`; the
    * streaming sink's one-version-per-micro-batch growth bound.
    * Returns versions dropped. */
  def maybeRetain(maxVersions: Int): Int = {
    require(maxVersions >= 1, s"maybeRetain: need >= 1, got $maxVersions")
    val vs = versions()
    if (vs.size <= maxVersions) 0 else prune(maxVersions).size
  }

  /** Delete all but the newest `keepLast` versions. Returns the pruned
    * version ids. */
  def prune(keepLast: Int): Seq[Long] = {
    val held = holds()
    val vs = versions()
    val toDrop = vs.dropRight(keepLast).filterNot(held.contains)
    val fs = new Path(basePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    toDrop.foreach(v => fs.delete(new Path(dir(v)), true))
    // the first SURVIVING commit now counts "whole" for bytes — its
    // checkpoint entry is stale; rebuild from truth on next read
    invalidateHistoryCkpt()
    toDrop
  }

  /** TIME-BASED retention — Delta's `RETAIN n HOURS` contract, by
    * absolute cutoff: expire every version whose commit timestamp is
    * STRICTLY OLDER than `horizonMs` (a version committed exactly AT
    * the horizon survives — the boundary an operator's "retain 7
    * days" mental model expects), except the TIP, which survives
    * regardless of age. Commit timestamps serve from the version-log
    * checkpoint — one metadata read, zero data-file opens at any
    * store size. REFUSES ([[RetentionHoldException]]) when the
    * horizon selects a held version: a time-retention contract that
    * cannot be honored must surface, not silently under-delete (the
    * count-based [[prune]] skips holds instead — an advisory policy,
    * not a compliance horizon). Returns the dropped versions. */
  def pruneOlderThan(horizonMs: Long): Seq[Long] = {
    val vs = versions()
    if (vs.isEmpty) return Seq.empty
    val ts = historyEntries().toMap
    val tip = vs.max
    val toDrop = vs.filter(v => v != tip && ts(v).commitTs < horizonMs)
    val blocked = holds().filter(toDrop.contains)
    if (blocked.nonEmpty) throw new RetentionHoldException(
      s"retention horizon $horizonMs selects held version(s) " +
        s"${blocked.mkString(", ")} on $basePath — release the hold(s) or " +
        "raise the horizon; refusing to report an un-honorable retention " +
        "contract as success")
    toDrop.foreach(v => fs.delete(new Path(dir(v)), true))
    // the first SURVIVING commit now counts "whole" for bytes — its
    // checkpoint entry is stale; rebuild from truth on next read
    if (toDrop.nonEmpty) invalidateHistoryCkpt()
    toDrop
  }

  /** Legal hold — [[ChunkStore.hold]]'s snapshot-store twin: [[prune]]
    * keeps a held version no matter what `keepLast` says, until
    * [[release]]. Retention is automation; holds are human compliance
    * decisions automation must not override. One `_holds/<version>`
    * marker file, idempotent. */
  def hold(version: Long): Unit = {
    require(versions().contains(version), s"version $version does not exist")
    val p = new Path(s"$basePath/_holds/$version")
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(Array.emptyByteArray) finally out.close()
  }

  /** Release a [[hold]]; idempotent. */
  def release(version: Long): Unit =
    fs.delete(new Path(s"$basePath/_holds/$version"), false): Unit

  /** Versions currently under a legal hold. */
  def holds(): Seq[Long] = {
    val dir0 = new Path(s"$basePath/_holds")
    if (!fs.exists(dir0)) Seq.empty
    else fs.listStatus(dir0).map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong).sorted.toSeq
  }
}
