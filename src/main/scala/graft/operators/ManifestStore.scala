package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-based versioned snapshot store — the 100 TB scale path for
  * version publication, next to [[SnapshotStore]]'s dir-per-version
  * layout.
  *
  * Motivation: SnapshotStore's `mergeDelta` is copy-on-write at the
  * FILE level but each published version is a self-contained directory
  * — untouched files are byte-copied into every new version, so a
  * daily merge of a small delta into a 100 TB snapshot still moves
  * ~100 TB and stores it again. This store publishes a version as a
  * MANIFEST (a parquet frame of file entries + stats) over an
  * immutable shared file pool, the public design of Delta Lake /
  * Iceberg version logs:
  *
  *   files/<uuid>.parquet      immutable data files, shared by versions
  *   _manifests/v=N/           parquet manifest: file, min/max key,
  *                             n_rows (+ optional per-column stats);
  *                             `_commit_ts` inside, published by rename
  *
  * `mergeDelta` then costs O(|touched files|) I/O and O(|manifest|)
  * metadata — untouched entries carry by reference — and storage is
  * shared across versions until [[prune]] + [[vacuum]] reclaim
  * unreferenced pool files by ref-count.
  *
  * Crash ordering (the ChunkStore philosophy): pool files land first,
  * the manifest rename goes live last — a crash leaves orphan pool
  * files (reclaimed by [[vacuum]]) but never a manifest naming a
  * missing file. Prune deletes manifests first; vacuum is restartable.
  */
class ManifestStore(spark: SparkSession, basePath: String, val keyCol: String,
    statsCols: Seq[String] = Nil, parityFilesPerGroup: Int = 64) {
  require(parityFilesPerGroup > 0,
    s"parityFilesPerGroup must be positive, got $parityFilesPerGroup")

  private def fs =
    new Path(basePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
  // A shallow clone records the pool OWNER's pool dir in _store.json
  // (written once by cloneTo before any publish — read once here).
  private lazy val storedPool: Option[String] =
    SnapshotStore.readStoredPool(fs, basePath)
  private def poolDir =
    storedPool.map(new Path(_)).getOrElse(new Path(s"$basePath/files"))
  private def manifestDir(v: Long) = new Path(s"$basePath/_manifests/v=$v")

  private def statAggs(cols: Seq[String]): Seq[Column] =
    Seq(min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"),
      count(lit(1)).as("n_rows")) ++
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))

  /** File-level stats frame for a set of freshly written pool files.
    * `cols` defaults to the construction statsCols (first write); the
    * version-to-version operators pass [[manifestStatsCols]] instead —
    * see its rationale. */
  private def statsFor(names: Seq[String], cols: Seq[String] = statsCols): DataFrame = {
    val paths = names.map(n => new Path(poolDir, n).toString)
    val aggs = statAggs(cols)
    val base = spark.read.parquet(paths: _*)
      .select((input_file_name().as("__f") +: col(keyCol) +: cols.map(col)): _*)
      .groupBy("__f").agg(aggs.head, aggs.tail: _*)
      // manifests store bare pool file NAMES (relocatable repository —
      // a copied/mirrored store keeps working at its new root)
      .withColumn("file", element_at(split(col("__f"), "/"), -1))
      .drop("__f")
    // partition-spec evolution: stamp WHICH spec these files landed
    // under, so pruning can consult each file's OWN spec forever.
    // Never-evolved stores keep their exact manifest schema (absent
    // column ≡ spec 0 — the only spec they have).
    val (hist, cur) = specHistory
    if (hist.size <= 1) base else base.withColumn("spec_id", lit(cur))
  }

  /** The `_partition.json` spec history + current id (see
    * [[SnapshotStore.readPartitionSpecHistory]]). */
  private def specHistory: (Seq[Seq[String]], Int) =
    SnapshotStore.readPartitionSpecHistory(fs, basePath)

  /** A manifest row's spec id: the recorded column, or 0 — every file
    * landed before evolution existed (or before this store evolved)
    * belongs to the original spec by construction. */
  private def specIdCol(man: DataFrame): Column =
    if (man.columns.contains("spec_id")) coalesce(col("spec_id"), lit(0))
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
              !readFilesRaw(v, resolve(v).take(1)).columns.contains(sp.name),
            s"evolvePartitionSpec: derived column name '${sp.name}' collides " +
              "with a data column")
        }
      }
    SnapshotStore.evolvePartitionSpec(fs, basePath, cols)
  }

  /** The stats columns an EXISTING manifest actually carries — the
    * ground truth a version-to-version rewrite (mergeDelta /
    * deleteWhere / compact) must reproduce for its new entries, or the
    * union with carried-by-reference entries breaks. Deriving from the
    * manifest (not the construction `statsCols`) makes those operators
    * correct on a store handle reconstructed WITHOUT the original
    * statsCols — the SQL catalog's DML hooks, which only know the
    * keyCol recorded in `_store.json`. */
  private def manifestStatsCols(man: DataFrame): Seq[String] = {
    val fromMan = man.columns.toSeq
      .filter(c => c.startsWith("min_") && c != "min_key").map(_.drop(4))
    // an EVOLVED store's rewrites must also stat the CURRENT spec's
    // derived column (new files prune through it) even when the
    // predecessor manifest predates the evolution
    val (hist, _) = specHistory
    if (hist.size <= 1) fromMan
    else (fromMan ++ storedPartitionBy().filterNot(_ == keyCol)).distinct
  }

  /** Write `df` into the pool and publish it as `version`. Files are
    * range-partitioned and key-sorted so key predicates prune at the
    * manifest level. */
  def write(df: DataFrame, version: Long, numFiles: Int = 4,
      commitTs: Option[Long] = None): Unit = {
    requireFreeVersion(version)
    enforceConstraints(df, "write")
    val names = landInPool(arrange(df, numFiles))
    require(names.nonEmpty, "write: empty input frame")
    publish(version, statsFor(names, effectiveStatsCols), commitTs, op = "write",
      metrics = Map("numFiles" -> names.size.toLong))
  }

  /** [[write]] with a HASH-BUCKETED layout —
    * [[SnapshotStore.writeBucketed]]'s linked twin (see there for the
    * storage-partitioned-join contract): exactly `buckets` pool files,
    * file `i` holding the rows with `pmod(murmur3(key), buckets) == i`,
    * key-sorted within, pool names carrying Spark's bucket suffix
    * (`<uuid>-b_0000i.parquet`) so the catalog's bucketed-relation gate
    * and `FileSourceScanExec` parse the id straight off the manifest's
    * file names. Later merges land unsuffixed names and the gate falls
    * back to the plain route honestly. */
  def writeBucketed(df: DataFrame, version: Long, buckets: Int,
      commitTs: Option[Long] = None): Unit = {
    require(buckets > 0, s"writeBucketed: bucket count must be positive, got $buckets")
    require(storedPartitionBy().isEmpty,
      "writeBucketed: this store declares partition columns — bucket and " +
        "partition layouts are exclusive per store")
    requireFreeVersion(version)
    ensureStoreMeta()
    SnapshotStore.writeStoredBucketBy(fs, basePath, keyCol, buckets,
      canRedeclare = versions().isEmpty)
    enforceConstraints(df, "writeBucketed")
    val tmp = new Path(s"$basePath/.tmp-pool-${java.util.UUID.randomUUID()}")
    df.repartition(buckets, col(keyCol)).sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.mkdirs(poolDir)
    val names = fs.listStatus(tmp).map(_.getPath)
      .filter(_.getName.startsWith("part-")).map { p =>
        // part-<partitionId>-... : the leading number IS the bucket id
        val b = p.getName.stripPrefix("part-").takeWhile(_.isDigit).toInt
        require(b < buckets, s"writeBucketed: task id $b >= $buckets in ${p.getName}")
        val name = f"${java.util.UUID.randomUUID().toString.take(12)}-b_$b%05d.parquet"
        if (!fs.rename(p, new Path(poolDir, name)))
          throw new java.io.IOException(s"pool rename failed for $p")
        name
      }.toSeq
    fs.delete(tmp, true)
    require(names.nonEmpty, "writeBucketed: empty input frame")
    publish(version, statsFor(names, effectiveStatsCols), commitTs,
      op = "writeBucketed", opParams = s"$buckets buckets by $keyCol",
      metrics = Map("numFiles" -> names.size.toLong))
  }

  /** First write of a PARTITIONED table — Delta/Iceberg's `PARTITIONED
    * BY (cols…)`: declares `partCols` in the `_partition.json` sidecar
    * (every later landing on this store clusters by them), lands the
    * frame one-partition-tuple-per-file (≤ `filesPerPartition` files
    * each, key-sorted within), and records the tuple in the manifest
    * as exact per-file min==max stats. Partition predicates then prune
    * EXACTLY at the manifest level, [[dropPartitions]] is
    * metadata-only, and [[replaceWhere]] carries untouched partitions
    * by reference. Partition values should be non-null (a null groups
    * under a null tuple — it prunes conservatively but reads as an odd
    * partition); the key column cannot be a partition column (its
    * envelope is the manifest's primary prune axis already). */
  def writePartitioned(df: DataFrame, version: Long, partCols: Seq[String],
      filesPerPartition: Int = 1, commitTs: Option[Long] = None): Unit = {
    requireFreeVersion(version)
    require(partCols.nonEmpty, "writePartitioned: no partition columns")
    require(!partCols.contains(keyCol),
      s"writePartitioned: '$keyCol' is the store key — key-range pruning already " +
        "covers it; partition on a coarser dimension")
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
    val names = landInPool(arrange(df, filesPerPartition))
    require(names.nonEmpty, "writePartitioned: empty input frame")
    publish(version, statsFor(names, effectiveStatsCols), commitTs,
      op = "writePartitioned")
  }

  /** Every manifest row's partition tuple as plain value columns
    * (min==max per the layout invariant, asserted) plus the rest of
    * the entry — the shared base for the partition verbs. */
  private def partitionEntries(man: DataFrame, pcs: Seq[String]): DataFrame = {
    val absent = pcs.filterNot(c => man.columns.contains(s"min_$c"))
    require(absent.isEmpty,
      s"version records no stats for partition column(s) ${absent.mkString(", ")} — " +
        "it predates the CURRENT partition spec; compact to rewrite under it, " +
        "or read through readSourceRange")
    val straddlers = man.filter(
        pcs.map(c => !(col(s"min_$c") <=> col(s"max_$c"))).reduce(_ || _))
      .limit(1).count()
    require(straddlers == 0L,
      "partitioned-store invariant violated: a manifest file spans more than one " +
        "partition tuple (was data landed outside the store's own write paths?)")
    man.select(man.columns.map(col) ++ pcs.map(c => col(s"min_$c").as(c)): _*)
  }

  private def requirePartitioned(op: String): Seq[String] = {
    val pcs = storedPartitionBy()
    require(pcs.nonEmpty,
      s"$op needs a partitioned store — declare partition columns with writePartitioned")
    pcs
  }

  /** SHOW PARTITIONS, metadata-only: one row per partition tuple with
    * its file and physical row counts, straight off the manifest — no
    * data file opens. (Row counts are physical: a deletion vector's
    * masked rows still count until [[foldDv]]/[[compact]] folds them.) */
  def partitions(version: Long): DataFrame = {
    val pcs = requirePartitioned("partitions")
    requireUniformSpec(manifest(version), "partitions")
    partitionEntries(manifest(version), pcs)
      .groupBy(pcs.map(col): _*)
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("n_rows"))
  }

  /** DYNAMIC PARTITION OVERWRITE — Delta's `replaceWhere` / classic
    * `INSERT OVERWRITE ... PARTITION`: every partition tuple PRESENT in
    * `data` is replaced wholesale by `data`'s rows for it; untouched
    * partitions carry by manifest REFERENCE (zero I/O). The idempotent
    * backfill verb: re-running a day's pipeline overwrites that day
    * and nothing else. Schema must match the table (an overwrite is
    * not a schema-evolution verb). Returns (filesCarried,
    * filesReplaced, filesNew). */
  def replaceWhere(fromVersion: Long, toVersion: Long, data: DataFrame,
      filesPerPartition: Int = 1, commitTs: Option[Long] = None): (Int, Int, Int) = {
    val pcs = requirePartitioned("replaceWhere")
    requireFreeVersion(toVersion)
    val man = manifest(fromVersion).materialize()
    requireUniformSpec(man, "replaceWhere")
    enforceConstraints(data, "replaceWhere")
    val data2 = deriveParts(data)
    val touched = data2.select(pcs.map(col): _*).distinct().materialize()
    // NULL-SAFE anti-join (<=>): a null partition tuple in `data` must
    // replace the existing null-tuple files like any other value — a
    // plain column-list join never matches nulls, which would KEEP the
    // old null-partition files AND land the new rows (duplication)
    val pe = partitionEntries(man, pcs)
    val sharedFiles = pe.join(touched,
        pcs.map(c => pe(c) <=> touched(c)).reduce(_ && _), "left_anti")
      .select("file")
    val shared = man.join(sharedFiles, Seq("file"), "left_semi").materialize()
    val stats = landWithStats(arrange(data2, filesPerPartition),
      manifestStatsCols(man), evolvedSchema(fromVersion))
    publish(toVersion, stats.fold(shared)(shared.unionByName(_, allowMissingColumns = true)), commitTs,
      evolvedSchema(fromVersion), dv = carryDv(fromVersion, shared),
      op = "replaceWhere")
    val nShared = shared.count().toInt
    (nShared, man.count().toInt - nShared, stats.fold(0L)(_.count()).toInt)
  }

  /** METADATA-ONLY partition drop — the retention verb a date-
    * partitioned 100 TB lake runs nightly ("drop everything older than
    * 90 days"): entries whose partition tuple satisfies `pred` (a
    * Column over the partition column names) leave the manifest; NOT
    * ONE DATA BYTE moves, regardless of table size — the layout's
    * one-tuple-per-file invariant makes the file set of a partition
    * exact. Bytes reclaim later via ref-count [[vacuum]]. Null
    * predicate rows are kept ([[deleteWhere]]'s rule). Returns
    * (filesCarried, filesDropped, physicalRowsDropped). */
  def dropPartitions(fromVersion: Long, toVersion: Long, pred: Column,
      commitTs: Option[Long] = None): (Int, Int, Long) = {
    val pcs = requirePartitioned("dropPartitions")
    requireFreeVersion(toVersion)
    val man = manifest(fromVersion).materialize()
    requireUniformSpec(man, "dropPartitions")
    val dropped = partitionEntries(man, pcs)
      .filter(coalesce(pred, lit(false)))
      .select(col("file"), col("n_rows")).materialize()
    val shared = man.join(dropped, Seq("file"), "left_anti").materialize()
    val rowsDropped = dropped.agg(coalesce(sum("n_rows"), lit(0L))).head().getLong(0)
    // dropping every partition legitimately empties the table: record
    // the schema sidecar so the zero-file version still plans
    val schema =
      if (shared.limit(1).count() == 0L)
        evolvedSchema(fromVersion).orElse(
          Some(readFilesRaw(fromVersion, resolve(fromVersion).take(1)).schema))
      else evolvedSchema(fromVersion)
    publish(toVersion, shared, commitTs, schema, dv = carryDv(fromVersion, shared),
      op = "dropPartitions", opParams = SnapshotStore.predSql(pred))
    (shared.count().toInt, dropped.count().toInt, rowsDropped)
  }

  /** Publish `version` as an EMPTY table of `schema` — zero pool
    * files, a zero-row manifest (schema-carrying parquet: the forced
    * single write task emits a footer-only file), and the schema
    * sidecar that lets every reader (store API and SQL catalog) plan
    * an empty scan. This is SQL `CREATE TABLE`'s landing: the first
    * `mergeDelta` (INSERT/CTAS) then rewrites nothing and lands the
    * initial rows as version+1. The declared schema must carry the
    * store's key column — every later operation keys on it. */
  def createEmpty(schema: org.apache.spark.sql.types.StructType, version: Long = 1L,
      commitTs: Option[Long] = None): Unit = {
    requireFreeVersion(version)
    require(schema.fieldNames.contains(keyCol),
      s"createEmpty: declared schema ${schema.fieldNames.mkString("(", ",", ")")} " +
        s"lacks the store key column '$keyCol'")
    val keyType = schema(keyCol).dataType
    val manSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("min_key", keyType),
      org.apache.spark.sql.types.StructField("max_key", keyType),
      org.apache.spark.sql.types.StructField("n_rows",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("file",
        org.apache.spark.sql.types.StringType)) ++
      // a PARTITIONED empty table (CREATE TABLE ... PARTITIONED BY
      // lands the _partition.json before this) declares the partition
      // stats columns up front, so the first INSERT's mergeDelta
      // records them (it derives stats from the existing manifest)
      effectiveStatsCols.flatMap { c =>
        // a temporal transform's DERIVED column is not in the declared
        // schema — days/months/years land as DATE, hours as TIMESTAMP
        val dt =
          if (schema.fieldNames.contains(c)) schema(c).dataType
          else storedPartitionSpecs().find(_.name == c).map(_.transform match {
            case Some("hours") => org.apache.spark.sql.types.TimestampType: org.apache.spark.sql.types.DataType
            case _ => org.apache.spark.sql.types.DateType: org.apache.spark.sql.types.DataType
          }).getOrElse(org.apache.spark.sql.types.DateType)
        Seq(
          org.apache.spark.sql.types.StructField(s"min_$c", dt),
          org.apache.spark.sql.types.StructField(s"max_$c", dt))
      })
    publish(version,
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        manSchema),
      commitTs, Some(schema), op = "createEmpty")
  }

  /** Land rewritten rows in the pool and return their manifest stats.
    * A part file carrying ZERO rows (the write artifact of an
    * all-delete rewrite) never enters the manifest — its stats row
    * doesn't exist (the groupBy sees no rows), so referencing it
    * would dangle — and is deleted on the spot. None when nothing
    * with rows landed. */
  private def landWithStats(df: DataFrame,
      cols: Seq[String] = statsCols,
      sc: Option[org.apache.spark.sql.types.StructType] = None): Option[DataFrame] = {
    // on a column-mapped store, new files land under PHYSICAL names so
    // the version's file set stays name-uniform with the carried files
    val names = landInPool(sc.map(SnapshotStore.toPhysical(df, _)).getOrElse(df))
    if (names.isEmpty) None
    else {
      val stats = statsFor(names, cols).materialize()
      val live = stats.select("file").collect().map(_.getString(0)).toSet
      names.filterNot(live).foreach(n => fs.delete(new Path(poolDir, n), false))
      if (live.isEmpty) None else Some(stats)
    }
  }

  /** Write a frame's part-files into the shared pool under fresh
    * unique names; returns the pool names.
    *
    * On a PARTITIONED store ([[writePartitioned]]) the frame lands
    * hive-style on DUPLICATED `__gp_<col>` directory columns — the
    * originals stay IN the data files (pool files remain
    * self-contained: stats scans, compaction, diff, validate all read
    * them standalone) while the writer splits on the copies, so every
    * pool file holds exactly ONE partition tuple. The manifest then
    * records min==max for each partition column and partition
    * predicates prune EXACTLY; the pool itself stays flat (relocatable
    * bare names, no directory coupling). */
  private def landInPool(df0: DataFrame): Seq[String] = {
    val tmp = new Path(s"$basePath/.tmp-pool-${java.util.UUID.randomUUID()}")
    val pcs = storedPartitionBy()
    if (pcs.isEmpty) df0.write.mode("overwrite").parquet(tmp.toString)
    else {
      val df = deriveParts(df0)
      val dup = pcs.foldLeft(df)((d, c) => d.withColumn(s"__gp_$c", col(c)))
      dup.write.mode("overwrite")
        .partitionBy(pcs.map("__gp_" + _): _*).parquet(tmp.toString)
    }
    fs.mkdirs(poolDir)
    // recursive walk: hive landing nests part files one dir per
    // partition tuple; the flat landing has them at the root
    val it = fs.listFiles(tmp, true)
    val parts = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next().getPath)
      .filter(_.getName.startsWith("part-")).toIndexedSeq
    val names = parts.map { p =>
      val name = s"${java.util.UUID.randomUUID().toString.take(12)}-${p.getName.take(10)}.parquet"
      if (!fs.rename(p, new Path(poolDir, name)))
        throw new java.io.IOException(s"pool rename failed for $p")
      name
    }
    fs.delete(tmp, true)
    names
  }

  /** Declared partition COLUMN NAMES — for a temporal transform spec
    * (`days(ts)` / `months(ts)`) this is the DERIVED identity column
    * every landing materializes (see [[SnapshotStore.PartSpec]]).
    * Empty on an unpartitioned store. */
  def storedPartitionBy(): Seq[String] = storedPartitionSpecs().map(_.name)

  /** The raw PARTITIONED BY declaration as recorded in the sidecar. */
  def storedPartitionSpecs(): Seq[SnapshotStore.PartSpec] =
    SnapshotStore.readStoredPartitionBy(fs, basePath)
      .map(SnapshotStore.parsePartitionSpec)

  private def deriveParts(df: DataFrame): DataFrame =
    SnapshotStore.derivePartitionCols(df, storedPartitionSpecs())

  /** Declared CHECK constraints / ADD / DROP / enforcement — the
    * linked twins of [[SnapshotStore]]'s (same `_constraints.json`
    * sidecar contract; see there for semantics: FALSE violates, NULL
    * passes, write-time only). */
  def constraints(): Seq[(String, String)] =
    SnapshotStore.readConstraints(fs, basePath)

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

  private def enforceConstraints(df: DataFrame, what: String): Unit =
    constraints().foreach { case (n, e) =>
      val hit = df.filter(coalesce(expr(e), lit(true)) === lit(false))
        .select(to_json(struct(df.columns.map(col): _*)).as("row"))
        .limit(1).collect()
      if (hit.nonEmpty) throw new ConstraintViolationException(
        s"CHECK constraint '$n' (($e)) rejected $what: ${hit.head.getString(0)}")
    }

  private def requireNoConstraintOn(colName: String, op: String): Unit =
    constraints().find(c =>
        ("""\b""" + java.util.regex.Pattern.quote(colName) + """\b""").r
          .findFirstIn(c._2).isDefined)
      .foreach { case (n, e) => throw new UnsupportedOperationException(
        s"$op '$colName': CHECK constraint '$n' (($e)) references it — " +
          s"drop the constraint first") }

  /** Physical arrangement every landing goes through. Unpartitioned:
    * key-range files, key-sorted (manifest key envelopes disjoint —
    * perfect key pruning). Partitioned: cluster by partition tuple
    * plus a key-hash salt bounding files per partition at `numFiles`,
    * key-sorted within — [[landInPool]]'s hive split then keeps the
    * one-tuple-per-file invariant that version-to-version rewrites
    * (mergeDelta, deleteWhere CoW, compact, foldDv) must preserve for
    * [[dropPartitions]] to stay metadata-only. */
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

  /** Stats columns a FIRST write records: the construction `statsCols`
    * plus every declared partition column (partition pruning rides the
    * same manifest min/max machinery — min==max per file by the
    * [[arrange]]+[[landInPool]] invariant). */
  private def effectiveStatsCols: Seq[String] =
    statsCols ++ storedPartitionBy().filterNot(c => c == keyCol || statsCols.contains(c))

  /** Publish a manifest frame as `version`: parquet to a tmp dir,
    * commit-ts (and, for evolved versions, the union schema) sidecar
    * inside, ONE rename goes live — a version can never exist without
    * the metadata that makes its mixed-schema files readable. */
  private def publish(version: Long, manifest: DataFrame, commitTs: Option[Long],
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      dv: Option[DataFrame] = None, op: String = "unknown",
      opParams: String = "", statsFrom: Option[Long] = None,
      metrics: Map[String, Long] = Map.empty): Unit = {
    ensureStoreMeta()
    val tmp = new Path(s"$basePath/.tmp-man-${java.util.UUID.randomUUID()}")
    manifest.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    // the deletion vector publishes atomically WITH the version — a
    // version dir can never exist whose mask is missing or stale
    dv.foreach(_.select(col("file"), col("pos")).coalesce(1)
      .write.mode("overwrite").parquet(new Path(tmp, "_dv").toString))
    val out = fs.create(new Path(tmp, "_commit_ts"), true)
    try out.write(commitTs.getOrElse(System.currentTimeMillis()).toString.getBytes("UTF-8"))
    finally out.close()
    schema.foreach { sc =>
      val o = fs.create(new Path(tmp, "_schema.json"), true)
      try o.write(sc.json.getBytes("UTF-8")) finally o.close()
    }
    // the commit's verb rides inside the manifest dir (atomic with the
    // version) — DESCRIBE HISTORY's operation column, self-heal-safe
    SnapshotStore.writeOpSidecar(fs, tmp, op, opParams, metrics)
    fs.mkdirs(new Path(s"$basePath/_manifests"))
    // CAS publication (CommitProtocol): a concurrent writer racing the
    // same version loses with a clean VersionConflictException — never
    // an undefined rename-onto-existing outcome
    val token = CommitProtocol.writeToken(fs, tmp)
    CommitProtocol.publish(fs, tmp, manifestDir(version), token,
      s"publish of v$version on $basePath")
    noteCommit(version, op, opParams, statsFrom, metrics)
  }

  /** Persist the construction contract (key column) in `_store.json`
    * at the base — [[SnapshotStore.ensureStoreMeta]]'s linked twin,
    * consumed by SnapshotCatalog's SQL `DELETE FROM`. Idempotent. */
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

  /** ZERO-COPY BRANCH — the Iceberg/Delta "shallow clone" primitive:
    * publish `newVersion` with the SAME manifest rows (and evolved
    * schema, if any) as `fromVersion` — not one pool byte moves, the
    * branch costs one manifest copy regardless of table size.
    * Because versions are immutable and the pool is shared, merges on
    * top of the branch diverge freely from merges on top of the
    * source (dev-branch-of-prod), `diff` works across the fork, and
    * ref-count vacuum keeps every pool file either side still
    * references. */
  def branch(fromVersion: Long, newVersion: Long,
      commitTs: Option[Long] = None, op: String = "branch"): Unit = {
    requireFreeVersion(newVersion)
    publish(newVersion, manifest(fromVersion).materialize(), commitTs,
      evolvedSchema(fromVersion), dv = dvFrame(fromVersion),
      op = op, opParams = s"of v$fromVersion", statsFrom = Some(fromVersion))
  }

  /** True when this store OWNS its pool dir — false on a shallow
    * clone reading a foreign pool. Pool reclamation ([[vacuum]],
    * [[orphans]]) must run on the owner. */
  def isPoolOwner: Boolean = storedPool.isEmpty

  /** The base path of the store that owns this store's pool: itself
    * when owner, the pool override's parent when a clone. */
  def poolOwnerBase: String =
    storedPool.map(p => new Path(p).getParent.toString).getOrElse(basePath)

  /** SHALLOW CLONE to a NEW table at `dstBase` — Delta's `CREATE TABLE
    * ... SHALLOW CLONE`, this layout's way: the clone's version 1 is
    * the source version's manifest rows VERBATIM over the SAME shared
    * pool (the clone's `_store.json` records the owner's pool dir), so
    * cloning a 100 TB table moves ZERO data bytes and costs one
    * manifest copy. Merges then diverge freely on either side — both
    * write fresh uniquely-named files into the shared pool. Unlike
    * Delta, where VACUUM on the source silently breaks its shallow
    * clones, the clone REGISTERS with the pool owner (`_clones.json`;
    * registration lands BEFORE the clone's first manifest, so a crash
    * can only leave a harmless extra registration, never an
    * unregistered clone vacuum would miss) and the owner's
    * [[vacuum]]/[[orphans]] honor every registered clone's references;
    * the clone's own vacuum refuses — the pool is not its to reclaim.
    * A clone of a clone re-registers with the ORIGINAL owner. A
    * dropped clone (base dir deleted) simply stops contributing
    * references — no deregistration step is needed for safety. */
  def cloneTo(dstBase: String, fromVersion: Long,
      commitTs: Option[Long] = None): ManifestStore = {
    require(keyCol.nonEmpty, "cloneTo needs the source's key column")
    require(versions().contains(fromVersion), s"version $fromVersion does not exist")
    val dfs = new Path(dstBase).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!dfs.exists(new Path(dstBase, "_manifests")),
      s"clone target $dstBase already has versions")
    registerClone(poolOwnerBase, dstBase)
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    dfs.mkdirs(new Path(dstBase))
    val pool = new Path(poolOwnerBase, "files").toString
    val out = dfs.create(new Path(dstBase, "_store.json"), true)
    try out.write(
      s"""{"keyCol": "${esc(keyCol)}", "pool": "${esc(pool)}"}""".getBytes("UTF-8"))
    finally out.close()
    val dst = new ManifestStore(spark, dstBase, keyCol, statsCols, parityFilesPerGroup)
    dst.publish(1L, manifest(fromVersion).materialize(), commitTs,
      evolvedSchema(fromVersion), dv = dvFrame(fromVersion),
      op = "clone", opParams = s"from $basePath v$fromVersion")
    dst
  }

  private def clonesPath(base: String) = ManifestStore.clonesPath(base)
  private def clonesAside(base: String) = ManifestStore.clonesAside(base)

  /** Clone bases registered with the pool owner at `base` — the set
    * whose manifests [[vacuum]] must honor. */
  private def registeredClones(base: String): Seq[String] =
    ManifestStore.registeredClonesAt(fs, base)

  /** Repair the owner's registry after THIS CLONE's base dir moved
    * (the catalog's `ALTER TABLE ... RENAME TO`): replace `oldBase`
    * with the current base. Without this, a renamed clone silently
    * detaches — its references stop counting and the owner's next
    * vacuum can reclaim pool files the clone still needs. No-op on a
    * pool owner or when the owner's base is gone. */
  def relocatedFrom(oldBase: String): Unit = storedPool.foreach { _ =>
    val owner = poolOwnerBase
    if (fs.exists(new Path(owner))) {
      val kept = registeredClones(owner).filterNot(_ == oldBase)
      writeCloneRegistry(owner, (kept :+ basePath).distinct)
    }
  }

  /** Append `cloneBase` to the owner's registry: write-aside-rename —
    * the previous registry parks as the aside until the new one is
    * live, so no crash point loses registered references. */
  private def registerClone(ownerBase: String, cloneBase: String): Unit =
    writeCloneRegistry(ownerBase, (registeredClones(ownerBase) :+ cloneBase).distinct)

  private def writeCloneRegistry(ownerBase: String, all: Seq[String]): Unit = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val body = s"""{"clones": [${all.map(b => "\"" + esc(b) + "\"").mkString(", ")}]}"""
    val tmp = new Path(ownerBase, s".tmp-clones-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (fs.exists(clonesAside(ownerBase))) fs.delete(clonesAside(ownerBase), false)
    if (fs.exists(clonesPath(ownerBase))
        && !fs.rename(clonesPath(ownerBase), clonesAside(ownerBase)))
      throw new java.io.IOException(s"clone registry aside failed at $ownerBase")
    if (!fs.rename(tmp, clonesPath(ownerBase)))
      throw new java.io.IOException(s"clone registration failed at $ownerBase")
    fs.delete(clonesAside(ownerBase), false): Unit
  }

  /** Schema-evolution DROP COLUMN, this layout's way: ZERO data I/O.
    * `toVersion` carries the SAME manifest rows (every pool file by
    * reference — the branch() economics) with any dropped stats
    * column's min/max pruned, plus a `_schema.json` sidecar that
    * EXCLUDES `cols`; the evolved-schema reader then projects only
    * recorded fields, so stored bytes for the dropped column are
    * never read while pinned history keeps them. The key column is
    * the store's identity and cannot drop. */
  def dropColumns(fromVersion: Long, toVersion: Long, cols: Seq[String],
      commitTs: Option[Long] = None): Unit = {
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
    // the sidecar verbatim when present, so surviving columns keep
    // their recorded fill metadata through the narrowing
    val cur = evolvedSchema(fromVersion).getOrElse(read(fromVersion).schema)
    val missing = cols.filterNot(cur.fieldNames.contains)
    require(missing.isEmpty, s"dropColumns: not in the schema: ${missing.mkString(", ")}")
    require(cur.fields.length > cols.size, "dropColumns: cannot drop every column")
    val newSchema = org.apache.spark.sql.types.StructType(
      cur.fields.filterNot(f => cols.contains(f.name)))
    val man = manifest(fromVersion)
    val keep = man.columns.toSeq.filterNot(c =>
      cols.exists(dc => c == s"min_$dc" || c == s"max_$dc"))
    publish(toVersion, man.select(keep.map(col): _*).materialize(),
      commitTs, Some(newSchema), dv = dvFrame(fromVersion),
      op = "dropColumns", opParams = cols.mkString(","),
      statsFrom = Some(fromVersion))
  }

  /** METADATA-ONLY TYPE WIDENING — Delta's type-widening feature:
    * publish `toVersion` whose `_schema.json` re-types `column` to the
    * WIDER `newType` ([[SnapshotStore.canWiden]] — integral chain,
    * float→double, integral→decimal); the manifest carries VERBATIM
    * (zero pool writes) and every read decodes the stored narrow
    * physical values into the wider logical type (parquet's
    * vectorized-reader promotion — spec-verified). Pinned history
    * keeps the narrow type. The key column is the stats-typed store
    * identity and refuses; partition columns refuse (their min==max
    * stats are typed in the manifest); a NON-widening change keeps
    * refusing (it would corrupt old files' meaning). */
  def widenColumn(fromVersion: Long, toVersion: Long, column: String,
      newType: org.apache.spark.sql.types.DataType,
      commitTs: Option[Long] = None): Unit = {
    require(versions().contains(fromVersion), s"version $fromVersion does not exist")
    requireFreeVersion(toVersion)
    require(column != keyCol,
      s"widenColumn: '$keyCol' is the store's key column — its manifest envelope " +
        "stats are typed; widening the identity is a store-level migration")
    require(!storedPartitionBy().contains(column)
        && !storedPartitionSpecs().exists(_.source == column),
      s"widenColumn '$column': it is a declared partition column (or a " +
        "transform's source) — its min==max stats are typed in the manifest")
    val cur = evolvedSchema(fromVersion).getOrElse(read(fromVersion).schema)
    val f = cur.fields.find(_.name == column).getOrElse(
      throw new IllegalArgumentException(s"widenColumn: no column '$column'"))
    require(SnapshotStore.canWiden(f.dataType, newType),
      s"widenColumn: ${f.dataType.simpleString} -> ${newType.simpleString} is not " +
        "a supported widening (integral chain, float->double, integral->decimal) " +
        "— any other type change would corrupt old files' meaning")
    val newSchema = org.apache.spark.sql.types.StructType(
      cur.fields.map(x => if (x.name == column) x.copy(dataType = newType) else x))
    publish(toVersion, manifest(fromVersion).materialize(), commitTs,
      Some(newSchema), dv = dvFrame(fromVersion), op = "widenColumn",
      opParams = s"$column -> ${newType.simpleString}",
      statsFrom = Some(fromVersion))
  }

  /** METADATA-ONLY RENAME COLUMN — Delta's column-mapping mode on the
    * `_schema.json` sidecar: the published schema renames the field
    * while `graft.physical` metadata pins the name the pool bytes
    * answer to; every read resolves physical → logical with a
    * zero-cost alias projection, later merges LAND new files under
    * the physical name (one name-uniform file set), and a full
    * rewrite (compact / plain write) folds the mapping away — exactly
    * how a DV mask folds. NOT ONE POOL BYTE moves here: the manifest
    * carries VERBATIM (its min/max stats keep describing the stored,
    * physical columns). Pinned history keeps the old name. The key
    * column is recorded store identity and cannot rename; constrained
    * and partition columns refuse (their declarations name the
    * column); the new name must not shadow a stored physical name
    * (old bytes would answer to two logical columns). */
  def renameColumn(fromVersion: Long, toVersion: Long, from: String, to: String,
      numFiles: Int = 4, commitTs: Option[Long] = None): Unit = {
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
    val cur = evolvedSchema(fromVersion).getOrElse(read(fromVersion).schema)
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
    publish(toVersion, manifest(fromVersion).materialize(), commitTs,
      Some(newSchema), dv = dvFrame(fromVersion), op = "renameColumn",
      opParams = s"$from -> $to", statsFrom = Some(fromVersion))
  }

  /** Commit history — the `DESCRIBE HISTORY` surface: one row per
    * version with its commit timestamp and manifest-recorded file/row
    * totals. Metadata-only (manifests, no pool reads); |versions|
    * rows. */
  def history(): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    historyEntries().map { case (v, e) =>
        (v, e.commitTs, e.nFiles, e.nRows, e.op, e.opParams, e.metrics) }
      .toDF("version", "commit_ts", "n_files", "n_rows",
        "operation", "operation_params", "operation_metrics")
  }

  /** Per-version (version, bytes_added, n_rows, operation) ascending —
    * [[SnapshotStore.commitStats]]'s linked twin, ONE checkpoint read. */
  def commitStats(): Seq[(Long, Long, Long, String)] =
    historyEntries().map { case (v, e) => (v, e.bytes, e.nRows, e.op) }

  /** One version's checkpoint row rebuilt from its manifest — the
    * self-heal / publish-time unit (see [[SnapshotStore]]'s
    * version-log checkpoint notes; the manifest is metadata-sized, so
    * the agg is one tiny single-file job). */
  private def computeHistoryEntry(v: Long): SnapshotStore.HistoryEntry = {
    // coalesce: an empty version ([[createEmpty]], all-row delete)
    // sums a zero-row manifest — 0 rows, not a null
    val m = manifest(v).agg(count(lit(1)).as("f"),
      coalesce(sum(col("n_rows")), lit(0L)).as("r")).head()
    val (op, params, metrics) = SnapshotStore.readOpSidecar(fs, manifestDir(v))
    SnapshotStore.HistoryEntry(commitTsOf(v), m.getLong(0), m.getLong(1),
      commitBytesRaw(v), op, params, metrics)
  }

  /** The VERSION-LOG CHECKPOINT, served and self-healed —
    * [[SnapshotStore.historyEntries]]'s linked twin: warm path = ONE
    * `_history.json` read; missing entries rebuild from manifests. */
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

  private def noteCommit(v: Long, op: String = "unknown",
      opParams: String = "", statsFrom: Option[Long] = None,
      metrics: Map[String, Long] = Map.empty): Unit =
    try {
      val ckpt = SnapshotStore.readHistoryCkpt(fs, basePath)
      // metadata-only commits (rename/widen/branch/restore — manifest
      // carried verbatim) reuse the predecessor's checkpoint stats:
      // no manifest agg job, bytes_added = 0 (no new pool basenames)
      val entry = statsFrom.flatMap(ckpt.get) match {
        case Some(prev) => prev.copy(commitTs = commitTsOf(v),
          bytes = 0L, op = op, opParams = opParams, metrics = metrics)
        case None => computeHistoryEntry(v)
      }
      SnapshotStore.writeHistoryCkpt(fs, basePath, ckpt + (v -> entry))
    } catch { case scala.util.control.NonFatal(_) => () }

  private def invalidateHistoryCkpt(): Unit =
    try fs.delete(new Path(basePath, "_history.json"), false): Unit
    catch { case scala.util.control.NonFatal(_) => () }

  /** Union schema of an evolved version (column adds ride a
    * `_schema.json` sidecar published atomically with the manifest;
    * absent for never-evolved versions). */
  def evolvedSchema(version: Long): Option[org.apache.spark.sql.types.StructType] = {
    val p = new Path(manifestDir(version), "_schema.json")
    if (!fs.exists(p)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try in.readFully(buf) finally in.close()
      Some(org.apache.spark.sql.types.DataType.fromJson(new String(buf, "UTF-8"))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    }
  }

  /** Read a file subset under `version`'s schema contract: evolved
    * versions read with the union schema (old files yield null for
    * columns they predate). */
  /** Physical read — every stored row, INCLUDING rows the version's
    * deletion vector marks deleted. Integrity audits ([[validate]])
    * check file physics, so they read here; everything semantic goes
    * through [[readFiles]]. */
  private def readFilesRaw(version: Long, paths: Seq[String]): DataFrame =
    evolvedSchema(version) match {
      case Some(sc) =>
        // fills recorded by an evolving mergeDelta apply uniformly at
        // read time (SnapshotStore.applyFills' contract): shared files
        // that predate the column read the default, not null. The scan
        // asks for PHYSICAL names (what the bytes answer to under a
        // metadata-only rename) and projects to logical — the
        // column-mapping read contract, a zero-cost alias projection.
        val fills = SnapshotStore.fillValues(sc)
        val df = SnapshotStore.toLogical(
          spark.read.schema(SnapshotStore.physicalSchema(sc)).parquet(paths: _*), sc)
        if (fills.isEmpty) df else df.na.fill(fills)
      case None => spark.read.parquet(paths: _*)
    }

  private def dvDir(v: Long) = new Path(manifestDir(v), "_dv")

  /** The version's DELETION VECTOR, when a merge-on-read delete
    * published one: (file basename, row position) pairs masked out of
    * every semantic read — Delta/Iceberg's deletion-vector design at
    * parquet row-index granularity. Lives INSIDE the manifest dir, so
    * it publishes atomically with the version and prunes with it. */
  def dvFrame(version: Long): Option[DataFrame] = {
    val p = dvDir(version)
    if (!fs.exists(new Path(p, "_SUCCESS"))) None
    else Some(spark.read.parquet(p.toString))
  }

  /** Rows `version` SERVES after its mask — [[SnapshotStore
    * .visibleRowsOf]]'s linked twin, the `sizeInBytes` planning
    * statistic for the masked SQL route. Checkpoint row total minus
    * DV footer record counts; metadata-only, no job. */
  def visibleRowsOf(version: Long): Long =
    math.max(0L, rowCountOf(version) - dvRowCount(version))

  /** Stored (pre-mask) row total, checkpoint-served. */
  def rowCountOf(version: Long): Long =
    historyEntries().find(_._1 == version).map(_._2.nRows).getOrElse(0L)

  /** Mask entry count from the DV parquet footers — driver-side, one
    * footer open per DV part file (the DV lands coalesce(1)). */
  def dvRowCount(version: Long): Long = {
    val p = dvDir(version)
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

  /** Semantic read: physical rows minus the deletion vector. The DV
    * is kept metadata-sized by [[deleteWhere]]'s auto policy, so the
    * mask is one BROADCAST anti-join on (file, row position) — no
    * shuffle lands on the data path, and a version without a DV pays
    * nothing. Positions come from the parquet reader's own
    * `_metadata.row_index`, which is stable because pool files are
    * immutable. */
  private def readFiles(version: Long, paths: Seq[String]): DataFrame =
    recomputeDerived(dvFrame(version) match {
      case None => readFilesRaw(version, paths)
      case Some(dv) =>
        val sc = evolvedSchema(version)
        val raw = sc.map(x =>
            spark.read.schema(SnapshotStore.physicalSchema(x)).parquet(paths: _*))
          .getOrElse(spark.read.parquet(paths: _*))
        val masked0 = raw
          .withColumn("__dv_file",
            element_at(split(col("_metadata.file_path"), "/"), -1))
          .withColumn("__dv_pos", col("_metadata.row_index"))
          .join(broadcast(dv.toDF("__dv_file", "__dv_pos")),
            Seq("__dv_file", "__dv_pos"), "left_anti")
          .drop("__dv_file", "__dv_pos")
        val masked = sc.map(SnapshotStore.toLogical(masked0, _)).getOrElse(masked0)
        val fills = sc.map(SnapshotStore.fillValues).getOrElse(Map.empty[String, Any])
        if (fills.isEmpty) masked else masked.na.fill(fills)
    })

  /** Post-evolution reads RECOMPUTE every historical spec's derived
    * column from its source (a pure function): files of different
    * specs physically carry different derived columns, and a mixed
    * scan would otherwise read NULL for the ones a file predates —
    * turning content-invariant rewrites (compact) into spurious diff
    * updates. Never-evolved stores skip this entirely (files are
    * derived-column-uniform by construction — zero behavior change). */
  private def recomputeDerived(df: DataFrame): DataFrame = {
    val (hist, _) = specHistory
    if (hist.size <= 1) df
    else hist.flatten.distinct.map(SnapshotStore.parsePartitionSpec)
      .filter(sp => sp.transform.isDefined && df.columns.contains(sp.source))
      .foldLeft(df)((d, sp) => d.withColumn(sp.name, SnapshotStore.deriveColumn(sp)))
  }

  def manifest(version: Long): DataFrame = {
    require(versions().contains(version), s"version $version does not exist")
    // served from the fingerprint-validated metadata cache: one
    // directory listing per access instead of a parquet read + footer
    // parse + one-task collect per consumer (guide §6 metadata costs);
    // retention/vacuum/replicate invalidate by changing the listing
    ManifestCache.read(spark, fs, basePath, version, manifestDir(version))
  }

  def latestVersion(): Option[Long] = versions().lastOption

  def versions(): Seq[Long] = {
    val root = new Path(s"$basePath/_manifests")
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.drop(2).toLong).sorted.toIndexedSeq
  }

  /** Pre-check half of the commit CAS: refuse a commit whose target
    * version already exists. The authoritative check is the token
    * verify inside [[publish]] — this one just fails BEFORE the work. */
  private def requireFreeVersion(v: Long): Unit =
    if (versions().contains(v))
      throw new VersionConflictException(
        s"$basePath: version $v already exists")

  /** OPTIMISTIC-CONCURRENCY merge — the multi-writer front door over
    * [[mergeDelta]] (Delta/Iceberg's commit-retry contract):
    *
    *   1. read the tip, attempt `mergeDelta(tip, tip+1, …)`;
    *   2. on a lost commit race ([[VersionConflictException]] — a
    *      concurrent writer published tip+1 first), re-diff: if the
    *      keys OUR commit touches are DISJOINT from every key the
    *      interleaved commits changed, the two commits commute — rebase
    *      onto the new tip and retry;
    *   3. overlapping keys abort with
    *      [[ConcurrentWriteConflictException]] — retrying would
    *      silently pick a winner between causally-unordered updates.
    *
    * The conflict check is the store's own manifest-pruned [[diff]]
    * (O(|changed files|), not O(snapshot)) semi-joined against the
    * commit's key set — metadata-plus-changed-rows work per retry.
    * Returns the version this commit published as. */
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

  private def commitTsOf(v: Long): Long = {
    val p = new Path(manifestDir(v), "_commit_ts")
    val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(buf) finally in.close()
    new String(buf, "UTF-8").trim.toLong
  }

  /** Bytes a commit ADDED: pool sizes of the files exclusive to
    * `version` vs its retained predecessor (the first retained commit
    * counts whole). Metadata-only — two manifest reads + FS stats; the
    * change feed's byte-based admission control paces on it. */
  def commitBytes(version: Long): Long =
    SnapshotStore.readHistoryCkpt(fs, basePath).get(version).map(_.bytes)
      .getOrElse(commitBytesRaw(version))

  private def commitBytesRaw(version: Long): Long = {
    val prev = versions().filter(_ < version).lastOption
    val cur = manifest(version).select("file").collect().map(_.getString(0)).toSet
    val old = prev.map(p =>
      manifest(p).select("file").collect().map(_.getString(0)).toSet)
      .getOrElse(Set.empty[String])
    (cur diff old).toSeq.map { n =>
      val p = new Path(poolDir, n)
      if (fs.exists(p)) fs.getFileStatus(p).getLen else 0L
    }.sum
  }

  /** Newest version committed at-or-before `ts` — served from the
    * version-log checkpoint: ONE sidecar read warm, not O(versions)
    * per-version `_commit_ts` opens. */
  def versionAsOf(ts: Long): Option[Long] = {
    val committed = historyEntries().filter(_._2.commitTs <= ts)
    if (committed.isEmpty) None
    else Some(committed.maxBy { case (v, e) => (e.commitTs, v) }._1)
  }

  def readAsOf(ts: Long): DataFrame = read(versionAsOf(ts).getOrElse(
    throw new IllegalStateException(s"no version committed at or before $ts")))

  private def resolve(version: Long): Seq[String] =
    manifest(version).select("file").collect()
      .map(r => new Path(poolDir, r.getString(0)).toString).toIndexedSeq

  def read(version: Long): DataFrame = {
    val files = resolve(version)
    if (files.isEmpty)
      // a legitimate empty version ([[createEmpty]], an all-row
      // delete) records its schema sidecar — serve the empty frame it
      // describes; absent that record the emptiness is damage
      evolvedSchema(version) match {
        case Some(sc) => spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), sc)
        case None => throw new IllegalStateException(
          s"version $version has no files and no schema sidecar")
      }
    else readFiles(version, files)
  }

  /** SOURCE-column time-range read over an EVOLVED partition spec:
    * every file prunes through the spec IT was written under — a
    * `days(ts)` file via its day tuple, a `months(ts)` file via its
    * month tuple — by translating each derived value to its covered
    * source interval ([[SnapshotStore.sourceRangeOverlap]]). Files of
    * a spec that cannot bound `source` (identity spec, different
    * source) are kept conservatively; the row filter on top is exact
    * either way. The prune that makes `days→months` evolution FREE:
    * no rewrite, and a time query still opens only overlapping files
    * from BOTH eras. */
  def readSourceRange(version: Long, source: String, lo: Any, hi: Any): DataFrame = {
    val (hist, _) = specHistory
    val man = manifest(version)
    val sid = specIdCol(man)
    val specs = hist.map(_.map(SnapshotStore.parsePartitionSpec))
    val conds = specs.zipWithIndex.map { case (sps, id) =>
      sps.find(sp => sp.transform.isDefined && sp.source == source &&
          man.columns.contains(s"min_${sp.name}")) match {
        case Some(sp) => sid === id && SnapshotStore.sourceRangeOverlap(sp,
          col(s"min_${sp.name}"), col(s"max_${sp.name}"), lo, hi)
        case None => sid === id // this spec cannot bound the source: keep
      }
    }
    val cond = if (conds.isEmpty) lit(true) else conds.reduce(_ || _)
    val hit = man.filter(cond).select("file").collect()
      .map(r => new Path(poolDir, r.getString(0)).toString)
    val base = if (hit.isEmpty) emptyRead(version) else readFiles(version, hit.toIndexedSeq)
    base.filter(col(source).cast("timestamp") >= lit(lo).cast("timestamp") &&
      col(source).cast("timestamp") <= lit(hi).cast("timestamp"))
  }

  /** Refuse a whole-partition verb on a version holding files written
    * under an EARLIER spec: a predicate over the current spec's
    * columns cannot guarantee whole-file alignment for them (a month
    * predicate does not select exact day files), and silently
    * skipping them would turn "drop everything before March" into a
    * partial drop. Rewrite the stragglers (compact) first. */
  private def requireUniformSpec(man: DataFrame, op: String): Unit = {
    val (hist, cur) = specHistory
    if (hist.size <= 1) return
    val foreign = man.filter(specIdCol(man) =!= cur).limit(1).count()
    require(foreign == 0L,
      s"$op: this version still holds files written under an earlier partition " +
        s"spec (current spec id $cur) — a predicate over the current spec cannot " +
        "select them whole-file-exactly; compact/rewrite them first, or read " +
        "through readSourceRange")
  }

  /** Key-range read pruned at the MANIFEST level: only files whose
    * [min_key, max_key] envelope overlaps [lo, hi] are opened. */
  def readKeyRange(version: Long, lo: Any, hi: Any): DataFrame = {
    val hit = manifest(version)
      .filter(col("max_key") >= lit(lo) && col("min_key") <= lit(hi))
      .select("file").collect().map(r => new Path(poolDir, r.getString(0)).toString)
    val base =
      if (hit.isEmpty) emptyRead(version)
      else readFiles(version, hit.toIndexedSeq)
    base.filter(col(keyCol) >= lit(lo) && col(keyCol) <= lit(hi))
  }


  /** A ZERO-ROW frame in `version`'s logical read schema, built
    * WITHOUT listing or planning the version's data files — the
    * prune-to-nothing result. `read(version).limit(0)` here would
    * stand up a scan over every pool path just to return nothing; at
    * 100 TB an empty answer must be metadata-cheap. One pool file
    * opens for schema inference only when no schema sidecar exists. */
  private def emptyRead(version: Long): DataFrame =
    evolvedSchema(version) match {
      case Some(sc) => spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), sc)
      case None =>
        val paths = resolve(version)
        if (paths.isEmpty) read(version).limit(0)
        else spark.read.parquet(paths.head).limit(0)
    }

  /** Secondary-column range read pruned at the MANIFEST level, for a
    * column named in `statsCols` at construction: only files whose
    * recorded [min_c, max_c] envelope overlaps [lo, hi] open — the
    * linked twin of SnapshotStore.readWhere. */
  def readWhere(version: Long, column: String, lo: Any, hi: Any): DataFrame = {
    // manifest stats describe the STORED (physical) columns — a
    // metadata-only rename translates the lookup, not the sidecar
    val phys = SnapshotStore.physicalOf(evolvedSchema(version), column)
    require(statsCols.contains(phys) || storedPartitionBy().contains(column),
      s"readWhere needs '$column' in statsCols or the partition spec " +
        s"(have: $statsCols ++ ${storedPartitionBy()})")
    val hit = manifest(version)
      .filter(col(s"max_$phys") >= lit(lo) && col(s"min_$phys") <= lit(hi))
      .select("file").collect().map(r => new Path(poolDir, r.getString(0)).toString)
    val base =
      if (hit.isEmpty) emptyRead(version)
      else readFiles(version, hit.toIndexedSeq)
    base.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }

  /** Z-ordered publish into the pool — [[SnapshotStore.writeZOrdered]]
    * on the linked layout: files cluster on the Morton interleave of
    * `zCols`, and because per-file min/max stats for every z column
    * land in the MANIFEST (the store must be constructed with them in
    * `statsCols`, or they be the key), multi-dimension pruning costs a
    * manifest filter — no separate zone-map sidecar to maintain, and
    * later merges carry the clustered files' stats by reference. */
  def writeZOrdered(df: DataFrame, version: Long, numFiles: Int,
      zCols: Seq[String], commitTs: Option[Long] = None): Unit = {
    requireFreeVersion(version)
    val pcs = storedPartitionBy()
    val overlap = zCols.filter(pcs.contains)
    require(overlap.isEmpty,
      s"writeZOrdered: ${overlap.mkString(", ")} are partition columns — constant " +
        "within every file already; z-order the finer dimensions instead")
    val missing = zCols.filterNot(c => c == keyCol || statsCols.contains(c))
    require(missing.isEmpty,
      s"z-order columns need manifest stats — construct the store with statsCols containing $missing")
    // PARTITIONED store: Delta's OPTIMIZE ZORDER BY semantics — the
    // range split runs over (partition tuple, z), so [[landInPool]]'s
    // hive stage keeps one tuple per file while each partition's files
    // cover contiguous z ranges: partition predicates prune exactly
    // AND every z dimension skips within the partition
    enforceConstraints(df, "writeZOrdered")
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
    val names = landInPool(arranged)
    require(names.nonEmpty, "writeZOrdered: empty input frame")
    publish(version, statsFor(names, effectiveStatsCols), commitTs,
      op = "writeZOrdered")
  }

  /** Read under a CONJUNCTION of range predicates with manifest-level
    * file pruning: a file survives only if its envelope overlaps EVERY
    * range — on a z-ordered layout each dimension independently
    * eliminates files, so the conjunction reads the small corner the
    * predicates carve out. Result always equals the full-scan filter.
    */
  def readWhereAll(version: Long, preds: Seq[(String, Any, Any)]): DataFrame = {
    require(preds.nonEmpty, "readWhereAll needs at least one predicate")
    val scv = evolvedSchema(version)
    val physOf = (c: String) => SnapshotStore.physicalOf(scv, c)
    preds.foreach { case (c, _, _) =>
      require(c == keyCol || statsCols.contains(physOf(c))
          || storedPartitionBy().contains(c),
        s"readWhereAll needs manifest stats for '$c' " +
          s"(have key + $statsCols ++ ${storedPartitionBy()})") }
    val survivors = preds.foldLeft(manifest(version)) { case (m, (c, lo, hi)) =>
      val (loC, hiC) =
        if (c == keyCol) (col("min_key"), col("max_key"))
        else (col(s"min_${physOf(c)}"), col(s"max_${physOf(c)}"))
      m.filter(hiC >= lit(lo) && loC <= lit(hi))
    }
    val hit = survivors.select("file").collect()
      .map(r => new Path(poolDir, r.getString(0)).toString)
    val base =
      if (hit.isEmpty) emptyRead(version)
      else readFiles(version, hit.toIndexedSeq)
    // a DERIVED temporal column (ts__day/…) may be hidden by the
    // version's evolved read schema even though the files carry it:
    // recompute it from its source (a pure function) for the residual
    // filter, then drop the synthesized copy — callers keep the
    // frame's declared shape
    val specs = storedPartitionSpecs().filter(_.transform.isDefined)
    val synth = preds.map(_._1).distinct
      .filterNot(base.columns.contains)
      .flatMap(c => specs.find(_.name == c))
    val derived = synth.foldLeft(base)((d, sp) =>
      d.withColumn(sp.name, SnapshotStore.deriveColumn(sp)))
    val filtered = preds.foldLeft(derived) { case (df, (c, lo, hi)) =>
      df.filter(col(c) >= lit(lo) && col(c) <= lit(hi)) }
    synth.map(_.name).foldLeft(filtered)(_ drop _)
  }

  /** Point-read for a key set: manifest key envelopes prune the file
    * list (one broadcast range probe over |manifest| rows — the same
    * device mergeDelta's touched-file scan uses), then one semi-join
    * restricts to exactly the requested keys. The linked twin of
    * SnapshotStore.readForKeys' zone-map stage. */
  def readForKeys(version: Long, keys: DataFrame): DataFrame = {
    val k = keys.select(keys.columns.head).toDF(keyCol).distinct().materialize()
    val man = manifest(version)
    val hit = k.join(broadcast(man),
        col(keyCol) >= col("min_key") && col(keyCol) <= col("max_key"))
      .select("file").distinct().collect()
      .map(r => new Path(poolDir, r.getString(0)).toString)
    if (hit.isEmpty) emptyRead(version)
    else readFiles(version, hit.toIndexedSeq).join(k, Seq(keyCol), "left_semi")
  }


  private def colstatsDir(v: Long) = new Path(manifestDir(v), "_colstats")

  /** ANALYZE — per-column statistics of `version`, persisted as a
    * `_colstats` sidecar inside the version's manifest dir (the
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
    new Path(manifestDir(v), s"_bloom_$column")

  /** BLOOM FILTER INDEX (Delta's bloom index): one Bloom filter PER
    * POOL FILE over `column`'s values (as strings — type-uniform at
    * build and probe), persisted as a version sidecar. Point lookups
    * on a NON-clustered column then skip every file whose filter says
    * "definitely absent" — the lookup the key envelope and zone maps
    * can't serve (a customer id scattered across a key-ordered 100 TB
    * table). Built in ONE pass: values shuffle grouped by file, each
    * group folds into a filter sized by the file's own manifest row
    * count; |files| tiny rows land. False positives only cost an
    * extra file open — never a wrong result ([[readWhereEquals]]
    * re-filters exactly). */
  def buildBloomIndex(version: Long, column: String, fpp: Double = 0.01): Unit = {
    val man = manifest(version)
    val expected = man.select("file", "n_rows").collect()
      .map(r => r.getString(0) -> math.max(r.getLong(1), 1L)).toMap
    val paths = resolve(version)
    require(paths.nonEmpty, s"buildBloomIndex: version $version has no files")
    bloomsFor(version, paths, expected, column, fpp)
      .coalesce(1).write.mode("overwrite")
      .parquet(bloomDir(version, column).toString)
  }

  /** Per-file Bloom rows for a FILE SUBSET — the shared build pass
    * under [[buildBloomIndex]] (full) and [[extendBloomIndex]] (new
    * files only). */
  private def bloomsFor(version: Long, paths: Seq[String],
      expected: Map[String, Long], column: String, fpp: Double): DataFrame = {
    val raw = readFilesRaw(version, paths)
    require(raw.columns.contains(column), s"bloom index: no column '$column'")
    import org.apache.spark.sql.Encoders
    val pairs = raw.select(
        element_at(split(input_file_name(), "/"), -1).as("__f"),
        col(column).cast("string").as("__v"))
      .as(Encoders.tuple(Encoders.STRING, Encoders.STRING))
    val fppLocal = fpp
    pairs.groupByKey(_._1)(Encoders.STRING)
      .mapGroups { (f, it) =>
        val bf = org.apache.spark.util.sketch.BloomFilter.create(
          expected.getOrElse(f, 1000L), fppLocal)
        it.foreach { case (_, v) => if (v != null) bf.putString(v) }
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        (f, bos.toByteArray)
      }(Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .toDF("file", "bloom")
  }

  /** INCREMENTAL Bloom extension — the maintenance half Delta's bloom
    * index gets for free at OPTIMIZE time: `toVersion`'s index =
    * `fromVersion`'s entries for files STILL REFERENCED (pool files
    * are immutable, so a carried file's filter is carried truth) plus
    * freshly built filters for the files the commit ADDED. Cost =
    * one narrow scan of the NEW files — never a full rebuild. Files
    * that left the manifest drop their entries. */
  def extendBloomIndex(fromVersion: Long, toVersion: Long, column: String,
      fpp: Double = 0.01): Unit = {
    val from = bloomDir(fromVersion, column)
    require(fs.exists(new Path(from, "_SUCCESS")),
      s"extendBloomIndex: version $fromVersion has no bloom index on '$column'")
    val toMan = manifest(toVersion).select("file", "n_rows").collect()
      .map(r => r.getString(0) -> math.max(r.getLong(1), 1L)).toMap
    val old = spark.read.parquet(from.toString).materialize()
    val oldNames = old.select("file").collect().map(_.getString(0)).toSet
    val carried = old.join(nameFrame(toMan.keys), Seq("file"), "left_semi")
    val fresh = toMan.keys.filterNot(oldNames).toSeq.sorted
    val rows =
      if (fresh.isEmpty) carried
      else carried.unionByName(bloomsFor(toVersion,
        fresh.map(n => new Path(poolDir, n).toString), toMan, column, fpp))
    rows.coalesce(1).write.mode("overwrite")
      .parquet(bloomDir(toVersion, column).toString)
  }

  /** Columns carrying a Bloom sidecar on `version`. */
  def bloomColumns(version: Long): Seq[String] =
    if (!fs.exists(manifestDir(version))) Nil
    else fs.listStatus(manifestDir(version)).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_bloom_")).map(_.stripPrefix("_bloom_")).sorted

  /** Best-effort AUTO-EXTENSION at merge time: every indexed column of
    * the predecessor extends onto the child (carry + index-new-only).
    * Best-effort — the index is a derived artifact and a stale/absent
    * one stays CORRECT (unindexed files always open), so a failure
    * here never fails the commit. */
  private def autoExtendBloomIndexes(fromVersion: Long, toVersion: Long): Unit =
    bloomColumns(fromVersion).foreach { c =>
      try extendBloomIndex(fromVersion, toVersion, c)
      catch { case scala.util.control.NonFatal(_) => () }
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

  /** Point lookup on a bloom-indexed column: open ONLY the files whose
    * filter might contain the value (a file ABSENT from the index —
    * landed after the build — always opens: a stale index stays
    * CORRECT, it just skips less), then filter exactly. Falls back to
    * a full scan + filter with no index. Returns (frame,
    * filesOpened) — the caller-visible skip accounting. */
  def readWhereEquals(version: Long, column: String, value: Any)
      : (DataFrame, Int) = {
    val pred = col(column) === lit(value)
    bloomIndex(version, column) match {
      case None =>
        val files = resolve(version)
        (readFiles(version, files).filter(pred), files.size)
      case Some(idx) =>
        val v = String.valueOf(value)
        val names = manifest(version).select("file").collect().map(_.getString(0))
        val hit = names.filter(n => idx.get(n).forall(_.mightContainString(v)))
        val base =
          if (hit.isEmpty) emptyRead(version)
          else readFiles(version,
            hit.map(n => new Path(poolDir, n).toString).toIndexedSeq)
        (base.filter(pred), hit.length)
    }
  }

  /** Metadata-only stats (never opens a data file). */
  def stats(version: Long): DataFrame =
    manifest(version).agg(
      count(lit(1)).as("n_files"), sum(col("n_rows")).as("n_rows"),
      min(col("min_key")).as("min_key"), max(col("max_key")).as("max_key"))

  /** SCD1 upsert of `delta` (+ optional `deleteKeys`) from one version
    * into the next — the linked twin of SnapshotStore.mergeDelta.
    * Touched files (key envelope overlaps a touched key) are read,
    * survivors re-written; UNTOUCHED manifest entries carry by
    * REFERENCE: zero I/O, zero extra storage. Returns
    * (filesShared, filesRewritten). */
  def mergeDelta(fromVersion: Long, toVersion: Long, delta: DataFrame,
      deleteKeys: Option[DataFrame] = None, numNewFiles: Int = 4,
      commitTs: Option[Long] = None,
      fill: Map[String, Any] = Map.empty): (Int, Int) = {
    requireFreeVersion(toVersion)
    val man = manifest(fromVersion).materialize()
    // schema evolution, SnapshotStore.mergeDelta's contract: a column
    // the delta ADDS joins via the union-schema sidecar (shared files
    // are NOT rewritten — old files read null for it); a dropped delta
    // column reads null on new rows; a same-name TYPE change fails
    // fast (silent coercion at 100 TB is a corrupted lake).
    val baseSchema = evolvedSchema(fromVersion).getOrElse(
      readFiles(fromVersion, resolve(fromVersion).take(1)).schema)
    val baseNames = baseSchema.fieldNames.toSet
    delta.schema.fields.filter(f => baseNames(f.name)).foreach { f =>
      val bt = baseSchema(f.name).dataType
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
    def align(df: DataFrame): DataFrame = {
      val have = df.columns.toSet
      df.select(unionSchema.fields.toIndexedSeq.map(f =>
        if (have(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)): _*)
    }
    val delK = deleteKeys.map(df => df.select(df.columns.head).toDF(keyCol))
    // __del flag (delete wins, matching the upserts' left_anti)
    // drives operationMetrics' updated vs deleted split without a
    // second look at the caller's frames
    val touchKeys = delK.foldLeft(
        delta.select(col(keyCol)).withColumn("__del", lit(false)))(
        (acc, del) => acc.unionByName(del.withColumn("__del", lit(true))))
      .groupBy(keyCol).agg(max(col("__del")).as("__del")).materialize()
    // |manifest| rows broadcast into a range probe over the key set
    val touched = touchKeys.join(broadcast(man),
        col(keyCol) >= col("min_key") && col(keyCol) <= col("max_key"))
      .select("file").distinct().collect().map(_.getString(0)).toSet
    val shared = man.filter(!col("file").isin(touched.toSeq: _*))
    // operationMetrics (SnapshotStore.mergeDelta's contract): matched
    // counts come from ONE key-column-pruned pass over the touched
    // files — a small fraction of the full-row double-read (range
    // sampling + shuffle) the rewrite below already pays — and the
    // upsert count reads off the checkpointed key frame; the user's
    // delta pipeline never re-executes for metrics.
    val (nMatched, nMatchedDel) =
      if (touched.isEmpty) (0L, 0L)
      else {
        val r = readFiles(fromVersion,
            touched.map(n => new Path(poolDir, n).toString).toSeq)
          .select(col(keyCol)).join(touchKeys, Seq(keyCol))
          .agg(count(lit(1)).as("m"),
            coalesce(sum(when(col("__del"), 1L)), lit(0L)).as("d")).head()
        (r.getLong(0), r.getLong(1))
      }
    val nUpserts = touchKeys.filter(col("__del") === false).count()
    val survivors =
      if (touched.isEmpty) align(delta).limit(0)
      else align(readFiles(fromVersion,
          touched.map(n => new Path(poolDir, n).toString).toSeq))
        .join(touchKeys, Seq(keyCol), "left_anti")
    val upserts = align(
      delK.foldLeft(delta)((d, del) => d.join(del, Seq(keyCol), "left_anti")))
    enforceConstraints(upserts, "mergeDelta")
    // rewritten files MATERIALIZE every recorded fill (SnapshotStore's
    // r10 contract: no stored null survives in a filled column — an
    // explicit-null delta row reads as the default either way)
    val allFills = SnapshotStore.fillValues(unionSchema)
    def materialize(df: DataFrame): DataFrame =
      if (allFills.isEmpty) df else df.na.fill(allFills)
    val stats = landWithStats(
      arrange(materialize(survivors.unionByName(upserts)), numNewFiles),
      manifestStatsCols(man), Some(unionSchema))
    // an all-delete merge can rewrite to nothing: the manifest is then
    // just the shared entries — and a version that could end up with
    // ZERO pool files records its schema sidecar so readers (incl. the
    // SQL catalog) can still plan an empty scan over it
    val nRewritten = stats.fold(0L)(_.count()).toInt
    publish(toVersion,
      stats.fold(shared)(shared.unionByName(_, allowMissingColumns = true)), commitTs,
      if (evolved || stats.isEmpty) Some(unionSchema) else None,
      dv = carryDv(fromVersion, shared), op = "mergeDelta",
      metrics = Map(
        "numTargetRowsInserted" -> math.max(0L, nUpserts - (nMatched - nMatchedDel)),
        "numTargetRowsUpdated" -> (nMatched - nMatchedDel),
        "numTargetRowsDeleted" -> nMatchedDel,
        "numTargetFilesAdded" -> nRewritten.toLong,
        "numTargetFilesRemoved" -> touched.size.toLong))
    // an indexed predecessor extends its Bloom sidecars: carried files
    // keep their filters verbatim, only the landed files scan
    autoExtendBloomIndexes(fromVersion, toVersion)
    (shared.count().toInt, nRewritten)
  }

  /** Predicate delete (GDPR erasure) — linked twin of
    * SnapshotStore.deleteWhere: only files CONTAINING a matching row
    * rewrite; the rest carry by reference. Rows where `pred` is NULL
    * are KEPT (`!coalesce(pred,false)` — dropping them would be data
    * loss, not deletion). Returns (filesShared, filesRewritten,
    * rowsDeleted). */
  def deleteWhere(fromVersion: Long, toVersion: Long, pred: Column,
      numNewFiles: Int = 2, commitTs: Option[Long] = None,
      mode: String = "auto"): (Int, Int, Long) = {
    require(Set("auto", "cow", "dv")(mode),
      s"deleteWhere mode must be auto|cow|dv, got '$mode'")
    requireFreeVersion(toVersion)
    val man = manifest(fromVersion).materialize()
    // one narrow match scan serves BOTH strategies: Catalyst prunes to
    // pred's columns + the metadata struct; emits (file, row position)
    // per matching VISIBLE row (already-masked rows can't re-match)
    val sc = evolvedSchema(fromVersion)
    val paths = resolve(fromVersion)
    val raw = sc.map(x =>
        spark.read.schema(SnapshotStore.physicalSchema(x)).parquet(paths: _*))
      .getOrElse(spark.read.parquet(paths: _*))
    val withPos0 = raw.select(col("*"),
      element_at(split(col("_metadata.file_path"), "/"), -1).as("__f"),
      col("_metadata.row_index").as("__p"))
    val withPos = sc.map(SnapshotStore.toLogical(withPos0, _)).getOrElse(withPos0)
    val fills = sc.map(SnapshotStore.fillValues).getOrElse(Map.empty[String, Any])
    val filled = if (fills.isEmpty) withPos else withPos.na.fill(fills)
    val visible = dvFrame(fromVersion).map(d =>
      filled.join(broadcast(d.toDF("__f", "__p")), Seq("__f", "__p"), "left_anti"))
      .getOrElse(filled)
    val matchRows = visible.filter(coalesce(pred, lit(false)))
      .select(col("__f").as("file"), col("__p").as("pos")).materialize()
    val matching = matchRows.groupBy("file").agg(count(lit(1)).as("__hits"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val shared = man.filter(!col("file").isin(matching.keys.toSeq: _*))
    if (matching.isEmpty) {
      publish(toVersion, shared, commitTs, evolvedSchema(fromVersion),
        dv = carryDv(fromVersion, shared), op = "deleteWhere",
        opParams = SnapshotStore.predSql(pred),
        metrics = Map("numDeletedRows" -> 0L,
          "numAddedFiles" -> 0L, "numRemovedFiles" -> 0L))
      return (shared.count().toInt, 0, 0L)
    }
    // strategy: MERGE-ON-READ (deletion vector) when the match is
    // sparse relative to the files it touches — rewriting a 1 GB file
    // to drop 3 rows is the 100 TB scale-killer DVs exist to avoid —
    // COPY-ON-WRITE when the delete is dense (the mask would stop
    // being metadata-sized and every read would pay it forever)
    val nMatched = matching.values.sum
    val touchedPhysRows = man.filter(col("file").isin(matching.keys.toSeq: _*))
      .agg(sum("n_rows")).collect()(0).getLong(0)
    val useDv = mode == "dv" ||
      (mode == "auto" && nMatched * 5 <= touchedPhysRows)
    if (useDv) {
      val merged = dvFrame(fromVersion).map(_.unionByName(matchRows))
        .getOrElse(matchRows)
      publish(toVersion, man, commitTs, evolvedSchema(fromVersion),
        dv = Some(merged), op = "deleteWhere",
        opParams = SnapshotStore.predSql(pred),
        metrics = Map("numDeletedRows" -> nMatched,
          "numAddedFiles" -> 0L, "numRemovedFiles" -> 0L,
          "numDeletionVectorsUpdated" -> matching.size.toLong))
      return (man.count().toInt, 0, nMatched)
    }
    val kept = readFiles(fromVersion,
        matching.keys.map(n => new Path(poolDir, n).toString).toSeq)
      .filter(!coalesce(pred, lit(false)))
    val stats = landWithStats(arrange(kept, numNewFiles),
      manifestStatsCols(man), evolvedSchema(fromVersion))
    // a delete that empties the table records the schema sidecar so
    // the zero-file version still plans (see mergeDelta)
    val nRewritten = stats.fold(0L)(_.count()).toInt
    publish(toVersion,
      stats.fold(shared)(shared.unionByName(_, allowMissingColumns = true)), commitTs,
      if (stats.isEmpty && shared.isEmpty)
        evolvedSchema(fromVersion).orElse(Some(kept.schema))
      else evolvedSchema(fromVersion),
      dv = carryDv(fromVersion, shared), op = "deleteWhere",
      opParams = SnapshotStore.predSql(pred),
      metrics = Map("numDeletedRows" -> nMatched,
        "numAddedFiles" -> nRewritten.toLong,
        "numRemovedFiles" -> matching.size.toLong))
    (shared.count().toInt, nRewritten, nMatched)
  }

  /** MERGE-ON-READ MERGE — [[mergeDelta]]'s MoR alternative
    * (Iceberg's merge-on-read MERGE): superseded rows (existing rows
    * whose key the delta upserts or deletes) join the DELETION VECTOR
    * by position while the delta's rows land as NEW pool files — ONE
    * commit, O(|delta| + mask) writes, NOT ONE existing file
    * rewritten (mergeDelta re-encodes every touched file; at 100 TB a
    * 100-row merge into 100 touched 1 GB files pays 100 GB there and
    * ~nothing here). The trade is read-side: the mask grows until
    * [[compact]]/[[foldDv]] folds it — the same ledger deletion
    * vectors already keep. Same-schema only (an evolving merge takes
    * the CoW path — its union-schema machinery needs the rewrite
    * hooks); constraints gate the delta. Returns (filesNew,
    * rowsMasked). */
  def mergeDeltaMor(fromVersion: Long, toVersion: Long, delta: DataFrame,
      deleteKeys: Option[DataFrame] = None, numNewFiles: Int = 2,
      commitTs: Option[Long] = None): (Int, Long) = {
    requireFreeVersion(toVersion)
    val man = manifest(fromVersion).materialize()
    val sc = evolvedSchema(fromVersion)
    val baseSchema = sc.getOrElse(
      readFilesRaw(fromVersion, resolve(fromVersion).take(1)).schema)
    require(delta.schema.fieldNames.sorted.sameElements(baseSchema.fieldNames.sorted),
      s"mergeDeltaMor is same-schema only (have ${baseSchema.fieldNames.mkString(",")}, " +
        s"delta ${delta.schema.fieldNames.mkString(",")}) — an evolving merge " +
        "takes mergeDelta's copy-on-write path")
    val delK = deleteKeys.map(df => df.select(df.columns.head).toDF(keyCol))
    val touchKeys = delK.foldLeft(delta.select(keyCol))(_ unionByName _)
      .distinct().materialize()
    // manifest-pruned position scan: only files whose key envelope
    // holds a touched key open, and only for (key, position)
    val touched = touchKeys.join(broadcast(man),
        col(keyCol) >= col("min_key") && col(keyCol) <= col("max_key"))
      .select("file").distinct().collect().map(_.getString(0)).toSet
    val matchRows =
      if (touched.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("file",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("pos",
              org.apache.spark.sql.types.LongType))))
      else {
        val paths = touched.map(n => new Path(poolDir, n).toString).toSeq
        val raw = sc.map(x => spark.read.schema(x).parquet(paths: _*))
          .getOrElse(spark.read.parquet(paths: _*))
        val withPos = raw.select(col(keyCol),
          element_at(split(col("_metadata.file_path"), "/"), -1).as("__f"),
          col("_metadata.row_index").as("__p"))
        val visible = dvFrame(fromVersion).map(d =>
          withPos.join(broadcast(d.toDF("__f", "__p")), Seq("__f", "__p"), "left_anti"))
          .getOrElse(withPos)
        visible.join(touchKeys, Seq(keyCol), "left_semi")
          .select(col("__f").as("file"), col("__p").as("pos")).materialize()
      }
    val upserts = delK.foldLeft(delta)((d, del) =>
      d.join(del, Seq(keyCol), "left_anti"))
    enforceConstraints(upserts, "mergeDeltaMor")
    val stats = landWithStats(arrange(upserts, numNewFiles),
      manifestStatsCols(man), sc)
    val nMasked = matchRows.count()
    val mask = dvFrame(fromVersion).map(_.unionByName(matchRows)).getOrElse(matchRows)
      .materialize()
    val nNew = stats.fold(0L)(_.count()).toInt
    publish(toVersion, stats.fold(man)(man.unionByName(_, allowMissingColumns = true)), commitTs, sc,
      dv = if (mask.limit(1).count() == 0) None else Some(mask),
      op = "mergeDeltaMor", metrics = Map(
        "numTargetRowsMasked" -> nMasked,
        "numTargetFilesAdded" -> nNew.toLong,
        "numTargetFilesRemoved" -> 0L))
    autoExtendBloomIndexes(fromVersion, toVersion)
    (nNew, nMasked)
  }

  /** Operation-parameters stamp for updateWhere commits. */
  private def updateOpParams(set: Map[String, Column], pred: Column): String =
    s"SET ${set.keys.toSeq.sorted.mkString(",")} WHERE ${SnapshotStore.predSql(pred)}"

  /** Predicate UPDATE with a MERGE-ON-READ path — the update half of
    * the deletion-vector design (Delta/Iceberg's MoR updates): in
    * `mor` mode the matched rows' OLD positions join the deletion
    * vector while their UPDATED copies land as NEW pool files, all in
    * ONE commit — a sparse update of a 100 TB table costs
    * O(|matched rows|) writes plus a metadata-sized mask, never a
    * file rewrite. `cow` rewrites the touched files instead (the
    * read-optimized trade: no mask to pay on later reads); `auto`
    * picks mor when the match is sparse relative to the files it
    * touches (deleteWhere's policy). The SET map may not touch the
    * key column (that is a delete+insert, not an update). Reads are
    * oblivious: the mask hides the old rows, the new files carry the
    * new ones. Returns (filesShared, filesNew, rowsUpdated). */
  def updateWhere(fromVersion: Long, toVersion: Long, pred: Column,
      set: Map[String, Column], numNewFiles: Int = 2,
      commitTs: Option[Long] = None, mode: String = "auto"): (Int, Int, Long) = {
    require(Set("auto", "cow", "mor")(mode),
      s"updateWhere mode must be auto|cow|mor, got '$mode'")
    require(set.nonEmpty, "updateWhere: empty SET")
    require(!set.contains(keyCol),
      s"updateWhere: SET may not touch the key column '$keyCol' — a key change " +
        "is a delete+insert, route it through mergeDelta")
    requireFreeVersion(toVersion)
    val man = manifest(fromVersion).materialize()
    val sc = evolvedSchema(fromVersion)
    val paths = resolve(fromVersion)
    // the match scan asks for PHYSICAL names (what the bytes answer to
    // under a metadata-only rename) and projects to logical BEFORE the
    // predicate — reading the logical schema directly over
    // physical-named files would yield NULL for a mapped column and
    // the predicate would silently match nothing (deleteWhere's rule)
    val raw = sc.map(x =>
        spark.read.schema(SnapshotStore.physicalSchema(x)).parquet(paths: _*))
      .getOrElse(spark.read.parquet(paths: _*))
    val withPos0 = raw.select(col("*"),
      element_at(split(col("_metadata.file_path"), "/"), -1).as("__f"),
      col("_metadata.row_index").as("__p"))
    val withPos = sc.map(SnapshotStore.toLogical(withPos0, _)).getOrElse(withPos0)
    val missing = set.keys.filterNot(withPos.columns.contains)
    require(missing.isEmpty, s"updateWhere: not in the schema: ${missing.mkString(", ")}")
    val fills = sc.map(SnapshotStore.fillValues).getOrElse(Map.empty[String, Any])
    val filled = if (fills.isEmpty) withPos else withPos.na.fill(fills)
    val visible = dvFrame(fromVersion).map(d =>
      filled.join(broadcast(d.toDF("__f", "__p")), Seq("__f", "__p"), "left_anti"))
      .getOrElse(filled)
    val matched = visible.filter(coalesce(pred, lit(false))).materialize()
    val matchRows = matched.select(col("__f").as("file"), col("__p").as("pos"))
    val matching = matchRows.groupBy("file").agg(count(lit(1)).as("__hits"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (matching.isEmpty) {
      publish(toVersion, man, commitTs, sc, dv = dvFrame(fromVersion),
        op = "updateWhere", opParams = updateOpParams(set, pred),
        metrics = Map("numUpdatedRows" -> 0L,
          "numAddedFiles" -> 0L, "numRemovedFiles" -> 0L))
      return (man.count().toInt, 0, 0L)
    }
    val nMatched = matching.values.sum
    def applySet(df: DataFrame): DataFrame =
      set.foldLeft(df) { case (d, (c, v)) => d.withColumn(c, v) }
    val touchedPhysRows = man.filter(col("file").isin(matching.keys.toSeq: _*))
      .agg(sum("n_rows")).collect()(0).getLong(0)
    val useMor = mode == "mor" ||
      (mode == "auto" && nMatched * 5 <= touchedPhysRows)
    if (useMor) {
      val updated = applySet(matched).drop("__f", "__p")
      enforceConstraints(updated, "updateWhere")
      val stats = landWithStats(arrange(updated, numNewFiles),
        manifestStatsCols(man), sc)
      val mask = dvFrame(fromVersion).map(_.unionByName(matchRows)).getOrElse(matchRows)
      val nNew = stats.fold(0L)(_.count()).toInt
      publish(toVersion, stats.fold(man)(man.unionByName(_, allowMissingColumns = true)), commitTs, sc,
        dv = Some(mask), op = "updateWhere",
        opParams = updateOpParams(set, pred),
        metrics = Map("numUpdatedRows" -> nMatched,
          "numAddedFiles" -> nNew.toLong, "numRemovedFiles" -> 0L))
      (man.count().toInt, nNew, nMatched)
    } else {
      val shared = man.filter(!col("file").isin(matching.keys.toSeq: _*))
      val touched = readFiles(fromVersion,
        matching.keys.map(n => new Path(poolDir, n).toString).toSeq)
      val rewritten = applySet(touched.filter(coalesce(pred, lit(false))))
        .unionByName(touched.filter(!coalesce(pred, lit(false))))
      enforceConstraints(rewritten, "updateWhere")
      val stats = landWithStats(arrange(rewritten, numNewFiles),
        manifestStatsCols(man), sc)
      val nNew = stats.fold(0L)(_.count()).toInt
      publish(toVersion, stats.fold(shared)(shared.unionByName(_, allowMissingColumns = true)), commitTs, sc,
        dv = carryDv(fromVersion, shared), op = "updateWhere",
        opParams = updateOpParams(set, pred),
        metrics = Map("numUpdatedRows" -> nMatched,
          "numAddedFiles" -> nNew.toLong,
          "numRemovedFiles" -> matching.size.toLong))
      (shared.count().toInt, nNew, nMatched)
    }
  }

  /** FOLD the deletion vector: rewrite ONLY the files the mask names
    * (reading them masked), carry everything else by reference, and
    * publish without a DV — the targeted companion to [[compact]],
    * which folds only SMALL files (a 1 GB file with 3 masked rows
    * would otherwise stay masked forever, paying the anti-join on
    * every read). I/O = O(|masked files|). Returns (filesShared,
    * filesRewritten, rowsDropped); no-op publish when no DV. */
  def foldDv(fromVersion: Long, toVersion: Long, numNewFiles: Int = 2,
      commitTs: Option[Long] = None): (Int, Int, Long) = {
    requireFreeVersion(toVersion)
    val man = manifest(fromVersion).materialize()
    dvFrame(fromVersion) match {
      case None =>
        publish(toVersion, man, commitTs, evolvedSchema(fromVersion),
          op = "foldDv", statsFrom = Some(fromVersion))
        (man.count().toInt, 0, 0L)
      case Some(dv) =>
        val masked = dv.select("file").distinct().collect().map(_.getString(0)).toSet
        val nDropped = dv.count()
        val shared = man.filter(!col("file").isin(masked.toSeq: _*))
        val survivors = readFiles(fromVersion,
          masked.map(n => new Path(poolDir, n).toString).toSeq)
        val stats = landWithStats(arrange(survivors, numNewFiles),
          manifestStatsCols(man), evolvedSchema(fromVersion))
        publish(toVersion, stats.fold(shared)(shared.unionByName(_, allowMissingColumns = true)), commitTs,
          evolvedSchema(fromVersion), op = "foldDv")
        (shared.count().toInt, stats.fold(0L)(_.count()).toInt, nDropped)
    }
  }

  /** RESTORE — Delta's `RESTORE TABLE t TO VERSION AS OF v`: publish a
    * NEW version whose content equals `fromVersion`, leaving history
    * intact (a restore is a commit, not a rewrite of the past). On
    * this layout it is [[branch]] — zero data bytes move. */
  def restoreVersion(fromVersion: Long, toVersion: Long,
      commitTs: Option[Long] = None): Unit =
    branch(fromVersion, toVersion, commitTs, op = "restoreVersion")

  /** DV entries that survive into a child version: only those naming
    * files the child still SHARES (a rewritten file materialized its
    * survivors, so its mask is obsolete). None when nothing carries —
    * a store that stops using DVs stops paying for them. */
  private def carryDv(fromVersion: Long, shared: DataFrame): Option[DataFrame] =
    dvFrame(fromVersion)
      .map(_.join(shared.select("file"), Seq("file"), "left_semi").materialize())
      .filter(_.limit(1).count() > 0)

  /** Adopt a dir-per-version SnapshotStore chain into this (empty)
    * linked store — the migration path that needs no data rewrite
    * beyond one copy: each source version's part files land in the
    * pool, and files with IDENTICAL content across versions (the
    * byte-copies the dir-per-version CoW layout forced on every
    * untouched file) collapse to ONE pool file referenced by every
    * adopting manifest. Dedup is by streamed md5 of the file bytes,
    * applied only ACROSS versions (two identical files within one
    * version stay distinct — collapsing them would drop rows).
    * Commit timestamps carry via `commitTs`; subsequent merges
    * continue linked on top of the adopted chain. Returns per version
    * (filesCopied, filesReferenced). */
  def adoptChain(srcBase: String, versions: Seq[Long],
      commitTs: Long => Option[Long] = _ => None): Map[Long, (Int, Int)] = {
    require(this.versions().isEmpty, "adoptChain requires an empty target store")
    val conf = spark.sparkContext.hadoopConfiguration
    val seen = scala.collection.mutable.Map.empty[String, String] // content md5 -> pool name
    fs.mkdirs(poolDir)
    versions.sorted.map { v =>
      val srcDir = new Path(s"$srcBase/v=$v")
      require(!fs.exists(new Path(srcDir, "_dv")),
        s"adoptChain: source version $v carries a deletion vector — positions " +
          "would not survive the pool re-name; compact the source first")
      val parts = fs.listStatus(srcDir).map(_.getPath)
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      var copied = 0
      val usedInVersion = scala.collection.mutable.Set.empty[String]
      val names = parts.toIndexedSeq.map { p =>
        val digest = streamMd5(p)
        val pooled = seen.get(digest).filterNot(usedInVersion.contains).getOrElse {
          val name = s"${java.util.UUID.randomUUID().toString.take(12)}-adopt.parquet"
          org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, new Path(poolDir, name), false, conf)
          copied += 1
          seen(digest) = name
          name
        }
        usedInVersion += pooled
        pooled
      }
      publish(v, statsFor(names), commitTs(v), op = "adoptChain",
        opParams = s"from $srcBase")
      v -> ((copied, names.size - copied))
    }.toMap
  }

  private def streamMd5(p: Path): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** Row-level CDC between two versions, MANIFEST-PRUNED: a pool file
    * shared by both manifests holds byte-identical rows in both
    * versions and can never contribute an insert/update/delete, so
    * only the files EXCLUSIVE to either side are scanned — on a
    * merge-chained store that is O(|changed files|), not O(snapshot).
    * Classification: `insert` (key only in `to`), `delete` (key only
    * in `from`), `update` (key in both exclusive sets, content
    * fingerprint over the common non-key columns differs). */
  def diff(fromVersion: Long, toVersion: Long): DataFrame =
    diffImpl(fromVersion, toVersion, preImages = false)

  /** [[diff]] in Delta's CDF shape: an updated key emits TWO rows —
    * `update_preimage` (the old values, already in hand on the
    * from-side) and `update_postimage` (the new values) — while
    * inserts and deletes are unchanged. The pre-image costs no extra
    * scan class: within-exclusive updates re-read only the from-side
    * EXCLUSIVE files, MoR updates reuse the DV-masked rows the plain
    * diff already materializes. */
  def diffCdf(fromVersion: Long, toVersion: Long): DataFrame =
    diffImpl(fromVersion, toVersion, preImages = true)

  /** [[diffCdf]] restricted to keys in [lo, hi] — [[diffKeyRange]]'s
    * CDF-shaped sibling (same envelope-pruned exclusive-file opens;
    * preimage/delete-value reads are range-bounded too). */
  def diffCdfKeyRange(fromVersion: Long, toVersion: Long, lo: Any, hi: Any): DataFrame =
    diffImpl(fromVersion, toVersion, preImages = true, keyRange = Some((lo, hi)))

  /** [[diff]] restricted to keys in [lo, hi] — the change feed's
    * KEY-PREDICATE PUSHDOWN unit: each side's exclusive files prune
    * further against their manifest key envelopes BEFORE any open, so
    * a one-tenant consumer of a 100 TB store's feed pays only the
    * overlapping exclusive files per commit, and the MoR mask pass
    * filters to the range after its position-bounded reads.
    * Semantically identical to `diff(...).filter(key in range)`
    * (spec-proven): a key outside the range can never pair with one
    * inside it, so range-filtering both sides preserves every
    * insert/update/delete classification. */
  def diffKeyRange(fromVersion: Long, toVersion: Long, lo: Any, hi: Any): DataFrame =
    diffImpl(fromVersion, toVersion, preImages = false, keyRange = Some((lo, hi)))

  private def diffImpl(fromVersion: Long, toVersion: Long,
      preImages: Boolean, keyRange: Option[(Any, Any)] = None): DataFrame = {
    val fromFiles = manifest(fromVersion).select("file").collect().map(_.getString(0)).toSet
    val toFiles = manifest(toVersion).select("file").collect().map(_.getString(0)).toSet
    val inRange: DataFrame => DataFrame = df => keyRange.fold(df) { case (lo, hi) =>
      df.filter(col(keyCol) >= lit(lo) && col(keyCol) <= lit(hi)) }
    def side(version: Long, exclusive: Set[String]): DataFrame = {
      // key pushdown: only envelope-overlapping exclusive files open
      val chosen = keyRange.fold(exclusive) { case (lo, hi) =>
        manifest(version)
          .filter(col("max_key") >= lit(lo) && col("min_key") <= lit(hi))
          .select("file").collect().map(_.getString(0)).toSet intersect exclusive
      }
      if (chosen.isEmpty) emptyRead(version)
      else inRange(readFiles(version,
        chosen.toSeq.sorted.map(n => new Path(poolDir, n).toString)))
    }
    val a = side(fromVersion, fromFiles diff toFiles)
    val b = side(toVersion, toFiles diff fromFiles)
    // fingerprint the COMMON non-key columns so an evolved schema does
    // not flag every carried row as updated
    val common = a.columns.toSeq.filter(c => c != keyCol && b.columns.contains(c)).sorted
    def fp(df: DataFrame) = df.select(col(keyCol),
      graft.functions.Fx.fastFingerprint(common.map(col): _*).as("__fp"))
    val af = fp(a).withColumnRenamed("__fp", "__fp_a")
    val bf = fp(b).withColumnRenamed("__fp", "__fp_b")
    // materialized ONCE: the (key, change_type) frame is consumed by
    // the new-side join, the delete-side join, and (CDF mode) the
    // pre-image join — without the checkpoint each consumer re-reads
    // both sides' exclusive files and re-runs the fingerprint
    // full-outer join (2-3 redundant passes per commit step). The
    // frame is |changed keys|-sized, strictly smaller than the feed
    // it serves; the sides' content scans below stay visible to
    // inputFiles-based pruning gates.
    val changed = af.join(bf, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__fp_a").isNull, lit("insert"))
          .when(col("__fp_b").isNull, lit("delete"))
          .when(col("__fp_a") =!= col("__fp_b"), lit("update"))
          .as("change_type"))
      .filter(col("change_type").isNotNull) // both-sides-equal rows drop out
      // lazy: diff() is a DataFrame FACTORY — an eager pin here fired
      // Spark jobs at construction even for plan-only consumers
      // (ExplainDump, multi-commit walks that prune this step); the
      // first real consumer still materializes it exactly once
      .materialize(eager = false)
    val newSide = b.join(changed.filter(col("change_type") =!= "delete"), Seq(keyCol))
    // MERGE-ON-READ commits move no old files: rows masked between the
    // two versions' deletion vectors inside SHARED files are invisible
    // to the file-set diff — read exactly those rows from the older
    // side's content. A masked key that REAPPEARS in the to-side
    // exclusive files is one UPDATE (mergeDeltaMor/updateWhere's
    // mask-and-land), not an insert+delete pair — emitting both would
    // make the feed self-contradictory at one commit version; only
    // masked keys absent from the to-side are genuine deletes.
    val (newFixed, dvDeletes, dvPre) =
      dvDeletesBetween(fromVersion, toVersion, fromFiles intersect toFiles)
        .map(inRange) match { // pushdown: masked rows outside the range drop
        case None => (newSide, None, None)
        case Some(dv) =>
          val moved = dv.join(b.select(keyCol), Seq(keyCol), "left_semi")
          val marker = moved.select(col(keyCol)).withColumn("__mv", lit(1))
          val fixed = newSide.join(marker, Seq(keyCol), "left_outer")
            .withColumn("change_type",
              when(col("__mv").isNotNull && col("change_type") === "insert",
                lit("update")).otherwise(col("change_type")))
            .drop("__mv")
          val deletes = dv.join(b.select(keyCol), Seq(keyCol), "left_anti")
            .withColumn("change_type", lit("delete"))
          (fixed, Some(deletes), Some(moved))
      }
    if (!preImages) {
      val delSide = a.join(changed.filter(col("change_type") === "delete"), Seq(keyCol))
      val base = newFixed.unionByName(delSide, allowMissingColumns = true)
      dvDeletes.fold(base)(base.unionByName(_, allowMissingColumns = true))
    } else {
      // CDF shape: ONE pass over the from-side exclusive files serves
      // BOTH the delete rows and the update pre-images (diff keys are
      // unique, so the inner join ≡ the two separate joins it
      // replaces row-for-row) — the from-side content was scanned
      // twice here, once per change type.
      val aOld = a.join(changed.filter(col("change_type") =!= "insert"), Seq(keyCol))
        .withColumn("change_type",
          when(col("change_type") === "update", lit("update_preimage"))
            .otherwise(col("change_type")))
      val withDv = dvDeletes.fold(newFixed)(
        newFixed.unionByName(_, allowMissingColumns = true))
      val post = withDv.withColumn("change_type",
        when(col("change_type") === "update", lit("update_postimage"))
          .otherwise(col("change_type")))
      val preDv = dvPre.map(_.withColumn("change_type", lit("update_preimage")))
      preDv.foldLeft(post.unionByName(aOld, allowMissingColumns = true))(
        _.unionByName(_, allowMissingColumns = true))
    }
  }

  /** Rows newly masked by `toVersion`'s DV relative to `fromVersion`'s,
    * within `sharedNames` — served with their OLD content (the diff
    * delete-row contract). None when no DV grew. */
  private def dvDeletesBetween(fromVersion: Long, toVersion: Long,
      sharedNames: Set[String]): Option[DataFrame] =
    dvFrame(toVersion).flatMap { dvTo =>
      val grown0 = dvFrame(fromVersion)
        .fold(dvTo)(dvFrom => dvTo.join(dvFrom, Seq("file", "pos"), "left_anti"))
      val grown = grown0.filter(col("file").isin(sharedNames.toSeq: _*))
        .materialize()
      val files = grown.select("file").distinct().collect().map(_.getString(0))
      if (files.isEmpty) None
      else {
        val sc = evolvedSchema(fromVersion)
        val paths = files.map(n => new Path(poolDir, n).toString).toIndexedSeq
        // physical-name scan + logical projection (the column-mapping
        // read contract): a rename between the versions must not turn
        // the feed's delete/preimage values NULL — these rows carry the
        // deleted row's CONTENT by contract
        val raw = sc.map(x =>
            spark.read.schema(SnapshotStore.physicalSchema(x)).parquet(paths: _*))
          .getOrElse(spark.read.parquet(paths: _*))
        val withPos0 = raw.select(col("*"),
          element_at(split(col("_metadata.file_path"), "/"), -1).as("__f"),
          col("_metadata.row_index").as("__p"))
        val withPos = sc.map(SnapshotStore.toLogical(withPos0, _)).getOrElse(withPos0)
        Some(withPos
          .join(broadcast(grown.toDF("__f", "__p")), Seq("__f", "__p"), "left_semi")
          .drop("__f", "__p"))
      }
    }

  /** Integrity audit of one version against the pool: every manifest
    * entry's file must exist and hold exactly its recorded row count
    * within its recorded key envelope. Returns one row per file with
    * `status` ok / missing / count_mismatch / range_mismatch — the
    * restore-validation pass a backup tool runs before trusting a
    * version. Narrow scan of the version's files only. */
  /** Incremental integrity audit — [[validate]] pruned to the pool
    * files EXCLUSIVE to `vTo` vs `vFrom` (a shared file was already
    * audited when its first referencing version landed, and pool files
    * are immutable, so re-reading it can only repeat the old answer):
    * the post-merge validation drill costs O(|new files|) I/O on a
    * merge chain, not O(snapshot). Manifests are metadata-sized by
    * construction, so the file-set difference is a driver-side set op
    * like the rest of the manifest plumbing. */
  def validateDelta(vFrom: Long, vTo: Long): DataFrame = {
    val prev = manifest(vFrom).select("file").collect().map(_.getString(0)).toSet
    validateImpl(vTo,
      manifest(vTo).filter(!col("file").isin(prev.toSeq: _*)).materialize())
  }

  def validate(version: Long): DataFrame =
    validateImpl(version, manifest(version).materialize())

  private def validateImpl(version: Long, man: DataFrame): DataFrame = {
    val entries = man.select("file", "min_key", "max_key", "n_rows").collect()
    val (present, missing) = entries.partition(r => fs.exists(new Path(poolDir, r.getString(0))))
    val missingDf = spark.createDataFrame(
      spark.sparkContext.parallelize(missing.map(r =>
        org.apache.spark.sql.Row(r.getString(0), "missing")).toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("file", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("status", org.apache.spark.sql.types.StringType))))
    if (present.isEmpty) return missingDf
    // PHYSICAL audit: manifest stats describe the stored file, so the
    // scan must bypass the deletion vector (a masked row still exists)
    val actual = readFilesRaw(version,
        present.map(r => new Path(poolDir, r.getString(0)).toString).toIndexedSeq)
      .select(element_at(split(input_file_name(), "/"), -1).as("file"), col(keyCol))
      .groupBy("file")
      .agg(count(lit(1)).as("__n"), min(col(keyCol)).as("__lo"), max(col(keyCol)).as("__hi"))
    val base = man.join(actual, Seq("file"), "inner")
      .select(col("file"),
        when(col("__n") =!= col("n_rows"), lit("count_mismatch"))
          .when(col("__lo") < col("min_key") || col("__hi") > col("max_key"), lit("range_mismatch"))
          .otherwise(lit("ok")).as("status"))
      .unionByName(missingDf)
    // DV audit: every mask entry must name a manifest file and a
    // position inside its recorded row count
    dvFrame(version) match {
      case None => base
      case Some(dv) =>
        val dvAgg = dv.groupBy("file")
          .agg(max("pos").as("__maxp"), count(lit(1)).as("__ndv"))
        val dvBad = dvAgg.join(man.select("file", "n_rows"), Seq("file"), "left_outer")
          .select(col("file"),
            when(col("n_rows").isNull, lit("dv_orphan"))
              .when(col("__maxp") >= col("n_rows") || col("__ndv") > col("n_rows"),
                lit("dv_overflow"))
              .otherwise(lit("dv_ok")).as("status"))
          .filter(col("status") =!= "dv_ok")
        base.unionByName(dvBad)
    }
  }

  /** Dedup-aware storage accounting across versions — the linked
    * store's `--stats` report (ChunkCrypto.chunkAccounting's twin at
    * file granularity): per version, n_files and logical_bytes (what
    * a restore materializes), shared_bytes (referenced by ≥2
    * versions), and exclusive_bytes (reclaimed if ONLY this version
    * were pruned — the GC planning number). Metadata-only: manifests
    * + one pool listing, never a data scan. */
  /** A tiny (|names| rows) frame for semi/anti joins against manifest
    * or index frames — a literal `isin(...)` predicate builds an
    * O(|names|)-literal In expression, plan-size pain at a 100k-file
    * manifest; the join broadcasts the name side and stays O(1) in
    * plan size. */
  private def nameFrame(names: Iterable[String]): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    names.toSeq.sorted.toDF("file")
  }

  /** Every pool file's size from ONE directory listing — the
    * vacuum/orphans pattern; per-file `getFileStatus` would cost
    * O(|files|) NameNode round-trips. */
  private def poolSizes(): Map[String, Long] =
    if (!fs.exists(poolDir)) Map.empty
    else fs.listStatus(poolDir).filter(_.isFile)
      .map(st => st.getPath.getName -> st.getLen).toMap

  def storageReport(): DataFrame = {
    import spark.implicits._
    val sizes: Map[String, Long] = poolSizes()
    val refs: Seq[(Long, String)] = versions().flatMap(v =>
      manifest(v).select("file").collect().map(r => v -> r.getString(0)))
    val refCount: Map[String, Int] =
      refs.groupBy(_._2).map { case (f, rs) => f -> rs.size }
    refs.groupBy(_._1).toSeq.sortBy(_._1).map { case (v, fs0) =>
      val files = fs0.map(_._2)
      val logical = files.map(sizes.getOrElse(_, 0L)).sum
      val shared = files.filter(refCount(_) > 1).map(sizes.getOrElse(_, 0L)).sum
      (v, files.size.toLong, logical, shared, logical - shared)
    }.toDF("version", "n_files", "logical_bytes", "shared_bytes", "exclusive_bytes")
  }

  /** Small-file compaction: every merge appends `numNewFiles` fresh
    * pool files, so a long merge chain accumulates small files and
    * read amplification. Fold every pool file under `minBytes` into
    * ~`targetFiles` consolidated files, published as `toVersion`;
    * files already at healthy size carry by reference. O(|small
    * files|) I/O — the 100 TB nightly compaction touches only what
    * the day's merges fragmented. Returns (filesShared,
    * filesRewritten). */
  def compact(fromVersion: Long, toVersion: Long, minBytes: Long = 8L << 20,
      targetFiles: Int = 4, commitTs: Option[Long] = None): (Int, Int) = {
    requireFreeVersion(toVersion)
    val man = manifest(fromVersion).materialize()
    val pool = poolSizes()
    val sizes = man.select("file").collect().map(_.getString(0)).map(n =>
      n -> pool.getOrElse(n, fs.getFileStatus(new Path(poolDir, n)).getLen))
    val small = sizes.filter(_._2 < minBytes).map(_._1)
    if (small.length <= 1) { // nothing to fold (0 or 1 fragment)
      publish(toVersion, man, commitTs, evolvedSchema(fromVersion),
        dv = dvFrame(fromVersion), op = "compact",
        statsFrom = Some(fromVersion))
      return (sizes.length, 0)
    }
    val shared = man.join(nameFrame(small), Seq("file"), "left_anti")
    // compaction FOLDS the deletion vector in: the rewrite reads the
    // masked view, so folded files shed their DV entries for good.
    // Folded files land under PHYSICAL names (column mapping): the
    // pool stays name-uniform with the carried files.
    val folded = readFiles(fromVersion,
      small.map(n => new Path(poolDir, n).toString).toIndexedSeq)
    val names = landInPool(arrange(
      evolvedSchema(fromVersion).map(SnapshotStore.toPhysical(folded, _))
        .getOrElse(folded),
      targetFiles))
    publish(toVersion, shared.unionByName(statsFor(names, manifestStatsCols(man)),
      allowMissingColumns = true),
      commitTs, evolvedSchema(fromVersion), dv = carryDv(fromVersion, shared),
      op = "compact", metrics = Map("numAddedFiles" -> names.size.toLong,
        "numRemovedFiles" -> small.length.toLong))
    (sizes.length - small.length, names.size)
  }

  /** PARTITION-SCOPED compaction — Delta's `OPTIMIZE t WHERE part=x`:
    * fold sub-`minBytes` fragments ONLY inside the partitions `pred`
    * selects (a predicate over the declared partition columns,
    * evaluated per file on the manifest's min==max tuples — metadata
    * only); every other file, matching-partition-or-not, carries by
    * reference. At 100 TB you never OPTIMIZE a whole table: the
    * nightly maintenance of ONE hot day costs O(that day's fragments),
    * and the untouched partitions' pool entries are bit-identical
    * across the commit (spec-pinned). Returns (filesCarried,
    * filesRewritten). */
  def compactWhere(fromVersion: Long, toVersion: Long, pred: Column,
      minBytes: Long = 8L << 20, targetFiles: Int = 1,
      commitTs: Option[Long] = None): (Int, Int) = {
    val pcs = requirePartitioned("compactWhere")
    requireFreeVersion(toVersion)
    val man = manifest(fromVersion).materialize()
    val matched = partitionEntries(man, pcs).filter(coalesce(pred, lit(false)))
      .select("file").collect().map(_.getString(0)).toSet
    val pool = poolSizes()
    val small = matched.toSeq.sorted.filter(n =>
      pool.getOrElse(n, fs.getFileStatus(new Path(poolDir, n)).getLen) < minBytes)
    if (small.length <= 1) { // nothing to fold inside the scope
      publish(toVersion, man, commitTs, evolvedSchema(fromVersion),
        dv = dvFrame(fromVersion), op = "compact",
        opParams = SnapshotStore.predSql(pred), statsFrom = Some(fromVersion))
      return (man.count().toInt, 0)
    }
    val shared = man.join(nameFrame(small), Seq("file"), "left_anti")
    // the fold reads MASKED (DV entries for rewritten files retire) and
    // lands physical-named (column mapping) — [[compact]]'s contract,
    // scoped; arrange keeps one partition tuple per file
    val folded = readFiles(fromVersion,
      small.map(n => new Path(poolDir, n).toString))
    val names = landInPool(arrange(
      evolvedSchema(fromVersion).map(SnapshotStore.toPhysical(folded, _))
        .getOrElse(folded),
      targetFiles))
    publish(toVersion, shared.unionByName(statsFor(names, manifestStatsCols(man)),
      allowMissingColumns = true),
      commitTs, evolvedSchema(fromVersion), dv = carryDv(fromVersion, shared),
      op = "compact", opParams = SnapshotStore.predSql(pred),
      metrics = Map("numAddedFiles" -> names.size.toLong,
        "numRemovedFiles" -> small.length.toLong))
    (man.count().toInt - small.length, names.size)
  }

  /** PARTITION-SCOPED Z-ORDER — Iceberg's rewrite_data_files with a
    * row filter: re-cluster ONLY the partitions `pred` selects on
    * `zCols`' Morton order (one tuple per file preserved, each
    * partition's files covering contiguous z ranges); everything else
    * carries by reference. Content-invariant: clustering moves rows
    * BETWEEN files, never changes them. Returns (filesCarried,
    * filesRewritten). */
  def zorderWhere(fromVersion: Long, toVersion: Long, pred: Column,
      zCols: Seq[String], numFiles: Int = 4,
      commitTs: Option[Long] = None): (Int, Int) = {
    val pcs = requirePartitioned("zorderWhere")
    requireFreeVersion(toVersion)
    require(zCols.nonEmpty, "zorderWhere: no z columns")
    val overlap = zCols.filter(pcs.contains)
    require(overlap.isEmpty,
      s"zorderWhere: ${overlap.mkString(", ")} are partition columns — constant " +
        "within every file already; z-order the finer dimensions instead")
    val man = manifest(fromVersion).materialize()
    val matched = partitionEntries(man, pcs).filter(coalesce(pred, lit(false)))
      .select("file").collect().map(_.getString(0)).toSet
    if (matched.isEmpty) {
      publish(toVersion, man, commitTs, evolvedSchema(fromVersion),
        dv = dvFrame(fromVersion), op = "zorder",
        opParams = SnapshotStore.predSql(pred), statsFrom = Some(fromVersion))
      return (man.count().toInt, 0)
    }
    val shared = man.join(nameFrame(matched), Seq("file"), "left_anti")
    val rows = readFiles(fromVersion,
      matched.toSeq.sorted.map(n => new Path(poolDir, n).toString))
    val zc = ZOrder.zColumn(rows, zCols)
    val arranged = rows.withColumn("__z", zc)
      .repartitionByRange(numFiles, (pcs.map(col) :+ col("__z")): _*)
      .sortWithinPartitions((pcs.map(col) :+ col("__z")): _*)
      .drop("__z")
    val names = landInPool(
      evolvedSchema(fromVersion).map(SnapshotStore.toPhysical(arranged, _))
        .getOrElse(arranged))
    publish(toVersion, shared.unionByName(statsFor(names, manifestStatsCols(man)),
      allowMissingColumns = true),
      commitTs, evolvedSchema(fromVersion), dv = carryDv(fromVersion, shared),
      op = "zorder", opParams = SnapshotStore.predSql(pred))
    (man.count().toInt - matched.size, names.size)
  }

  /** PARTITION-SCOPED DV fold — [[foldDv]] restricted to the masked
    * files inside the partitions `pred` selects: those rewrite (masked
    * rows drop for good), every other file carries by reference WITH
    * its mask intact. The targeted erasure-maintenance verb: folding
    * one tenant's partition never rewrites — or even lists — the
    * rest. Returns (filesCarried, filesRewritten, rowsDropped). */
  def foldDvWhere(fromVersion: Long, toVersion: Long, pred: Column,
      numNewFiles: Int = 2, commitTs: Option[Long] = None): (Int, Int, Long) = {
    val pcs = requirePartitioned("foldDvWhere")
    requireFreeVersion(toVersion)
    val man = manifest(fromVersion).materialize()
    dvFrame(fromVersion) match {
      case None =>
        publish(toVersion, man, commitTs, evolvedSchema(fromVersion),
          op = "foldDv", opParams = SnapshotStore.predSql(pred),
          statsFrom = Some(fromVersion))
        (man.count().toInt, 0, 0L)
      case Some(dv0) =>
        val dv = dv0.materialize()
        val matched = partitionEntries(man, pcs).filter(coalesce(pred, lit(false)))
          .select("file").collect().map(_.getString(0)).toSet
        val masked = dv.select("file").distinct().collect().map(_.getString(0))
          .filter(matched).toSet
        if (masked.isEmpty) {
          publish(toVersion, man, commitTs, evolvedSchema(fromVersion),
            dv = Some(dv), op = "foldDv",
            opParams = SnapshotStore.predSql(pred), statsFrom = Some(fromVersion))
          return (man.count().toInt, 0, 0L)
        }
        val maskedDf = nameFrame(masked)
        val nDropped = dv.join(maskedDf, Seq("file"), "left_semi").count()
        val shared = man.join(maskedDf, Seq("file"), "left_anti")
        val survivors = readFiles(fromVersion,
          masked.toSeq.sorted.map(n => new Path(poolDir, n).toString))
        val stats = landWithStats(arrange(survivors, numNewFiles),
          manifestStatsCols(man), evolvedSchema(fromVersion))
        val keep = dv.join(maskedDf, Seq("file"), "left_anti").materialize()
        publish(toVersion, stats.fold(shared)(shared.unionByName(_, allowMissingColumns = true)), commitTs,
          evolvedSchema(fromVersion),
          dv = if (keep.limit(1).count() == 0) None else Some(keep),
          op = "foldDv", opParams = SnapshotStore.predSql(pred))
        (shared.count().toInt, stats.fold(0L)(_.count()).toInt, nDropped)
    }
  }

  /** AUTO-MAINTENANCE hook — the per-micro-batch guard the streaming
    * sink wires in (`maxFilesPerCommit`): when the tip references more
    * than `maxFiles` pool files AND at least two are sub-`minBytes`
    * fragments, fold them ([[compact]]) into a fresh version. The
    * two-fragment guard keeps a large-file tip from publishing useless
    * no-op versions every batch. Returns the compacted version when it
    * ran. */
  def maybeCompact(maxFiles: Int, minBytes: Long = 8L << 20,
      targetFiles: Int = 4): Option[Long] = {
    val vs = versions()
    if (vs.isEmpty) return None
    val tip = vs.max
    val files = manifest(tip).select("file").collect().map(_.getString(0))
    if (files.length <= maxFiles) return None
    val pool = poolSizes()
    val fragments = files.count(n =>
      pool.getOrElse(n, fs.getFileStatus(new Path(poolDir, n)).getLen) < minBytes)
    if (fragments <= 1) None
    else { compact(tip, tip + 1, minBytes, targetFiles); Some(tip + 1) }
  }

  /** AUTO-RETENTION hook (`maxVersionsToKeep`): prune to the newest
    * `maxVersions` when the chain outgrows them — the streaming sink's
    * one-version-per-micro-batch growth bound. Returns versions
    * dropped. */
  def maybeRetain(maxVersions: Int): Int = {
    require(maxVersions >= 1, s"maybeRetain: need >= 1, got $maxVersions")
    val vs = versions()
    if (vs.size <= maxVersions) 0
    else { prune(vs.takeRight(maxVersions)): Unit; vs.size - maxVersions }
  }

  /** Drop all versions except `keep`. Manifests delete FIRST (a crash
    * leaves extra pool files, never a dangling manifest); pool files
    * no longer referenced by ANY surviving manifest are reclaimed by
    * [[vacuum]]. Returns bytes reclaimed. */
  def prune(keep: Seq[Long]): Long = {
    versions().filterNot(keep.contains).foreach(v => fs.delete(manifestDir(v), true))
    // the first surviving commit now counts "whole" for bytes — its
    // checkpoint entry is stale; rebuild from truth on next read
    invalidateHistoryCkpt()
    vacuum()
  }

  /** TIME-BASED retention — [[SnapshotStore.pruneOlderThan]]'s linked
    * twin (see there for the contract: strict-older-than boundary,
    * tip always survives, held versions REFUSE). Expired manifests
    * delete first, then the pool's ref-count sweep reclaims the
    * bytes no surviving manifest references. Returns (dropped
    * versions, bytes reclaimed). */
  def pruneOlderThan(horizonMs: Long): (Seq[Long], Long) = {
    val vs = versions()
    if (vs.isEmpty) return (Seq.empty, 0L)
    val ts = historyEntries().toMap
    val tip = vs.max
    val toDrop = vs.filter(v => v != tip && ts(v).commitTs < horizonMs)
    val blocked = holds().filter(toDrop.contains)
    if (blocked.nonEmpty) throw new RetentionHoldException(
      s"retention horizon $horizonMs selects held version(s) " +
        s"${blocked.mkString(", ")} on $basePath — release the hold(s) or " +
        "raise the horizon; refusing to report an un-honorable retention " +
        "contract as success")
    if (toDrop.isEmpty) return (Seq.empty, 0L)
    (toDrop, prune(vs.filterNot(toDrop.contains)))
  }

  /** Legal hold — [[SnapshotStore.hold]]'s linked twin (same
    * `_holds/<version>` marker contract): count-based [[prune]] is
    * caller-driven here, but [[pruneOlderThan]] and the catalog's
    * retention procedures honor holds. Idempotent. */
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

  /** Orphan audit — [[vacuum]]'s report-only twin: pool files
    * referenced by NO surviving manifest (leaked by a crashed writer,
    * a failed prune, or an out-of-band copy), as (file, bytes) rows.
    * The pre-delete review an operator runs before letting vacuum
    * loose, and the storage-accounting complement to
    * [[storageReport]] (which counts only REFERENCED bytes). Same
    * cost shape as vacuum: one metadata listing of the pool plus the
    * manifests' `file` column — no data file is opened. */
  /** Pool files referenced by NO surviving manifest — the ONE
    * traversal behind both [[orphans]] (report) and [[vacuum]]
    * (delete), so the audit can never preview a different set than
    * the sweep reclaims. */
  private def unreferencedPoolFiles(): Seq[org.apache.hadoop.fs.FileStatus] = {
    // registered shallow clones share this pool: their manifests'
    // references count too (a dropped clone's base is gone and simply
    // stops contributing). Metadata-sized: |clones| × Σ|manifests|.
    val cloneRefs: Seq[String] = registeredClones(basePath)
      .filter(b => fs.exists(new Path(b, "_manifests")))
      .flatMap { b =>
        val c = new ManifestStore(spark, b, "")
        c.versions().flatMap(v => c.manifest(v).select("file").collect().map(_.getString(0)))
      }
    val referenced: Set[String] = (versions()
      .flatMap(v => manifest(v).select("file").collect().map(_.getString(0)))
      ++ cloneRefs).toSet
    if (!fs.exists(poolDir)) Seq.empty
    else fs.listStatus(poolDir).toSeq
      .filter(st => st.isFile && !referenced(st.getPath.getName))
  }

  private def requirePoolOwner(op: String): Unit =
    require(isPoolOwner,
      s"$op must run on the pool owner ($poolOwnerBase) — this store is a " +
        "shallow clone reading a foreign pool, which is not its to reclaim")

  def orphans(): DataFrame = {
    import spark.implicits._
    requirePoolOwner("orphans")
    unreferencedPoolFiles().map(st => (st.getPath.getName, st.getLen))
      .toDF("file", "bytes")
  }

  /** Ref-count sweep: delete pool files referenced by NO surviving
    * manifest, plus aged crash leftovers (`.tmp-` dirs older than
    * `tmpTtlMs`). One metadata pass over |pool| + Σ|manifests| rows —
    * restartable at any point. Interrupted [[replicateTo]] manifest
    * copies are transactional state, not garbage: they land or
    * discard FIRST ([[recoverReplications]]), so the TTL pass can
    * never delete the only complete copy of a mirrored manifest. */
  def vacuum(tmpTtlMs: Long = 24L * 3600 * 1000): Long = {
    requirePoolOwner("vacuum")
    recoverReplications()
    recoverParityAsides() // a parked previous sidecar is state, not garbage
    var reclaimed = 0L
    unreferencedPoolFiles().foreach { st =>
      reclaimed += st.getLen
      fs.delete(st.getPath, false)
    }
    val now = System.currentTimeMillis()
    fs.listStatus(new Path(basePath)).foreach { st =>
      if (st.getPath.getName.startsWith(".tmp-") && now - st.getModificationTime > tmpTtlMs)
        fs.delete(st.getPath, true)
    }
    reclaimed
  }

  // -------------------------------------------------------------------
  // Durability ladder for the SHARED POOL — [[ChunkStore]]'s discipline
  // (XOR parity sidecars → mirror replicate/repair → rotating sampled
  // scrub) at pool-file granularity. A lost pool file today breaks
  // EVERY version whose manifest references it; these rungs restore it
  // without (parity) or with (mirror) a second repository. Pool files
  // are IMMUTABLE under stable names, which keeps every rung simple:
  // a parity index never sees an in-place rewrite (only appends and
  // vacuum deletions), a mirror sync is complete by name-diff, and a
  // repair verifies itself against the recorded md5 before landing.
  // All publication rides the store's tmp+rename/vacuum discipline.

  private def parityRoot = new Path(s"$basePath/_pool_parity")
  private def groupDir(g: String) = new Path(parityRoot, s"g=$g")

  /** Parity group of a pool file under a `chars`-wide scheme: the
    * first `chars` hex chars of its UUID-derived name — 16^chars
    * groups, uniformly spread, STABLE under appends (a new file joins
    * one group and touches no other group's sidecar). */
  private def parityGroupOf(name: String, chars: Int): String = name.take(chars)

  /** The LIVE scheme width, read off the sidecar dir names themselves
    * (every sidecar of one scheme shares the `g=<prefix>` width, so no
    * separate metadata file can drift from what is actually on disk);
    * 0 when no parity exists yet. */
  private def liveParityChars(): Int =
    if (!fs.exists(parityRoot)) 0
    else fs.listStatus(parityRoot).map(_.getPath.getName).filter(_.startsWith("g="))
      .map(_.length - 2).maxOption.getOrElse(0)

  /** The scheme width a pool of `nFiles` earns: the smallest prefix
    * whose 16^w groups hold ≈`parityFilesPerGroup` files each — the
    * scale knob that keeps single-loss-per-group coverage CONSTANT as
    * the pool grows (a fixed 16 groups would concentrate thousands of
    * files per group at 100 TB, making a correlated two-loss in one
    * group — which XOR parity refuses — ever more likely). Capped at
    * 8 chars: pool names embed a UUID whose 9th char is the hyphen,
    * and 16^8 groups is beyond any real pool anyway. */
  private def derivedParityChars(nFiles: Int): Int = {
    var c = 1
    while (c < 8 && (1L << (4 * c)) * parityFilesPerGroup < nFiles.toLong) c += 1
    c
  }

  private def poolFileNames(): Seq[String] =
    if (!fs.exists(poolDir)) Seq.empty
    else fs.listStatus(poolDir).filter(_.isFile).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toIndexedSeq

  /** One pass over the named pool files: (XOR of contents, index of
    * (name, bytes, md5)). The frame persists across the two actions so
    * every byte is READ ONCE; the XOR reduce combines map-side. */
  private def poolXorOf(names: Seq[String]): (Array[Byte], Seq[(String, Long, String)]) = {
    val spark0 = spark
    import spark0.implicits._
    val df = spark.read.format("binaryFile")
      .load(names.map(n => new Path(poolDir, n).toString): _*)
      .select(element_at(split(col("path"), "/"), -1).as("name"), col("content"))
      .as[(String, Array[Byte])]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val index = df.map(nc => (nc._1, nc._2.length.toLong, ChunkStore.md5hex(nc._2)))
        .collect().toSeq
      (df.map(_._2).reduce(ChunkStore.xorPad _), index)
    } finally df.unpersist(): Unit
  }

  /** Parse a group's sidecar index; empty when absent. */
  private def readPoolParityIndex(g: String): Seq[(String, Long, String)] = {
    val idxPath = new Path(groupDir(g), "index.tsv")
    if (!fs.exists(idxPath)) Seq.empty
    else {
      val in = fs.open(idxPath)
      val raw = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
      new String(raw, "UTF-8").split("\n").filter(_.nonEmpty).map { l =>
        val Array(n, len, m) = l.split("\t"); (n, len.toLong, m)
      }.toSeq
    }
  }

  /** The ONE sidecar publish (build + update): tmp dir under the store
    * root, xor.bin + index.tsv, rename-old-ASIDE + rename-new-in +
    * delete-old. A crash BETWEEN the two renames leaves the group with
    * no live `g=<prefix>` and the previous complete sidecar parked as
    * `.tmp-parityold-g=<prefix>-<uuid>` (the group rides in the name
    * so recovery knows where it belongs); [[recoverParityAsides]]
    * restores or retires it before every parity read/maintenance pass
    * AND before [[vacuum]]'s TTL sweep — the no-sidecar window is
    * closed by recovery, not merely narrowed. An unpublished
    * `.tmp-parity-*` ages out via vacuum. */
  private def publishPoolParity(g: String, parity: Array[Byte],
      index: Seq[(String, Long, String)]): Unit = {
    val tmp = new Path(s"$basePath/.tmp-parity-${java.util.UUID.randomUUID()}")
    fs.mkdirs(tmp)
    val out = fs.create(new Path(tmp, "xor.bin"), true)
    try out.write(parity) finally out.close()
    val idx = fs.create(new Path(tmp, "index.tsv"), true)
    try idx.write(index.sortBy(_._1).map { case (n, len, m) => s"$n\t$len\t$m" }
      .mkString("\n").getBytes("UTF-8"))
    finally idx.close()
    fs.mkdirs(parityRoot)
    val live = groupDir(g)
    val aside = new Path(s"$basePath/.tmp-parityold-g=$g-${java.util.UUID.randomUUID()}")
    val hadOld = fs.exists(live)
    if (hadOld && !fs.rename(live, aside))
      throw new java.io.IOException(s"pool parity retire failed for group $g")
    if (!fs.rename(tmp, live)) {
      if (hadOld) fs.rename(aside, live): Unit
      throw new java.io.IOException(s"pool parity publish failed for group $g")
    }
    if (hadOld) fs.delete(aside, true): Unit
  }

  /** Land or retire parked previous sidecars (the publish crash
    * window): live group dir absent → the aside IS the previous
    * complete sidecar, restore it; present → the publish completed,
    * retire the aside. Idempotent, metadata-only. Pre-group-tagged
    * asides (no `g=` in the name) are unplaceable and left to
    * vacuum's TTL. */
  private def recoverParityAsides(): Unit =
    if (fs.exists(new Path(basePath))) {
      fs.listStatus(new Path(basePath)).map(_.getPath)
        .filter(_.getName.startsWith(".tmp-parityold-g=")).foreach { aside =>
          val g = aside.getName.stripPrefix(".tmp-parityold-g=").takeWhile(_ != '-')
          fs.mkdirs(parityRoot)
          if (!fs.exists(groupDir(g))) fs.rename(aside, groupDir(g)): Unit
          else fs.delete(aside, true): Unit
        }
    }

  /** Build (or rebuild) the XOR parity sidecar of every non-empty pool
    * group — single-file-loss resilience WITHOUT a second repository
    * (the RAID-5 / par2 idea): each sidecar holds the byte-wise XOR of
    * its group's files (padded to the longest) plus an index of
    * (file, bytes, md5); losing ANY ONE indexed file reconstructs
    * exactly as parity ⊕ survivors ([[repairFromParity]]), verified
    * against the indexed md5 before it lands. Parity is ADVISORY state
    * with fail-closed semantics: files appended after the last build
    * are uncovered until the next [[updateParity]], and a repair can
    * never resurrect a vacuumed file (md5 verification refuses any
    * drifted reconstruction). Groups are independent — on a cluster
    * they pipeline. The group width derives from the CURRENT pool size
    * (see [[derivedParityChars]]), so coverage granularity scales with
    * the pool; a width change regroups wholesale, retiring old-scheme
    * sidecars only AFTER the new scheme is complete (no coverage
    * window with neither). This is the explicit full-rebuild API — it
    * trusts the pool as found; routine maintenance with damage
    * detection is [[updateParity]]. Returns sidecars (re)built. */
  def buildParity(): Long = {
    recoverParityAsides()
    var built = 0L
    val names = poolFileNames()
    val chars = derivedParityChars(names.size)
    names.groupBy(parityGroupOf(_, chars)).foreach { case (g, ns) =>
      val (parity, index) = poolXorOf(ns)
      publishPoolParity(g, parity, index)
      built += 1
    }
    if (fs.exists(parityRoot))
      fs.listStatus(parityRoot).map(_.getPath.getName)
        .filter(n => n.startsWith("g=") && n.length - 2 != chars)
        .foreach(n => fs.delete(new Path(parityRoot, n), true))
    built
  }

  /** INCREMENTAL parity maintenance — XOR parity is a group sum, so
    * the append-only steady state (every indexed file still present,
    * new merge output appended) folds in as parity' = parity ⊕
    * (⊕ new files) at O(|new files|) I/O. A group whose indexed files
    * vanished to VACUUM (no surviving manifest references them)
    * rebuilds from scratch; an uncovered group gets a fresh build.
    *
    * FAIL-CLOSED on damage: an indexed file that is missing yet still
    * MANIFEST-REFERENCED is a loss, not a reclaim — rebuilding that
    * group would overwrite the only parity able to reconstruct it, so
    * the group is SKIPPED and surfaced instead; run
    * [[repairFromParity]] first, then maintain. The retire pass honors
    * the same rule (a 1-file group whose only file is damage-lost is
    * exactly parity ⊕ nothing — deleting its sidecar would forfeit
    * the repair).
    *
    * Scheme migration: when the pool has outgrown the live group width
    * ([[derivedParityChars]] > live), maintenance regroups wholesale
    * via [[buildParity]] — the logarithmic re-granulation cost (at
    * pool sizes 16·N, 256·N, 4096·N…) that keeps per-group loss
    * coverage constant as the pool grows. Migration also defers to
    * repair when damage is present. Returns (incremental, rebuilt,
    * skipped group names). */
  def updateParity(): (Long, Long, Seq[String]) = {
    recoverParityAsides()
    var incremental = 0L; var rebuilt = 0L
    val skipped = Seq.newBuilder[String]
    val names = poolFileNames()
    val referenced: Set[String] = versions()
      .flatMap(v => manifest(v).select("file").collect().map(_.getString(0))).toSet
    val damaged = referenced.filterNot(names.toSet)
    val live = liveParityChars()
    val derived = derivedParityChars(names.size)
    if ((live == 0 || derived > live) && damaged.isEmpty)
      return (0L, buildParity(), Nil)
    val chars = math.max(live, 1)
    val present = names.groupBy(parityGroupOf(_, chars))
    present.foreach { case (g, ns) =>
      val index = readPoolParityIndex(g)
      val nameSet = ns.toSet
      val lost = index.map(_._1).filterNot(nameSet)
      val fresh = ns.filterNot(index.map(_._1).toSet)
      if (lost.exists(referenced)) skipped += g
      else if (index.isEmpty || lost.nonEmpty) {
        val (parity, idx) = poolXorOf(ns)
        publishPoolParity(g, parity, idx)
        rebuilt += 1
      } else if (fresh.nonEmpty) {
        val old = {
          val in = fs.open(new Path(groupDir(g), "xor.bin"))
          try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
        }
        val (freshXor, freshIdx) = poolXorOf(fresh)
        publishPoolParity(g, ChunkStore.xorPad(old, freshXor), index ++ freshIdx)
        incremental += 1
      }
    }
    // groups whose files ALL vanished: retire the stale sidecar so
    // repair/scrub never chase files vacuum legitimately reclaimed —
    // unless a referenced (damage-lost) file is among them (fail closed)
    if (fs.exists(parityRoot))
      fs.listStatus(parityRoot).map(_.getPath.getName)
        .filter(_.startsWith("g=")).map(_.drop(2))
        .filterNot(present.contains)
        .foreach { g =>
          if (readPoolParityIndex(g).exists(e => referenced(e._1))) skipped += g
          else { fs.delete(groupDir(g), true); rebuilt += 1 }
        }
    (incremental, rebuilt, skipped.result())
  }

  /** Reconstruct every single-file loss the parity sidecars cover:
    * a group missing EXACTLY ONE indexed file rebuilds it as
    * parity ⊕ surviving files, md5-verified before the tmp+rename
    * lands — after which every referencing version restores
    * byte-identical (content-stable names mean no manifest edit is
    * needed). Multi-loss groups, failed verifies, oversized entries
    * (in-memory assembly is Array-bounded at 2 GiB) and read errors
    * land on the unrepairable list — per-group honest refusals that
    * never abort the other groups' repairs; [[repairFrom]] (mirror)
    * is the next rung for them. Returns (repaired paths, unrepairable
    * group names). */
  def repairFromParity(): (Seq[String], Seq[String]) = {
    recoverParityAsides()
    val spark0 = spark
    import spark0.implicits._
    val repaired = Seq.newBuilder[String]
    val unrepairable = Seq.newBuilder[String]
    if (!fs.exists(parityRoot)) return (Nil, Nil)
    val present = poolFileNames().toSet
    fs.listStatus(parityRoot).map(_.getPath.getName)
      .filter(_.startsWith("g=")).map(_.drop(2)).sorted
      .foreach { g =>
        val index = readPoolParityIndex(g)
        val missing = index.filterNot(e => present(e._1))
        val xorBin = new Path(groupDir(g), "xor.bin")
        if (missing.size == 1 && !fs.exists(xorBin)) unrepairable += g
        else if (missing.size == 1) {
          val (lostName, lostLen, lostMd5) = missing.head
          try {
            if (lostLen > Int.MaxValue.toLong)
              throw new java.io.IOException(
                s"$lostName is ${lostLen} bytes — beyond in-memory parity assembly")
            val survivors = index.map(_._1).filter(present)
            val survivorXor =
              if (survivors.isEmpty) Array.empty[Byte]
              else spark.read.format("binaryFile")
                .load(survivors.map(n => new Path(poolDir, n).toString): _*)
                .select(col("content")).as[Array[Byte]]
                .reduce(ChunkStore.xorPad _)
            val parity = {
              val in = fs.open(xorBin)
              try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
            }
            val rebuiltBytes = java.util.Arrays.copyOf(
              ChunkStore.xorPad(parity, survivorXor), lostLen.toInt)
            if (ChunkStore.md5hex(rebuiltBytes) == lostMd5) {
              val tmp = new Path(poolDir, s".${lostName}.tmp-${java.util.UUID.randomUUID()}")
              val out = fs.create(tmp, true)
              try out.write(rebuiltBytes) finally out.close()
              if (!fs.rename(tmp, new Path(poolDir, lostName)))
                throw new java.io.IOException(s"repair publish failed: $lostName")
              repaired += new Path(poolDir, lostName).toString
            } else unrepairable += g
          } catch {
            case scala.util.control.NonFatal(_) => unrepairable += g
          }
        } else if (missing.size > 1) unrepairable += g
      }
    (repaired.result(), unrepairable.result())
  }

  /** Content scrub of the shared pool — `borg check` at pool-file
    * granularity: every parity-indexed file's bytes must re-derive
    * the indexed md5 (bit-rot, truncation, swapped content all
    * surface), every MANIFEST-referenced file must exist, and a
    * referenced file no sidecar indexes reports `uncovered` (appended
    * since the last parity build — [[updateParity]] is the cure).
    * One distributed pass over the slice's file bytes; unreferenced
    * unindexed files are [[orphans]]' jurisdiction, not damage.
    *
    * `rotation = (run, runsPerCycle)` makes the scrub SAMPLED and
    * deterministic on the parity groups (16^w for the live scheme
    * width w — see [[derivedParityChars]]): only groups with
    * hex(g) % runsPerCycle == run % runsPerCycle scan, so a nightly
    * `(dayOfYear, 7)` run reads ~1/7 of the pool and provably covers
    * every group each cycle — the coverage proof is width-independent
    * because hex(g) enumerates every group exactly once per scheme.
    * Returns (file, grp, bytes, status) with
    * status ok / bit_rot / missing_file / uncovered. */
  def scrubPool(rotation: Option[(Long, Int)] = None): DataFrame = {
    recoverParityAsides()
    val spark0 = spark
    import spark0.implicits._
    val chars = math.max(liveParityChars(), 1)
    def parityGroup(n: String): String = parityGroupOf(n, chars)
    def inRotation(g: String): Boolean = rotation match {
      case Some((run, n)) =>
        require(n > 0, s"runsPerCycle must be positive, got $n")
        java.lang.Long.parseLong(g, 16) % n == ((run % n) + n) % n
      case None => true
    }
    val present = poolFileNames().toSet
    val indexed: Map[String, (String, Long, String)] =
      (if (!fs.exists(parityRoot)) Nil
       else fs.listStatus(parityRoot).map(_.getPath.getName)
         .filter(_.startsWith("g=")).map(_.drop(2)).toSeq
         .flatMap(g => readPoolParityIndex(g).map(e => e._1 -> ((g, e._2, e._3)))))
        .toMap
    val referenced: Set[String] = versions()
      .flatMap(v => manifest(v).select("file").collect().map(_.getString(0))).toSet
    val slice = (indexed.keySet ++ referenced)
      .filter(n => inRotation(parityGroup(n)))
    val toScan = slice.filter(n => present(n) && indexed.contains(n)).toSeq.sorted
    val verdicts: Seq[(String, String, Long, String)] =
      (if (toScan.isEmpty) Nil
       else {
         val want = toScan.map(n => n -> indexed(n)._3).toMap
         spark.read.format("binaryFile")
           .load(toScan.map(n => new Path(poolDir, n).toString): _*)
           .select(element_at(split(col("path"), "/"), -1).as("name"), col("content"))
           .as[(String, Array[Byte])]
           .map { case (n, bytes) => (n, bytes.length.toLong, ChunkStore.md5hex(bytes)) }
           .collect().toSeq
           .map { case (n, len, m) =>
             (n, parityGroup(n), len,
               if (m == want(n)) "ok" else "bit_rot")
           }
       }) ++
      slice.filterNot(present).toSeq.sorted
        .map(n => (n, parityGroup(n), indexed.get(n).map(_._2).getOrElse(0L), "missing_file")) ++
      slice.filter(n => present(n) && !indexed.contains(n)).toSeq.sorted
        .map(n => (n, parityGroup(n),
          fs.getFileStatus(new Path(poolDir, n)).getLen, "uncovered"))
    verdicts.toDF("file", "grp", "bytes", "status")
  }

  /** One-directional mirror sync — the replication rung above parity:
    * pool files the mirror lacks stream over FIRST (immutable content
    * under stable names makes the diff a name compare), then absent
    * manifest versions land via complete-tmp + rename (crash rolls
    * forward through [[recoverReplications]]), and common versions'
    * manifests are fingerprint-compared — a mismatch (mirror-side
    * corruption: manifests are immutable once published) re-copies
    * from the source. Crash ordering is the store's own: data before
    * metadata, so the mirror can never hold a manifest referencing a
    * file it doesn't have. Mirror-only extra state is left alone —
    * replication must not race the mirror's retention. Idempotent:
    * an immediate second run copies nothing. Returns (filesCopied,
    * bytesCopied, versionsCopied, manifestsRepaired). */
  def replicateTo(targetBasePath: String): (Long, Long, Seq[Long], Int) = {
    require(targetBasePath != basePath, "replicate needs a distinct mirror root")
    val target = new ManifestStore(spark, targetBasePath, keyCol, statsCols)
    target.recoverReplications()
    target.ensureStoreMeta() // a promoted mirror keeps the DML contract
    val tfs = new Path(targetBasePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // 1. pool files the mirror lacks — per-file streaming copies into a
    // tmp dir, renamed in one-by-one (each rename atomic; a crash
    // leaves an aged .tmp- dir the mirror's vacuum sweeps)
    val missing = poolFileNames().filterNot(target.poolFileNames().toSet)
    var bytes = 0L
    if (missing.nonEmpty) {
      val tmp = new Path(s"$targetBasePath/.tmp-pool-repl-${java.util.UUID.randomUUID()}")
      tfs.mkdirs(tmp)
      tfs.mkdirs(target.poolDir)
      missing.foreach { n =>
        val src = new Path(poolDir, n)
        bytes += fs.getFileStatus(src).getLen
        if (!org.apache.hadoop.fs.FileUtil.copy(fs, src, tfs, new Path(tmp, n), false,
            spark.sparkContext.hadoopConfiguration))
          throw new java.io.IOException(s"pool replicate copy failed: $n")
        if (!tfs.rename(new Path(tmp, n), new Path(target.poolDir, n)))
          throw new java.io.IOException(s"pool replicate publish failed: $n")
      }
      tfs.delete(tmp, true): Unit
    }
    // 2. manifest versions the mirror lacks
    val newVs = versions().diff(target.versions())
    newVs.foreach(v => target.landManifestCopy(fs, manifestDir(v), v))
    // 3. fingerprint audit of common versions (immutable ⇒ any drift
    // is mirror-side damage; source is the authority)
    val common = versions().intersect(target.versions()).diff(newVs)
    val stale = common.filter(v => manifestFingerprint(v) != target.manifestFingerprint(v))
    stale.foreach(v => target.landManifestCopy(fs, manifestDir(v), v))
    (missing.size.toLong, bytes, newVs, stale.size)
  }

  /** (row count, bit_xor row hash) — the cheap manifest-identity check
    * [[replicateTo]] compares across repositories; metadata-sized. */
  private def manifestFingerprint(v: Long): (Long, Long) = {
    val r = manifest(v)
      .select(xxhash64(col("file"), col("n_rows")).as("__h"))
      .agg(count(lit(1)), expr("coalesce(bit_xor(__h), 0L)")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Land a verbatim copy of a source manifest dir as version `v` —
    * complete tmp then delete-live + atomic rename; the tmp is always
    * a COMPLETE manifest, so the crash window rolls forward via
    * [[recoverReplications]]. */
  private def landManifestCopy(srcFs: org.apache.hadoop.fs.FileSystem,
      src: Path, v: Long): Unit = {
    val tmp = new Path(s"$basePath/_manifests/.tmp-repl-v=$v")
    fs.delete(tmp, true)
    if (!org.apache.hadoop.fs.FileUtil.copy(srcFs, src, fs, tmp, false,
        spark.sparkContext.hadoopConfiguration))
      throw new java.io.IOException(s"replicate manifest copy failed: $src -> $tmp")
    val live = manifestDir(v)
    fs.delete(live, true)
    if (!fs.rename(tmp, live))
      throw new java.io.IOException(s"replicate manifest publish failed: $tmp -> $live")
  }

  /** Land (or discard) interrupted [[replicateTo]] manifest copies —
    * a `.tmp-repl-v=` dir is always complete, so live-missing rolls
    * FORWARD; live-present discards the superseded copy (the next
    * replicate re-derives it from the fingerprint compare). Called by
    * [[replicateTo]] (target side) and [[vacuum]]. */
  def recoverReplications(): Unit = {
    val mdir = new Path(s"$basePath/_manifests")
    if (fs.exists(mdir))
      fs.listStatus(mdir).toSeq
        .filter(_.getPath.getName.startsWith(".tmp-repl-v="))
        .foreach { st =>
          val v = st.getPath.getName.stripPrefix(".tmp-repl-v=").toLong
          val live = manifestDir(v)
          if (!fs.exists(live)) {
            if (!fs.rename(st.getPath, live))
              throw new java.io.IOException(
                s"replication recovery failed: ${st.getPath} -> $live")
          } else fs.delete(st.getPath, true): Unit
        }
  }

  /** DISASTER-RECOVERY REPAIR from a mirror — the rung above parity,
    * for damage parity can't serve (multi-loss groups, bit-rot plus
    * loss): every pool file [[scrubPool]] flags (missing / bit-rot)
    * heals from the mirror's copy, md5-verified against the parity
    * index when indexed (an unindexed reference copies as-is — the
    * downstream [[validate]] row-count/envelope audit is its check).
    * Per-file tmp+rename, per-file honest refusals (mirror lacks it /
    * verify fails) — a partial heal repairs what it can and names the
    * rest. Missing manifest versions are NOT pulled back here:
    * restore direction is an operator decision ([[replicateTo]] from
    * the mirror covers it). Returns (repaired paths, unrepairable
    * file names). */
  def repairFrom(mirrorBasePath: String): (Seq[String], Seq[String]) = {
    require(mirrorBasePath != basePath, "repair needs a distinct mirror root")
    val mirror = new ManifestStore(spark, mirrorBasePath, keyCol, statsCols)
    val mfs = new Path(mirrorBasePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val indexed: Map[String, String] =
      (if (!fs.exists(parityRoot)) Nil
       else fs.listStatus(parityRoot).map(_.getPath.getName)
         .filter(_.startsWith("g=")).map(_.drop(2)).toSeq
         .flatMap(g => readPoolParityIndex(g).map(e => e._1 -> e._3))).toMap
    val damaged = scrubPool()
      .filter(col("status") === "bit_rot" || col("status") === "missing_file")
      .select("file").collect().map(_.getString(0)).toSeq.sorted
    val repaired = Seq.newBuilder[String]
    val unrepairable = Seq.newBuilder[String]
    damaged.foreach { n =>
      val src = new Path(mirror.poolDir, n)
      try {
        if (!mfs.exists(src))
          throw new java.io.IOException(s"mirror lacks $n")
        val tmp = new Path(poolDir, s".$n.tmp-${java.util.UUID.randomUUID()}")
        if (!org.apache.hadoop.fs.FileUtil.copy(mfs, src, fs, tmp, false,
            spark.sparkContext.hadoopConfiguration))
          throw new java.io.IOException(s"mirror copy failed: $n")
        val ok = indexed.get(n).forall { wantMd5 =>
          val in = fs.open(tmp)
          val raw = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
          ChunkStore.md5hex(raw) == wantMd5
        }
        if (!ok) { fs.delete(tmp, false); unrepairable += n }
        else {
          fs.delete(new Path(poolDir, n), false) // bit-rot victim, if present
          if (!fs.rename(tmp, new Path(poolDir, n)))
            throw new java.io.IOException(s"repair publish failed: $n")
          repaired += new Path(poolDir, n).toString
        }
      } catch {
        case scala.util.control.NonFatal(_) => unrepairable += n
      }
    }
    (repaired.result(), unrepairable.result())
  }
}

object ManifestStore {
  import org.apache.hadoop.fs.FileSystem

  private[operators] def clonesPath(base: String) = new Path(base, "_clones.json")
  private[operators] def clonesAside(base: String) = new Path(base, "_clones.json.old")

  /** Clone bases registered with the pool owner at `base`. Falls back
    * to the registration aside when a crash parked the live file
    * mid-update. Shared by the store and the SQL catalog's
    * destructive verbs (DROP TABLE / RENAME TO must not strand a
    * live clone's pool). */
  def registeredClonesAt(fs: FileSystem, base: String): Seq[String] = {
    val p = if (fs.exists(clonesPath(base))) clonesPath(base) else clonesAside(base)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      // fixed-shape sidecar written only by registerClone: the quoted
      // strings inside the [...] list are the clone bases
      val list = txt.substring(txt.indexOf('[') + 1, txt.lastIndexOf(']'))
      "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(list)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
    }
  }

  /** Registered clones that still exist on disk. A dropped clone needs
    * no deregistration — it simply stops counting; a LIVE one is a
    * hard reference the owner's destructive verbs must refuse to
    * strand. */
  def liveClonesAt(fs: FileSystem, base: String): Seq[String] =
    registeredClonesAt(fs, base).filter { b =>
      try fs.exists(new Path(b, "_manifests"))
      catch { case _: java.io.IOException => false }
    }
}
