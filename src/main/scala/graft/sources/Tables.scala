package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-aware readers for the lake tables.
  *
  * All graft operators read through here so that a future move from
  * local parquet to a real lake layout (partitioned dirs, Delta-style
  * manifests, ADLS URIs) is a one-file change. Readers are plain
  * `spark.read.parquet` so Catalyst keeps full pushdown/pruning:
  * `.explain` on any graft query shows PushedFilters + a ReadSchema
  * restricted to the referenced columns.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = tpch ++ Seq("events", "documents", "embeddings")

  /** Load one table from a scale-factor directory. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts is nanosecond-precision in parquet, which Spark 4's
    * schema INFERENCE refuses to map to a timestamp. Supplying the
    * schema explicitly (ts as BIGINT — the vectorized reader decodes
    * INT64(TIMESTAMP_NANOS) into a long without any legacy conf)
    * sidesteps inference entirely: no session conf is touched, so a
    * shared session's other parquet reads are unaffected (the r2
    * version set `spark.sql.legacy.parquet.nanosAsLong` globally per
    * call — a side effect on shared sessions). The raw ns long is
    * converted to a µs timestamp with integer `div`, never double
    * division, which would lose precision on ~1.7e18 values. */
  private val eventsSchema =
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
  def events(s: SparkSession, d: String): DataFrame =
    s.read.schema(eventsSchema).parquet(s"$d/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Content fingerprint of one table in a testdata dir — keys the
    * bench-only persisted-index caches the `queries()` entries build.
    * Metadata-sized (one file listing, no data scan): md5 over (dir,
    * every file's name/len/mtime), so a regenerated table at the same
    * path — or two dirs whose `String.hashCode` would collide — never
    * reuses a stale artifact. */
  def fingerprint(s: SparkSession, dir: String, table: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val sig = fs.listStatus(p)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir|$sig".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }

  /** Write a snapshot copy partitioned by the given columns — the
    * full-backup primitive. Partition columns become directory keys so
    * restores and incremental diffs prune at the file level.
    */
  def writeSnapshot(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Schema-enforced CSV reader (header, explicit schema — no
    * inference pass over 100 TB). */
  def readCsv(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** Schema-enforced JSON-lines reader. */
  def readJson(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Schema-enforced ORC reader — the other columnar lake format a
    * backup surface meets; same no-inference contract as
    * [[readCsv]]/[[readJson]]. */
  def readOrc(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Export a snapshot as CSV/JSON/ORC (interchange sinks for the
    * backup surface; parquet remains the canonical format). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
