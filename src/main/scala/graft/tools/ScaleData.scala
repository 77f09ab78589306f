package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Synthesizes an sf×`factor` dataset from an existing sf dir by key-
  * shifted replication — the input for the scaling checkpoint (no
  * sf1 exists in /root/testdata and it is read-only). Per replica i:
  *
  *  - every primary key and the foreign keys referencing it shift by
  *    i·(max+1), so joins stay referentially intact and group/distinct
  *    cardinalities scale with the data (a naive union of identical
  *    rows would collapse them);
  *  - region/nation stay fixed (dimensions don't grow with fact data —
  *    the realistic shape: 10× facts per nation);
  *  - TEMPORAL columns (event ts, order/ship dates) shift by i·span, so
  *    the time axis grows with the data instead of densifying a fixed
  *    span — replicating into the same period makes every
  *    point-in-interval join's OUTPUT quadratic in the factor (10×
  *    points × 10× windows in the same bins), which measures a
  *    different workload, not a bigger one. With the shift, absolute
  *    date filters (the TPC-H queries' fixed windows) select a
  *    constant slice of a 10× corpus — exactly the
  *    history-accumulates / query-recent production shape;
  *  - document TEXT gets a per-replica suffix on every word, so no
  *    cross-replica near-duplicates exist and pairwise dedup work
  *    scales linearly (exact replicas would grow candidate pairs
  *    quadratically);
  *  - embeddings get a per-replica cyclic coordinate shift +
  *    alternating sign flips — a DIRECTION-mixing transform.
  *    (A first attempt used per-dimension rescaling, which preserves
  *    direction: replicas stayed ~0.95-cosine near-duplicates of
  *    their source, and the sf1 bench read dedup_embcos_lsh at 131× —
  *    every LSH bucket held all ten copies. Perturbations must break
  *    the metric the workload buckets by.)
  *
  * Usage: runMain graft.tools.ScaleData <srcSfDir> <dstDir> [factor] */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = spark.range(factor).toDF("__rep")
    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def off(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L
    // Scaled FACT tables must land in enough part files (and therefore
    // row groups) to parallelize a plain scan: Spark assigns a parquet
    // split real work only when a row group STARTS inside it, so a
    // 74 MB single-row-group documents file reads as ONE partition and
    // every narrow map-only text query over it runs single-threaded —
    // which is what the r12 sf10 probe of text_anonymize measured
    // (188 s, ~22×/decade) before this fix: a testdata-layout
    // artifact, not an engine cost. 4×factor files ≈ tens of MB each
    // at these scales; fixed dims stay single-file.
    def write(df: DataFrame, t: String): Unit = {
      val out =
        if (t == "region" || t == "nation") df.coalesce(1)
        else df.repartition(math.max(8, 4 * factor))
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scale] $t -> ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
    def shift(c: String, o: Long) = (col(c) + col("__rep") * lit(o)).as(c)

    // fixed dimensions: copy as-is
    write(load("region"), "region")
    write(load("nation"), "nation")

    val (customer, supplier, part, orders0, lineitem0) =
      (load("customer"), load("supplier"), load("part"), load("orders"), load("lineitem"))
    val (cOff, sOff, pOff, oOff) = (off(customer, "c_custkey"),
      off(supplier, "s_suppkey"), off(part, "p_partkey"), off(orders0, "o_orderkey"))

    write(customer.crossJoin(reps).select(shift("c_custkey", cOff),
      col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")), "customer")
    write(supplier.crossJoin(reps).select(shift("s_suppkey", sOff),
      col("s_name"), col("s_nationkey"), col("s_acctbal")), "supplier")
    write(part.crossJoin(reps).select(shift("p_partkey", pOff),
      col("p_name"), col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")), "part")
    // one shift unit > the full order..ship span, so replica i's whole
    // business history sits after replica i-1's
    val spanDays = 2600L
    def shiftTs(c: String) =
      expr(s"timestampadd(DAY, __rep * $spanDays, $c)").as(c)
    write(orders0.crossJoin(reps).select(shift("o_orderkey", oOff),
      shift("o_custkey", cOff), col("o_orderstatus"), col("o_totalprice"),
      shiftTs("o_orderdate"), col("o_orderpriority")), "orders")
    write(lineitem0.crossJoin(reps).select(shift("l_orderkey", oOff),
      shift("l_partkey", pOff), shift("l_suppkey", sOff), col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), shiftTs("l_shipdate")), "lineitem")

    // events: the source's ts physical unit is FOOTER-DETECTED (the
    // generator has flipped between bare-INT64 ns and TIMESTAMP µs —
    // Tables.events' discipline; assuming ns against a µs source
    // inflates the replica shift 1000× AND hands the reader an
    // un-annotated copy it mis-decodes, collapsing the time axis to
    // days at 33× density — the r10 sf1 ev_sliding blowup). Whatever
    // the source, rows normalize to epoch-µs longs here and the copy
    // WRITES annotated TIMESTAMP_MICROS, so readers never re-detect.
    val events = Tables.events(spark, src) // unit-exact decode to TIMESTAMP
      .withColumn("ts", unix_micros(col("ts")))
    val (eOff, uOff) = (off(events, "event_id"), off(events, "user_id"))
    // µs timestamps shift by i·(span + 1 day): the event-time axis
    // grows with the data (fixed-span densification would make every
    // windowed/interval join's output quadratic in the factor)
    val b = events.agg(min(col("ts")), max(col("ts"))).head()
    val spanUs = b.getLong(1) - b.getLong(0) + 86400L * 1000000L
    write(events.crossJoin(reps).select(shift("event_id", eOff),
      timestamp_micros(col("ts") + col("__rep") * lit(spanUs)).as("ts"),
      shift("user_id", uOff), col("event_type"), col("value"), col("props")), "events")

    val documents = load("documents")
    val dOff = off(documents, "doc_id")
    write(documents.crossJoin(reps).select(shift("doc_id", dOff),
      when(col("__rep") === 0, col("text")).otherwise(
        concat_ws(" ", transform(split(col("text"), " "),
          w => concat(w, lit("r"), col("__rep"))))).as("text"),
      col("lang"), col("source"),
      when(col("__rep") === 0, col("n_chars")).otherwise(
        length(concat_ws(" ", transform(split(col("text"), " "),
          w => concat(w, lit("r"), col("__rep")))))).as("n_chars")), "documents")

    val embeddings = load("embeddings")
    val vOff = off(embeddings, "vec_id")
    val d0 = size(col("embedding"))
    write(embeddings.crossJoin(reps).select(shift("vec_id", vOff),
      when(col("__rep") === 0, col("embedding")).otherwise(
        transform(sequence(lit(0), d0 - 1),
          j => (element_at(col("embedding"),
              ((j + lit(7) * col("__rep")) % d0).cast("int") + 1)
            * when(((j + col("__rep")) % 2) === 0, lit(1.0f)).otherwise(lit(-1.0f)))
            .cast("float"))).as("embedding"),
      col("label")), "embeddings")

    // binary media table over the scaled doc ids: encoders run ONCE
    // here, so mm_ queries at this scale measure decode, not encode
    MediaGen.writeMedia(spark, dst)

    spark.stop()
  }
}
