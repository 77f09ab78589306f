package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression pin for the Spark mechanism SnapshotCatalog's fill
  * projection rides: EXISTS_DEFAULT field metadata makes the parquet
  * reader fill MISSING columns with the default instead of null. If a
  * Spark upgrade drops this, the catalog's SQL/API fill convergence
  * breaks here first, by name. */
class DefaultColumnsSpec extends SparkSpec {
  import spark.implicits._

  test("EXISTS_DEFAULT metadata fills missing columns at scan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-exdef").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(s"$dir/p")
    val md = new MetadataBuilder()
      .putString("EXISTS_DEFAULT", "42").putString("CURRENT_DEFAULT", "42").build()
    val sc = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("extra", LongType, nullable = true, md)))
    val got = spark.read.schema(sc).parquet(s"$dir/p")
      .select("k", "extra").collect().map(r => (r.getLong(0), r.isNullAt(1) match {
        case true => -1L; case false => r.getLong(1) })).toSet
    println(s"V1 read result: $got")
    val mdS = new MetadataBuilder()
      .putString("EXISTS_DEFAULT", "'zz'").putString("CURRENT_DEFAULT", "'zz'").build()
    val sc2 = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("extraS", StringType, nullable = true, mdS)))
    val got2 = spark.read.schema(sc2).parquet(s"$dir/p")
      .select("extraS").collect().map(r => Option(r.getString(0))).toSet
    println(s"V1 string default: $got2")
    assert(got == Set((1L, 42L), (2L, 42L)))
    assert(got2 == Set(Some("zz")))
  }
}
