package graft

class SparkEntrySpec extends SparkSpec {

  test("entry (driver smoke) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query returns rows at sf0.001 (driver gate precondition)") {
    val empty = SparkEntry.queries.collect {
      case (name, fn) if fn(spark, sfDir).isEmpty => name
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }
}
