package graft.tools

/** Prints the driver-contract counts; build hygiene helper. */
object CountQ {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    println(s"rowsOnly=${(q -- o).toSeq.sorted.mkString(",")}")
    println(s"orphanOracles=${(o -- q).toSeq.sorted.mkString(",")}")
  }
}
