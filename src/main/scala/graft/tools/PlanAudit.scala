package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Explain-plan audit: prints, per query, the scan pushdown evidence
  * (PushedFilters / ReadSchema), join strategies chosen, and
  * WholeStageCodegen coverage — the three things SURVEY §5 requires a
  * plan to show before an operator counts as scale-ready. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // static plans: AQE wraps everything in AdaptiveSparkPlan and
      // hides codegen stage boundaries until execution
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq.distinct
      val schemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toSeq.distinct
      val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct")
        .map(j => j -> j.r.findAllIn(plan).size).filter(_._2 > 0)
      // codegen'd operators print as "*(N) Op"; count distinct stage ids
      val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
      val exchanges = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
        .findAllIn(plan).size
      println(s"== $name")
      pushed.foreach(p => println(s"   $p"))
      schemas.foreach(s0 => println(s"   ${s0.take(150)}"))
      if (joins.nonEmpty) println(s"   joins: ${joins.map { case (j, n) => s"$j x$n" }.mkString(", ")}")
      println(s"   WholeStageCodegen spans: $wsc, shuffles: $exchanges")
    }
    spark.stop()
  }
}
