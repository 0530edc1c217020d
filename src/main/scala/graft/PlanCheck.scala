package graft

import org.apache.spark.sql.SparkSession

/** Plan-hygiene inspector: prints the physical-plan lines that matter for
  * scale (pushed filters, read schemas, join strategies, top-k operator,
  * codegen spans) for the named queries — or all of them.
  *
  *   runMain graft.PlanCheck [sfDir] [queryName ...]
  */
object PlanCheck {

  private val interesting = Seq(
    "PushedFilters", "ReadSchema", "BroadcastHashJoin", "SortMergeJoin",
    "BroadcastNestedLoopJoin", "TakeOrderedAndProject", "WholeStageCodegen",
    "Exchange", "HashAggregate")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else GraftQuery.all.map(_.name)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"===== $name")
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      println(plan.linesIterator
        .filter(l => interesting.exists(l.contains))
        .mkString("\n"))
    }
    spark.stop()
  }
}
