package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: execute a named query and print the FINAL adaptive plan
  * (AQEShuffleRead visibility). Usage: runMain graft.FinalPlan <name> [sfDir]
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft_finalplan")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = GraftQuery.all.find(_.name == name)
      .getOrElse(sys.error(s"no such query: $name"))
    val df = q.fn(spark, sfDir)
    df.collect()
    println("==== FINAL PLAN " + name + " ====")
    println(df.queryExecution.executedPlan.toString)
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec =>
          println(s"AQEShuffleRead: ${r.partitionSpecs.length} partitions <- " +
            r.child.simpleStringWithNodeId())
          r.children.foreach(walk)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(s.plan)
        case other => other.children.foreach(walk)
      }
    }
    walk(df.queryExecution.executedPlan)
    spark.stop()
  }
}
