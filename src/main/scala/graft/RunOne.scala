package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run one named query N times against an SF dir and print
  * per-run wall times plus the executed plan on request.
  *
  * Usage: runMain graft.RunOne <queryName> [sfDir] [runs] [explain]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val doExplain = args.length > 3 && args(3) == "explain"
    val doShow = args.length > 3 && args(3) == "show"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft_runone")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = GraftQuery.all.find(_.name == name)
      .getOrElse(sys.error(s"no such query: $name"))
    if (doExplain) q.fn(spark, sfDir).explain("formatted")
    if (doShow) q.fn(spark, sfDir).show(100, truncate = false)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[runone] $name run $i: $dt%.3f s")
    }
    spark.stop()
  }
}
