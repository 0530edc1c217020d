package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (r18): execute a named query and print per-operator metrics
  * from the FINAL adaptive plan — shuffle bytes/records per Exchange,
  * output rows and timing per operator — so shuffle totals from the bench
  * can be attributed to individual exchanges before cutting them.
  *
  * Usage: runMain graft.ExchangeProbe <name> [sfDir]
  */
object ExchangeProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft_exchangeprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = GraftQuery.all.find(_.name == name)
      .getOrElse(sys.error(s"no such query: $name"))
    val df = q.fn(spark, sfDir)
    // collect(), not a noop write: the write would build its OWN
    // QueryExecution and leave this one's metrics untouched
    df.collect()
    val interesting = Set("numOutputRows", "shuffleBytesWritten",
      "shuffleRecordsWritten", "dataSize", "aggTime", "sortTime",
      "shuffleWriteTime", "buildTime", "collectTime", "numFiles",
      "filesSize", "spillSize")
    def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, depth)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(s.plan, depth)
        case other =>
          val ms = other.metrics.toSeq
            .filter { case (k, m) => interesting(k) && m.value > 0 }
            .map { case (k, m) => s"$k=${m.value}" }
            .sorted.mkString(" ")
          println(("  " * depth) + other.nodeName +
            (if (ms.nonEmpty) s"  [$ms]" else ""))
          other.children.foreach(walk(_, depth + 1))
          other match {
            case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
              b.child.children.foreach(_ => ())
            case _ => ()
          }
      }
    }
    println(s"==== METRICS $name ====")
    walk(df.queryExecution.executedPlan, 0)
    spark.conf.getAll.filter(_._1.startsWith("spark.graft.debug."))
      .foreach { case (k, v) => println(s"[debug-conf] $k=$v") }
    spark.stop()
  }
}
