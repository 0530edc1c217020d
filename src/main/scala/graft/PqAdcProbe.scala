package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (r18): phase breakdown of sim_pq_adc's wall clock —
  * construction (incl. the codebook collect job), analysis+optimization,
  * physical planning, and execution (incl. AQE re-planning) — plus
  * logical-plan node counts, to locate the ~1.1 s gap between the
  * driver's 1.55 s wall and 0.40 s summed task time (VERDICT r17 #1).
  *
  * Usage: runMain graft.PqAdcProbe [sfDir] [reps]
  */
object PqAdcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft_pq_probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = GraftQuery.all.find(_.name == "sim_pq_adc").get
    def t[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    (0 to reps).foreach { i =>
      val (df, tBuild) = t(q.fn(spark, sfDir))
      val (_, tOpt) = t(df.queryExecution.optimizedPlan)
      val nNodes = df.queryExecution.optimizedPlan.map(_ => 1).sum
      val nExprs = df.queryExecution.optimizedPlan
        .map(p => p.expressions.map(e => e.collect { case x => x }.size).sum).sum
      val (_, tPlan) = t(df.queryExecution.executedPlan)
      val (_, tExec) = t(df.write.format("noop").mode("overwrite").save())
      val tag = if (i == 0) "warm" else s"rep$i"
      println(f"[pqprobe] $tag build=$tBuild%.3f opt=$tOpt%.3f plan=$tPlan%.3f " +
        f"exec=$tExec%.3f total=${tBuild + tOpt + tPlan + tExec}%.3f " +
        f"nodes=$nNodes exprNodes=$nExprs")
    }
    spark.stop()
  }
}
