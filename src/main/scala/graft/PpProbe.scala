package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** One-off stage-level attribution probe for `dd_jaccard_ppjoin`
  * (VERDICT r12 work): runs the query at the bench config and prints
  * per-stage summed executor task time, so a task-second delta between
  * prefix-derivation variants can be pinned to the stage that pays it
  * instead of argued from totals. Usage:
  *   sbt "runMain graft.PpProbe /root/testdata/sf0.1 <reps>"
  */
object PpProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft_pp_probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = GraftQuery.all.find(_.name == "dd_jaccard_ppjoin").get
    // warmup (codegen + JIT)
    q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    (1 to reps).foreach { rep =>
      val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Long)]
      val listener = new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          stages.add((si.stageId,
            si.name.takeWhile(_ != '\n').take(80),
            si.taskMetrics.executorRunTime,
            si.numTasks.toLong))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.GraftPlans.drainListenerBus(spark)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val rows = stages.iterator().asScala.toList.sortBy(-_._3)
      println(f"== rep $rep wall $wall%.2f s, total task " +
        f"${rows.map(_._3).sum / 1000.0}%.2f s, ${rows.size} stages ==")
      rows.take(12).foreach { case (id, name, ms, n) =>
        println(f"  stage $id%4d $ms%7d ms  $n%3d tasks  $name")
      }
    }
    spark.stop()
  }
}
