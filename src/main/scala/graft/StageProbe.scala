package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Generalized stage-level attribution probe (PpProbe for any query):
  * runs a named query at the bench config and prints per-stage summed
  * executor task time, task counts, and shuffle bytes, so a task-second
  * total can be pinned to the stage that pays it.
  *
  * Usage: runMain graft.StageProbe <queryName> [sfDir] [reps]
  */
object StageProbe {

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft_stage_probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf experiments: SPARK_GRAFT_PROBE_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = GraftQuery.all.find(_.name == name)
      .getOrElse(sys.error(s"no such query: $name"))
    // warmup (codegen + JIT)
    q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    (1 to reps).foreach { rep =>
      final case class St(id: Int, name: String, runMs: Long, tasks: Long,
        shuffleBytes: Long, cpuMs: Long, gcMs: Long, fetchMs: Long,
        spillBytes: Long)
      val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]
      val taskRuns = new java.util.concurrent.ConcurrentHashMap[
        Int, java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]]
      val listener = new SparkListener {
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
          if (te.taskMetrics != null) {
            taskRuns.computeIfAbsent(te.stageId,
              _ => new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)])
              .add((te.taskMetrics.executorRunTime,
                te.taskMetrics.executorCpuTime / 1000000L))
          }
        }
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val tm = si.taskMetrics
          val rdds = si.rddInfos.sortBy(_.id).map(_.name).distinct.mkString(">")
          stages.add(St(si.stageId,
            rdds.take(120),
            tm.executorRunTime,
            si.numTasks.toLong,
            tm.shuffleWriteMetrics.bytesWritten,
            tm.executorCpuTime / 1000000L,
            tm.jvmGCTime,
            tm.shuffleReadMetrics.fetchWaitTime,
            tm.memoryBytesSpilled))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.GraftPlans.drainListenerBus(spark)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val rows = stages.iterator().asScala.toList.sortBy(-_.runMs)
      println(f"== rep $rep wall $wall%.2f s, total task " +
        f"${rows.map(_.runMs).sum / 1000.0}%.2f s (cpu ${rows.map(_.cpuMs).sum / 1000.0}%.2f s, " +
        f"gc ${rows.map(_.gcMs).sum / 1000.0}%.2f s), " +
        f"${rows.size} stages, ${rows.map(_.tasks).sum} tasks ==")
      rows.take(14).foreach { r =>
        println(f"  stage ${r.id}%4d run ${r.runMs}%7d ms cpu ${r.cpuMs}%7d ms " +
          f"gc ${r.gcMs}%5d ms fetch ${r.fetchMs}%5d ms spill ${r.spillBytes / 1e6}%6.1f MB " +
          f"${r.tasks}%3d tasks ${r.shuffleBytes / 1e6}%8.1f MB  ${r.name.take(40)}")
        if (sys.env.contains("SPARK_GRAFT_PROBE_TASKS")) {
          import scala.jdk.CollectionConverters._
          Option(taskRuns.get(r.id)).foreach { q =>
            val ts = q.iterator().asScala.toList.sortBy(-_._1)
            println("      tasks(run/cpu ms): " + ts.take(32).map {
              case (rn, cp) => s"$rn/$cp" }.mkString(" "))
          }
        }
      }
    }
    spark.stop()
  }
}
