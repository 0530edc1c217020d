package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level attribution probe for the persisted exact-similarity
  * index BUILD (VERDICT r13 #1: writeIndex at 10M costs 377.7 s vs
  * 281.8 s for a full pair mine and 40.3 s for the LSH index build —
  * find which stages pay the difference before touching code). Runs the
  * requested variants in order with per-stage summed executor task time
  * and shuffle/spill bytes, on the same planted graft-docs corpus and
  * corpus-scaled shuffle width as ScaleSmoke, so probe stages match the
  * marathon's plans.
  *
  *   runMain graft.PpBuildProbe [nDocs] [cpus] [order]
  *
  * Variants (comma list, repeats allowed):
  *   build    — PrefixFilterJoin.writeIndex (sets, freq, prefix, pstats)
  *   mine     — PrefixFilterJoin.pairs(...).count() (the comparison bar)
  *   lshbuild — NearDupLsh.writeIndex (the cheap-index comparison bar)
  */
object PpBuildProbe {

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = args.lift(1).getOrElse("32")
    val order = args.lift(2).getOrElse("build,mine,build")
      .split(",").toSeq
    val shuffleWidth = math.max(cpus.toInt, (nDocs / 50000L).toInt)
    def loadAvg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val spark = SparkSession.builder()
      .master(s"local[$cpus,4]")
      .appName("graft_pp_build_probe")
      .config("spark.sql.shuffle.partitions", shuffleWidth)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dupDocs = spark.read
      .format("graft-docs")
      .option("rows", nDocs)
      .option("partitions", cpus.toInt * 2)
      .option("seed", 42)
      .option("vocabSize", 50000)
      .option("dupRate", 0.05)
      .load()
      .select(col("doc_id"), col("text"))

    def reclaim(paths: String*): Unit = {
      paths.foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
      }
      System.gc()
    }

    order.zipWithIndex.foreach { case (variant, i) =>
      val stages = new java.util.concurrent.ConcurrentLinkedQueue[
        (Int, String, Long, Long, Long, Long, Long)]
      // stage -> phase via the job description property on job start
      // (the lifecycle sets spark.job.description per phase)
      val stagePhase = new java.util.concurrent.ConcurrentHashMap[Int, String]
      val listener = new SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("(none)")
          js.stageIds.foreach(sid => stagePhase.put(sid, desc))
        }
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val tm = si.taskMetrics
          stages.add((si.stageId,
            stagePhase.getOrDefault(si.stageId, "(none)"),
            tm.executorRunTime,
            tm.shuffleWriteMetrics.bytesWritten / 1048576,
            tm.memoryBytesSpilled / 1048576,
            tm.diskBytesSpilled / 1048576,
            si.numTasks.toLong))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val load0 = loadAvg
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_ppbuild_$i").toString
      val t0 = System.nanoTime()
      variant match {
        case "build" =>
          operators.PrefixFilterJoin.writeIndex(dupDocs, dir, num = 4, den = 5)
        case "mine" =>
          val n = operators.PrefixFilterJoin.pairs(dupDocs, num = 4, den = 5).count()
          System.err.println(s"[ppbuild] mine pairs=$n")
        case "lshbuild" =>
          operators.NearDupLsh.writeIndex(dupDocs, dir)
        case other => sys.error(s"unknown variant $other")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.GraftPlans.drainListenerBus(spark)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val rows = stages.iterator().asScala.toList.sortBy(-_._3)
      println(f"== run $i $variant wall $wall%.1f s, total task " +
        f"${rows.map(_._3).sum / 1000.0}%.1f s, ${rows.size} stages, " +
        f"load $load0%.1f -> $loadAvg%.1f ==")
      // per-phase rollup first (the attribution), stages second
      rows.groupBy(_._2).toSeq.sortBy(-_._2.map(_._3).sum).foreach {
        case (phase, ss) =>
          println(f"  phase ${ss.map(_._3).sum / 1000.0}%8.1f s task  " +
            f"shuf ${ss.map(_._4).sum}%6d MB  " +
            f"spill ${ss.map(_._5).sum}%6d/${ss.map(_._6).sum}%6d MB  " +
            f"${ss.size}%2d stages  $phase")
      }
      rows.take(10).foreach { case (id, phase, ms, sh, mem, dsk, n) =>
        println(f"  stage $id%4d ${ms / 1000.0}%8.1f s  $n%3d tasks  " +
          f"shuf ${sh}%6d MB  spill mem/disk $mem%6d/$dsk%6d MB  $phase")
      }
      reclaim(dir, operators.NearDupLsh.statsPath(dir),
        operators.NearDupLsh.hotStatsPath(dir),
        operators.NearDupLsh.bandsPath(dir))
    }
    spark.stop()
  }
}
