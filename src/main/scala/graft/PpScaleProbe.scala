package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r18): PrefixFilterJoin.pairs at a chosen synthetic corpus
  * size — wall (min of reps) + summed task time + shuffle bytes, the
  * ScaleSmoke ppjoin line in isolation, for A/B-ing the rank-derivation
  * shapes at the scale where freq stops broadcasting.
  *
  * Usage: runMain graft.PpScaleProbe [nDocs] [reps]
  */
object PpScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft_pp_scale_probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
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
    (1 to reps).foreach { rep =>
      val taskMs = new java.util.concurrent.atomic.AtomicLong
      val bytes = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          taskMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
          bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = graft.operators.PrefixFilterJoin.pairs(
        dupDocs.select(col("doc_id"), col("text")), num = 4, den = 5).count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.GraftPlans.drainListenerBus(spark)
      spark.sparkContext.removeSparkListener(listener)
      println(f"[ppscale] rep$rep nDocs=$nDocs pairs=$n wall=$wall%.2f " +
        f"task=${taskMs.get() / 1e3}%.2f shuffleMB=${bytes.get() / 1e6}%.1f")
    }
    spark.stop()
  }
}
