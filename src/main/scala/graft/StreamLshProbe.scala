package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quiet-host re-measurement of the streaming-LSH ingest growth law
  * (VERDICT r13 #2: the r13 marathon's tail showed batches 2→5 running
  * +47% while the index grew 2.4×, vs the +7% law published in r11 —
  * but that tail ran at load_avg 13, so the number needs a clean
  * measurement before either believing it or "fixing" anything). Runs
  * ONLY the streaming section of ScaleSmoke — k micro-batches through
  * NearDupIndexStream.applyBatch against a growing index — for `passes`
  * independent full passes (fresh index dirs each), printing per-batch
  * seconds, the standing index size after each append, and load stamps.
  * The growth law = min-over-passes per batch position.
  *
  *   runMain graft.StreamLshProbe [nDocs] [cpus] [passes] [kBatches]
  */
object StreamLshProbe {

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = args.lift(1).getOrElse("32")
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    val kBatches = args.lift(3).map(_.toInt).getOrElse(5)
    val shuffleWidth = math.max(cpus.toInt, (nDocs / 50000L).toInt)
    def loadAvg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val spark = SparkSession.builder()
      .master(s"local[$cpus,4]")
      .appName("graft_stream_lsh_probe")
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

    val allPasses = (1 to passes).map { pass =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_stream_probe_$pass").toString
      val batchSecs = (0 until kBatches).map { i =>
        dupDocs.filter(pmod(col("doc_id"), lit(kBatches.toLong)) === i)
          .write.mode("overwrite").parquet(s"$root/feed")
        val b = spark.read.parquet(s"$root/feed")
        val load0 = loadAvg
        val t0 = System.nanoTime()
        streaming.NearDupIndexStream.applyBatch(
          spark, s"$root/idx", s"$root/log",
          threshold = 0.8, maxBucket = 4096, batchId = i.toLong, batch = b)
        val t = (System.nanoTime() - t0) / 1e9
        val idxDocs = spark.read.parquet(s"$root/idx").count()
        println(f"[stream-probe] pass $pass batch $i: $t%.1f s  " +
          f"index=$idxDocs docs  load $load0%.1f -> $loadAvg%.1f")
        t
      }
      val hp = new org.apache.hadoop.fs.Path(root)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
      System.gc()
      batchSecs
    }
    val best = (0 until kBatches).map(i => allPasses.map(_(i)).min)
    println("[stream-probe] min-over-passes per batch: " +
      best.map(t => f"$t%.1f").mkString("[", ", ", "]") +
      f" — growth batch2->batch$kBatches ${(best.last / best(1) - 1) * 100}%.0f%%")
    spark.stop()
  }
}
