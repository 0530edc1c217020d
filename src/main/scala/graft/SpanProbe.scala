package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic for the span-dedup text-key vs hash-key crossover seen in
  * bench/scale_1m.json (hash 2.6x SLOWER at 1M, 3x faster at 10M).
  * Runs each variant in a requested order with per-run stage metrics
  * (shuffle bytes, memory/disk spill, GC time, peak execution memory) so
  * the regime change is measured, not guessed.
  *
  *   runMain graft.SpanProbe [nDocs] [cpus] [order]
  *
  * order is a comma list of variant names run in sequence; each name may
  * repeat (to see warm-vs-cold effects). Variants:
  *   textCD  — group by span text,   count_distinct(doc_id)
  *   hashCD  — group by xxhash64,    count_distinct(doc_id)
  *   text2L  — group by (span, doc) then span  (the gate-query shape)
  *   hash2L  — group by (hash, doc) then hash
  */
object SpanProbe {

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = args.lift(1).getOrElse("32")
    val order = args.lift(2)
      .getOrElse("textCD,hashCD,hashCD,textCD,text2L,hash2L")
      .split(",").toSeq
    // default shuffle width = ScaleSmoke's corpus-scaled rule, so probe
    // runs reproduce the smoke lines' plans (override via 4th arg; the
    // original fixed-32 width at 10M spilled 200 GB into 930 s of GC —
    // a plan the marathon never runs)
    val shuffleWidth = args.lift(3).map(_.toInt)
      .getOrElse(math.max(cpus.toInt, (nDocs / 50000L).toInt))
    val spark = SparkSession.builder()
      .master(s"local[$cpus,4]")
      .appName("graft_span_probe")
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

    val spanToks = split(col("text"), " ")
    val spanStarts = when(size(spanToks) >= 8,
      sequence(lit(1), size(spanToks) - 7))
      .otherwise(array().cast("array<int>"))
    def spans: DataFrame = dupDocs.select(col("doc_id"),
      explode(transform(spanStarts,
        i => array_join(slice(spanToks, i, lit(8)), " "))).as("span"))

    def variant(name: String): DataFrame = name match {
      case "textCD" => spans.groupBy(col("span"))
        .agg(count_distinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") >= 2)
      case "hashCD" => spans.select(col("doc_id"), xxhash64(col("span")).as("h"))
        .groupBy(col("h"))
        .agg(count_distinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") >= 2)
      case "text2L" => spans
        .groupBy(col("span"), col("doc_id")).agg(count(lit(1)).as("occ"))
        .groupBy(col("span")).agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 2)
      case "hash2L" => spans.select(col("doc_id"), xxhash64(col("span")).as("h"))
        .groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("occ"))
        .groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 2)
      // restructured: cheap pre-filter, explode the start-index sequence,
      // build the span AFTER the explode from the carried toks attribute —
      // no expensive array in the generator input (so the inferred
      // size-guard stays cheap) and no per-element split re-evaluation
      // inside an interpreted transform() lambda
      case "hashPost" => dupDocs
        .filter(size(split(col("text"), " ")) >= 8)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(1), size(col("toks")) - 7)).as("i"))
        .select(col("doc_id"),
          xxhash64(array_join(slice(col("toks"), col("i"), lit(8)), " ")).as("h"))
        .groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("occ"))
        .groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 2)
      case other => sys.error(s"unknown variant $other")
    }

    final case class StageStats(
        var shuffleWrite: Long = 0L, var memSpill: Long = 0L,
        var diskSpill: Long = 0L, var gcMs: Long = 0L,
        var peakExecMem: Long = 0L, var taskMs: Long = 0L,
        var stages: Int = 0)

    def measured(body: => Long): (Double, Long, StageStats) = {
      val st = StageStats()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          System.err.println(
            s"STAGE ${sc.stageInfo.stageId} tasks=${sc.stageInfo.numTasks} " +
            s"shufW=${m.shuffleWriteMetrics.bytesWritten / 1048576}MB " +
            s"shufR=${m.shuffleReadMetrics.remoteBytesRead / 1048576 + m.shuffleReadMetrics.localBytesRead / 1048576}MB " +
            s"memSpill=${m.memoryBytesSpilled / 1048576}MB " +
            s"diskSpill=${m.diskBytesSpilled / 1048576}MB " +
            s"taskMs=${m.executorRunTime} gcMs=${m.jvmGCTime} " +
            s"[${sc.stageInfo.name.take(60)}]")
          st.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          st.memSpill += m.memoryBytesSpilled
          st.diskSpill += m.diskBytesSpilled
          st.gcMs += m.jvmGCTime
          st.peakExecMem = math.max(st.peakExecMem, m.peakExecutionMemory)
          st.taskMs += m.executorRunTime
          st.stages += 1
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val t0 = System.nanoTime()
        val n = body
        val t = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.graft.GraftPlans.drainListenerBus(spark)
        (t, n, st)
      } finally spark.sparkContext.removeSparkListener(listener)
    }

    order.zipWithIndex.foreach { case (spec, i) =>
      // "hash2L@16m" = run hash2L with AQE advisory partition size 16m
      val parts = spec.split("@")
      val name = parts(0)
      val advisory = parts.lift(1)
      val prevAdv = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
      advisory.foreach(a =>
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", a))
      val (t, n, st) =
        try measured(variant(name).count())
        finally spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prevAdv)
      // one JSON line per run, in run order
      println(
        s"""{"run":$i,"variant":"$spec","sec":$t,"rows":$n,""" +
        s""""shuffle_mb":${st.shuffleWrite / 1048576},""" +
        s""""mem_spill_mb":${st.memSpill / 1048576},""" +
        s""""disk_spill_mb":${st.diskSpill / 1048576},""" +
        s""""gc_ms":${st.gcMs},"task_ms":${st.taskMs},""" +
        s""""peak_exec_mem_mb":${st.peakExecMem / 1048576},""" +
        s""""stages":${st.stages}}""")
    }
    spark.stop()
  }
}
