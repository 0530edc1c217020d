package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the incremental LSH serve path: times each sub-plan of
  * `NearDupLsh.pairsAgainstIndex` in isolation against a persisted index,
  * so layout work (bucketed band artifact, pruned sh lookup) targets the
  * stage that actually dominates instead of a guess.
  *
  *   runMain graft.ServeProbe [nDocs] [cpus] [order]
  *
  * Variants:
  *   build      — writeIndex for the corpus (one-time ingest cost)
  *   bandsScan  — index (doc_id, bands) read + posexplode + fold
  *   shScan     — index (doc_id, sh) read + size fold (the rescore input)
  *   batchSig   — batch band rows alone (O(batch) compute)
  *   cand       — through candidate generation (bands join, dedup)
  *   serve      — full pairsAgainstIndex
  *   serveFull  — pairsAgainst recompute flavor (no index)
  */
object ServeProbe {

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = args.lift(1).getOrElse("32")
    val order = args.lift(2)
      .getOrElse("build,bandsScan,shScan,batchSig,cand,serve,serve,serveFull")
      .split(",").toSeq
    val shuffleWidth = math.max(cpus.toInt, (nDocs / 100000L).toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft_serve_probe")
      .config("spark.sql.shuffle.partitions", shuffleWidth)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val dupDocs = spark.read
      .format("graft-docs")
      .option("rows", nDocs)
      .option("partitions", cpus.toInt * 2)
      .option("seed", 42)
      .option("vocabSize", 50000)
      .option("dupRate", 0.05)
      .load()
      .select(col("doc_id"), col("text"))
    // the batch arrives MATERIALIZED (a crawl drop is its own files):
    // deriving it lazily from the synthetic corpus would re-generate
    // and filter all nDocs rows on every serve-side evaluation, and
    // that harness artifact — not the index — dominated the probe
    // (3 batch passes ≈ 70% of serve wall at 10M)
    val batchDir = java.nio.file.Files
      .createTempDirectory("graft_serve_probe_batch").toString
    dupDocs.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + nDocs * 10).as("doc_id"), col("text"))
      .write.mode("overwrite").parquet(batchDir)
    val batch = spark.read.parquet(batchDir)

    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_serve_probe_idx").toString
    def index = operators.NearDupLsh.readIndex(spark, idxDir)

    def variant(name: String): Long = name match {
      case "build" =>
        operators.NearDupLsh.writeIndex(dupDocs, idxDir); 0L
      case "bandsScan" => index
        .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "band_hash")))
        .agg(sum(col("band_hash"))).count()
      case "shScan" => index
        .select(sum(size(col("sh")))).head().getLong(0)
      case "batchSig" => operators.NearDupLsh.signatures(batch)
        .select(element_at(col("bands"), 1).as("b"))
        .agg(sum(col("b"))).count()
      case "cand" =>
        index.select(col("doc_id").as("old_id"),
            posexplode(col("bands")).as(Seq("band", "band_hash")))
          .join(broadcast(operators.NearDupLsh.signatures(batch)
            .select(col("doc_id").as("new_id"),
              posexplode(col("bands")).as(Seq("band", "band_hash")))),
            Seq("band", "band_hash"))
          .select(col("new_id"), col("old_id"))
          .dropDuplicates("new_id", "old_id")
          .count()
      case "serve" =>
        operators.NearDupLsh.pairsAgainstIndex(batch, index, 0.8d).count()
      // the path-based serve: flat band artifact for candidates
      case "serveAt" =>
        operators.NearDupLsh.pairsAgainstIndexAt(spark, batch, idxDir, 0.8d).count()
      case "serveFull" =>
        operators.NearDupLsh.pairsAgainst(batch, dupDocs, 0.8d).count()
      // flat PRE-EXPLODED band artifact with a fused (band, band_hash)
      // long key: no per-row array assembly at scan time, single-column
      // join probe
      case "buildFlat" =>
        index.select(col("doc_id").as("old_id"),
            posexplode(col("bands")).as(Seq("band", "band_hash")))
          .select(col("old_id"),
            (col("band_hash").cast("long") * 8 + col("band")).as("bk"))
          .write.mode("overwrite").parquet(idxDir + "_flatbands")
        0L
      case "flatScan" => spark.read.parquet(idxDir + "_flatbands")
        .agg(sum(col("bk"))).count()
      case "candFlat" =>
        spark.read.parquet(idxDir + "_flatbands")
          .join(broadcast(operators.NearDupLsh.signatures(batch)
            .select(col("doc_id").as("new_id"),
              posexplode(col("bands")).as(Seq("band", "band_hash")))
            .select(col("new_id"),
              (col("band_hash").cast("long") * 8 + col("band")).as("bk"))),
            Seq("bk"))
          .select(col("new_id"), col("old_id"))
          .dropDuplicates("new_id", "old_id")
          .count()
      case other => sys.error(s"unknown variant $other")
    }

    order.zipWithIndex.foreach { case (name, i) =>
      var stages = 0
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          stages += 1
          System.err.println(
            s"STAGE[$name] ${sc.stageInfo.stageId} tasks=${sc.stageInfo.numTasks} " +
            s"inB=${m.inputMetrics.bytesRead / 1048576}MB " +
            s"shufW=${m.shuffleWriteMetrics.bytesWritten / 1048576}MB " +
            s"memSpill=${m.memoryBytesSpilled / 1048576}MB " +
            s"taskMs=${m.executorRunTime} gcMs=${m.jvmGCTime}")
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = variant(name)
      val t = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.GraftPlans.drainListenerBus(spark)
      spark.sparkContext.removeSparkListener(listener)
      println(s"""{"run":$i,"variant":"$name","sec":$t,"rows":$n,"stages":$stages}""")
    }
    spark.stop()
  }
}
