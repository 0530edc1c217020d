package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic for the r9 LSH rework's 1M wall-clock regression
  * (lsh_planted 7 s -> 54 s in scale_1m.json). Times each sub-plan of
  * NearDupLsh.pairs in isolation with per-stage task metrics.
  *
  *   runMain graft.LshProbe [nDocs] [cpus] [order]
  *
  * Variants:
  *   sig     — signatures() alone (ngram + minhash + band hashes)
  *   ngram   — the rescore-side ngram pass alone
  *   cand    — through candidate generation (buckets + explode + dedup)
  *   full    — NearDupLsh.pairs at threshold 0.8
  *   fullLo  — NearDupLsh.pairs at threshold 0.5 (the docs-corpus call)
  */
object LshProbe {

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = args.lift(1).getOrElse("32")
    val order = args.lift(2).getOrElse("sig,ngram,cand,full,full")
      .split(",").toSeq
    // default shuffle width = ScaleSmoke's corpus-scaled rule, so probe
    // runs reproduce the smoke lines' plans (override via 4th arg)
    val shuffleWidth = args.lift(3).map(_.toInt)
      .getOrElse(math.max(cpus.toInt, (nDocs / 50000L).toInt))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft_lsh_probe")
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

    def candidates(docs: DataFrame): DataFrame = {
      val bandRows = operators.NearDupLsh.signatures(docs).select(col("doc_id"),
        posexplode(col("bands")).as(Seq("band", "band_hash")))
      bandRows
        .groupBy(col("band"), col("band_hash"))
        .agg(collect_list(col("doc_id")).as("ds"))
        .filter(size(col("ds")) > 1)
        .filter(size(col("ds")) <= operators.NearDupLsh.DefaultMaxBucket)
        .select(explode(col("ds")).as("doc_a"), col("ds"))
        .select(col("doc_a"),
          explode(filter(col("ds"), b => b > col("doc_a"))).as("doc_b"))
        .repartition(cpus.toInt, col("doc_a"), col("doc_b"))
        .dropDuplicates("doc_a", "doc_b")
    }

    def variant(name: String): Long = name match {
      case "sig" => operators.NearDupLsh.signatures(dupDocs).count()
      case "ngram" => dupDocs.select(col("doc_id"),
        graft.functions.GraftFunctions.ngram_hashes(split(col("text"), " ")).as("sh"))
        .filter(size(col("sh")) > 0).count()
      // forces ngram + minhash (no bands, no filter)
      case "minhash" => dupDocs.select(
        element_at(graft.functions.GraftFunctions.minhash_sig(
          graft.functions.GraftFunctions.ngram_hashes(split(col("text"), " "))), 1).as("m"))
        .agg(sum(col("m"))).count()
      // forces the full signature relation incl. band hashes + filter
      case "sigFull" => operators.NearDupLsh.signatures(dupDocs)
        .select(element_at(col("bands"), 1).as("b"), size(col("sh")).as("k"))
        .agg(sum(col("b")), sum(col("k"))).count()
      // ngram pass with the cheap-predicate filter (no sh-referencing
      // filter that pushdown would duplicate)
      case "ngramCheap" => dupDocs
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"),
          graft.functions.GraftFunctions.ngram_hashes(split(col("text"), " ")).as("sh"))
        .count()
      // band rows WITHOUT a shuffle: explode cost alone
      case "bandRows" => operators.NearDupLsh.signatures(dupDocs)
        .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "band_hash")))
        .agg(sum(col("band_hash"))).count()
      // band rows THROUGH an exchange on the band key
      case "bandShuffle" => operators.NearDupLsh.signatures(dupDocs)
        .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "band_hash")))
        .repartition(cpus.toInt, col("band"), col("band_hash"))
        .agg(sum(col("band_hash"))).count()
      // the bucket aggregate exactly as pairs() builds it
      case "buckets" => {
        val bandRows = operators.NearDupLsh.signatures(dupDocs).select(col("doc_id"),
          posexplode(col("bands")).as(Seq("band", "band_hash")))
        bandRows.groupBy(col("band"), col("band_hash"))
          .agg(collect_list(col("doc_id")).as("ds"))
          .filter(size(col("ds")) > 1).count()
      }
      case "cand" => candidates(dupDocs).count()
      case "full" => operators.NearDupLsh.pairs(dupDocs, 0.8d).count()
      case "fullLo" => operators.NearDupLsh.pairs(dupDocs, 0.5d).count()
      // ScaleSmoke's lsh_guard line exactly: planted corpus + a
      // boilerplate clique of nDocs/100 identical docs, maxBucket=1024 —
      // for attributing scale_10m.json's lsh_guard vs lsh_planted delta
      // with per-stage metrics (VERDICT r10 #2)
      case "guard" => {
        val boiler = spark.range(nDocs / 100).select(
          (col("id") + nDocs * 100).as("doc_id"),
          lit("identical boilerplate footer with terms of service and a " +
            "copyright notice repeated on every crawled page of the site").as("text"))
        operators.NearDupLsh.pairs(
          dupDocs.unionByName(boiler), 0.8d, maxBucket = 1024).count()
      }
      // the 10M OOM shape at reduced size: tiny default vocabulary ⇒
      // degenerate band buckets of millions of rows; must complete in
      // bounded memory with the cap dropping them pre-materialization
      case "degenerate" => {
        val tiny = spark.read
          .format("graft.sources.SyntheticDocsSource")
          .option("rows", nDocs)
          .option("partitions", cpus.toInt * 2)
          .option("seed", 42)
          .load()
          .select(col("doc_id"), col("text"))
        operators.NearDupLsh.pairs(tiny, 0.5d).count()
      }
      case "explain" => {
        operators.NearDupLsh.signatures(dupDocs)
          .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "band_hash")))
          .agg(sum(col("band_hash"))).explain("formatted")
        0L
      }
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
