package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the catalog scan paths: the SAME 1M-row × 64-file table
  * in both data formats, full-row and one-column aggregates, columnar
  * path vs row path (`spark.graft.catalog.columnarRead`), min-of-N
  * summed task millis. Exists to ATTRIBUTE scan cost — per-file setup vs
  * per-row decode — before touching the reader (bench discipline:
  * measure, don't guess).
  *
  *   runMain graft.CatalogScanProbe [nRows] [nFiles] [reps]
  */
object CatalogScanProbe {

  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft_catalog_scan_probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_scan_probe")
    spark.conf.set("spark.sql.catalog.probecat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.probecat.root", root.toString)
    val docs = spark.range(nRows).select(
      col("id").as("doc_id"),
      md5(concat(lit("p"), col("id"))).as("fp"),
      (col("id") % 997).cast("int").as("n_tokens"))
    def taskMillis(body: => Unit): Long = {
      val listener = new org.apache.spark.scheduler.SparkListener {
        val ms = new java.util.concurrent.atomic.AtomicLong
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          ms.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        org.apache.spark.sql.graft.GraftPlans.drainListenerBus(spark)
        listener.ms.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    // ingest cost per format (the write path DML/INSERT pays), measured
    // as summed task millis of the append that populates each table
    val writeMs = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    Seq("json" -> "", "parquet" -> " TBLPROPERTIES('format'='parquet')")
      .foreach { case (fmt, props) =>
        spark.sql(
          s"CREATE TABLE probecat.s.t_$fmt (doc_id BIGINT, fp STRING, n_tokens INT)$props")
        writeMs += s"${fmt}_write" -> taskMillis {
          docs.repartitionByRange(nFiles, col("doc_id"))
            .writeTo(s"probecat.s.t_$fmt").append()
        }
      }

    def fullScan(t: String): Unit = {
      spark.table(t).agg(sum(col("doc_id")), sum(col("n_tokens")),
        sum(length(col("fp")))).head(); ()
    }
    def colScan(t: String): Unit = {
      spark.table(t).agg(sum(col("n_tokens"))).head(); ()
    }
    // warm page caches + codegen on every variant once
    Seq(true, false).foreach { c =>
      spark.conf.set("spark.graft.catalog.columnarRead", c.toString)
      fullScan("probecat.s.t_parquet"); colScan("probecat.s.t_parquet")
    }
    fullScan("probecat.s.t_json"); colScan("probecat.s.t_json")
    // INTERLEAVED min-of-N: host load drifts within a run, so measuring
    // one variant's N reps back-to-back biases whichever ran during the
    // quiet window — each rep cycles through every variant instead
    val variants: Seq[(String, () => Unit)] = Seq(
      "pq_full_columnar" -> (() => {
        spark.conf.set("spark.graft.catalog.columnarRead", "true")
        fullScan("probecat.s.t_parquet") }),
      "pq_col_columnar" -> (() => {
        spark.conf.set("spark.graft.catalog.columnarRead", "true")
        colScan("probecat.s.t_parquet") }),
      "pq_full_row" -> (() => {
        spark.conf.set("spark.graft.catalog.columnarRead", "false")
        fullScan("probecat.s.t_parquet") }),
      "pq_col_row" -> (() => {
        spark.conf.set("spark.graft.catalog.columnarRead", "false")
        colScan("probecat.s.t_parquet") }),
      "json_full" -> (() => fullScan("probecat.s.t_json")),
      "json_col" -> (() => colScan("probecat.s.t_json")))
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    (1 to reps).foreach { _ =>
      variants.foreach { case (name, body) =>
        val t = taskMillis(body())
        out += name -> math.min(out.getOrElse(name, Long.MaxValue), t)
      }
    }
    spark.conf.unset("spark.graft.catalog.columnarRead")
    println((writeMs ++ out).map { case (k, v) => s""""$k":$v""" }
      .mkString(s"""{"n_rows":$nRows,"n_files":$nFiles,""", ",", "}"))
    spark.stop()
  }
}
