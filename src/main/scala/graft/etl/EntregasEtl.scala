package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Run metrics, mirroring the reference's metrics dict
  * (`/root/reference/src/etl_entregas.py:558-573` + `main.py:233-238`).
  */
final case class RunMetrics(
    environment: String,
    startDate: String,
    endDate: String,
    country: Option[String],
    quality: QualityMetrics,
    finalRows: Long,
    partitionsCreated: Map[String, Long],
    executionTimeSeconds: Double) {

  def toJson: String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val parts = partitionsCreated.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ", ", "}")
    s"""{
       |  "environment": ${q(environment)},
       |  "filters": {"start_date": ${q(startDate)}, "end_date": ${q(endDate)}, "country": ${country.map(q).getOrElse("null")}},
       |  "records_read": ${quality.inputRows},
       |  "removed_null_material": ${quality.removedNullMaterial},
       |  "removed_invalid_type": ${quality.removedInvalidType},
       |  "removed_duplicates": ${quality.removedDuplicates},
       |  "removed_invalid_country": ${quality.removedInvalidCountry},
       |  "records_written": $finalRows,
       |  "partitions_created": $parts,
       |  "execution_time_seconds": $executionTimeSeconds
       |}""".stripMargin
  }
}

/** The full pipeline: extract → data quality → filters → transform →
  * standardize → load, each stage an independently callable pure function
  * (reference entry point 2, `/root/reference/tests/test_etl.py:117-120`,
  * requires exactly this decomposition).
  *
  * Unlike the reference — which re-reads the CSV ~15 times because every
  * metric is an eager `count()` — the run caches the parsed input once,
  * computes all quality counters in two jobs, and writes with the native
  * partitioned sink: same numbers, O(1) scans.
  */
final class EntregasEtl(val config: EtlConfig, val spark: SparkSession) {

  def extract(): DataFrame = Extract(spark, config.paths.inputFile)
  def applyDataQuality(df: DataFrame): DataFrame = DataQuality(df, config)
  def qualityMetrics(df: DataFrame): QualityMetrics = DataQuality.metrics(df, config)
  def applyFilters(df: DataFrame): DataFrame = Filters(df, config.filters)
  def transform(df: DataFrame): DataFrame = Transform(df, config)
  def standardize(df: DataFrame): DataFrame = Standardize(df, config)

  def run(): RunMetrics = {
    val t0 = System.nanoTime()
    val raw = extract().cache()
    try {
      val quality = qualityMetrics(raw)
      val cleaned = applyDataQuality(raw)
      val filtered = applyFilters(cleaned)
      val output = standardize(transform(filtered))
      val partitions = Load(output, config.paths.outputBase, config.paths.outputFormat)
      RunMetrics(
        environment = config.environment,
        startDate = config.filters.startDate,
        endDate = config.filters.endDate,
        country = config.filters.country,
        quality = quality,
        finalRows = partitions.values.sum,
        partitionsCreated = partitions,
        executionTimeSeconds = (System.nanoTime() - t0) / 1e9)
    } finally raw.unpersist()
  }
}

object EntregasEtl {
  /** Factory mirroring `create_etl` (`/root/reference/src/etl_entregas.py:591-601`):
    * builds the SparkSession from config when none is supplied.
    */
  def apply(config: EtlConfig, existing: Option[SparkSession] = None): EntregasEtl = {
    val spark = existing.getOrElse {
      val b = SparkSession.builder()
        .appName(config.spark.appName)
        .master(config.spark.master)
      config.spark.configs.foreach { case (k, v) => b.config(k, v) }
      val s = b.getOrCreate()
      s.sparkContext.setLogLevel(config.spark.logLevel)
      s
    }
    new EntregasEtl(config, spark)
  }
}
