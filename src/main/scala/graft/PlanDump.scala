package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev utility: write `.explain("formatted")` for the named queries (or
  * every bench headliner when none are named) to `<outDir>/<name>_<tag>.txt`
  * — the per-round plan evidence (plans/r17/...) the optimization rounds
  * commit alongside before/after bench numbers.
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> [sfDir] [name,name,...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val only = if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft_plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val qs = GraftQuery.all.filter(q => only.map(_.contains(q.name)).getOrElse(q.bench))
    qs.foreach { q =>
      val df = q.fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${q.name}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote ${q.name}_$tag.txt")
    }
    spark.stop()
  }
}
