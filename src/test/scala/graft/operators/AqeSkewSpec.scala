package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** AQE skew-join handling: with one hot key dominating the fact side and
  * thresholds scaled down to test size, AQE splits the skewed partition
  * at runtime — the knob the engine relies on for unexpected skew (known
  * skew uses SaltedAgg / explicit salting).
  */
class AqeSkewSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("AQE splits a skewed sort-merge join partition") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hot key 0 carries 100k rows with a fat payload; 99 cold keys
      // tiny. The consumer is a GLOBAL aggregate — a per-key aggregate
      // above the join would legally suppress skew splitting (the split
      // would violate its required clustering).
      val fact = spark.range(0, 101000).toDF("i")
        .select(
          when(col("i") < 100000, 0L).otherwise(col("i") % 100).as("k"),
          concat(lit("x" * 64), col("i")).as("payload"))
      val dim = spark.range(0, 100).toDF("k")
        .select(col("k"), concat(lit("dim"), col("k")).as("name"))
      val joined = fact.join(dim, Seq("k")).select(col("k"), col("payload"), col("name"))
      // execute THIS Dataset's QueryExecution (count()/write() clone it)
      assert(joined.collect().length == 101000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isSkewJoin=true") || plan.contains("skewed"),
        s"expected skew-join marker in:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
