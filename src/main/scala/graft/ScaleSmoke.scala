package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale demonstration: drives the heavy training-data operators over the
  * zero-storage synthetic corpus (graft.sources.SyntheticDocsSource) at a
  * size chosen on the command line — evidence that the near-dup pipeline
  * is bounded by candidates, not n².
  *
  *   runMain graft.ScaleSmoke [nDocs] [cpus]
  *
  * Prints one JSON line with per-op seconds and result cardinalities.
  */
object ScaleSmoke {

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft_scale_smoke")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read
      .format("graft.sources.SyntheticDocsSource")
      .option("rows", nDocs)
      .option("partitions", cpus.toInt * 2)
      .option("seed", 42)
      .load()

    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val (tDedup, nPairs) = time {
      operators.NearDupLsh.pairs(docs.select(col("doc_id"), col("text")), 0.5d).count()
    }
    val (tExact, nGroups) = time {
      docs.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep"), count(lit(1)).as("n"))
        .count()
    }
    val (tTok, _) = time {
      docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    }
    // PPJoin on a realistic corpus: wide vocabulary (discriminative
    // shingles) with 5% planted one-word-substitution near-dups
    val dupDocs = spark.read
      .format("graft-docs")
      .option("rows", nDocs)
      .option("partitions", cpus.toInt * 2)
      .option("seed", 42)
      .option("vocabSize", 50000)
      .option("dupRate", 0.05)
      .load()
    val (tPp, nPp) = time {
      operators.PrefixFilterJoin.pairs(
        dupDocs.select(col("doc_id"), col("text")), num = 4, den = 5).count()
    }
    // the approximate miner on the same planted corpus: recall/cost vs exact
    val (tLshDup, nLshDup) = time {
      operators.NearDupLsh.pairs(dupDocs.select(col("doc_id"), col("text")), 0.8d).count()
    }
    println(
      s"""{"n_docs":$nDocs,"minhash_lsh_sec":$tDedup,"neardup_pairs":$nPairs,""" +
        s""""exact_dedup_sec":$tExact,"distinct_docs":$nGroups,"token_count_sec":$tTok,""" +
        s""""ppjoin_sec":$tPp,"ppjoin_pairs":$nPp,""" +
        s""""lsh_planted_sec":$tLshDup,"lsh_planted_pairs":$nLshDup}""")
    spark.stop()
  }
}
