package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement harness for the IVF quantizer-drift detector and the
  * rebuild workflow (IvfIndex.driftReport / rebuildIndex) — the numbers
  * behind the `sim_ivf_drift` gate row's thresholds:
  *
  *   runMain graft.IvfDriftProbe [sfDir ...]
  *
  * Per SF, two scenarios over the labeled clustered embeddings fixture:
  *
  *  - PLANTED DRIFT (the gate's fixture): the appended batch is the
  *    corpus displaced into 16 novel regions (offset 1.2 along a
  *    vec_id-chosen basis direction — comparable to the fixture's ~1.2
  *    vector norms, so the regions OVERLAP the original cloud and the
  *    frozen quantizer scatters their members across cells). Measured
  *    (25+25 queries, min over the three SFs): distortion_ratio
  *    2.50–2.57 (fires the 2.0 default), tv 0.12–0.20; frozen np=4
  *    drifted-region recall@5 0.704–0.728 (below the 0.8 bar);
  *    rebuild(nlist=16, iters=5) served at np=8 restores drifted-region
  *    recall to 1.000 and standing-region to 0.904–0.912. Geometry
  *    notes from the grid this file iterated: magnitude ≥ 1.5 or a
  *    4-direction plant CROWDS instead of scattering (frozen recall
  *    stays ≥ 0.86 — crowding costs serve time, never recall);
  *    rebuilding at nlist=32 over the doubled composite is pathological
  *    for the standing region (0.48–0.54 at any nprobe ≤ 12, init=first
  *    or farthest); farthest-first init collapses even the
  *    representative rebuild (0.58–0.62). The drift response that
  *    works is retrain at the SAME nlist with more Lloyd iterations
  *    plus a doubled probe budget for the doubled corpus.
  *  - REPRESENTATIVE (negative control): the sim_ivf_stream split
  *    (vec_id % 10) — the metric must NOT fire (measured ratio
  *    1.03–1.07, tv 0.11–0.25).
  */
object IvfDriftProbe {

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.GraftFunctions.dot_product(a, b)

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft_ivf_drift_probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    dirs.foreach { dir =>
      val e = Tables.table(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("norm2", dot(col("v"), col("v")))
      def recallOf(full: DataFrame, q: DataFrame, ann: DataFrame): Double = {
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)
        val exact = full.select(col("vec_id").as("neighbor_id"), col("v"), col("norm2"))
          .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            round(dot(col("qv"), col("v")) / (sqrt(col("qn")) * sqrt(col("norm2"))), 6)
              .as("cosine"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("neighbor_id"))
        val r = exact.join(
          ann.select(col("query_id"), col("neighbor_id"), lit(1L).as("hit")),
          Seq("query_id", "neighbor_id"), "left")
          .agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0L))).as("h"))
          .head()
        r.getLong(1).toDouble / r.getLong(0)
      }
      def scenario(name: String, standing: DataFrame, appended: DataFrame,
          nprobe: Int = 6, rebuildNlist: Int = 16,
          rebuildNprobeOverride: Int = 0): Unit = {
        val full = standing.unionByName(appended)
        val queries = full
          .filter(col("vec_id") < 25 ||
            (col("vec_id") >= 1000000L && col("vec_id") < 1000025L))
          .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm2").as("qn"))
        val qNew = queries.filter(col("query_id") >= 1000000L)
        val root = java.nio.file.Files.createTempDirectory("ivf_drift_probe").toString
        graft.operators.IvfIndex.writeIndex(standing, s"$root/idx", nlist = 16, iters = 2)
        graft.operators.IvfIndex.appendIndex(appended, s"$root/idx", 0L)
        val rep = graft.operators.IvfIndex.driftReport(spark, s"$root/idx").collect()
        def servedRecall(idx: String, q: DataFrame): Double =
          if (q.isEmpty) -1.0
          else recallOf(full, q,
            graft.operators.IvfIndex.topK(spark, idx, q, nprobe, k = 5))
        val frozen = servedRecall(s"$root/idx", queries)
        val frozenNew = servedRecall(s"$root/idx", qNew)
        graft.operators.IvfIndex.rebuildIndex(
          spark, s"$root/idx", s"$root/idx2", nlist = rebuildNlist, iters = 5)
        val rebuildNprobe = if (rebuildNprobeOverride > 0) rebuildNprobeOverride
          else math.max(nprobe, nprobe * rebuildNlist / 16)
        def servedRecall2(idx: String, q: DataFrame): Double =
          if (q.isEmpty) -1.0
          else recallOf(full, q,
            graft.operators.IvfIndex.topK(spark, idx, q, rebuildNprobe, k = 5))
        val rebuilt = servedRecall2(s"$root/idx2", queries)
        val rebuiltNew = servedRecall2(s"$root/idx2", qNew)
        val qOld = queries.filter(col("query_id") < 1000000L)
        val frozenOld = servedRecall(s"$root/idx", qOld)
        val rebuiltOld = servedRecall2(s"$root/idx2", qOld)
        rep.foreach { r =>
          println(f"[$dir $name np=$nprobe rn=$rebuildNlist] batch=${r.getAs[Long]("batch")} " +
            f"n=${r.getAs[Long]("n")} ratio=${r.getAs[Double]("distortion_ratio")}%.3f " +
            f"tv=${r.getAs[Double]("tv")}%.3f drifted=${r.getAs[Boolean]("drifted")}")
        }
        println(f"[$dir $name np=$nprobe rn=$rebuildNlist] frozen=$frozen%.3f " +
          f"frozenNew=$frozenNew%.3f frozenOld=$frozenOld%.3f " +
          f"rebuilt=$rebuilt%.3f rebuiltNew=$rebuiltNew%.3f rebuiltOld=$rebuiltOld%.3f")
      }

      def shiftedBy(mag: Double, dirs: Int): DataFrame = e.select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("v"),
          (x, i) => x + when(i === pmod(col("vec_id"), lit(dirs)) * (64 / dirs),
            lit(mag)).otherwise(lit(0.0)))
          .as("v"))
        .withColumn("norm2", dot(col("v"), col("v")))
      val orig = e.select(col("vec_id"), col("v"), col("norm2"))
      scenario("m1.2_d16_rn16np8", orig, shiftedBy(1.2, 16), nprobe = 4,
        rebuildNlist = 16, rebuildNprobeOverride = 8)
      scenario("representative_np4",
        e.filter(col("vec_id") % 10 =!= 7).select(col("vec_id"), col("v"), col("norm2")),
        e.filter(col("vec_id") % 10 === 7).select(col("vec_id"), col("v"), col("norm2")),
        nprobe = 4)
    }
    spark.stop()
  }
}
