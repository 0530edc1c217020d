package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a coarse quantizer
  * (k-means centroids) partitions the corpus into nlist cells; a query
  * probes only the nprobe nearest cells. The 100 TB shape: centroids are
  * a broadcast-sized table, the corpus is hash-partitioned by cell id,
  * and a query touches nprobe/nlist of the data instead of all of it.
  *
  * Training is deterministic: centroids initialize from the first nlist
  * vectors by id and run a fixed number of Lloyd iterations with
  * distance ties broken by centroid id — same result on any cluster
  * layout.
  */
object IvfIndex {

  // native fused-loop vector ops (bit-identical fold order to the
  // aggregate(zip_with(...)) composition, minus per-row allocation)
  private def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot_product(a, b)

  /** Squared L2 distance. */
  private def dist2(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.l2_dist2(a, b)

  /** Rule-of-thumb index parameters for a corpus of n vectors: nlist ~
    * sqrt(n) cells (the standard IVF sizing — cell scan cost and cell
    * count balance), probing ~1/8 of them. Both clamped to sane floors.
    */
  def autoParams(n: Long): (Int, Int) = {
    val nlist = math.max(16, math.min(65536, math.sqrt(n.toDouble).toInt))
    val nprobe = math.max(4, nlist / 8)
    (nlist, nprobe)
  }

  /** Deterministic farthest-first (k-means++-style, but argmax instead of
    * random draw) seeding over a bounded sample: start from the lowest
    * vec_id, then repeatedly add the sample vector farthest from its
    * nearest chosen centroid (ties by vec_id). Same result on any
    * partitioning; O(sample × nlist) driver work on a nlist*8 sample.
    */
  def farthestFirstInit(vectors: DataFrame, vecCol: String, nlist: Int): DataFrame = {
    val spark = vectors.sparkSession
    val sample = vectors.orderBy(col("vec_id").asc).limit(nlist * 8)
      .select(col("vec_id"), col(vecCol))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val chosen = scala.collection.mutable.ArrayBuffer(sample.head)
    while (chosen.length < math.min(nlist, sample.length)) {
      val next = sample.iterator
        .filterNot(s => chosen.exists(_._1 == s._1))
        .map(s => (s, chosen.iterator.map(c => d2(c._2, s._2)).min))
        .maxBy { case ((id, _), dist) => (dist, -id) } // farthest, ties by lower id
      chosen += next._1
    }
    import spark.implicits._
    chosen.toSeq.zipWithIndex
      .map { case ((_, v), i) => (i, v.toSeq) }
      .toDF("centroid_id", "centroid")
  }

  /** Train nlist centroids with `iters` Lloyd iterations.
    * Returns (centroid_id, centroid array<double>).
    * `init = "first"` seeds from the first nlist vectors by id (fast,
    * fully distributed); `init = "farthest"` uses farthest-first seeding
    * — better-separated seeds on clustered data at the cost of a small
    * driver-side sample pass.
    */
  def train(
      vectors: DataFrame,
      vecCol: String,
      nlist: Int,
      iters: Int,
      init: String = "first"): DataFrame = {
    val spark = vectors.sparkSession
    graft.functions.GraftFunctions.register(spark)
    var centroids =
      if (init == "farthest") farthestFirstInit(vectors, vecCol, nlist)
      else vectors
        .orderBy(col("vec_id").asc)
        .limit(nlist)
        .select(
          (row_number().over(Window.orderBy(col("vec_id").asc)) - 1).as("centroid_id"),
          col(vecCol).as("centroid"))
    for (_ <- 1 to iters) {
      val assigned = assign(vectors, vecCol, centroids)
      // elementwise mean per cell: explode to (cell, dim, value)
      val newCentroids = assigned
        .select(col("centroid_id"),
          posexplode(col(vecCol)).as(Seq("dim", "v")))
        .groupBy(col("centroid_id"), col("dim"))
        // decimal mean: order-independent, so centroids are identical on
        // any partitioning (double avg would drift in the last ulp)
        .agg((sum(col("v").cast("decimal(38,18)")) / count(lit(1)))
          .cast("double").as("m"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dims"))
        .select(col("centroid_id"),
          transform(col("dims"), d => d.getField("m")).as("centroid"))
      centroids = newCentroids
    }
    // pin the trained table as a LOCAL relation: nlist rows of dim
    // doubles (bounded by construction — the collect is the point of
    // k-means). This truncates the Lloyd lineage, so consumers don't
    // recompute iteration i-1 under iteration i, and unlike cache()
    // it leaves zero block-manager entries behind for callers that
    // never unpersist.
    import spark.implicits._
    centroids.collect()
      .map(r => (r.getAs[Number]("centroid_id").intValue,
        r.getSeq[Double](r.fieldIndex("centroid"))))
      .toSeq.toDF("centroid_id", "centroid")
  }

  /** Assign each vector to its nearest centroid (ties by centroid id). */
  def assign(vectors: DataFrame, vecCol: String, centroids: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2").asc, col("centroid_id").asc)
    vectors.join(broadcast(centroids))
      .withColumn("d2", dist2(col(vecCol), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "d2", "centroid")
  }

  /** Query: probe the nprobe nearest cells per query vector, exact
    * cosine rescoring inside them, top-k per query.
    */
  def search(
      corpus: DataFrame, // vec_id, v (array<double>), norm2
      centroids: DataFrame,
      queries: DataFrame, // query_id, qv, qn
      nprobe: Int,
      k: Int): DataFrame =
    searchAssigned(assign(corpus, "v", centroids), centroids, queries, nprobe, k)

  // ------------------------------------------------------------------
  // Persisted index lifecycle — build → append → serve → compact, the
  // same maintenance shape as PrefixFilterJoin / NearDupLsh / Bm25Index.
  // Vectors must carry (vec_id, v: array<double>, norm2); the quantizer
  // (centroid table) FREEZES at build time, exactly like the ppjoin
  // index's frozen rarest-first order: appended vectors assign under
  // the build-time centroids, and because SEARCH probes cells with the
  // same frozen centroids, the candidate-set semantics stay
  // IVF-consistent — distribution drift degrades cell BALANCE (serve
  // cost), never the recall contract relative to the frozen quantizer.
  // Rebuild (retrain) when drift fattens cells, exactly like
  // re-ranking the ppjoin prefixes.
  //
  // Layout under `path` — crash-idempotent `batch=<id>` OVERWRITE
  // partitions (build owns -1), each cell-partitioned one level down
  // so a serve's partition pruning reads only the probed cells of
  // every batch:
  //   centroids/                        (centroid_id, centroid)
  //   corpus/batch=<id>/centroid_id=<c>/  (vec_id, v, norm2)
  // ------------------------------------------------------------------

  def readCentroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/centroids")

  /** Build: train the quantizer on the standing corpus, persist it, and
    * land the assigned corpus in the `batch=-1` bootstrap partition.
    */
  def writeIndex(vectors: DataFrame, path: String,
      nlist: Int, iters: Int, init: String = "first"): Unit = {
    val centroids = train(vectors.select(col("vec_id"), col("v")),
      "v", nlist, iters, init)
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    writeCells(
      assign(vectors.select(col("vec_id"), col("v"), col("norm2")), "v", centroids),
      s"$path/corpus/batch=-1")
  }

  /** Cell-partitioned write, clustered by cell FIRST: a raw partitionBy
    * from W input partitions writes up to W × nlist files per batch (a
    * year of daily appends at 1000 cells = millions of tiny files); the
    * pre-write hash cluster lands each cell's rows in one task — one
    * file per cell per batch dir, the bucketed layout partition pruning
    * wants.
    */
  private def writeCells(assigned: DataFrame, targetDir: String): Unit =
    assigned.repartition(col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(targetDir)

  /** Append an ingest batch under the FROZEN quantizer (vec ids disjoint
    * from the standing corpus, batch ids >= 0 and unique per DELIVERY —
    * a redelivered batch reuses its id and OVERWRITES its own
    * partitions: crash-idempotent, no transaction log).
    */
  def appendIndex(vectors: DataFrame, path: String, batchId: Long): Unit = {
    require(batchId >= 0, s"append batch ids are >= 0 (build owns -1): $batchId")
    val centroids = readCentroids(vectors.sparkSession, path)
    writeCells(
      assign(vectors.select(col("vec_id"), col("v"), col("norm2")), "v", centroids),
      s"$path/corpus/batch=$batchId")
  }

  /** Serve: ANN top-k per query from the persisted artifacts only —
    * partition pruning keeps the scan to the probed cells of each batch
    * partition. `maxBatchExclusive` restricts the served corpus to
    * strictly-earlier batches (the serve-during-ingest filter — a
    * half-landed micro-batch stays invisible); None serves everything.
    */
  def topK(spark: SparkSession, path: String, queries: DataFrame,
      nprobe: Int, k: Int,
      maxBatchExclusive: Option[Long] = None): DataFrame = {
    val indexed = IndexLifecycle
      .cutBatches(spark.read.parquet(s"$path/corpus"), maxBatchExclusive)
      .select(col("vec_id"), col("v"), col("norm2"), col("centroid_id"))
    searchAssigned(indexed, readCentroids(spark, path), queries, nprobe, k)
  }

  /** Consolidate an append-only index into a fresh directory: batches up
    * to `throughBatch` fold into ONE `batch=-1` partition set (still
    * cell-partitioned); later batches carry over unchanged under their
    * own ids. The centroid table copies verbatim — compaction never
    * retrains, so every serve (whole or strictly-earlier-cut) is
    * identical on the compacted index. Source index never mutated; the
    * caller swaps paths after the write completes. `throughBatch` MUST
    * be the last checkpoint-COMMITTED batch when a stream feeds this
    * index (default folds everything — clean-stop only), for the same
    * reason as the other three indexes: a crashed batch folded into
    * `batch=-1` could never again be excluded by the strictly-earlier
    * serve filter.
    */
  def compactIndex(spark: SparkSession, path: String, targetPath: String,
      throughBatch: Long = Long.MaxValue): Unit = {
    // tail ids from a directory listing, not a corpus scan (the fold
    // below is the only full read compaction should pay) — listed FIRST
    // so an off-contract file-bearing batch dir fails fast instead of
    // silently dropping rows from the fold (IndexLifecycle.tailIds)
    val tail = IndexLifecycle.tailIds(spark, s"$path/corpus", throughBatch)
    readCentroids(spark, path)
      .write.mode("overwrite").parquet(s"$targetPath/centroids")
    val all = spark.read.parquet(s"$path/corpus")
    writeCells(
      all.filter(col("batch") <= throughBatch)
        .select(col("vec_id"), col("v"), col("norm2"), col("centroid_id")),
      s"$targetPath/corpus/batch=-1")
    tail.foreach { b =>
      writeCells(
        all.filter(col("batch") === b)
          .select(col("vec_id"), col("v"), col("norm2"), col("centroid_id")),
        s"$targetPath/corpus/batch=$b")
    }
  }

  /** Query over an ALREADY-ASSIGNED corpus (vec_id, v, norm2,
    * centroid_id) — the serve-time entry point when the assignment is a
    * persisted index artifact rather than computed inline.
    */
  def searchAssigned(
      indexed: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      nprobe: Int,
      k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(indexed.sparkSession)

    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("centroid_id").asc)
    val probes = queries.join(broadcast(centroids))
      .withColumn("d2", dist2(col("qv"), col("centroid")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("centroid_id"))

    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    probes.join(indexed, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dot(col("qv"), col("v")) / (sqrt(col("qn")) * sqrt(col("norm2"))), 6)
          .as("cosine"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
  }
}
