package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** The shared mechanics of the four persisted-index lifecycles
  * (PrefixFilterJoin, NearDupLsh, Bm25Index, IvfIndex). All four use the
  * same crash-idempotent layout — per-artifact `batch=<id>` partition
  * directories written with OVERWRITE (build owns -1, appends own
  * unique ids per delivery) — and therefore share three mechanics that
  * were previously hand-mirrored per operator (a divergence bug waiting
  * to happen; per-artifact column sets and derivations stay with each
  * operator):
  *
  *  - [[batchDirIds]]: the serve-side O(1) directory listing used by
  *    layout-consistency checks (LSH hot-sidecar completeness, ppjoin
  *    candidate-bound validity). Off-contract names mean the caller must
  *    take its always-correct fallback, so the listing reports them as
  *    `None` rather than guessing.
  *  - [[tailIds]]: the compaction watermark tail — batches beyond the
  *    committed `throughBatch` carry over unchanged, partition for
  *    partition. Compaction REWRITES data, so an off-contract
  *    file-bearing dir here is not a fallback case but silent data
  *    loss (the `col("batch") <= w` fold would see the inferred
  *    partition column flip to string and drop its rows as null casts):
  *    it fails fast instead.
  *  - [[cutBatches]]: the strictly-earlier serve cut that keeps a
  *    half-landed (artifacts written, checkpoint commit missed)
  *    micro-batch invisible to serves running during ingest.
  */
object IndexLifecycle {

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (parsed batch ids, off-contract `batch=*` dirs). A missing `dir`
    * lists as empty — an artifact not yet written (or a legacy layout
    * without batch partitioning) has no batches, not an error.
    */
  private def listBatchDirs(spark: SparkSession, dir: String)
      : (Set[Long], Seq[org.apache.hadoop.fs.Path]) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) (Set.empty, Nil)
    else {
      val batchDirs = fs.listStatus(p).filter(_.isDirectory)
        .filter(_.getPath.getName.startsWith("batch="))
      val (ok, bad) = batchDirs.partition(st =>
        scala.util.Try(st.getPath.getName.stripPrefix("batch=").toLong).isSuccess)
      (ok.map(_.getPath.getName.stripPrefix("batch=").toLong).toSet,
        bad.map(_.getPath).toSeq)
    }
  }

  /** The batch ids present under `dir` (optionally restricted to ids
    * strictly below `maxBatchExclusive` — the serve cut), or `None`
    * when any `batch=*` directory name fails to parse as a long id:
    * the layout is off-contract (tooling leftovers like `batch=1.bak`)
    * and the caller takes its always-correct fallback — the exact
    * stats aggregate for the LSH hot-bucket skip list, a voided
    * candidate bound (⇒ shuffle_hash) for the ppjoin serve — instead
    * of crashing or mis-deciding on a layout nobody wrote.
    */
  def batchDirIds(spark: SparkSession, dir: String,
      maxBatchExclusive: Option[Long] = None): Option[Set[Long]] = {
    val (ids, bad) = listBatchDirs(spark, dir)
    if (bad.nonEmpty) None
    else Some(maxBatchExclusive.fold(ids)(b => ids.filter(_ < b)))
  }

  /** Compaction tail for one artifact directory: the batch ids beyond
    * the committed watermark, sorted — each carries over to the target
    * unchanged while `batch <= throughBatch` folds into the new
    * bootstrap. Listed from the directory, never from a relation scan
    * (enumerating ids by scanning a year of postings just to read
    * directory names triples the maintenance job's I/O).
    *
    * FAILS FAST on a file-bearing `batch=*` dir that doesn't parse as a
    * long id: compaction's fold filters `col("batch") <= w` on the
    * inferred partition column, and one such dir flips that column to
    * string — the numeric dirs' rows cast to null and silently vanish
    * from BOTH the fold and the tail, i.e. committed data is dropped at
    * the target. Empty off-contract dirs are skipped (partition
    * discovery skips them too, so they cannot affect the fold).
    */
  def tailIds(spark: SparkSession, dir: String, throughBatch: Long): Seq[Long] = {
    val (ids, bad) = listBatchDirs(spark, dir)
    val fileBearing = bad.filter { p =>
      val fs = fsOf(spark, p)
      fs.getContentSummary(p).getFileCount > 0
    }
    require(fileBearing.isEmpty,
      s"off-contract batch directories with data under $dir: " +
        s"${fileBearing.mkString(", ")} — their names don't parse as batch " +
        "ids, so a compaction fold would silently drop rows (the inferred " +
        "batch partition column becomes a string and numeric ids cast to " +
        "null); rename or remove them before compacting")
    ids.filter(_ > throughBatch).toSeq.sorted
  }

  /** Compaction trigger for the auto-maintenance layer (each index's
    * `maintain`): fold only when the committed batch-dir count under a
    * long-running ingest exceeds this, so directory-listing cost per
    * serve stays bounded without an operator remembering to compact.
    * Tunable via `spark.graft.index.compactMinBatches`.
    */
  val DefaultCompactMinBatches: Int = 16

  /** True when `dir` holds more than the conf'd number of committed
    * (id ≤ `throughBatch`, bootstrap included) batch directories — the
    * cheap (one listing, no data read) check each index's `maintain`
    * gates its compaction on. Off-contract file-bearing dirs fail fast
    * exactly like [[tailIds]]: a maintenance decision must not silently
    * miscount the layout it is about to rewrite.
    */
  def compactDue(spark: SparkSession, dir: String,
      throughBatch: Long): Boolean = {
    val key = "spark.graft.index.compactMinBatches"
    val threshold = spark.conf.getOption(key).map { raw =>
      // fail-fast parse, same pattern as the rowGroupBytes knob: a
      // malformed value must not surface as a bare NumberFormatException
      // with no hint of WHICH conf broke the maintenance tick
      val n =
        try raw.toInt
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$key must be a plain integer batch count, got '$raw'")
        }
      require(n > 0, s"$key must be positive, got $n")
      n
    }.getOrElse(DefaultCompactMinBatches)
    val (ids, bad) = listBatchDirs(spark, dir)
    val fileBearing = bad.filter(p =>
      fsOf(spark, p).getContentSummary(p).getFileCount > 0)
    require(fileBearing.isEmpty,
      s"off-contract batch directories with data under $dir: " +
        s"${fileBearing.mkString(", ")} — fix the layout before maintenance")
    ids.count(_ <= throughBatch) > threshold
  }

  /** The strictly-earlier serve cut on the `batch` partition column —
    * pass the last checkpoint-COMMITTED batch id + 1 to keep a
    * half-landed micro-batch invisible; `None` serves everything.
    * Legacy layouts without the column (pre-partition-layout indexes)
    * carry no appends and serve whole, exactly as before the column
    * existed.
    */
  def cutBatches(df: DataFrame, maxBatchExclusive: Option[Long]): DataFrame =
    maxBatchExclusive match {
      case Some(b) if df.columns.contains("batch") => df.filter(col("batch") < b)
      case _ => df
    }
}
