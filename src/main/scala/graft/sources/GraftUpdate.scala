package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{col, when}
import org.apache.spark.sql.graft.GraftPlans

/** UPDATE ... SET ... WHERE for graft catalog tables — the copy-on-write
  * counterpart to SQL DELETE, planned by the same stats layer:
  *
  *  - files whose min/max ranges prove the predicate can't match survive
  *    in the manifest WITHOUT BEING READ;
  *  - candidate files stream through executors (a distributed scan of
  *    exactly those files), each row rewritten when the predicate is
  *    definitely TRUE under three-valued logic (UNKNOWN keeps the
  *    original — SQL semantics) and kept verbatim otherwise;
  *  - rewritten rows commit through the sink (fresh per-file stats in
  *    the same pass) and the manifest swap is the single atomic commit
  *    point; the pre-update snapshot stays readable via VERSION AS OF
  *    until compact() vacuums it.
  *
  * At 100 TB the touched-file set is what a clustered layout makes
  * small — combine with ZOrder/range ingest so point updates rewrite a
  * few files, not the table.
  */
object GraftUpdate {

  /** Apply `set` (column → new-value expression, evaluated against the
    * pre-update row) to every row of `tableFqn` matching `where`.
    * Returns the table's (unchanged) row count.
    */
  def update(
      spark: SparkSession,
      tableFqn: String,
      where: Column,
      set: Map[String, Column]): Long = {
    val parts = tableFqn.split('.')
    require(parts.length >= 2, s"expected catalog.[ns.]table, got $tableFqn")
    val root = spark.conf.get(s"spark.sql.catalog.${parts.head}.root")
    val dir = parts.tail.foldLeft(Paths.get(root))(_.resolve(_))
    val table = spark.table(tableFqn)
    val schema = table.schema
    val unknown = set.keySet.diff(schema.fieldNames.toSet)
    require(unknown.isEmpty, s"SET references unknown columns: $unknown")

    val skipFilters = GraftStats.understood(GraftPlans.translateFilters(table, where))
    // the lock spans planning through splice: an append committing
    // between our manifest read and our manifest swap would be dropped
    // by the rewrite otherwise (row-level ops serialize with appends)
    GraftJsonSink.withCommitLock(dir) {
    // materialize deletion vectors on files this update may rewrite
    // FIRST: the staging read below goes through Spark's by-name JSON
    // reader, which has no row ordinals — without materializing, a
    // MOR-deleted row would resurrect into the rewritten file
    locally {
      val (_, files0, dvs0) = GraftJsonSink.readState(dir)
      if (dvs0.nonEmpty) {
        val stats0 = GraftStats.read(dir, schema)
        GraftDv.materialize(dir, schema, files0.filter { f =>
          dvs0.contains(f) && stats0.get(f).forall(fs =>
            skipFilters.forall(GraftStats.mayMatch(_, fs, schema)))
        })
      }
    }
    val (_, files, dvs) = GraftJsonSink.readState(dir)
    val stats = GraftStats.read(dir, schema)
    // a file is touched unless its stats PROVE no row matches; files
    // without stats always count as touched (sound, never lossy)
    val (touched, untouched) = files.partition { f =>
      stats.get(f).forall(fs =>
        skipFilters.forall(GraftStats.mayMatch(_, fs, schema)))
    }
    if (touched.nonEmpty) {
      // FAILFAST: a corrupt data line must abort the update — the default
      // PERMISSIVE mode would silently rewrite it as an all-null row and
      // commit the damage back into the table. Files written before a
      // RENAME COLUMN carry the former key, which Spark's by-name JSON
      // reader would null: read former names as extra columns of the
      // current type and coalesce into the current column.
      val aliases = GraftCatalog.renamesAt(dir)
      val format = GraftFormat.at(dir)
      val readSchema = org.apache.spark.sql.types.StructType(
        schema ++ schema.flatMap(f =>
          aliases.getOrElse(f.name, Set.empty).toSeq.sorted
            .map(a => f.copy(name = a))))
      def cur(n: String): Column =
        org.apache.spark.sql.functions.coalesce(
          (col(n) +: aliases.getOrElse(n, Set.empty).toSeq.sorted.map(col)): _*)
      val touchedPaths = touched.map(f => dir.resolve(f).toString)
      val updated = (format match {
        case JsonFormat => spark.read.schema(readSchema)
          .option("mode", "FAILFAST")
          .json(touchedPaths: _*)
        // parquet: Spark's reader null-fills requested columns absent
        // from a file (corruption fails hard by format design)
        case ParquetFormat => spark.read.schema(readSchema)
          .parquet(touchedPaths: _*)
      })
        // normalize to current names FIRST so `where` and the SET
        // expressions (written against current names) see old-file values
        .select(schema.fieldNames.toIndexedSeq.map(n => cur(n).as(n)): _*)
        .select(schema.fieldNames.toIndexedSeq.map { n =>
          set.get(n) match {
            case Some(e) =>
              when(where, e.cast(schema(n).dataType)).otherwise(col(n)).as(n)
            case None => col(n)
          }
        }: _*)
      // render through the engine's own sink into a staging dir — the
      // executors write data files + stats there, then the driver splices
      // them into the live manifest in one atomic swap. The staging dir
      // (manifest, stats sidecar, snapshot, _tmp) is deleted once the
      // data files have moved out, whether or not the commit succeeds.
      val staging = Files.createTempDirectory("graft_update")
      try {
      updated.write.format("graft-json").option("format", format.name)
        .mode("overwrite").save(staging.toString)
      val (_, newFiles) = GraftJsonSink.readManifest(staging)
      val newStats = GraftStats.read(staging, schema)
      newFiles.foreach(f => Files.move(staging.resolve(f), dir.resolve(f)))

      val allStats = stats ++ newStats
      // stats-less files answer from the format's cheapest row count —
      // parquet reads the footer record count, no page decode
      def fileRows(f: String): Long = allStats.get(f).map(_.rows).getOrElse(
        format.countRows(dir.resolve(f), schema, aliases))
      val allFiles = (untouched ++ newFiles).sorted
      // untouched files may still carry deletion vectors (touched ones
      // were materialized above): their vectors survive the commit and
      // their live count subtracts the vector
      val keptRows = allFiles.map(f =>
        fileRows(f) - dvs.get(f).map(_.length.toLong).getOrElse(0L)).sum
      // streaming-txn markers survive row-level rewrites (same contract
      // as the sink's replace commit)
      val manifest = new java.lang.StringBuilder()
        .append("{\"rows\":").append(keptRows)
        .append(",\"files\":[")
        .append(allFiles.map(f => "\"" + f + "\"").mkString(","))
        .append("]")
        .append(GraftDv.render(dvs.filter { case (f, _) => untouched.contains(f) }))
        .append(GraftJsonSink.renderTxn(GraftJsonSink.readTxn(dir)))
        .append("}\n").toString
      val tmp = dir.resolve(GraftJsonSink.ManifestName + ".tmp")
      Files.write(tmp, manifest.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, dir.resolve(GraftJsonSink.ManifestName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      GraftJsonSink.snapshotManifest(dir)
      GraftStats.write(dir, allStats, schema)
      } finally GraftJsonSink.deleteRecursively(staging)
    }
    } // withCommitLock
    spark.table(tableFqn).count()
  }
}
