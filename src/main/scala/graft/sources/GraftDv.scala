package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.StructType

/** Merge-on-read deletion vectors — the delete path that does NOT
  * rewrite data files.
  *
  * A DELETE in `mor` mode (session conf `spark.graft.delete.mode=mor`)
  * records, per data file, the sorted 0-based ordinals of its deleted
  * rows (ordinal = the row's index among the file's non-empty lines, in
  * file order — the same indexing every reader of the format produces).
  * The vectors ride INSIDE the manifest (`"dvs":{"<file>":[o,...]}`), so
  * a delete commits atomically with the usual manifest swap, every
  * snapshot captures the vectors in force at its commit (VERSION AS OF
  * replays deletes exactly), and compaction/expiry need no extra
  * orphan-tracking. Readers subtract the vector while scanning; rewrites
  * (compact, zorder, update-touched files) MATERIALIZE vectors — the
  * rewritten file carries only live rows and its vector entry drops.
  *
  * Why this matters at 100 TB: a copy-on-write delete of 100 rows spread
  * over 1 000 × 1 GB files rewrites a terabyte; the vector commit writes
  * a few KB of manifest. The trade is a per-scan membership test, paid
  * until maintenance (OPTIMIZE/compaction) folds the vectors in — the
  * Iceberg v2 position-delete / Delta deletion-vector design. At that
  * scale the ordinal sets would serialize as roaring bitmaps in sidecar
  * files referenced by the manifest; the inline JSON array here keeps
  * the single-commit-point protocol identical with zero new file kinds.
  *
  * Stats/bloom sidecars keep describing the PHYSICAL file (deleted rows
  * included): skipping stays conservative (a superset range can only
  * keep extra files, never drop a live match), and no sidecar needs
  * touching on the delete path. Live-row accounting is always
  * `stats.rows - dv.length`.
  */
object GraftDv {

  /** Deletion vectors of the live manifest: file name → sorted deleted
    * ordinals. Empty map when none.
    */
  def read(dir: Path): Map[String, Array[Int]] =
    parse(manifestText(dir.resolve(GraftJsonSink.ManifestName)))

  /** Deletion vectors as of snapshot `version`. */
  def readVersion(dir: Path, version: Long): Map[String, Array[Int]] =
    parse(manifestText(dir.resolve(s"${GraftJsonSink.SnapshotPrefix}$version.json")))

  private def manifestText(m: Path): String =
    if (!Files.exists(m)) ""
    else new String(Files.readAllBytes(m), StandardCharsets.UTF_8)

  /** Parse the `"dvs":{...}` fragment. The object nests brackets (the
    * ordinal arrays) but never braces, so the brace-bounded group is
    * exact.
    */
  private[sources] def parse(text: String): Map[String, Array[Int]] =
    "\"dvs\"\\s*:\\s*\\{([^}]*)\\}".r.findFirstMatchIn(text)
      .map(g => "\"([^\"]+)\"\\s*:\\s*\\[([0-9,\\s]*)\\]".r
        .findAllMatchIn(g.group(1))
        .map(p => p.group(1) ->
          p.group(2).split(',').map(_.trim).filter(_.nonEmpty).map(_.toInt))
        .filter(_._2.nonEmpty)
        .toMap)
      .getOrElse(Map.empty)

  /** Render the manifest suffix fragment (empty when no vectors). */
  private[sources] def render(dvs: Map[String, Array[Int]]): String = {
    val nonEmpty = dvs.filter(_._2.nonEmpty)
    if (nonEmpty.isEmpty) ""
    else nonEmpty.toSeq.sortBy(_._1)
      .map { case (f, ords) => "\"" + f + "\":[" + ords.mkString(",") + "]" }
      .mkString(",\"dvs\":{", ",", "}")
  }

  /** The file's live (non-deleted) non-empty lines, in order. */
  private[sources] def liveLines(dir: Path, file: String, dv: Array[Int]): Seq[String] = {
    val lines = Files.readAllLines(dir.resolve(file), StandardCharsets.UTF_8)
      .asScala.filter(_.nonEmpty).toSeq
    if (dv.isEmpty) lines
    else {
      val dead = dv.toSet
      lines.zipWithIndex.collect { case (l, i) if !dead(i) => l }
    }
  }

  /** Rewrite `targets` (files that carry a vector) as live-only files,
    * committing the swap as a normal snapshot: data files change names,
    * their vector entries drop, row count is unchanged. Callers that
    * re-read data files OUTSIDE the vector-aware scan (UPDATE's staging
    * read) materialize first so a deleted row can never resurrect.
    * Must run under the table commit lock (re-entrant for callers that
    * already hold it). Returns old name → new name.
    */
  private[sources] def materialize(
      dir: Path, schema: StructType, targets: Seq[String]): Map[String, String] =
    GraftJsonSink.withCommitLock(dir) {
      val (rows, files) = GraftJsonSink.readManifest(dir)
      val dvs = read(dir)
      val todo = targets.filter(f => dvs.get(f).exists(_.nonEmpty))
      if (todo.isEmpty) Map.empty
      else {
      val stats = GraftStats.read(dir, schema)
      val aliases = GraftCatalog.renamesAt(dir)
      val format = GraftFormat.at(dir)
      val writeId = java.util.UUID.randomUUID().toString.take(8)
      var renamed = Map.empty[String, String]
      var newStats = Map.empty[String, GraftStats.FileStats]
      todo.zipWithIndex.foreach { case (f, i) =>
        val nf = f"part-$writeId-dv$i%05d.${format.ext}"
        val c = new GraftStats.Collector(schema)
        val w = format.newWriter(dir.resolve(nf), schema)
        val live = GraftFormat.liveRows(format, dir, f, dvs(f), schema, aliases)
        try live.foreach { r => w.write(r); c.observe(r) }
        finally { try live.close() finally w.close() }
        newStats += nf -> c.result()
        renamed += f -> nf
      }
      val kept = (files.filterNot(renamed.contains) ++ renamed.values).sorted
      val manifest = new java.lang.StringBuilder()
        .append("{\"rows\":").append(rows)
        .append(",\"files\":[")
        .append(kept.map(f => "\"" + f + "\"").mkString(","))
        .append("]")
        .append(render(dvs -- renamed.keys))
        .append(GraftJsonSink.renderTxn(GraftJsonSink.readTxn(dir)))
        .append("}\n").toString
      val tmp = dir.resolve(GraftJsonSink.ManifestName + ".tmp")
      Files.write(tmp, manifest.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, dir.resolve(GraftJsonSink.ManifestName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      GraftJsonSink.snapshotManifest(dir)
      GraftStats.write(dir, stats ++ newStats, schema)
      // a materialized file holds exactly the live rows of ONE original,
      // so it inherits that file's partition value — grouped layout holds
      val parts = GraftParts.read(dir)
      if (parts.nonEmpty) {
        val inherited = renamed.collect {
          case (orig, nf) if parts.contains(orig) => nf -> parts(orig)
        }
        if (inherited.size == renamed.size)
          GraftParts.write(dir, parts ++ inherited)
        else Files.deleteIfExists(dir.resolve(GraftParts.PartsName))
      }
      renamed
      }
    }
}
