package graft.sources

import java.nio.file.Path

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** The catalog table as a STREAMING SOURCE: every committed snapshot is
  * an offset, and a micro-batch reads exactly the data files the
  * snapshot range ADDED — `spark.readStream.table("cat.ns.t")` tails a
  * table the way a log is tailed, the lakehouse pattern for feeding
  * incremental pipelines straight from storage.
  *
  * Contract: APPEND-ONLY between consumed offsets. Appends only ever add
  * files, so the manifest diff IS the new data. A commit that REMOVES
  * manifest files in the consumed range (DELETE/UPDATE/MERGE rewrites,
  * compaction) would make the file diff double-count surviving rows —
  * the stream detects the removal and fails loudly instead of emitting
  * wrong results (Delta's default source behavior for the same reason).
  */
private[sources] class GraftTableStream(
    dir: Path, tableSchema: StructType, required: StructType)
    extends MicroBatchStream {

  private case class SnapshotOffset(v: Long) extends Offset {
    override def json(): String = v.toString
  }

  private def filesAt(v: Long): Seq[String] =
    if (v <= 0L) Nil else GraftJsonSink.readManifestVersion(dir, v)._2

  override def initialOffset(): Offset = SnapshotOffset(0L)

  override def latestOffset(): Offset =
    SnapshotOffset(GraftJsonSink.listSnapshots(dir).lastOption.getOrElse(0L))

  override def deserializeOffset(json: String): Offset =
    SnapshotOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotOffset].v
    val e = end.asInstanceOf[SnapshotOffset].v
    val before = filesAt(s)
    val after = filesAt(e)
    val removed = before.toSet.diff(after.toSet)
    require(removed.isEmpty,
      s"streaming source requires append-only commits, but snapshots " +
        s"$s..$e removed files: ${removed.take(3).mkString(", ")} — " +
        "restart the stream from a fresh checkpoint after compaction/rewrites")
    after.filterNot(before.toSet)
      .map(f => JsonFilePartition(dir.resolve(f).toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonFileReaderFactory(tableSchema, required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
