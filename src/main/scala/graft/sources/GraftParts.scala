package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Partition-value sidecar for identity-partitioned catalog tables:
  * one JSON line per data file mapping it to the canonical text of its
  * single partition value (null for a NULL partition value). Like the
  * stats sidecar it lives OUTSIDE the commit point — the scan only
  * trusts it when every manifest file is covered, so losing or tearing
  * it degrades grouping, never correctness.
  */
private[sources] object GraftParts {

  val PartsName = "_graft_parts.json"

  private val lineSchema = StructType(Seq(
    StructField("f", StringType), StructField("v", StringType)))

  def write(dir: Path, parts: Map[String, Option[String]]): Unit = {
    val body = parts.toSeq.sortBy(_._1).map { case (f, v) =>
      GraftJsonSink.renderRow(InternalRow(
        UTF8String.fromString(f), v.map(UTF8String.fromString).orNull),
        lineSchema)
    }.mkString("", "\n", "\n")
    val tmp = dir.resolve(PartsName + ".tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(PartsName),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def read(dir: Path): Map[String, Option[String]] = {
    val f = dir.resolve(PartsName)
    if (!Files.exists(f)) return Map.empty
    Files.readAllLines(f, StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty)
      .map { line =>
        val row = JsonLineParser.parse(line, lineSchema, lineSchema)
        val file = row.getUTF8String(0).toString
        val v = if (row.isNullAt(1)) None else Some(row.getUTF8String(1).toString)
        file -> v
      }.toMap
  }
}
