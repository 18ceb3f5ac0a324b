package graft.sources

import java.util
import java.util.Base64
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSourceV2 over the engine's write-ahead log: queries the redo log as
  * a table — `spark.read.format("graft.sources.WalDataSource").load(path)`
  * (or several paths) with schema `(seq BIGINT, op STRING, key STRING,
  * value BINARY)`.
  *
  * The reference's storage source/sink is exactly this: one append-only
  * record log replayed at boot (ref: p3/server/format.h:45-121,
  * p3/server/my_storage.cc:573-702). Exposing it as a Spark table makes the
  * log itself analyzable (fold-to-current-state, audit, op statistics) with
  * ordinary SQL.
  *
  * Scale shape: one [[InputPartition]] per WAL segment file — segments scan
  * in parallel and the fold (last-writer-wins by (key, seq)) is a normal
  * shuffle. Line offsets within a segment give the monotonic `seq`.
  */
class WalDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WalDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WalTable(
      properties.asScala.get("path").toSeq ++
        WalDataSource.parsePaths(properties.asScala.get("paths")))
}

object WalDataSource {
  val schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("value", BinaryType, nullable = true)))

  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Multi-path `load(p1, p2, ...)` arrives as a JSON array string under
    * "paths" (DSv2 contract); a single `option("paths", ...)` may be a bare
    * comma list. The JSON form is parsed with Spark's bundled Jackson so
    * every escape (\t, \uXXXX, ...) round-trips; malformed '['-prefixed
    * input throws IllegalArgumentException with the offending value (it is
    * never a valid comma list, so failing fast beats guessing paths). */
  def parsePaths(raw: Option[String]): Seq[String] = raw match {
    case None => Nil
    case Some(s) if s.trim.startsWith("[") =>
      // '['-prefixed input is never a valid comma list — fail loudly with
      // context instead of degrading to garbage paths that read as empty
      scala.util.Try {
        val node = mapper.readTree(s)
        (0 until node.size()).map(node.get(_).asText())
      }.getOrElse(throw new IllegalArgumentException(
        s"graft-wal: malformed JSON in 'paths' option: $s"))
    case Some(s) => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
  }
}

final class WalTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"graft_wal(${paths.mkString(",")})"
  override def schema(): StructType = WalDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WalScanBuilder(resolvePaths(options))

  private def resolvePaths(options: CaseInsensitiveStringMap): Seq[String] = {
    val fromOpts = Option(options.get("path")).toSeq ++
      WalDataSource.parsePaths(Option(options.get("paths")))
    (paths ++ fromOpts).distinct
  }
}

final class WalScanBuilder(paths: Seq[String]) extends ScanBuilder {
  override def build(): Scan = new WalScan(paths)
}

final class WalScan(paths: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType = WalDataSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => WalInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new WalReaderFactory
}

final case class WalInputPartition(path: String) extends InputPartition

final class WalReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WalPartitionReader(partition.asInstanceOf[WalInputPartition].path)
}

/** Streams one WAL segment line-by-line (no whole-file materialization).
  * Records missing the terminal `\t#` marker, with a wrong field count, or
  * with undecodable base64 are skipped — the same quarantine-not-crash
  * defense as engine replay, so one damaged record never kills the whole
  * scan. (Legacy marker-less logs are migrated to marker format by the
  * engine's first boot; read them through the engine, not this raw reader.) */
final class WalPartitionReader(path: String) extends PartitionReader[InternalRow] {
  private val reader =
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      java.nio.file.Files.newBufferedReader(java.nio.file.Paths.get(path))
    else null
  private var row: InternalRow = _
  private var seq: Long = -1L

  override def next(): Boolean = {
    if (reader == null) return false
    val line = reader.readLine()
    seq += 1
    if (line == null) false
    else parse(line) match {
      case Some(r) => row = r; true
      case None => next() // skip torn/legacy/malformed record
    }
  }

  /** Full structural validation happens HERE, not in get(): a marker-
    * terminated but malformed record ('X\t#', non-base64 fields) must be
    * skipped like a torn one, not crash the scan at get() time. Records are
    * `OP\tb64(key)[\tb64(value)]\t#` (see KvStore.replayLine). */
  private def parse(line: String): Option[InternalRow] = {
    if (!line.endsWith("\t#")) return None
    val parts = line.dropRight(2).split("\t", -1)
    if (parts.length < 2 || parts.length > 3) return None
    scala.util.Try {
      val dec = Base64.getDecoder
      val key = dec.decode(parts(1))
      val value = if (parts.length > 2) dec.decode(parts(2)) else null
      InternalRow(seq, UTF8String.fromString(parts(0)),
        UTF8String.fromBytes(key), value)
    }.toOption
  }

  override def get(): InternalRow = row

  override def close(): Unit = if (reader != null) reader.close()
}
