package graft.io

import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.ProtoIngest.PMessage

/** DataSource V2 batch source for the reference's proto replay-cache format
  * (S1/S2, `Main.scala:67-120`): text files whose first line is
  * base64(query text) and every following line one base64-encoded serialized
  * proto message.
  *
  * ```
  * ProtoSource.registerDescriptor("ads_row", msg)   // driver-side, once
  * spark.read.format("graft.io.ProtoSource")
  *   .option("descriptor", "ads_row")
  *   .option("expectedQuery", gaqlText)             // optional S2 validity check
  *   .load("/cache/dir")
  * ```
  *
  * Why a DSv2 source rather than `textFile → decode` (which also exists,
  * `ProtoIngest.readBase64Lines`): the scan IS the integration point where
  * Spark pushes work down, and this source accepts it —
  * **column pruning reaches the wire decoder**: `SupportsPushDownRequiredColumns`
  * prunes the message DESCRIPTOR to the requested fields, and the proto3
  * decoder then skips every other field by wire type without materializing
  * it (the same skip path unknown fields take). A projection of 2 of 40
  * columns decodes 2 columns — the moral equivalent of parquet's
  * `ReadSchema` pruning, applied to protobuf bytes.
  *
  * Scale shape: one input partition per file (the format is line-oriented
  * but file-granular like the reference's cache); readers stream lines
  * through constant memory. The gRPC transport itself is out of scope in
  * this environment (no network/stubs) — this source is the landing path
  * its payloads would take.
  */
class ProtoSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ProtoIngest.structTypeOf(ProtoSource.descriptorFor(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ProtoSource.ProtoTable(new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}

object ProtoSource {

  /** Driver-side descriptor registry: DSv2 options are strings, so the
    * descriptor travels by NAME through `.option("descriptor", name)`; the
    * resolved `PMessage` itself is serialized into the reader factory (so
    * executors never need the registry).
    */
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, PMessage]()

  def registerDescriptor(name: String, msg: PMessage): Unit = {
    registry.put(name, msg); ()
  }

  private[io] def descriptorFor(options: CaseInsensitiveStringMap): PMessage = {
    val name = Option(options.get("descriptor")).getOrElse(
      throw new IllegalArgumentException(
        "graft proto source requires .option(\"descriptor\", <registered name>)"))
    Option(registry.get(name)).getOrElse(
      throw new IllegalArgumentException(
        s"no descriptor registered under '$name' — call ProtoSource.registerDescriptor first"))
  }

  private final class ProtoTable(options: CaseInsensitiveStringMap)
      extends Table with SupportsRead {
    private val msg = descriptorFor(options)
    override def name(): String = s"graft-proto(${msg.name})"
    override def schema(): StructType = ProtoIngest.structTypeOf(msg)
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
      new ProtoScanBuilder(msg,
        Option(opts.get("path")).orElse(Option(options.get("path"))).getOrElse(
          throw new IllegalArgumentException("graft proto source requires a path")),
        Option(options.get("expectedQuery")))
  }

  private final class ProtoScanBuilder(msg: PMessage, path: String,
      expectedQuery: Option[String])
      extends ScanBuilder with SupportsPushDownRequiredColumns {
    private var required: StructType = ProtoIngest.structTypeOf(msg)

    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema

    override def build(): Scan = {
      // prune the DESCRIPTOR to the required fields, in required-column
      // order — the decoder then wire-skips everything else
      val pruned = PMessage(msg.name,
        required.fieldNames.flatMap(n => msg.fields.find(_.name == n)).toSeq)
      new ProtoScan(pruned, path, expectedQuery)
    }
  }

  private final class ProtoScan(msg: PMessage, path: String,
      expectedQuery: Option[String]) extends Scan with Batch {
    override def readSchema(): StructType = ProtoIngest.structTypeOf(msg)
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-proto ${msg.name} ReadFields: [${msg.fields.map(_.name).mkString(", ")}]"

    override def planInputPartitions(): Array[InputPartition] = {
      val fs = FileSystem.get(new java.net.URI(path), new Configuration())
      val p = new HPath(path)
      val files =
        if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq.map(_.getPath)
        else Seq(p)
      files.filterNot(_.getName.startsWith("_")).sortBy(_.toString)
        .map(f => ProtoFilePartition(f.toString): InputPartition).toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new ProtoReaderFactory(msg, expectedQuery)
  }

  private final case class ProtoFilePartition(file: String) extends InputPartition

  private final class ProtoReaderFactory(msg: PMessage,
      expectedQuery: Option[String]) extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
      new ProtoPartitionReader(
        partition.asInstanceOf[ProtoFilePartition].file, msg, expectedQuery)
  }

  private final class ProtoPartitionReader(file: String, msg: PMessage,
      expectedQuery: Option[String]) extends PartitionReader[InternalRow] {
    private val schema = ProtoIngest.structTypeOf(msg)
    private val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
    private val stream = FileSystem.get(new java.net.URI(file), new Configuration())
      .open(new HPath(file))
    private val lines = new java.io.BufferedReader(
      new java.io.InputStreamReader(stream, "UTF-8"))
    private val b64 = java.util.Base64.getDecoder

    // first line = base64(query text); replay only if it matches (S2 rule)
    locally {
      val header = lines.readLine()
      expectedQuery.foreach { q =>
        val cached = Option(header).map(h => new String(b64.decode(h), "UTF-8"))
        if (!cached.contains(q))
          throw new IllegalStateException(
            s"cache holds a different query (${cached.getOrElse("<empty>")}); refetch required")
      }
    }

    private var current: InternalRow = _

    override def next(): Boolean = {
      val line = lines.readLine()
      if (line == null || line.isEmpty) false
      else {
        current = toCatalyst(ProtoIngest.decodeBytes(b64.decode(line), msg))
          .asInstanceOf[InternalRow]
        true
      }
    }

    override def get(): InternalRow = current
    override def close(): Unit = lines.close()
  }
}
