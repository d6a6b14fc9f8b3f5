package graft.io

import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming
import org.apache.spark.sql.sources
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
      util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
    override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
      new ProtoScanBuilder(msg,
        Option(opts.get("path")).orElse(Option(options.get("path"))).getOrElse(
          throw new IllegalArgumentException("graft proto source requires a path")),
        Option(options.get("expectedQuery")))
  }

  private final class ProtoScanBuilder(msg: PMessage, path: String,
      expectedQuery: Option[String])
      extends ScanBuilder with SupportsPushDownRequiredColumns
      with SupportsPushDownFilters {
    private var required: StructType = ProtoIngest.structTypeOf(msg)
    private var pushed: Array[sources.Filter] = Array.empty

    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema

    override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
      // accept filters the row-gate can evaluate; Spark re-evaluates every
      // filter above the scan anyway (we return them all as residual), so
      // the gate only ever SKIPS work, never changes results
      pushed = filters.filter(f => RowGate.supports(f, msg))
      filters
    }
    override def pushedFilters(): Array[sources.Filter] = pushed

    override def build(): Scan = {
      // prune the DESCRIPTOR to the required fields, in required-column
      // order — the decoder then wire-skips everything else
      val pruned = PMessage(msg.name,
        required.fieldNames.flatMap(n => msg.fields.find(_.name == n)).toSeq)
      new ProtoScan(pruned, msg, pushed, path, expectedQuery)
    }
  }

  private def listCacheFiles(path: String): Seq[String] = {
    val fs = FileSystem.get(new java.net.URI(path), new Configuration())
    val p = new HPath(path)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath)
      else Seq(p)
    files.filterNot(_.getName.startsWith("_")).map(_.toString).sorted
  }

  private final class ProtoScan(msg: PMessage, fullMsg: PMessage,
      filters: Array[sources.Filter], path: String,
      expectedQuery: Option[String]) extends Scan with Batch {
    override def readSchema(): StructType = ProtoIngest.structTypeOf(msg)
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-proto ${msg.name} ReadFields: [${msg.fields.map(_.name).mkString(", ")}]" +
        s" PushedRowGate: [${filters.mkString(", ")}]"

    override def planInputPartitions(): Array[InputPartition] =
      listCacheFiles(path)
        .map(f => ProtoFilePartition(f): InputPartition).toArray

    override def createReaderFactory(): PartitionReaderFactory =
      new ProtoReaderFactory(msg, fullMsg, filters, expectedQuery)

    override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
      new ProtoMicroBatchStream(msg, fullMsg, filters, path, expectedQuery)
  }

  /** Offset = count of (name-sorted) cache files consumed. The cache
    * contract is append-only with monotonically named files (the reference
    * writes one file per fetch), so the sorted prefix is stable and each
    * file is delivered EXACTLY once across restarts from the checkpoint.
    */
  private final case class ProtoOffset(files: Long)
      extends streaming.Offset {
    override def json(): String = files.toString
  }

  /** Micro-batch stream over the cache directory: each batch = the files
    * that appeared since the last committed offset — the streaming shape of
    * the reference's gRPC iterator (S1), landing on its cache format (S2).
    */
  private final class ProtoMicroBatchStream(msg: PMessage, fullMsg: PMessage,
      filters: Array[sources.Filter], path: String,
      expectedQuery: Option[String]) extends streaming.MicroBatchStream {

    override def initialOffset(): streaming.Offset = ProtoOffset(0L)
    override def latestOffset(): streaming.Offset =
      ProtoOffset(listCacheFiles(path).size.toLong)
    override def deserializeOffset(json: String): streaming.Offset =
      ProtoOffset(json.trim.toLong)

    override def planInputPartitions(start: streaming.Offset,
        end: streaming.Offset): Array[InputPartition] = {
      val (s, e) = (start.asInstanceOf[ProtoOffset].files,
        end.asInstanceOf[ProtoOffset].files)
      listCacheFiles(path).slice(s.toInt, e.toInt)
        .map(f => ProtoFilePartition(f): InputPartition).toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new ProtoReaderFactory(msg, fullMsg, filters, expectedQuery)

    override def commit(end: streaming.Offset): Unit = ()
    override def stop(): Unit = ()
  }

  private final case class ProtoFilePartition(file: String) extends InputPartition

  private final class ProtoReaderFactory(msg: PMessage, fullMsg: PMessage,
      filters: Array[sources.Filter],
      expectedQuery: Option[String]) extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
      new ProtoPartitionReader(
        partition.asInstanceOf[ProtoFilePartition].file, msg, fullMsg, filters,
        expectedQuery)
  }

  private final class ProtoPartitionReader(file: String, msg: PMessage,
      fullMsg: PMessage, filters: Array[sources.Filter],
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

    // two-phase decode (lazy materialization): when filters are pushed,
    // decode ONLY their fields first and skip the full decode for rows that
    // fail — the selective-scan shape where most bytes are never parsed
    private val gate: Option[(Array[Byte]) => Boolean] =
      if (filters.isEmpty) None
      else {
        val gateFields = filters.flatMap(RowGate.references).distinct
        val gateMsg = PMessage(fullMsg.name,
          gateFields.flatMap(n => fullMsg.fields.find(_.name == n)).toSeq)
        Some((bytes: Array[Byte]) => {
          val r = ProtoIngest.decodeBytes(bytes, gateMsg)
          filters.forall(f => RowGate.eval(f, r))
        })
      }

    private var current: InternalRow = _

    override def next(): Boolean = {
      var line = lines.readLine()
      while (line != null && line.nonEmpty) {
        val bytes = b64.decode(line)
        if (gate.forall(_(bytes))) {
          current = toCatalyst(ProtoIngest.decodeBytes(bytes, msg))
            .asInstanceOf[InternalRow]
          return true
        }
        line = lines.readLine()
      }
      false
    }

    override def get(): InternalRow = current
    override def close(): Unit = lines.close()
  }

  /** Conservative evaluator for pushed filters against a decoded gate row:
    * supports simple comparisons on top-level non-repeated scalar fields.
    * Unsupported filters are simply not pushed (Spark evaluates everything
    * above the scan regardless), so this can only skip work, never change a
    * result. Null semantics: any comparison on null is false (SQL), matching
    * the residual Spark filter.
    */
  private object RowGate {
    import org.apache.spark.sql.sources._

    private def gateable(name: String, msg: PMessage): Boolean =
      msg.fields.exists(f => f.name == name && !f.repeated && (f.ptype match {
        case ProtoIngest.PNested(_) | _: ProtoIngest.PNestedRec |
             _: ProtoIngest.PMap | ProtoIngest.PBytes => false
        case _ => true
      }))

    def supports(f: Filter, msg: PMessage): Boolean = f match {
      case EqualTo(a, v)            => gateable(a, msg) && comparable(v)
      case GreaterThan(a, v)        => gateable(a, msg) && comparable(v)
      case GreaterThanOrEqual(a, v) => gateable(a, msg) && comparable(v)
      case LessThan(a, v)           => gateable(a, msg) && comparable(v)
      case LessThanOrEqual(a, v)    => gateable(a, msg) && comparable(v)
      case In(a, vs)                => gateable(a, msg) && vs.forall(comparable)
      case IsNull(a)                => gateable(a, msg)
      case IsNotNull(a)             => gateable(a, msg)
      case And(l, r)                => supports(l, msg) && supports(r, msg)
      case _                        => false
    }

    private def comparable(v: Any): Boolean = v match {
      case _: Long | _: Int | _: Short | _: Byte | _: Double | _: Float |
           _: String | _: Boolean => true
      case _ => false
    }

    def references(f: Filter): Seq[String] = f.references.toSeq

    private def cmp(x: Any, v: Any): Option[Int] = (x, v) match {
      case (null, _) => None
      case (a: Number, b: Number) =>
        Some(java.lang.Double.compare(a.doubleValue(), b.doubleValue()))
      case (a: String, b: String) => Some(a.compareTo(b))
      case (a: Boolean, b: Boolean) => Some(java.lang.Boolean.compare(a, b))
      case _ => None
    }

    def eval(f: Filter, r: org.apache.spark.sql.Row): Boolean = f match {
      case EqualTo(a, v)            => cmp(r.getAs[Any](a), v).contains(0)
      case GreaterThan(a, v)        => cmp(r.getAs[Any](a), v).exists(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(r.getAs[Any](a), v).exists(_ >= 0)
      case LessThan(a, v)           => cmp(r.getAs[Any](a), v).exists(_ < 0)
      case LessThanOrEqual(a, v)    => cmp(r.getAs[Any](a), v).exists(_ <= 0)
      case In(a, vs)                => vs.exists(v => cmp(r.getAs[Any](a), v).contains(0))
      case IsNull(a)                => r.getAs[Any](a) == null
      case IsNotNull(a)             => r.getAs[Any](a) != null
      case And(l, rr)               => eval(l, r) && eval(rr, r)
      case _                        => true // never pushed; defensive
    }
  }
}
