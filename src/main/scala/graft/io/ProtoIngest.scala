package graft.io

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Protobuf binary ingest without external jars — the reference's actual
  * input surface (S1: a stream of serialized `GoogleAdsRow` protos) rebuilt
  * on the proto3 wire format directly, since neither `spark-protobuf` nor
  * `protobuf-java` ships in this Spark distribution.
  *
  * Schema model: a minimal descriptor ([[PMessage]]/[[PField]]) standing in
  * for `Descriptors.Descriptor`; [[structTypeOf]] derives the Spark schema
  * with the REFERENCE's mapping rules (ProtoMessageToAvroMappings.scala:
  * 221-243 type map, :241-242 nullability, :70-83 zero defaults, :210
  * empty-string→null, :314-318 missing-submessage→null):
  *  - int32/sint32/sfixed32 → int, int64/sint64/sfixed64 → long,
  *    float/double/bool/string/bytes → same-named Spark types
  *  - enum → the symbol name as string
  *  - nested message → nullable struct; missing → null (never an empty row)
  *  - repeated → array (packed and unpacked wire encodings both accepted),
  *    missing → []
  *  - unset scalar → proto3 zero default; unset/empty string → null
  *  - unknown field numbers are skipped by wire type (forward compat)
  *
  * Execution shape: decode runs in `mapPartitions` (per-row imperative byte
  * work — exactly the case SURVEY §7 reserves mapPartitions for), emitting
  * rows of the plan-time-derived schema, so everything downstream (the
  * Translator projection, filters, sinks) is ordinary codegen'd Catalyst.
  */
object ProtoIngest {

  // ---------------------------------------------------------------- schema
  sealed trait PType
  case object PInt32 extends PType
  case object PInt64 extends PType
  case object PSInt32 extends PType // zigzag
  case object PSInt64 extends PType // zigzag
  case object PFixed32 extends PType
  case object PFixed64 extends PType
  case object PFloat extends PType
  case object PDouble extends PType
  case object PBool extends PType
  case object PString extends PType
  case object PBytes extends PType
  /** Proto enum: number→symbol map plus the descriptor's enum NAME, carried
    * through the Spark schema as column metadata so the Avro sink can emit a
    * named `enum` schema with the symbol list (reference
    * ProtoMessageToAvroMappings.scala:230-233) instead of a plain string.
    */
  final case class PEnum(symbols: Map[Int, String], name: String = "Enum") extends PType
  /** Proto `map<k,v>`: wire-encoded as a repeated nested entry message
    * (field 1 = key, field 2 = value) → Spark `MapType`; duplicate keys keep
    * the LAST entry, missing key/value take their proto3 zero defaults, an
    * absent map decodes to {} — proto3 map semantics. (The reference throws
    * on map fields, ProtoMessageToAvroMappings.scala:234-237; this is the
    * declared superset.)
    */
  final case class PMap(key: PType, value: PType) extends PType
  final case class PNested(msg: PMessage) extends PType
  /** Lazy nested reference — the cycle-bearing edge of a RECURSIVE proto
    * schema (the reference supports these via a `seen` node cache,
    * ProtoMessageToAvroMappings.scala:164-174). Spark types cannot be
    * recursive, so [[unroll]] must be applied before use.
    */
  final class PNestedRec(msg0: => PMessage) extends PType {
    lazy val msg: PMessage = msg0
  }
  object PNestedRec {
    def apply(msg: => PMessage): PNestedRec = new PNestedRec(msg)
  }

  final case class PField(number: Int, name: String, ptype: PType,
      repeated: Boolean = false)
  final case class PMessage(name: String, fields: Seq[PField])

  /** Unroll a (possibly recursive) message to a finite descriptor: lazy
    * recursive references expand `maxDepth` levels; beyond that the field
    * is DROPPED from the descriptor, so deeper wire bytes are skipped as
    * unknown fields — the same truncation contract as spark-protobuf's
    * `recursive.fields.max.depth` (SURVEY §7.4, the one semantic-fidelity
    * gap vs the reference's unbounded `seen`-cache recursion).
    */
  def unroll(msg: PMessage, maxDepth: Int): PMessage = {
    require(maxDepth >= 1, "maxDepth must be >= 1")
    def go(m: PMessage, depth: Int): PMessage =
      PMessage(m.name, m.fields.flatMap { f =>
        f.ptype match {
          case PNested(sub) => Some(f.copy(ptype = PNested(go(sub, depth))))
          case r: PNestedRec =>
            if (depth >= maxDepth) None // drop: deeper bytes skip as unknown
            else Some(f.copy(ptype = PNested(go(r.msg, depth + 1))))
          case PMap(k, PNested(sub)) => Some(f.copy(ptype = PMap(k, PNested(go(sub, depth)))))
          case PMap(k, r: PNestedRec) =>
            if (depth >= maxDepth) None
            else Some(f.copy(ptype = PMap(k, PNested(go(r.msg, depth + 1)))))
          case _ => Some(f)
        }
      })
    go(msg, 1)
  }

  private def baseTypeOf(t: PType, owner: String, fname: String): DataType = t match {
    case PInt32 | PSInt32 | PFixed32 => IntegerType
    case PInt64 | PSInt64 | PFixed64 => LongType
    case PFloat                      => FloatType
    case PDouble                     => DoubleType
    case PBool                       => BooleanType
    case PString                     => StringType
    case PBytes                      => BinaryType
    case PEnum(_, _)                 => StringType
    case PNested(m)                  => structTypeOf(m)
    case PMap(k, v) =>
      MapType(baseTypeOf(k, owner, fname), baseTypeOf(v, owner, fname),
        valueContainsNull = v match {
          case PString | PBytes | PNested(_) => true
          case _                             => false
        })
    case _: PNestedRec => throw new IllegalArgumentException(
      s"recursive reference in $owner.$fname: apply ProtoIngest.unroll(msg, maxDepth) first")
  }

  /** Spark schema for a message, by the reference's rules. Enum fields carry
    * [[AvroSchemas.EnumNameKey]]/[[AvroSchemas.EnumSymbolsKey]] metadata
    * (symbols in descriptor number order), which the Avro sink turns back
    * into a named `enum` schema.
    */
  def structTypeOf(msg: PMessage): StructType = StructType(msg.fields.map { f =>
    val base = baseTypeOf(f.ptype, msg.name, f.name)
    val (dt, nullable) =
      if (f.repeated) (ArrayType(base, containsNull = false), false)
      else base match {
        case _: MapType => (base, false) // absent map → {}
        case StringType | BinaryType | _: StructType => (base, true)
        case _ => (base, false) // proto3 zero-default scalars
      }
    val metadata = f.ptype match {
      case PEnum(symbols, name) =>
        AvroSchemas.enumMetadata(name, symbols.toSeq.sortBy(_._1).map(_._2))
      case PNested(m) => AvroSchemas.recordMetadata(m.name)
      case _ => Metadata.empty
    }
    StructField(f.name, dt, nullable, metadata)
  })

  // ---------------------------------------------------------------- decode
  private final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var out = 0L
      while (shift < 64) {
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      throw new IllegalArgumentException("varint longer than 64 bits")
    }
    def fixed32(): Int = {
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def fixed64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def bytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val n = varint().toInt; pos += n // read len BEFORE adding
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private def zigzag(n: Long): Long = (n >>> 1) ^ -(n & 1)

  private def scalarOf(t: PType, r: Reader): Any = t match {
    case PInt32     => r.varint().toInt
    case PInt64     => r.varint()
    case PSInt32    => zigzag(r.varint()).toInt
    case PSInt64    => zigzag(r.varint())
    case PFixed32   => r.fixed32()
    case PFixed64   => r.fixed64()
    case PFloat     => java.lang.Float.intBitsToFloat(r.fixed32())
    case PDouble    => java.lang.Double.longBitsToDouble(r.fixed64())
    case PBool      => r.varint() != 0L
    case PString    => new String(r.bytes(r.varint().toInt), "UTF-8")
    case PBytes     => r.bytes(r.varint().toInt)
    case PEnum(sym, _) => val v = r.varint().toInt; sym.getOrElse(v, s"UNKNOWN_$v")
    case PNested(m) =>
      val n = r.varint().toInt
      val sub = new Reader(r.buf, r.pos, r.pos + n)
      r.pos += n
      decodeMessage(sub, m)
    case PMap(kt, vt) =>
      // one wire occurrence = one entry message: field 1 key, field 2 value;
      // missing key/value take their proto3 zero defaults (string → "")
      val n = r.varint().toInt
      val stop = r.pos + n
      var k: Any = mapEntryDefault(kt)
      var v: Any = mapEntryDefault(vt)
      while (r.pos < stop) {
        val tag = r.varint()
        val num = (tag >>> 3).toInt
        if (num == 1) k = scalarOf(kt, r)
        else if (num == 2) v = scalarOf(vt, r)
        else r.skip((tag & 7).toInt)
      }
      (k, v)
    case _: PNestedRec => throw new IllegalArgumentException(
      "recursive reference: apply ProtoIngest.unroll(msg, maxDepth) first")
  }

  /** Proto3 zero default INSIDE a map entry — unlike top-level fields, a
    * missing string key/value is the empty string (map keys cannot be null
    * in Spark's MapType), and a missing nested value is null.
    */
  private def mapEntryDefault(t: PType): Any = t match {
    case PString        => ""
    case PBytes         => Array.emptyByteArray
    case PNested(_)     => null
    case other          => defaultOf(other)
  }

  // per-message plan-time artifacts, built once and reused across rows
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[PMessage, (Map[Int, Int], StructType)]()
  private def metaOf(msg: PMessage): (Map[Int, Int], StructType) =
    metaCache.computeIfAbsent(msg, m =>
      (m.fields.iterator.zipWithIndex.map { case (f, i) => f.number -> i }.toMap,
        structTypeOf(m)))

  private def decodeMessage(r: Reader, msg: PMessage): Row = {
    val (index, schema) = metaOf(msg)
    val values = new Array[Any](msg.fields.length)
    val repeats = new Array[scala.collection.mutable.ArrayBuffer[Any]](msg.fields.length)

    while (r.hasMore) {
      val tag = r.varint()
      val number = (tag >>> 3).toInt
      val wireType = (tag & 7).toInt
      index.get(number) match {
        case None => r.skip(wireType)
        case Some(i) =>
          val f = msg.fields(i)
          val lenDelimited = f.ptype match {
            case PString | PBytes | _: PNested | _: PMap => true
            case _ => false
          }
          if (f.repeated || f.ptype.isInstanceOf[PMap]) {
            // maps ride the repeated machinery: each occurrence is one entry
            if (repeats(i) == null)
              repeats(i) = scala.collection.mutable.ArrayBuffer.empty[Any]
            if (wireType == 2 && !lenDelimited) {
              // packed numeric repeat: elements until the length runs out
              val len = r.varint().toInt
              val stop = r.pos + len
              while (r.pos < stop) repeats(i) += scalarOf(f.ptype, r)
            } else repeats(i) += scalarOf(f.ptype, r)
          } else values(i) = scalarOf(f.ptype, r) // last one wins (proto3)
      }
    }

    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      msg.fields.zipWithIndex.map { case (f, i) =>
        if (f.ptype.isInstanceOf[PMap]) {
          // last entry wins on duplicate keys (proto3); absent map → {}
          if (repeats(i) == null) Map.empty
          else repeats(i).iterator.map(_.asInstanceOf[(Any, Any)]).toMap
        }
        else if (f.repeated) { if (repeats(i) == null) Seq.empty else repeats(i).toSeq }
        else values(i) match {
          case null => defaultOf(f.ptype) // unset
          case ""   => null               // set-but-empty string → null (:210)
          case v    => v
        }
      }.toArray[Any], schema)
  }

  /** Proto3 zero defaults per ProtoMessageToAvroMappings.scala:70-83. */
  private def defaultOf(t: PType): Any = t match {
    case PInt32 | PSInt32 | PFixed32 => 0
    case PInt64 | PSInt64 | PFixed64 => 0L
    case PFloat                      => 0f
    case PDouble                     => 0d
    case PBool                       => false
    case PString | PBytes            => null
    case PEnum(sym, _)               => sym.getOrElse(0, null)
    case _: PMap                     => Map.empty // absent map → {}
    case PNested(_)                  => null // missing submessage → null (:314-318)
    case _: PNestedRec => throw new IllegalArgumentException(
      "recursive reference: apply ProtoIngest.unroll(msg, maxDepth) first")
  }

  /** Decode one serialized message. */
  def decodeBytes(bytes: Array[Byte], msg: PMessage): Row =
    decodeMessage(new Reader(bytes, 0, bytes.length), msg)

  /** Decode `binCol` of `df` into the message's full column set —
    * `spark.read` + this = the reference's S1 scan for proto payloads.
    * The trailing `.to(schema)` re-applies the descriptor schema's field
    * METADATA (the row Encoder normalizes it away): enum columns keep their
    * `graft.enum.*` tags all the way to the Avro sink.
    */
  def decode(df: DataFrame, binCol: String, msg: PMessage): DataFrame = {
    val schema = structTypeOf(msg)
    df.select(col(binCol)).mapPartitions { it =>
      it.map(r => decodeBytes(r.getAs[Array[Byte]](0), msg))
    }(Encoders.row(schema)).to(schema)
  }

  /** The reference's S2 replay-cache format, byte-exact (Main.scala:67-120):
    * a text file whose FIRST line is base64(query text) and every following
    * line one base64-encoded serialized message. Returns the decoded rows;
    * pass `expectedQuery` to reproduce the reference's cache-validity check
    * (replay only when the cached query matches — IllegalStateException
    * otherwise, mirroring its refetch-on-mismatch).
    */
  def readBase64Lines(spark: org.apache.spark.sql.SparkSession, path: String,
      msg: PMessage, expectedQuery: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions.unbase64
    val raw = spark.sparkContext.textFile(path)
    expectedQuery.foreach { q =>
      val cached = raw.take(1).headOption.map(h =>
        new String(java.util.Base64.getDecoder.decode(h), "UTF-8"))
      if (!cached.contains(q))
        throw new IllegalStateException(
          s"cache holds a different query (${cached.getOrElse("<empty>")}); refetch required")
    }
    // zipWithIndex preserves text-file line order → index 0 is the header
    val body = raw.zipWithIndex().collect { case (line, i) if i > 0 => line }
    import spark.implicits._
    decode(body.toDF("value").select(unbase64(col("value")).as("payload")),
      "payload", msg)
  }
}
