package graft.io

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types._

/** Catalyst `StructType` → Avro `Schema`, following the reference's schema
  * derivation rules (ProtoMessageToAvroMappings.scala:221-269):
  *  - nullable field → union `[null, T]` (null first, default null, :241,:266)
  *  - non-nullable scalar → bare type with its zero default (:70-83)
  *  - struct → record, array → array, nested records named by field path
  *  - enum fidelity: a string column tagged with [[EnumNameKey]] /
  *    [[EnumSymbolsKey]] metadata (as `ProtoIngest.structTypeOf` emits for
  *    proto enum fields) becomes a NAMED Avro `enum` with the descriptor's
  *    symbol list (:230-233) — the schema a typed downstream Avro consumer
  *    expects; untagged strings stay Avro strings
  */
object AvroSchemas {

  /** Column-metadata key: the proto enum type's name. */
  val EnumNameKey = "graft.enum.name"
  /** Column-metadata key: enum symbols in descriptor number order. */
  val EnumSymbolsKey = "graft.enum.symbols"
  /** Column-metadata key: the proto MESSAGE type's name for a struct
    * column — the written Avro record then keeps the proto type name
    * instead of a path-derived one, and nests its namespace under the
    * enclosing record (the avro-protobuf `ProtobufData` naming convention
    * the reference delegates to, ProtoMessageToAvroMappings.scala:51-53).
    */
  val RecordNameKey = "graft.record.name"

  /** Metadata naming a struct column's Avro record after its proto message
    * type.
    */
  def recordMetadata(messageName: String): Metadata =
    new MetadataBuilder().putString(RecordNameKey, messageName).build()

  /** Metadata marking a string column as a named enum. */
  def enumMetadata(name: String, symbols: Seq[String]): Metadata =
    new MetadataBuilder()
      .putString(EnumNameKey, name)
      .putStringArray(EnumSymbolsKey, symbols.toArray)
      .build()

  /** Tag a string column as a named enum so the Avro sink writes
    * `enum(name, symbols)` instead of `string` for it.
    */
  def markEnum(df: DataFrame, colName: String, enumName: String,
      symbols: Seq[String]): DataFrame =
    df.withColumn(colName,
      df(colName).as(colName, enumMetadata(enumName, symbols)))

  def toAvro(schema: StructType, recordName: String, namespace: String = "graft"): Schema =
    record(schema, recordName, namespace)

  private def record(st: StructType, name: String, ns: String): Schema = {
    // nested named types live under the enclosing record's namespace
    // (ProtobufData convention: package.Outer for types nested in Outer)
    val childNs = s"$ns.$name"
    val fields = st.fields.map { f =>
      val base = fieldType(f.dataType, s"${name}_${f.name}", childNs, f.metadata)
      if (f.nullable) {
        val union = Schema.createUnion(List(Schema.create(Schema.Type.NULL), base).asJava)
        new Schema.Field(f.name, union, null, Schema.Field.NULL_DEFAULT_VALUE)
      } else new Schema.Field(f.name, base, null, defaultFor(f.dataType).orNull)
    }
    val rec = Schema.createRecord(name, null, ns, false)
    rec.setFields(fields.toList.asJava)
    rec
  }

  private def enumOf(md: Metadata, ns: String): Schema =
    Schema.createEnum(md.getString(EnumNameKey), null, ns,
      md.getStringArray(EnumSymbolsKey).toList.asJava)

  private def fieldType(dt: DataType, name: String, ns: String,
      md: Metadata = Metadata.empty): Schema = dt match {
    case BooleanType         => Schema.create(Schema.Type.BOOLEAN)
    case FloatType           => Schema.create(Schema.Type.FLOAT)
    case DoubleType          => Schema.create(Schema.Type.DOUBLE)
    case StringType if md.contains(EnumNameKey) => enumOf(md, ns)
    case StringType          => Schema.create(Schema.Type.STRING)
    case BinaryType          => Schema.create(Schema.Type.BYTES)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType            => Schema.create(Schema.Type.LONG)
    case DateType            => Schema.create(Schema.Type.STRING) // ISO string, GAQL-style
    case TimestampType       => Schema.create(Schema.Type.STRING)
    case d: DecimalType      => Schema.create(Schema.Type.STRING)
    case st: StructType      =>
      val recName =
        if (md.contains(RecordNameKey)) md.getString(RecordNameKey) else name
      record(st, recName, ns)
    case ArrayType(e, containsNull) =>
      val el = fieldType(e, name, ns, md) // repeated enum → array(enum) (:231,:244)
      Schema.createArray(
        if (containsNull) Schema.createUnion(List(Schema.create(Schema.Type.NULL), el).asJava)
        else el)
    case MapType(StringType, v, valueContainsNull) =>
      val vs = fieldType(v, name, ns)
      Schema.createMap(
        if (valueContainsNull) Schema.createUnion(List(Schema.create(Schema.Type.NULL), vs).asJava)
        else vs)
    case other =>
      // reference behavior for unsupported types: throw at plan time (:234-237)
      throw new IllegalStateException(s"Unsupported type for Avro sink: $other")
  }

  /** Proto3 zero defaults, as Avro JSON default values (reference :70-83). */
  private def defaultFor(dt: DataType): Option[AnyRef] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some(java.lang.Integer.valueOf(0))
    case FloatType | DoubleType                        => Some(java.lang.Double.valueOf(0d))
    case BooleanType                                   => Some(java.lang.Boolean.FALSE)
    case _: ArrayType                                  => Some(new java.util.ArrayList[AnyRef]())
    case _                                             => None
  }
}
