package graft.io

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.spark.sql.types._

/** Catalyst `StructType` → Avro `Schema`, following the reference's schema
  * derivation rules (ProtoMessageToAvroMappings.scala:221-269):
  *  - nullable field → union `[null, T]` (null first, default null, :241,:266)
  *  - non-nullable scalar → bare type with its zero default (:70-83)
  *  - struct → record, array → array, nested records named by field path
  *  - enum-as-string parity: Spark strings stay Avro strings (declared
  *    value-level parity, SURVEY §7 "Enum fidelity")
  */
object AvroSchemas {

  def toAvro(schema: StructType, recordName: String, namespace: String = "graft"): Schema =
    record(schema, recordName, namespace)

  private def record(st: StructType, name: String, ns: String): Schema = {
    val fields = st.fields.map { f =>
      val base = fieldType(f.dataType, s"${name}_${f.name}", ns)
      if (f.nullable) {
        val union = Schema.createUnion(List(Schema.create(Schema.Type.NULL), base).asJava)
        new Schema.Field(f.name, union, null, Schema.Field.NULL_DEFAULT_VALUE)
      } else new Schema.Field(f.name, base, null, defaultFor(f.dataType).orNull)
    }
    val rec = Schema.createRecord(name, null, ns, false)
    rec.setFields(fields.toList.asJava)
    rec
  }

  private def fieldType(dt: DataType, name: String, ns: String): Schema = dt match {
    case BooleanType         => Schema.create(Schema.Type.BOOLEAN)
    case FloatType           => Schema.create(Schema.Type.FLOAT)
    case DoubleType          => Schema.create(Schema.Type.DOUBLE)
    case StringType          => Schema.create(Schema.Type.STRING)
    case BinaryType          => Schema.create(Schema.Type.BYTES)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType            => Schema.create(Schema.Type.LONG)
    case DateType            => Schema.create(Schema.Type.STRING) // ISO string, GAQL-style
    case TimestampType       => Schema.create(Schema.Type.STRING)
    case d: DecimalType      => Schema.create(Schema.Type.STRING)
    case st: StructType      => record(st, name, ns)
    case ArrayType(e, containsNull) =>
      val el = fieldType(e, name, ns)
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
