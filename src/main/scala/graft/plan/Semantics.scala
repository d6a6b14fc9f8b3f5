package graft.plan

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Proto3-style null/default value semantics, re-expressed as Catalyst column
  * wrappers baked into the projection at plan time (so they run inside
  * whole-stage codegen — zero interpretive overhead per row).
  *
  * Mirrors the reference engine's per-row interpretation:
  *  - set-but-empty string → null
  *    (reference: ProtoMessageToAvroMappings.scala:210)
  *  - unset numeric/bool scalar → proto3 zero-default, NOT null
  *    (reference: ProtoMessageToAvroMappings.scala:70-83 `getDefault`)
  *  - unset repeated field → empty array
  *    (reference: ProtoMessageToAvroMappings.scala:75)
  *  - missing submessage → null, never an empty struct
  *    (reference: ProtoMessageToAvroMappings.scala:314-318)
  *  - bytes / string / struct default → null
  */
object Semantics {

  /** Zero-default literal for a leaf type, if proto3 defines one. */
  def zeroDefault(dt: DataType): Option[Column] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some(lit(0L).cast(dt))
    case FloatType | DoubleType                        => Some(lit(0d).cast(dt))
    case _: DecimalType                                => Some(lit(0).cast(dt))
    case BooleanType                                   => Some(lit(false))
    case _                                             => None
  }

  /** Full leaf coercion: empty-string→null plus zero-default fill.
    * Types proto never carries (timestamp, date, map, binary) pass through
    * unchanged — the rebuild is a capability superset there.
    */
  def coerceLeaf(c: Column, dt: DataType): Column = dt match {
    case StringType =>
      // set-but-empty proto string is emitted as null (reference :210)
      when(length(c) === 0, lit(null).cast(StringType)).otherwise(c)
    case at: ArrayType =>
      // unset repeated → [] (reference getDefault :75); elements uncoerced,
      // matching the reference which returns the repeated list verbatim (:204-211)
      when(c.isNull, array().cast(at)).otherwise(c)
    case other =>
      zeroDefault(other).map(d => coalesce(c, d)).getOrElse(c)
  }

  /** Coercion used by Scalar (flattening) mappings. The reference's
    * `Scalar.getRowField` foldLefts raw `getField` calls
    * (UserDefinedMappings.scala:93-106): an unset numeric anywhere along the
    * path yields the proto zero-default, but NO empty-string coercion is
    * applied (it bypasses `ProtoToAvroLeaf.getRowField`).
    */
  def coerceScalar(c: Column, dt: DataType): Column =
    zeroDefault(dt).map(d => coalesce(c, d)).getOrElse(c)
}
