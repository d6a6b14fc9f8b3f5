package graft.plan

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** User-defined mapping algebra — the rebuild of the reference's
  * `UserDefinedMappings` (UserDefinedMappings.scala:27-155): constant columns,
  * scalar extraction (flattening a nested leaf to the top level), and custom
  * struct construction, all composable and all compiled to plain Catalyst
  * `Column` expressions (codegen'd, no per-row interpretation).
  */
sealed trait MappingNode {
  /** Compile against the input row schema. Validation happens here, at plan
    * time, mirroring the reference's construction-time checks.
    */
  def toColumn(schema: StructType): Column

  /** Column metadata the Translator attaches at the OUTPUT alias (an outer
    * rename does not inherit an inner alias's metadata in the Column-node
    * model, so it must travel out of band). Default: none.
    */
  def metadata(schema: StructType): Metadata = Metadata.empty
}

object MappingNode {

  /** A constant column with a user-supplied type
    * (reference Constant, UserDefinedMappings.scala:40-44).
    */
  final case class Constant(dataType: DataType, value: Any) extends MappingNode {
    override def toColumn(schema: StructType): Column = lit(value).cast(dataType)
  }

  /** Lift a nested (non-repeated-path) leaf to the top level
    * (reference Scalar, UserDefinedMappings.scala:46-107). Validation mirrors
    * `validateFieldPath` (:64-79): continuous path, scalar terminal, no
    * repeated segment.
    */
  final case class Scalar(path: String) extends MappingNode {

    /** Walk the path; returns the leaf's (type, metadata). All the
      * reference's validation errors (continuity, no repeated segment,
      * scalar terminal) surface here.
      */
    private def leafOf(schema: StructType): (DataType, Metadata) = {
      val segments = path.split('.').toList
      if (segments.isEmpty || path.isEmpty)
        throw new IllegalArgumentException("Expected a non empty list of fields")
      val (leafType, leafMeta) =
        segments.foldLeft[(DataType, Metadata)]((schema, Metadata.empty)) {
          case ((st: StructType, _), seg) =>
            val f = st.fields.find(_.name == seg).getOrElse(
              throw new IllegalArgumentException(
                s"The path must be continuous path from child to parent (no field '$seg' in '$path')"))
            f.dataType match {
              case ArrayType(_, _) =>
                throw new IllegalArgumentException("None of the field elements may be repeated")
              case dt => (dt, f.metadata)
            }
          case (_, seg) =>
            throw new IllegalArgumentException(
              s"The path must be continuous path from child to parent ('$seg' in '$path' descends into a scalar)")
        }
      leafType match {
        case _: StructType =>
          throw new IllegalArgumentException("The last element's type must be a scalar value")
        case dt => (dt, leafMeta)
      }
    }

    override def toColumn(schema: StructType): Column = {
      val (dt, _) = leafOf(schema)
      val segments = path.split('.').toList
      val c = segments.tail.foldLeft(col(s"`${segments.head}`"))(_.getField(_))
      Semantics.coerceScalar(c, dt)
    }

    /** Struct-field extraction drops column metadata — surface the leaf's
      * (e.g. the graft.enum.* tags) so flattened enum columns still write
      * as NAMED Avro enums.
      */
    override def metadata(schema: StructType): Metadata = leafOf(schema)._2
  }

  /** The open extension point (reference U1: `UserDefinedProtoToAvroNode`,
    * UserDefinedMappings.scala:20-33 — an "experimental API" trait users
    * implement for arbitrary computed columns). Here the user function gets
    * the input schema and returns any Catalyst `Column` — the full
    * `functions._` algebra, custom Expressions included — while still
    * composing with Message nesting, ordering, and plan-time validation.
    */
  final case class Custom(build: StructType => Column) extends MappingNode {
    override def toColumn(schema: StructType): Column = build(schema)
  }

  /** Build a new struct column from named child mappings, nested arbitrarily
    * (reference Message, UserDefinedMappings.scala:128-154). Child fields are
    * ordered lexicographically for determinism (the reference iterates an
    * unordered Map — we pin the order instead).
    */
  final case class Message(recordName: String, mappings: Seq[(String, MappingNode)])
      extends MappingNode {
    override def toColumn(schema: StructType): Column = {
      val kids = mappings.sortBy(_._1).map { case (n, m) => m.toColumn(schema).as(n) }
      struct(kids: _*)
    }
  }
}
