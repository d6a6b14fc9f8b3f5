package graft.plan

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The core "QL": nested path projection. Given a row schema and a list of
  * dot-separated field paths, build the `Column` list that keeps exactly those
  * leaves while preserving the nesting of the source — the Spark-native
  * re-expression of the reference's translation tree
  * (ProtoMessageToAvroMappings.scala:115-145 `buildChildren`,
  * ProtoToAvroTranslator.scala:46-50 `buildFieldMappers`).
  *
  * Semantics preserved from the reference:
  *  - a path ending at a struct keeps the whole subtree (select-all expansion,
  *    :100-101,135)
  *  - unknown field → IllegalArgumentException("... has no field ...") (:126-128)
  *  - explicitly selected empty struct → error (:129-132)
  *  - non-selected empty structs silently skipped (:138)
  *  - children inside every struct ordered lexicographically by name (:281-284)
  *  - null/default leaf semantics via [[Semantics]] (toggleable)
  *
  * Everything here is plan-time: the output is a declarative select list that
  * Catalyst compiles into a single whole-stage-codegen'd projection, with
  * nested-column pruning pushed to the parquet scan.
  */
object PathProjection {

  /** Group dot-paths by head segment, preserving first-seen head order
    * (reference splitFields, ProtoMessageToAvroMappings.scala:87-92).
    */
  def splitFields(fields: List[String]): List[(String, List[String])] = {
    val split = fields.map(_.split('.').toList)
    val heads = split.map(_.head).distinct
    heads.map { h =>
      h -> split.filter(_.head == h).map(_.tail.mkString(".")).filterNot(_.isEmpty)
    }
  }

  private def isEmptyStruct(dt: DataType): Boolean = dt match {
    case st: StructType                => st.fields.isEmpty
    case ArrayType(st: StructType, _)  => st.fields.isEmpty
    case _                             => false
  }

  /** Projected output schema, derived eagerly at plan time — the analogue of
    * the reference building the full Avro schema at translator construction
    * (ProtoToAvroTranslator.scala:12-17).
    */
  def projectedSchema(schema: StructType, includedPaths: List[String]): StructType = {
    def fieldType(f: StructField, sub: List[String]): DataType = f.dataType match {
      case st: StructType              => StructType(selectFields(st, sub, f.name))
      case ArrayType(st: StructType, n) => ArrayType(StructType(selectFields(st, sub, f.name)), n)
      case other                       => other
    }
    def selectFields(st: StructType, paths: List[String], where: String): Seq[StructField] =
      resolve(st, paths, where).map { case (name, sub) =>
        val f = st(name)
        StructField(name, fieldType(f, sub), nullable = f.nullable, f.metadata)
      }
    StructType(resolve(schema, includedPaths, "root").map { case (name, sub) =>
      val f = schema(name)
      StructField(name, fieldType(f, sub), nullable = f.nullable, f.metadata)
    })
  }

  /** Validate + expand one struct level: explicit paths or select-all.
    * Children are returned lexicographically sorted (reference :281-284 sorts
    * record fields by name; the TOP level is re-sorted by the caller's
    * Ordering — see Translator).
    */
  private def resolve(
      schema: StructType,
      paths: List[String],
      structName: String
  ): List[(String, List[String])] = {
    val fields =
      if (paths.nonEmpty) {
        val destructured = splitFields(paths)
        destructured.foreach { case (fieldName, _) =>
          val f = schema.fields.find(_.name == fieldName).getOrElse(
            throw new IllegalArgumentException(s"$structName has no field: '$fieldName'"))
          if (isEmptyStruct(f.dataType))
            throw new IllegalArgumentException(
              s"$structName.$fieldName is explicitly asked for, but is an empty message")
        }
        destructured
      } else schema.fields.toList.map(f => f.name -> List.empty[String])
    fields
      .filterNot { case (n, _) => isEmptyStruct(schema(n).dataType) }
      .sortBy(_._1)
  }

  /** Build the projection columns for `includedPaths` against `schema`.
    * Returns (fieldName, column) pairs; the caller aliases and orders them.
    *
    * @param protoSemantics apply [[Semantics]] null/default coercions at leaves
    */
  def project(
      schema: StructType,
      includedPaths: List[String],
      protoSemantics: Boolean = true
  ): List[(String, Column)] =
    children(schema, includedPaths, name => col(s"`$name`"), "root", protoSemantics)

  private def children(
      schema: StructType,
      paths: List[String],
      get: String => Column,
      structName: String,
      sem: Boolean
  ): List[(String, Column)] =
    resolve(schema, paths, structName).map { case (name, sub) =>
      name -> node(schema(name), sub, get(name), s"$structName.$name", sem)
    }

  private def node(
      field: StructField,
      sub: List[String],
      c: Column,
      path: String,
      sem: Boolean
  ): Column = field.dataType match {
    case st: StructType =>
      val kids = children(st, sub, n => c.getField(n), path, sem)
      val built = struct(kids.map { case (n, cc) => aliased(cc, n, st) }: _*)
      // missing submessage → null, not an empty struct (reference :314-318)
      if (field.nullable) when(c.isNull, lit(null)).otherwise(built) else built
    case ArrayType(st: StructType, containsNull) =>
      val projected = transform(c, x => {
        val kids = children(st, sub, n => x.getField(n), path, sem)
        struct(kids.map { case (n, cc) => aliased(cc, n, st) }: _*)
      })
      if (sem) {
        // unset repeated message → [] (reference :311-313: getField on a
        // repeated field never returns null, it returns the empty list)
        val at = ArrayType(projectedSchema(st, sub), containsNull)
        when(c.isNull, array().cast(at)).otherwise(projected)
      } else projected
    case leafType =>
      if (sem) Semantics.coerceLeaf(c, leafType) else c
  }

  /** Alias a rebuilt struct child, carrying the source field's METADATA
    * (e.g. `graft.enum.*` tags) into the new struct's field — struct
    * reconstruction would otherwise silently drop it, and the Avro sink
    * reads enum-ness from exactly this metadata.
    */
  private def aliased(c: Column, name: String, parent: StructType): Column = {
    val md = parent(name).metadata
    if (md == Metadata.empty) c.as(name) else c.as(name, md)
  }
}
