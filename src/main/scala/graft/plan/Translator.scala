package graft.plan

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.StructType

/** The public facade — the Spark-native analogue of
  * `ProtoToAvroTranslator.apply` (ProtoToAvroTranslator.scala:62-74):
  * (paths, user-defined mappings, ordering) → a single declarative projection.
  *
  * Where the reference builds a translation tree and interprets it per row on
  * one thread, this compiles the same tree into a Catalyst select list once at
  * plan time; Tungsten whole-stage codegen then executes it across all
  * executor cores, and the optimizer pushes nested-column pruning into the
  * scan. The "schema built eagerly at construction" contract is preserved via
  * [[columns]] / [[PathProjection.projectedSchema]] — all validation errors
  * surface before any row flows.
  *
  * @param fields              dot-separated paths to keep (P1); a path ending
  *                            at a struct keeps the whole subtree (P2)
  * @param userDefinedMappings extra top-level columns, prepended exactly like
  *                            the reference (`userDefinedMappings ++ messageFieldMappers`)
  * @param ordering            top-level column ordering (O1); nested structs
  *                            are always lexicographic (O2)
  * @param protoSemantics      apply proto3 null/default coercions (P8)
  */
final case class Translator(
    fields: List[String],
    userDefinedMappings: List[(String, MappingNode)] = Nil,
    ordering: Ordering[String] = FieldOrdering.Lexicographic,
    protoSemantics: Boolean = true
) {

  /** Compile the full ordered select list against an input schema. */
  def columns(schema: StructType): List[(String, Column)] = {
    val base = PathProjection.project(schema, fields, protoSemantics)
    val udm  = userDefinedMappings.map { case (n, m) => n -> m.toColumn(schema) }
    (udm ++ base).sortBy(_._1)(ordering)
  }

  /** Apply the projection. One narrow, codegen'd select — no shuffle.
    * User-defined mappings that carry column metadata (e.g. a flattened
    * enum leaf's `graft.enum.*` tags) get it re-attached at the output
    * alias, since a rename does not inherit inner-alias metadata.
    */
  def apply(df: DataFrame): DataFrame = {
    val schema = df.schema
    // UDM metadata (e.g. a flattened enum leaf's tags) plus the projected
    // base columns' own top-level metadata
    val meta = PathProjection.projectedSchema(schema, fields).fields
      .map(f => f.name -> f.metadata).toMap ++
      userDefinedMappings.map { case (n, m) => n -> m.metadata(schema) }
    val cols = columns(schema)
    df.select(cols.map { case (n, c) =>
      meta.get(n).filterNot(_ == org.apache.spark.sql.types.Metadata.empty)
        .fold(c.as(n))(md => c.as(n, md))
    }: _*)
  }
}
