package graft.io

import org.apache.spark.sql.types._

/** Fail-fast schema guards for the testdata tables whose queries bake in
  * PHYSICAL assumptions — the [[EventTime]] treatment generalized: the
  * events.ts unit silently changed across testdata regenerations once
  * (round 8) and cost a round of red streaming queries; these asserts make
  * the next silent regeneration of `documents`/`embeddings` fail at scan
  * time with the regeneration named, instead of red-herring a round
  * through wrong hashes or a deep kernel error.
  *
  * What the engine assumes:
  *  - `documents.doc_id` BIGINT — portable-hash sampling/splits
  *    (dq58/dq68/dq101) hash the raw int64;
  *  - `documents.text` STRING and `n_chars` integral — every text
  *    operator and the dq76 percentile band;
  *  - `embeddings.embedding` ARRAY<FLOAT> — the ANN/IVF/SQ8 kernels
  *    ([[graft.ext.Ann]], [[graft.ext.IvfIndex]],
  *    [[graft.ext.QuantizedAnn]]) compute in float32; a regeneration to
  *    float64 would change every dot product's rounding and silently
  *    shift ranking hashes;
  *  - `embeddings.vec_id` BIGINT, `label` integral (dq99 kNN classes).
  */
object SchemaGuard {

  /** Assert `schema` carries the physical shapes `table`'s consumers
    * assume; no-op for tables without baked-in assumptions. */
  def check(table: String, schema: StructType): Unit = {
    def req(colName: String, ok: DataType => Boolean, want: String): Unit = {
      val idx = schema.fieldNames.indexOf(colName)
      if (idx < 0)
        fail(table, colName, "MISSING", want)
      else if (!ok(schema.fields(idx).dataType))
        fail(table, colName, schema.fields(idx).dataType.simpleString, want)
    }
    def integral(dt: DataType) = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    table match {
      case "documents" =>
        req("doc_id", _ == LongType, "bigint")
        req("text", _ == StringType, "string")
        req("source", _ == StringType, "string")
        req("n_chars", integral, "integral")
      case "embeddings" =>
        req("vec_id", _ == LongType, "bigint")
        req("embedding", {
          case ArrayType(FloatType, _) => true
          case _ => false
        }, "array<float>")
        req("label", integral, "integral")
      case _ => () // events.ts is handled (and unit-adapted) by EventTime
    }
  }

  private def fail(table: String, colName: String, got: String,
      want: String): Nothing =
    throw new IllegalArgumentException(
      s"testdata regeneration changed $table.$colName to $got " +
        s"(the engine assumes $want): the queries bake this physical " +
        "shape in (see SchemaGuard's scaladoc for which kernels) — " +
        "regenerate the table in the expected shape, or extend " +
        "SchemaGuard/the consumers together, the EventTime way")
}
