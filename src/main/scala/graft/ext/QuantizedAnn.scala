package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Int8 scalar-quantized similarity search (EXT) — the standard memory/IO
  * scale path for embedding retrieval at 100 TB.
  *
  * A float32 embedding column is 4 bytes/dim; at 100 TB of corpus the scan
  * and every shuffle of it move those bytes. Quantizing each component to a
  * signed byte (scale 127) cuts scan + shuffle bytes 4× and turns the
  * scoring kernel into integer multiply-adds, at a recall cost that is
  * typically negligible for inner-product ranking (LSQ/SQ8 in the FAISS
  * taxonomy — public knowledge, e.g. Johnson et al., "Billion-scale
  * similarity search with GPUs", 2017).
  *
  * Everything here is exactly engine-reproducible — quantization uses
  * `floor(x·127 + 0.5)` (portable round-half-up; no engine-specific
  * `round`), scoring is integer arithmetic with a fixed left-to-right fold
  * — so unlike float cosine pipelines the whole query has a bit-exact
  * DuckDB oracle (dq60).
  *
  * Reference anchor: the reference engine has no vector surface at all
  * (README.md:1-40 — proto→Avro projection only); this module is part of
  * the EXT training-data-pipeline tier layered on the same session/source
  * machinery.
  */
object QuantizedAnn {

  /** `array<float>` → `array<long>` of int8-range values: clamp(round(x·s))
    * with portable round-half-up (`floor(x·s + 0.5)` — identical in Spark
    * and DuckDB, where `round`/`cast` half-rule semantics differ).
    */
  def quantize(embedding: Column, scale: Int = 127): Column =
    transform(embedding, x =>
      greatest(lit(-scale.toLong),
        least(lit(scale.toLong),
          floor(x.cast(DoubleType) * lit(scale.toDouble) + lit(0.5)))))

  /** Integer dot product over two `array<long>` columns — zip_with +
    * left-to-right aggregate, all Catalyst HOFs, zero UDFs. This is the
    * executable SPEC of the scoring kernel (HOFs run interpreted); the
    * fast paths are the codegen'd [[graft.functions.LongDot]] (array<long>)
    * and [[graft.functions.ByteDot]] (packed int8 binary), both
    * property-checked bit-identical to this formulation — including on
    * null elements, which contribute 0 here (the coalesce) exactly as the
    * codegen kernels' null-skip does.
    */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => coalesce(x * y, lit(0L))),
      lit(0L), (acc, v) => acc + v)

  /** `array<float>` → packed int8 `binary` (1 byte/element — 4× smaller
    * than float32 at rest, on the wire, and in broadcasts). Same
    * quantization rule as [[quantize]], bit-identical values.
    */
  def quantizePacked(embedding: Column, scale: Int = 127): Column =
    graft.functions.QuantizeToBytes(embedding, scale)

  /** Exact top-k by quantized inner product for every query id in ONE job:
    * pack-quantize once per ROW (O(N), 1 byte/dim), broadcast the (tiny,
    * 4×-smaller) query rows, score each candidate PAIR (O(N·Q)) with the
    * codegen'd [[graft.functions.ByteDot]] byte-array loop, and rank per
    * query with the bounded-heap [[graft.plans.TopKPerKeyExec]]. ([[graft.functions.QuantizedDot]] is the fused
    * zero-materialization variant for single-pass scoring where no
    * pre-quantized column exists.) Deterministic ties → lower vid wins.
    */
  def topK(df: DataFrame, idCol: String, embCol: String,
      queryIds: Seq[Long], k: Int, scale: Int = 127): DataFrame = {
    val e = df.select(col(idCol).as("vid"),
      quantizePacked(col(embCol), scale).as("qemb"))
    val q = e.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("qemb").as("qv"))
    val scored = e.join(broadcast(q), col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        graft.functions.ByteDot(col("qv"), col("qemb")).as("score"))
    CandidateTopK.rankedTopPerQuery(scored, "score", k)
  }
}
