package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector math over `array<float>` / `array<double>` embedding columns,
  * expressed with native higher-order functions (`zip_with` / `aggregate`) so
  * the whole computation stays inside Catalyst — no UDF, no serialization
  * boundary, broadcast-friendly.
  *
  * Arithmetic is performed in Double and folds strictly left-to-right, which
  * makes results deterministic and engine-portable (the DuckDB oracle uses the
  * same fold order).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ — codegen'd primitive loop ([[DotProduct]]), double accumulation
    * left to right (same fold order as the HOF formulation it replaced).
    */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(DotProduct(a, a))

  /** cos(a,b) = a·b / (‖a‖‖b‖); null-safe on zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0d, lit(null).cast(DoubleType)).otherwise(dot(a, b) / denom)
  }

  /** Squared euclidean distance: ‖a‖² + ‖b‖² − 2a·b, all codegen'd. */
  def l2DistanceSq(a: Column, b: Column): Column =
    DotProduct(a, a) + DotProduct(b, b) - lit(2d) * DotProduct(a, b)
}
