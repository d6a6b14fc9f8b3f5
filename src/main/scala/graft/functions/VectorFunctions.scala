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

  private def d(c: Column): Column = c.cast("array<double>")

  /** Σ aᵢ·bᵢ — left-to-right fold in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0d), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(d(a), lit(0d), (acc, x) => acc + x * x))

  /** cos(a,b) = a·b / (‖a‖‖b‖); null-safe on zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0d, lit(null).cast(DoubleType)).otherwise(dot(a, b) / denom)
  }

  /** Squared euclidean distance. */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)), lit(0d), (acc, x) => acc + x)
}
