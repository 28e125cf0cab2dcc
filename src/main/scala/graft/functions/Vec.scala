package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, expressed
  * with higher-order functions (`zip_with` + `aggregate`) so the whole
  * computation stays inside Catalyst/codegen — no UDF serialization, no
  * driver round-trips. Inputs are cast to double once; accumulation is
  * strict left-to-right, which both Spark and the DuckDB oracle honor.
  */
object Vec {

  private def d(a: Column): Column = a.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(d(a), lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity, rounded to 6dp for stable cross-engine compare.
    * Backed by the native CosineSim expression (one tight loop per pair
    * — the HOF formulation above is kept for the scalar building
    * blocks); accumulation order is identical, so results are bit-equal
    * to `round(dot/(norm*norm), 6)`. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    round(ColumnBridge.column(graft.functions.expressions.CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b))), 6)
  }

  /** Native dot product (one tight codegen loop, double accumulation,
    * strict left-to-right — CosineSim's loop minus the norms). */
  def dotNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** The norm CosineSim computes internally, as a per-ROW column:
    * `sqrt` of the self-dot, same accumulation order. Precompute this
    * once per side before a pairwise join and use [[cosinePrenormed]]
    * in the O(pairs) hot loop. */
  def normNative(a: Column): Column = sqrt(dotNative(a, a))

  /** Cosine from a per-pair dot and two PRECOMPUTED [[normNative]]
    * norms — bit-equal to [[cosine]] (identical accumulation order,
    * sqrt, multiply, divide, round) at a third of the per-pair
    * arithmetic: the norms are O(rows) instead of O(pairs). */
  def cosinePrenormed(a: Column, b: Column, normA: Column, normB: Column): Column =
    round(dotNative(a, b) / (normA * normB), 6)
}
