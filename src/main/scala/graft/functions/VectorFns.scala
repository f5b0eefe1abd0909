package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns. The inner product
  * is a native codegen'd Catalyst expression (graft.plans.DotProductExpr)
  * — a tight primitive loop inside WholeStageCodegen, no per-element
  * closures or boxing. All arithmetic is double-precision with sequential
  * accumulation, so results match a double-precision oracle exactly.
  */
object VectorFns {

  import org.apache.spark.sql.GraftShim
  import graft.plans.DotProductExpr

  /** Σ aᵢ·bᵢ in double precision, sequential loop (deterministic). */
  def dot(a: Column, b: Column): Column =
    GraftShim.column(DotProductExpr(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** Σ aᵢ² in double precision. */
  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity, computed as dot/(‖a‖·‖b‖) in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
