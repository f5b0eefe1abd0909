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

  /** Cosine similarity, computed as dot/(‖a‖·‖b‖) in double precision.
    * The denominator goes through nullif: an all-zero vector (padding,
    * failed encode) has norm 0, and under Spark 4's ANSI mode a plain
    * division would kill the whole job with DIVIDE_BY_ZERO — a zero
    * vector scores NULL against everything instead (drops out of
    * threshold filters, ranks last in top-k). DegenerateVecsSpec pins
    * this across the §2.E surface; sf data has no zero vectors, so
    * oracle-gated outputs are unchanged.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Deterministic seeded random hyperplanes for sign-LSH bucketing
    * (LCG — engine-independent, reproducible across runs and engines, so
    * LSH-bucketed results are stable and oracle-able where recall allows).
    */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    var state = 42L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Array.fill(nPlanes)(Array.fill(dim)(next()))
  }
}
