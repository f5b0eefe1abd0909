package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from codegen'd
  * builtins (`zip_with`/`aggregate`/`transform`) — no UDFs, so the whole
  * similarity pipeline stays inside WholeStageCodegen. All arithmetic is
  * double-precision (floats are cast first) so results match a
  * double-precision oracle.
  */
object VectorFns {

  /** Σ aᵢ·bᵢ in double precision, sequential fold (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Σ aᵢ² in double precision. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity, computed as dot/(‖a‖·‖b‖) in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
