package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent money sums. Parallel double summation is
  * order-dependent, so a round(sum(double), 2) can flip a half-cent
  * between engines (or between partition counts!). Fix: round each row to
  * 6 decimals (identical IEEE op on both engines), sum EXACTLY in
  * DECIMAL(30,6) (associative — order-free), round, cast back to double.
  * `sqlDsum` is the DuckDB twin — both engines then produce bit-identical
  * results at any parallelism.
  */
object AggFns {

  /** Exact decimal sum of a per-row-rounded expression (no final round). */
  def dsumRaw(e: Column): Column =
    sum(round(e, 6).cast(DecimalType(30, 6)))

  /** Order-independent `round(sum(e), scale)` as a double. */
  def dsum(e: Column, scale: Int = 2): Column =
    round(dsumRaw(e), scale).cast("double")

  def sqlDsumRaw(expr: String): String =
    s"sum(CAST(round($expr, 6) AS DECIMAL(30,6)))"

  def sqlDsum(expr: String, scale: Int = 2): String =
    s"CAST(round(${sqlDsumRaw(expr)}, $scale) AS DOUBLE)"
}
