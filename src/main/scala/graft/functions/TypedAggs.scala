package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator demo — the Dataset-API extension point for custom
  * aggregation logic. Weighted average with an EXACT decimal buffer, so
  * the merge is associative and results are partition-order-independent
  * (same invariant AggFns.dsum gives the SQL path).
  */
object TypedAggs {

  /** input: (value, weight); buffer: exact (Σ round(v·w, 6), Σ round(w, 6));
    * output: double Σvw/Σw.
    */
  object WeightedAvg
      extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {

    private def dec(x: Double): JBigDecimal =
      new JBigDecimal(x).setScale(6, RoundingMode.HALF_UP)

    override def zero: (JBigDecimal, JBigDecimal) =
      (JBigDecimal.ZERO, JBigDecimal.ZERO)

    override def reduce(b: (JBigDecimal, JBigDecimal),
                        a: (Double, Double)): (JBigDecimal, JBigDecimal) =
      (b._1.add(dec(a._1 * a._2)), b._2.add(dec(a._2)))

    override def merge(x: (JBigDecimal, JBigDecimal),
                       y: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
      (x._1.add(y._1), x._2.add(y._2))

    override def finish(r: (JBigDecimal, JBigDecimal)): Double =
      if (r._2.signum() == 0) 0.0 else r._1.doubleValue() / r._2.doubleValue()

    override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)

    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
