package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions registration so the native expressions are also
  * callable from SQL (`SELECT graft_dot(a.embedding, b.embedding) ...`).
  * The DataFrame API path (VectorFns) wraps the expressions directly and
  * does not require registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            "graft_dot expects exactly 2 arguments: " +
              s"graft_dot(array<float|double>, array<float|double>); " +
              s"got ${children.length}")
        DotProductExpr(children(0), children(1))
      }))
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }
}
