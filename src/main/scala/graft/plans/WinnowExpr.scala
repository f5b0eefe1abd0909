package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Winnowing fingerprints (Schleimer et al., SIGMOD'03): the distinct
  * minima of every w-length window over a hash stream, in one pass —
  * the document-fingerprinting primitive for near-dup candidate search.
  */
case class WinnowExpr(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(w >= 1, "window must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val eff = math.min(w, m)
    val out = new scala.collection.mutable.LinkedHashSet[Long]()
    var j = 0
    while (j <= m - eff) {
      var mn = Long.MaxValue
      var k = 0
      while (k < eff) {
        val v = arr.getLong(j + k)
        if (v < mn) mn = v
        k += 1
      }
      out += mn
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)

  override def prettyName: String = "winnow"
}
