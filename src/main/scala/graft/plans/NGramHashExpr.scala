package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Hashed n-gram shingles of a token array, in one pass: each token is
  * xxhash64'd from its UTF8 bytes, consecutive n hashes combine with an
  * order-sensitive polynomial mix. No n-gram strings are ever built —
  * equal token sequences get equal hashes (what shingle-set operations
  * need), at ~20x less work than
  * transform(sequence, i -> xxhash64(concat_ws(slice(...)))), which
  * interprets a closure and allocates a string per shingle.
  *
  * Evaluated once per document row (CodegenFallback's virtual call is
  * noise at that granularity; the inner loop is tight Scala).
  */
case class NGramHashExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "n-gram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hash expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val tokH = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      tokH(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    var j = 0
    while (j <= m - n) {
      var h = tokH(j)
      var k = 1
      while (k < n) {
        // order-sensitive combine (FNV-style fold over 64-bit lanes)
        h = (h * 0x100000001B3L) ^ tokH(j + k)
        k += 1
      }
      // finalize so single-token grams aren't raw xxhash (avalanche tails)
      h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
      out(j) = h
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NGramHashExpr =
    copy(child = newChild)

  override def prettyName: String = "ngram_hash"
}
