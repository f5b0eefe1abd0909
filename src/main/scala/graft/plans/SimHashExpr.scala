package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash of a token array (multiset semantics), one pass per
  * row: hash each token's UTF8 bytes, accumulate per-bit +1/−1 votes,
  * emit the sign bits. Replaces an explode + 64-aggregate-column groupBy
  * — the whole signature becomes map-side, shuffle-free.
  *
  * Token hash = first 8 bytes of md5(token), big-endian. md5 is
  * deliberately chosen over xxhash64: every engine exposes it with the
  * identical digest, so the full signature (and thus the d04 pair set)
  * is expressible in the DuckDB oracle SQL —
  * `('0x' || substr(md5(t),1,16))::UBIGINT` yields this exact value.
  */
case class SimHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  // MessageDigest is stateful and not thread-safe: one instance per task
  // thread (digest() resets it between tokens). Per-token cost is the
  // md5 block transform plus two small copies (token bytes + 16-byte
  // digest) — measurably slower than the xxhash64 it replaced, the
  // price of an oracle-portable signature (d04 went rows-only → green).
  @transient private lazy val md5Local =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val votes = new Array[Int](64)
    val md = md5Local.get()
    var i = 0
    while (i < m) {
      val digest = md.digest(arr.getUTF8String(i).getBytes)
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (digest(j) & 0xFFL); j += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)

  override def prettyName: String = "simhash"
}
