package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token array (multiset semantics), one pass per
  * row: hash each token's UTF8 bytes, accumulate per-bit +1/−1 votes,
  * emit the sign bits. Replaces an explode + 64-aggregate-column groupBy
  * — the whole signature becomes map-side, shuffle-free, and codegen'd
  * (the token hash is a static helper call, so the vote loops inline
  * into whole-stage codegen).
  *
  * Token hash = first 8 bytes of md5(token), big-endian. md5 is
  * deliberately chosen over xxhash64: every engine exposes it with the
  * identical digest, so the full signature (and thus the d04 pair set)
  * is expressible in the DuckDB oracle SQL —
  * `('0x' || substr(md5(t),1,16))::UBIGINT` yields this exact value.
  * Per-token cost is the md5 block transform plus two small copies
  * (token bytes + 16-byte digest) — measurably slower than xxhash64,
  * the price of an oracle-portable signature.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

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
    var i = 0
    while (i < m) {
      val h = SimHashExpr.tokenHash(arr.getUTF8String(i))
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m"); val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      s"""
         |final int $m = $a.numElements();
         |final int[] $votes = new int[64];
         |for (int $i = 0; $i < $m; $i++) {
         |  final long $h =
         |    graft.plans.SimHashExpr.tokenHash($a.getUTF8String($i));
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)

  override def prettyName: String = "simhash"
}

object SimHashExpr {
  // MessageDigest is stateful and not thread-safe: one per task thread,
  // digest() resets it between tokens. Shared by eval and codegen paths.
  private val md5Local =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  /** First 8 bytes of md5(token), big-endian — the engine-portable
    * token hash (DuckDB: ('0x' || substr(md5(t),1,16))::UBIGINT).
    */
  def tokenHash(s: UTF8String): Long = {
    val digest = md5Local.get().digest(s.getBytes)
    var h = 0L
    var j = 0
    while (j < 8) { h = (h << 8) | (digest(j) & 0xFFL); j += 1 }
    h
  }
}
