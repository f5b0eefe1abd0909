package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** MinHash signature: for each of `k` hash functions, the minimum of
  * splitmix64(shingleHash, seed=i) over the input array<long> of shingle
  * hashes. One codegen'd double loop, zero per-element allocation — the
  * k permutation minima for a document cost k·n integer mixes.
  *
  * A higher-order `transform(sequence(0,k-1), i -> array_min(transform(...)))`
  * formulation is interpreted per element and allocates k intermediate
  * arrays per row (~40x slower measured); an explode+groupBy(k mins)
  * formulation shuffles every (doc, shingle) row. This keeps signature
  * computation strictly map-side AND tight.
  */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // splitmix64 finalizer over (value + odd-constant·(seed+1)) — a strong,
  // cheap, dependency-free mix; identical constants in eval and codegen.
  @inline private def mix(v: Long, seed: Int): Long = {
    var h = v + 0x9E3779B97F4A7C15L * (seed + 1)
    h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L
    h ^= h >>> 27; h *= 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      var mn = Long.MaxValue
      var e = 0
      while (e < n) {
        val h = mix(arr.getLong(e), i)
        if (h < mn) mn = h
        e += 1
      }
      out(i) = mn
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val e = ctx.freshName("e")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val h = ctx.freshName("h"); val mn = ctx.freshName("mn")
      s"""
         |final int $n = $a.numElements();
         |final long[] $out = new long[$k];
         |for (int $i = 0; $i < $k; $i++) {
         |  long $mn = Long.MAX_VALUE;
         |  for (int $e = 0; $e < $n; $e++) {
         |    long $h = $a.getLong($e) + 0x9E3779B97F4A7C15L * ($i + 1);
         |    $h ^= $h >>> 30; $h *= 0xBF58476D1CE4E5B9L;
         |    $h ^= $h >>> 27; $h *= 0x94D049BB133111EBL;
         |    $h ^= $h >>> 31;
         |    if ($h < $mn) $mn = $h;
         |  }
         |  $out[$i] = $mn;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}
