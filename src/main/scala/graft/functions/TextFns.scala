package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization / shingling / hashing helpers shared by the dedup and
  * text-analysis operators. Builtins only (split/transform/xxhash64) so
  * everything is codegen'd and deterministic across runs and engines.
  */
object TextFns {

  /** Whitespace tokens of lowercased, trimmed text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** n-token shingles ("w1 w2 w3"). Caller guarantees size(toks) >= n. */
  def shingles(toks: Column, n: Int): Column =
    transform(sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))

  /** k independent 64-bit hash functions: xxhash64 with a distinct salt
    * column per index — the MinHash permutation family.
    */
  def saltedHash(c: Column, salt: Int): Column = xxhash64(c, lit(salt))

  /** Distinct hashed n-gram shingles of `text`, via the native
    * NGramHashExpr (no per-shingle string building).
    */
  def shingleHashes(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftShim
    array_distinct(GraftShim.column(
      graft.plans.NGramHashExpr(GraftShim.expression(tokens(text)), n)))
  }

  /** Common stopword list used by quality scoring / lang-id heuristics. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")
}
