package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{TextFns, VectorFns}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.D — document deduplication for training-data pipelines.
  *
  * Scale notes (the whole point): every variant is map-side-linear followed
  * by ONE key shuffle — nothing materializes O(n²) pairs over the full
  * corpus. LSH/band buckets (d03), simhash chunks (d04) and lang blocks
  * (d05/d06) bound the pair space; candidate verification joins only touch
  * candidates.
  */
object Dedup {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private val K = 32      // minhash signature length
  private val BANDS = 16  // bands of r = K/BANDS = 2 rows each

  /** doc_id → K-element minhash signature array, computed entirely
    * map-side by the codegen'd MinHashSigExpr (one tight k×n loop per
    * row) — zero shuffle until the band join.
    */
  private def minhashSigs(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftShim
    docs.select(col("doc_id"), TextFns.shingleHashes(col("text"), 3).as("hs"))
      .select(col("doc_id"), GraftShim.column(
        graft.plans.MinHashSigExpr(GraftShim.expression(col("hs")), K)).as("sig"))
  }

  /** LSH candidate pairs: equal band-hash in ≥1 of BANDS bands. */
  private def lshCandidates(sigs: DataFrame): DataFrame = {
    val bandStructs = (0 until BANDS).map { j =>
      struct(lit(j).as("band"),
        xxhash64(element_at(col("sig"), 2 * j + 1),
          element_at(col("sig"), 2 * j + 2)).as("bh"))
    }
    // repartition on the join keys: the expensive shingle→minhash map
    // side lands below ONE Exchange, which ReuseExchange shares between
    // both self-join branches, and the join itself needs no extra shuffle.
    val bands = sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bd"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.bh").as("bh"))
      .repartition(col("band"), col("bh"))
    bands.alias("x")
      .join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---------------------------------------------------------------- d01
    // Exact dedup: hash-groupBy on content digest, keep lowest doc_id.
    // One shuffle; at 100 TB, group on the digest (never the raw text).
    "d01_dedup_exact" -> QueryDef(
      build = (s, d) =>
        t(s, d, "documents")
          .groupBy(md5(col("text").cast("binary")).as("content_hash"))
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dup_cnt"))
          .orderBy("keep_id"),
      oracle = Some("""
        SELECT md5(text) AS content_hash,
               min(doc_id) AS keep_id, count(*) AS dup_cnt
        FROM documents GROUP BY md5(text) ORDER BY keep_id""")),

    // ---------------------------------------------------------------- d02
    // Fingerprint dedup: token-set digest (order/whitespace-insensitive).
    "d02_dedup_fingerprint" -> QueryDef(
      build = (s, d) =>
        t(s, d, "documents")
          .groupBy(md5(concat_ws(" ",
              array_sort(array_distinct(TextFns.tokens(col("text")))))
              .cast("binary")).as("fingerprint"))
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dup_cnt"))
          .orderBy("keep_id"),
      oracle = Some("""
        SELECT md5(array_to_string(list_sort(list_distinct(
                 string_split_regex(lower(trim(text)), '\s+'))), ' '))
                 AS fingerprint,
               min(doc_id) AS keep_id, count(*) AS dup_cnt
        FROM documents
        GROUP BY 1 ORDER BY keep_id""")),

    // ---------------------------------------------------------------- d03
    // MinHash + LSH near-dup candidates. shingle→minhash is entirely
    // map-side (native expressions); the only shuffle is the (band,hash)
    // bucket join. Never O(n²).
    "d03_dedup_minhash_lsh" -> QueryDef(
      build = (s, d) =>
        lshCandidates(minhashSigs(t(s, d, "documents")))
          .orderBy("a_id", "b_id")),

    // ---------------------------------------------------------------- d04
    // SimHash near-dup: 64-bit signature from token hashes; pigeonhole
    // blocking on 4×16-bit chunks (hamming ≤ 3 ⇒ one chunk equal; the
    // chunks serve as candidate buckets, verified at true hamming ≤ 8).
    "d04_dedup_simhash" -> QueryDef(
      build = (s, d) => {
        import org.apache.spark.sql.GraftShim
        // one-pass native signature — no explode, no 64-column groupBy
        val sigs = t(s, d, "documents")
          .select(col("doc_id"), GraftShim.column(graft.plans.SimHashExpr(
            GraftShim.expression(TextFns.tokens(col("text"))))).as("sim"))
        val chunkStructs = (0 until 4).map(c =>
          struct(lit(c).as("chunk"),
            shiftright(col("sim"), c * 16).bitwiseAND(0xFFFFL).as("ch")))
        val chunks = sigs
          .select(col("doc_id"), col("sim"), explode(array(chunkStructs: _*)).as("cd"))
          .select(col("doc_id"), col("sim"), col("cd.chunk").as("chunk"),
            col("cd.ch").as("ch"))
          .repartition(col("chunk"), col("ch"))
        chunks.alias("x")
          .join(chunks.alias("y"),
            col("x.chunk") === col("y.chunk") && col("x.ch") === col("y.ch") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
            bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).cast("long")
              .as("hamming"))
          .distinct()
          .filter(col("hamming") <= 8)
          .orderBy("a_id", "b_id")
      }),

    // ---------------------------------------------------------------- d05
    // Exact n-gram Jaccard similarity join, blocked by lang. The verify
    // step of the dedup pipeline; SQL-expressible, so it carries the
    // oracle for the whole shingle pipeline.
    "d05_ngram_jaccard" -> QueryDef(
      build = (s, d) => {
        // Inverted-index set-similarity join (VernicaJoin-style): explode
        // hashed shingles, self-join on (lang, shingle-hash), and the
        // intersection size |A∩B| falls out of a count aggregation — no
        // per-pair set operations, and pairs sharing zero shingles (J=0)
        // never materialize. Union via |A|+|B|−|A∩B|. Identical output to
        // the naive all-pairs formulation (modulo 64-bit hash collisions).
        val sets = t(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            TextFns.shingleHashes(col("text"), 3).as("sh"))
          .withColumn("sz", size(col("sh")))
        // The inverted-index join shuffles only (doc_id, lang, h) — set
        // sizes rejoin from a broadcast AFTER the count aggregation, so
        // the wide shuffle rows carry no redundant payload.
        val inv = sets.select(col("doc_id"), col("lang"),
          explode(col("sh")).as("h"))
          .repartition(col("h"), col("lang"))
        val sizes = sets.select(col("doc_id"), col("sz"))
        inv.alias("x")
          .join(inv.alias("y"),
            col("x.h") === col("y.h") && col("x.lang") === col("y.lang") &&
              col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
          .agg(count(lit(1)).as("inter"))
          .join(sizes.withColumnRenamed("doc_id", "a_id")
            .withColumnRenamed("sz", "sza"), Seq("a_id"))
          .join(sizes.withColumnRenamed("doc_id", "b_id")
            .withColumnRenamed("sz", "szb"), Seq("b_id"))
          .select(col("a_id"), col("b_id"),
            (col("inter").cast("double") /
              (col("sza") + col("szb") - col("inter"))).as("raw_j"))
          .filter(col("raw_j") >= 0.5)
          .select(col("a_id"), col("b_id"), round(col("raw_j"), 4).as("jaccard"))
          .orderBy("a_id", "b_id")
      },
      oracle = Some("""
        WITH sh AS (
          SELECT doc_id, lang,
                 list_distinct(list_transform(
                   generate_series(1, len(string_split_regex(lower(trim(text)), '\s+')) - 2),
                   i -> string_split_regex(lower(trim(text)), '\s+')[i] || ' ' ||
                        string_split_regex(lower(trim(text)), '\s+')[i+1] || ' ' ||
                        string_split_regex(lower(trim(text)), '\s+')[i+2])) AS sh
          FROM documents),
        pairs AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.sh, b.sh))) AS raw_j
          FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id)
        SELECT a_id, b_id, round(raw_j, 4) AS jaccard
        FROM pairs WHERE raw_j >= 0.5 ORDER BY a_id, b_id""")),

    // ---------------------------------------------------------------- d06
    // Embedding-cosine near-dup pairs, blocked by label (cluster id) so
    // the pair space is per-cluster, not global.
    "d06_dedup_embedding" -> QueryDef(
      build = (s, d) => {
        // Norms are computed once per vector (not once per pair); only the
        // dot product runs in the pair loop.
        val e = t(s, d, "embeddings")
          .withColumn("nrm", VectorFns.norm(col("embedding")))
        e.alias("x")
          .join(e.alias("y"),
            col("x.label") === col("y.label") &&
              col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"),
            (VectorFns.dot(col("x.embedding"), col("y.embedding")) /
              (col("x.nrm") * col("y.nrm"))).as("raw_c"))
          .filter(col("raw_c") >= 0.3)
          .select(col("a_id"), col("b_id"), round(col("raw_c"), 4).as("cos"))
          .orderBy("a_id", "b_id")
      },
      oracle = Some("""
        WITH p AS (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                 list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]) AS raw_c
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id < b.vec_id)
        SELECT a_id, b_id, round(raw_c, 4) AS cos
        FROM p WHERE raw_c >= 0.3 ORDER BY a_id, b_id""")),

    // ---------------------------------------------------------------- d07
    // Rolling-hash winnowing fingerprints (Schleimer et al.): token-hash
    // stream → minimum of every w-window → distinct minima are the doc's
    // fingerprints. Map-side linear; docs sharing a fingerprint are dup
    // candidates. Rows-only (fingerprint values depend on the engine's
    // hash function, so no cross-engine oracle).
    "d07_winnow_fingerprint" -> QueryDef(
      build = (s, d) => {
        import org.apache.spark.sql.GraftShim
        // winnow over the ordered token-hash STREAM (dups kept — unlike
        // shingleHashes, which dedupes for set semantics)
        val fps = GraftShim.column(graft.plans.WinnowExpr(
          GraftShim.expression(GraftShim.column(graft.plans.NGramHashExpr(
            GraftShim.expression(TextFns.tokens(col("text"))), 1))), 8))
        t(s, d, "documents")
          .select(col("doc_id"), fps.as("fps"))
          .select(col("doc_id"),
            size(col("fps")).cast("long").as("n_fingerprints"),
            array_min(col("fps")).as("min_fp"))
          .orderBy("doc_id")
      })
  )
}
