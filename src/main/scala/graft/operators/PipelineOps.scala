package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.I — training-data pipeline utilities over `documents`: reproducible
  * sampling, exact stratified sampling, corpus TF-IDF, sequence/chunk
  * packing, and PII-style redaction. Scale shapes: sampling predicates
  * are pure per-row hashes (zero shuffle), stratified sampling is a
  * two-pass exact scheme partitioned by (lang × hash-prefix bucket) so no
  * task ever sees a whole stratum, TF-IDF is a chain of hash aggregations
  * keyed by (doc,term)/term plus a broadcast of the corpus size, chunking
  * is a per-row transform.
  */
object PipelineOps {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  def defs: Seq[(String, QueryDef)] = coreDefs ++ dpDefs

  private val coreDefs: Seq[(String, QueryDef)] = Seq(

    // ---------------------------------------------------------------- x01
    // Reproducible corpus sampling: hash-mod on a stable key, the
    // standard way to take the SAME sample on every run/engine/scale —
    // a pure map-side predicate, no RNG state, no shuffle.
    "x01_hash_sample" -> QueryDef(
      build = (s, d) =>
        t(s, d, "documents")
          .filter(substring(md5(col("doc_id").cast("string").cast("binary")),
            1, 1) === "0")
          .select("doc_id", "lang", "source", "n_chars")
          .orderBy("doc_id"),
      oracle = Some("""
        SELECT doc_id, lang, source, n_chars
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
        ORDER BY doc_id""")),

    // ---------------------------------------------------------------- x02
    // Exact stratified sampling: keep the first ceil(20%) of each lang
    // stratum under a deterministic hash order. TWO-PASS EXACT scheme —
    // never a window partitioned by the bare bounded `lang` key (that
    // shape funnels the whole table through one task per stratum; at
    // 100 TB a single lang='en' task would sort tens of TB):
    //   pass 1: exact row counts per (lang, 256-way md5-prefix bucket) —
    //           one cheap hash aggregation, result is n_lang×256 rows;
    //   pass 2: rank locally inside each (lang, bucket) partition and add
    //           the exact offset of all lower buckets of the stratum.
    // Because the bucket IS the leading 2 hex chars of the md5 sort key,
    // the lexicographic hash order within a lang visits buckets in
    // numeric order, so offset(bucket) + local_rank == the global
    // per-stratum rank, exactly. Per-task work is O(rows/(langs·256))
    // with the bucket fan-out tunable by prefix width; the offsets/count
    // table is tiny and broadcast. Output is hash-identical to the
    // single-window formulation the oracle keeps.
    "x02_stratified_sample" -> QueryDef(
      build = (s, d) => {
        // shared two-pass scheme (TwoPassPrefix): rank = exclusive
        // prefix-count of 1s + 1, stratum size = part_total. NULL langs
        // form their own stratum (null-safe join inside the helper),
        // matching the oracle window's PARTITION BY semantics.
        val base = t(s, d, "documents").select(col("doc_id"), col("lang"))
        TwoPassPrefix.withPrefix(base, "lang", "doc_id", lit(1L))
          .withColumn("rk", col("pfx") + 1L)
          .filter(col("rk") <= ceil(col("part_total") * 0.2))
          .select("lang", "doc_id", "rk")
          .orderBy("lang", "rk")
      },
      oracle = Some("""
        SELECT lang, doc_id, rk FROM (
          SELECT lang, doc_id,
                 CAST(row_number() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
                   AS rk,
                 count(*) OVER (PARTITION BY lang) AS n_stratum
          FROM documents) z
        WHERE rk <= ceil(n_stratum * 0.2)
        ORDER BY lang, rk""")),

    // ---------------------------------------------------------------- x03
    // Corpus TF-IDF: tf = term count / doc length, idf = ln(N/df).
    // Two hash-aggregation shuffles ((doc,tok) then tok) plus a
    // broadcast of the corpus size — the canonical scalable shape.
    // Top-50 by score with unique tie-breaks.
    "x03_tfidf" -> QueryDef(
      build = (s, d) => {
        val docs = t(s, d, "documents")
        // r11: tokenize once into an array column (see t11) — the fused
        // select re-ran the regex split per exploded row.
        val toks = docs
          .select(col("doc_id"), TextFns.tokens(col("text")).as("tk"))
          .select(col("doc_id"), size(col("tk")).as("doc_len"),
            explode(col("tk")).as("tok"))
        val tf = toks.groupBy("doc_id", "tok", "doc_len")
          .agg(count(lit(1)).as("n"))
        val df = tf.groupBy("tok").agg(count(lit(1)).as("docfreq"))
        val total = docs.agg(count(lit(1)).as("n_docs"))
        tf.join(df, Seq("tok"))
          .crossJoin(broadcast(total))
          .select(col("doc_id"), col("tok"),
            round((col("n").cast("double") / col("doc_len")) *
              log(col("n_docs").cast("double") / col("docfreq")), 4)
              .as("tfidf"))
          .orderBy(desc("tfidf"), asc("doc_id"), asc("tok"))
          .limit(50)
      },
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id,
                 len(string_split_regex(lower(trim(text)), '\s+')) AS doc_len,
                 unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
          FROM documents),
        tf AS (
          SELECT doc_id, tok, doc_len, count(*) AS n
          FROM toks GROUP BY doc_id, tok, doc_len),
        df AS (SELECT tok, count(*) AS docfreq FROM tf GROUP BY tok),
        total AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, tok,
               round((CAST(n AS DOUBLE) / doc_len) *
                     ln(CAST(n_docs AS DOUBLE) / docfreq), 4) AS tfidf
        FROM tf JOIN df USING (tok) CROSS JOIN total
        ORDER BY tfidf DESC, doc_id, tok LIMIT 50""")),

    // ---------------------------------------------------------------- x05
    // Sequence packing: split each doc's token stream into fixed-size
    // chunks (64 tokens, stride 48 → 16-token overlap), the training-
    // data chunking primitive. Per-row transform, zero shuffle; chunk
    // content pinned via a digest.
    "x05_chunk_pack" -> QueryDef(
      build = (s, d) => {
        val toks = TextFns.tokens(col("text"))
        val n = size(toks)
        val nChunks = when(n <= 64, lit(1L))
          .otherwise(ceil((n - lit(64)).cast("double") / 48).cast("long") + 1)
        t(s, d, "documents")
          .select(col("doc_id"), toks.as("toks"), nChunks.as("n_chunks"))
          .select(col("doc_id"), col("n_chunks"),
            md5(concat_ws("|",
              transform(sequence(lit(0), col("n_chunks").cast("int") - 1),
                i => concat_ws(" ", slice(col("toks"), i * 48 + 1, lit(64)))))
              .cast("binary")).as("chunks_sig"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        SELECT doc_id, n_chunks,
               md5(array_to_string(list_transform(
                 generate_series(0, CAST(n_chunks - 1 AS INT)),
                 i -> array_to_string(list_slice(toks, i*48 + 1, i*48 + 64),
                                      ' ')), '|')) AS chunks_sig
        FROM (
          SELECT doc_id,
                 string_split_regex(lower(trim(text)), '\s+') AS toks,
                 CASE WHEN len(string_split_regex(lower(trim(text)), '\s+')) <= 64
                      THEN CAST(1 AS BIGINT)
                      ELSE CAST(ceil((len(string_split_regex(lower(trim(text)), '\s+')) - 64)
                                     / 48.0) AS BIGINT) + 1 END AS n_chunks
          FROM documents) z
        ORDER BY doc_id""")),

    // ---------------------------------------------------------------- x06
    // End-to-end corpus prep — the composition a real training-data run
    // executes as ONE Spark job: quality filter (t02's keep rule) →
    // exact dedup (keep the lowest doc_id per content hash) →
    // reproducible hash sample. Three narrow stages: a map-side filter,
    // one hash-agg shuffle joined back map-side, and a map-side sampling
    // predicate — the whole pipeline is a single linear pass + one
    // shuffle at any scale.
    "x06_corpus_pipeline" -> QueryDef(
      build = (s, d) => {
        val toks = TextFns.tokens(col("text"))
        val stopArr = array(TextFns.stopwords.map(lit): _*)
        val nStop = size(filter(toks, t => array_contains(stopArr, t)))
        val quality = t(s, d, "documents")
          .filter(length(col("text")).between(50, 10000) &&
            nStop.cast("double") / size(toks) >= 0.01)
        val keepers = quality
          .groupBy(md5(col("text").cast("binary")).as("h"))
          .agg(min("doc_id").as("keep_id"))
          .select(col("keep_id").as("doc_id"))
        // semi-join formulation on purpose: it reads `quality` twice but
        // shuffles only (hash, doc_id); the single-scan alternative — a
        // min-over-window partitioned by md5(text) — would push every
        // text byte through the shuffle. At 100 TB payload bytes are the
        // cost, not a second pruned scan.
        quality.join(keepers, Seq("doc_id"), "left_semi")
          .filter(substring(md5(col("doc_id").cast("string").cast("binary")),
            1, 1).isin("0", "1", "2", "3"))
          .select("doc_id", "lang", "source", "n_chars")
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH quality AS (
          SELECT * FROM documents
          WHERE length(text) BETWEEN 50 AND 10000
            AND CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                  tok -> tok IN ('the','a','of','and','to','in'))) AS DOUBLE)
                / len(string_split_regex(lower(trim(text)), '\s+')) >= 0.01),
        keepers AS (
          SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text))
        SELECT q.doc_id, q.lang, q.source, q.n_chars
        FROM quality q JOIN keepers k ON q.doc_id = k.doc_id
        WHERE substr(md5(CAST(q.doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
        ORDER BY q.doc_id""")),

    // ---------------------------------------------------------------- x04
    // PII-style redaction: mask digit runs, pin the redacted content via
    // digest + per-doc redaction count. Pure map-side regexp (codegen'd).
    "x04_redact" -> QueryDef(
      build = (s, d) =>
        t(s, d, "documents")
          .select(col("doc_id"),
            md5(regexp_replace(col("text"), "[0-9]+", "<NUM>").cast("binary"))
              .as("redacted_sig"),
            size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
              .cast("long").as("n_redactions"))
          .orderBy("doc_id"),
      oracle = Some("""
        SELECT doc_id,
               md5(regexp_replace(text, '[0-9]+', '<NUM>', 'g'))
                 AS redacted_sig,
               CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
                 AS n_redactions
        FROM documents ORDER BY doc_id""")),

    // ---------------------------------------------------------------- x07
    // Deterministic output SHARDING + balance audit: assign every doc
    // to one of 32 shards by an md5 draw on doc_id and report each
    // shard's doc/token mass plus a balance verdict (within ±20% of
    // the mean doc count, in exact integer cross-multiplication). This
    // is the write-side primitive for a 100 TB corpus: shard =
    // pure map-side hash (stable under reruns and corpus growth —
    // `df.repartition(col("shard")).write.partitionBy("shard")` gives
    // reproducible, evenly-sized output files), and the audit is one
    // map-side-partial aggregate. A skewed shard here means the HASH
    // is broken, not the data — which is exactly why it's worth a
    // standing tripwire in the pipeline.
    "x07_shard_balance" -> QueryDef(
      build = (s, d) => {
        val shard = pmod(conv(substring(md5(col("doc_id").cast("string")
          .cast("binary")), 1, 8), 16, 10).cast("long"), lit(32L))
        val docs = t(s, d, "documents")
          .select(shard.as("shard"),
            size(graft.functions.TextFns.tokens(col("text")))
              .cast("long").as("ntok"))
        val perShard = docs.groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"))
        val total = perShard.agg(sum("n_docs").as("tot"),
          count(lit(1)).as("nsh"))
        perShard.crossJoin(broadcast(total))
          // |n·S − tot| ≤ tot/5  ⇔  n within ±20% of tot/S, all-integer
          .select(col("shard"), col("n_docs"), col("n_tokens"),
            (abs(col("n_docs") * col("nsh") - col("tot")) * 5 <=
              col("tot")).as("balanced"))
          .orderBy("shard")
      },
      oracle = Some("""
        WITH d AS (
          SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 32 AS shard,
                 CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                   AS BIGINT) AS ntok
          FROM documents),
        ps AS (SELECT shard, count(*) AS n_docs,
                      CAST(sum(ntok) AS BIGINT) AS n_tokens
               FROM d GROUP BY shard),
        tt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot,
                      count(*) AS nsh FROM ps)
        SELECT shard, n_docs, n_tokens,
               abs(n_docs * nsh - tot) * 5 <= tot AS balanced
        FROM ps CROSS JOIN tt ORDER BY shard""")),

    // ---------------------------------------------------------------- x08
    // Per-shard output manifest: x07's deterministic md5 shard draw plus
    // the metadata a 100 TB writer records next to each shard file —
    // doc/token mass, id bounds, and an ORDER-FREE content signature
    // (bit_xor of a 60-bit per-doc digest prefix). xor is commutative
    // and associative, so the signature is identical at any parallelism
    // and any row order — re-running the job, or re-sharding after a
    // growth event, diffs as 32 signature compares instead of a
    // re-read of the corpus. Everything before the shard-keyed
    // aggregation is map-side; per-shard state is five scalars.
    "x08_shard_manifest" -> QueryDef(
      build = (s, d) => {
        val shard = pmod(conv(substring(md5(col("doc_id").cast("string")
          .cast("binary")), 1, 8), 16, 10).cast("long"), lit(32L))
        t(s, d, "documents")
          .select(shard.as("shard"), col("doc_id"),
            size(graft.functions.TextFns.tokens(col("text")))
              .cast("long").as("ntok"),
            conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
              .cast("long").as("csum"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"),
            min("doc_id").as("min_doc"), max("doc_id").as("max_doc"),
            expr("bit_xor(csum)").as("content_sig"))
          .orderBy("shard")
      },
      oracle = Some("""
        WITH d AS (
          SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 32 AS shard,
                 doc_id,
                 CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                   AS BIGINT) AS ntok,
                 ('0x' || substr(md5(text), 1, 15))::BIGINT AS csum
          FROM documents)
        SELECT shard, count(*) AS n_docs,
               CAST(sum(ntok) AS BIGINT) AS n_tokens,
               min(doc_id) AS min_doc, max(doc_id) AS max_doc,
               bit_xor(csum) AS content_sig
        FROM d GROUP BY shard ORDER BY shard""")),

    // ---------------------------------------------------------------- x09
    // Column data-profile: per string column of the corpus — null rate,
    // distinct cardinality, min/max value, average length — the
    // data-governance report every ingestion run records before a 100 TB
    // prep job trusts its inputs. ONE pass: the per-column stats unpivot
    // through a stack() so the scan is shared, each column's aggregates
    // are map-side partial, and the output is |columns| rows. Distinct
    // counts are exact here (the profile is per-shard in production and
    // shards bound the cardinality); the q28 HLL sketch composes when a
    // whole-corpus distinct is wanted at scale.
    "x09_data_profile" -> QueryDef(
      build = (s, d) =>
        t(s, d, "documents")
          .select(expr(
            "stack(3, 'lang', lang, 'source', source, 'text', text) " +
              "AS (col_name, v)"))
          .groupBy("col_name")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
            countDistinct(col("v")).as("n_distinct"),
            min("v").as("min_val"), max("v").as("max_val"),
            round(avg(length(col("v"))), 4).as("avg_len"))
          .orderBy("col_name"),
      oracle = Some("""
        WITH u AS (
          SELECT 'lang' AS col_name, lang AS v FROM documents
          UNION ALL SELECT 'source', source FROM documents
          UNION ALL SELECT 'text', text FROM documents)
        SELECT col_name, count(*) AS n_rows,
               CAST(count(*) - count(v) AS BIGINT) AS n_null,
               CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
               min(v) AS min_val, max(v) AS max_val,
               round(avg(length(v)), 4) AS avg_len
        FROM u GROUP BY col_name ORDER BY col_name""")),

    // ---------------------------------------------------------------- x10
    // Compaction plan (the OPTIMIZE/bin-pack step a 100 TB table needs
    // continuously): pack x07's 32 deterministic shards into output file
    // groups of ~TARGET token mass by walking shards in id order and
    // cutting a new group each time the running mass crosses the target —
    // exactly how a small-file compactor coalesces spill files into
    // right-sized parquet. group = exclusive-prefix-mass DIV target, in
    // pure integer arithmetic. The only window runs on the CONSTANT
    // 32-row shard table (the corpus-sized work is the map-side shard
    // draw + one shard-keyed count); at a million input files the same
    // plan swaps the window for the p02 two-pass prefix scheme.
    "x10_compaction_plan" -> QueryDef(
      build = (s, d) => {
        val shard = pmod(conv(substring(md5(col("doc_id").cast("string")
          .cast("binary")), 1, 8), 16, 10).cast("long"), lit(32L))
        val perShard = t(s, d, "documents")
          .select(shard.as("shard"),
            size(graft.functions.TextFns.tokens(col("text")))
              .cast("long").as("ntok"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"))
        val w = Window.orderBy("shard")
          .rowsBetween(Window.unboundedPreceding, -1)
        perShard
          .withColumn("cum_before",
            coalesce(sum("n_tokens").over(w), lit(0L)))
          .withColumn("file_group",
            expr("CAST(cum_before DIV 4096 AS BIGINT)"))
          .select("shard", "n_docs", "n_tokens", "cum_before", "file_group")
          .orderBy("shard")
      },
      oracle = Some("""
        WITH d AS (
          SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 32 AS shard,
                 CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                   AS BIGINT) AS ntok
          FROM documents),
        ps AS (SELECT shard, count(*) AS n_docs,
                      CAST(sum(ntok) AS BIGINT) AS n_tokens
               FROM d GROUP BY shard),
        c AS (SELECT shard, n_docs, n_tokens,
                     CAST(coalesce(sum(n_tokens) OVER (ORDER BY shard
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS cum_before
              FROM ps)
        SELECT shard, n_docs, n_tokens, cum_before,
               CAST(cum_before // 4096 AS BIGINT) AS file_group
        FROM c ORDER BY shard"""))
  )

  /** x11's Laplace scale b = 1/ε with ε = 0.02 (count sensitivity 1). */
  val DpB = 50.0

  /** Deterministic Laplace draw for x11: the uniform comes from the md5
    * of the released KEY itself ((k + 0.5)/2^32 with k the first 8 hex
    * digits — never exactly 0 or 1, so ln stays finite), and the noise
    * is the inverse CDF −b·sgn(u−½)·ln(1−2|u−½|). Same-key noise is
    * identical across reruns/engines — a *seeded* DP release (the only
    * kind an exact cross-engine oracle can pin; a production release
    * would draw from entropy instead, one line away).
    */
  private def lapNoise(key: org.apache.spark.sql.Column) = {
    val k = conv(substring(md5(key.cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val u = (k.cast("double") + lit(0.5)) / lit(4294967296.0)
    -lit(DpB) * signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5))
  }

  private val dpDefs: Seq[(String, QueryDef)] = Seq(
    // ---------------------------------------------------------------- x11
    // DIFFERENTIALLY-PRIVATE count release (ε = 0.02, Laplace): per-type
    // event counts + deterministic seeded Laplace noise, 4-dp rounded on
    // both engines (the ln() sits ≥ 4 decimal orders above the 1-ulp
    // libm disagreement surface — t08's scheme). One map-side-partial
    // count keyed by event_type, noise applied on the |types|-row
    // result: the aggregation dominates, the mechanism is free at any
    // scale.
    "x11_dp_count" -> QueryDef(
      build = (s, d) =>
        t(s, d, "events")
          .groupBy("event_type").agg(count(lit(1)).as("n_true"))
          .select(col("event_type"),
            round(col("n_true").cast("double") +
              lapNoise(col("event_type")), 4).as("n_noisy"))
          .orderBy("event_type"),
      oracle = Some(s"""
        WITH c AS (
          SELECT event_type, count(*) AS n_true FROM events GROUP BY 1),
        h AS (
          SELECT event_type, n_true,
                 (CAST(('0x' || substr(md5(event_type), 1, 8)) AS BIGINT)
                   + 0.5) / 4294967296.0 AS u
          FROM c)
        SELECT event_type,
               round(CAST(n_true AS DOUBLE)
                 - $DpB * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)),
                 4) AS n_noisy
        FROM h ORDER BY event_type""")),

    // ---------------------------------------------------------------- x12
    // DELETION PROPAGATION audit (GDPR/right-to-be-forgotten): a
    // deletion-request list (here the x01 draw: md5 first hex = '0',
    // ~1/16 of docs) must disappear from EVERY derived table. The list
    // propagates to `documents` as a map-side predicate and to
    // `embeddings` (doc_id ≡ vec_id) as a LEFT join against the id
    // list — the join is the honest shape: a real deletion list is an
    // opaque id set, not a recomputable predicate. Output: per-segment
    // deleted/retained counts for both tables, |sources|+1 rows. At
    // 100 TB the id list side is ~corpus/16 — runtime bloom pruning (on
    // in clusterBuilder) turns the probe-side scan into a semi-join
    // reduction before the shuffle.
    "x12_delete_propagation" -> QueryDef(
      build = (s, d) => {
        val deathrow = t(s, d, "documents")
          .filter(substring(md5(col("doc_id").cast("string")
            .cast("binary")), 1, 1) === "0")
          .select(col("doc_id").as("del_id"))
        val docs = t(s, d, "documents")
          .withColumn("del",
            when(substring(md5(col("doc_id").cast("string")
              .cast("binary")), 1, 1) === "0", 1L).otherwise(0L))
          .groupBy(col("source").as("segment"))
          .agg(sum("del").as("n_deleted"),
            sum(lit(1L) - col("del")).as("n_retained"))
          .select(lit("documents").as("table_name"), col("segment"),
            col("n_deleted"), col("n_retained"))
        val emb = t(s, d, "embeddings")
          .join(deathrow, col("vec_id") === col("del_id"), "left")
          .agg(count(col("del_id")).as("n_deleted"),
            (count(lit(1)) - count(col("del_id"))).as("n_retained"))
          .select(lit("embeddings").as("table_name"),
            lit("all").as("segment"), col("n_deleted"), col("n_retained"))
        docs.unionByName(emb).orderBy("table_name", "segment")
      },
      oracle = Some("""
        WITH del AS (
          SELECT doc_id AS del_id FROM documents
          WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'),
        d AS (
          SELECT 'documents' AS table_name, source AS segment,
                 CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                   = '0' THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
                 CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                   = '0' THEN 0 ELSE 1 END) AS BIGINT) AS n_retained
          FROM documents GROUP BY 2),
        e AS (
          SELECT 'embeddings' AS table_name, 'all' AS segment,
                 CAST(count(del.del_id) AS BIGINT) AS n_deleted,
                 CAST(count(*) - count(del.del_id) AS BIGINT) AS n_retained
          FROM embeddings emb LEFT JOIN del ON del.del_id = emb.vec_id)
        SELECT * FROM d UNION ALL SELECT * FROM e
        ORDER BY table_name, segment""")),

    // ---------------------------------------------------------------- x13
    // PII PREVALENCE report — x04's upstream decision tool: per source,
    // how many docs carry email- / phone- / long-number-shaped strings
    // and the total hit counts — the report that decides WHERE redaction
    // must run (and proves it ran: re-running on x04's output must show
    // zeros). Pure map-side regexp counts + one |sources|-row rollup.
    // Patterns kept to the regex subset Java and RE2 parse identically.
    "x13_pii_report" -> QueryDef(
      build = (s, d) => {
        val p = coalesce(col("text"), lit(""))
        def hits(pat: String) =
          size(regexp_extract_all(p, lit(pat), lit(0))).cast("long")
        t(s, d, "documents")
          .select(col("source"),
            hits("[a-z0-9]+@[a-z0-9]+\\.[a-z]+").as("emails"),
            hits("[0-9]{3}-[0-9]{3,4}-[0-9]{4}").as("phones"),
            hits("[0-9]{6,}").as("longnums"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("emails") + col("phones") + col("longnums") > 0, 1L)
              .otherwise(0L)).as("docs_with_pii"),
            sum("emails").as("n_emails"), sum("phones").as("n_phones"),
            sum("longnums").as("n_longnums"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH h AS (
          SELECT source,
                 CAST(len(regexp_extract_all(coalesce(text, ''),
                   '[a-z0-9]+@[a-z0-9]+\.[a-z]+')) AS BIGINT) AS emails,
                 CAST(len(regexp_extract_all(coalesce(text, ''),
                   '[0-9]{3}-[0-9]{3,4}-[0-9]{4}')) AS BIGINT) AS phones,
                 CAST(len(regexp_extract_all(coalesce(text, ''),
                   '[0-9]{6,}')) AS BIGINT) AS longnums
          FROM documents)
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN emails + phones + longnums > 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
               CAST(sum(emails) AS BIGINT) AS n_emails,
               CAST(sum(phones) AS BIGINT) AS n_phones,
               CAST(sum(longnums) AS BIGINT) AS n_longnums
        FROM h GROUP BY source ORDER BY source""")),

    // ---------------------------------------------------------------- x14
    // DETERMINISTIC PSEUDONYMIZATION: user ids replaced by md5
    // surrogates — stable across runs/tables (any table keyed by the
    // same id pseudonymizes consistently, so joins still work), not
    // reversible without the id list, and analytics-preserving: the
    // per-surrogate activity histogram below IS the per-user histogram
    // under new names (top-20 shown; count-distinct preservation is
    // spec-pinned). Pure map-side rewrite + one aggregation.
    "x14_pseudonymize" -> QueryDef(
      build = (s, d) =>
        t(s, d, "events")
          .select(md5(col("user_id").cast("string").cast("binary"))
            .as("surrogate"))
          .groupBy("surrogate").agg(count(lit(1)).as("n_events"))
          .orderBy(desc("n_events"), asc("surrogate"))
          .limit(20),
      oracle = Some("""
        SELECT md5(CAST(user_id AS VARCHAR)) AS surrogate,
               count(*) AS n_events
        FROM events GROUP BY 1
        ORDER BY n_events DESC, surrogate LIMIT 20""")),

    // ---------------------------------------------------------------- x15
    // DATA-CONTRACT checks (dbt-test style): declarative quality rules —
    // key uniqueness, NOT NULL, value ranges, referential integrity —
    // evaluated as aggregations/anti-joins, one violations-count row per
    // rule. The ingestion gate a 100 TB pipeline runs before promoting a
    // snapshot: every rule is a single scan or key-partitioned anti-join
    // (the referential check is the same shape as q22), output is
    // |rules| rows.
    "x15_contract_check" -> QueryDef(
      build = (s, d) => {
        val orders = t(s, d, "orders")
        val lineitem = t(s, d, "lineitem")
        val events = t(s, d, "events")
        def rule(name: String, viol: org.apache.spark.sql.DataFrame) =
          viol.agg(count(lit(1)).as("n_violations"))
            .select(lit(name).as("rule"), col("n_violations"))
        rule("orders.o_orderkey unique",
            orders.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
              .filter(col("c") > 1))
          .unionByName(rule("orders.o_custkey not null",
            orders.filter(col("o_custkey").isNull)))
          .unionByName(rule("lineitem.l_quantity in [1,50]",
            lineitem.filter(col("l_quantity") < 1 || col("l_quantity") > 50)))
          .unionByName(rule("lineitem.l_discount in [0,0.1]",
            lineitem.filter(col("l_discount") < 0 || col("l_discount") > 0.1)))
          .unionByName(rule("lineitem.l_orderkey refs orders",
            lineitem.select("l_orderkey").distinct()
              .join(orders.select(col("o_orderkey")),
                col("l_orderkey") === col("o_orderkey"), "left_anti")))
          .unionByName(rule("events.ts not null",
            events.filter(col("ts").isNull)))
          .orderBy("rule")
      },
      oracle = Some("""
        SELECT rule, n_violations FROM (
          SELECT 'orders.o_orderkey unique' AS rule,
                 CAST(count(*) AS BIGINT) AS n_violations
          FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1) z
          UNION ALL
          SELECT 'orders.o_custkey not null', CAST(count(*) AS BIGINT)
          FROM orders WHERE o_custkey IS NULL
          UNION ALL
          SELECT 'lineitem.l_quantity in [1,50]', CAST(count(*) AS BIGINT)
          FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
          UNION ALL
          SELECT 'lineitem.l_discount in [0,0.1]', CAST(count(*) AS BIGINT)
          FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1
          UNION ALL
          SELECT 'lineitem.l_orderkey refs orders', CAST(count(*) AS BIGINT)
          FROM (SELECT DISTINCT l_orderkey FROM lineitem
                WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) z
          UNION ALL
          SELECT 'events.ts not null', CAST(count(*) AS BIGINT)
          FROM events WHERE ts IS NULL) r
        ORDER BY rule""")),

    // ---------------------------------------------------------------- x16
    // Per-column PROFILE DRIFT between snapshot halves (p14's even/odd
    // doc_id convention): null rate and distinct cardinality per column
    // on each side, with drift verdicts in exact integer arithmetic —
    // null drift = |Δ null bp| > 100, distinct drift = ±20% by
    // cross-multiplication (no division decides a verdict). This is the
    // schema-stability tripwire between crawls: a column whose null
    // rate jumps or whose cardinality collapses signals an upstream
    // extractor break BEFORE content-level checks (p14/x15) fire.
    // One stacked scan per side (x09's shape), 3-row output.
    "x16_profile_drift" -> QueryDef(
      build = (s, d) => {
        def prof(side: org.apache.spark.sql.DataFrame) = side
          .select(expr(
            "stack(3, 'lang', lang, 'source', source, 'text', text) " +
              "AS (col_name, v)"))
          .groupBy("col_name")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
            countDistinct(col("v")).as("n_distinct"))
        val docs = t(s, d, "documents")
        val b = prof(docs.filter(col("doc_id") % 2 === 0))
          .select(col("col_name"), col("n_rows").as("base_rows"),
            expr("n_null * 10000 div n_rows").as("base_null_bp"),
            col("n_distinct").as("base_distinct"))
        val n = prof(docs.filter(col("doc_id") % 2 === 1))
          .select(col("col_name"), col("n_rows").as("next_rows"),
            expr("n_null * 10000 div n_rows").as("next_null_bp"),
            col("n_distinct").as("next_distinct"))
        b.join(n, Seq("col_name"))
          .select(col("col_name"), col("base_rows"), col("next_rows"),
            col("base_null_bp"), col("next_null_bp"),
            col("base_distinct"), col("next_distinct"),
            (abs(col("base_null_bp") - col("next_null_bp")) > 100)
              .as("null_drift"),
            (col("next_distinct") * 10 > col("base_distinct") * 12 ||
             col("next_distinct") * 10 < col("base_distinct") * 8)
              .as("distinct_drift"))
          .orderBy("col_name")
      },
      oracle = Some("""
        WITH st AS (
          SELECT doc_id % 2 AS side, 'lang' AS col_name, lang AS v
          FROM documents
          UNION ALL SELECT doc_id % 2, 'source', source FROM documents
          UNION ALL SELECT doc_id % 2, 'text', text FROM documents),
        p AS (
          SELECT side, col_name, count(*) AS n_rows,
                 CAST(count(*) FILTER (WHERE v IS NULL) AS BIGINT) AS n_null,
                 CAST(count(DISTINCT v) AS BIGINT) AS n_distinct
          FROM st GROUP BY side, col_name),
        b AS (SELECT col_name, n_rows AS base_rows,
                     n_null * 10000 // n_rows AS base_null_bp,
                     n_distinct AS base_distinct FROM p WHERE side = 0),
        n AS (SELECT col_name, n_rows AS next_rows,
                     n_null * 10000 // n_rows AS next_null_bp,
                     n_distinct AS next_distinct FROM p WHERE side = 1)
        SELECT col_name, base_rows, next_rows, base_null_bp, next_null_bp,
               base_distinct, next_distinct,
               abs(base_null_bp - next_null_bp) > 100 AS null_drift,
               (next_distinct * 10 > base_distinct * 12 OR
                next_distinct * 10 < base_distinct * 8) AS distinct_drift
        FROM b JOIN n USING (col_name) ORDER BY col_name""")),

    // ---------------------------------------------------------------- x17
    // FRESHNESS audit: per event-type ingestion health — last-seen lag
    // behind the stream's high-water mark, active-day span, and events
    // per active day. The table-of-contents check a 100 TB ingest runs
    // before trusting a source: a type whose lag_sec is large or whose
    // per-day rate collapsed has a stuck upstream. One hash agg to
    // |event_types| rows + a broadcast scalar for the high-water mark;
    // all figures integer-exact (micros → whole seconds via div, rate
    // via integer division) so the report is bit-stable across engines
    // and partitionings.
    "x17_freshness_audit" -> QueryDef(
      build = (s, d) => {
        val us = unix_micros(col("ts").cast("timestamp"))
        val per = t(s, d, "events")
          .select(col("event_type"), us.as("us"),
            date_trunc("day", col("ts").cast("timestamp")).as("day"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            min("us").as("first_us"), max("us").as("last_us"),
            countDistinct("day").as("active_days"))
        val hw = t(s, d, "events").agg(max(us).as("hw_us"))
        per.crossJoin(broadcast(hw))
          .select(col("event_type"), col("n_events"), col("active_days"),
            expr("(hw_us - last_us) div 1000000").as("lag_sec"),
            expr("(last_us - first_us) div 86400000000").as("span_days"),
            expr("n_events div active_days").as("events_per_day"))
          .orderBy("event_type")
      },
      oracle = Some("""
        WITH per AS (
          SELECT event_type, count(*) AS n_events,
                 min(epoch_us(CAST(ts AS TIMESTAMP))) AS first_us,
                 max(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us,
                 CAST(count(DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)))
                   AS BIGINT) AS active_days
          FROM events GROUP BY 1),
        hw AS (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) AS hw_us
               FROM events)
        SELECT event_type, n_events, active_days,
               (hw_us - last_us) // 1000000 AS lag_sec,
               (last_us - first_us) // 86400000000 AS span_days,
               n_events // active_days AS events_per_day
        FROM per CROSS JOIN hw ORDER BY event_type""")),

    // ---------------------------------------------------------------- x19
    // k-ANONYMITY census over the release quasi-identifiers (lang,
    // source, n_chars rounded to the hundred): how many docs sit in
    // equivalence classes smaller than k=5 — i.e. are re-identifiable by
    // the metadata alone even after x14's pseudonymization (which
    // protects direct identifiers only). The standard privacy audit
    // before publishing a corpus slice. Two hash aggregates: docs →
    // |QI classes|, classes → |langs| report rows; risk share in exact
    // integer bp. Complements x11 (DP release) / x13 (PII content) /
    // x14 (surrogate keys) as the fourth privacy primitive.
    "x19_kanonymity" -> QueryDef(
      build = (s, d) => {
        val cls = t(s, d, "documents")
          .groupBy(col("lang"), col("source"),
            expr("n_chars div 100").as("len_c"))
          .agg(count(lit(1)).as("sz"))
        cls.groupBy("lang")
          .agg(count(lit(1)).as("n_classes"),
            sum("sz").as("n_docs"),
            sum(when(col("sz") < 5, 1L).otherwise(0L)).as("n_small_classes"),
            sum(when(col("sz") < 5, col("sz")).otherwise(0L))
              .as("docs_at_risk"),
            min("sz").as("min_class_size"))
          .select(col("lang"), col("n_classes"), col("n_docs"),
            col("n_small_classes"), col("docs_at_risk"),
            expr("docs_at_risk * 10000 div n_docs").as("risk_bp"),
            col("min_class_size"))
          .orderBy("lang")
      },
      oracle = Some("""
        WITH cls AS (
          SELECT lang, source, n_chars // 100 AS len_c, count(*) AS sz
          FROM documents GROUP BY 1, 2, 3),
        g AS (
          SELECT lang, count(*) AS n_classes,
                 CAST(sum(sz) AS BIGINT) AS n_docs,
                 CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_small_classes,
                 CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
                   AS docs_at_risk,
                 min(sz) AS min_class_size
          FROM cls GROUP BY lang)
        SELECT lang, n_classes, n_docs, n_small_classes, docs_at_risk,
               docs_at_risk * 10000 // n_docs AS risk_bp, min_class_size
        FROM g ORDER BY lang""")),

    // ---------------------------------------------------------------- x20
    // STORAGE-LAYOUT pruning audit (zone maps / min-max file statistics):
    // simulate the same corpus written under two layouts — round-robin
    // (f = doc_id % 32, what an unsorted writer produces) vs value-range
    // on n_chars (what a sort-before-write / Z-order on one key
    // produces) — compute each virtual file's min/max "footer stat", and
    // count the files a `n_chars BETWEEN 200 AND 400` scan must touch.
    // This is the audit that prices a 100 TB re-sort: parquet row-group
    // pruning works off exactly these min/max footers, and the answer
    // ("bylen touches 4/32 files, roundrobin all 32") is the bytes-
    // scanned ratio a layout buys. Everything is map-side file
    // assignment (the range layout uses broadcast global min/max — two
    // cheap pruned scans, no global sort: the audit PRICES the sort
    // without performing it) + one 32-row-per-layout aggregate; all
    // counters exact BIGINTs, prune share in integer bp.
    "x20_layout_pruning" -> QueryDef(
      build = (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("n_chars"))
        val ext = docs.agg(min("n_chars").as("mn_all"),
          max("n_chars").as("mx_all"))
        val withF = docs.crossJoin(broadcast(ext))
          .select(col("n_chars"),
            (col("doc_id") % 32).as("f_rr"),
            expr("least(31, (n_chars - mn_all) * 32 div " +
              "(mx_all - mn_all + 1))").as("f_len"))
        def audit(name: String, fcol: String) =
          withF.groupBy(col(fcol).as("file_id"))
            .agg(count(lit(1)).as("n_rows"),
              min("n_chars").as("mn"), max("n_chars").as("mx"),
              sum(when(col("n_chars").between(200, 400), 1L).otherwise(0L))
                .as("n_match"))
            .agg(count(lit(1)).as("n_files"),
              sum(when(col("mn") <= 400 && col("mx") >= 200, 1L)
                .otherwise(0L)).as("files_touched"),
              sum(when(col("mn") <= 400 && col("mx") >= 200, col("n_rows"))
                .otherwise(0L)).as("rows_scanned"),
              sum("n_match").as("n_match"))
            // empty corpus: the global agg still emits one n_files=0 row
            // — drop it BEFORE prune_bp's division (ANSI div-by-zero)
            .filter(col("n_files") > 0)
            .select(lit(name).as("layout"), col("n_files"),
              col("files_touched"), col("rows_scanned"), col("n_match"),
              expr("(n_files - files_touched) * 10000 div n_files")
                .as("prune_bp"))
        audit("bylen", "f_len").unionByName(audit("roundrobin", "f_rr"))
          .orderBy("layout")
      },
      oracle = Some("""
        WITH ext AS (
          SELECT min(n_chars) AS mn_all, max(n_chars) AS mx_all
          FROM documents),
        w AS (
          SELECT n_chars, doc_id % 32 AS f_rr,
                 least(31, (n_chars - mn_all) * 32
                   // (mx_all - mn_all + 1)) AS f_len
          FROM documents CROSS JOIN ext),
        perfile AS (
          SELECT 'roundrobin' AS layout, f_rr AS file_id,
                 count(*) AS n_rows, min(n_chars) AS mn, max(n_chars) AS mx,
                 sum(CASE WHEN n_chars BETWEEN 200 AND 400 THEN 1 ELSE 0
                   END) AS n_match
          FROM w GROUP BY 2
          UNION ALL
          SELECT 'bylen', f_len, count(*), min(n_chars), max(n_chars),
                 sum(CASE WHEN n_chars BETWEEN 200 AND 400 THEN 1 ELSE 0 END)
          FROM w GROUP BY 2)
        SELECT layout, count(*) AS n_files,
               CAST(sum(CASE WHEN mn <= 400 AND mx >= 200 THEN 1 ELSE 0 END)
                 AS BIGINT) AS files_touched,
               CAST(sum(CASE WHEN mn <= 400 AND mx >= 200 THEN n_rows
                 ELSE 0 END) AS BIGINT) AS rows_scanned,
               CAST(sum(n_match) AS BIGINT) AS n_match,
               CAST((count(*) - sum(CASE WHEN mn <= 400 AND mx >= 200
                 THEN 1 ELSE 0 END)) * 10000 // count(*) AS BIGINT)
                 AS prune_bp
        FROM perfile GROUP BY layout ORDER BY layout""")),

    // ---------------------------------------------------------------- x21
    // Row-level LINEAGE card: for every doc, all the pipeline
    // assignments the engine derives for it — surrogate id (x14's
    // convention), output shard (x07's md5-prefix draw — note it is a
    // prefix of the surrogate itself: the shard is derivable from the
    // published id without the raw key), k-fold slot (p18's
    // content-keyed draw) and the content signature — in ONE map-side
    // select. This is the audit that proves every routing decision is a
    // pure function of the row (rerun/shard/engine-stable, no rand()
    // anywhere), and the join key a debugging session uses to trace one
    // document through shards, folds and dedup artifacts at 100 TB
    // without re-deriving any of them.
    "x21_lineage_card" -> QueryDef(
      build = (s, d) => {
        val idMd5 = md5(col("doc_id").cast("string").cast("binary"))
        val digest = md5(coalesce(col("text"), lit("")).cast("binary"))
        t(s, d, "documents")
          .select(col("doc_id"),
            idMd5.as("surrogate"),
            pmod(conv(substring(idMd5, 1, 8), 16, 10).cast("long"),
              lit(32L)).as("shard"),
            pmod(conv(substring(md5(digest.cast("binary")), 1, 8), 16, 10)
              .cast("long"), lit(5L)).as("fold"),
            digest.as("content_sig"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        SELECT doc_id,
               md5(CAST(doc_id AS VARCHAR)) AS surrogate,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 % 32 AS shard,
               ('0x' || substr(md5(md5(coalesce(text, ''))), 1, 8))::BIGINT
                 % 5 AS fold,
               md5(coalesce(text, '')) AS content_sig
        FROM documents ORDER BY doc_id""")),

    // ---------------------------------------------------------------- x22
    // REDACTION-EFFECTIVENESS audit: apply x04's transform and re-scan
    // the redacted text with the SAME detector — residual hits must be
    // zero, proving the redaction is complete and idempotent (the audit
    // a privacy review actually asks for: not "did you redact?" but
    // "does the detector find anything AFTER?"). Per source: affected
    // docs, total redactions, placeholder density, residuals. A nonzero
    // residual means detector and redactor disagree (e.g. a pattern
    // that re-forms after substitution) — the class of bug this
    // tripwire exists to catch before a 100 TB release. One map-side
    // select, one |sources|-row agg, exact integers.
    "x22_redaction_audit" -> QueryDef(
      build = (s, d) => {
        val txt = coalesce(col("text"), lit(""))
        val red = regexp_replace(txt, "[0-9]+", "<NUM>")
        t(s, d, "documents")
          .select(col("source"),
            size(regexp_extract_all(txt, lit("[0-9]+"), lit(0)))
              .cast("long").as("n_hits"),
            size(regexp_extract_all(red, lit("[0-9]+"), lit(0)))
              .cast("long").as("n_residual"),
            size(regexp_extract_all(red, lit("<NUM>"), lit(0)))
              .cast("long").as("n_marks"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("n_hits") > 0, 1L).otherwise(0L))
              .as("docs_with_pii"),
            sum("n_hits").as("total_redactions"),
            sum("n_marks").as("total_marks"),
            sum("n_residual").as("residual_after"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH f AS (
          SELECT source,
                 len(regexp_extract_all(coalesce(text, ''), '[0-9]+'))
                   AS n_hits,
                 len(regexp_extract_all(regexp_replace(coalesce(text, ''),
                   '[0-9]+', '<NUM>', 'g'), '[0-9]+')) AS n_residual,
                 len(regexp_extract_all(regexp_replace(coalesce(text, ''),
                   '[0-9]+', '<NUM>', 'g'), '<NUM>')) AS n_marks
          FROM documents)
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_with_pii,
               CAST(sum(n_hits) AS BIGINT) AS total_redactions,
               CAST(sum(n_marks) AS BIGINT) AS total_marks,
               CAST(sum(n_residual) AS BIGINT) AS residual_after
        FROM f GROUP BY source ORDER BY source""")),

    // ---------------------------------------------------------------- x23
    // EQUI-DEPTH binning WITHOUT a global sort: 4 quartile bands over
    // n_chars computed from the value histogram — distinct values with
    // counts, a cumulative sum over the ≤|distinct values|-row
    // histogram (never the corpus), and each value lands in the band
    // of its FIRST row's rank ((cum − cnt)·4 div total, exact
    // integers). This is the feature-bucketizer / range-partitioner
    // boundary computation at 100 TB: the corpus is touched once by a
    // hash aggregate, the window touches |distinct| rows, and the
    // boundaries are a pure function of the data (no sampling, no
    // engine RNG — contrast Spark's sampled RangePartitioner). Band
    // populations are equal up to value-granularity (a heavy value
    // cannot split across bands — spec'd).
    "x23_equidepth_bins" -> QueryDef(
      build = (s, d) => {
        val hist = t(s, d, "documents")
          .groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("cnt"))
        val tot = hist.agg(sum("cnt").as("total"))
        val w = Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0)
        hist.withColumn("cum", sum("cnt").over(w))
          .crossJoin(broadcast(tot))
          .select(col("v"), col("cnt"),
            expr("(cum - cnt) * 4 div total").as("band"))
          .groupBy("band")
          .agg(min("v").as("lo"), max("v").as("hi"),
            sum("cnt").as("n_docs"))
          .orderBy("band")
      },
      oracle = Some("""
        WITH h AS (
          SELECT n_chars AS v, count(*) AS cnt
          FROM documents GROUP BY n_chars),
        t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM h),
        c AS (
          SELECT v, cnt,
                 CAST(sum(cnt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
          FROM h)
        SELECT CAST((cum - cnt) * 4 // total AS BIGINT) AS band,
               min(v) AS lo, max(v) AS hi,
               CAST(sum(cnt) AS BIGINT) AS n_docs
        FROM c CROSS JOIN t
        GROUP BY 1 ORDER BY band""")),

    // ---------------------------------------------------------------- x24
    // SAMPLING-BIAS audit: does x01's 1/16 hash sample preserve the
    // per-source composition of the corpus? Both the corpus shares and
    // the sample shares are exact-bp integers (count·10000 div total —
    // no float, engine/partition-exact), compared per source with a
    // |Δ| > 200 bp flag. ONE pass over the corpus: the sample counts
    // are conditional aggregates of the same scan (sum of CASE), not a
    // second read — the audit costs exactly what a count(*) costs. A
    // deterministic hash sample has no sampling distribution to argue
    // about: a flagged source means the hash is correlated with that
    // source's doc_id allocation, which is precisely the bug this
    // audit exists to catch. ≤|sources| rows.
    "x24_sample_bias" -> QueryDef(
      build = (s, d) => {
        val inS = substring(md5(col("doc_id").cast("string")
          .cast("binary")), 1, 1) === "0"
        val per = t(s, d, "documents")
          .select(coalesce(col("source"), lit("")).as("source"),
            when(inS, 1L).otherwise(0L).as("ins"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("ins").as("n_sample"))
        per
          .withColumn("tot", sum("n_docs").over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
          .withColumn("stot", sum("n_sample").over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
          .filter(col("stot") > 0)
          .select(col("source"), col("n_docs"), col("n_sample"),
            expr("n_docs * 10000 div tot").as("corpus_bp"),
            expr("n_sample * 10000 div stot").as("sample_bp"),
            (abs(expr("n_docs * 10000 div tot") -
              expr("n_sample * 10000 div stot")) > 200).as("biased"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH per AS (
          SELECT coalesce(source, '') AS source, count(*) AS n_docs,
                 CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),
                   1, 1) = '0' THEN 1 ELSE 0 END) AS BIGINT) AS n_sample
          FROM documents GROUP BY 1),
        t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot,
                     CAST(sum(n_sample) AS BIGINT) AS stot FROM per)
        SELECT source, n_docs, n_sample,
               CAST(n_docs * 10000 // tot AS BIGINT) AS corpus_bp,
               CAST(n_sample * 10000 // stot AS BIGINT) AS sample_bp,
               abs(n_docs * 10000 // tot - n_sample * 10000 // stot) > 200
                 AS biased
        FROM per CROSS JOIN t
        WHERE stot > 0
        ORDER BY source"""))
  )
}
