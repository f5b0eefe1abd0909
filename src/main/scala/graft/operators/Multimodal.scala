package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.G — multimodal-column plumbing. Image/audio/video payloads are
  * opaque `binary` columns with typed metadata; the decode step is STUBBED
  * (no codec libs in this container — see `fakeDecode`) but the Spark-side
  * plumbing — schema, binary columns, per-partition batched processing,
  * feature-vector output shape — is real and tested.
  *
  * At 100 TB the binary payloads dominate: everything here is map-side
  * (zero shuffle); metadata extraction prunes to metadata columns only.
  */
object Multimodal {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  // m10's (format, chunk-digest) table: one chunk pass, three consumers
  // (global share counts, per-format totals, the shared join-back).
  private val fmtChunkCache = HotCache.slot()

  /** STUB decode: a real deployment would decode image/audio bytes here
    * (e.g. JPEG → pixels). Deterministic fake: 8 byte-histogram moments.
    * The signature (bytes → fixed-size float feature vector) is the real
    * contract a decode UDF would have.
    */
  private[operators] def fakeDecode(bytes: Array[Byte]): Array[Double] = {
    val hist = new Array[Long](8)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 5) += 1; i += 1 }
    val n = math.max(bytes.length, 1).toDouble
    hist.map(_ / n)
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---------------------------------------------------------------- m01
    // Binary column + typed metadata: byte length + content digest.
    "m01_binary_meta" -> QueryDef(
      build = (s, d) =>
        t(s, d, "documents")
          .withColumn("payload", col("text").cast("binary"))
          .select(col("doc_id"),
            octet_length(col("payload")).cast("long").as("n_bytes"),
            md5(col("payload")).as("sig"))
          .orderBy("doc_id"),
      oracle = Some("""
        SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
               md5(text) AS sig
        FROM documents ORDER BY doc_id""")),

    // ---------------------------------------------------------------- m02
    // Batched per-partition "decode" → fixed-size feature vector. The
    // mapPartitions shape is what a real decode (image resize, audio
    // frame-sample) would use: one iterator pass, no driver collect.
    // Features surface as scalar columns f0..f7 (rounded) so the result
    // is sortable/hashable by the driver's compare; the oracle recomputes
    // the byte-histogram stub in SQL (the corpus is ASCII, so DuckDB's
    // per-char ord() >> 5 equals the UTF-8 byte buckets).
    "m02_feature_extract" -> QueryDef(
      build = (s, d) => {
        // NULL text → empty payload (not a task-killing null array in the
        // decode loop); mirrored by coalesce in the oracle. Empty payload
        // decodes to the all-zero feature vector on both engines.
        val src = t(s, d, "documents")
          .select(col("doc_id"),
            coalesce(col("text"), lit("")).cast("binary").as("payload"))
        val outSchema = StructType(
          StructField("doc_id", LongType, nullable = false) +:
          (0 until 8).map(i =>
            StructField(s"f$i", DoubleType, nullable = false)))
        val enc = org.apache.spark.sql.Encoders.row(outSchema)
        src.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            Row.fromSeq(id +: fakeDecode(bytes).toSeq)
          }
        }(enc)
          .select(col("doc_id") +:
            (0 until 8).map(i => round(col(s"f$i"), 6).as(s"f$i")): _*)
          .orderBy("doc_id")
      },
      oracle = Some("""
        SELECT doc_id,
               round(len(list_filter(codes, c -> c // 32 = 0)) / n, 6) AS f0,
               round(len(list_filter(codes, c -> c // 32 = 1)) / n, 6) AS f1,
               round(len(list_filter(codes, c -> c // 32 = 2)) / n, 6) AS f2,
               round(len(list_filter(codes, c -> c // 32 = 3)) / n, 6) AS f3,
               round(len(list_filter(codes, c -> c // 32 = 4)) / n, 6) AS f4,
               round(len(list_filter(codes, c -> c // 32 = 5)) / n, 6) AS f5,
               round(len(list_filter(codes, c -> c // 32 = 6)) / n, 6) AS f6,
               round(len(list_filter(codes, c -> c // 32 = 7)) / n, 6) AS f7
        FROM (
          SELECT doc_id,
                 CAST(greatest(strlen(coalesce(text, '')), 1) AS DOUBLE) AS n,
                 list_transform(range(strlen(coalesce(text, ''))),
                                i -> ord(substr(coalesce(text, ''), CAST(i + 1 AS INT), 1))) AS codes
          FROM documents) z
        ORDER BY doc_id""")),

    // ---------------------------------------------------------------- m04
    // "Resize"/downsample plumbing: a fixed-size thumbnail signature from
    // an arbitrary-length payload — every stride-th byte, 32 samples
    // (what an image thumbnailer's sampling grid does per axis). Pure
    // map-side; the digest pins the exact sampled bytes.
    "m04_resize_stub" -> QueryDef(
      build = (s, d) =>
        t(s, d, "documents")
          .withColumn("stride",
            greatest(floor(length(col("text")) / 32), lit(1)).cast("int"))
          .withColumn("thumb", expr(
            "concat_ws('', transform(sequence(0, 31), " +
              "i -> substring(text, i * stride + 1, 1)))"))
          .select(col("doc_id"),
            length(col("thumb")).cast("long").as("n_samples"),
            md5(col("thumb").cast("binary")).as("thumb_sig"))
          .orderBy("doc_id"),
      oracle = Some("""
        SELECT doc_id,
               CAST(strlen(thumb) AS BIGINT) AS n_samples,
               md5(thumb) AS thumb_sig
        FROM (
          SELECT doc_id,
                 array_to_string(list_transform(range(0, 32),
                   i -> substr(text, CAST(i * greatest(strlen(text) // 32, 1)
                                          + 1 AS INT), 1)), '') AS thumb
          FROM documents) z
        ORDER BY doc_id""")),

    // ---------------------------------------------------------------- m03
    // Frame sampling over an opaque payload: every 256th offset yields a
    // 64-byte "frame" (what a video frame-sampler would do per GOP);
    // output frame count + digest of the sampled frames. Map-side only.
    "m03_frame_sample" -> QueryDef(
      build = (s, d) =>
        t(s, d, "documents")
          .withColumn("frames", expr(
            "transform(sequence(0, greatest(cast(floor((length(text)-64)/256) as int), 0))," +
              " i -> substring(text, i*256+1, 64))"))
          .select(col("doc_id"),
            size(col("frames")).cast("long").as("n_frames"),
            md5(concat_ws("", col("frames")).cast("binary")).as("frames_sig"))
          .orderBy("doc_id"),
      oracle = Some("""
        SELECT doc_id,
               CAST(len(frames) AS BIGINT) AS n_frames,
               md5(array_to_string(frames, '')) AS frames_sig
        FROM (
          SELECT doc_id, list_transform(
            generate_series(0, greatest(CAST(floor((length(text)-64)/256) AS INT), 0)),
            i -> substr(text, i*256+1, 64)) AS frames
          FROM documents) z
        ORDER BY doc_id""")),

    // ---------------------------------------------------------------- m08
    "m08_blob_containment" -> QueryDef(
      build = (s, d) => {
        // m05's aligned 64-byte block digests, taken to PAIR level: which
        // payload pairs share enough blocks that one (near-)contains the
        // other — the dedup JOIN a content-addressed blob store runs,
        // where m05 only reports per-doc exposure. Pair generation goes
        // through the inverted block index with the standard stop-block
        // cap (blocks in > 32 payloads are boilerplate — headers,
        // padding — and carry no identity signal; same reasoning as
        // d05's shingle cap), so fan-out is bounded per block and linear
        // overall, never payload-pairs. Containment is exact integer
        // basis points against the SMALLER side; pairs below 50% drop.
        val chunks = t(s, d, "documents")
          .withColumn("ch", expr(
            "transform(sequence(0, greatest(cast(floor((length(text)-1)/64) as int), 0))," +
              " i -> md5(cast(substring(text, i*64+1, 64) AS binary)))"))
          .select(col("doc_id"), explode(array_distinct(col("ch"))).as("h"))
        val per = chunks.groupBy("doc_id").agg(count(lit(1)).as("nc"))
        val rare = chunks.join(
          chunks.groupBy("h").agg(count(lit(1)).as("nd"))
            .filter(col("nd").between(2, 32)), "h")
        val shared = rare.select(col("h"), col("doc_id").as("a"))
          .join(rare.select(col("h"), col("doc_id").as("b")), Seq("h"))
          .filter(col("a") < col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("shared"))
        shared
          .join(per.select(col("doc_id").as("a"), col("nc").as("na")), "a")
          .join(per.select(col("doc_id").as("b"), col("nc").as("nb")), "b")
          .select(col("a"), col("b"), col("shared"),
            expr("shared * 10000 div least(na, nb) AS containment_bp"))
          .filter(col("containment_bp") >= 5000)
          .orderBy("a", "b")
      },
      oracle = Some("""
        WITH ch AS (
          SELECT DISTINCT doc_id,
                 md5(substr(text, CAST(i*64+1 AS INT), 64)) AS h
          FROM documents,
               unnest(range(greatest(CAST(floor((length(text)-1)/64) AS INT), 0)
                 + 1)) AS u(i)),
        per AS (SELECT doc_id, count(*) AS nc FROM ch GROUP BY doc_id),
        rare AS (
          SELECT ch.h, ch.doc_id FROM ch JOIN (
            SELECT h FROM ch GROUP BY h
            HAVING count(*) BETWEEN 2 AND 32) k ON k.h = ch.h),
        sh AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
          FROM rare x JOIN rare y ON x.h = y.h AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
        SELECT s.a, s.b, s.shared,
               s.shared * 10000 // least(pa.nc, pb.nc) AS containment_bp
        FROM sh s JOIN per pa ON pa.doc_id = s.a JOIN per pb ON pb.doc_id = s.b
        WHERE s.shared * 10000 // least(pa.nc, pb.nc) >= 5000
        ORDER BY s.a, s.b""")),

    // ---------------------------------------------------------------- m05
    // Chunk-level payload dedup (fixed-block CDC-lite): split each opaque
    // payload into aligned 64-byte blocks, digest each, and count blocks
    // whose digest recurs in OTHER payloads — the storage-dedup estimate
    // a content-addressed blob store (or a multimodal shard compactor)
    // runs before writing. Physically d13's inverted-index shape on
    // binary blocks: per-doc DISTINCT digests (explode is map-side, the
    // distinct rides the digest-keyed count shuffle), a ≥2-doc rollup,
    // and a join-back — block-linear at any corpus size, never doc-pairs.
    "m05_chunk_dedup" -> QueryDef(
      build = (s, d) => {
        val chunks = t(s, d, "documents")
          .withColumn("ch", expr(
            "transform(sequence(0, greatest(cast(floor((length(text)-1)/64) as int), 0))," +
              " i -> md5(cast(substring(text, i*64+1, 64) AS binary)))"))
          .select(col("doc_id"), explode(array_distinct(col("ch"))).as("h"))
        val shared = chunks.groupBy("h")
          .agg(count(lit(1)).as("nd")).filter(col("nd") >= 2)
        val per = chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
        val shr = chunks.join(shared, "h")
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        per.join(shr, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_chunks"),
            coalesce(col("n_shared"), lit(0L)).as("n_shared"),
            (coalesce(col("n_shared"), lit(0L)) * 2 > col("n_chunks"))
              .as("dup_heavy"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH ch AS (
          SELECT DISTINCT doc_id,
                 md5(substr(text, CAST(i*64+1 AS INT), 64)) AS h
          FROM documents,
               unnest(range(greatest(CAST(floor((length(text)-1)/64) AS INT), 0)
                 + 1)) AS u(i)),
        shared AS (SELECT h FROM ch GROUP BY h HAVING count(*) >= 2),
        per AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY doc_id),
        shr AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared
                FROM ch c JOIN shared USING (h) GROUP BY c.doc_id)
        SELECT p.doc_id, p.n_chunks,
               coalesce(s.n_shared, 0) AS n_shared,
               coalesce(s.n_shared, 0) * 2 > p.n_chunks AS dup_heavy
        FROM per p LEFT JOIN shr s USING (doc_id)
        ORDER BY p.doc_id""")),

    // ---------------------------------------------------------------- m06
    // Payload byte-entropy audit: Shannon entropy (nats) over m02's 8
    // byte classes per payload — the storage-codec decision a blob store
    // makes before writing (low entropy → compress; near-ln(8) entropy →
    // already-compressed/encrypted, store raw). Pure map-side: one
    // class-code pass per payload, 8 filtered counts, and t06's
    // decimal-exact entropy scheme — each c·ln(c) term rounds at 6 dp
    // into DECIMAL(30,6) (exact adds, fixed 8-term order) so H and the
    // compressibility verdict are engine- and rerun-identical. Empty
    // payloads take H = 0 by convention (spec-pinned, never a
    // DIVIDE_BY_ZERO).
    "m06_blob_entropy" -> QueryDef(
      build = (s, d) => {
        val withCodes = t(s, d, "documents")
          .withColumn("n", length(coalesce(col("text"), lit("")))
            .cast("long"))
          // ONE split pass builds the per-char array — the earlier
          // sequence + substring(text, i+1, 1) form rescanned the
          // string's UTF-8 bytes per position (O(len²) per doc, and a
          // 100 TB corpus has long docs). split('') emits a [""] for
          // the empty payload — filtered, preserving the empty-codes
          // convention (ascii('') = 0 would otherwise plant a class-0
          // count).
          .withColumn("codes", expr(
            "transform(filter(split(coalesce(text, ''), ''), c -> c != ''), " +
              "c -> ascii(c) div 32)"))
        val terms = (0 until 8).map { k =>
          val ck = size(filter(col("codes"), c => c === k)).cast("long")
          when(ck > 0, (ck.cast("double") * log(ck.cast("double")))
            .cast("decimal(30,6)"))
            .otherwise(lit(0).cast("decimal(30,6)"))
        }.reduce(_ + _)
        withCodes
          .withColumn("s", terms)
          .withColumn("entropy",
            when(col("n") === 0, lit(0.0))
              .otherwise(round(log(col("n").cast("double")) -
                col("s").cast("double") / col("n"), 4)))
          .select(col("doc_id"), col("n").as("n_bytes"), col("entropy"),
            (col("entropy") < 1.5).as("compressible"))
          .orderBy("doc_id")
      },
      oracle = Some {
        val counts = (0 until 8).map(k =>
          s"len(list_filter(codes, c -> c = $k)) AS c$k").mkString(",\n               ")
        val terms = (0 until 8).map(k =>
          s"CASE WHEN c$k > 0 THEN CAST(round(c$k * ln(c$k), 6) " +
            s"AS DECIMAL(30,6)) ELSE CAST(0 AS DECIMAL(30,6)) END")
          .mkString(" +\n               ")
        s"""
        WITH z AS (
          SELECT doc_id, coalesce(text, '') AS p,
                 CAST(strlen(coalesce(text, '')) AS BIGINT) AS n
          FROM documents),
        c AS (
          SELECT doc_id, n,
                 list_transform(range(strlen(p)),
                   i -> ord(substr(p, CAST(i + 1 AS INT), 1)) // 32) AS codes
          FROM z),
        k AS (
          SELECT doc_id, n,
               $counts
          FROM c),
        t AS (
          SELECT doc_id, n,
               $terms AS s
          FROM k),
        h AS (
          SELECT doc_id, n AS n_bytes,
                 CASE WHEN n = 0 THEN 0.0
                      ELSE round(ln(n) - CAST(s AS DOUBLE) / n, 4)
                 END AS entropy
          FROM t)
        SELECT doc_id, n_bytes, entropy, entropy < 1.5 AS compressible
        FROM h ORDER BY doc_id"""
      }),

    // ---------------------------------------------------------------- m07
    // MAGIC-BYTE format sniffing — the ingest-time router for an opaque
    // binary column: classify each payload by its leading magic bytes
    // (PDF/ZIP/GIF/RIFF/ID3/JSON/markup, else raw text) and report
    // per-format doc count + byte mass. First-match-wins CASE over
    // constant prefixes: pure map-side scan, |formats|-row output at any
    // scale; the sf corpus is word-salad (lands in 'text'), the planted
    // spec exercises every branch incl. the priority order.
    "m07_magic_sniff" -> QueryDef(
      build = (s, d) => {
        val p = coalesce(col("text"), lit(""))
        val fmt = when(p.startsWith("%PDF"), "pdf")
          .when(p.startsWith("PK"), "zip")
          .when(p.startsWith("GIF8"), "gif")
          .when(p.startsWith("RIFF"), "riff")
          .when(p.startsWith("ID3"), "mp3")
          .when(p.startsWith("{"), "json")
          .when(p.startsWith("<"), "markup")
          .otherwise("text")
        t(s, d, "documents")
          .select(fmt.as("format"),
            octet_length(p.cast("binary")).cast("long").as("nb"))
          .groupBy("format")
          .agg(count(lit(1)).as("n_docs"), sum("nb").as("n_bytes"))
          .orderBy("format")
      },
      oracle = Some("""
        WITH f AS (
          SELECT CASE
                   WHEN starts_with(p, '%PDF') THEN 'pdf'
                   WHEN starts_with(p, 'PK')   THEN 'zip'
                   WHEN starts_with(p, 'GIF8') THEN 'gif'
                   WHEN starts_with(p, 'RIFF') THEN 'riff'
                   WHEN starts_with(p, 'ID3')  THEN 'mp3'
                   WHEN starts_with(p, '{')    THEN 'json'
                   WHEN starts_with(p, '<')    THEN 'markup'
                   ELSE 'text' END AS format,
                 CAST(strlen(p) AS BIGINT) AS nb
          FROM (SELECT coalesce(text, '') AS p FROM documents) z)
        SELECT format, count(*) AS n_docs, CAST(sum(nb) AS BIGINT) AS n_bytes
        FROM f GROUP BY format ORDER BY format""")),

    // ---------------------------------------------------------------- m09
    // Per-format payload SIZE profile: the storage-planning sequel to
    // m07's router — median (exact, binary-fraction midpoint of integer
    // byte counts), exact integer-centibyte mean, and max per sniffed
    // format. Decides per-format file sizing / compaction targets before
    // a 100 TB binary-column write. Percentile input is per-format
    // payload sizes (grouped by the ≤8 router classes); counts/extrema
    // ride one hash agg with map-side partials.
    "m09_payload_profile" -> QueryDef(
      build = (s, d) => {
        val p = coalesce(col("text"), lit(""))
        val fmt = when(p.startsWith("%PDF"), "pdf")
          .when(p.startsWith("PK"), "zip")
          .when(p.startsWith("GIF8"), "gif")
          .when(p.startsWith("RIFF"), "riff")
          .when(p.startsWith("ID3"), "mp3")
          .when(p.startsWith("{"), "json")
          .when(p.startsWith("<"), "markup")
          .otherwise("text")
        t(s, d, "documents")
          .select(fmt.as("format"),
            octet_length(p.cast("binary")).cast("long").as("nb"))
          .groupBy("format")
          .agg(count(lit(1)).as("n_docs"),
            sum("nb").as("n_bytes"),
            expr("percentile(nb, 0.5)").as("med_bytes"),
            expr("sum(nb) * 100 div count(1)").as("mean_cbytes"),
            max("nb").as("max_bytes"))
          .orderBy("format")
      },
      oracle = Some("""
        WITH f AS (
          SELECT CASE
                   WHEN starts_with(p, '%PDF') THEN 'pdf'
                   WHEN starts_with(p, 'PK')   THEN 'zip'
                   WHEN starts_with(p, 'GIF8') THEN 'gif'
                   WHEN starts_with(p, 'RIFF') THEN 'riff'
                   WHEN starts_with(p, 'ID3')  THEN 'mp3'
                   WHEN starts_with(p, '{')    THEN 'json'
                   WHEN starts_with(p, '<')    THEN 'markup'
                   ELSE 'text' END AS format,
                 CAST(strlen(p) AS BIGINT) AS nb
          FROM (SELECT coalesce(text, '') AS p FROM documents) z)
        SELECT format, count(*) AS n_docs,
               CAST(sum(nb) AS BIGINT) AS n_bytes,
               quantile_cont(nb, 0.5) AS med_bytes,
               CAST(sum(nb) * 100 // count(*) AS BIGINT) AS mean_cbytes,
               max(nb) AS max_bytes
        FROM f GROUP BY format ORDER BY format""")),

    // ---------------------------------------------------------------- m10
    // Per-FORMAT chunk-dedup profile: m07's magic-byte sniff crossed
    // with m05's 64-byte chunk digests, rolled up per format — "which
    // payload format pays for content-addressed storage" is the
    // planning question behind enabling chunk dedup on a 100 TB blob
    // store. A chunk counts as shared when its digest occurs in ≥2
    // payloads ANYWHERE in the corpus (cross-format sharing counts for
    // both formats — that is what a content-addressed store would
    // deduplicate). The (format, digest) table materializes once
    // (cached, three consumers); sharing is a digest-keyed linear join;
    // savings reported in floor-bp exact integers. ≤|formats| output
    // rows.
    "m10_format_dedup_profile" -> QueryDef(
      build = (s, d) => {
        val p = coalesce(col("text"), lit(""))
        val fmt = when(p.startsWith("%PDF"), "pdf")
          .when(p.startsWith("PK"), "zip")
          .when(p.startsWith("GIF8"), "gif")
          .when(p.startsWith("RIFF"), "riff")
          .when(p.startsWith("ID3"), "mp3")
          .when(p.startsWith("{"), "json")
          .when(p.startsWith("<"), "markup")
          .otherwise("text")
        val ck = fmtChunkCache.register(t(s, d, "documents")
          .withColumn("format", fmt)
          .withColumn("ch", expr(
            "transform(sequence(0, greatest(cast(floor((length(text)-1)/64) as int), 0))," +
              " i -> md5(cast(substring(text, i*64+1, 64) AS binary)))"))
          .select(col("format"),
            explode(array_distinct(col("ch"))).as("h")))
        val shared = ck.groupBy("h")
          .agg(count(lit(1)).as("nd")).filter(col("nd") >= 2).select("h")
        val tot = ck.groupBy("format").agg(count(lit(1)).as("n_chunks"))
        val shr = ck.join(shared, "h")
          .groupBy("format").agg(count(lit(1)).as("n_shared"))
        tot.join(shr, Seq("format"), "left")
          .select(col("format"), col("n_chunks"),
            coalesce(col("n_shared"), lit(0L)).as("n_shared"),
            expr("coalesce(n_shared, 0L) * 10000 div n_chunks")
              .as("dup_bp"))
          .orderBy("format")
      },
      oracle = Some("""
        WITH ch AS (
          SELECT DISTINCT doc_id,
                 CASE
                   WHEN starts_with(coalesce(text, ''), '%PDF') THEN 'pdf'
                   WHEN starts_with(coalesce(text, ''), 'PK')   THEN 'zip'
                   WHEN starts_with(coalesce(text, ''), 'GIF8') THEN 'gif'
                   WHEN starts_with(coalesce(text, ''), 'RIFF') THEN 'riff'
                   WHEN starts_with(coalesce(text, ''), 'ID3')  THEN 'mp3'
                   WHEN starts_with(coalesce(text, ''), '{')    THEN 'json'
                   WHEN starts_with(coalesce(text, ''), '<')    THEN 'markup'
                   ELSE 'text' END AS format,
                 md5(substr(text, CAST(i*64+1 AS INT), 64)) AS h
          FROM documents,
               unnest(range(greatest(CAST(floor((length(text)-1)/64) AS INT), 0)
                 + 1)) AS u(i)),
        shared AS (SELECT h FROM ch GROUP BY h HAVING count(*) >= 2),
        tot AS (SELECT format, count(*) AS n_chunks FROM ch GROUP BY 1),
        shr AS (SELECT format, CAST(count(*) AS BIGINT) AS n_shared
                FROM ch JOIN shared USING (h) GROUP BY 1)
        SELECT t.format, t.n_chunks,
               coalesce(s.n_shared, 0) AS n_shared,
               CAST(coalesce(s.n_shared, 0) * 10000 // t.n_chunks
                 AS BIGINT) AS dup_bp
        FROM tot t LEFT JOIN shr s USING (format)
        ORDER BY t.format"""))
  )
}
