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
    "m02_feature_extract" -> QueryDef(
      build = (s, d) => {
        val src = t(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
        val outSchema = StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("features", ArrayType(DoubleType, containsNull = false),
            nullable = false)))
        val enc = org.apache.spark.sql.Encoders.row(outSchema)
        src.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            Row(id, fakeDecode(bytes).toSeq)
          }
        }(enc).orderBy("doc_id")
      }),

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
        ORDER BY doc_id"""))
  )
}
