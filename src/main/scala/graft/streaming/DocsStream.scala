package graft.streaming

import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming document-pipeline transforms — the streaming twins of the
  * batch training-prep operators (TrainingPipeline.scala), for corpora
  * that arrive continuously rather than as a snapshot.
  */
object DocsStream {

  /** Distinct md5 8-gram shingle hashes of a STATIC benchmark corpus —
    * the build side for [[decontaminateStream]]; compute once, reuse
    * across the stream's lifetime.
    */
  def benchShingles(bench: DataFrame): DataFrame =
    bench
      .select(TextFns.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 8)
      .select(explode(TextFns.shingles(col("tk"), 8)).as("g"))
      .select(md5(col("g")).as("h"))
      .distinct()

  /** Streaming decontamination flagger — the streaming twin of batch
    * p01_decontaminate. The docs stream (doc_id, ts, text) explodes to
    * (doc_id, shingle-hash) map-side and equi-joins the static benchmark
    * hash set (stream-static joins keep NO stream-side state);
    * dropDuplicatesWithinWatermark then collapses multi-shingle hits to
    * one flag per doc with state bounded by the watermark horizon.
    * Emits (doc_id, ts) of contaminated docs.
    */
  def decontaminateStream(docs: DataFrame, benchHashes: DataFrame,
                          watermark: String = "2 hours"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"), TextFns.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 8)
      .select(col("doc_id"), col("ts"),
        explode(TextFns.shingles(col("tk"), 8)).as("g"))
      .select(col("doc_id"), col("ts"), md5(col("g")).as("h"))
      .join(benchHashes, "h")
      .dropDuplicatesWithinWatermark(Seq("doc_id"))
      .select("doc_id", "ts")

  /** A near-dup candidate: `docId` arrived after `dupOf` and their
    * SimHash signatures differ by `hamming` ≤ the threshold.
    */
  final case class NearDup(docId: Long, dupOf: Long, hamming: Int)

  /** Streaming NEAR-dup detection — the streaming twin of batch
    * d04_dedup_simhash, for corpora that arrive continuously. Each doc
    * computes its 64-bit SimHash map-side (the native expression) and
    * explodes to 4 pigeonhole chunk buckets (d04's blocking: hamming ≤ 3
    * GUARANTEES a shared chunk; looser pairs are found iff they share
    * one). Per-bucket flatMapGroupsWithState keeps the last `bucketCap`
    * (doc_id, sig) pairs — TOTAL state is bounded by construction at
    * 4·2¹⁶ buckets × cap entries regardless of stream length, and a hub
    * bucket (boilerplate chunk) degrades to "matches the cap most
    * recent" rather than growing without bound (the d10/g05 cap
    * reasoning). Each arriving doc emits a [[NearDup]] per in-bucket
    * state entry within `maxHamming`; a pair sharing several chunks
    * emits once per shared bucket — dedupe downstream on (docId, dupOf)
    * exactly as batch d04 ends in distinct() (the spec does; a
    * production sink would dropDuplicatesWithinWatermark).
    */
  def nearDupStream(docs: DataFrame, maxHamming: Int = 8,
                    bucketCap: Int = 64): Dataset[NearDup] = {
    import org.apache.spark.sql.GraftShim
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = docs.select(col("doc_id"),
      GraftShim.column(graft.plans.SimHashExpr(
        GraftShim.expression(TextFns.tokens(col("text"))))).as("sim"))
    val chunkStructs = (0 until 4).map(c =>
      struct(lit(c).as("chunk"),
        shiftright(col("sim"), c * 16).bitwiseAND(0xFFFFL).as("chv")))
    sigs
      // a NULL text yields a NULL signature; decoding null into a
      // primitive Long would fail the streaming query at runtime.
      // Batch d04 drops such docs implicitly (a null signature never
      // joins) — the stream skips them explicitly (r10 ADVICE).
      .filter(col("sim").isNotNull)
      .select(col("doc_id"), col("sim"),
        explode(array(chunkStructs: _*)).as("cd"))
      .select((col("cd.chunk") * 65536L + col("cd.chv")).as("bucket"),
        col("doc_id"), col("sim"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Long)], NearDup](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[NearDup]
          // doc_id order inside the batch: deterministic emission, and
          // the earlier id is always the dupOf side (matching d04's
          // a_id < b_id orientation for same-batch pairs)
          rows.toSeq.sortBy(_._2).foreach { case (_, id, sim) =>
            seen.foreach { case (oid, osim) =>
              if (oid != id) {
                val h = java.lang.Long.bitCount(osim ^ sim)
                if (h <= maxHamming) out += NearDup(id, oid, h)
              }
            }
            if (!seen.exists(_._1 == id))
              seen = ((id, sim) :: seen).take(bucketCap)
          }
          state.update(seen)
          out.iterator
      }
  }
}
