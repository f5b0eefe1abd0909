package graft.streaming

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
