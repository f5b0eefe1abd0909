package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** §2.C — streaming CDC APPLY: q53's MERGE shape as the sink of a
  * Structured Streaming pipeline (reference: the relational MERGE surface
  * composed with the streaming runtime; see q53_merge_upsert in
  * operators/Relational.scala for the batch twin).
  *
  * Each micro-batch of change rows (key, payload, seq, op ∈ {U, D}) is
  * MERGEd into a parquet target via foreachBatch:
  *
  *   1. LAST-WRITER-WINS inside the batch: one aggregate argmax by
  *      (seq, op) picks each key's final change — the shuffle carries
  *      |keys in batch| rows (q59's aggregate-argmax, never a window).
  *   2. FULL OUTER JOIN against the current snapshot (q53's shape):
  *      'U' upserts the payload, 'D' drops the row, untouched keys pass
  *      through.
  *   3. COPY-ON-WRITE snapshot versioned BY BATCH ID: the merged state
  *      lands in `target/snap_<batchId>`, never mutating the snapshot it
  *      read. That makes recovery IDEMPOTENT by construction — Spark
  *      replays the last uncommitted batch after a crash, the replay
  *      reads the same predecessor snapshot (largest id < batchId) and
  *      overwrites only its own directory, so applying a batch twice is
  *      bit-identical to applying it once (pinned in StreamingSpec).
  *
  * At scale this is the Delta/Iceberg copy-on-write pattern without the
  * table format: the per-batch cost is one |snapshot|+|batch| merge and
  * a full snapshot rewrite. For a 100 TB target the rewrite amortizes by
  * partitioning the snapshot on a stable key prefix and rewriting only
  * partitions the batch touches — the merge plan is unchanged, only the
  * write's `partitionBy`/`replaceWhere` scope narrows.
  */
object CdcApply {

  private val SnapPrefix = "snap_"

  /** Snapshot ids present under `targetDir`, descending. */
  private def snapIds(s: SparkSession, targetDir: String): Seq[Long] = {
    val dir = new java.io.File(targetDir)
    if (!dir.isDirectory) Seq.empty
    else dir.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith(SnapPrefix))
      .map(_.getName.stripPrefix(SnapPrefix).toLong)
      .sorted(Ordering[Long].reverse)
  }

  /** The snapshot a given batch must read: the newest one it did NOT
    * write itself (ids strictly below batchId) — a replayed batch thus
    * re-reads its original input state, never its own partial output.
    */
  private def baseSnapshot(s: SparkSession, targetDir: String,
                           batchId: Long): DataFrame =
    snapIds(s, targetDir).find(_ < batchId) match {
      case Some(id) => s.read.parquet(s"$targetDir/$SnapPrefix$id")
      case None =>
        import org.apache.spark.sql.types._
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("k", LongType),
            StructField("p", DoubleType))))
    }

  /** Current table state (newest snapshot), empty-schema if none. */
  def current(s: SparkSession, targetDir: String): DataFrame =
    baseSnapshot(s, targetDir, Long.MaxValue)

  /** One micro-batch MERGE — exposed so the idempotency spec can replay
    * a batch exactly as checkpoint recovery would.
    */
  def applyBatch(batch: DataFrame, targetDir: String, batchId: Long): Unit = {
    val s = batch.sparkSession
    // last write per key wins: argmax by (seq, delete-flag) — a same-seq
    // delete deterministically beats its update (producers should never
    // emit seq ties; if one slips through, dropping is the safe side)
    val latest = batch
      .groupBy(col("k"))
      .agg(max_by(struct(col("p"), col("op")),
        struct(col("seq"),
          when(col("op") === "D", 1L).otherwise(0L))).as("c"))
      .select(col("k"), col("c.p").as("dp"), col("c.op").as("op"))
    val base = baseSnapshot(s, targetDir, batchId)
      .select(col("k"), col("p").as("bp"))
    val merged = base.join(latest, Seq("k"), "full_outer")
      .filter(coalesce(col("op"), lit("U")) =!= "D")
      .select(col("k"), coalesce(col("dp"), col("bp")).as("p"))
    merged.write.mode("overwrite")
      .parquet(s"$targetDir/$SnapPrefix$batchId")
  }

  /** The streaming entry: changes → idempotent parquet MERGE sink. */
  def apply(changes: DataFrame, targetDir: String,
            checkpoint: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, targetDir, batchId)
      }
      .start()
}
