package graft.streaming

import org.apache.hadoop.fs.Path
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
  *   4. SNAPSHOT RETENTION: after a successful write, snapshots older
  *      than the new snapshot's predecessor are deleted (keep 2). The
  *      predecessor must survive so a checkpoint-replayed batch can
  *      still re-read its original input state; anything older is
  *      unreachable by any replay and would otherwise accumulate one
  *      full-table copy per micro-batch forever.
  *
  * All directory listing goes through the Hadoop FileSystem API, so the
  * target may live on any Hadoop-supported filesystem (local, HDFS,
  * object stores), and only directories matching `snap_<digits>` are
  * considered — a stray dir under the target can never crash the sink.
  *
  * At scale this is the Delta/Iceberg copy-on-write pattern without the
  * table format: the per-batch cost is one |snapshot|+|batch| merge and
  * a snapshot rewrite. For a 100 TB target use [[applyBatchPartitioned]]:
  * the snapshot is hash-partitioned on a stable key prefix
  * (`pk = pmod(k, nBuckets)`), each batch merges and rewrites ONLY the
  * partitions it touches, and the current state of a partition is its
  * newest containing snapshot — per-batch write cost becomes
  * |touched partitions|, not |table|.
  */
object CdcApply {

  private val SnapPrefix = "snap_"
  private val SnapRe = "^snap_(\\d+)$".r

  private def hfs(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Snapshot ids present under `dir`, descending. Only names matching
    * `snap_<digits>` count — `.toLong` on an arbitrary suffix threw
    * NumberFormatException into the foreachBatch sink (r10 ADVICE).
    */
  private def snapIds(s: SparkSession, dir: Path): Seq[Long] = {
    val fs = hfs(s, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .flatMap(f => f.getPath.getName match {
        case SnapRe(id) => Some(id.toLong)
        case _ => None
      })
      .sorted(Ordering[Long].reverse)
  }

  private def emptyState(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", LongType),
        StructField("p", DoubleType))))
  }

  /** The snapshot a given batch must read: the newest one it did NOT
    * write itself (ids strictly below batchId) — a replayed batch thus
    * re-reads its original input state, never its own partial output.
    */
  private def baseSnapshot(s: SparkSession, targetDir: String,
                           batchId: Long): DataFrame =
    snapIds(s, new Path(targetDir)).find(_ < batchId) match {
      case Some(id) => s.read.parquet(s"$targetDir/$SnapPrefix$id")
      case None => emptyState(s)
    }

  /** Current table state (newest snapshot), empty-schema if none. */
  def current(s: SparkSession, targetDir: String): DataFrame =
    baseSnapshot(s, targetDir, Long.MaxValue)

  /** In-batch last-writer-wins: argmax by (seq, delete-flag) — a
    * same-seq delete deterministically beats its update (producers
    * should never emit seq ties; if one slips through, dropping is the
    * safe side).
    */
  private def lastWriterWins(batch: DataFrame): DataFrame = batch
    .groupBy(col("k"))
    .agg(max_by(struct(col("p"), col("op")),
      struct(col("seq"),
        when(col("op") === "D", 1L).otherwise(0L))).as("c"))
    .select(col("k"), col("c.p").as("dp"), col("c.op").as("op"))

  private def merge(base: DataFrame, latest: DataFrame): DataFrame =
    base.select(col("k"), col("p").as("bp"))
      .join(latest, Seq("k"), "full_outer")
      .filter(coalesce(col("op"), lit("U")) =!= "D")
      .select(col("k"), coalesce(col("dp"), col("bp")).as("p"))

  /** Delete snapshots no replay can ever read again: after `batchId`
    * commits, recovery can replay at most `batchId` itself, which reads
    * the newest id strictly below it — keep that predecessor and the new
    * snapshot, drop everything older (bounded storage at any cadence).
    */
  private def gcSnapshots(s: SparkSession, targetDir: String,
                          batchId: Long): Unit = {
    val dir = new Path(targetDir)
    val fs = hfs(s, dir)
    val ids = snapIds(s, dir)
    // delete ONLY ids strictly below the predecessor — never the batch
    // itself, its replay base, or anything NEWER than the batch (a stale
    // replay must not roll back state a later batch already committed)
    ids.filter(_ < batchId).headOption.foreach { pred =>
      ids.filter(_ < pred).foreach { id =>
        fs.delete(new Path(dir, s"$SnapPrefix$id"), true)
      }
    }
  }

  /** One micro-batch MERGE — exposed so the idempotency spec can replay
    * a batch exactly as checkpoint recovery would.
    */
  def applyBatch(batch: DataFrame, targetDir: String, batchId: Long): Unit = {
    val s = batch.sparkSession
    val merged = merge(baseSnapshot(s, targetDir, batchId),
      lastWriterWins(batch))
    merged.write.mode("overwrite")
      .parquet(s"$targetDir/$SnapPrefix$batchId")
    gcSnapshots(s, targetDir, batchId)
  }

  // ------------------------------------------------------------------
  // Partitioned copy-on-write: rewrite only the partitions a batch
  // touches. Layout: target/snap_<batchId>/pk=<p>/… (one partitionBy
  // write per batch); the current state of partition p is its NEWEST
  // containing snapshot, so untouched partitions stay where they are —
  // no data is ever copied forward. Idempotency is per-partition by the
  // same argument as the flat layout: a replayed batch touches the same
  // partitions (pk is a pure function of the batch keys), re-reads each
  // one's newest version strictly below its own id, and overwrites only
  // its own snap dir. GC keeps, per partition, the newest version and
  // the newest one strictly below the just-committed batch.
  // ------------------------------------------------------------------

  /** Does the dir hold at least one parquet data file? A pk dir that
    * exists but is EMPTY is a real state — "this batch deleted the
    * partition's last row" — written as a marker dir because
    * `partitionBy` emits nothing for a rowless partition and the stale
    * previous version would otherwise stay newest and resurrect the
    * deleted rows. Marker dirs version the partition; only dirs with
    * data are ever handed to the parquet reader.
    */
  private def hasData(fs: org.apache.hadoop.fs.FileSystem,
                      p: Path): Boolean =
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  /** Newest snapshot dir containing partition `pk` (marker dirs count)
    * with id strictly below `batchId`, if any.
    */
  private def partBase(s: SparkSession, targetDir: String, pk: Long,
                       batchId: Long): Option[String] = {
    val fs = hfs(s, new Path(targetDir))
    snapIds(s, new Path(targetDir))
      .filter(_ < batchId)
      .find(id => fs.exists(
        new Path(s"$targetDir/$SnapPrefix$id/pk=$pk")))
      .map(id => s"$targetDir/$SnapPrefix$id/pk=$pk")
  }

  /** All partition values present in any snapshot under `targetDir`. */
  private def allPks(s: SparkSession, targetDir: String): Seq[Long] = {
    val fs = hfs(s, new Path(targetDir))
    snapIds(s, new Path(targetDir)).flatMap { id =>
      fs.listStatus(new Path(s"$targetDir/$SnapPrefix$id")).toSeq
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(_.startsWith("pk="))
        .map(_.stripPrefix("pk=").toLong)
    }.distinct
  }

  /** Current state of the partitioned layout: per partition, its newest
    * snapshot (pk is recomputed from k, so leaf dirs are read raw).
    */
  def currentPartitioned(s: SparkSession, targetDir: String): DataFrame = {
    val fs = hfs(s, new Path(targetDir))
    val dirs = allPks(s, targetDir)
      .flatMap(pk => partBase(s, targetDir, pk, Long.MaxValue))
      .filter(d => hasData(fs, new Path(d))) // marker dir = empty partition
    if (dirs.isEmpty) emptyState(s)
    else s.read.parquet(dirs: _*)
  }

  /** One micro-batch MERGE into the partitioned layout: only partitions
    * with a change row are merged and rewritten. `nBuckets` must stay
    * constant for the life of the target (it defines the key prefix).
    */
  def applyBatchPartitioned(batch: DataFrame, targetDir: String,
                            batchId: Long, nBuckets: Int = 16): Unit = {
    val s = batch.sparkSession
    val latest = lastWriterWins(batch)
      .withColumn("pk", pmod(col("k"), lit(nBuckets.toLong)))
    // touched partition list is ≤ nBuckets rows — driver-side by design
    val touched = latest.select("pk").distinct()
      .collect().map(_.getLong(0)).sorted
    if (touched.isEmpty) return // empty batch: every partition untouched
    val fs = hfs(s, new Path(targetDir))
    val baseDirs = touched.flatMap(pk => partBase(s, targetDir, pk, batchId))
      .filter(d => hasData(fs, new Path(d))) // marker dirs read as empty
    val base =
      if (baseDirs.isEmpty) emptyState(s)
      else s.read.parquet(baseDirs.toIndexedSeq: _*)
    val merged = merge(base, latest.drop("pk"))
      .withColumn("pk", pmod(col("k"), lit(nBuckets.toLong)))
    merged.write.mode("overwrite").partitionBy("pk")
      .parquet(s"$targetDir/$SnapPrefix$batchId")
    // a touched partition whose merge output is EMPTY (batch deleted its
    // last row) gets a marker dir so this snapshot still versions it
    touched.foreach { pk =>
      val p = new Path(s"$targetDir/$SnapPrefix$batchId/pk=$pk")
      if (!fs.exists(p)) fs.mkdirs(p)
    }
    // per-partition GC: keep each partition's newest version and its
    // newest version strictly below this batch (the replay target);
    // drop older copies, then remove snapshot dirs left empty
    val ids = snapIds(s, new Path(targetDir))
    allPks(s, targetDir).foreach { pk =>
      val versions = ids.filter(id =>
        fs.exists(new Path(s"$targetDir/$SnapPrefix$id/pk=$pk")))
      // same safety rule as the flat layout: only versions strictly
      // below the partition's replay base are unreachable
      versions.filter(_ < batchId).headOption.foreach { pred =>
        versions.filter(_ < pred).foreach { id =>
          fs.delete(new Path(s"$targetDir/$SnapPrefix$id/pk=$pk"), true)
        }
      }
    }
    ids.foreach { id =>
      val p = new Path(s"$targetDir/$SnapPrefix$id")
      val stillVersionsSomePk = fs.exists(p) && fs.listStatus(p).exists(st =>
        st.isDirectory && st.getPath.getName.startsWith("pk="))
      if (fs.exists(p) && !stillVersionsSomePk) fs.delete(p, true)
    }
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

  /** Streaming entry for the partitioned layout. */
  def partitioned(changes: DataFrame, targetDir: String,
                  checkpoint: String, nBuckets: Int = 16): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatchPartitioned(batch, targetDir, batchId, nBuckets)
      }
      .start()
}
