package graft.tools

import org.apache.spark.sql.functions._

/** One-off companion to ScaleProbe: candidate-pair volumes per probe
  * dir, the denominator for reading d09's wall time (verify work scales
  * with candidate pairs, not the corpus). Usage:
  * `sbt "runMain graft.tools.ProbeCounts /tmp/graft-probe-50000 ..."`.
  */
object ProbeCounts {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.local(cpus.toInt, "probe-counts")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    for (dir <- args) {
      val cand = graft.SparkEntry.queries("d06b_dedup_embedding_lsh")(spark, dir)
      val nPairs = cand.count()
      val nDocs = cand.select(explode(array(col("a_id"), col("b_id"))))
        .distinct().count()
      val nOut = graft.SparkEntry.queries("d09_crossmodal_dedup")(spark, dir)
        .count()
      // d10 incremental dedup: wall time must track ONE base scan (the
      // broadcast-only plan), growing linearly with the corpus
      val (d10n, tD10) = time(
        graft.SparkEntry.queries("d10_incremental_dedup")(spark, dir).count())
      graft.operators.HotCache.releaseAll()
      println(s"$dir cand_pairs=$nPairs cand_docs=$nDocs d09_out=$nOut " +
        f"d10_rows=$d10n d10_s=$tD10%.2f")
    }
    spark.stop()
  }
}
