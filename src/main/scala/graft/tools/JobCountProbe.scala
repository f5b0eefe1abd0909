package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.GraftCoreShim
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Counts the Spark JOBS one query launches end-to-end (plan-build
  * probes + checkpoint fills + the final noop save) — the evidence
  * artifact for driver-loop changes that remove whole jobs rather than
  * plan nodes (e.g. r12's observed convergence counts in
  * ConnectedComponents: the count no longer rides a separate job per
  * star round). Usage:
  *   sbt "runMain graft.tools.JobCountProbe [key] [sfDir]"
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("g03_components")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(8, "jobcount-probe")
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    graft.Tables.all.foreach(n =>
      graft.Tables(spark, sfDir, n).limit(1).collect())
    GraftCoreShim.drainListenerBus(spark.sparkContext)
    val before = jobs.get
    graft.SparkEntry.queries(key)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    GraftCoreShim.drainListenerBus(spark.sparkContext)
    println(s"JOBCOUNT $key ${jobs.get - before}")
    graft.operators.HotCache.releaseAll()
    spark.stop()
  }
}
