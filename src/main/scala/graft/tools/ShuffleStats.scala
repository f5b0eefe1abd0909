package graft.tools

import graft.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Measures what the reference attacks with a shuffle-service daemon —
  * shuffle traffic — and shows the plan-side answer. Runs the reference's
  * synthetic workload (synthetic_workload.py:29-35) two ways over the same
  * generated data and reports bytes that crossed the shuffle:
  *
  *   1. RDD groupByKey (the reference's formulation): every payload byte
  *      shuffles.
  *   2. Declarative groupBy(count): partial aggregation — only per-key
  *      counters shuffle.
  *
  * `sbt "runMain graft.tools.ShuffleStats [partitions] [size]"`
  */
object ShuffleStats {
  def main(args: Array[String]): Unit = {
    val partitions = if (args.length > 0) args(0).toInt else 100
    val size = if (args.length > 1) args(1).toDouble else 0.02
    val n = (10000000L * size).toLong
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "shuffle-stats")
    import spark.implicits._

    val written = new AtomicLong(); val read = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })

    def measure(label: String)(work: => Unit): Unit = {
      written.set(0); read.set(0)
      val t0 = System.nanoTime()
      work
      Thread.sleep(500) // let straggler task-end events drain
      val secs = (System.nanoTime() - t0) / 1e9 - 0.5
      println(f"$label%-28s ${secs}%6.2f s   shuffle write ${written.get / 1e6}%10.2f MB   read ${read.get / 1e6}%10.2f MB")
    }

    val payload = rpad(hex(xxhash64(col("id"))), 100, "x")
    val keyed = spark.range(1 + partitions, n + 1 + partitions, 1, partitions)
      .select((col("id") % partitions).as("key"), payload.as("payload"))

    measure("rdd groupByKey (reference)") {
      keyed.rdd.map(r => (r.getLong(0), r.getString(1)))
        .groupByKey()
        .mapValues(_.size)
        .collect()
    }
    measure("declarative groupBy(count)") {
      keyed.groupBy("key").agg(count(lit(1)).as("cnt")).collect()
    }
    spark.stop()
  }
}
