package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable

/** Throwaway diagnosis harness for the e33 cpu anomaly: runs one query
  * from SparkEntry with a per-stage listener and prints stage-level task
  * counts / cpu / run so the hot stage is identifiable. Not part of the
  * round surface.
  */
object E33Probe {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("e33_peak_concurrency")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "e33probe")
    spark.sparkContext.setLogLevel("WARN")
    final case class St(name: String) {
      var tasks = 0; val cpu = new AtomicLong; val run = new AtomicLong
    }
    val stages = mutable.LinkedHashMap.empty[Int, St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stages.synchronized {
          stages(e.stageInfo.stageId) = St(e.stageInfo.name.take(80))
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        stages.synchronized {
          stages.get(t.stageId).foreach { s =>
            s.tasks += 1
            if (t.taskMetrics != null) {
              s.cpu.addAndGet(t.taskMetrics.executorCpuTime / 1000000)
              s.run.addAndGet(t.taskMetrics.executorRunTime)
            }
          }
        }
    })
    graft.Tables.all.foreach(n =>
      graft.Tables(spark, sfDir, n).limit(1).collect())
    // two cold-cache runs: the second run's stages are JIT-warm, so its
    // per-stage cpu is the steady-state attribution (run 1 carries the
    // one-time codegen/JIT cost)
    val runsN = sys.env.get("SPARK_GRAFT_PROBE_RUNS").map(_.toInt).getOrElse(2)
    for (i <- 1 to runsN) {
      stages.synchronized(stages.clear())
      val df = graft.SparkEntry.queries(key)(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.operators.HotCache.releaseAll()
      org.apache.spark.GraftCoreShim.drainListenerBus(spark.sparkContext)
      println(f"RUN $i WALL $wall%.2f s")
      stages.toSeq.sortBy(-_._2.cpu.get).take(8).foreach { case (id, s) =>
        println(f"stage $id%4d tasks=${s.tasks}%4d cpu=${s.cpu.get / 1000.0}%8.2fs run=${s.run.get / 1000.0}%8.2fs  ${s.name}")
      }
    }
    spark.stop()
  }
}
