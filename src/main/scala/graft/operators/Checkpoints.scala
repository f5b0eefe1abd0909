package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Lineage truncation for the iterative operators (guide §5).
  *
  * Default path: `localCheckpoint()` — executor-local blocks, the
  * cheapest way to cut an iterative plan, and exactly right for the
  * single-JVM bench contract (losing the executor IS losing the job).
  * On a real cluster, executor-local checkpoint blocks die with their
  * executor and a lost node kills an hours-long iterative job at round
  * k with nothing recoverable. Setting `graft.checkpoint.dir` (spark
  * conf or --conf) switches EVERY truncation point to RELIABLE
  * `checkpoint()` into that directory (HDFS/object store): same eager
  * materialization, same plan truncation, fault-tolerant blocks.
  * Results are identical on both paths — pinned by CheckpointModeSpec.
  */
object Checkpoints {

  /** Cut lineage here: localCheckpoint, or reliable checkpoint when
    * `graft.checkpoint.dir` is set.
    */
  def cut(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption("graft.checkpoint.dir").filter(_.nonEmpty) match {
      case Some(dir) =>
        if (s.sparkContext.getCheckpointDir.isEmpty)
          s.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }

  /** cut + the row count OBSERVED off the same materializing job
    * (`Dataset.observe`): the iterative convergence probes previously
    * paid one extra count() job per round on top of the checkpoint
    * fill — a full pass over the cached partitions plus a scheduler
    * round-trip, per round, per operator. The checkpoint is an eager
    * action, so the observation is complete by the time this returns.
    */
  def cutCounted(df: DataFrame): (DataFrame, Long) = {
    val obs = Observation()
    val out = cut(df.observe(obs, count(lit(1)).as("n")))
    (out, obs.get("n").asInstanceOf[Long])
  }

  /** `.cut()` / `.cutCounted()` postfix syntax so call sites keep the
    * chained `.localCheckpoint()` shape they had.
    */
  implicit class CutSyntax(private val df: DataFrame) extends AnyVal {
    def cut(): DataFrame = Checkpoints.cut(df)
    def cutCounted(): (DataFrame, Long) = Checkpoints.cutCounted(df)
  }
}
