package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All operator families, merged. Later files add their `defs`. */
  def allDefs: Seq[(String, QueryDef)] =
    operators.Relational.defs ++
    operators.ShuffleWorkloads.defs ++
    operators.EventsOps.defs ++
    operators.TemporalJoins.defs ++
    operators.Dedup.defs ++
    operators.Similarity.defs ++
    operators.TextAnalysis.defs ++
    operators.PipelineOps.defs ++
    operators.Multimodal.defs ++
    operators.TrainingPipeline.defs ++
    operators.GraphOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * p06 exercises the engine end-to-end: text analysis, shingle joins,
    * dedup, deterministic sampling — one declarative prep job.
    * (TrainingPipelineSpec pins non-empty output at this SF.)
    */
  def entry(spark: SparkSession): DataFrame =
    queries("p06_prep_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (name, qd) => name -> qd.build }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (name, QueryDef(_, Some(sql))) =>
      name -> sql.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")
    }.toMap
}
