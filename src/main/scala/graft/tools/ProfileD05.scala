package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** Scratch profiler for the d05 inverted-index join stages. */
object ProfileD05 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "profile-d05")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s   rows=$n")
    }
    val sets = Tables(spark, d, "documents")
      .select(col("doc_id"), col("lang"),
        array_distinct(transform(
          TextFns.shingles(TextFns.tokens(col("text")), 3),
          sh => xxhash64(sh))).as("sh"))
      .withColumn("sz", size(col("sh")))
    val inv = sets.select(col("doc_id"), col("lang"), explode(col("sh")).as("h"))
      .repartition(col("h"), col("lang"))
    time("sets scan+shingle")(sets.count())
    time("inv explode+shuffle")(inv.count())
    val joined = inv.alias("x").join(inv.alias("y"),
      col("x.h") === col("y.h") && col("x.lang") === col("y.lang") &&
        col("x.doc_id") < col("y.doc_id"))
    time("self-join pairs")(joined.count())
    val grouped = joined.groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    time("join+groupBy")(grouped.count())
    spark.stop()
  }
}
