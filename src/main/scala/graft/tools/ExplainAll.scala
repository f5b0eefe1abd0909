package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dump formatted physical plans for plan review:
  * `sbt "runMain graft.tools.ExplainAll q01_pricing_summary q05_region_volume"`
  * (no args = a default review set). Plans print to stdout.
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "explain")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_pricing_summary", "q02_filter_project", "q05_region_volume",
      "q07_window_topn", "s02_skewed_groupby", "d05_ngram_jaccard",
      "a01_ann_bruteforce", "d03_dedup_minhash_lsh")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
