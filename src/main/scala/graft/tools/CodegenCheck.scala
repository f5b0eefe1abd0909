package graft.tools

/** Throwaway §6 codegen sanity probe: run one query with codegen
  * factoryMode=CODEGEN_ONLY and fallback disabled — an interpreted
  * expression in the hot path then throws instead of silently running
  * slow. Not part of the round surface.
  */
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("e33_peak_concurrency")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(8, "codegen-check")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    graft.SparkEntry.queries(key)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(s"CODEGEN_OK $key")
    spark.stop()
  }
}
