package graft

/** Whole-surface codegen sweep: every query must materialize with
  * `spark.sql.codegen.factoryMode=CODEGEN_ONLY` and codegen fallback
  * DISABLED. A custom Expression whose doGenCode breaks (or an operator
  * that silently drops to the interpreted path) fails here instead of
  * shipping as a 10× slower hot loop — Spark's default silently falls
  * back, so only this configuration makes the regression loud. This is
  * the load-bearing check behind the "keep the hot path inside
  * whole-stage codegen" design rule; the native expressions
  * (graft_dot, n-gram hashing, MinHash, SimHash, winnowing) all sit in
  * scan-stage loops where interpreted evaluation would dominate a
  * 100 TB run's cpu.
  */
class CodegenSweepSpec extends SparkSpecBase {

  test("every query materializes under CODEGEN_ONLY with fallback off") {
    val conf = spark.conf
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      val failures = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        try { run(name).write.format("noop").mode("overwrite").save(); None }
        catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
        }
      }
      graft.operators.HotCache.releaseAll()
      assert(failures.isEmpty,
        s"${failures.size} queries failed under CODEGEN_ONLY:\n" +
          failures.mkString("\n"))
    } finally {
      conf.unset("spark.sql.codegen.factoryMode")
      conf.unset("spark.sql.codegen.fallback")
    }
  }
}
