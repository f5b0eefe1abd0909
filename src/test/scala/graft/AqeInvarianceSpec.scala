package graft

/** AQE invariance: results must be BIT-IDENTICAL with adaptive execution
  * disabled. AQE re-plans at runtime — coalescing partitions, switching
  * join strategies, splitting skew — and every gate in this repo runs
  * with it ON, so a result that silently depended on an adaptive
  * decision (e.g. a float aggregation order changed by partition
  * coalescing) would never be caught there. The exact-decimal money
  * sums, integer gates, and rounded-before-ranked scores exist
  * precisely so plan-level nondeterminism cannot reach the output;
  * this spec checks that claim against the whole query surface.
  */
class AqeInvarianceSpec extends SparkSpecBase {

  test("every query returns identical rows with AQE disabled") {
    val conf = spark.conf
    val on = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      name -> run(name).collect().map(_.toString).sorted.toSeq
    }
    graft.operators.HotCache.releaseAll()
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val failures = on.flatMap { case (name, want) =>
        try {
          val got = run(name).collect().map(_.toString).sorted.toSeq
          if (got == want) None
          else Some(s"$name: AQE on/off results differ " +
            s"(${want.size} vs ${got.size} rows)")
        } catch { case e: Throwable =>
          Some(s"$name threw with AQE off: ${e.getMessage}")
        }
      }
      graft.operators.HotCache.releaseAll()
      assert(failures.isEmpty, failures.mkString("\n"))
    } finally conf.set("spark.sql.adaptive.enabled", "true")
  }
}
