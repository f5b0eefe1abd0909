package graft

/** Mechanical plan-shape tripwires: the scale claims made in operator
  * scaladocs ("pure map-side", "broadcast the small side", "filter
  * reaches the scan") asserted against the actual physical plan, so a
  * refactor that silently regresses a plan fails CI instead of only
  * showing up as benchmark noise. String-level checks on the executed
  * plan are deliberate — they survive Spark-internal class renames
  * better than node-type matching.
  */
class PlanShapeSpec extends SparkSpecBase {

  private def plan(name: String): String =
    run(name).queryExecution.executedPlan.toString

  private def countOf(p: String, token: String): Int =
    p.sliding(token.length).count(_ == token)

  test("p03 domain mix is map-side: the only exchange is the final sort") {
    val p = plan("p03_domain_mix")
    assert(countOf(p, "Exchange") == 1, p)
    assert(p.contains("rangepartitioning"), p) // and it IS the sort
  }

  test("x01 hash sample keeps its filter at the scan, no join/agg") {
    val p = plan("x01_hash_sample")
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p)
  }

  test("q02 filter + projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    // pruned scan: the read schema must not include unused wide columns
    assert(!p.contains("l_comment"), p)
  }

  test("q05 joins the small dims by broadcast, not shuffle") {
    val p = plan("q05_region_volume")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("p02/x02 two-pass schemes broadcast the tiny counts table") {
    Seq("p02_seq_pack", "x02_stratified_sample").foreach { n =>
      val p = plan(n)
      assert(p.contains("BroadcastHashJoin"), s"$n:\n$p")
    }
  }

  test("q01 aggregate is partial before the shuffle (map-side combine)") {
    val p = plan("q01_pricing_summary")
    // partial aggregation appears below the exchange: two HashAggregate
    // levels around one shuffle
    assert(countOf(p, "HashAggregate") >= 2, p)
  }

  test("d09 shingles only candidate docs: the semi-join prune is in the plan") {
    val p = plan("d09_crossmodal_dedup")
    assert(p.contains("LeftSemi"), p) // documents pruned to candidate ids
  }

  test("d03 minhash runs as a native catalyst expression, not a UDF") {
    // (WholeStageCodegen wrappers only materialize per-stage at execution
    // under AQE, so the pre-execution plan can't be checked for them)
    val p = plan("d03_dedup_minhash_lsh")
    assert(p.contains("minhash_sig("), p)
    assert(!p.contains("ScalaUDF"), p)
  }
}
