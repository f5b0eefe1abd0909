package graft

import org.apache.spark.sql.functions._

/** Pins the `graft.checkpoint.dir` gate (Checkpoints.cut): the reliable-
  * checkpoint cluster profile must produce results identical to the
  * default localCheckpoint path, on an ITERATIVE operator that exercises
  * cut() and cutCounted() every round (connected components), and the
  * observed convergence count must match a plain count().
  */
class CheckpointModeSpec extends SparkSpecBase {

  private def edges = {
    import spark.implicits._
    // two components (1-2-3-4 chain, 10-11) plus a self-loop and a dup
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 10L), (5L, 5L))
      .toDF("a_id", "b_id")
  }

  private def labelsSorted = {
    val (lbl, rounds) = operators.ConnectedComponents.run(edges)
    assert(rounds >= 1)
    lbl.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
  }

  test("reliable-checkpoint mode produces identical CC labels") {
    val local = labelsSorted
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set("graft.checkpoint.dir", dir)
    try {
      val reliable = labelsSorted
      assert(reliable === local)
      // the gate actually engaged: reliable checkpoint wrote files
      assert(spark.sparkContext.getCheckpointDir.nonEmpty)
    } finally {
      spark.conf.unset("graft.checkpoint.dir")
    }
    assert(local === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 10L -> 10L, 11L -> 10L))
  }

  test("cutCounted's observed count equals a plain count") {
    val df = spark.range(0, 1000).select(col("id").as("v"))
      .filter(col("v") % 3 === 0)
    val (out, n) = operators.Checkpoints.cutCounted(df)
    assert(n === 334L)
    assert(out.count() === 334L)
  }
}
