package graft

import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpecBase {

  test("custom TopKPerGroup matches the window row_number formulation exactly") {
    val o = Tables(spark, sf, "orders")
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
    val custom = TopK.perGroup(o, Seq("o_orderpriority"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
      .orderBy(asc("o_orderpriority"), desc("o_totalprice"), asc("o_orderkey"))
      .collect()
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val reference = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy(asc("o_orderpriority"), desc("o_totalprice"), asc("o_orderkey"))
      .collect()
    assert(custom.length == reference.length)
    assert(custom.sameElements(reference))
  }

  test("plan shows partial topk below the exchange, final above") {
    val o = Tables(spark, sf, "orders")
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
    val plan = TopK.perGroup(o, Seq("o_orderpriority"),
      Seq("o_totalprice" -> false), 3).queryExecution.executedPlan.toString
    assert("TopKPerGroup \\[".r.findAllIn(plan).length == 2)
    assert(plan.contains("Exchange hashpartitioning(o_orderpriority"))
  }
}
