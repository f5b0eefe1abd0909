package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpecBase {

  test("q01 groups equal distinct (returnflag, linestatus) pairs and counts add up") {
    val q1 = run("q01_pricing_summary").collect()
    val li = Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
    val expectGroups = li.select("l_returnflag", "l_linestatus").distinct().count()
    assert(q1.length == expectGroups)
    assert(q1.map(_.getAs[Long]("count_order")).sum == li.count())
  }

  test("q02 output respects its own filter") {
    val rows = run("q02_filter_project").collect()
    assert(rows.nonEmpty)
    // projection drops p_size/p_type, so re-check via source
    val p = Tables(spark, sf, "part")
    val expected = p.filter(col("p_size") > 25 && col("p_type") === "PROMO").count()
    assert(rows.length == expected)
  }

  test("q03 returns at most 10 rows sorted by rev desc") {
    val rows = run("q03_top_orders").collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("rev"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q05 flagship returns rows at sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q07 emits at most 3 customers per nation, rank within [1,3]") {
    val rows = run("q07_window_topn").collect()
    val perNation = rows.groupBy(_.getAs[String]("n_name"))
    assert(perNation.values.forall(_.length <= 3))
    assert(rows.forall { r => val rk = r.getAs[Long]("rk"); rk >= 1 && rk <= 3 })
  }

  test("q13 custdist sums to customer count") {
    val rows = run("q13_customer_distribution").collect()
    assert(rows.map(_.getAs[Long]("custdist")).sum ==
      Tables(spark, sf, "customer").count())
  }

  test("q21 rollup contains the grand-total row and per-flag subtotals") {
    val rows = run("q21_rollup").collect()
    val grand = rows.filter(r => r.getAs[String]("returnflag") == "ALL" &&
      r.getAs[String]("linestatus") == "ALL")
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("cnt") == Tables(spark, sf, "lineitem").count())
    val subtot = rows.filter(r => r.getAs[String]("returnflag") != "ALL" &&
      r.getAs[String]("linestatus") == "ALL")
    assert(subtot.nonEmpty)
  }

  test("q22 anti join excludes every customer that has an order") {
    val withOrders = Tables(spark, sf, "orders")
      .select(col("o_custkey")).distinct().count()
    val total = Tables(spark, sf, "customer").count()
    val rows = run("q22_anti_join").collect()
    assert(rows.map(_.getAs[Long]("numcust")).sum <= total - 0.max(0)) // sanity
    assert(rows.map(_.getAs[Long]("numcust")).sum < total)
    assert(withOrders > 0)
  }

  test("every declared oracle query has a queries entry and vice-versa coverage is complete") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    assert(q.size >= 46)
  }
}
