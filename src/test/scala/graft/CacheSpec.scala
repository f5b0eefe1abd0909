package graft

import graft.operators.HotCache
import org.apache.spark.sql.functions._

/** Mechanical pin for the Cherry cache-reuse parity claim (SURVEY §1:
  * look-ahead shuffle-block caching → persist + InMemoryTableScan).
  * Not a timing test — it asserts the PLAN: with the hot intermediate
  * persisted, both downstream rollups must read the cache, and the
  * scoped helper must leave no cache entry behind.
  */
class CacheSpec extends SparkSpecBase {

  test("persisted hot intermediate serves both rollups via InMemoryTableScan, then unpersists") {
    val rev = HotCache.orderRevenue(spark, sf)

    // ground truth, computed uncached (dsum: order-independent decimals,
    // so cached/uncached/partitioning differences cannot flip a bit)
    val coldPriority = rev.groupBy("o_orderpriority")
      .agg(sum("rev").cast("decimal(30,6)").as("total"))
      .orderBy("o_orderpriority").collect()
    val coldYearly = rev.groupBy(year(col("o_orderdate")).as("yr"))
      .agg(sum("rev").cast("decimal(30,6)").as("total"))
      .orderBy("yr").collect()

    val cacheMgr = spark.sharedState.cacheManager
    def lookup(df: org.apache.spark.sql.DataFrame) =
      cacheMgr.lookupCachedData(
        df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
    HotCache.withCached(rev) { hot =>
      hot.count() // materialize once
      assert(lookup(hot).isDefined,
        "intermediate not registered in the cache manager")

      val priority = hot.groupBy("o_orderpriority")
        .agg(sum("rev").cast("decimal(30,6)").as("total"))
        .orderBy("o_orderpriority")
      val yearly = hot.groupBy(year(col("o_orderdate")).as("yr"))
        .agg(sum("rev").cast("decimal(30,6)").as("total"))
        .orderBy("yr")

      // the parity pin: both downstream plans read memory, not parquet.
      // (InMemoryRelation PRINTS its stored build plan, FileScan
      // included, so only the plan text ABOVE the cache read may be
      // checked for scans.)
      Seq("priority" -> priority, "yearly" -> yearly).foreach { case (n, q) =>
        val p = q.queryExecution.executedPlan.toString
        val scanAt = p.indexOf("InMemoryTableScan")
        assert(scanAt >= 0, s"$n plan misses cache:\n$p")
        assert(!p.substring(0, scanAt).contains("FileScan"),
          s"$n recomputes the scan:\n$p")
      }
      assert(priority.collect().sameElements(coldPriority))
      assert(yearly.collect().sameElements(coldYearly))
    }

    // scoped helper released the cache — nothing stranded for the session
    assert(lookup(rev).isEmpty, "withCached leaked a cache entry")
  }
}
