package graft.operators

import graft.Tables
import graft.functions.AggFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Spark-native re-expression of the reference's look-ahead shuffle-block
  * caching (spark-code/core/src/main/scala/org/apache/spark/deploy/
  * shuffleService/CherryShuffleService.scala:1-198, the
  * LOOK_AHEAD_CACHING_* paths): Cherry keeps hot shuffle blocks in the
  * service's memory so downstream stages re-read them without touching
  * disk; on stock Spark the same win is `persist()` on the shared
  * intermediate — every downstream query then reads an
  * InMemoryTableScan instead of recomputing the scan + join + shuffle.
  * CacheSpec pins that mechanically; CacheDemo measures it.
  *
  * WHEN TO CACHE — the decision rule, distilled from five r10 A/B
  * measurements (e33 ✓, d20 signatures ✓, d18 pair table ✗, g08
  * projection ✗, t11 TF table ✗):
  *
  *  - Cache only when the table is NARROW relative to its recompute
  *    (dim-bounded aggregates, fixed-width signatures) AND the
  *    consumers either RACE concurrently — broadcast-subquery jobs
  *    compute an uncached subtree once EACH; lazy persist dedupes
  *    storage, not racing computation — or re-read it many times.
  *  - Never cache an intermediate whose consumers are aggregates:
  *    streaming partial aggregation prunes and combines map-side,
  *    and beats materializing the full row set even at 2× execution
  *    (d18: persist+count 3.9 s vs 0.7 s streamed at sf0.1).
  *  - Eager fill (count() at build) ONLY for racing consumers; it
  *    costs a full extra action and measurably hurts linear plans.
  */
object HotCache {

  /** Persist `df`, hand it to `body` (typically several downstream
    * queries over the one materialization), and ALWAYS unpersist on the
    * way out — scoped caching, so a long-lived session never strands a
    * cache entry (the d09 lesson).
    */
  def withCached[A](df: DataFrame,
                    level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
                   (body: DataFrame => A): A = {
    val cached = df.persist(level)
    try body(cached) finally cached.unpersist()
  }

  /** Bounded lazy-persist slot for operators whose RETURNED plan holds
    * the cached intermediate (d09's candidates, p06b's survivor set):
    * there the cache cannot be scoped try/finally inside the build —
    * the plan is still unexecuted when build() exits — so instead each
    * slot keeps at most ONE resident cache (registering a new frame
    * releases the predecessor) and [[releaseAll]] frees every slot for
    * teardown (Verify, Bench, spec afterAll). Slots are static
    * singletons (one per operator object), so the global registry
    * never grows past the operator count.
    */
  final class Slot private[HotCache] () {
    private val ref =
      new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
    def register(df: DataFrame): DataFrame = {
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      val prev = ref.getAndSet(cached)
      // re-registering the SAME plan must NOT evict: persist() on an
      // already-cached plan is a no-op, so unpersisting the previous
      // reference would drop the one shared cache entry and silently
      // recompute from then on
      if (prev != null &&
          !prev.queryExecution.analyzed.sameResult(cached.queryExecution.analyzed))
        prev.unpersist(blocking = false)
      cached
    }
    def release(): Unit =
      Option(ref.getAndSet(null)).foreach(_.unpersist(blocking = false))
  }

  private val slots =
    new java.util.concurrent.ConcurrentLinkedQueue[Slot]()

  def slot(): Slot = { val s = new Slot; slots.add(s); s }

  /** Release every registered slot's cache. Safe any time; an
    * already-built plan just recomputes instead of reading the cache.
    */
  def releaseAll(): Unit = slots.forEach(_.release())

  /** The demo/spec's shared hot intermediate: order-level revenue
    * (lineitem ⋈ orders + one agg shuffle) — the expensive prefix that
    * priority- and year-rollups both need. dsum keeps the revenue exact
    * (order-independent), so cached and recomputed plans are
    * bit-identical.
    */
  def orderRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
      .agg(AggFns.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rev"))
}
