package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator: a DataFrame builder plus (when SQL-expressible) a
  * DuckDB oracle query over the same parquet tables. Column names/types in
  * both must match exactly — the driver sorts columns by name and
  * hash-compares values.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Loaders for the driver-generated test tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    // long (spark.sql.legacy.parquet.nanosAsLong=true, set in every session
    // builder). Normalize to a microsecond TimestampType column; DuckDB's
    // CAST(ts AS TIMESTAMP) truncates ns→µs the same way (`div` truncates
    // for positive epochs).
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}

/** Timestamp arithmetic helpers shared by the event/temporal operators. */
object Timestamps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{lit, unix_micros}

  /** Epoch seconds as DOUBLE, matching DuckDB's epoch(CAST(ts AS
    * TIMESTAMP)): micros (exact integer < 2^53) divided by 1e6 in one IEEE
    * rounding. A direct `ts.cast("double")` is DATATYPE_MISMATCH when the
    * parquet column arrives as TIMESTAMP_NTZ (pandas-written files carry
    * isAdjustedToUTC=false, which Spark 4 reads as NTZ by default); the
    * NTZ->TIMESTAMP cast below is exact because every graft session pins
    * spark.sql.session.timeZone=UTC, and it is a no-op when the column is
    * already TIMESTAMP.
    */
  def epochSec(c: Column): Column =
    unix_micros(c.cast("timestamp")).cast("double") / lit(1e6)
}

/** Tuned local session for tests; Verify/Bench build their own (driver
  * contract) with the same switches. AQE is on everywhere: it coalesces
  * post-shuffle partitions and splits skewed ones — the Spark-native
  * re-expression of the reference's skew-tolerant shuffle service
  * (/root/reference/spark-code/.../CherryShuffleService.scala).
  */
object GraftSession {
  def local(cores: Int = 4, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The conf profile for a real multi-executor cluster at large scale.
    * Returns a configured builder (caller adds master/deploy specifics).
    * Differences from `local` that matter at 100 TB:
    *  - shuffle.partitions sized ~2–3× total cores and then left to AQE
    *    coalescing (here 2000 as a sane 1000-executor default);
    *  - runtime bloom-filter join pruning ON with a creation-side budget
    *    large enough for a filtered fact side (semi-join reduction
    *    before the shuffle — the biggest shuffle-byte lever on selective
    *    fact-fact joins);
    *  - 256 MB scan partitions so a 100 TB table makes ~400k tasks, not
    *    4M;
    *  - skew-join splitting + partition coalescing (AQE) as in local.
    */
  def clusterBuilder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "2000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "128MB")
      .config("spark.sql.files.maxPartitionBytes", "256MB")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
}
