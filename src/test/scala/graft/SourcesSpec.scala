package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** §2.H — source/sink coverage: CSV and JSON round-trips, partitioned
  * parquet writes with partition pruning on read.
  */
class SourcesSpec extends SparkSpecBase {

  test("CSV round-trip preserves rows and schema (header + inferSchema)") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val src = Tables(spark, sf, "nation")
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/nation")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/nation")
    assert(back.count() == src.count())
    assert(back.columns.sorted.sameElements(src.columns.sorted))
  }

  test("JSON round-trip preserves rows") {
    val dir = Files.createTempDirectory("graft-json").toString
    val src = Tables(spark, sf, "region")
    src.write.mode("overwrite").json(s"$dir/region")
    val back = spark.read.json(s"$dir/region")
    assert(back.count() == src.count())
  }

  test("partitioned parquet write prunes partitions on filtered read") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(s"$dir/orders")
    val back = spark.read.parquet(s"$dir/orders").filter(col("o_year") === 1996)
    val expected = Tables(spark, sf, "orders")
      .filter(year(col("o_orderdate")) === 1996).count()
    assert(back.count() == expected)
    // partition pruning must show up in the scan
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || expected == 0)
  }
}
