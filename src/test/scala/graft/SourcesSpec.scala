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

  test("XML round-trip preserves rows and values (built-in Spark 4 source)") {
    val dir = Files.createTempDirectory("graft-xml").toString
    val src = Tables(spark, sf, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    src.write.mode("overwrite").option("rowTag", "nation")
      .format("xml").save(s"$dir/nation")
    val back = spark.read.option("rowTag", "nation").format("xml")
      .load(s"$dir/nation")
    assert(back.count() == src.count())
    val a = src.orderBy("n_nationkey").collect()
      .map(r => (r.getAs[Any]("n_nationkey").toString, r.getAs[String]("n_name")))
    val b = back.orderBy("n_nationkey").collect()
      .map(r => (r.getAs[Any]("n_nationkey").toString, r.getAs[String]("n_name")))
    assert(a.sameElements(b))
  }

  test("binaryFile source ingests opaque payloads with file metadata") {
    val dir = Files.createTempDirectory("graft-bin").toString
    val payloads = Map("a.bin" -> Array[Byte](1, 2, 3),
      "b.bin" -> Array[Byte](9, 8, 7, 6))
    payloads.foreach { case (name, bytes) =>
      Files.write(java.nio.file.Paths.get(dir, name), bytes)
    }
    // the multimodal ingestion path: one row per file with (path,
    // modificationTime, length, content) — content is the opaque binary
    // column the §2.G operators consume
    val df = spark.read.format("binaryFile").load(dir)
    assert(df.count() == payloads.size)
    val got = df.collect().map { r =>
      r.getAs[String]("path").split('/').last ->
        r.getAs[Array[Byte]]("content").toSeq
    }.toMap
    payloads.foreach { case (name, bytes) =>
      assert(got(name) == bytes.toSeq)
    }
    assert(df.filter(col("length") === 3).count() == 1) // metadata filter
  }

  test("ORC round-trip preserves rows and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val src = Tables(spark, sf, "part")
    src.write.mode("overwrite").orc(s"$dir/part")
    val back = spark.read.orc(s"$dir/part")
    assert(back.count() == src.count())
    assert(back.schema == src.schema)
    val filtered = back.filter(col("p_size") > 25).select("p_partkey", "p_size")
    assert(filtered.count() == src.filter(col("p_size") > 25).count())
    val plan = filtered.queryExecution.executedPlan.toString
    // predicate + projection must reach the ORC scan, same as parquet
    assert(plan.contains("PushedFilters: [IsNotNull(p_size), GreaterThan(p_size,25)]"))
  }

  test("bucketed tables co-locate the join: no Exchange in the plan") {
    val n = (math.random() * 1e9).toLong // unique table names per run
    val lt = s"lineitem_b$n"; val ot = s"orders_b$n"
    Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(lt)
    Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(ot)
    try {
      val joined = spark.table(lt).join(spark.table(ot),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      assert(joined.count() == Tables(spark, sf, "lineitem").count())
      val plan = joined.queryExecution.executedPlan.toString
      // both sides pre-bucketed on the join key → no shuffle exchange
      assert(!plan.contains("Exchange hashpartitioning"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $lt")
      spark.sql(s"DROP TABLE IF EXISTS $ot")
    }
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // isolated SessionState on the shared context: the bloom confs are
    // runtime SQL confs, so newSession + conf.set scopes them here
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
    // shrink the app-side threshold so sf0.001 data qualifies; disable
    // broadcast so the join actually shuffles (the case the filter
    // exists for)
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val l = Tables(s2, sf, "lineitem")
    val o = Tables(s2, sf, "orders").filter(col("o_totalprice") > 400000)
    val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("cnt"))
    val cnt = j.collect().head.getAs[Long]("cnt")
    val plan = j.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain")) // runtime bloom filter injected
    // and it must not change the result
    val plain = Tables(spark, sf, "lineitem").join(
      Tables(spark, sf, "orders").filter(col("o_totalprice") > 400000),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(cnt == plain)
  }

  test("JDBC round-trip via embedded Derby preserves rows and pushes predicates") {
    // the external-store dimension-table path: write a dim to a JDBC
    // database, read it back, and prove the filter runs IN the database
    // (PushedFilters on the JDBC scan), not in Spark — at scale the
    // point of a JDBC dim source is shipping predicates to the store
    val db = Files.createTempDirectory("graft-derby").toString
    val url = s"jdbc:derby:$db/nationdb;create=true"
    val src = Tables(spark, sf, "nation")
    src.write.format("jdbc")
      .option("url", url).option("dbtable", "nation")
      .mode("overwrite").save()
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "nation").load()
    assert(back.count() == src.count())
    assert(back.columns.sorted.sameElements(src.columns.sorted))
    // values survive the type mapping both ways (Derby CLOB -> string)
    val names = back.select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = src.select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(names == expect)
    val filtered = back.filter(col("n_nationkey") >= 10)
      .select("n_nationkey", "n_name")
    assert(filtered.count() ==
      src.filter(col("n_nationkey") >= 10).count())
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(n_nationkey,10)"))
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
