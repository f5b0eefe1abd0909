package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Measures whether dsum's per-row round(x, 6) before the DECIMAL(30,6)
  * cast is (a) semantically redundant — Spark's double→decimal cast
  * already rounds HALF_UP at the target scale through the same
  * BigDecimal.valueOf shortest-repr path — and (b) how much it costs.
  * Evidence for the AggFns fast path decision; see NOTES_r9.
  */
object RoundProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(8, "round-probe")
    val l = Tables(spark, sfDir, "lineitem")
    val exprs = Seq(
      "price" -> col("l_extendedprice"),
      "rev" -> (col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
      "charge" -> (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
        (lit(1.0) + col("l_tax"))),
      "qty*w" -> (col("l_quantity") * (col("l_orderkey") % 100 + 1).cast("double")))
    exprs.foreach { case (name, e) =>
      val n = l.select(
        round(e, 6).cast(DecimalType(30, 6)).as("a"),
        e.cast(DecimalType(30, 6)).as("b"))
        .filter(!(col("a") <=> col("b"))).count()
      println(s"MISMATCH $name: $n rows")
    }
    // timing: 5 reps each of the two formulations over the 3-sum q01 shape
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"$tag rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    time("round+cast") {
      l.groupBy("l_returnflag", "l_linestatus").agg(
        sum(round(col("l_extendedprice"), 6).cast(DecimalType(30, 6))).as("a"),
        sum(round(rev, 6).cast(DecimalType(30, 6))).as("b"),
        sum(round(rev * (lit(1.0) + col("l_tax")), 6)
          .cast(DecimalType(30, 6))).as("c"))
    }
    time("cast-only ") {
      l.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_extendedprice").cast(DecimalType(30, 6))).as("a"),
        sum(rev.cast(DecimalType(30, 6))).as("b"),
        sum((rev * (lit(1.0) + col("l_tax"))).cast(DecimalType(30, 6))).as("c"))
    }
    spark.stop()
  }
}
