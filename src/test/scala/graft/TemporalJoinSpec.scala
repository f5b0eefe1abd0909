package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpecBase {

  import spark.implicits._

  test("asof joinLatest picks the latest right row at or before each left ts") {
    val left = Seq((1L, 100L), (1L, 205L), (1L, 50L), (2L, 300L))
      .toDF("k", "lts")
    val right = Seq((1L, 100L, "a"), (1L, 200L, "b"), (3L, 10L, "z"))
      .toDF("k", "rts", "v")
    val got = TemporalJoins.joinLatest(left, right, Seq("k"), "lts", "rts",
        Seq("v"))
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("lts"),
        Option(r.getAs[Any]("asof_rts")), Option(r.getAs[String]("asof_v"))))
      .toSet
    assert(got == Set(
      (1L, 100L, Some(100L), Some("a")), // equal ts is inclusive
      (1L, 205L, Some(200L), Some("b")), // latest prior wins
      (1L, 50L, None, None),             // nothing at or before
      (2L, 300L, None, None)))           // key with no right rows
  }

  // testdata ts arrives as TIMESTAMP, TIMESTAMP_NTZ, or nanos-long
  // depending on the writer; collect() surfaces the first two as
  // java.sql.Timestamp vs java.time.LocalDateTime respectively.
  private def micros(a: Any): Long = a match {
    case t: java.sql.Timestamp =>
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
    case d: java.time.LocalDateTime =>
      d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    case x => sys.error(s"unexpected timestamp class ${x.getClass}")
  }

  test("q33 as-of: click_ts <= purchase ts whenever present") {
    val rows = run("q33_asof_join").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      r.isNullAt(r.fieldIndex("click_ts")) ||
        micros(r.getAs[Any]("click_ts")) <= micros(r.getAs[Any]("ts"))
    })
  }

  test("q34 interval join equals the naive inequality join on sf data") {
    val ev = Tables(spark, sf, "events")
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), Timestamps.epochSec(col("ts")).as("tv"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), Timestamps.epochSec(col("ts")).as("tp"))
    val naive = v.join(p, col("user_id") === col("pu") &&
        col("tp") >= col("tv") && col("tp") - col("tv") <= 3600)
      .groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_pairs"))
      .toMap
    val bucketed = run("q34_interval_join").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_pairs")).toMap
    assert(bucketed == naive)
  }
}
