package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The (part × 256-bucket) two-pass EXACT prefix-sum scheme shared by
  * p02 (sequence packing), p07 (token budgeting) and x02 (stratified
  * sampling): global per-part prefix sums in the deterministic
  * (md5(id), id) priority order WITHOUT a single-task per-part window —
  * the r2 scale-killer. Pass 1 aggregates per (part, bucket) and windows
  * over that TINY table (n_part × 256 rows) for bucket offsets; pass 2
  * ranks locally inside each (part, bucket) — 256 parallel sort tasks
  * per part — and adds the offset. Bucket = first byte of md5(id), so
  * (bucket, md5-hex) ordering IS md5-hex ordering (hex chars are
  * ASCII-ascending) and the composition equals one global per-part
  * window, exactly (TwoPassPrefixSpec pins this against a driver-side
  * replay on random shapes).
  */
object TwoPassPrefix {

  /** Adds `pfx` — the exclusive prefix sum of `value` within `part`,
    * ordered by (md5(id), id) — and `part_total` (the part's full sum)
    * to `df`. NULL parts form their own group (null-safe join), matching
    * a window's PARTITION BY semantics. `value` must be non-null; sums
    * are Long.
    */
  def withPrefix(df: DataFrame, part: String, id: String,
                 value: Column): DataFrame = {
    // working/output names must not collide with caller columns —
    // withColumn would silently REPLACE them and corrupt results
    val reserved = df.columns.filter(c =>
      c == "pfx" || c == "part_total" || c.startsWith("gp_"))
    require(reserved.isEmpty,
      s"withPrefix reserves pfx/part_total/gp_*; input carries: ${reserved.mkString(", ")}")
    val base = df
      .withColumn("gp_v", value.cast("long"))
      .withColumn("gp_hx", md5(col(id).cast("string").cast("binary")))
      .withColumn("gp_bkt",
        conv(substring(col("gp_hx"), 1, 2), 16, 10).cast("int"))
    val wPart = Window.partitionBy(part)
    val counts = base.groupBy(col(part), col("gp_bkt"))
      .agg(sum("gp_v").as("gp_c"))
      .withColumn("gp_off", coalesce(sum("gp_c").over(
        wPart.orderBy("gp_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("gp_total", sum("gp_c").over(wPart))
      .select(col(part).as("gp_cpart"), col("gp_bkt").as("gp_cbkt"),
        col("gp_off"), col("gp_total"))
    val wBkt = Window.partitionBy(part, "gp_bkt")
      .orderBy(col("gp_hx"), col(id))
    base
      .withColumn("gp_lpfx", coalesce(sum("gp_v").over(
        wBkt.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(counts),
        col(part) <=> col("gp_cpart") && col("gp_bkt") <=> col("gp_cbkt"))
      .withColumn("pfx", col("gp_off") + col("gp_lpfx"))
      .withColumn("part_total", col("gp_total"))
      .drop("gp_v", "gp_hx", "gp_bkt", "gp_lpfx",
        "gp_cpart", "gp_cbkt", "gp_off", "gp_c", "gp_total")
  }
}
