package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.C extension — temporal join operators Spark's built-ins don't
  * provide directly: as-of join (latest right row at or before each left
  * timestamp) and bounded interval join (pairs within a time window).
  * Both are re-expressed as shuffle-minimal equi-join/window plans — the
  * only formulations that survive 100 TB:
  *
  *  - As-of: union both sides tagged, ONE shuffle on the key, one
  *    ordered window pass with last(ignoreNulls). Never builds the
  *    O(left × right-per-key) pair space a naive ts-inequality join
  *    materializes before its "latest" filter.
  *  - Interval: time-bucket the right side, explode the left side to the
  *    2 buckets that can contain a match, equi-join on (key, bucket),
  *    then exact-filter. Pair space is bounded by true matches plus
  *    same-bucket neighbors, not |L|x|R| per key.
  */
object TemporalJoins {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** Left as-of join: for every left row, attach `payload` columns from
    * the right row with the greatest `rightTs` <= the left row's
    * `leftTs` within the same `keys` group (null when none exists).
    * Output = all left columns + `asof_<rightTs>` + `asof_<payload>`.
    *
    * The right side MUST be unique per (keys, rightTs) — pre-aggregate
    * otherwise — or the payload at equal timestamps is nondeterministic.
    */
  def joinLatest(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTs: String, rightTs: String,
                 payload: Seq[String]): DataFrame = {
    require(!left.columns.exists(_.startsWith("__")),
      "joinLatest reserves the __-prefix for internal columns; " +
        s"rename: ${left.columns.filter(_.startsWith("__")).mkString(", ")}")
    val leftRest = left.columns.toSeq.filterNot(keys.contains)
    val rightKept = rightTs +: payload

    // align both sides to one schema: keys ++ left-only ++ tagged right
    val l2 = rightKept.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))) {
      (df, c) => df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType))
    }
    val r2 = leftRest.foldLeft(
      rightKept.foldLeft(
        right.withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))) {
        (df, c) => df.withColumn(s"__r_$c", col(c))
      }) { (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)) }

    val shape: Seq[Column] =
      (keys ++ leftRest ++ Seq("__ts", "__side") ++ rightKept.map("__r_" + _))
        .map(col)
    val tagged = l2.select(shape: _*).unionByName(r2.select(shape: _*))

    // side 0 sorts before side 1 at equal ts => "at or before" inclusive
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = rightKept.foldLeft(tagged) { (df, c) =>
      df.withColumn(s"__a_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    withAsof.filter(col("__side") === 1)
      .select((keys ++ leftRest).map(col) ++
        rightKept.map(c => col(s"__a_$c").as(s"asof_$c")): _*)
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---------------------------------------------------------------- q33
    // As-of join: each purchase picks up the user's latest click at or
    // before the purchase time. Clicks pre-aggregated to unique
    // (user_id, ts) so the as-of payload is deterministic.
    "q33_asof_join" -> QueryDef(
      build = (s, d) => {
        val ev = t(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts").as("c_ts"))
          .agg(round(max("value"), 2).as("click_value"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        joinLatest(purchases, clicks, Seq("user_id"), "ts", "c_ts",
            Seq("click_value"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("asof_c_ts").as("click_ts"),
            col("asof_click_value").as("click_value"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH clicks AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS c_ts,
                 round(max(value), 2) AS click_value
          FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        purch AS (
          SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'purchase'),
        latest AS (
          SELECT p.event_id, p.user_id, p.ts,
                 (SELECT max(c.c_ts) FROM clicks c
                  WHERE c.user_id = p.user_id AND c.c_ts <= p.ts) AS click_ts
          FROM purch p)
        SELECT l.event_id, l.user_id, l.ts, l.click_ts, c.click_value
        FROM latest l LEFT JOIN clicks c
          ON c.user_id = l.user_id AND c.c_ts = l.click_ts
        ORDER BY l.event_id""")),

    // ---------------------------------------------------------------- q34
    // Bounded interval join: (view, purchase) pairs of the same user
    // with 0 <= t_purchase - t_view <= 1 hour. Views explode to the two
    // hour-buckets a qualifying purchase can live in; the join is a pure
    // equi-join on (user_id, bucket) + exact dt filter. Each qualifying
    // pair matches in exactly one bucket, so no dedup is needed.
    "q34_interval_join" -> QueryDef(
      build = (s, d) => {
        val ev = t(s, d, "events")
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), graft.Timestamps.epochSec(col("ts")).as("tv"))
          .withColumn("bucket",
            explode(array(floor(col("tv") / 3600).cast("long"),
              floor(col("tv") / 3600).cast("long") + 1)))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), graft.Timestamps.epochSec(col("ts")).as("tp"))
          .withColumn("bucket", floor(col("tp") / 3600).cast("long"))
        views.join(purchases, Seq("user_id", "bucket"))
          .filter(col("tp") >= col("tv") && col("tp") - col("tv") <= 3600)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_pairs"),
            round(min(col("tp") - col("tv")), 6).as("min_gap_sec"))
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH v AS (SELECT user_id, epoch(CAST(ts AS TIMESTAMP)) AS tv
                   FROM events WHERE event_type = 'view'),
             p AS (SELECT user_id, epoch(CAST(ts AS TIMESTAMP)) AS tp
                   FROM events WHERE event_type = 'purchase')
        SELECT v.user_id, count(*) AS n_pairs,
               round(min(p.tp - v.tv), 6) AS min_gap_sec
        FROM v JOIN p ON p.user_id = v.user_id
         AND p.tp >= v.tv AND p.tp - v.tv <= 3600
        GROUP BY v.user_id ORDER BY v.user_id"""))
  )
}
