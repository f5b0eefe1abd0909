package graft

import graft.operators.TwoPassPrefix
import org.apache.spark.sql.functions._

/** Property pin for the shared (part × 256-bucket) two-pass prefix-sum
  * scheme behind p02/p07/x02: on random shapes — null parts, singleton
  * and empty parts, zero values, bucket collisions — the helper's
  * exclusive prefix sums and part totals must equal a driver-side
  * single-window replay exactly.
  */
class TwoPassPrefixSpec extends SparkSpecBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("two-pass prefix == single-window replay on random shapes (property)") {
    import spark.implicits._
    var state = 987654321L
    def next(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 33) % bound).toInt
    }
    for (trial <- 1 to 5) {
      val n = 30 + next(200)
      val parts = (0 until 1 + next(5)).map(i => s"p$i") :+ null
      val rows = (0 until n).map { i =>
        (i.toLong, parts(next(parts.length)), next(100).toLong)
      }
      val got = TwoPassPrefix.withPrefix(
        rows.toDF("id", "part", "v"), "part", "id", col("v"))
        .select("id", "pfx", "part_total").collect()
        .map(r => r.getAs[Long]("id") ->
          (r.getAs[Long]("pfx"), r.getAs[Long]("part_total"))).toMap
      // replay: per part (null its own group), order by (md5(id), id),
      // exclusive running sum + total
      val expect = rows.groupBy(_._2).flatMap { case (_, rs) =>
        val total = rs.map(_._3).sum
        var pfx = 0L
        rs.sortBy(r => (md5hex(r._1.toString), r._1)).map { case (id, _, v) =>
          val out = id -> (pfx, total); pfx += v; out
        }
      }
      assert(got == expect, s"trial $trial: n=$n parts=${parts.length}")
    }
  }
}
