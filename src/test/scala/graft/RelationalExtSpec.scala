package graft

import org.apache.spark.sql.functions._

/** Semantic checks (beyond the DuckDB hash gate) for the round-2
  * relational operators: frame semantics, grouping structure, pivot
  * completeness, set-op disjointness.
  */
class RelationalExtSpec extends SparkSpecBase {

  test("q35 RANGE frame: same-date peers share one running total") {
    val rows = run("q35_window_range").collect()
    val byCustDate = rows.groupBy(r =>
      (r.getAs[Long]("o_custkey"), r.getAs[Any]("o_orderdate")))
    // every peer group (same cust, same date) must report an identical
    // running total — the defining difference between RANGE and ROWS
    byCustDate.values.foreach { g =>
      assert(g.map(_.getAs[Double]("running_total")).distinct.length == 1)
    }
    // and running totals never decrease along each customer's history
    rows.groupBy(_.getAs[Long]("o_custkey")).values.foreach { g =>
      // o_orderdate is TIMESTAMP_NTZ → LocalDateTime in collected rows
      val totals = g.sortBy(r => (r.getAs[java.time.LocalDateTime]("o_orderdate")
        .toString, r.getAs[Long]("o_orderkey")))
        .map(_.getAs[Double]("running_total"))
      assert(totals.zip(totals.drop(1)).forall { case (a, b) => b >= a - 1e-9 })
    }
  }

  test("q31 CUBE: gid structure — one grand total, consistent subtotal sums") {
    val rows = run("q31_cube").collect()
    def cnt(gid: Long) = rows.filter(_.getAs[Long]("gid") == gid)
      .map(_.getAs[Long]("cnt")).sum
    assert(rows.count(_.getAs[Long]("gid") == 3L) == 1) // grand total
    // every grouping level re-aggregates the same row population
    assert(cnt(0) == cnt(1) && cnt(1) == cnt(2) && cnt(2) == cnt(3))
  }

  test("q36 pivot: priority columns partition each year's orders") {
    val rows = run("q36_pivot").collect()
    val o = Tables(spark, sf, "orders")
    val byYear = o.groupBy(year(col("o_orderdate")).cast("long").as("y"))
      .count().collect()
      .map(r => r.getAs[Long]("y") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val total = Seq("urgent", "high", "medium", "not_specified", "low")
        .map(c => Option(r.getAs[Any](c)).fold(0L)(_.asInstanceOf[Long])).sum
      assert(total == byYear(r.getAs[Long]("o_year")))
    }
  }

  test("q32 set ops: 'both' and 'only_1996' are disjoint and cover 1996") {
    val rows = run("q32_set_ops").collect()
    val both = rows.filter(_.getAs[String]("grp") == "both")
      .map(_.getAs[Long]("o_custkey")).toSet
    val only = rows.filter(_.getAs[String]("grp") == "only_1996")
      .map(_.getAs[Long]("o_custkey")).toSet
    assert((both & only).isEmpty)
    val y96 = Tables(spark, sf, "orders")
      .filter(year(col("o_orderdate")) === 1996)
      .select("o_custkey").distinct().collect()
      .map(_.getAs[Long]("o_custkey")).toSet
    assert((both | only) == y96)
  }

  test("q40 lateral = window-rank top-2 per nation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("c_nationkey")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    val expect = Tables(spark, sf, "customer")
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
      .join(Tables(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_name", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val got = run("q40_lateral").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("q41 grouping sets: every aggregation level reconciles to the total") {
    val rows = run("q41_grouping_sets").collect()
      .map(r => (r.getAs[String]("rflag"), r.getAs[String]("lstatus"),
        r.getAs[Long]("gid"), r.getAs[Long]("cnt")))
    val total = Tables(spark, sf, "lineitem").count()
    // gid 0 = (flag,status) detail; 1 = per-flag; 2 = per-status;
    // 3 = grand total — each level partitions the same row set
    (0L to 2L).foreach { g =>
      assert(rows.filter(_._3 == g).map(_._4).sum == total, s"gid $g")
    }
    val grand = rows.filter(_._3 == 3L)
    assert(grand.length == 1 && grand.head._4 == total)
    assert(grand.head._1 == "ALL" && grand.head._2 == "ALL")
    // superaggregate markers appear exactly where the gid bit says
    rows.foreach { case (rf, ls, g, _) =>
      assert((rf == "ALL") == ((g & 2L) != 0), s"$rf/$g")
      assert((ls == "ALL") == ((g & 1L) != 0), s"$ls/$g")
    }
  }

  test("q42 mode: driver-side replay + totals reconcile to the table") {
    val rows = run("q42_mode").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables(spark, sf, "orders").count())
    // exact replay: (month, priority) counts → max count, min priority
    val cnt = Tables(spark, sf, "orders")
      .select(date_trunc("month", col("o_orderdate").cast("timestamp"))
        .as("month"), col("o_orderpriority"))
      .collect()
      .groupBy(r => (r.get(0), r.getString(1)))
      .map { case ((m, p), rs) => (m, p, rs.length.toLong) }
    val expect = cnt.groupBy(_._1).map { case (m, g) =>
      val mx = g.map(_._3).max
      m -> g.filter(_._3 == mx).map(_._2).min
    }
    rows.foreach { r =>
      val m = r.get(r.fieldIndex("month"))
      assert(r.getAs[String]("mode_priority") == expect(m), s"month $m")
      assert(r.getAs[Long]("n_mode") <= r.getAs[Long]("n_orders"))
    }
  }

  test("q43 rank family: tie semantics replayed exactly") {
    val rows = run("q43_rank_funcs").collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Double]("l_quantity"),
        r.getAs[Long]("n"), r.getAs[Long]("rnk"), r.getAs[Long]("drnk"),
        r.getAs[Double]("prnk"), r.getAs[Double]("cdist")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { part =>
      val np = part.length.toLong
      // replay rank = 1 + #strictly-greater counts; dense = #distinct
      // greater + 1; peers share all four values
      val counts = part.map(_._3)
      part.foreach { case (_, q, n, rnk, drnk, prnk, cdist) =>
        val greater = counts.count(_ > n).toLong
        val denseG = counts.filter(_ > n).distinct.length.toLong
        val peers = counts.count(_ == n).toLong
        assert(rnk == greater + 1, s"rank at n=$n")
        assert(drnk == denseG + 1, s"dense_rank at n=$n")
        val wantP = if (np == 1) 0.0 else
          BigDecimal(java.math.BigDecimal.valueOf(greater.toDouble / (np - 1)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val wantC =
          BigDecimal(java.math.BigDecimal.valueOf((greater + peers).toDouble / np))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(prnk == wantP, s"percent_rank at n=$n: $prnk vs $wantP")
        assert(cdist == wantC, s"cume_dist at n=$n: $cdist vs $wantC")
      }
      // ties actually occur at sf (integer quantities) — the test bites
      assert(counts.distinct.length < counts.length || np < 3)
    }
  }

  test("q44 semi join: per-brand counts = distinct qualifying parts, no fan-out") {
    val rows = run("q44_semi_join").collect()
      .map(r => r.getAs[String]("p_brand") -> r.getAs[Long]("n_parts")).toMap
    assert(rows.nonEmpty)
    // replay: distinct partkeys with a >=49-quantity lineitem, per brand
    val heavy = Tables(spark, sf, "lineitem")
      .filter(col("l_quantity") >= 49)
      .select(col("l_partkey")).distinct().collect()
      .map(_.getLong(0)).toSet
    val want = Tables(spark, sf, "part")
      .select("p_partkey", "p_brand").collect()
      .filter(r => heavy(r.getLong(0)))
      .groupBy(_.getString(1)).map { case (b, g) => b -> g.length.toLong }
    assert(rows == want)
    // the semi join must emit each part at most once even though parts
    // average multiple qualifying lineitems at this SF (fan-out tripwire)
    val partKeys = Tables(spark, sf, "part")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(rows.values.sum == heavy.count(partKeys))
  }

  test("q45 unpivot round-trips the long-form counts exactly") {
    val got = run("q45_unpivot").collect()
      .map(r => (r.getAs[Long]("o_year"), r.getAs[String]("priority")) ->
        r.getAs[Long]("n")).toMap
    // melt(pivot(x)) == x: the direct long-form aggregation
    val direct = Tables(spark, sf, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("y"),
        col("o_orderpriority"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[Long]("y"),
        r.getAs[String]("o_orderpriority")) -> r.getAs[Long]("n")).toMap
    val label = Map("1-URGENT" -> "urgent", "2-HIGH" -> "high",
      "3-MEDIUM" -> "medium", "4-NOT SPECIFIED" -> "not_specified",
      "5-LOW" -> "low")
    direct.foreach { case ((y, raw), n) => assert(got((y, label(raw))) == n) }
    // absent combos surface as 0 rows, and the grid is complete
    assert(got.size == direct.keys.map(_._1).toSeq.distinct.size * 5)
    assert(got.values.sum == Tables(spark, sf, "orders").count())
  }

  test("q46 null-safe join: NULL keys match each other, mass reconciles") {
    val rows = run("q46_null_safe_join").collect()
    val nullRow = rows.filter(_.getAs[Boolean]("is_null_key"))
    // the '5-LOW'-nulled group exists in both years at sf and must JOIN
    assert(nullRow.length == 1)
    assert(!nullRow.head.isNullAt(nullRow.head.fieldIndex("n96")))
    assert(!nullRow.head.isNullAt(nullRow.head.fieldIndex("n97")))
    // a plain = join would have dropped it: exactly one NULL output key
    assert(rows.count(_.isNullAt(0)) == 1)
    // yearly masses reconcile to the filtered order counts
    def yr(y: Int) = Tables(spark, sf, "orders")
      .filter(year(col("o_orderdate")) === y).count()
    assert(rows.flatMap(r => Option(r.getAs[Any]("n96")))
      .map(_.asInstanceOf[Long]).sum == yr(1996))
    assert(rows.flatMap(r => Option(r.getAs[Any]("n97")))
      .map(_.asInstanceOf[Long]).sum == yr(1997))
  }

  test("q47 histogram: mass conserved, bucket function replays exactly") {
    val rows = run("q47_price_histogram").collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n")).toMap
    assert(rows.values.sum == Tables(spark, sf, "lineitem").count())
    assert(rows.keys.forall(b => b >= 0L && b <= 21L))
    // replay: every price lands in width_bucket(cents, 0, 1e7, 20)
    val expect = Tables(spark, sf, "lineitem")
      .select("l_extendedprice").collect()
      .map(r => math.floor(r.getDouble(0) * 100 + 0.5).toLong)
      .map(c => if (c < 0) 0L else if (c >= 10000000L) 21L
                else c * 20 / 10000000L + 1)
      .groupBy(identity).map { case (b, g) => b -> g.length.toLong }
    assert(rows == expect)
  }

  test("q48 division: full-coverage supplier flags true, partial doesn't") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val dir = java.nio.file.Files.createTempDirectory("q48").toString
    // size-1 universe = brands {X, Y}; supplier 1 sells parts of both
    // (covers_all), supplier 2 only X; part 30 is size 2 — its brand Z
    // must NOT enter the universe even though supplier 2 sells it
    Seq((10L, "BrandX", 1L), (20L, "BrandY", 1L), (30L, "BrandZ", 2L))
      .toDF("p_partkey", "p_brand", "p_size")
      .withColumn("p_name", lit("p")).withColumn("p_type", lit("t"))
      .withColumn("p_retailprice", lit(1.0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((1L, 10L, 1L), (2L, 20L, 1L), (3L, 10L, 2L), (4L, 30L, 2L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = run("q48_division", dir).collect()
      .map(r => r.getAs[Long]("suppkey") ->
        ((r.getAs[Long]("n_brands"), r.getAs[Long]("n_universe"),
          r.getAs[Boolean]("covers_all")))).toMap
    assert(got == Map(1L -> ((2L, 2L, true)), 2L -> ((1L, 2L, false))), got)
    // sf replay: covers_all ⇔ n_brands = n_universe, never exceeding it
    run("q48_division").collect().foreach { r =>
      assert(r.getAs[Long]("n_brands") <= r.getAs[Long]("n_universe"))
      assert(r.getAs[Boolean]("covers_all") ==
        (r.getAs[Long]("n_brands") == r.getAs[Long]("n_universe")))
    }
  }

  test("q49 above-average orders: positive excess, never a 1-order customer, " +
    "top row replays exactly") {
    val rows = run("q49_above_avg").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Double]("excess_x_n") > 0)
      // p·1 > p is impossible: a single-order customer can't beat its
      // own average — the decorrelation must preserve that
      assert(r.getAs[Long]("n_orders") >= 2, r)
    }
    val ex = rows.map(_.getAs[Double]("excess_x_n"))
    assert(ex.zip(ex.tail).forall { case (a, b) => a >= b }, ex.toSeq)
    // replay the top row against a direct scan of its customer's orders
    val top = rows.head
    val cust = top.getAs[Long]("o_custkey")
    val mine = Tables(spark, sf, "orders")
      .filter(col("o_custkey") === cust)
      .select(col("o_orderkey"), col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("p"))
      .collect()
    assert(mine.length == top.getAs[Long]("n_orders"))
    val tot = mine.map(r => BigDecimal(r.getAs[java.math.BigDecimal]("p")))
      .sum
    val price = BigDecimal(mine.find(_.getAs[Long]("o_orderkey") ==
      top.getAs[Long]("o_orderkey")).get.getAs[java.math.BigDecimal]("p"))
    val want = (price * mine.length - tot)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(want == top.getAs[Double]("excess_x_n"), (want, top))
  }

  test("q50 conditional aggregates: planted branches count exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q50").toString
    Seq( // (flag, qty, discount, tax)
      ("A", 30.0, 0.10, 0.05), // bulk + deep discount
      ("A", 10.0, 0.00, 0.02),
      ("N", 5.0, 0.01, -0.01)) // negative tax → bool_and trips
      .toDF("l_returnflag", "l_quantity", "l_discount", "l_tax")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = run("q50_agg_filters", dir).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val a = got("A")
    assert(a.getAs[Long]("n_items") == 2L && a.getAs[Long]("n_bulk") == 1L
      && a.getAs[Long]("bulk_bp") == 5000L, a)
    assert(a.getAs[Boolean]("any_deep_discount")
      && a.getAs[Boolean]("taxes_nonneg"), a)
    val n = got("N")
    assert(n.getAs[Long]("n_bulk") == 0L && n.getAs[Long]("bulk_bp") == 0L, n)
    assert(!n.getAs[Boolean]("any_deep_discount")
      && !n.getAs[Boolean]("taxes_nonneg"), n)
    // sf invariant: every branch count bounded by the group size
    run("q50_agg_filters").collect().foreach { r =>
      assert(r.getAs[Long]("n_bulk") <= r.getAs[Long]("n_items"), r)
      assert(r.getAs[Long]("bulk_bp") <= 10000L, r)
    }
  }

  test("q51 running distinct: first-touch rewrite replays the planted truth") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q51").toString
    def d(m: Int, day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, m, day, 0, 0, 0))
    // nation 1: cust 10 first-touches in Jan (Feb repeat must not
    // recount), cust 11 in Feb; nation 2: cust 20 in Mar
    Seq((1L, 10L, d(1, 5)), (2L, 10L, d(2, 1)), (3L, 11L, d(2, 20)),
      (4L, 20L, d(3, 7)))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 1L), (11L, 1L), (20L, 2L))
      .toDF("c_custkey", "c_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = run("q51_running_distinct", dir).collect()
      .map(r => (r.getAs[Long]("nation"), r.getAs[Long]("ym")) ->
        ((r.getAs[Long]("new_customers"), r.getAs[Long]("cum_customers"))))
      .toMap
    assert(got == Map(
      (1L, 202401L) -> ((1L, 1L)), (1L, 202402L) -> ((1L, 2L)),
      (2L, 202403L) -> ((1L, 1L))), got)
    // sf invariants: cumulative monotone per nation; total = distinct custs
    val sfRows = run("q51_running_distinct").collect()
    sfRows.groupBy(_.getAs[Long]("nation")).foreach { case (_, rs) =>
      val cums = rs.sortBy(_.getAs[Long]("ym")).map(_.getAs[Long]("cum_customers"))
      assert(cums.sameElements(cums.sorted))
      assert(cums.last == rs.map(_.getAs[Long]("new_customers")).sum)
    }
  }

  test("q52 yoy growth: planted revenues pin sign-split truncation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q52").toString
    def d(y: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(y, 6, 1, 0, 0, 0))
    // nation 1, customer 10: 2020=100.00, 2021=85.00 (-1500 bp exact),
    // 2022=92.57 (+890.58… → truncates to 890),
    // 2023=92.00 (−0.57/92.57 → −61.57… bp → truncates toward zero: −61,
    // where floor semantics would give −62 — the cross-engine trap)
    Seq((1L, 10L, d(2020)), (2L, 10L, d(2021)), (3L, 10L, d(2022)),
      (4L, 10L, d(2023)))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 1L)).toDF("c_custkey", "c_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 100.00, 0.0), (2L, 85.00, 0.0), (3L, 92.57, 0.0),
      (4L, 92.00, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = run("q52_yoy_growth", dir).collect()
      .map(r => r.getAs[Long]("yr") ->
        ((r.getAs[Double]("revenue"), r.getAs[Long]("growth_bp")))).toMap
    assert(got == Map(
      2021L -> ((85.00, -1500L)), 2022L -> ((92.57, 890L)),
      2023L -> ((92.00, -61L))), got)
    // sf invariants: growth_bp consistent with the revenue ordering
    run("q52_yoy_growth").collect().foreach { r =>
      val (rev, prev, bp) = (r.getAs[Double]("revenue"),
        r.getAs[Double]("prev_revenue"), r.getAs[Long]("growth_bp"))
      if (rev > prev) assert(bp >= 0, r) else assert(bp <= 0, r)
    }
  }

  test("q53 merge reconciles: counts partition the merged set exactly") {
    val r = run("q53_merge_upsert").collect().head
    val orders = Tables(spark, sf, "orders")
    val nBase = orders.count()
    val nUpd = orders
      .filter(org.apache.spark.sql.functions.col("o_orderkey") % 97 === 0)
      .count()
    val nIns = orders
      .filter(org.apache.spark.sql.functions.col("o_orderkey") % 199 === 0)
      .count()
    assert(r.getAs[Long]("n_merged") == nBase + nIns, r)
    assert(r.getAs[Long]("n_inserted") == nIns, r)
    assert(r.getAs[Long]("n_updated") == nUpd, r)
    assert(r.getAs[Long]("n_unchanged") == nBase - nUpd, r)
    // every update adds exactly +10.00 and every insert re-adds its
    // source price: after − before = 10·updates + Σ inserted prices
    val insSum = BigDecimal(orders
      .filter(org.apache.spark.sql.functions.col("o_orderkey") % 199 === 0)
      .agg(graft.functions.AggFns.dsum(
        org.apache.spark.sql.functions.col("o_totalprice")))
      .collect().head.getDouble(0))
    val deltaSum = BigDecimal(r.getAs[Double]("total_after")) -
      BigDecimal(r.getAs[Double]("total_before"))
    assert((deltaSum - (BigDecimal(10) * nUpd + insSum)).abs < 0.02, r)
  }

  test("q54 correlations replay exactly from driver-side power sums") {
    import org.apache.spark.sql.functions._
    val got = run("q54_corr_matrix").collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Double]("r")).toMap
    got.values.foreach(r => assert(r >= -1.0 && r <= 1.0, r))
    // replay qty_price through BigInteger sums — must be BIT-identical
    val rows = Tables(spark, sf, "lineitem")
      .select(expr("CAST(round(l_quantity * 100, 0) AS LONG)"),
        expr("CAST(round(l_extendedprice * 100, 0) AS LONG)"))
      .collect().map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1))))
    val n = BigInt(rows.length)
    val sx = rows.map(_._1).sum; val sy = rows.map(_._2).sum
    val sxy = rows.map(t => t._1 * t._2).sum
    val sxx = rows.map(t => t._1 * t._1).sum
    val syy = rows.map(t => t._2 * t._2).sum
    val want = (n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    assert(got("qty_price") == want, s"${got("qty_price")} vs $want")
  }

  test("q55 trend verdict is the exact sign of the slope") {
    val rows = run("q55_trend_slope").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_months") >= 2L, r)
      val s = r.getAs[Double]("slope_c_per_month")
      val t = r.getAs[Long]("trend")
      assert(math.signum(s) == t.toDouble || (s == 0.0 && t == 0L), r)
    }
  }

  test("q56 skyline keeps exactly the undominated parts; ties co-survive") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("q56").toString
    // (price¢, demand): 1=(50,50) 2=(100,60) 3=(100,60) dup of 2,
    // 4=(120,55) dominated by 2, 5=(200,70), 6=(250,70) dominated by 5,
    // 7=(100,40) dominated at its own price → frontier {1,2,3,5}
    Seq((1L, 0.50), (2L, 1.00), (3L, 1.00), (4L, 1.20),
        (5L, 2.00), (6L, 2.50), (7L, 1.00))
      .toDF("p_partkey", "p_retailprice")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    Seq((1L, 50.0), (2L, 60.0), (3L, 60.0), (4L, 55.0),
        (5L, 70.0), (6L, 70.0), (7L, 40.0))
      .toDF("l_partkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = run("q56_skyline", d).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("price_c"),
        r.getAs[Long]("demand"))).toSeq
    assert(got == Seq((1L, 50L, 50L), (2L, 100L, 60L),
      (3L, 100L, 60L), (5L, 200L, 70L)), got)
    // sf: window formulation must equal the brute-force O(n²) dominance
    // scan (the oracle's shape) replayed driver-side
    val pts = Tables(spark, sf, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(expr("CAST(round(l_quantity, 0) AS BIGINT)")).as("dem"))
      .join(Tables(spark, sf, "part"),
        col("p_partkey") === col("l_partkey"))
      .select(col("p_partkey"),
        expr("CAST(round(p_retailprice * 100, 0) AS BIGINT)").as("pc"),
        col("dem"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = pts.filter { case (_, pc, dem) =>
      !pts.exists { case (_, qc, qd) =>
        qc <= pc && qd >= dem && (qc < pc || qd > dem) }
    }.sortBy(p => (p._2, p._1)).toSeq
    val sfGot = run("q56_skyline").collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("price_c"),
        r.getAs[Long]("demand"))).toSeq
    assert(sfGot == brute, s"window skyline differs from brute force")
  }

  test("q57 top-5 + OTHER rollup replays exactly; shares are floor bp") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("q57").toString
    // 7 nations, revenues 700..100 → top5 A..E, OTHER = F+G = 300
    val names = Seq("A", "B", "C", "D", "E", "F", "G")
    names.zipWithIndex.map { case (n, i) => (i, n) }
      .toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$d/nation.parquet")
    names.indices.map(i => (i.toLong, i))
      .toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    names.indices.map(i => (i.toLong, i.toLong, (700 - 100 * i).toDouble))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val got = run("q57_top_others", d).collect()
      .map(r => (r.getAs[String]("nation"), r.getAs[Long]("n_orders"),
        r.getAs[Double]("revenue"), r.getAs[Long]("share_bp"))).toSeq
    // total 2800; e.g. 600·10000 div 2800 = 2142 (floor, exact ints)
    assert(got == Seq(("A", 1L, 700.0, 2500L), ("B", 1L, 600.0, 2142L),
      ("C", 1L, 500.0, 1785L), ("D", 1L, 400.0, 1428L),
      ("E", 1L, 300.0, 1071L), ("OTHER", 2L, 300.0, 1071L)), got)
    // sf: ≤6 rows, OTHER collapses the 20 tail nations, shares ≤ 10000
    val sfRows = run("q57_top_others").collect()
    assert(sfRows.length == 6, sfRows.length)
    assert(sfRows.count(_.getAs[String]("nation") == "OTHER") == 1)
    assert(sfRows.map(_.getAs[Long]("share_bp")).sum <= 10000L)
  }

  test("q58 histogram median nails odd/even/tied groups; sf matches a sort") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("q58").toString
    // A: {1,2,3} → 2.0 (odd); B: {1,2,3,4} → 2.5 (even, .5 case);
    // C: {5,5,5,9} → 5.0 (both middles inside the tied value)
    val rows = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 1.0), ("B", 2.0), ("B", 3.0), ("B", 4.0),
      ("C", 5.0), ("C", 5.0), ("C", 5.0), ("C", 9.0))
    rows.toDF("l_returnflag", "l_quantity")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = run("q58_group_median", d).collect()
      .map(r => (r.getAs[String]("flag"), r.getAs[Long]("n"),
        r.getAs[Double]("median"))).toSeq
    assert(got == Seq(("A", 3L, 2.0), ("B", 4L, 2.5), ("C", 4L, 5.0)), got)
    // sf: the histogram path must equal a driver-side full sort
    val vals = Tables(spark, sf, "lineitem")
      .select(col("l_returnflag"), expr("CAST(round(l_quantity, 0) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (f, vs) =>
        val s = vs.map(_._2).sorted
        val n = s.length
        f -> ((n.toLong, (s((n - 1) / 2) + s(n / 2)).toDouble / 2.0))
      }
    val sfGot = run("q58_group_median").collect()
      .map(r => r.getAs[String]("flag") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("median")))).toMap
    assert(sfGot == vals, s"histogram median differs from sorted replay")
  }

  test("q59 latest-per-key: date wins, orderkey breaks same-day ties") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("q59").toString
    Seq((10L, 1L, "2024-01-05", 5.0), (20L, 1L, "2024-03-01", 7.0),
        (30L, 2L, "2024-02-02", 9.0), (31L, 2L, "2024-02-02", 3.0))
      .toDF("o_orderkey", "o_custkey", "ds", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"),
        to_timestamp(col("ds")).as("o_orderdate"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val got = run("q59_latest_order", d).collect()
      .map(r => (r.getAs[Long]("custkey"), r.getAs[Long]("n_orders"),
        r.getAs[Long]("last_orderkey"), r.getAs[Double]("last_price")))
      .toSeq
    assert(got == Seq((1L, 2L, 20L, 7.0), (2L, 2L, 31L, 3.0)), got)
    // sf: the aggregate argmax must equal a driver-side sort-per-key
    val rows = Tables(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).map { case (c, os) =>
      c -> os.maxBy(o => (o._3, o._2))._2 }
    val sfGot = run("q59_latest_order").collect()
      .map(r => r.getAs[Long]("custkey") -> r.getAs[Long]("last_orderkey"))
      .toMap
    assert(sfGot == want, "aggregate argmax differs from sorted replay")
  }

  test("q59 packing boundary: Long.MaxValue orderkey cannot outrank a " +
       "later day (the r9 BIGINT·10¹⁰ packing inverted here)") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("q59b").toString
    // Under the old packing day·10¹⁰ + key in BIGINT, key=2⁶³−1 on
    // Jan 1 packs LARGER than key=1 on Jan 2 (the key bleeds 9 digits
    // into the day component); the DECIMAL day·10¹⁹ packing is
    // injective for every int64 key, so the later day must win.
    Seq((Long.MaxValue, 1L, "2024-01-01", 5.0),
        (1L, 1L, "2024-01-02", 7.0),
        // and within one day the bigger key still wins
        (Long.MaxValue, 2L, "2024-01-01", 2.0),
        (7L, 2L, "2024-01-01", 3.0))
      .toDF("o_orderkey", "o_custkey", "ds", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"),
        to_timestamp(col("ds")).as("o_orderdate"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val got = run("q59_latest_order", d).collect()
      .map(r => r.getAs[Long]("custkey") ->
        (r.getAs[Long]("last_orderkey"), r.getAs[Double]("last_price")))
      .toMap
    assert(got == Map(1L -> (1L, 7.0), 2L -> (Long.MaxValue, 2.0)), got)
  }

  test("q56 band boundary: edge-exact prices and a wide price range " +
       "replay the brute-force frontier") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("q56b").toString
    // Prices straddling the 8192¢ band edge (8191 / 8192 / 16384) plus
    // a far-out band (10⁷¢ → band 1220): the band prefix must carry
    // dominance ACROSS the edge (8191 dominates 8192 here), a band's
    // first price has an empty in-band frame, and a sparse band table
    // (most bands empty) must not confuse the prefix combine.
    val parts = Seq(
      (1L, 81.91, 50.0),   // band 0 edge-1: frontier (cheapest)
      (2L, 81.92, 40.0),   // band 1 first price: dominated by 1 across edge
      (3L, 81.92, 60.0),   // band 1 same price: frontier (more demand)
      (4L, 163.84, 60.0),  // band 2 first price: dominated by 3 (ties
                           //   on demand, strictly pricier)
      (5L, 163.84, 70.0),  // band 2: frontier
      (6L, 100000.00, 70.0), // band 1220: dominated by 5 (same demand)
      (7L, 100000.00, 99.0)) // band 1220: frontier (max demand)
    parts.map(p => (p._1, p._2)).toDF("p_partkey", "p_retailprice")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    parts.map(p => (p._1, p._3)).toDF("l_partkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = run("q56_skyline", d).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("price_c"),
        r.getAs[Long]("demand"))).toSeq
    val pts = parts.map(p =>
      (p._1, math.round(p._2 * 100), math.round(p._3)))
    val brute = pts.filter { case (_, pc, dem) =>
      !pts.exists { case (_, qc, qd) =>
        qc <= pc && qd >= dem && (qc < pc || qd > dem) }
    }.sortBy(p => (p._2, p._1))
    assert(got == brute, s"got $got, brute $brute")
    assert(got.map(_._1) == Seq(1L, 3L, 5L, 7L), got)
  }

  test("q60 TPC-DS Q2 shape: every ratio replays from brute-force weekly " +
       "micros; weeks are year-2000 Mondays") {
    import java.time.LocalDate
    import java.time.temporal.ChronoUnit
    val rows = run("q60_tpcds_q2_yoy_weekly").collect()
    assert(rows.nonEmpty)
    // brute-force (wk, dow) -> exact micros, replaying dsumRaw's per-row
    // rounding (BigDecimal.valueOf = shortest repr, HALF_UP at 6 dp —
    // the same path Spark's double->DECIMAL(30,6) cast takes)
    def stream(tbl: String, dc: String, pc: String) =
      Tables(spark, sf, tbl)
        .select(col(dc).cast("date").as("sd"), col(pc).as("price"))
        .collect()
        .map(r => (r.getAs[java.sql.Date]("sd").toLocalDate,
          r.getAs[Double]("price")))
    val all = stream("lineitem", "l_shipdate", "l_extendedprice") ++
      stream("orders", "o_orderdate", "o_totalprice")
    val epoch = LocalDate.parse("1970-01-05") // a Monday
    val micros: Map[(Long, Long), BigInt] = all
      .groupBy { case (d, _) =>
        val days = ChronoUnit.DAYS.between(epoch, d)
        (days / 7, days % 7)
      }
      .map { case (k, xs) =>
        k -> xs.map { case (_, p) =>
          BigInt(java.math.BigDecimal.valueOf(p)
            .setScale(6, java.math.RoundingMode.HALF_UP)
            .movePointRight(6).toBigIntegerExact)
        }.sum
      }
    val dayNames = Seq("mon", "tue", "wed", "thu", "fri", "sat", "sun")
    rows.foreach { r =>
      val wk = r.getAs[Long]("wk")
      // the week's Monday lies in 2000 (the Q2 d_year filter)
      assert(epoch.plusDays(wk * 7).getYear == 2000, s"wk $wk")
      dayNames.zipWithIndex.foreach { case (nm, i) =>
        val y = micros.get((wk, i.toLong))
        val z = micros.get((wk + 52, i.toLong))
        val expected: Option[Long] = (y, z) match {
          case (Some(a), Some(b)) if b > 0 => Some(((a * 10000) / b).toLong)
          case _ => None
        }
        val got = Option(r.getAs[Any](s"${nm}_bp")).map(_.asInstanceOf[Long])
        assert(got == expected, s"wk $wk $nm: got $got expected $expected")
      }
    }
  }

  test("q61 TPC-DS Q5 shape: grand total replays from one conditional " +
       "pass; channel partition is complete; returns never exceed sales") {
    import graft.functions.AggFns.dsumRaw
    val rows = run("q61_tpcds_q5_channel_rollup").collect()
    val total = rows.filter(_.getAs[String]("channel") == "TOTAL")
    assert(total.length == 1 &&
      total.head.getAs[String]("segment") == "ALL")
    val chanAll = rows.filter(r => r.getAs[String]("segment") == "ALL" &&
      r.getAs[String]("channel") != "TOTAL")
    assert(chanAll.map(_.getAs[String]("channel")).sorted.toSeq ==
      Seq("economy", "express", "standard"), chanAll.toSeq)
    // returned rows are a subset of sales rows, so per group returns<=sales
    rows.foreach { r =>
      assert(r.getAs[Double]("returns_amt") <= r.getAs[Double]("sales") + 1e-6)
    }
    // grand total from an INDEPENDENT single-pass conditional aggregate
    // (no explode, no rollup): each leg dsumRaw'd separately because the
    // query rounds the sales leg and the return leg as separate rows
    val f = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
    val ep = col("l_extendedprice")
    val exp = f.agg(
      round(dsumRaw(ep), 2).cast("double").as("sales"),
      round(dsumRaw(when(col("l_returnflag") === "R", ep)), 2)
        .cast("double").as("returns_amt"),
      round(dsumRaw(ep * (lit(1.0) - col("l_discount")) - ep * col("l_tax")) +
          dsumRaw(when(col("l_returnflag") === "R",
            -(ep * col("l_tax")))), 2)
        .cast("double").as("profit")).collect()(0)
    val got = total.head
    Seq("sales", "returns_amt", "profit").foreach { c =>
      assert(got.getAs[Double](c) == exp.getAs[Double](c),
        s"$c: ${got.getAs[Double](c)} vs ${exp.getAs[Double](c)}")
    }
  }
}
