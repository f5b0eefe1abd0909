package graft

import org.apache.spark.sql.functions._

class TextAndEventsSpec extends SparkSpecBase {

  test("t01 token counts are positive and n_chars matches source") {
    val rows = run("t01_token_count").collect()
    assert(rows.length == Tables(spark, sf, "documents").count())
    assert(rows.forall(_.getAs[Long]("n_tokens") > 0))
  }

  test("t02 ratios live in [0,1]") {
    val rows = run("t02_quality_score").collect()
    assert(rows.forall { r =>
      val p = r.getAs[Double]("punct_ratio"); val s = r.getAs[Double]("stopword_ratio")
      p >= 0 && p <= 1 && s >= 0 && s <= 1
    })
  }

  test("t03 lang-id predicts a label for every doc") {
    val rows = run("t03_lang_id").collect()
    assert(rows.length == Tables(spark, sf, "documents").count())
    val langs = Set("en", "de", "zh", "fr", "es")
    assert(rows.forall(r => langs.contains(r.getAs[String]("pred_lang"))))
  }

  test("t04 bigram frequencies are sorted desc and bounded by 100") {
    val rows = run("t04_ngram_freq").collect()
    assert(rows.length <= 100)
    val freqs = rows.map(_.getAs[Long]("freq"))
    assert(freqs.sameElements(freqs.sortBy(-_)))
  }

  test("e01 window totals equal the table total") {
    val win = run("e01_windowed_agg").collect()
    assert(win.map(_.getAs[Long]("cnt")).sum == Tables(spark, sf, "events").count())
  }

  test("e03 session counts: users' events sum to table size") {
    val rows = run("e03_sessionize").collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables(spark, sf, "events").count())
    assert(rows.forall(r => r.getAs[Long]("n_sessions") >= 1))
  }

  test("m02 feature columns are an 8-bin distribution summing to ~1") {
    val rows = run("m02_feature_extract").collect()
    assert(rows.forall { r =>
      val f = (0 until 8).map(i => r.getAs[Double](s"f$i"))
      // rounded to 6 decimals per bin → the sum is 1 within 8 * 5e-7
      f.forall(v => v >= 0.0 && v <= 1.0) && math.abs(f.sum - 1.0) < 4e-6
    })
  }

  test("e07 flags exactly the planted spike window and nothing else") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-e07").toString
    // 10 flat hourly windows of 5 events + one 50-event spike at hour 10:
    // W=11, S=100, SS=2750 → spike dev²=450²=202500 > 9·(11·2750−100²)
    // =182250; flat dev²=45²=2025 — only the spike crosses the 3σ line.
    val rows = (0 until 10).flatMap { h =>
      (0 until 5).map(i => (h * 5L + i,
        java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:10:00"),
        1L, "view", 1.0, """{"k": 1}"""))
    } ++ (0 until 50).map(i => (100L + i,
      java.sql.Timestamp.valueOf("2024-03-01 10:20:00"),
      1L, "view", 1.0, """{"k": 1}"""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = run("e07_spike_detect", d).collect()
    assert(out.length == 11)
    val spikes = out.filter(_.getAs[Boolean]("spike"))
    assert(spikes.length == 1 && spikes.head.getAs[Long]("n") == 50L,
      out.mkString(";"))
  }

  test("e07 window counts on sf data cover the whole table, flags rerun identically") {
    val out = run("e07_spike_detect").collect()
    assert(out.map(_.getAs[Long]("n")).sum ==
      Tables(spark, sf, "events").count())
    val rerun = run("e07_spike_detect").collect()
    assert(out.map(_.toString).sorted.sameElements(rerun.map(_.toString).sorted))
  }

  test("e06 cohort offset-0 rows cover every user exactly once") {
    val rows = run("e06_retention").collect()
    assert(rows.forall { r =>
      val o = r.getAs[Long]("day_offset"); o >= 0 && o <= 7
    })
    val day0Users = rows.filter(_.getAs[Long]("day_offset") == 0L)
      .map(_.getAs[Long]("n_users")).sum
    val users = Tables(spark, sf, "events").select("user_id").distinct().count()
    assert(day0Users == users) // every user is active on their first day
  }

  test("t07 familiarity = driver replay; hot/cold split does not change answers") {
    import org.apache.spark.sql.functions._
    // driver replay on sf data: unigram counts then per-doc sums
    val toks = Tables(spark, sf, "documents")
      .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")).as("t"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[String]]("t").toSeq)
    val counts = toks.flatMap(_._2).groupBy(identity).map { case (w, xs) =>
      w -> xs.length.toLong }
    val expected = toks.map { case (id, ws) =>
      id -> (ws.map(counts).sum, ws.length.toLong) }.toMap
    val got = run("t07_token_familiarity").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("fam_sum"), r.getAs[Long]("n_tok"))).toMap
    assert(got == expected)
    // hot path non-vacuous on sf data (small synthetic vocab: every
    // token is hot there)
    val total = counts.values.sum
    assert(counts.values.exists(_ > total / 1000), "no hot token in corpus")
    // both paths non-vacuous on a planted corpus: 1 doc of 2000 common
    // tokens (hot) + 1 doc with rare tokens (cold); answers exact
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t07").toString
    Seq(
      (1L, Seq.fill(2000)("common").mkString(" "), "en", 100L),
      (2L, "rare1 rare2 common", "en", 20L))
      .toDF("doc_id", "text", "lang", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = run("t07_token_familiarity", dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("fam_sum"), r.getAs[Long]("n_tok"))).toMap
    // common count = 2001 (hot: > 2003/1000); rare1/rare2 count 1 (cold)
    assert(planted == Map(1L -> (2000L * 2001L, 2000L),
      2L -> (1L + 1L + 2001L, 3L)))
  }

  test("t08 bigram surprisal = exact driver replay of the corpus MLE") {
    // mirror Spark's round(): BigDecimal.valueOf (shortest decimal
    // string) + HALF_UP, not the exact-binary BigDecimal(double)
    def r(x: Double, dp: Int): BigDecimal =
      BigDecimal(java.math.BigDecimal.valueOf(x))
        .setScale(dp, BigDecimal.RoundingMode.HALF_UP)
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
      .collect()
      .map(row => row.getAs[Long]("doc_id") -> row.getAs[String]("text"))
    val bigrams = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq
        .sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    }.filter(_._2.nonEmpty)
    val cb = bigrams.flatMap(_._2).groupBy(identity)
      .map { case (g, xs) => g -> xs.length.toLong }
    val cp = cb.toSeq.groupBy(_._1.split(" ")(0))
      .map { case (w, m) => w -> m.map(_._2).sum }
    val expect = bigrams.map { case (id, bgs) =>
      val s = bgs.map(g =>
        r(math.log(cp(g.split(" ")(0)).toDouble / cb(g)), 6)).sum
      id -> ((bgs.length.toLong, r(s.toDouble / bgs.length, 4).toDouble))
    }.toMap
    val got = run("t08_bigram_lm").collect()
      .map(row => row.getAs[Long]("doc_id") ->
        ((row.getAs[Long]("n_bigrams"), row.getAs[Double]("avg_nll")))).toMap
    assert(got == expect)
    // surprisal is non-negative by construction (cp >= cb)
    assert(got.values.forall(_._2 >= 0.0))
  }

  test("t09 lexical diversity = exact driver replay") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val expect = docs.map { case (id, t) =>
      val counts = t.trim.toLowerCase.split("\\s+").toSeq
        .groupBy(identity).map(_._2.length)
      val nTok = counts.sum.toLong
      id -> ((nTok, counts.size.toLong, counts.count(_ == 1).toLong,
        counts.size * 2 >= nTok))
    }.toMap
    val got = run("t09_lexical_diversity").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Long]("n_hapax"), r.getAs[Boolean]("diverse")))).toMap
    assert(got == expect)
    // hapax ⊆ types ⊆ tokens
    assert(got.values.forall { case (nt, ty, ha, _) => ha <= ty && ty <= nt })
  }

  test("t10 readability = exact driver replay; flag is pure-integer") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val expect = docs.map { case (id, t) =>
      // Spark/DuckDB trim() strips SPACES only — not \n\t like Scala's
      // String.trim — so the replay must strip spaces only too
      val nSent = t.split("[.!?]+", -1)
        .count(_.replaceAll("^ +| +$", "").nonEmpty).toLong
      val nWords = t.trim.toLowerCase.split("\\s+").length.toLong
      val nLet = t.count(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')).toLong
      id -> ((nSent, nWords, nLet,
        nWords <= nSent * 30 && nLet <= nWords * 10))
    }.toMap
    val got = run("t10_readability").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_sentences"), r.getAs[Long]("n_words"),
          r.getAs[Long]("n_letters"), r.getAs[Boolean]("readable")))).toMap
    assert(got == expect)
  }

  test("t11 keywords = driver replay of the per-doc top-3 tfidf rank") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val tokens = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val df = tokens.flatMap(_._2.distinct).groupBy(identity)
      .map { case (w, xs) => w -> xs.length }
    val nDocs = docs.length.toDouble
    val expect = tokens.flatMap { case (id, toks) =>
      val len = toks.length.toDouble
      toks.groupBy(identity).toSeq.map { case (w, xs) =>
        (id, w, sparkRound(xs.length / len * math.log(nDocs / df(w)), 4))
      }.sortBy { case (_, w, sc) => (-sc, w) }.take(3).zipWithIndex
        .map { case ((i, w, sc), k) => (i, k + 1L) -> ((w, sc)) }
    }.toMap
    val got = run("t11_keyword_extract").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rk")) ->
        ((r.getAs[String]("tok"), r.getAs[Double]("score")))).toMap
    assert(got == expect)
    assert(got.keys.groupBy(_._1).values.forall(_.size <= 3))
  }

  test("e12 hourly profile = driver replay; shares reconcile per type") {
    val ev = Tables(spark, sf, "events").select("ts", "event_type").collect()
      .map(r => ((evMicros(r.getAs[Any]("ts")) / 3600000000L) % 24,
        r.getAs[String]("event_type")))
    val n = ev.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val nType = ev.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val expect = n.map { case ((hr, t), c) =>
      (hr, t) -> ((c, nType(t), sparkRound(c.toDouble / nType(t), 6))) }
    val got = run("e12_hourly_profile").collect()
      .map(r => (r.getAs[Long]("hr"), r.getAs[String]("event_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_type"),
          r.getAs[Double]("share")))).toMap
    assert(got == expect)
    // per-type counts reconcile exactly to the type totals
    got.groupBy(_._1._2).foreach { case (t, cells) =>
      assert(cells.values.map(_._1).sum == nType(t), t)
    }
  }

  test("e13 variant extraction = regex replay; malformed props yield NULL") {
    val ev = Tables(spark, sf, "events")
      .select("event_type", "props").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("props")))
    val kRe = "\"k\": ([0-9]+)".r
    val expect = ev.groupBy(_._1).map { case (t, xs) =>
      val ks = xs.flatMap(x =>
        kRe.findFirstMatchIn(x._2).map(_.group(1).toLong))
      t -> ((xs.length.toLong, ks.length.toLong, ks.min, ks.max,
        ks.distinct.length.toLong))
    }
    val got = run("e13_variant_extract").collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_with_k"),
          r.getAs[Long]("min_k"), r.getAs[Long]("max_k"),
          r.getAs[Long]("distinct_k")))).toMap
    assert(got == expect)
    // malformed / missing-key payloads land in NULL k, never a crash
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("e13").toString
    Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view", 1.0, "{\"k\": 5}"),
      (1L, "2024-01-01 10:01:00", 2L, "view", 1.0, "not json at all"),
      (1L, "2024-01-01 10:02:00", 3L, "view", 1.0, "{\"other\": 1}"))
      .toDF("user_id", "tss", "event_id", "event_type", "value", "props")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val planted = run("e13_variant_extract", dir).collect()
    assert(planted.length == 1)
    assert(planted.head.getAs[Long]("n") == 3L)
    assert(planted.head.getAs[Long]("n_with_k") == 1L)
    assert(planted.head.getAs[Long]("min_k") == 5L)
  }

  test("e08 journeys = driver replay of the first-8 path distribution") {
    def micros(a: Any): Long = a match {
      case t: java.sql.Timestamp =>
        t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
      case d: java.time.LocalDateTime =>
        d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
      case x => sys.error(s"unexpected timestamp class ${x.getClass}")
    }
    val ev = Tables(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
    val paths = ev.groupBy(_.getAs[Long]("user_id")).values.map { rows =>
      rows.sortBy(row =>
          (micros(row.getAs[Any]("ts")), row.getAs[Long]("event_id")))
        .take(8).map(_.getAs[String]("event_type")).mkString(">")
    }.toSeq
    val top = paths.groupBy(identity)
      .map { case (j, xs) => j -> xs.length.toLong }.toSeq
      .sortBy { case (j, n) => (-n, j) }.take(20)
    val got = run("e08_user_journey").collect()
      .map(row =>
        row.getAs[String]("journey") -> row.getAs[Long]("n_users")).toSeq
    assert(got == top)
    assert(got.forall(_._1.split(">").length <= 8))
  }

  private def evMicros(a: Any): Long = a match {
    case t: java.sql.Timestamp =>
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
    case d: java.time.LocalDateTime =>
      val i = d.toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case x => sys.error(s"unexpected timestamp class ${x.getClass}")
  }

  private def sparkRound(x: Double, dp: Int): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("e09 transitions = driver replay; per-from probabilities sum to ~1") {
    val ev = Tables(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
    val pairs = ev.groupBy(_.getAs[Long]("user_id")).values.toSeq.flatMap {
      rows =>
        val sorted = rows.sortBy(r =>
          (evMicros(r.getAs[Any]("ts")), r.getAs[Long]("event_id")))
          .map(_.getAs[String]("event_type"))
        sorted.zip(sorted.drop(1))
    }
    val n = pairs.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val nFrom = pairs.groupBy(_._1).map { case (k, xs) => k -> xs.length.toLong }
    val expect = n.map { case ((f, to), c) =>
      (f, to) -> ((c, nFrom(f), sparkRound(c.toDouble / nFrom(f), 6))) }
    val got = run("e09_transition_matrix").collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_from"),
          r.getAs[Double]("p")))).toMap
    assert(got == expect)
    // MLE rows per from_type sum to the from-total exactly (integers)
    got.groupBy(_._1._1).foreach { case (f, rows) =>
      assert(rows.values.map(_._1).sum == rows.values.head._2, f)
    }
  }

  test("e10 attribution = driver replay; planted no-touch purchase lands in 'none'") {
    val ev = Tables(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
    val credited = ev.groupBy(_.getAs[Long]("user_id")).values.toSeq.flatMap {
      rows =>
        val sorted = rows.sortBy(r =>
          (evMicros(r.getAs[Any]("ts")), r.getAs[Long]("event_id")))
        var lastTouch: String = null
        sorted.flatMap { r =>
          val et = r.getAs[String]("event_type")
          val out = if (et == "purchase")
            Some((if (lastTouch == null) "none" else lastTouch,
              r.getAs[Double]("value")))
          else None
          if (et == "view" || et == "click") lastTouch = et
          out
        }
    }
    val expect = credited.groupBy(_._1).map { case (ch, xs) =>
      val s = xs.map(x => BigDecimal(java.math.BigDecimal.valueOf(x._2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      ch -> ((xs.length.toLong,
        s.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = run("e10_attribution").collect()
      .map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_purchases"), r.getAs[Double]("total_value")))).toMap
    assert(got == expect)
    // planted: purchase before any touch → none; touch AFTER a purchase
    // must not be credited backwards
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("e10").toString
    Seq(
      (1L, "2024-01-01 00:00:00", 10L, "purchase", 5.0),  // no prior touch
      (1L, "2024-01-01 00:01:00", 11L, "click", 0.0),
      (1L, "2024-01-01 00:02:00", 12L, "view", 0.0),
      (1L, "2024-01-01 00:03:00", 13L, "purchase", 7.0),  // credits view
      (2L, "2024-01-01 00:00:30", 20L, "purchase", 1.0))  // other user: none
      .toDF("user_id", "tss", "event_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val planted = run("e10_attribution", dir).collect()
      .map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_purchases"), r.getAs[Double]("total_value")))).toMap
    assert(planted == Map("none" -> ((2L, 6.0)), "view" -> ((1L, 7.0))))
  }

  test("e11 RFM segments = exact driver replay; users are partitioned") {
    val ev = Tables(spark, sf, "events")
      .select("user_id", "ts", "event_type", "value").collect()
    def dec6(x: Double): BigDecimal =
      BigDecimal(java.math.BigDecimal.valueOf(x))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val mx = ev.map(r => evMicros(r.getAs[Any]("ts"))).max
    val expect = ev.groupBy(_.getAs[Long]("user_id")).values.toSeq.map { rows =>
      val last = rows.map(r => evMicros(r.getAs[Any]("ts"))).max
      val f = rows.length.toLong
      val purch = rows.filter(_.getAs[String]("event_type") == "purchase")
      val mon = if (purch.isEmpty) None
        else Some(purch.map(r => dec6(r.getAs[Double]("value"))).sum)
      val r2 = if (mx - last <= 14400000000L) 2L
        else if (mx - last <= 43200000000L) 1L else 0L
      val f2 = if (f >= 70) 2L else if (f >= 62) 1L else 0L
      val m2 = mon.map(m => if (m >= 700) 2L else if (m >= 550) 1L else 0L)
        .getOrElse(0L)
      ((r2, f2, m2), mon.getOrElse(BigDecimal(0)))
    }.groupBy(_._1).map { case (k, xs) =>
      k -> ((xs.length.toLong,
        xs.map(_._2).sum.setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .toDouble))
    }
    val got = run("e11_rfm_segments").collect()
      .map(r => (r.getAs[Long]("r_bucket"), r.getAs[Long]("f_bucket"),
        r.getAs[Long]("m_bucket")) ->
        ((r.getAs[Long]("n_users"), r.getAs[Double]("segment_value")))).toMap
    assert(got == expect)
    // segments partition the user base
    assert(got.values.map(_._1).sum ==
      ev.map(_.getAs[Long]("user_id")).distinct.length)
  }

  test("e14 active users: grains reconcile; day actives ≤ containing week") {
    val rows = run("e14_active_users").collect()
    val events = Tables(spark, sf, "events")
    val total = events.count()
    val days = rows.filter(_.getAs[String]("grain") == "day")
    val weeks = rows.filter(_.getAs[String]("grain") == "week")
    assert(days.nonEmpty && weeks.nonEmpty)
    // every event lands in exactly one bucket per grain
    assert(days.map(_.getAs[Long]("events")).sum == total)
    assert(weeks.map(_.getAs[Long]("events")).sum == total)
    // the dump's bucket surfaces as LocalDateTime (NTZ) or Timestamp
    // (LTZ under the UTC session) depending on the cast path — normalize
    def toLdt(x: Any): java.time.LocalDateTime = x match {
      case t: java.time.LocalDateTime => t
      case t: java.sql.Timestamp => t.toLocalDateTime
    }
    // a day's distinct users are a subset of its ISO week's
    val wau = weeks.map(r => toLdt(r.get(r.fieldIndex("bucket"))) ->
      r.getAs[Long]("active_users")).toMap
    days.foreach { r =>
      val dayStart = toLdt(r.get(r.fieldIndex("bucket")))
      val weekStart = dayStart.toLocalDate
        .`with`(java.time.DayOfWeek.MONDAY).atStartOfDay
      assert(r.getAs[Long]("active_users") <= wau(weekStart),
        s"day $dayStart vs week $weekStart")
    }
    // exact DAU replay
    val ev = events.collect().map(r =>
      (r.get(r.fieldIndex("ts")), r.getAs[Long]("user_id")))
    val byDay = ev.groupBy(x => toLdt(x._1).toLocalDate)
      .map { case (d, xs) => d -> xs.map(_._2).distinct.length.toLong }
    days.foreach { r =>
      val d = toLdt(r.get(r.fieldIndex("bucket"))).toLocalDate
      assert(r.getAs[Long]("active_users") == byDay(d), s"DAU $d")
    }
  }

  test("e15 session stats reconcile with e03's sessionization") {
    val rows = run("e15_session_stats").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_sessions"),
        r.getAs[Long]("n_events_total"), r.getAs[Double]("avg_dur_sec")))
    val e03 = run("e03_sessionize").collect()
    // every event lands in exactly one session; session counts agree
    assert(rows.map(_._3).sum == Tables(spark, sf, "events").count())
    assert(rows.map(_._2).sum == e03.map(_.getAs[Long]("n_sessions")).sum)
    // buckets ordered, durations nonnegative, singleton bucket = 0s
    assert(rows.map(_._1).sorted.sameElements(rows.map(_._1)))
    assert(rows.forall(_._4 >= 0))
    rows.find(_._1 == 1L).foreach { r => assert(r._4 == 0.0) }
  }

  test("e16 trending: per-day top-3 replayed; shares bounded") {
    val rows = run("e16_trending").collect()
      .map(r => (r.get(r.fieldIndex("day")), r.getAs[Long]("rk"),
        r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Double]("share")))
    assert(rows.nonEmpty)
    val events = Tables(spark, sf, "events").collect()
      .map(r => (r.get(r.fieldIndex("ts")), r.getAs[String]("event_type")))
    def day(x: Any): java.time.LocalDate = (x match {
      case t: java.time.LocalDateTime => t
      case t: java.sql.Timestamp => t.toLocalDateTime
    }).toLocalDate
    val byDay = events.groupBy(e => day(e._1))
    rows.groupBy(_._1).foreach { case (d, rs) =>
      assert(rs.length <= 3)
      val ranked = rs.sortBy(_._2)
      // replay: count per type, order (cnt desc, type), take 3
      val cnts = byDay(day(d)).groupBy(_._2).view
        .mapValues(_.length.toLong).toMap
      val want = cnts.toSeq.sortBy { case (t, n) => (-n, t) }
        .take(rs.length)
      ranked.zip(want).foreach { case ((_, _, typ, n, share), (wt, wn)) =>
        assert(typ == wt && n == wn, s"day $d")
        assert(share > 0 && share <= 1)
      }
    }
  }

  test("e17 moving avg: RANGE frame does not reach across hour gaps") {
    // sf replay: trailing3 = sum of counts in hour-window [h-2, h]
    val rows = run("e17_moving_avg").collect()
      .map(r => (r.getAs[String]("event_type"),
        r.get(r.fieldIndex("hr")), r.getAs[Long]("n"),
        r.getAs[Long]("trailing3")))
    assert(rows.nonEmpty)
    def hrn(x: Any): Long = (x match {
      case t: java.time.LocalDateTime =>
        t.toEpochSecond(java.time.ZoneOffset.UTC)
      case t: java.sql.Timestamp => t.getTime / 1000L
    }) / 3600L
    rows.groupBy(_._1).values.foreach { part =>
      val byHr = part.map(r => hrn(r._2) -> r._3).toMap
      part.foreach { case (typ, hr, _, tr) =>
        val h = hrn(hr)
        val want = (h - 2 to h).flatMap(byHr.get).sum
        assert(tr == want, s"$typ @ $h")
      }
    }
    // planted gap: hours 0,1 then 5 — the trailing sum at hour 5 must
    // NOT include hours 0/1 (a ROWS frame would wrongly reach back)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("e17").toString
    def ev(id: Long, hour: Int, mins: Int) = (id,
      java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:$mins%02d:00"),
      1L, "click", 1.0, """{"k": 1}""")
    Seq(ev(1, 0, 0), ev(2, 0, 30), ev(3, 1, 0), ev(4, 5, 0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val planted = run("e17_moving_avg", dir).collect()
      .map(r => hrn(r.get(r.fieldIndex("hr"))) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("trailing3")))).toMap
    val base = planted.keys.min
    assert(planted(base) == ((2L, 2L)))
    assert(planted(base + 1) == ((1L, 3L)))      // hours 0+1 in frame
    assert(planted(base + 5) == ((1L, 1L)), planted.toString) // gap: alone
  }

  test("p19 fertility reconciles with t01's token counts per lang") {
    val rows = run("p19_tokenizer_fertility").collect()
    val docs = Tables(spark, sf, "documents").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("text")))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length)
    val byLang = docs.groupBy(_._1)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val toks = byLang(lang).map(_._2.trim.toLowerCase.split("\\s+").length.toLong).sum
      val chars = byLang(lang).map(_._2.length.toLong).sum
      assert(r.getAs[Long]("n_tokens") == toks, lang)
      assert(r.getAs[Long]("n_chars") == chars, lang)
      assert(r.getAs[Double]("chars_per_tok") > 0)
      assert(r.getAs[Double]("bytes_per_tok") >=
        r.getAs[Double]("chars_per_tok") - 1e-9, "bytes >= chars (UTF-8)")
    }
  }

  test("t12 zipf audit: ranks dense, counts nonincreasing, share exact") {
    val rows = run("t12_zipf_audit").collect()
    assert(rows.length <= 50 && rows.nonEmpty)
    val rks = rows.map(_.getAs[Long]("rk"))
    assert(rks.sameElements(1L to rows.length.toLong))
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // cumulative share is nondecreasing and ≤ 1
    val shares = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(shares.last <= 1.0)
    // replay: head counts match a driver-side token count
    val freq = Tables(spark, sf, "documents").collect()
      .flatMap(_.getAs[String]("text").trim.toLowerCase
        .split("\\s+"))
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
    val totalToks = freq.values.sum
    val expectHead = freq.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(rows.length)
    rows.zip(expectHead).foreach { case (r, (tok, n)) =>
      assert(r.getAs[String]("tok") == tok && r.getAs[Long]("n") == n)
    }
    val cum = expectHead.map(_._2).scanLeft(0L)(_ + _).tail
    rows.zip(cum).foreach { case (r, c) =>
      val want = BigDecimal(java.math.BigDecimal.valueOf(c.toDouble / totalToks))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("cum_share") - want) < 1e-9)
    }
  }

  test("e18 cohort LTV: cumulative replays exactly; cohorts precede activity") {
    val rows = run("e18_cohort_ltv").collect()
      .map(r => (r.get(r.fieldIndex("cohort_day")), r.get(r.fieldIndex("day")),
        r.getAs[Long]("n_buyers"), r.getAs[Double]("revenue"),
        r.getAs[Double]("cum_revenue")))
    assert(rows.nonEmpty)
    def us(x: Any): Long = x match {
      case t: java.time.LocalDateTime =>
        t.toEpochSecond(java.time.ZoneOffset.UTC)
      case t: java.sql.Timestamp => t.getTime / 1000L
    }
    // a cohort can only buy on or after its first-seen day
    rows.foreach { case (c, d, nb, rev, _) =>
      assert(us(d) >= us(c)); assert(nb >= 1L); assert(rev >= 0.0)
    }
    // cum_revenue = exact DECIMAL(30,2) running sum of the daily column
    rows.groupBy(_._1).values.foreach { part =>
      var cum = BigDecimal(0).setScale(2)
      part.sortBy(r => us(r._2)).foreach { case (_, d, _, rev, cr) =>
        cum += BigDecimal(java.math.BigDecimal.valueOf(rev)).setScale(2)
        assert(cr == cum.toDouble, s"cum at $d")
      }
    }
    // reconciliation: total last-day cum mass = all purchase revenue
    val lastCums = rows.groupBy(_._1).values
      .map(p => BigDecimal(java.math.BigDecimal.valueOf(
        p.maxBy(r => us(r._2))._5)))
      .sum
    val allRev = rows.map(r =>
      BigDecimal(java.math.BigDecimal.valueOf(r._4))).sum
    assert(lastCums == allRev)
  }

  test("e19 streaks: planted islands resolve exactly; sf invariants hold") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("e19").toString
    def ev(id: Long, user: Long, day: Int) = (id,
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"),
      user, "view", 1.0, """{"k": 1}""")
    // user 1: days 1,2,3 then 5,6 (two islands); a second event on day 2
    // must NOT lengthen anything. user 2: day 10 only.
    Seq(ev(1, 1, 1), ev(2, 1, 2), ev(3, 1, 2), ev(4, 1, 3), ev(5, 1, 5),
      ev(6, 1, 6), ev(7, 2, 10))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = run("e19_streaks", dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("longest_streak"), r.getAs[Long]("n_streaks"),
          r.getAs[Long]("n_active_days")))).toMap
    assert(got == Map(1L -> ((3L, 2L, 5L)), 2L -> ((1L, 1L, 1L))))
    // sf: active days = Σ streak lengths ≥ longest; all positive
    val sfRows = run("e19_streaks").collect()
    assert(sfRows.nonEmpty)
    sfRows.foreach { r =>
      assert(r.getAs[Long]("longest_streak") >= 1L)
      assert(r.getAs[Long]("n_active_days") >= r.getAs[Long]("longest_streak"))
      assert(r.getAs[Long]("n_streaks") >= 1L)
    }
  }

  test("t13 confusion matrix reconciles with t03's predictions") {
    val preds = run("t03_lang_id").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("pred_lang")))
    val want = preds.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val got = run("t13_langid_eval").collect()
      .map(r => ((r.getAs[String]("lang"), r.getAs[String]("pred_lang")),
        (r.getAs[Long]("n"), r.getAs[Double]("share"))))
    assert(got.map { case (k, (n, _)) => k -> n }.toMap == want)
    // shares replay via the exact integer scheme against per-lang totals
    val tot = want.groupBy(_._1._1).map { case (l, g) => l -> g.values.sum }
    got.foreach { case ((l, _), (n, sh)) =>
      val t = tot(l)
      assert(sh == ((n * 20000L + t) / (t * 2L)).toDouble / 10000.0)
    }
    // each doc counted exactly once
    assert(want.values.sum == preds.length.toLong)
  }

  test("e20 bot detection: metronome and burst flag, human cadence doesn't") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("e20").toString
    var id = 0L
    def ev(user: Long, sec: Int) = { id += 1
      (id, java.sql.Timestamp.valueOf(
        f"2024-01-01 10:${sec / 60}%02d:${sec % 60}%02d"),
        user, "view", 1.0, """{"k": 1}""") }
    val rows =
      // user 1: exactly every 5 s × 6 events → metronome regular
      (0 until 6).map(i => ev(1L, i * 5)) ++
      // user 2: human-ish irregular gaps, slow → neither flag
      Seq(37, 81, 160, 239, 361, 480).map(sec => ev(2L, sec)) ++
      // user 3: 6 events inside 3 s (irregular) → high rate only
      Seq(0, 1, 1, 2, 2, 3).map(sec => ev(3L, sec))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = run("e20_bot_detect", dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Boolean]("high_rate"), r.getAs[Boolean]("regular"),
          r.getAs[Boolean]("is_bot")))).toMap
    assert(got(1L)._2 && got(1L)._3, got(1L).toString) // regular → bot
    assert(got(1L)._1) // 6 events / 25 s is also high-rate
    assert(got(2L) == ((false, false, false)))
    assert(got(3L)._1 && !got(3L)._2 && got(3L)._3)
    // sf sanity: nobody in the random corpus is a metronome
    assert(run("e20_bot_detect").collect()
      .forall(!_.getAs[Boolean]("regular")))
  }

  test("e21 native sessions: exact-gap boundary opens a new session") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("e21").toString
    def ev(id: Long, t: String) = (id, java.sql.Timestamp.valueOf(t),
      1L, "view", 1.0, """{"k": 1}""")
    // events at 10:00, 10:29 (29-min gap: same session), 10:59
    // (EXACTLY 30 min later — Spark merges at the boundary, measured and
    // oracle-pinned: inclusive session end), then 11:29:01 (one second
    // PAST the merged session's end → a new session opens)
    Seq(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:29:00"),
      ev(3, "2024-01-01 10:59:00"), ev(4, "2024-01-01 11:29:01"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = run("e21_native_sessions", dir).collect()
    assert(got.length == 2)
    assert(got.map(_.getAs[Long]("n_events")).toSeq == Seq(3L, 1L))
    // merged session end = last event (10:59) + gap
    val endStr = got.head.get(got.head.fieldIndex("session_end")).toString
    assert(endStr.startsWith("2024-01-01T11:29") ||
      endStr.startsWith("2024-01-01 11:29"), endStr)
    // sf reconciliation: event mass is conserved across sessions
    val sfRows = run("e21_native_sessions").collect()
    val nEvents = Tables(spark, sf, "events")
      .filter(col("ts").isNotNull).count()
    assert(sfRows.map(_.getAs[Long]("n_events")).sum == nEvents)
  }

  test("t14 code detection: symbol-dense doc flags, prose doesn't") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t14").toString
    val code = "def f(x) { return (x + 1) * g(x); } // if (x > 0) { y = 2; }"
    val prose = "this is a perfectly ordinary sentence about nothing at all"
    Seq((1L, code), (2L, prose), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(coalesce(col("text"), lit(""))).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = run("t14_code_detect", dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_sym"), r.getAs[Boolean]("is_code")))).toMap
    assert(got(1L)._2, got(1L).toString)
    assert(!got(2L)._2 && got(2L)._1 == 0L)
    assert(got(3L) == ((0L, false))) // NULL text: empty, not code
    // sf corpus is word salad — no doc should route as code
    assert(run("t14_code_detect").collect()
      .forall(!_.getAs[Boolean]("is_code")))
  }

  test("t15 vocab growth is monotone and lands exactly on the corpus totals") {
    val rows = run("t15_vocab_growth").collect().sortBy(_.getAs[Long]("k"))
    assert(rows.length == 10)
    val v = rows.map(_.getAs[Long]("vocab_size"))
    val tk = rows.map(_.getAs[Long]("n_tokens"))
    val nd = rows.map(_.getAs[Long]("n_docs"))
    Seq(v, tk, nd).foreach(s =>
      assert(s.zip(s.tail).forall { case (a, b) => a <= b }, s.toSeq))
    // checkpoint 10's threshold is max_id+1 — the whole corpus
    val docs = Tables(spark, sf, "documents")
    assert(nd.last == docs.count())
    val totalVocab = docs.select(explode(
        graft.functions.TextFns.tokens(col("text"))).as("w"))
      .distinct().count()
    assert(v.last == totalVocab)
    // growth must be sublinear in tokens by the last checkpoint (Heaps):
    // the final decile adds fewer NEW types per token than the first
    val newTypesFirst = v.head.toDouble / tk.head
    val newTypesLast = (v.last - v(8)).toDouble / (tk.last - tk(8))
    assert(newTypesLast <= newTypesFirst, s"$newTypesLast vs $newTypesFirst")
  }

  test("e22 conversion lags bucket on exact integer boundaries") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("e22").toString
    def ts(min: Long, sec: Long = 0) =
      java.sql.Timestamp.valueOf(java.time.LocalDateTime
        .of(2024, 1, 1, 0, 0, 0).plusMinutes(min).plusSeconds(sec))
    // user 1 converts in 30 s (lt_1m); user 2's pre-view purchase is
    // ignored and the post-view one lands at exactly 2 h (1h_6h); user 3
    // purchases with no view and user 4 never purchases — both excluded;
    // user 5 converts at exactly 60 s (boundary goes UP: 1m_10m)
    Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(0, 30), 1L, "purchase", 1.0, "{}"),
      (3L, ts(10), 2L, "purchase", 1.0, "{}"),
      (4L, ts(20), 2L, "view", 1.0, "{}"),
      (5L, ts(140), 2L, "purchase", 1.0, "{}"),
      (6L, ts(5), 3L, "purchase", 1.0, "{}"),
      (7L, ts(5), 4L, "view", 1.0, "{}"),
      (8L, ts(0), 5L, "view", 1.0, "{}"),
      (9L, ts(1), 5L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = run("e22_conversion_lag", dir).collect()
      .map(r => r.getAs[String]("bucket") -> r.getAs[Long]("n_users")).toMap
    assert(got == Map("lt_1m" -> 1L, "1m_10m" -> 1L, "1h_6h" -> 1L), got)
    // sf invariant: every converting user lands in exactly one bucket
    val sfTotal = run("e22_conversion_lag").collect()
      .map(_.getAs[Long]("n_users")).sum
    assert(sfTotal > 0)
  }

  test("t16 charset classes partition the text; planted mojibake flags in bp") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t16").toString
    Seq(
      (0L, "abc XYZ 123 !?", "en"),     // 6 latin, 3 digit, 3 space, 2 punct
      (1L, "abéécd", "fr"))   // é twice → 2 "other" of 6 chars
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = run("t16_charset_audit", dir).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val en = got("en")
    assert((en.getAs[Long]("n_latin"), en.getAs[Long]("n_digit"),
      en.getAs[Long]("n_space"), en.getAs[Long]("n_punct"),
      en.getAs[Long]("n_other")) == ((6L, 3L, 3L, 2L, 0L)), en.toString)
    val fr = got("fr")
    assert(fr.getAs[Long]("n_other") == 2L &&
      fr.getAs[Long]("other_bp") == 2L * 10000 / 6, fr.toString)
    // classes partition: counts sum back to n_chars on the sf corpus
    run("t16_charset_audit").collect().foreach { r =>
      assert(r.getAs[Long]("n_latin") + r.getAs[Long]("n_digit") +
        r.getAs[Long]("n_space") + r.getAs[Long]("n_punct") +
        r.getAs[Long]("n_other") == r.getAs[Long]("n_chars"), r.toString)
    }
  }

  test("t17 source novelty: shared trigram counts once, unique source is 100%") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t17").toString
    // srcA {"a b c","b c d"} and srcB {"a b c","b c x"} share "a b c";
    // srcC's vocabulary is fully disjoint → novelty 100%
    Seq((0L, "a b c d", "srcA"), (1L, "a b c x", "srcB"),
        (2L, "q r s t", "srcC"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = run("t17_source_novelty", dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_unique"),
          r.getAs[Long]("novelty_bp")))).toMap
    assert(got == Map("srcA" -> ((2L, 1L, 5000L)),
      "srcB" -> ((2L, 1L, 5000L)), "srcC" -> ((2L, 2L, 10000L))), got)
  }

  test("t18 learned stopwords: head token in, tail out, blank/NULL docs " +
    "don't count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t18").toString
    // "the" appears in all 3 tokenizable docs (df 3/3 > 50%); every
    // other token has df 1/3; the NULL and whitespace-only docs must
    // count toward NEITHER df nor the doc denominator
    Seq((0L, "the quick fox"), (1L, "the lazy dog"), (2L, "the rare token"),
        (3L, null.asInstanceOf[String]), (4L, "   "))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", coalesce(length(col("text")), lit(0)).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = run("t18_learned_stopwords", dir).collect()
      .map(r => r.getAs[String]("tok") ->
        ((r.getAs[Long]("df"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("df_bp")))).toMap
    assert(got == Map("the" -> ((3L, 3L, 10000L))), got)
  }

  test("t19 truncation loss: exact mass accounting at each k, 0 once the " +
    "vocab fits") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t19").toString
    // counts: a=5, b=3, c=2, then 11 singletons → total 21, vocab 14.
    // top-10 covers 5+3+2+7·1 = 17 → oov (21-17)*10000 div 21 = 1904;
    // top-100/1000 cover everything
    val text = "a a a a a b b b c c " + ('d' to 'n').mkString(" ")
    Seq((0L, text)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = run("t19_truncation_loss", dir).collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("covered"), r.getAs[Long]("total"),
          r.getAs[Long]("oov_bp")))).toMap
    assert(got == Map(10L -> ((17L, 21L, 1904L)),
      100L -> ((21L, 21L, 0L)), 1000L -> ((21L, 21L, 0L))), got)
  }

  test("e23 MAD anomaly: a planted spike flags; metronome days don't") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("e23").toString
    def day(d: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, d, 12, 0, 0))
    // 'click': 10 events/day for 9 days, 100 on day 10 (spike);
    // 'view': exactly 5/day for 10 days (MAD 0 — only the spike-free
    // type's days all pass)
    val rows =
      (for (d <- 1 to 9; i <- 1 to 10) yield (d * 100L + i, day(d), i.toLong, "click", 1.0, "{}")) ++
      (for (i <- 1 to 100) yield (1000L + i, day(10), i.toLong, "click", 1.0, "{}")) ++
      (for (d <- 1 to 10; i <- 1 to 5) yield (2000L + d * 10L + i, day(d), i.toLong, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = run("e23_daily_anomaly", dir).collect()
    val clicks = got.filter(_.getAs[String]("event_type") == "click")
    assert(clicks.count(_.getAs[Boolean]("anomalous")) == 1)
    assert(clicks.filter(_.getAs[Boolean]("anomalous"))
      .head.getAs[Long]("n") == 100L)
    // view is a metronome: med 5, MAD 0, deviation 0 — 0 > 0 is false
    assert(got.filter(_.getAs[String]("event_type") == "view")
      .forall(!_.getAs[Boolean]("anomalous")))
  }

  test("e24 gini: planted concentration replays the closed form exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("e24").toString
    def ts(min: Long) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusMinutes(min))
    // per-user event counts 1, 1, 2, 4: sorted rank-sum A = 1+2+6+16 =
    // 25, G = (2·25 − 5·8)/(4·8) = 0.3125; top-1% = ceil(4/100) = 1 user
    // (the 4-event one) → share 4/8
    val rows = (Seq((1L, 1), (2L, 1), (3L, 2), (4L, 4)).flatMap {
      case (u, n) => (1 to n).map(i => (u * 100 + i, ts(u * 10 + i), u,
        "view", 1.0, "{}"))
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = run("e24_activity_gini", dir).collect().head
    assert(r.getAs[Long]("n_users") == 4L, r)
    assert(r.getAs[Long]("total_events") == 8L, r)
    assert(r.getAs[Long]("gini_ppm") == 312500L, r)
    assert(r.getAs[Long]("top1pct_share_bp") == 5000L, r)
    // sf invariants: G ∈ [0, 1), top-1% share ≥ its uniform floor
    val s = run("e24_activity_gini").collect().head
    assert(s.getAs[Long]("gini_ppm") >= 0 &&
      s.getAs[Long]("gini_ppm") < 1000000L, s)
    assert(s.getAs[Long]("top1pct_share_bp") * s.getAs[Long]("n_users")
      >= 10000L * ((s.getAs[Long]("n_users") + 99) / 100), s)
  }

  test("e24 gini is 0 on a perfectly uniform corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("e24u").toString
    def ts(min: Long) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusMinutes(min))
    (for (u <- 1L to 5L; i <- 1 to 3) yield
      (u * 10 + i, ts(u + i), u, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = run("e24_activity_gini", dir).collect().head
    assert(r.getAs[Long]("gini_ppm") == 0L, r)
    // 1 of 5 equal users holds exactly 1/5 of the mass
    assert(r.getAs[Long]("top1pct_share_bp") == 2000L, r)
  }

  test("t20 compressibility: repetitive and novel docs land in their deciles") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t20").toString
    Seq(
      (0L, "a a a a a"),     // 2 total 4-grams, 1 distinct → 5000 bp, decile 5
      (1L, "v w x y z"),     // 2 total, 2 distinct → 10000 bp, capped decile 9
      (2L, "too short"))     // < 4 tokens → excluded
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = run("t20_compression_ratio", dir).collect()
      .map(r => r.getAs[Long]("decile") -> r).toMap
    assert(got.keySet == Set(5L, 9L), got)
    assert(got(5L).getAs[Long]("n_docs") == 1L &&
      got(5L).getAs[Long]("min_ratio_bp") == 5000L, got(5L))
    assert(got(9L).getAs[Long]("n_docs") == 1L &&
      got(9L).getAs[Long]("max_ratio_bp") == 10000L, got(9L))
    // sf invariants: deciles within [0,9], ratios within (0, 10000]
    run("t20_compression_ratio").collect().foreach { r =>
      assert(r.getAs[Long]("decile") >= 0 && r.getAs[Long]("decile") <= 9, r)
      assert(r.getAs[Long]("min_ratio_bp") > 0 &&
        r.getAs[Long]("max_ratio_bp") <= 10000L, r)
    }
  }

  test("x17 freshness: lags measure from the high-water mark exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("x17").toString
    def ts(sec: Long) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusSeconds(sec))
    Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(10), 1L, "view", 1.0, "{}"),
      (3L, ts(100), 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = run("x17_freshness_audit", dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got("view").getAs[Long]("lag_sec") == 90L, got("view"))
    assert(got("view").getAs[Long]("n_events") == 2L &&
      got("view").getAs[Long]("active_days") == 1L &&
      got("view").getAs[Long]("events_per_day") == 2L, got("view"))
    assert(got("click").getAs[Long]("lag_sec") == 0L, got("click"))
    // sf invariant: exactly one type sits AT the high-water mark
    val sfRows = run("x17_freshness_audit").collect()
    assert(sfRows.count(_.getAs[Long]("lag_sec") == 0L) >= 1, sfRows.toSeq)
    assert(sfRows.forall(r => r.getAs[Long]("events_per_day") >= 1L))
  }

  test("e25 funnel timing: planted lags give exact median and mean") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("e25").toString
    def ts(sec: Long) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusSeconds(sec))
    // u1: view→click 60 s, click→purchase 300 s; u2: view→click 120 s,
    // never purchases → leg1 lags {60, 120} (median 90), leg2 {300}
    Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(60), 1L, "click", 1.0, "{}"),
      (3L, ts(360), 1L, "purchase", 1.0, "{}"),
      (4L, ts(0), 2L, "view", 1.0, "{}"),
      (5L, ts(120), 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = run("e25_funnel_timing", dir).collect()
      .map(r => r.getAs[String]("stage_pair") -> r).toMap
    val l1 = got("view_to_click")
    assert(l1.getAs[Long]("n_users") == 2L, l1)
    assert(l1.getAs[Double]("med_lag_sec") == 90.0, l1)
    assert(l1.getAs[Long]("mean_lag_csec") == 9000L, l1)
    val l2 = got("click_to_purchase")
    assert(l2.getAs[Long]("n_users") == 1L &&
      l2.getAs[Double]("med_lag_sec") == 300.0 &&
      l2.getAs[Long]("mean_lag_csec") == 30000L, l2)
    // sf invariant: funnel narrows, lags are non-negative
    val sf2 = run("e25_funnel_timing").collect()
      .map(r => r.getAs[String]("stage_pair") -> r).toMap
    assert(sf2("view_to_click").getAs[Long]("n_users") >=
      sf2("click_to_purchase").getAs[Long]("n_users"))
    sf2.values.foreach(r => assert(r.getAs[Long]("mean_lag_csec") >= 0L, r))
  }

  test("e26 interarrival: planted gaps land in their power-of-8 bins exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("e26").toString
    def ts(sec: Long) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusSeconds(sec))
    // user 1 gaps: 0 s (two events in the same second, event_id breaks
    // the tie), 5 s, 60 s, 600 s, 5000 s → buckets 0,1,2,4,5; user 2
    // contributes no gap (single event)
    Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(0), 1L, "view", 1.0, "{}"),
      (3L, ts(5), 1L, "click", 1.0, "{}"),
      (4L, ts(65), 1L, "view", 1.0, "{}"),
      (5L, ts(665), 1L, "view", 1.0, "{}"),
      (6L, ts(5665), 1L, "purchase", 1.0, "{}"),
      (7L, ts(9), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = run("e26_interarrival", dir).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_gaps"), r.getAs[Long]("min_s"),
          r.getAs[Long]("max_s"), r.getAs[Long]("mean_cs")))).toMap
    assert(got == Map(
      0L -> ((1L, 0L, 0L, 0L)), 1L -> ((1L, 5L, 5L, 500L)),
      2L -> ((1L, 60L, 60L, 6000L)), 4L -> ((1L, 600L, 600L, 60000L)),
      5L -> ((1L, 5000L, 5000L, 500000L))), got)
    // sf invariants: bins ordered, extremes inside each bin's range
    val sfRows = run("e26_interarrival").collect()
    sfRows.foreach { r =>
      val (b, lo, hi) = (r.getAs[Long]("bucket"), r.getAs[Long]("min_s"),
        r.getAs[Long]("max_s"))
      assert(lo <= hi, r)
      val edges = Seq(0L, 1L, 8L, 64L, 512L, 4096L, Long.MaxValue)
      assert(lo >= edges(b.toInt), r)
      assert(b == 5 || hi < edges(b.toInt + 1), r)
    }
  }

  test("t21 length outliers: a planted 10x-length doc flags long, not short") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t21").toString
    val docs = (0L until 12L).map(i =>
      (i, Seq.fill(10)("w").mkString(" "), "en")) :+
      (12L, Seq.fill(100)("w").mkString(" "), "en")
    docs.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = run("t21_length_outliers", dir).collect().head
    assert(r.getAs[Long]("n_docs") == 13L, r)
    assert(r.getAs[Long]("mean_tok") == 220L / 13L, r)
    assert(r.getAs[Long]("n_long_outliers") == 1L, r)
    assert(r.getAs[Long]("n_short_outliers") == 0L, r)
    assert(r.getAs[Long]("min_tok") == 10L && r.getAs[Long]("max_tok") == 100L, r)
    // sf invariant: outliers are a strict minority of every lang
    run("t21_length_outliers").collect().foreach { s =>
      assert((s.getAs[Long]("n_long_outliers")
        + s.getAs[Long]("n_short_outliers")) * 10
        < s.getAs[Long]("n_docs"), s)
    }
  }

  test("t22 flags each planted encoding defect exactly once") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("t22").toString
    Seq(
      (0L, "clean prose here"),
      (1L, "ctrl\u0001inside"),      // C0 control outside \t\n\r
      (2L, "lost\uFFFDbyte"),        // replacement char
      (3L, "caf\u00C3\u00A9 mojibake"), // UTF-8 e-acute read as Latin-1
      (4L, "tab\tand\nnewline\rare fine"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = run("t22_encoding_audit", d).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_docs") == 5L, r.head)
    assert(r.head.getAs[Long]("n_ctrl") == 1L, r.head)
    assert(r.head.getAs[Long]("n_repl") == 1L, r.head)
    assert(r.head.getAs[Long]("n_moji") == 1L, r.head)
    assert(r.head.getAs[Long]("clean_bp") == 4000L, r.head) // 2 of 5 clean
    // the sf corpus is clean ASCII: the audit PASSING is the result
    assert(run("t22_encoding_audit").collect()
      .forall(_.getAs[Long]("clean_bp") == 10000L))
  }

  test("e27 dwell intervals replay exactly on planted events") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("e27").toString
    Seq(
      // user 1: view(t0) → click(+10 s) → view(+70 s):
      // the first view dwells 10 s, the click dwells 60 s
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:00:10", 1L, "click"),
      (3L, "2024-01-01 10:01:10", 1L, "view"),
      // user 2: a single event opens no closed interval
      (4L, "2024-01-01 12:00:00", 2L, "view"))
      .toDF("event_id", "tss", "user_id", "event_type")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = run("e27_state_dwell", d).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_intervals"), r.getAs[Long]("total_dwell_s"),
          r.getAs[Long]("mean_dwell_cs"), r.getAs[Long]("max_dwell_s"))))
      .toMap
    assert(got == Map(
      "view" -> ((1L, 10L, 1000L, 10L)),
      "click" -> ((1L, 60L, 6000L, 60L))))
    // sf reconciliation: every event except each user's last one opens
    // exactly one closed interval
    val ev = Tables(spark, sf, "events")
    assert(run("e27_state_dwell").collect()
      .map(_.getAs[Long]("n_intervals")).sum ==
      ev.count() - ev.select("user_id").distinct().count())
  }

  test("e28 cascade flags only events within 60 s after an error") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("e28").toString
    Seq(
      // user 1: error at t0; a view 30 s later (in blast radius),
      // a click 120 s later (outside)
      (1L, "2024-01-01 10:00:00", 1L, "error"),
      (2L, "2024-01-01 10:00:30", 1L, "view"),
      (3L, "2024-01-01 10:02:00", 1L, "click"),
      // user 2: never errors
      (4L, "2024-01-01 12:00:00", 2L, "view"))
      .toDF("event_id", "tss", "user_id", "event_type")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = run("e28_error_cascade", d).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_in_cascade"),
          r.getAs[Long]("cascade_bp")))).toMap
    assert(got == Map(
      "error" -> ((1L, 0L, 0L)),
      "view" -> ((2L, 1L, 5000L)),
      "click" -> ((1L, 0L, 0L))), got)
    // sf invariant: cascade shares are proper fractions and the event
    // totals reconcile with the table
    val sfRows = run("e28_error_cascade").collect()
    assert(sfRows.map(_.getAs[Long]("n_events")).sum ==
      Tables(spark, sf, "events").count())
    sfRows.foreach(r =>
      assert(r.getAs[Long]("n_in_cascade") <= r.getAs[Long]("n_events"), r))
  }

  test("t23 flags shouty and letterless docs; never divides by zero") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("t23").toString
    Seq(
      (0L, "WARNING ACT NOW"),      // 13/13 letters upper → shouty
      (1L, "Hello there, world."),  // 2/16 upper → fine
      (2L, "123 456 --- 789"))      // no letters at all
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = run("t23_casing_profile", d).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_docs") == 3L, r.head)
    assert(r.head.getAs[Long]("n_shouty") == 1L, r.head)
    assert(r.head.getAs[Long]("n_no_letters") == 1L, r.head)
    assert(r.head.getAs[Long]("shouty_bp") == 3333L, r.head)
    // sf: flags are proper subsets
    run("t23_casing_profile").collect().foreach { s =>
      assert(s.getAs[Long]("n_shouty") + s.getAs[Long]("n_no_letters") <=
        s.getAs[Long]("n_docs"), s)
    }
  }

  test("e29 stickiness: DAU/WAU replays on a planted two-day corpus") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("e29").toString
    Seq( // user 1 active both days, user 2 only day 0
      (1L, "2024-01-01 10:00:00", 1L),
      (2L, "2024-01-01 11:00:00", 2L),
      (3L, "2024-01-02 10:00:00", 1L))
      .map { case (id, tss, u) => (id, tss, u) }
      .toDF("event_id", "tss", "user_id")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
        col("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = run("e29_stickiness", d).collect()
      .map(r => (r.getAs[Long]("dau"), r.getAs[Long]("wau"),
        r.getAs[Long]("stickiness_bp"))).toSeq
    // day 0: DAU 2, WAU 2 → 10000; day 1: DAU 1, WAU 2 (user 2 is
    // inside the trailing window) → 5000
    assert(rows == Seq((2L, 2L, 10000L), (1L, 2L, 5000L)), rows)
    // sf invariants: DAU ≤ WAU, share a proper fraction
    run("e29_stickiness").collect().foreach { r =>
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("wau"), r)
      assert(r.getAs[Long]("stickiness_bp") <= 10000L, r)
    }
  }

  test("e30 lifecycle: planted new/active/churned users classify exactly") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("e30").toString
    Seq( // high-water day = 2024-01-20
      (1L, "2024-01-20 10:00:00", 1L), // user 1: first seen in window → new
      (2L, "2024-01-01 10:00:00", 2L), // user 2: gone for >7 days → churned
      (3L, "2024-01-01 10:00:00", 3L), // user 3: long-lived, recently seen
      (4L, "2024-01-19 10:00:00", 3L))
      .toDF("event_id", "tss", "user_id")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
        col("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = run("e30_lifecycle", d).collect()
      .map(r => r.getAs[String]("status") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("share_bp")))).toMap
    assert(got == Map(
      "new" -> ((1L, 3333L)),
      "churned" -> ((1L, 3333L)),
      "active" -> ((1L, 3333L))), got)
    // sf: census totals reconcile with distinct users
    val sfRows = run("e30_lifecycle").collect()
    assert(sfRows.map(_.getAs[Long]("n_users")).sum ==
      Tables(spark, sf, "events").select("user_id").distinct().count())
  }

  test("e31 CUSUM peaks at the planted level shift; closes at zero") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("e31").toString
    // three flat days of 2 events, then a 6-event day: D=4, T=12,
    // dev = 4c−12 → −4,−4,−4,12; cusum −4,−8,−12,0 → peak at day 3
    val evs = (0 until 2).map(i => (i, 0)) ++ (2 until 4).map(i => (i, 1)) ++
      (4 until 6).map(i => (i, 2)) ++ (6 until 12).map(i => (i, 3))
    evs.map { case (id, dayOff) =>
      (id.toLong, f"2024-01-${dayOff + 1}%02d 10:00:00", id.toLong % 3) }
      .toDF("event_id", "tss", "user_id")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
        col("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = run("e31_cusum", d).collect()
      .map(r => (r.getAs[Long]("n_events"), r.getAs[Long]("cusum"),
        r.getAs[Boolean]("is_changepoint"))).toSeq
    assert(rows == Seq((2L, -4L, false), (2L, -8L, false),
      (2L, -12L, true), (6L, 0L, false)), rows)
    // structural invariant: the last cumulative deviation is always 0
    val sfRows = run("e31_cusum").collect()
    assert(sfRows.last.getAs[Long]("cusum") == 0L)
    assert(sfRows.count(_.getAs[Boolean]("is_changepoint")) >= 1)
  }

  test("t24 burstiness: uniform token scores 0, clumped token 3x mean") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("t24").toString
    // "a" once in every doc (VMR = 0 — no variance);
    // "b" four times in one doc (VMR = 3 → 30000 bp)
    Seq((0L, "a b b b b"), (1L, "a"), (2L, "a"), (3L, "a"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = run("t24_burstiness", d).collect()
      .map(r => r.getAs[String]("tok") ->
        ((r.getAs[Long]("total_cnt"), r.getAs[Long]("n_docs_with"),
          r.getAs[Long]("vmr_bp")))).toMap
    assert(got("a") == ((4L, 4L, 0L)), got)
    assert(got("b") == ((4L, 1L, 30000L)), got)
    // sf: top tokens are frequent; VMR never negative
    run("t24_burstiness").collect().foreach { r =>
      assert(r.getAs[Long]("vmr_bp") >= 0L, r)
      assert(r.getAs[Long]("n_docs_with") <= r.getAs[Long]("total_cnt"), r)
    }
  }

  test("e32 autocorrelation: linear daily series is exactly 1.0 at both lags") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("e32").toString
    // day k (0-based, 14 days) carries k+1 events: counts are a perfect
    // line, so r = 1.0 EXACTLY at every lag (variances are equal ints;
    // sqrt(v·v) = v bit-exactly for v < 2^26)
    var id = -1L
    val rows = (0 until 14).flatMap { day =>
      (0 to day).map { i => id += 1
        (id, f"2024-01-${day + 1}%02d 10:${i}%02d:00", id % 5) }
    }
    rows.toDF("event_id", "tss", "user_id")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
        col("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = run("e32_autocorr", d).collect()
      .map(r => r.getAs[Long]("lag_days") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("r")))).toMap
    assert(got == Map(1L -> ((13L, 1.0)), 7L -> ((7L, 1.0))), got)
    // constant daily volume → zero variance → r undefined → both legs
    // excluded (not a divide-by-zero crash: the r9k probe's
    // 1-event-per-second stream hit exactly this)
    val dc = java.nio.file.Files.createTempDirectory("e32c").toString
    (0 until 6).flatMap { day => (0 until 3).map { i =>
      (day * 3 + i, f"2024-01-${day + 1}%02d 0$i:00:00") } }
      .toDF("id", "tss")
      .select(col("id").cast("long").as("event_id"),
        to_timestamp(col("tss")).as("ts"),
        (col("id") % 2).cast("long").as("user_id"),
        lit("view").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dc/events.parquet")
    assert(run("e32_autocorr", dc).collect().isEmpty)
    // sf: both lags defined, r in [-1, 1]
    val sfRows = run("e32_autocorr").collect()
    assert(sfRows.map(_.getAs[Long]("lag_days")).toSeq == Seq(1L, 7L))
    sfRows.foreach { r =>
      val v = r.getAs[Double]("r")
      assert(v >= -1.0 && v <= 1.0, r)
    }
  }

  test("t25 PMI replays exactly on a planted collocation corpus") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("t25").toString
    // 10× "new york", 5× "the cat", 3× "rare pair" (below min count 5).
    // N = 18 bigrams; both surviving pairs are exclusive, so
    // pmi = ln(cab·N / cab²) = ln(N / cab).
    val docs = (0 until 10).map(i => (i.toLong, "new york")) ++
      (10 until 15).map(i => (i.toLong, "the cat")) ++
      (15 until 18).map(i => (i.toLong, "rare pair"))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    def pmi(n: Int, cab: Int): Double =
      BigDecimal(java.math.BigDecimal.valueOf(
        math.log((cab.toDouble * n.toDouble) / (cab.toDouble * cab.toDouble))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = run("t25_pmi_collocations", d).collect()
      .map(r => r.getAs[String]("bg") ->
        ((r.getAs[Long]("cab"), r.getAs[Long]("c1"), r.getAs[Long]("c2"),
          r.getAs[Double]("pmi")))).toMap
    assert(got == Map(
      "the cat" -> ((5L, 5L, 5L, pmi(18, 5))),
      "new york" -> ((10L, 10L, 10L, pmi(18, 10)))), got)
    // sf: output bounded at 20, marginals dominate the pair count
    val sfRows = run("t25_pmi_collocations").collect()
    assert(sfRows.length <= 20)
    sfRows.foreach { r =>
      assert(r.getAs[Long]("cab") >= 5L, r)
      assert(r.getAs[Long]("c1") >= r.getAs[Long]("cab"), r)
      assert(r.getAs[Long]("c2") >= r.getAs[Long]("cab"), r)
    }
  }

  test("t26 JSD: identical distributions → 0, disjoint vocabularies → ln 2") {
    import spark.implicits._
    def plant(docs: Seq[(Long, String, String)]): String = {
      val d = java.nio.file.Files.createTempDirectory("t26").toString
      docs.toDF("doc_id", "text", "source")
        .withColumn("lang", lit("en"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      d
    }
    // identical unigram distributions on both sides → every token has
    // p = q, every term is exactly 0
    val same = plant(Seq((0L, "a b", "s0"), (1L, "a b", "s1")))
    val gotSame = run("t26_source_divergence", same).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("jsd"))).toSeq
    assert(gotSame == Seq(("s0", 2L, 0.0), ("s1", 2L, 0.0)), gotSame)
    // disjoint vocabularies → per-token terms are ln(2)/2 rounded at
    // 6 dp; 2·round(ln(2)/2, 6) = 0.693148 → 0.6931 at 4 dp
    val disj = plant(Seq((0L, "x x x", "s0"), (1L, "y y y", "s1")))
    val gotDisj = run("t26_source_divergence", disj).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Double]("jsd"))).toSeq
    assert(gotDisj == Seq(("s0", 0.6931), ("s1", 0.6931)), gotDisj)
    // single source: no rest-of-corpus → empty on both engines
    val single = plant(Seq((0L, "a b c", "s0")))
    assert(run("t26_source_divergence", single).collect().isEmpty)
    // sf: JSD bounded by ln 2 for every source
    run("t26_source_divergence").collect().foreach { r =>
      val j = r.getAs[Double]("jsd")
      assert(j >= 0.0 && j <= 0.6932, r)
    }
  }

  test("t27 held-out NLL replays exactly; OOV backs off to ln V") {
    import spark.implicits._
    def r6(x: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(x).setScale(6,
        java.math.RoundingMode.HALF_UP)
    // mirror the engine exactly: decimal sum → double → /n → round 4
    def avg(sl: java.math.BigDecimal, n: Long): Double =
      java.math.BigDecimal.valueOf(sl.doubleValue / n)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
    val d = java.nio.file.Files.createTempDirectory("t27").toString
    // train (even ids): "a b", "a b", "a c" → cb{a b:2, a c:1},
    // cp{a:3}, V = |{a,b,c}| = 3; eval doc1 "a b x": seen ln(3/2) +
    // OOV ln 3; eval doc3 "z z": OOV ln 3
    Seq((0L, "a b"), (2L, "a b"), (4L, "a c"),
        (1L, "a b x"), (3L, "z z"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = run("t27_heldout_perplexity", d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("avg_nll")))).toMap
    val ln15 = r6(math.log(3.0 / 2.0)); val ln3 = r6(math.log(3.0))
    assert(got == Map(
      1L -> ((2L, 1L, avg(ln15.add(ln3), 2L))),
      3L -> ((1L, 1L, avg(ln3, 1L)))), got)
    // no trainable half → no scores at all (v > 0 gate)
    val d2 = java.nio.file.Files.createTempDirectory("t27b").toString
    Seq((1L, "a b"), (3L, "c d")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    assert(run("t27_heldout_perplexity", d2).collect().isEmpty)
    // sf: only odd docs scored, OOV never exceeds the bigram count
    run("t27_heldout_perplexity").collect().foreach { r =>
      assert(r.getAs[Long]("doc_id") % 2 == 1, r)
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_bigrams"), r)
    }
  }

  test("e34 one exact-ppm power step replays on a planted matrix") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("e34").toString
    // u1: A→B→B; u2: A→C ⇒ q_ppm: A→B 500000, A→C 500000, B→B 1000000
    val evs = Seq((0L, "2024-01-01 10:00:00", 1L, "A"),
      (1L, "2024-01-01 10:01:00", 1L, "B"),
      (2L, "2024-01-01 10:02:00", 1L, "B"),
      (3L, "2024-01-01 10:00:00", 2L, "A"),
      (4L, "2024-01-01 10:01:00", 2L, "C"))
    evs.toDF("event_id", "tss", "user_id", "event_type")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = run("e34_stationary_step", d).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("inflow_kppm"), r.getAs[Long]("n_sources"))).toSeq
    assert(got == Seq(("B", 1500000L, 2L), ("C", 500000L, 1L)), got)
    // sf: each row's inflow is ≤ k·10⁶ and the floor quantization only
    // ever loses mass: total ≤ (#from-types)·10⁶
    val sfRows = run("e34_stationary_step").collect()
    assert(sfRows.nonEmpty)
    val k = sfRows.length.toLong
    sfRows.foreach(r =>
      assert(r.getAs[Long]("n_sources") <= k + 1, r))
    assert(sfRows.map(_.getAs[Long]("inflow_kppm")).sum <= (k + 1) * 1000000L)
  }

  test("e35 bounce rate keys on the session's FIRST event type") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("e35").toString
    // u1: lone view → bounce(view). u2: click→view 60s apart, one
    // session → entry click, no bounce. u3: view, then purchase 2h
    // later → TWO single-event sessions, bounce(view) + bounce(purchase)
    val evs = Seq((0L, "2024-01-01 09:00:00", 1L, "view"),
      (1L, "2024-01-01 09:00:00", 2L, "click"),
      (2L, "2024-01-01 09:01:00", 2L, "view"),
      (3L, "2024-01-01 09:00:00", 3L, "view"),
      (4L, "2024-01-01 11:00:00", 3L, "purchase"))
    evs.toDF("event_id", "tss", "user_id", "event_type")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = run("e35_bounce_rate", d).collect()
      .map(r => r.getAs[String]("entry_type") ->
        ((r.getAs[Long]("n_sessions"), r.getAs[Long]("n_bounce"),
          r.getAs[Long]("bounce_bp")))).toMap
    assert(got == Map(
      "view" -> ((2L, 2L, 10000L)),
      "click" -> ((1L, 0L, 0L)),
      "purchase" -> ((1L, 1L, 10000L))), got)
    // sf: bounces never exceed sessions; bp bounded
    run("e35_bounce_rate").collect().foreach { r =>
      assert(r.getAs[Long]("n_bounce") <= r.getAs[Long]("n_sessions"), r)
      assert(r.getAs[Long]("bounce_bp") <= 10000L, r)
    }
  }

  test("e33 peak concurrency: overlap + touching sessions pin the sweep order") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("e33").toString
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    // u1 session [0,10s]; u2 [5s,5s] → overlap of 2 at t=5s (earliest).
    // u4 [100s,200s] and u5 [200s,200s] touch at 200s: +1 sorts before
    // −1, so the touch also reaches 2 — but argmax keeps the earliest.
    // u3 [3600s] far away. 5 sessions total.
    val evs = Seq((1L, 0), (1L, 10), (2L, 5), (3L, 3600),
      (4L, 100), (4L, 200), (5L, 200))
    evs.zipWithIndex.map { case ((u, sec), i) =>
      (i.toLong, new java.sql.Timestamp((base / 1000L) + sec * 1000L),
        u, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = run("e33_peak_concurrency", d).collect().head
    assert(r.getAs[Long]("peak") == 2L, r)
    assert(r.getAs[Long]("at_micros") == base + 5000000L, r)
    assert(r.getAs[Long]("n_sessions") == 5L, r)
    // sf: at least one session open at the peak, count positive
    val sfr = run("e33_peak_concurrency").collect().head
    assert(sfr.getAs[Long]("peak") >= 1L, sfr)
    assert(sfr.getAs[Long]("n_sessions") >= 1L, sfr)
  }
}
