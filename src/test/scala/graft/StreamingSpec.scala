package graft

import graft.streaming.EventsStream
import graft.streaming.EventsStream.{SessionEvent, SessionUpdate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** §2.C streaming: drive the EventsStream pipelines through actual
  * Structured Streaming micro-batches (MemoryStream → memory sink).
  */
class StreamingSpec extends SparkSpecBase {

  test("windowedCounts aggregates tumbling windows over a real stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventsStream.windowedCounts(events, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("update").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
        (Timestamp.valueOf("2024-01-01 10:40:00"), "click", 2.0),
        (Timestamp.valueOf("2024-01-01 11:10:00"), "click", 5.0),
        (Timestamp.valueOf("2024-01-01 10:20:00"), "view", 3.0))
      q.processAllAvailable()
      val out = spark.table("win_counts").collect()
        .map(r => (r.getAs[Timestamp]("window_start").toString,
          r.getAs[String]("event_type")) ->
          (r.getAs[Long]("cnt"), r.getAs[Double]("total"))).toMap
      assert(out(("2024-01-01 10:00:00.0", "click")) == (2L, 3.0))
      assert(out(("2024-01-01 11:00:00.0", "click")) == (1L, 5.0))
      assert(out(("2024-01-01 10:00:00.0", "view")) == (1L, 3.0))
    } finally q.stop()
  }

  test("sessionize splits on the inactivity gap and carries state across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = EventsStream.sessionize(input.toDS(), gapSec = 60)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    try {
      val t0 = 1700000000L * 1000000L // µs
      input.addData(
        SessionEvent(1L, t0, 1.0),
        SessionEvent(1L, t0 + 30L * 1000000L, 1.0))   // same session
      q.processAllAvailable()
      input.addData(
        SessionEvent(1L, t0 + 200L * 1000000L, 1.0),  // gap > 60s → new session
        SessionEvent(2L, t0, 1.0))                    // separate user
      q.processAllAvailable()
      val out = spark.table("sessions").as[SessionUpdate].collect()
      val u1 = out.filter(_.userId == 1L)
      assert(u1.map(_.sessionId).max == 2L)
      assert(u1.count(_.sessionId == 1L) == 2)
      assert(out.filter(_.userId == 2L).forall(_.sessionId == 1L))
    } finally q.stop()
  }

  test("streaming file sink persists windowed aggregates with a checkpoint") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-sink").toString
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = EventsStream.windowedCounts(input.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
        (Timestamp.valueOf("2024-01-01 10:45:00"), "click", 2.0))
      q.processAllAvailable()
      // advance the watermark (2h) so the 10:00 window closes and is emitted
      input.addData((Timestamp.valueOf("2024-01-01 13:30:00"), "view", 9.0))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/out")
      assert(out.filter(col("event_type") === "click")
        .head().getAs[Long]("cnt") == 2L)
    } finally q.stop()
  }

  test("stream-stream interval join correlates two event streams on key + time bound") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val views = MemoryStream[(Long, Timestamp)]
    val cdf = clicks.toDF().toDF("c_user", "c_ts").withWatermark("c_ts", "1 hour")
    val vdf = views.toDF().toDF("v_user", "v_ts").withWatermark("v_ts", "1 hour")
    val q = vdf.join(cdf,
        expr("v_user = c_user AND c_ts BETWEEN v_ts AND v_ts + INTERVAL 10 minutes"))
      .writeStream.format("memory").queryName("vc_join")
      .outputMode("append").start()
    try {
      views.addData((1L, Timestamp.valueOf("2024-01-01 10:00:00")),
                    (2L, Timestamp.valueOf("2024-01-01 10:00:00")))
      clicks.addData((1L, Timestamp.valueOf("2024-01-01 10:05:00")),  // in window
                     (2L, Timestamp.valueOf("2024-01-01 10:30:00")))  // too late
      q.processAllAvailable()
      val out = spark.table("vc_join").collect()
      assert(out.length == 1)
      assert(out.head.getAs[Long]("v_user") == 1L)
    } finally q.stop()
  }

  test("sessionizeEvicting removes idle users' state past the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[EventsStream.TsEvent]
    val q = EventsStream.sessionizeEvicting(input.toDS(),
        gapSec = 60, watermark = "0 seconds")
      .writeStream.format("memory").queryName("evict_sessions")
      .outputMode("update").start()
    try {
      input.addData(EventsStream.TsEvent(1L,
        Timestamp.valueOf("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // another user far ahead pushes the watermark way past user 1's
      // gap → user 1's state times out and is removed
      input.addData(EventsStream.TsEvent(2L,
        Timestamp.valueOf("2024-01-01 12:00:00"), 1.0))
      q.processAllAvailable()
      // user 1 returns: with state evicted they restart at session 1
      input.addData(EventsStream.TsEvent(1L,
        Timestamp.valueOf("2024-01-01 12:00:30"), 1.0))
      q.processAllAvailable()
      val u1 = spark.table("evict_sessions")
        .as[SessionUpdate].collect().filter(_.userId == 1L)
      assert(u1.length == 2)
      assert(u1.forall(_.sessionId == 1L)) // restarted, not session 2
    } finally q.stop()
  }

  test("journeyTracker finalizes event-time-ordered paths, bounded to maxSteps") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import EventsStream.JourneyEvent
    val input = MemoryStream[JourneyEvent]
    val q = EventsStream.journeyTracker(input.toDS(),
        maxSteps = 3, watermark = "1 hour", idleSec = 60)
      .writeStream.format("memory").queryName("journeys")
      .outputMode("append").start()
    try {
      // user 1's first and third steps arrive in batch 1...
      input.addData(
        JourneyEvent(1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view"),
        JourneyEvent(1L, Timestamp.valueOf("2024-01-01 10:00:20"), 3L, "purchase"),
        JourneyEvent(1L, Timestamp.valueOf("2024-01-01 10:00:30"), 4L, "scroll"))
      q.processAllAvailable()
      // ...the SECOND step arrives late in batch 2 (inside the 1-hour
      // lateness allowance): it must displace 'scroll' from the 3-step
      // prefix, whatever the arrival order
      input.addData(
        JourneyEvent(1L, Timestamp.valueOf("2024-01-01 10:00:10"), 2L, "click"))
      q.processAllAvailable()
      // a user far ahead advances the watermark (13:00 − 1h = 12:00)
      // past user 1's idle horizon (10:01:30); the timeout fires on the
      // following trigger, so a second advancing batch flushes it
      input.addData(
        JourneyEvent(2L, Timestamp.valueOf("2024-01-01 13:00:00"), 9L, "view"))
      q.processAllAvailable()
      input.addData(
        JourneyEvent(3L, Timestamp.valueOf("2024-01-01 15:00:00"), 10L, "view"))
      q.processAllAvailable()
      val got = spark.table("journeys").as[EventsStream.Journey].collect()
        .filter(_.userId == 1L)
      assert(got.length == 1)
      assert(got.head.journey == "view>click>purchase") // not scroll
      assert(got.head.nSteps == 3)
    } finally q.stop()
  }

  test("transitionTracker emits event-time-ordered pairs; late arrival reorders") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import EventsStream.JourneyEvent
    val input = MemoryStream[JourneyEvent]
    val q = EventsStream.transitionTracker(input.toDS(),
        watermark = "1 hour", idleSec = 60)
      .writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()
    try {
      input.addData(
        JourneyEvent(1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view"),
        JourneyEvent(1L, Timestamp.valueOf("2024-01-01 10:00:20"), 3L, "purchase"))
      q.processAllAvailable()
      // the middle event arrives LATE (inside the 1-hour allowance): it
      // must take its event-time place — view>click>purchase, never
      // view>purchase
      input.addData(
        JourneyEvent(1L, Timestamp.valueOf("2024-01-01 10:00:10"), 2L, "click"))
      q.processAllAvailable()
      // advance the watermark past user 1's idle horizon, then one more
      // batch so the timeout trigger fires and flushes the buffer
      input.addData(
        JourneyEvent(2L, Timestamp.valueOf("2024-01-01 13:00:00"), 9L, "view"))
      q.processAllAvailable()
      input.addData(
        JourneyEvent(3L, Timestamp.valueOf("2024-01-01 15:00:00"), 10L, "view"))
      q.processAllAvailable()
      val got = spark.table("transitions").as[EventsStream.Transition]
        .collect().filter(_.userId == 1L)
        .map(t => (t.fromType, t.toType)).toSeq
      assert(got == Seq(("view", "click"), ("click", "purchase")))
    } finally q.stop()
  }

  test("transitionTracker matures incrementally and chains across emissions") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import EventsStream.JourneyEvent
    val input = MemoryStream[JourneyEvent]
    val q = EventsStream.transitionTracker(input.toDS(),
        watermark = "1 hour", idleSec = 7200)
      .writeStream.format("memory").queryName("transitions2")
      .outputMode("append").start()
    try {
      input.addData(
        JourneyEvent(1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view"),
        JourneyEvent(1L, Timestamp.valueOf("2024-01-01 10:01:00"), 2L, "click"))
      q.processAllAvailable()
      input.addData( // advances watermark to 12:00 at NEXT batch
        JourneyEvent(1L, Timestamp.valueOf("2024-01-01 13:00:00"), 3L, "signup"))
      q.processAllAvailable()
      input.addData( // wm now 12:00: 10:00/10:01 mature → first pair out
        JourneyEvent(1L, Timestamp.valueOf("2024-01-01 16:00:00"), 4L, "error"))
      q.processAllAvailable()
      val afterMature = spark.table("transitions2")
        .as[EventsStream.Transition].collect()
        .map(t => (t.fromType, t.toType)).toSeq
      assert(afterMature == Seq(("view", "click")))
      input.addData( // wm 15:00: the 13:00 event matures — the chain must
                     // CONTINUE from the carried last ('click' → 'signup')
        JourneyEvent(1L, Timestamp.valueOf("2024-01-01 20:00:00"), 5L, "view"))
      q.processAllAvailable()
      val afterMore = spark.table("transitions2")
        .as[EventsStream.Transition].collect()
        .map(t => (t.fromType, t.toType)).toSeq
      assert(afterMore == Seq(("view", "click"), ("click", "signup")))
    } finally q.stop()
  }

  test("attributionTracker credits late-arriving touches in event-time order") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import EventsStream.AttribEvent
    val input = MemoryStream[AttribEvent]
    val q = EventsStream.attributionTracker(input.toDS(),
        watermark = "1 hour", idleSec = 60)
      .writeStream.format("memory").queryName("credits")
      .outputMode("append").start()
    try {
      // purchase arrives FIRST; the view that actually preceded it in
      // event time arrives in the next batch (inside the allowance)
      input.addData(
        AttribEvent(1L, Timestamp.valueOf("2024-01-01 10:00:30"), 2L,
          "purchase", 9.0))
      q.processAllAvailable()
      input.addData(
        AttribEvent(1L, Timestamp.valueOf("2024-01-01 10:00:10"), 1L,
          "view", 0.0),
        AttribEvent(1L, Timestamp.valueOf("2024-01-01 10:01:00"), 3L,
          "purchase", 5.0))
      q.processAllAvailable()
      // advance watermark past the idle horizon, then one more batch so
      // the timeout trigger flushes user 1
      input.addData(AttribEvent(2L,
        Timestamp.valueOf("2024-01-01 13:00:00"), 9L, "click", 0.0))
      q.processAllAvailable()
      input.addData(AttribEvent(3L,
        Timestamp.valueOf("2024-01-01 15:00:00"), 10L, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("credits").as[EventsStream.Credit].collect()
        .filter(_.userId == 1L).sortBy(_.eventId)
        .map(c => (c.eventId, c.channel, c.value)).toSeq
      // both purchases follow the 10:00:10 view in EVENT time — even the
      // one that arrived before it
      assert(got == Seq((2L, "view", 9.0), (3L, "view", 5.0)))
    } finally q.stop()
  }

  test("dedupStream drops repeated ids within the watermark horizon") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventsStream.dedupStream(
        input.toDF().toDF("doc_id", "ts", "text"), "doc_id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
        (1L, Timestamp.valueOf("2024-01-01 10:01:00"), "a dup same batch"),
        (2L, Timestamp.valueOf("2024-01-01 10:02:00"), "b"))
      q.processAllAvailable()
      input.addData( // dup arriving in a later micro-batch is dropped too
        (1L, Timestamp.valueOf("2024-01-01 10:30:00"), "a dup later batch"),
        (3L, Timestamp.valueOf("2024-01-01 10:31:00"), "c"))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect()
        .map(_.getAs[Long]("doc_id")).sorted
      assert(ids.sameElements(Array(1L, 2L, 3L)))
    } finally q.stop()
  }

  test("decontaminateStream flags docs sharing an 8-gram with the static benchmark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val bench = Seq("alpha beta gamma delta epsilon zeta eta theta iota")
      .toDF("text")
    val benchHashes = graft.streaming.DocsStream.benchShingles(bench)
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = graft.streaming.DocsStream.decontaminateStream(
        input.toDF().toDF("doc_id", "ts", "text"), benchHashes)
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode("append").start()
    try {
      input.addData(
        // shares TWO 8-grams with the benchmark -> must flag exactly once
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"),
          "alpha beta gamma delta epsilon zeta eta theta iota tail"),
        (2L, Timestamp.valueOf("2024-01-01 10:01:00"),
          "uno dos tres cuatro cinco seis siete ocho nueve"))
      q.processAllAvailable()
      input.addData( // contaminated doc in a later micro-batch
        (3L, Timestamp.valueOf("2024-01-01 10:05:00"),
          "pre alpha beta gamma delta epsilon zeta eta theta post"))
      q.processAllAvailable()
      val ids = spark.table("decon_stream").collect()
        .map(_.getAs[Long]("doc_id")).sorted
      assert(ids.sameElements(Array(1L, 3L)))
    } finally q.stop()
  }

  test("stream-static join enriches a stream against a dimension table") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dim = Seq((0, "NATION_A"), (1, "NATION_B")).toDF("nkey", "nname")
    val input = MemoryStream[(Long, Int)]
    val q = input.toDF().toDF("event_id", "nkey")
      .join(dim, Seq("nkey")) // static side broadcast per micro-batch
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      input.addData((10L, 0), (11L, 1), (12L, 0), (13L, 9)) // 9: no dim match
      q.processAllAvailable()
      val out = spark.table("enriched").collect()
      assert(out.length == 3)
      assert(out.filter(_.getAs[String]("nname") == "NATION_A").length == 2)
    } finally q.stop()
  }

  test("spikeTracker flags closed windows against the static baseline") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    // baseline: mean 5, σ = 1 → spike iff |10n − 50| > 30 ⇔ n > 8 or n < 2
    val baseline = Seq(("click", 10L, 50L, 260L))
      .toDF("event_type", "w", "s", "ss")
    val q = EventsStream.spikeTracker(events, baseline, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("spikes")
      .outputMode("append").start()
    try {
      val hot = (0 until 9).map(i => // 9 events in hour 10 → spike
        (Timestamp.valueOf(f"2024-01-01 10:${i * 6}%02d:00"), "click", 1.0))
      val calm = (0 until 5).map(i => // 5 events in hour 11 → in-band
        (Timestamp.valueOf(f"2024-01-01 11:${i * 6}%02d:00"), "click", 1.0))
      input.addData(hot ++ calm: _*)
      q.processAllAvailable()
      // nothing closed yet: watermark still behind both window ends
      assert(spark.table("spikes").isEmpty)
      // advance the watermark past 12:00 to close both windows
      input.addData((Timestamp.valueOf("2024-01-01 16:00:00"), "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("spikes").collect()
        .map(r => r.getAs[Timestamp]("window_start").toString ->
          ((r.getAs[Long]("n"), r.getAs[Boolean]("spike")))).toMap
      assert(got("2024-01-01 10:00:00.0") == ((9L, true)))
      assert(got("2024-01-01 11:00:00.0") == ((5L, false)))
    } finally q.stop()
  }

  test("streakTracker folds islands at timeout; out-of-order day absorbed") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import EventsStream.JourneyEvent
    val input = MemoryStream[JourneyEvent]
    val q = EventsStream.streakTracker(input.toDS(),
        watermark = "48 hours", idleSec = 86400)
      .writeStream.format("memory").queryName("streaks")
      .outputMode("append").start()
    try {
      // user 1: days 1 and 3 arrive first; day 2 arrives LATE (but
      // inside the 48 h allowance) and must merge the two islands into
      // one 3-day streak; a second event on day 3 must not double-count
      input.addData(
        JourneyEvent(1L, Timestamp.valueOf("2024-01-01 09:00:00"), 1L, "view"),
        JourneyEvent(1L, Timestamp.valueOf("2024-01-03 09:00:00"), 2L, "view"),
        JourneyEvent(1L, Timestamp.valueOf("2024-01-03 10:00:00"), 3L, "view"))
      q.processAllAvailable()
      input.addData(
        JourneyEvent(1L, Timestamp.valueOf("2024-01-02 12:00:00"), 4L, "view"))
      q.processAllAvailable()
      // advance the watermark far past user 1's idle horizon
      // (2024-01-05 + 1 day), then trigger once more to fire the timeout
      input.addData(
        JourneyEvent(2L, Timestamp.valueOf("2024-01-10 00:00:00"), 9L, "view"))
      q.processAllAvailable()
      input.addData(
        JourneyEvent(3L, Timestamp.valueOf("2024-01-12 00:00:00"), 10L, "view"))
      q.processAllAvailable()
      val got = spark.table("streaks").as[EventsStream.Streak].collect()
        .filter(_.userId == 1L)
      assert(got.length == 1)
      assert(got.head == EventsStream.Streak(1L, 3, 1, 3))
    } finally q.stop()
  }

  test("nativeSessions merges late in-allowance events and closes on watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val q = EventsStream.nativeSessions(
        input.toDF().toDF("ts", "user_id"),
        gap = "30 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("nsessions")
      .outputMode("append").start()
    try {
      // two separate bursts arrive FIRST...
      input.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
        (Timestamp.valueOf("2024-01-01 10:50:00"), 1L))
      q.processAllAvailable()
      // ...then the bridging event (10:25, inside the 1 h allowance)
      // MERGES them into one session
      input.addData((Timestamp.valueOf("2024-01-01 10:25:00"), 1L))
      q.processAllAvailable()
      // watermark far past the session end closes and emits it
      input.addData((Timestamp.valueOf("2024-01-01 14:00:00"), 2L))
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-01 16:00:00"), 3L))
      q.processAllAvailable()
      val got = spark.table("nsessions").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
      assert(got.length == 1) // ONE merged session, not two
      assert(got.head.getAs[Long]("n_events") == 3L)
      assert(got.head.getAs[Timestamp]("session_end").toString
        .startsWith("2024-01-01 11:20")) // 10:50 + 30 min
    } finally q.stop()
  }

  test("dauTracker counts each user once per closed day") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val q = EventsStream.dauTracker(
        input.toDF().toDF("ts", "user_id"), watermark = "1 hour")
      .writeStream.format("memory").queryName("dau")
      .outputMode("append").start()
    try {
      // day 1: user 1 hits three times, user 2 once → DAU 2, not 4
      input.addData(
        (Timestamp.valueOf("2024-01-01 09:00:00"), 1L),
        (Timestamp.valueOf("2024-01-01 12:00:00"), 1L),
        (Timestamp.valueOf("2024-01-01 18:00:00"), 1L),
        (Timestamp.valueOf("2024-01-01 20:00:00"), 2L))
      q.processAllAvailable()
      // advance the watermark past day-1's close (00:00 + 1 h lateness)
      input.addData((Timestamp.valueOf("2024-01-02 02:00:00"), 3L))
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-03 02:00:00"), 3L))
      q.processAllAvailable()
      val got = spark.table("dau").collect()
        .map(r => r.getAs[Timestamp]("day_start").toString ->
          r.getAs[Long]("dau")).toMap
      assert(got("2024-01-01 00:00:00.0") == 2L)
      assert(got.get("2024-01-02 00:00:00.0").forall(_ == 1L))
    } finally q.stop()
  }

  test("freshnessTracker reports the quiet tail of each closed window") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "event_type")
    val q = EventsStream.freshnessTracker(events, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("fresh")
      .outputMode("append").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), "click"),
        (Timestamp.valueOf("2024-01-01 10:10:00"), "click"), // tail 50 min
        (Timestamp.valueOf("2024-01-01 10:59:00"), "view"))  // tail 1 min
      q.processAllAvailable()
      assert(spark.table("fresh").isEmpty) // window not closed yet
      input.addData((Timestamp.valueOf("2024-01-01 14:00:00"), "view"))
      q.processAllAvailable()
      val got = spark.table("fresh").collect()
        .map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("quiet_tail_sec")))).toMap
      assert(got("click") == ((2L, 3000L)), got)
      assert(got("view") == ((1L, 60L)), got)
    } finally q.stop()
  }

  test("dwellTracker: a late arrival splits the interval it lands in") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import EventsStream.JourneyEvent
    val input = MemoryStream[JourneyEvent]
    val q = EventsStream.dwellTracker(input.toDS(),
        watermark = "1 hour", idleSec = 60)
      .writeStream.format("memory").queryName("dwells")
      .outputMode("append").start()
    try {
      input.addData(
        JourneyEvent(1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view"),
        JourneyEvent(1L, Timestamp.valueOf("2024-01-01 10:00:20"), 3L,
          "purchase"))
      q.processAllAvailable()
      // late click at 10:00:10 (inside the allowance): the view's dwell
      // must close at 10 s against IT — never 20 s against the purchase
      input.addData(
        JourneyEvent(1L, Timestamp.valueOf("2024-01-01 10:00:10"), 2L,
          "click"))
      q.processAllAvailable()
      // push the watermark past the idle horizon, then one more batch so
      // the timeout fires and flushes user 1's closable buffer
      input.addData(
        JourneyEvent(2L, Timestamp.valueOf("2024-01-01 13:00:00"), 9L,
          "view"))
      q.processAllAvailable()
      input.addData(
        JourneyEvent(3L, Timestamp.valueOf("2024-01-01 15:00:00"), 10L,
          "view"))
      q.processAllAvailable()
      val got = spark.table("dwells").as[EventsStream.Dwell]
        .collect().filter(_.userId == 1L)
        .map(d => (d.eventType, d.dwellUs)).toSeq
      // purchase is user 1's last event: open interval, never emitted
      assert(got == Seq(("view", 10000000L), ("click", 10000000L)), got)
    } finally q.stop()
  }

  test("CdcApply: streaming MERGE upserts/deletes into parquet; a " +
       "replayed batch is idempotent") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val target = java.nio.file.Files.createTempDirectory("cdc_t").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cdc_c").toString
    val input = MemoryStream[(Long, Double, Long, String)]
    val changes = input.toDF().toDF("k", "p", "seq", "op")
    val q = graft.streaming.CdcApply(changes, target, ckpt)
    def state() = graft.streaming.CdcApply.current(spark, target)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Double]("p")).toMap
    try {
      // batch 0: three inserts, with an in-batch overwrite of k=1
      input.addData((1L, 10.0, 1L, "U"), (2L, 20.0, 2L, "U"),
        (1L, 11.0, 3L, "U"))
      q.processAllAvailable()
      assert(state() == Map(1L -> 11.0, 2L -> 20.0), state())
      // batch 1: update k=2, delete k=1, insert k=3
      input.addData((2L, 25.0, 4L, "U"), (1L, 0.0, 5L, "D"),
        (3L, 30.0, 6L, "U"))
      q.processAllAvailable()
      assert(state() == Map(2L -> 25.0, 3L -> 30.0), state())
    } finally q.stop()
    // REPLAY batch 1 exactly as checkpoint recovery would (same data,
    // same batch id): the copy-on-write snapshot must be unchanged —
    // the replay reads the same predecessor snapshot and overwrites
    // only its own directory
    val replay = Seq((2L, 25.0, 4L, "U"), (1L, 0.0, 5L, "D"),
      (3L, 30.0, 6L, "U")).toDF("k", "p", "seq", "op")
    graft.streaming.CdcApply.applyBatch(replay, target, 1L)
    assert(state() == Map(2L -> 25.0, 3L -> 30.0), state())
    // and a same-seq U/D tie resolves to the delete, deterministically
    val tie = Seq((2L, 99.0, 7L, "U"), (2L, 0.0, 7L, "D"))
      .toDF("k", "p", "seq", "op")
    graft.streaming.CdcApply.applyBatch(tie, target, 2L)
    assert(state() == Map(3L -> 30.0), state())
    // an EMPTY batch (possible under foreachBatch) carries the state
    // forward unchanged — no key lost, no crash on the empty merge side
    val empty = Seq.empty[(Long, Double, Long, String)]
      .toDF("k", "p", "seq", "op")
    graft.streaming.CdcApply.applyBatch(empty, target, 3L)
    assert(state() == Map(3L -> 30.0), state())
  }

  test("nearDupStream flags simhash near-dups across micro-batches; " +
       "disjoint docs stay silent") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.DocsStream.nearDupStream(docs)
      .writeStream.format("memory").queryName("near_dups")
      .outputMode("update").start()
    val copy = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely unrelated text about shuffle services and parquet"
    try {
      // batch 1: two exact copies (same signature -> 4 shared buckets)
      // and one disjoint doc
      input.addData((1L, copy), (2L, copy), (10L, other))
      q.processAllAvailable()
      // batch 2: a third copy arrives later -> pairs against BOTH
      // earlier copies (state carried across batches); another disjoint
      input.addData((3L, copy), (11L, other + " more words entirely"))
      q.processAllAvailable()
      val got = spark.table("near_dups")
        .as[graft.streaming.DocsStream.NearDup].collect()
      // dedupe multi-bucket emissions exactly as batch d04's distinct()
      val pairs = got.map(n => (n.docId, n.dupOf)).distinct.toSet
      assert(pairs == Set((2L, 1L), (3L, 1L), (3L, 2L)), got.toSeq)
      // exact copies have identical signatures
      assert(got.forall(_.hamming == 0), got.toSeq)
      // each same-signature pair shares all 4 chunk buckets -> 4 emits
      assert(got.count(n => n.docId == 2L && n.dupOf == 1L) == 4, got.toSeq)
    } finally q.stop()
  }

  test("nearDupStream bucket cap: a full bucket evicts oldest, newest " +
       "still matches (graceful hub degradation)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    // cap 1: each bucket remembers only the most recent doc
    val q = graft.streaming.DocsStream.nearDupStream(docs, bucketCap = 1)
      .writeStream.format("memory").queryName("near_dups_cap")
      .outputMode("update").start()
    val copy = "the quick brown fox jumps over the lazy dog again and again"
    try {
      input.addData((1L, copy))
      q.processAllAvailable()
      input.addData((2L, copy))
      q.processAllAvailable()
      // doc 1 has been evicted by doc 2 in every bucket: doc 3 pairs
      // against 2 only — capped recall, never an error or state blowup
      input.addData((3L, copy))
      q.processAllAvailable()
      val pairs = spark.table("near_dups_cap")
        .as[graft.streaming.DocsStream.NearDup].collect()
        .map(n => (n.docId, n.dupOf)).distinct.toSet
      assert(pairs == Set((2L, 1L), (3L, 2L)), pairs)
    } finally q.stop()
  }

  test("nearDupStream skips null-text docs instead of failing the query") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // String is nullable in the tuple encoder, so a null text row flows
    // through exactly as a malformed upstream record would
    val docs = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.DocsStream.nearDupStream(docs)
      .writeStream.format("memory").queryName("near_dups_null")
      .outputMode("update").start()
    val copy = "the quick brown fox jumps over the lazy dog again and again"
    try {
      input.addData((1L, copy), (2L, null: String), (3L, copy))
      q.processAllAvailable() // would throw here before the fix
      val pairs = spark.table("near_dups_null")
        .as[graft.streaming.DocsStream.NearDup].collect()
        .map(n => (n.docId, n.dupOf)).distinct.toSet
      assert(pairs == Set((3L, 1L)), pairs)
    } finally q.stop()
  }

  test("CdcApply GC bounds snapshot storage: older-than-predecessor " +
       "dirs are deleted and a replayed batch still finds its base") {
    import spark.implicits._
    val target = java.nio.file.Files.createTempDirectory("cdc_gc").toString
    def snaps() = new java.io.File(target).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    def state() = graft.streaming.CdcApply.current(spark, target)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Double]("p")).toMap
    def batch(rows: (Long, Double, Long, String)*) =
      rows.toDF("k", "p", "seq", "op")
    graft.streaming.CdcApply.applyBatch(batch((1L, 10.0, 1L, "U")), target, 0L)
    graft.streaming.CdcApply.applyBatch(batch((2L, 20.0, 2L, "U")), target, 1L)
    graft.streaming.CdcApply.applyBatch(batch((3L, 30.0, 3L, "U")), target, 2L)
    graft.streaming.CdcApply.applyBatch(batch((1L, 0.0, 4L, "D")), target, 3L)
    // retention = the new snapshot + its replay base, nothing older
    assert(snaps() == Seq("snap_2", "snap_3"), snaps())
    assert(state() == Map(2L -> 20.0, 3L -> 30.0), state())
    // a stray non-snapshot dir under the target never crashes the sink
    new java.io.File(s"$target/snap_tmp_junk").mkdirs()
    new java.io.File(s"$target/_metadata_dir").mkdirs()
    // checkpoint replay of batch 3 reads the kept snap_2 base:
    // bit-identical state, and GC stays within the same retention rule
    graft.streaming.CdcApply.applyBatch(batch((1L, 0.0, 4L, "D")), target, 3L)
    assert(state() == Map(2L -> 20.0, 3L -> 30.0), state())
    assert(snaps().filter(_.matches("snap_\\d+")) == Seq("snap_2", "snap_3"),
      snaps())
  }

  test("CdcApply partitioned layout rewrites ONLY touched partitions; " +
       "a fully-deleted partition does not resurrect") {
    import spark.implicits._
    val target = java.nio.file.Files.createTempDirectory("cdc_pt").toString
    val nB = 4
    def batch(rows: (Long, Double, Long, String)*) =
      rows.toDF("k", "p", "seq", "op")
    def state() = graft.streaming.CdcApply.currentPartitioned(spark, target)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Double]("p")).toMap
    def pksIn(id: Long) = {
      val d = new java.io.File(s"$target/snap_$id")
      if (!d.isDirectory) Seq.empty[String]
      else d.listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
    }
    // batch 0 seeds keys across all 4 partitions (pk = k % 4)
    graft.streaming.CdcApply.applyBatchPartitioned(
      batch((0L, 1.0, 1L, "U"), (1L, 2.0, 2L, "U"), (2L, 3.0, 3L, "U"),
        (3L, 4.0, 4L, "U"), (6L, 6.0, 5L, "U")), target, 0L, nB)
    assert(state() == Map(0L -> 1.0, 1L -> 2.0, 2L -> 3.0, 3L -> 4.0,
      6L -> 6.0), state())
    // batch 1 touches ONLY pk=1: snap_1 must contain exactly that
    // partition — the untouched 3 partitions are never rewritten
    graft.streaming.CdcApply.applyBatchPartitioned(
      batch((5L, 50.0, 6L, "U")), target, 1L, nB)
    assert(pksIn(1L) == Seq("pk=1"), pksIn(1L))
    assert(state() == Map(0L -> 1.0, 1L -> 2.0, 2L -> 3.0, 3L -> 4.0,
      5L -> 50.0, 6L -> 6.0), state())
    // replaying batch 1 (checkpoint recovery) is idempotent: it re-reads
    // pk=1's version below id 1 (snap_0) and overwrites only snap_1
    graft.streaming.CdcApply.applyBatchPartitioned(
      batch((5L, 50.0, 6L, "U")), target, 1L, nB)
    assert(state() == Map(0L -> 1.0, 1L -> 2.0, 2L -> 3.0, 3L -> 4.0,
      5L -> 50.0, 6L -> 6.0), state())
    // batch 2 deletes EVERY key of pk=2 (2 and 6): the marker dir must
    // version the now-empty partition — without it the stale snap_0
    // copy would stay newest and resurrect both keys
    graft.streaming.CdcApply.applyBatchPartitioned(
      batch((2L, 0.0, 7L, "D"), (6L, 0.0, 8L, "D")), target, 2L, nB)
    assert(pksIn(2L) == Seq("pk=2"), pksIn(2L))
    assert(state() == Map(0L -> 1.0, 1L -> 2.0, 3L -> 4.0, 5L -> 50.0),
      state())
    // and re-inserting into the emptied partition works on top of the
    // marker (its base reads as empty, not as the pre-delete rows)
    graft.streaming.CdcApply.applyBatchPartitioned(
      batch((2L, 99.0, 9L, "U")), target, 3L, nB)
    assert(state() == Map(0L -> 1.0, 1L -> 2.0, 2L -> 99.0, 3L -> 4.0,
      5L -> 50.0), state())
  }

  test("file-source CDC ingestion: rate-limited FileStreamSource drives " +
       "CdcApply; a restart resumes from the checkpoint, not from scratch") {
    // The no-new-jars stand-in for the Kafka leg (VERDICT r10 #5): the
    // durable-source → CDC-apply path end-to-end. maxFilesPerTrigger=1 is
    // the ingestion rate limit — the knob that bounds per-micro-batch
    // work when a 100 TB backlog lands in the source directory at once.
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("cdc_fsrc").toString
    val target = java.nio.file.Files.createTempDirectory("cdc_ft").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cdc_fc").toString
    def drop(rows: (Long, Double, Long, String)*): Unit =
      rows.toDF("k", "p", "seq", "op").coalesce(1)
        .write.mode("append").parquet(srcDir)
    def stream() = spark.readStream
      .schema("k LONG, p DOUBLE, seq LONG, op STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    def state() = graft.streaming.CdcApply.current(spark, target)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Double]("p")).toMap
    // two files before the query starts; in-file LWW (k=1 twice) stays
    // within one micro-batch, cross-file keys are disjoint so the
    // file-discovery order cannot change the outcome
    drop((1L, 10.0, 1L, "U"), (2L, 20.0, 2L, "U"), (1L, 11.0, 3L, "U"))
    drop((3L, 30.0, 4L, "U"))
    val q = graft.streaming.CdcApply(stream(), target, ckpt)
    try {
      q.processAllAvailable()
      // the rate limit must actually have split the backlog: one file
      // per trigger → at least two distinct micro-batches
      val batches = q.recentProgress.filter(_.numInputRows > 0)
        .map(_.batchId).distinct
      assert(batches.length >= 2, batches.mkString(","))
      assert(state() == Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0), state())
    } finally q.stop()
    // a file arriving while the query is DOWN is picked up on restart —
    // and only it: batch ids continue past the checkpoint instead of
    // replaying the whole source directory from zero
    drop((2L, 0.0, 5L, "D"), (4L, 40.0, 6L, "U"))
    val q2 = graft.streaming.CdcApply(stream(), target, ckpt)
    try {
      q2.processAllAvailable()
      val resumed = q2.recentProgress.filter(_.numInputRows > 0).map(_.batchId)
      assert(resumed.nonEmpty && resumed.min >= 2, resumed.mkString(","))
      assert(state() == Map(1L -> 11.0, 3L -> 30.0, 4L -> 40.0), state())
    } finally q2.stop()
  }
}
