package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.C — Structured Streaming pipelines over the events schema
  * (event_id, ts, user_id, event_type, value). Each transform takes a
  * (possibly streaming) DataFrame so the same code runs in batch tests
  * and with `readStream`; specs drive them via MemoryStream.
  *
  * Scale notes: the windowed aggregation bounds its state with a
  * watermark and is partial-agg friendly. Sessionization keeps one
  * small fixed-size state record per user with NO timeout — state
  * grows with the number of distinct users, not with event volume; a
  * production deployment with an unbounded user space should add a
  * watermark plus GroupStateTimeout.EventTimeTimeout to evict idle
  * users' state.
  */
object EventsStream {

  /** Tumbling-window counts/sums per event type with a watermark bounding
    * late data (and therefore state size).
    */
  /** x17's streaming twin — per-type ingestion freshness per closed
    * window: event count plus the QUIET TAIL (window end minus the last
    * event's timestamp, whole seconds). A type whose quiet tail
    * approaches the window length went silent mid-window — the stuck-
    * upstream alarm raised while the batch x17 report would still be
    * hours away. Plain watermark + windowed agg (no custom state);
    * emits on window close in append mode.
    */
  def freshnessTracker(events: DataFrame,
                       windowLen: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(unix_micros(col("ts").cast("timestamp"))).as("last_us"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"),
        ((unix_micros(col("window.end").cast("timestamp")) - col("last_us"))
          / lit(1000000L)).cast("long").as("quiet_tail_sec"))

  def windowedCounts(events: DataFrame,
                     windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("total"))

  /** Streaming exact dedup on an id column: state holds one entry per id
    * seen within the watermark horizon and is evicted past it — bounded
    * state, the streaming twin of the batch d01 hash-dedup.
    */
  def dedupStream(events: DataFrame, idCol: String,
                  tsCol: String = "ts",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq(idCol))

  /** Per-user running session state. */
  final case class SessionState(sessionId: Long, lastTs: Long)
  final case class SessionEvent(userId: Long, tsMicros: Long, value: Double)
  final case class SessionUpdate(userId: Long, sessionId: Long, nEvents: Long)

  /** Event-time row shape for the state-evicting sessionizer. */
  final case class TsEvent(userId: Long, ts: java.sql.Timestamp, value: Double)

  /** Production sessionization: same gap logic as [[sessionize]], but the
    * input carries a real event-time column with a watermark and state
    * uses GroupStateTimeout.EventTimeTimeout — a user idle past the gap
    * (by watermark time) has their state REMOVED, so total state is
    * bounded by concurrently-active users instead of all users ever
    * seen. After eviction a returning user restarts at session 1 (session
    * ids are unique per active era, which is what downstream windowed
    * consumers key on).
    */
  def sessionizeEvicting(events: Dataset[TsEvent],
                         gapSec: Long = 1800,
                         watermark: String = "2 hours"): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
            var n = 0L
            val out = scala.collection.mutable.ArrayBuffer[SessionUpdate]()
            evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val tsMicros = e.ts.getTime * 1000L
              if (st.lastTs == Long.MinValue ||
                  tsMicros - st.lastTs > gapSec * 1000000L) {
                st = SessionState(st.sessionId + 1, tsMicros)
                n = 1L
              } else {
                st = SessionState(st.sessionId, math.max(st.lastTs, tsMicros))
                n += 1L
              }
              out += SessionUpdate(userId, st.sessionId, n)
            }
            state.update(st)
            // evict once the watermark passes the session gap
            state.setTimeoutTimestamp(st.lastTs / 1000L + gapSec * 1000L)
            out.iterator
          }
      }
  }

  /** Gap-based sessionization with flatMapGroupsWithState: a new session
    * starts when an event arrives more than `gapSec` after the previous
    * one. Emits one update per event (Update mode). Events are sorted by
    * ts within each micro-batch; an event arriving in a LATER batch with
    * ts before the stored lastTs joins the current session and must not
    * regress lastTs (the session frontier is monotone), or subsequent
    * gap decisions would split sessions that already absorbed later
    * events.
    */
  def sessionize(events: Dataset[SessionEvent], gapSec: Long = 1800)
      : Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (userId, evs, state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          var n = 0L
          val out = scala.collection.mutable.ArrayBuffer[SessionUpdate]()
          evs.toSeq.sortBy(_.tsMicros).foreach { e =>
            // sentinel check first: subtracting Long.MinValue overflows
            if (st.lastTs == Long.MinValue ||
                e.tsMicros - st.lastTs > gapSec * 1000000L) {
              st = SessionState(st.sessionId + 1, e.tsMicros)
              n = 1L
            } else {
              st = SessionState(st.sessionId, math.max(st.lastTs, e.tsMicros))
              n += 1L
            }
            out += SessionUpdate(userId, st.sessionId, n)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Input row for the journey tracker. */
  final case class JourneyEvent(userId: Long, ts: java.sql.Timestamp,
                                eventId: Long, eventType: String)
  /** steps = the up-to-maxSteps EARLIEST (tsMicros, eventId, type)
    * triples seen so far; lastSeenMicros drives the idle timeout.
    */
  final case class JourneyState(steps: Seq[(Long, Long, String)],
                                lastSeenMicros: Long)
  final case class Journey(userId: Long, journey: String, nSteps: Int)

  /** Streaming twin of the batch e08_user_journey: per user, the first
    * `maxSteps` events in EVENT-TIME order collapse to a '>'-joined
    * event-type path, emitted once the user goes idle (event-time
    * timeout). State per user is a constant-size buffer of the maxSteps
    * earliest steps — a late event that belongs inside the prefix
    * displaces a later one (insert-sort by (ts, event_id)), so arrival
    * order never changes the answer for events inside the watermark.
    * Total state is bounded by concurrently-active users × maxSteps.
    */
  def journeyTracker(events: Dataset[JourneyEvent], maxSteps: Int = 8,
                     watermark: String = "2 hours",
                     idleSec: Long = 3600): Dataset[Journey] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[JourneyState, Journey](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[JourneyState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(Journey(userId,
              st.steps.map(_._3).mkString(">"), st.steps.size))
          } else {
            val st = state.getOption.getOrElse(JourneyState(Nil, Long.MinValue))
            val incoming = evs.map(e =>
              (e.ts.getTime * 1000L, e.eventId, e.eventType)).toSeq
            val merged = (st.steps ++ incoming)
              .sortBy(t => (t._1, t._2)).take(maxSteps)
            val lastSeen = (st.lastSeenMicros +: incoming.map(_._1)).max
            state.update(JourneyState(merged, lastSeen))
            // finalize once the watermark passes the idle horizon
            state.setTimeoutTimestamp(lastSeen / 1000L + idleSec * 1000L)
            Iterator.empty
          }
      }
  }

  /** buffer = in-watermark events not yet chained; last = the most recent
    * MATURED event, carried so chains stay unbroken across emissions.
    */
  final case class TransitionState(buffer: Seq[(Long, Long, String)],
                                   last: Option[(Long, Long, String)])
  final case class Transition(userId: Long, fromType: String, toType: String)

  /** Streaming twin of the batch e09_transition_matrix: emits each
    * adjacent (from → to) event-type transition per user in EVENT-TIME
    * order. Events buffer per user until the watermark passes them, so a
    * late arrival inside the lateness allowance takes its event-time
    * place in the chain regardless of arrival order; matured events emit
    * their pairs and LEAVE the buffer, keeping state bounded by each
    * user's event rate × the watermark horizon (plus one carried chain
    * head). On event-time idle timeout the residual buffer flushes its
    * pairs and the user's state is dropped. Downstream, a windowed
    * groupBy(from, to) over this stream IS e09's matrix, incrementally.
    */
  def transitionTracker(events: Dataset[JourneyEvent],
                        watermark: String = "2 hours",
                        idleSec: Long = 3600): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[TransitionState, Transition](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[TransitionState]) =>
          def pairs(head: Option[(Long, Long, String)],
                    seq: Seq[(Long, Long, String)]): Iterator[Transition] = {
            val chain = head.toSeq ++ seq
            chain.zip(chain.drop(1)).iterator
              .map { case (a, b) => Transition(userId, a._3, b._3) }
          }
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            pairs(st.last, st.buffer)
          } else {
            val st = state.getOption.getOrElse(TransitionState(Nil, None))
            val incoming = evs.map(e =>
              (e.ts.getTime * 1000L, e.eventId, e.eventType)).toSeq
            val merged = (st.buffer ++ incoming).sortBy(t => (t._1, t._2))
            val wmMicros = state.getCurrentWatermarkMs() * 1000L
            val (mature, rest) = merged.partition(_._1 < wmMicros)
            val out = pairs(st.last, mature)
            val newLast = mature.lastOption.orElse(st.last)
            val lastSeenMs = merged.map(_._1 / 1000L).max
            state.update(TransitionState(rest, newLast))
            // idle horizon, clamped above the current watermark (Spark
            // rejects a timeout at-or-before the watermark)
            state.setTimeoutTimestamp(
              math.max(lastSeenMs, state.getCurrentWatermarkMs() + 1) +
                idleSec * 1000L)
            out
          }
      }
  }

  final case class DwellState(buffer: Seq[(Long, Long, String)],
      last: Option[(Long, Long, String)])
  final case class Dwell(userId: Long, eventType: String, dwellUs: Long)

  /** Streaming twin of batch e27 (state dwell): per-user SCD2 validity
    * intervals emitted incrementally in EVENT-TIME order. State carries
    * the in-watermark buffer plus the last matured event (the opener of
    * the currently-open interval); as events mature past the watermark
    * each closes its predecessor's interval and the dwell is emitted —
    * so a late arrival inside the allowance splits the interval it
    * lands in, exactly as the batch lead() would have. Idle timeout
    * flushes the intervals still closable inside the buffer and evicts;
    * the final open interval is never emitted (batch e27 likewise drops
    * each user's last event — no successor, no dwell). State is bounded
    * by events inside the lateness horizon per active user.
    */
  def dwellTracker(events: Dataset[JourneyEvent],
                   watermark: String = "2 hours",
                   idleSec: Long = 3600): Dataset[Dwell] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[DwellState, Dwell](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[DwellState]) =>
          def dwells(head: Option[(Long, Long, String)],
                     seq: Seq[(Long, Long, String)]): Iterator[Dwell] = {
            val chain = head.toSeq ++ seq
            chain.zip(chain.drop(1)).iterator
              .map { case (a, b) => Dwell(userId, a._3, b._1 - a._1) }
          }
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            dwells(st.last, st.buffer)
          } else {
            val st = state.getOption.getOrElse(DwellState(Nil, None))
            val incoming = evs.map(e =>
              (e.ts.getTime * 1000L, e.eventId, e.eventType)).toSeq
            val merged = (st.buffer ++ incoming).sortBy(t => (t._1, t._2))
            val wmMicros = state.getCurrentWatermarkMs() * 1000L
            val (mature, rest) = merged.partition(_._1 < wmMicros)
            val out = dwells(st.last, mature)
            val newLast = mature.lastOption.orElse(st.last)
            val lastSeenMs = merged.map(_._1 / 1000L).max
            state.update(DwellState(rest, newLast))
            state.setTimeoutTimestamp(
              math.max(lastSeenMs, state.getCurrentWatermarkMs() + 1) +
                idleSec * 1000L)
            out
          }
      }
  }

  /** Streaming twin of the batch e14 DAU: exact daily active users via
    * chained stateful operators — dropDuplicatesWithinWatermark on
    * (user_id, day) bounds the dedup state to the lateness horizon,
    * then a watermarked tumbling count closes each day under Append
    * semantics. Exact distinct counting at stream scale without any
    * per-day user set in one place: the dedup state shards by
    * (user, day) key, the count is an ordinary windowed aggregation.
    */
  def dauTracker(events: DataFrame, watermark: String = "1 day"): DataFrame = {
    import org.apache.spark.sql.functions._
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("user_id"),
        date_trunc("day", col("ts")).as("day"))
      .dropDuplicatesWithinWatermark("user_id", "day")
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("dau"))
      .select(col("window.start").as("day_start"), col("dau"))
  }

  /** Streaming twin of the batch e21: Spark's NATIVE session_window
    * aggregation under a watermark — sessions merge as events arrive
    * (late events inside the allowance extend/merge windows) and emit
    * once the watermark passes their end (Append). State = open
    * sessions per user inside the horizon; no custom state code at all,
    * which is the point of e21's formulation.
    */
  def nativeSessions(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.functions._
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
  }

  final case class StreakState(days: Seq[Long])
  final case class Streak(userId: Long, longestStreak: Int, nStreaks: Int,
                          nActiveDays: Int)

  /** Streaming twin of the batch e19_streaks: per user, the distinct
    * active-DAY set buffers (one Long per day — day-granular, so state is
    * bounded by the user's active-day count, never event volume; a
    * duplicate day is absorbed in place whatever its arrival order), and
    * on event-time idle timeout the gaps-and-islands fold runs over the
    * sorted day set and emits the user's streak summary — identical
    * semantics to the batch dayNum − row_number() trick, computed as a
    * single sorted pass at finalize time.
    */
  def streakTracker(events: Dataset[JourneyEvent],
                    watermark: String = "48 hours",
                    idleSec: Long = 7 * 86400): Dataset[Streak] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[StreakState, Streak](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[StreakState]) =>
          if (state.hasTimedOut) {
            val days = state.get.days.sorted
            state.remove()
            // islands: consecutive day numbers form one streak
            val streaks = days.foldLeft(List.empty[Int]) {
              case (run :: rest, d) if days.contains(d - 1) =>
                (run + 1) :: rest // extends the current island
              case (acc, _) => 1 :: acc // a gap (or first day) opens one
            }
            Iterator.single(Streak(userId,
              if (streaks.isEmpty) 0 else streaks.max,
              streaks.size, days.size))
          } else {
            val st = state.getOption.getOrElse(StreakState(Nil))
            val incoming = evs.map(e => e.ts.getTime / 86400000L).toSeq
            val merged = (st.days ++ incoming).distinct
            state.update(StreakState(merged))
            // timeout from the END of the latest active day, so the
            // timestamp always sits at-or-after every buffered event
            val lastMs = (merged.max + 1L) * 86400000L
            state.setTimeoutTimestamp(lastMs + idleSec * 1000L)
            Iterator.empty
          }
      }
  }

  /** Streaming twin of the batch e07_spike_detect: watermarked tumbling
    * counts per event type, each CLOSED window (Append semantics under
    * the watermark) flagged against a STATIC baseline of per-type
    * population stats (event_type, w, s, ss — window count, count sum,
    * count sum-of-squares, i.e. exactly what the batch e07/e12 pass
    * emits over history). The stream side keeps only in-horizon windowed
    * partials (state bounded by types × windows inside the watermark);
    * the tiny baseline broadcasts into every micro-batch — a
    * stream-static join, no stateful join machinery. The flag is the
    * SAME exact-integer 3σ predicate as batch e07:
    * (w·n − s)² > 9·(w·ss − s²) — no float ever decides an alert, so
    * the streaming and batch verdicts can never drift.
    */
  def spikeTracker(events: DataFrame, baseline: DataFrame,
                   windowLen: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))
      .join(broadcast(baseline), "event_type")
      .withColumn("dev", col("w") * col("n") - col("s"))
      .select(col("event_type"), col("window_start"), col("n"),
        (col("dev") * col("dev") >
          lit(9L) * (col("w") * col("ss") - col("s") * col("s")))
          .as("spike"))

  final case class AttribEvent(userId: Long, ts: java.sql.Timestamp,
                               eventId: Long, eventType: String,
                               value: Double)
  /** buffer = in-watermark events; lastTouch = the latest MATURED touch
    * channel, carried so credit survives across micro-batches.
    */
  final case class AttribState(buffer: Seq[(Long, Long, String, Double)],
                               lastTouch: Option[String])
  final case class Credit(userId: Long, eventId: Long, channel: String,
                          value: Double)

  /** Streaming twin of the batch e10_attribution: every purchase is
    * credited to the user's most recent PRECEDING view/click in
    * EVENT-TIME order, 'none' if untouched. Same maturation discipline
    * as [[transitionTracker]]: events buffer per user until the
    * watermark passes them, so a touch that arrives late but happened
    * before the purchase claims the credit — arrival order never
    * decides attribution inside the lateness allowance. State is the
    * in-watermark buffer plus one carried channel string; idle timeout
    * flushes and evicts.
    */
  def attributionTracker(events: Dataset[AttribEvent],
                         watermark: String = "2 hours",
                         idleSec: Long = 3600): Dataset[Credit] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[AttribState, Credit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[AttribState]) =>
          // walk matured events in event-time order: touches move the
          // carried channel, purchases emit a credit against it
          def credit(start: Option[String],
                     seq: Seq[(Long, Long, String, Double)])
              : (Option[String], Seq[Credit]) =
            seq.foldLeft((start, Vector.empty[Credit])) {
              case ((lt, acc), (_, id, "purchase", v)) =>
                (lt, acc :+ Credit(userId, id, lt.getOrElse("none"), v))
              case ((lt, acc), (_, _, t, _)) =>
                (if (t == "view" || t == "click") Some(t) else lt, acc)
            }
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            credit(st.lastTouch, st.buffer)._2.iterator
          } else {
            val st = state.getOption.getOrElse(AttribState(Nil, None))
            val incoming = evs.map(e => (e.ts.getTime * 1000L, e.eventId,
              e.eventType, e.value)).toSeq
            val merged = (st.buffer ++ incoming).sortBy(t => (t._1, t._2))
            val wmMicros = state.getCurrentWatermarkMs() * 1000L
            val (mature, rest) = merged.partition(_._1 < wmMicros)
            val (newTouch, out) = credit(st.lastTouch, mature)
            val lastSeenMs = merged.map(_._1 / 1000L).max
            state.update(AttribState(rest, newTouch))
            state.setTimeoutTimestamp(
              math.max(lastSeenMs, state.getCurrentWatermarkMs() + 1) +
                idleSec * 1000L)
            out.iterator
          }
      }
  }
}
