package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Left (query) row of the streaming as-of join. */
case class AsofLeftRow(key: Long, ts: java.sql.Timestamp, left_id: Long)

/** Right (reference) row of the streaming as-of join. */
case class AsofRightRow(key: Long, ts: java.sql.Timestamp, right_value: Long)

/** One matched (or unmatched) left row, emitted exactly once when the
  * watermark passes its event time.
  */
case class AsofMatchRow(
    key: Long,
    left_id: Long,
    left_ts: String,
    right_ts: Option[String],
    right_value: Option[Long])

/** Tagged union row feeding the single keyed state machine. */
private[streaming] case class AsofEvent(
    key: Long, ts: java.sql.Timestamp, side: Int, id: Long, value: Long)

/** Per-key state: buffered reference rows (ascending time; everything
  * inside the watermark horizon PLUS the single latest pre-horizon row —
  * the O(1) candidate the batch physical operator holds) and left rows
  * still waiting for their event time to pass the watermark.
  */
private[streaming] case class AsofState(
    rights: List[(Long, Long)], // (tsMs, value) ascending
    lefts: List[(Long, Long)])  // (tsMs, left_id) pending

/** Streaming twin of the native as-of join ([[graft.plans.AsofJoinPlan]] /
  * [[graft.ops.JoinOps.asofJoin]]): for every left row, the LATEST right
  * row with the same key and `right.ts <= left.ts` (within `toleranceMs`
  * when given); unmatched left rows emit NULL right columns. Append mode,
  * exactly-once per left row.
  *
  * Correctness under reordering is watermark-governed: a left row is NOT
  * answered on arrival — it buffers until the watermark passes its event
  * time, so every right row that could precede it (inside the lateness
  * horizon) has arrived, and the streamed result equals the batch join on
  * the same data (differential-pinned in AsofStreamSpec). That is the
  * same contract every watermarked stream-stream join makes; events later
  * than the watermark are a data-loss condition in any engine.
  *
  * State per key is the physical operator's merge state plus the horizon:
  * ONE latest pre-horizon right row, the right rows inside the horizon,
  * and the not-yet-ripe left rows — bounded by the horizon's traffic, not
  * the stream's history. Keys idle past `ttlMinutes` (no pending lefts)
  * drop their state entirely, so abandoned keys cannot accrete forever.
  *
  * Ties (several right rows at one (key, ts)) keep the greatest value —
  * a deterministic stand-in for "last in sort order"; callers wanting
  * full tie determinism dedup the right side first, the same contract as
  * the batch operator.
  */
object AsofStream {

  def asofStream(
      left: Dataset[AsofLeftRow],
      right: Dataset[AsofRightRow],
      watermark: String,
      toleranceMs: Option[Long] = None,
      ttlMinutes: Int = 60): Dataset[AsofMatchRow] = {
    require(ttlMinutes >= 1, s"ttlMinutes must be >= 1, got $ttlMinutes")
    val spark = left.sparkSession
    import spark.implicits._
    val ttlMs = ttlMinutes * 60000L

    val tagged = left
      .map(l => AsofEvent(l.key, l.ts, 0, l.left_id, 0L))
      .union(right.map(r => AsofEvent(r.key, r.ts, 1, 0L, r.right_value)))
      .withWatermark("ts", watermark)

    def fmt(ms: Long) = java.time.Instant.ofEpochMilli(ms)
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))

    def emit(key: Long, lts: Long, lid: Long,
        rights: List[(Long, Long)]): AsofMatchRow = {
      val cand = rights.iterator
        .filter { case (rts, _) =>
          rts <= lts && toleranceMs.forall(tol => lts - rts <= tol)
        }
        .reduceOption((a, b) => if (b._1 >= a._1) b else a)
      AsofMatchRow(key, lid, fmt(lts),
        cand.map(c => fmt(c._1)), cand.map(_._2))
    }

    def onGroup(
        key: Long,
        batch: Iterator[AsofEvent],
        state: GroupState[AsofState]): Iterator[AsofMatchRow] = {
      val st0 = state.getOption.getOrElse(AsofState(Nil, Nil))
      val evs = batch.toArray
      // merge new rows into the buffers; right ties at one ts collapse to
      // the greatest value (deterministic; see scaladoc)
      val rights = (st0.rights ++ evs.iterator
        .filter(_.side == 1).map(e => (e.ts.getTime, e.value)))
        .groupBy(_._1).map { case (t, vs) => (t, vs.map(_._2).max) }
        .toList.sortBy(_._1)
      val lefts = (st0.lefts ++ evs.iterator
        .filter(_.side == 0).map(e => (e.ts.getTime, e.id)))
        .sortBy(identity)
      val wm = state.getCurrentWatermarkMs()

      // answer every left whose event time the watermark has passed: all
      // qualifying rights are in (watermark contract)
      val (ripe, pending) = lefts.partition(_._1 <= wm)
      val out = ripe.map { case (lts, lid) => emit(key, lts, lid, rights) }

      // prune rights: horizon rows stay, older rows collapse to the one
      // latest candidate (exactly the physical operator's held row)
      val (old, fresh) = rights.partition(_._1 <= wm)
      val kept = old.lastOption.toList ++ fresh

      if (pending.isEmpty && kept.isEmpty) state.remove()
      else if (pending.isEmpty && state.hasTimedOut && ripe.isEmpty)
        state.remove() // pure TTL expiry: idle key, nothing ripened
      else {
        state.update(AsofState(kept, pending))
        // wake when the earliest pending left ripens, else when the TTL
        // for this idle key expires
        state.setTimeoutTimestamp(
          pending.headOption.map(_._1).getOrElse(wm + ttlMs))
      }
      out.iterator
    }

    tagged.groupByKey(_.key)
      .flatMapGroupsWithState[AsofState, AsofMatchRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(onGroup)
  }
}
