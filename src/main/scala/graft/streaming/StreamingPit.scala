package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch PIT window-state pipeline
  * (`PitPipeline.windowStates`): per conversation, tumbling-window role
  * counts folded into running min/max/avg/total stats — maintained
  * INCREMENTALLY with `flatMapGroupsWithState`.
  *
  * State per conversation = the running stats over completed windows plus
  * the currently-open window's counts. A window's state row is emitted
  * exactly once, when the window COMPLETES (an event for a later window
  * arrives) — which is precisely the point-in-time contract: an anchor may
  * only read states of windows with `window_end <= anchor ts`, so an
  * unfinished window is never observable anyway. At stream end each
  * conversation's final window is still open and therefore unemitted
  * (the batch/stream equivalence test accounts for exactly that row).
  *
  * Arithmetic parity with the batch plan: counts stay exact longs; avg is
  * one double division sum/count at emit time — the same op the batch
  * window aggregation performs, so emitted values are bit-identical.
  *
  * Scale shape: state is O(1) per conversation (4 longs per role + the open
  * window), partitioned by conv_id across executors by the streaming state
  * store; within a micro-batch a group's events are sorted by (ts,
  * turn_idx) — the batch engine's deterministic order.
  *
  * Late data (an event for a window older than the open one, arriving in a
  * later micro-batch) is DROPPED, like a watermark-expired event: the
  * window's row was already emitted and may have been consumed downstream,
  * so incorporating the event would require retraction semantics this
  * operator does not promise. StreamingSpec pins the drop behavior.
  */
object StreamingPit {

  final case class RoleTurn(conv_id: String, turn_idx: Int, tsUs: Long, role: String)

  final case class PitState(
      openStartUs: Long, openCounts: Seq[Long],
      mins: Seq[Long], maxs: Seq[Long], sums: Seq[Long], nWindows: Long)

  final case class WindowStateOut(
      conv_id: String, window_start_us: Long, window_end_us: Long,
      mins: Seq[Long], maxs: Seq[Long], avgs: Seq[Double], counts: Seq[Long])

  def statefulWindowStates(turns: Dataset[RoleTurn], roles: Seq[String],
                           widthSec: Long): Dataset[WindowStateOut] = {
    import turns.sparkSession.implicits._
    val widthUs = widthSec * 1000000L
    val roleIdx = roles.zipWithIndex.toMap
    val n = roles.size

    turns.groupByKey(_.conv_id)
      .flatMapGroupsWithState[PitState, WindowStateOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (conv: String, it: Iterator[RoleTurn], state: GroupState[PitState]) =>
          val sorted = it.toSeq.sortBy(e => (e.tsUs, e.turn_idx))
          var st = state.getOption.getOrElse(
            PitState(Long.MinValue, Seq.fill(n)(0L), Seq.fill(n)(0L), Seq.fill(n)(0L),
              Seq.fill(n)(0L), 0L))
          val out = Seq.newBuilder[WindowStateOut]

          // fold the open window into the running stats and emit its row
          def closeOpen(): Unit = {
            val oc = st.openCounts
            val mins = if (st.nWindows == 0) oc else st.mins.zip(oc).map(t => math.min(t._1, t._2))
            val maxs = if (st.nWindows == 0) oc else st.maxs.zip(oc).map(t => math.max(t._1, t._2))
            val sums = st.sums.zip(oc).map(t => t._1 + t._2)
            val nw = st.nWindows + 1
            out += WindowStateOut(conv, st.openStartUs, st.openStartUs + widthUs,
              mins, maxs, sums.map(s => s.toDouble / nw.toDouble), sums)
            st = PitState(Long.MinValue, Seq.fill(n)(0L), mins, maxs, sums, nw)
          }

          sorted.foreach { e =>
            val winStart = e.tsUs - java.lang.Math.floorMod(e.tsUs, widthUs)
            if (st.openStartUs == Long.MinValue || winStart >= st.openStartUs) {
              if (st.openStartUs != Long.MinValue && winStart > st.openStartUs) closeOpen()
              val counts =
                if (st.openStartUs == Long.MinValue) Seq.fill(n)(0L) else st.openCounts
              val bumped = roleIdx.get(e.role) match {
                case Some(i) => counts.updated(i, counts(i) + 1L)
                case None    => counts // outside the closed role domain: not pivoted
              }
              st = st.copy(openStartUs = winStart, openCounts = bumped)
            }
            // else: LATE event for an already-closed window (arrived in a
            // later micro-batch). Its window's state row was already emitted
            // and downstream anchors may have consumed it — incorporating it
            // would require retraction. Policy: drop, exactly like a
            // watermark-expired event; counting it into the CURRENT window
            // (the previous behavior) silently corrupted both windows.
          }
          state.update(st)
          out.result().iterator
      }
  }
}
