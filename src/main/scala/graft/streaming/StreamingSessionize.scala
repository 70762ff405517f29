package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.TranscriptCols

/** Structured Streaming ingestion path (SURVEY §7.6 optional extension):
  * the batch engine's sessionization semantics expressed over an unbounded
  * stream, two ways:
  *
  *   - `sessionWindows`: the built-in `session_window` + watermark — emits
  *     one row per closed session (append mode);
  *   - `statefulSessionize`: `flatMapGroupsWithState` carrying (last ts,
  *     session counter) per conversation — the streaming twin of the batch
  *     gap-cumsum rule, emitting per-turn session ids incrementally.
  *
  * Tests drive both with a file source over the same parquet the batch path
  * reads and assert batch/stream agreement (the memory sink makes the run
  * synchronous via processAllAvailable).
  */
object StreamingSessionize {

  /** Built-in session windows per conversation (closed sessions only). */
  def sessionWindows(stream: DataFrame, c: TranscriptCols, gapSeconds: Long,
                     watermark: String = "0 seconds"): DataFrame =
    stream
      .withColumn("__ts", col(c.ts).cast("timestamp"))
      .withWatermark("__ts", watermark)
      .groupBy(col(c.conv), session_window(col("__ts"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_turns"))
      .select(col(c.conv), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_turns"))

  final case class TurnEvent(conv_id: String, turn_idx: Int, tsUs: Long)
  final case class SessState(lastTsUs: Long, sessionId: Long)
  final case class SessOut(conv_id: String, turn_idx: Int, session_id: Long)

  /** Custom stateful sessionizer: per-conversation state = (last ts, session
    * counter). Within a micro-batch, events of a conversation are sorted by
    * (ts, turn_idx) before applying the gap rule — the same deterministic
    * order the batch window uses. */
  def statefulSessionize(turns: Dataset[TurnEvent], gapSeconds: Long): Dataset[SessOut] = {
    import turns.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    turns.groupByKey(_.conv_id)
      .flatMapGroupsWithState[SessState, SessOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (conv: String, it: Iterator[TurnEvent], state: GroupState[SessState]) =>
          val sorted = it.toSeq.sortBy(e => (e.tsUs, e.turn_idx))
          var st = state.getOption.getOrElse(SessState(Long.MinValue, -1L))
          val out = sorted.map { e =>
            val newSession = st.lastTsUs == Long.MinValue || e.tsUs - st.lastTsUs > gapUs
            st = SessState(e.tsUs, if (newSession) st.sessionId + 1 else st.sessionId)
            SessOut(conv, e.turn_idx, st.sessionId)
          }
          state.update(st)
          out.iterator
      }
  }
}
