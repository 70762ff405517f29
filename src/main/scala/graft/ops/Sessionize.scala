package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.TranscriptCols

/** Batch sessionization on ts gaps per conversation (north-rule operator).
  *
  * Classic cumulative-sum sessionization: a turn opens a new session iff the
  * gap to the previous turn of the same conversation exceeds `gapSeconds`;
  * `session_id = running sum of new-session flags` (0-based per conversation).
  *
  * Plan shape: ONE shuffle (the window's hash partitioning on conv) and one
  * sort per partition — no join, no second pass. At 100 TB the partition key
  * is the conversation id, so a conversation never splits across tasks; skew
  * from mega-conversations is bounded because a window over one key streams
  * through a single sorted run (no state beyond the previous row).
  *
  * Cross-check: `session_window($"ts", gap)` (built-in) pins the same
  * boundaries in the test suite.
  */
object Sessionize {

  /** Adds `session_id` (int, 0-based per conversation) and `is_session_start`. */
  def withSessionId(df: DataFrame, c: TranscriptCols, gapSeconds: Long,
                    out: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(col(c.conv)).orderBy(col(c.ts), col(c.seq))
    // exact microsecond arithmetic — no sub-second truncation surprises
    val gapUs: Column = micros(col(c.ts)) - lag(micros(col(c.ts)), 1).over(w)
    val newSession = when(gapUs.isNull || gapUs > lit(gapSeconds * 1000000L), 1L).otherwise(0L)
    df.withColumn("is_session_start", newSession)
      .withColumn(out,
        (sum(col("is_session_start")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
          .cast("long"))
  }

  /** Per-session rollup: bounds, duration, turn count. */
  def sessions(df: DataFrame, c: TranscriptCols, gapSeconds: Long): DataFrame =
    withSessionId(df, c, gapSeconds)
      .groupBy(col(c.conv), col("session_id"))
      .agg(
        min(col(c.ts)).as("session_start"),
        max(col(c.ts)).as("session_end"),
        count(lit(1)).as("n_turns"),
        (micros(max(col(c.ts))) - micros(min(col(c.ts)))).as("duration_us"))
}
