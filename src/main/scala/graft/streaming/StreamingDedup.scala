package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact dedup for document ingest — the streaming face of
  * `ops.Dedup.exact` (first-seen-wins instead of min-id-wins: a stream has
  * an arrival order, not a total id order).
  *
  * Scale note: `unbounded` keeps one state row per distinct key FOREVER —
  * the streaming scale-killer at 100 TB ingest. `withinWatermark` bounds
  * the state by event time via `dropDuplicatesWithinWatermark`: duplicates
  * are only suppressed while their key is younger than the watermark delay,
  * which is the production contract for de-duping an ingest firehose
  * (re-crawls of the same document arrive close together).
  */
object StreamingDedup {

  /** First-seen survivor per distinct `keyCol`; UNBOUNDED state (tests /
    * finite backfills only — see scaladoc). */
  def unbounded(df: DataFrame, keyCol: String): DataFrame =
    df.dropDuplicates(Seq(keyCol))

  /** First-seen survivor per distinct `keyCol` with state bounded by the
    * event-time watermark on `tsCol`. */
  def withinWatermark(df: DataFrame, keyCol: String, tsCol: String,
                      delay: String): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(Seq(keyCol))
}
