package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.TranscriptCols

/** Lag/lead turn features (north-rule Basic-layer additions; absent in the
  * reference, which has no within-entity ordering ops — SURVEY §2.5).
  *
  * All are thin Catalyst window functions sharing ONE window spec, so the
  * whole block costs a single shuffle + sort on the conversation key and
  * stays inside whole-stage codegen.
  *
  * NOTE on leakage: lag-side columns (prev_*) are PIT-safe; lead-side
  * columns (next_*) deliberately peek forward and are excluded from any
  * point-in-time feature vector — they exist for label construction and
  * diagnostics only (mirrors the reference's leakage-exclusion policy at
  * `LR_Model_train/LR_Advanced.py:484-491`).
  */
object LagLead {

  def withLagLead(df: DataFrame, c: TranscriptCols, textCol: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(col(c.conv)).orderBy(col(c.ts), col(c.seq))
    val base = df
      .withColumn("prev_role", lag(col(c.role), 1).over(w))
      .withColumn("next_role", lead(col(c.role), 1).over(w))
      .withColumn("dt_prev_us", micros(col(c.ts)) - lag(micros(col(c.ts)), 1).over(w))
      .withColumn("dt_next_us", lead(micros(col(c.ts)), 1).over(w) - micros(col(c.ts)))
      .withColumn("turn_rank", row_number().over(w))
    textCol.fold(base) { t =>
      base.withColumn("text_len", length(col(t)))
        .withColumn("text_len_delta", length(col(t)) - lag(length(col(t)), 1).over(w))
    }
  }
}
