package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar timestamp semantics from the reference's preprocessing
  * (`/root/reference/Preprocess/dataset_for_prediction.py:19-40`):
  * epoch values may be seconds or milliseconds (heuristic: > 10^10 ⇒ ms),
  * converted UTC → Asia/Shanghai and floored to the hour. All pure Catalyst —
  * the reference's row-wise Python `.apply` disappears (SURVEY §2.11).
  */
object ScalarOps {

  /** Epoch seconds-or-millis heuristic (`:19-33`). Returns TIMESTAMP_NTZ
    * (UTC wall clock, matching the session timezone). */
  def parseEpoch(v: Column): Column =
    when(v > lit(10000000000L), timestamp_millis(v))
      .otherwise(timestamp_seconds(v))
      .cast("timestamp_ntz")

  /** UTC wall clock → Asia/Shanghai wall clock, floored to hour (`:38`). */
  def toShanghaiHour(tsNtz: Column): Column =
    date_trunc("hour", convert_timezone(lit("UTC"), lit("Asia/Shanghai"), tsNtz))
      .cast("timestamp_ntz")

  /** Exact epoch seconds of a timestamp (integer arithmetic, no float). */
  def epochSeconds(ts: Column): Column = {
    val us = micros(ts)
    ((us - pmod(us, lit(1000000L))) / lit(1000000L)).cast("long")
  }
}
