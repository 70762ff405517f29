package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.TranscriptCols

/** Calendar / tumbling windowization of a transcript stream.
  *
  * Mirrors the reference's static slotting of the behavior log into
  * (day_type, time_period) buckets (`/root/reference/Preprocess/
  * dataset_for_prediction.py:53-65`), generalized:
  *   - `withCalendarSlots` — day_type ∈ {Weekday,Weekend} and a configurable
  *     hour→period taxonomy (the shipped data uses an older 4-bucket variant;
  *     the taxonomy is a parameter, per SURVEY §2.8);
  *   - `withTumblingWindow` — fixed-width windows via date_trunc (hour) or
  *     arbitrary widths via epoch-div (pure projection; no shuffle, fully
  *     codegen'd, partition-prunable when the table is laid out by date).
  */
object Windowize {

  /** One (label, loHour, hiHour) triple per period; hours inclusive. */
  type PeriodTaxonomy = Seq[(String, Int, Int)]

  /** Current reference taxonomy (`dataset_for_prediction.py:55-63`). */
  val periodsV2: PeriodTaxonomy =
    Seq(("Early Morning", 0, 5), ("Morning", 6, 11), ("Afternoon", 12, 17), ("Late Night", 18, 23))

  /** Taxonomy that produced the shipped xlsx (Evening variant,
    * `Feature_Extraction/model_date_time.py:26-31`). */
  val periodsV1: PeriodTaxonomy =
    Seq(("Late Night", 0, 5), ("Morning", 6, 11), ("Afternoon", 12, 17), ("Evening", 18, 23))

  /** day_type: Weekend iff Saturday/Sunday (pandas weekday>=5, `:53`).
    * Spark dayofweek: 1=Sunday..7=Saturday. */
  def dayType(ts: Column): Column =
    when(dayofweek(ts).isin(1, 7), "Weekend").otherwise("Weekday")

  def timePeriod(ts: Column, taxonomy: PeriodTaxonomy = periodsV2): Column = {
    val h = hour(ts)
    taxonomy.tail.foldLeft(when(h.between(taxonomy.head._2, taxonomy.head._3), taxonomy.head._1)) {
      case (acc, (label, lo, hi)) => acc.when(h.between(lo, hi), label)
    }
  }

  def withCalendarSlots(df: DataFrame, c: TranscriptCols,
                        taxonomy: PeriodTaxonomy = periodsV2): DataFrame =
    df.withColumn("day_type", dayType(col(c.ts)))
      .withColumn("time_period", timePeriod(col(c.ts), taxonomy))

  /** Tumbling window start of width `seconds`, aligned to the epoch.
    * Exact integer arithmetic (pmod-subtract, not `/` which is double
    * division on Columns), so DuckDB agrees bit-for-bit; emitted as
    * TIMESTAMP_NTZ to match the input's wall-clock representation. */
  def tumblingStart(ts: Column, seconds: Long): Column = {
    val widthUs = seconds * 1000000L
    val us = micros(ts)
    val startSec = ((us - pmod(us, lit(widthUs))) / lit(1000000L)).cast("long")
    timestamp_seconds(startSec).cast("timestamp_ntz")
  }

  def withTumblingWindow(df: DataFrame, c: TranscriptCols, seconds: Long,
                         out: String = "window_start"): DataFrame =
    df.withColumn(out, tumblingStart(col(c.ts), seconds))
}
