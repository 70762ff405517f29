package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

package object ops {
  /** Exact epoch microseconds of a timestamp column.
    *
    * Driver parquet carries TIMESTAMP_NTZ; with the session timezone pinned
    * to UTC (build.sbt) the NTZ→instant cast is the identity on the wall
    * clock, so this equals DuckDB's `epoch_us(ts)` bit-for-bit.
    */
  def micros(c: Column): Column = unix_micros(c.cast("timestamp"))
}
