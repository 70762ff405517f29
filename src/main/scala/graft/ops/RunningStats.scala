package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.TranscriptCols

/** Point-in-time running statistics per entity.
  *
  * The reference computes per-user min/max/avg of slot counts over the user's
  * ENTIRE history and merges them back (`/root/reference/Preprocess/
  * mean_features.py:20-26,51`). The north rule upgrades this to point-in-time:
  * at every anchor ts the stats must cover only rows with ts' <= anchor
  * (zero temporal leakage). The two coincide exactly at each entity's final
  * anchor — which is where golden parity with the reference is pinned.
  *
  * Spark form: cumulative frame `rowsBetween(unboundedPreceding, currentRow)`
  * over (entity ORDER BY ts, seq). One shuffle on the entity key; a single
  * sorted streaming pass per partition regardless of conversation size, so
  * mega-conversations cost O(n log n) sort but O(1) memory.
  *
  * `avg` is emitted as exact `sum/count` over integer inputs — one final
  * IEEE division — so DuckDB and plain-Scala oracles agree bit-for-bit
  * (no order-dependent float accumulation).
  */
object RunningStats {

  /** For each input column c, adds c_run_min / c_run_max / c_run_avg;
    * plus run_cnt (rows seen so far, inclusive). Inputs must be integral. */
  def pointInTime(df: DataFrame, entity: Seq[String], c: TranscriptCols,
                  valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(entity.map(col): _*)
      .orderBy(col(c.ts), col(c.seq))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cnt = count(lit(1)).over(w)
    val withStats = valueCols.foldLeft(df) { (acc, v) =>
      acc
        .withColumn(s"${v}_run_min", min(col(v)).over(w))
        .withColumn(s"${v}_run_max", max(col(v)).over(w))
        .withColumn(s"${v}_run_avg",
          sum(col(v).cast("long")).over(w).cast("double") / cnt.cast("double"))
    }
    withStats.withColumn("run_cnt", cnt)
  }

  /** Full-history stats per entity (the reference's exact grain): one row per
    * entity with min/max/avg per value column — equals `pointInTime` at the
    * final anchor. Single hash-aggregate, map-side combined. */
  def fullHistory(df: DataFrame, entity: Seq[String], valueCols: Seq[String]): DataFrame = {
    val aggs = valueCols.flatMap { v =>
      Seq(
        min(col(v)).as(s"${v}_min"),
        max(col(v)).as(s"${v}_max"),
        (sum(col(v).cast("long")).cast("double") / count(col(v)).cast("double")).as(s"${v}_avg"))
    }
    df.groupBy(entity.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
