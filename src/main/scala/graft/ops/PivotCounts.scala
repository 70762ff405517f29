package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-count-pivot: one count column per value of a closed categorical
  * dimension — the engine's Basic-layer workhorse.
  *
  * Reference semantics: `groupby(user_id, day_type, time_period, behavior)
  * .size().unstack(fill_value=0)` (`/root/reference/Preprocess/
  * dataset_for_prediction.py:68-78`).
  *
  * Scale notes:
  *   - pivot values are declared EXPLICITLY (closed domain) so Spark never
  *     runs the hidden distinct-collect job `pivot(col)` would need;
  *   - implemented as conditional-sum aggregation, which Catalyst plans as a
  *     single partial+final HashAggregate pair (one shuffle, map-side
  *     combine) — the same plan shape whether there are 4 or 400 pivot
  *     values, and skew-tolerant because partial aggregation collapses
  *     mega-key rows before the exchange.
  */
object PivotCounts {

  /** groupBy(keys).pivot(dim, values).count() with fill 0, as conditional sums. */
  def apply(df: DataFrame, keys: Seq[String], dim: String, values: Seq[String],
            suffix: String = "_count"): DataFrame = {
    val aggs: Seq[Column] = values.map { v =>
      sum(when(col(dim) === lit(v), 1L).otherwise(0L)).as(s"$v$suffix")
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Same, plus a 0/1 label column `labelName = (labelValue count > 0)` —
    * the reference's `buy_yn` (`dataset_for_prediction.py:89`). */
  def withLabel(df: DataFrame, keys: Seq[String], dim: String, values: Seq[String],
                labelValue: String, labelName: String, suffix: String = "_count"): DataFrame =
    apply(df, keys, dim, values, suffix)
      .withColumn(labelName, when(col(s"$labelValue$suffix") > 0, 1).otherwise(0))

  /** The inverse: wide → long (pandas `melt`). One row per (id, value
    * column), the column NAME as `metricCol`. Spark's native `unpivot` plans
    * an Expand — a map-only row multiplication, no shuffle, no per-column
    * scan (the UNION-ALL form an SQL engine falls back to re-reads the
    * input once per melted column). */
  def melt(df: DataFrame, ids: Seq[String], valueCols: Seq[String],
           metricCol: String, valueCol: String): DataFrame =
    df.unpivot(ids.map(col).toArray, valueCols.map(col).toArray, metricCol, valueCol)
}
